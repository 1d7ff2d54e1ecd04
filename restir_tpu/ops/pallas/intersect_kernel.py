"""Pallas TPU kernels: brute-force ray-triangle intersection.

The XLA-level version (ops/intersect_bf.py) already puts the testing on
the MXU, but XLA materializes the [chunk, N] hit matrices to HBM between
the matmul and its epilogue (~125 ms for 2M rays x 426 tris at 1080p on
v5e). These kernels keep everything in VMEM: per ray-tile they

  1. form homogeneous ray rows [B, 4],
  2. run 6 small matmuls [B, 4] @ [4, Nb] against a column-block of the
     per-triangle unit-space transforms (split into three row planes
     xu/xv/xw so every array keeps a 128-aligned minor dim),
  3. apply the t/u/v hit test elementwise,
  4. fold a running (dist, prim, u, v) minimum across triangle blocks.

The fused `primary_hit_pallas` additionally interpolates the winner's
packed attribute row (fetched with a [B, Nb] @ [Nb, A] one-hot matmul
per block) and the material row ([B, M] @ [M, A]), replacing
surface.make_interaction + texture.fetch_textured_material — XLA would
otherwise lower those small-table gathers to full [R, N] one-hot matmuls
in HBM (multi-GB temps at 1080p).

Memory layout: every per-ray output channel is written as a
[tile/128, 128] plane of a single channel-major [C, R/128, 128] tensor —
rank-1 or narrow outputs would be 128x padded by the TPU tiled layout
(a [R, 1] f32 output costs 1 GB at 1080p; the packed tensor is unpadded).

Triangle-count padding is zero-filled: a zero transform row makes
dd.z == 0 which the mask rejects.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NULL_PRIMITIVE = -1
_BIG = 3.0e38  # plain float: jnp constants may not be captured by kernels


# ---------------------------------------------------------------------------
# bf16-split matmuls.
#
# Mosaic's Precision.HIGHEST is a 6-pass bf16 emulation; HIGH (3-pass) is
# unimplemented (BASELINE.md). These helpers do the 3-pass split by hand:
# a*b = ah*bh + ah*bl + al*bh with ah = rn_bf16(a), al = a - ah (exact in
# f32), dropping the ~2^-16-relative al*bl term. Where one operand is
# EXACTLY representable in bf16 (one-hot selectors, 0/1 triangular masks)
# only the other side is split: 2 passes, f32-faithful.


def _hi_lo(x):
    hi = x.astype(jnp.bfloat16)
    return hi, (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)


def _hi_mid_lo(x):
    hi = x.astype(jnp.bfloat16)
    r1 = x - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _bdot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def dot_f32x3(a, b, a_split=None, b_split=None):
    """~f32 matmul from 3 bf16 MXU passes (vs HIGHEST's 6): ah*bh +
    ah*bl + al*bh, dropping the ~2^-16-relative al*bl term. Pass
    precomputed (hi, lo) splits to hoist them out of loops."""
    ah, al = _hi_lo(a) if a_split is None else a_split
    bh, bl = _hi_lo(b) if b_split is None else b_split
    return _bdot(ah, bh) + (_bdot(ah, bl) + _bdot(al, bh))


def dot_exact_a(a_exact, b, b_split=None):
    """Matmul where `a_exact` is exactly bf16-representable (one-hot /
    0-1 selector matrices): 3 bf16 passes against a hi/mid/lo split of
    `b` recover all 24 f32 mantissa bits — f32-exact row selection."""
    ab = a_exact.astype(jnp.bfloat16)
    bh, bm, bl = _hi_mid_lo(b) if b_split is None else b_split
    return _bdot(ab, bh) + (_bdot(ab, bm) + _bdot(ab, bl))


def dot_exact_b(a, b_exact, a_split=None):
    """Mirror of dot_exact_a with the exact operand on the right."""
    bb = b_exact.astype(jnp.bfloat16)
    ah, am, al = _hi_mid_lo(a) if a_split is None else a_split
    return _bdot(ah, bb) + (_bdot(am, bb) + _bdot(al, bb))

ATTR_COLS = 32  # v0(3) e01(3) e02(3) n0(3) n01(3) n02(3) t0(2) t01(2) t02(2) mat_id(1)
MAT_COLS = 16  # type(1) base_color(3) metallic(1) roughness(1) ior(1) maps(4)

# channel indices of the packed primary-hit output
_CH_DIST, _CH_U, _CH_V = 0, 1, 2
_CH_POS, _CH_NORM, _CH_UV = 3, 6, 9
_CH_MTYPE, _CH_BCOLOR, _CH_METAL, _CH_ROUGH, _CH_IOR = 11, 12, 15, 16, 17
_CH_BMAP, _CH_MMAP, _CH_RMAP, _CH_NMAP = 18, 19, 20, 21
_CH_MATID, _CH_PRIM = 22, 23
_PRIMARY_CHANNELS = 24


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _homogeneous(o_ref, d_ref):
    b = o_ref.shape[0]
    ones = jnp.ones((b, 1), jnp.float32)
    zeros = jnp.zeros((b, 1), jnp.float32)
    oh = jnp.concatenate([o_ref[:, :3], ones], axis=1)
    dh = jnp.concatenate([d_ref[:, :3], zeros], axis=1)
    return oh, dh


def _block_hits(oh_split, dh_split, xu_ref, xv_ref, xw_ref, i, nb):
    """Hit test for one triangle block. Returns (dist, u, v) [B, nb].

    oh_split/dh_split: precomputed (hi, lo) bf16 splits of the
    homogeneous ray rows (hoisted out of the block loop)."""
    col = pl.multiple_of(i * nb, nb)
    xu = xu_ref[:, pl.ds(col, nb)]
    xv = xv_ref[:, pl.ds(col, nb)]
    xw = xw_ref[:, pl.ds(col, nb)]

    oou = dot_f32x3(None, xu, a_split=oh_split)
    oov = dot_f32x3(None, xv, a_split=oh_split)
    oow = dot_f32x3(None, xw, a_split=oh_split)
    ddu = dot_f32x3(None, xu, a_split=dh_split)
    ddv = dot_f32x3(None, xv, a_split=dh_split)
    ddw = dot_f32x3(None, xw, a_split=dh_split)

    nondeg = jnp.abs(ddw) >= 1e-12
    t = -oow / jnp.where(nondeg, ddw, 1.0)
    u = oou + t * ddu
    v = oov + t * ddv
    hit = nondeg & (t > 0.0) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
    return jnp.where(hit, t, _BIG), u, v


def _block_best(dist, u, v, b, nb):
    """Per-ray winner within a block: (dist, local idx, onehot, u, v)."""
    j = jnp.argmin(dist, axis=-1)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (b, nb), 1)
    oh_best = col_ids == j[:, None]
    d_best = jnp.min(dist, axis=-1)
    u_best = jnp.sum(jnp.where(oh_best, u, 0.0), axis=-1)
    v_best = jnp.sum(jnp.where(oh_best, v, 0.0), axis=-1)
    return d_best, j, oh_best, u_best, v_best


def _plane(x, g):
    return x.reshape(g, 128)


def _closest_kernel(o_ref, d_ref, xu_ref, xv_ref, xw_ref, out_ref,
                    *, n_pad: int, nb: int):
    b = o_ref.shape[0]
    g = b // 128
    oh, dh = _homogeneous(o_ref, d_ref)
    oh_split, dh_split = _hi_lo(oh), _hi_lo(dh)

    def body(i, carry):
        best_dist, best_prim, best_u, best_v = carry
        dist, u, v = _block_hits(oh_split, dh_split, xu_ref, xv_ref, xw_ref, i, nb)
        d_best, j, _, u_best, v_best = _block_best(dist, u, v, b, nb)
        closer = d_best < best_dist
        return (
            jnp.minimum(best_dist, d_best),
            jnp.where(closer, j + i * nb, best_prim),
            jnp.where(closer, u_best, best_u),
            jnp.where(closer, v_best, best_v),
        )

    init = (
        jnp.full((b,), _BIG, jnp.float32),
        jnp.full((b,), NULL_PRIMITIVE, jnp.int32),
        jnp.zeros((b,), jnp.float32),
        jnp.zeros((b,), jnp.float32),
    )
    best_dist, best_prim, best_u, best_v = jax.lax.fori_loop(
        0, n_pad // nb, body, init
    )

    missed = best_dist >= _BIG
    out_ref[0, :, :] = _plane(jnp.where(missed, jnp.inf, best_dist), g)
    out_ref[1, :, :] = _plane(best_u, g)
    out_ref[2, :, :] = _plane(best_v, g)
    out_ref[3, :, :] = _plane(
        jnp.where(missed, NULL_PRIMITIVE, best_prim).astype(jnp.float32), g
    )


def _primary_kernel(o_ref, d_ref, xu_ref, xv_ref, xw_ref, attr_ref, mat_ref,
                    out_ref, *, n_pad: int, nb: int, m_pad: int):
    b = o_ref.shape[0]
    g = b // 128
    oh, dh = _homogeneous(o_ref, d_ref)
    oh_split, dh_split = _hi_lo(oh), _hi_lo(dh)

    def body(i, carry):
        best_dist, best_prim, best_u, best_v, best_attr = carry
        dist, u, v = _block_hits(oh_split, dh_split, xu_ref, xv_ref, xw_ref, i, nb)
        d_best, j, oh_best, u_best, v_best = _block_best(dist, u, v, b, nb)
        col = pl.multiple_of(i * nb, nb)
        attr_block = attr_ref[pl.ds(col, nb), :]  # [Nb, ATTR_COLS]
        attr_best = dot_exact_a(oh_best.astype(jnp.float32), attr_block)
        closer = d_best < best_dist
        return (
            jnp.minimum(best_dist, d_best),
            jnp.where(closer, j + i * nb, best_prim),
            jnp.where(closer, u_best, best_u),
            jnp.where(closer, v_best, best_v),
            jnp.where(closer[:, None], attr_best, best_attr),
        )

    init = (
        jnp.full((b,), _BIG, jnp.float32),
        jnp.full((b,), NULL_PRIMITIVE, jnp.int32),
        jnp.zeros((b,), jnp.float32),
        jnp.zeros((b,), jnp.float32),
        jnp.zeros((b, ATTR_COLS), jnp.float32),
    )
    best_dist, best_prim, best_u, best_v, a = jax.lax.fori_loop(
        0, n_pad // nb, body, init
    )

    missed = best_dist >= _BIG
    u = best_u[:, None]
    v = best_v[:, None]
    pos = a[:, 0:3] + u * a[:, 3:6] + v * a[:, 6:9]
    nrm = a[:, 9:12] + u * a[:, 12:15] + v * a[:, 15:18]
    nlen = jnp.sqrt(jnp.maximum(jnp.sum(nrm * nrm, axis=1, keepdims=True), 1e-20))
    nrm = nrm / nlen
    uv = a[:, 18:20] + u * a[:, 20:22] + v * a[:, 22:24]
    mat_id = a[:, 24].astype(jnp.int32)

    mcol = jax.lax.broadcasted_iota(jnp.int32, (b, m_pad), 1)
    oh_mat = (mcol == mat_id[:, None]).astype(jnp.float32)
    matp = dot_exact_a(oh_mat, mat_ref[:, :])

    out_ref[_CH_DIST, :, :] = _plane(jnp.where(missed, jnp.inf, best_dist), g)
    out_ref[_CH_U, :, :] = _plane(best_u, g)
    out_ref[_CH_V, :, :] = _plane(best_v, g)
    for k in range(3):
        out_ref[_CH_POS + k, :, :] = _plane(pos[:, k], g)
        out_ref[_CH_NORM + k, :, :] = _plane(nrm[:, k], g)
        out_ref[_CH_BCOLOR + k, :, :] = _plane(matp[:, 1 + k], g)
    out_ref[_CH_UV, :, :] = _plane(uv[:, 0], g)
    out_ref[_CH_UV + 1, :, :] = _plane(uv[:, 1], g)
    out_ref[_CH_MTYPE, :, :] = _plane(matp[:, 0], g)
    out_ref[_CH_METAL, :, :] = _plane(matp[:, 4], g)
    out_ref[_CH_ROUGH, :, :] = _plane(matp[:, 5], g)
    out_ref[_CH_IOR, :, :] = _plane(matp[:, 6], g)
    out_ref[_CH_BMAP, :, :] = _plane(matp[:, 7], g)
    out_ref[_CH_MMAP, :, :] = _plane(matp[:, 8], g)
    out_ref[_CH_RMAP, :, :] = _plane(matp[:, 9], g)
    out_ref[_CH_NMAP, :, :] = _plane(matp[:, 10], g)
    out_ref[_CH_MATID, :, :] = _plane(a[:, 24], g)
    out_ref[_CH_PRIM, :, :] = _plane(
        jnp.where(missed, NULL_PRIMITIVE, best_prim).astype(jnp.float32), g
    )


def _split_planes(xform: jnp.ndarray, n_pad: int):
    """[4, 3N] packed transforms -> three [4, n_pad] row planes."""
    n = xform.shape[1] // 3
    x = xform.reshape(4, n, 3)
    pad = n_pad - n
    planes = []
    for k in range(3):
        p = x[:, :, k]
        if pad:
            p = jnp.concatenate([p, jnp.zeros((4, pad), x.dtype)], axis=1)
        planes.append(p)
    return planes


def _pad_rays(o, d, r_pad, r):
    if r_pad != r:
        o = jnp.concatenate([o, jnp.zeros((r_pad - r, 3), o.dtype)])
        d = jnp.concatenate([d, jnp.ones((r_pad - r, 3), d.dtype)])
    return o, d


def build_prim_attr(verts, norms, uvs, mat_ids) -> np.ndarray:
    """Host precompute: packed per-triangle attribute rows [N, ATTR_COLS]."""
    v = np.asarray(verts, np.float32)  # [N, 3, 3]
    n = np.asarray(norms, np.float32)
    t = np.asarray(uvs, np.float32)  # [N, 3, 2]
    m = np.asarray(mat_ids, np.float32)
    a = np.zeros((v.shape[0], ATTR_COLS), np.float32)
    a[:, 0:3] = v[:, 0]
    a[:, 3:6] = v[:, 1] - v[:, 0]
    a[:, 6:9] = v[:, 2] - v[:, 0]
    a[:, 9:12] = n[:, 0]
    a[:, 12:15] = n[:, 1] - n[:, 0]
    a[:, 15:18] = n[:, 2] - n[:, 0]
    a[:, 18:20] = t[:, 0]
    a[:, 20:22] = t[:, 1] - t[:, 0]
    a[:, 22:24] = t[:, 2] - t[:, 0]
    a[:, 24] = m
    return a


def build_mat_attr(mat_type, base_color, metallic, roughness, ior,
                   base_map, metallic_map, roughness_map, normal_map) -> np.ndarray:
    """Host precompute: packed material rows [M, MAT_COLS]."""
    m = len(np.asarray(mat_type))
    a = np.zeros((m, MAT_COLS), np.float32)
    a[:, 0] = np.asarray(mat_type, np.float32)
    a[:, 1:4] = np.asarray(base_color, np.float32)
    a[:, 4] = np.asarray(metallic, np.float32)
    a[:, 5] = np.asarray(roughness, np.float32)
    a[:, 6] = np.asarray(ior, np.float32)
    a[:, 7] = np.asarray(base_map, np.float32)
    a[:, 8] = np.asarray(metallic_map, np.float32)
    a[:, 9] = np.asarray(roughness_map, np.float32)
    a[:, 10] = np.asarray(normal_map, np.float32)
    return a


@functools.partial(jax.jit, static_argnames=("tile", "nb", "interpret"))
def intersect_closest_pallas(
    xform, o, d, active=None, tile: int = 1024, nb: int = 128,
    interpret: bool = False,
):
    """Pallas closest-hit. Returns Hit(prim [R] i32, dist [R], bary [R,2])."""
    from ..intersect import Hit

    r = o.shape[0]
    n = xform.shape[1] // 3
    nb = min(nb, _round_up(n, 128))
    n_pad = _round_up(max(n, nb), nb)
    xu, xv, xw = _split_planes(xform, n_pad)

    r_pad = _round_up(r, tile)
    o, d = _pad_rays(o, d, r_pad, r)

    kernel = functools.partial(_closest_kernel, n_pad=n_pad, nb=nb)
    row = lambda i: (i, 0)  # noqa: E731
    full = lambda i: (0, 0)  # noqa: E731
    out = pl.pallas_call(
        kernel,
        grid=(r_pad // tile,),
        in_specs=[
            pl.BlockSpec((tile, 3), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 3), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((4, n_pad), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((4, n_pad), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((4, n_pad), full, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (4, tile // 128, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((4, r_pad // 128, 128), jnp.float32),
        interpret=interpret,
    )(o, d, xu, xv, xw)

    flat = out.reshape(4, r_pad)[:, :r]
    dist = flat[0]
    bary = jnp.stack([flat[1], flat[2]], axis=-1)
    prim = flat[3].astype(jnp.int32)
    if active is not None:
        dist = jnp.where(active, dist, jnp.inf)
        prim = jnp.where(active, prim, NULL_PRIMITIVE)
    return Hit(prim_id=prim, dist=dist, bary=bary)


def test_occlusion_pallas(xform, x, y, active=None, **kw) -> jnp.ndarray:
    """Any-hit between x and y via the closest-hit kernel, with the
    reference's offset/epsilon contract (scene.h:286-316)."""
    seg = y - x
    dist = jnp.sqrt(jnp.sum(seg * seg, axis=-1))
    d = seg / jnp.maximum(dist, 1e-20)[..., None]
    o = x + d * 1e-5
    limit = dist - 1e-4 * 2.0

    hit = intersect_closest_pallas(xform, o, d, active=active, **kw)
    occluded = (hit.prim_id != NULL_PRIMITIVE) & (hit.dist < limit)
    if active is not None:
        occluded = occluded & active
    return occluded


@functools.partial(jax.jit, static_argnames=("tile", "nb", "interpret"))
def primary_hit_pallas(
    xform, prim_attr, mat_attr, o, d,
    tile: int = 1024, nb: int = 128, interpret: bool = False,
):
    """Fused closest-hit + interaction assembly + material fetch.

    Returns (prim [R] i32, dist [R], bary [R,2], pos [R,3], norm [R,3],
    uv [R,2], mat_params [R, 12]) where mat_params columns are
    (type, base_color*3, metallic, roughness, ior, base/metallic/
    roughness/normal map ids, mat_id). Miss lanes: prim NULL, attrs 0.
    """
    r = o.shape[0]
    n = xform.shape[1] // 3
    nb = min(nb, _round_up(n, 128))
    n_pad = _round_up(max(n, nb), nb)
    xu, xv, xw = _split_planes(xform, n_pad)

    attr = prim_attr
    if n_pad != attr.shape[0]:
        attr = jnp.concatenate(
            [attr, jnp.zeros((n_pad - attr.shape[0], ATTR_COLS), attr.dtype)]
        )
    m = mat_attr.shape[0]
    m_pad = _round_up(m, 8)
    mat = mat_attr
    if m_pad != m:
        mat = jnp.concatenate([mat, jnp.zeros((m_pad - m, MAT_COLS), mat.dtype)])

    r_pad = _round_up(r, tile)
    o, d = _pad_rays(o, d, r_pad, r)

    kernel = functools.partial(_primary_kernel, n_pad=n_pad, nb=nb, m_pad=m_pad)
    row = lambda i: (i, 0)  # noqa: E731
    full = lambda i: (0, 0)  # noqa: E731
    out = pl.pallas_call(
        kernel,
        grid=(r_pad // tile,),
        in_specs=[
            pl.BlockSpec((tile, 3), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 3), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((4, n_pad), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((4, n_pad), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((4, n_pad), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, ATTR_COLS), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((m_pad, MAT_COLS), full, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (_PRIMARY_CHANNELS, tile // 128, 128),
            lambda i: (0, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (_PRIMARY_CHANNELS, r_pad // 128, 128), jnp.float32
        ),
        interpret=interpret,
    )(o, d, xu, xv, xw, attr, mat)

    ch = out.reshape(_PRIMARY_CHANNELS, r_pad)[:, :r]
    prim = ch[_CH_PRIM].astype(jnp.int32)
    dist = ch[_CH_DIST]
    bary = jnp.stack([ch[_CH_U], ch[_CH_V]], axis=-1)
    pos = ch[_CH_POS:_CH_POS + 3].T
    norm = ch[_CH_NORM:_CH_NORM + 3].T
    uv = ch[_CH_UV:_CH_UV + 2].T
    matp = jnp.concatenate(
        [
            ch[_CH_MTYPE][None],
            ch[_CH_BCOLOR:_CH_BCOLOR + 3],
            ch[_CH_METAL][None],
            ch[_CH_ROUGH][None],
            ch[_CH_IOR][None],
            ch[_CH_BMAP][None],
            ch[_CH_MMAP][None],
            ch[_CH_RMAP][None],
            ch[_CH_NMAP][None],
            ch[_CH_MATID][None],
        ],
        axis=0,
    ).T  # [R, 12]
    return prim, dist, bary, pos, norm, uv, matp
