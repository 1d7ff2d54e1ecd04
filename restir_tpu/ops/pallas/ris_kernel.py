"""Pallas TPU kernel: fused ReSTIR DI candidate stage (CDF light sampling).

Implements the TPU-native candidate generation of models/restir_di.py's
cdf mode entirely on-chip, per ray tile:

  1. per-(ray, light) target weights T via bilinear matmuls on the MXU
     (see ops/lights.sample_light_cdf for the math);
  2. per-ray CDF via one [L, L] lower-triangular matmul (Mosaic has no
     lane/sublane cumsum);
  3. K candidate draws: inverse-CDF select (compare+sum), light-row
     fetch via a [C, L] @ [L, B] one-hot matmul, uniform point on the
     triangle, exact solid-angle pdf, full demodulated BSDF target
     (Lambertian + GGX), streaming reservoir update — all in VMEM,
     RNG = counter-based pcg4d evaluated in-kernel (same stream as
     utils/rng.py);
  4. one packed [10, B/128, 128] output: reservoir (li, wi, dist,
     weight, M).

Layout note: per-(ray, light) matrices live as [L, B] — rays on lanes,
lights on sublanes — because Mosaic cannot reshape/broadcast through a
minor dim < 128 (no [B, 1] intermediates exist in this orientation).

Light table row layout ([LIGHT_COLS, L]): v0(3) e1(3) e2(3) normal(3)
radiance(3) area(1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# input channel layout ([CIN, R/128, 128])
_IN_POS, _IN_NORM, _IN_WO = 0, 3, 6
_IN_MTYPE, _IN_METAL, _IN_ROUGH, _IN_SHADE, _IN_PRIM = 9, 10, 11, 12, 13
CIN = 14
# output channel layout ([COUT, R/128, 128])
COUT = 10  # li(3) wi(3) dist(1) weight(1) m(1) pad(1)

LIGHT_COLS = 16
_PI = 3.14159265358979
_INV_PI = 1.0 / _PI

_LAMBERTIAN, _METALLIC = 0.0, 1.0


def _u32(x):
    return x.astype(jnp.uint32)


def _pcg4d(a, b, c, d):
    k1 = jnp.uint32(1664525)
    k2 = jnp.uint32(1013904223)
    vx = _u32(a) * k1 + k2
    vy = _u32(b) * k1 + k2
    vz = _u32(c) * k1 + k2
    vw = _u32(d) * k1 + k2
    vx = vx + vy * vw
    vy = vy + vz * vx
    vz = vz + vx * vy
    vw = vw + vy * vz
    vx = vx ^ (vx >> 16)
    vy = vy ^ (vy >> 16)
    vz = vz ^ (vz >> 16)
    vw = vw ^ (vw >> 16)
    vx = vx + vy * vw
    vy = vy + vz * vx
    vz = vz + vx * vy
    vw = vw + vy * vz
    return vx, vy, vz, vw


def _unit(bits):
    # top 24 bits; route through int32 (Mosaic lacks a u32->f32 cast)
    return (bits >> 8).astype(jnp.int32).astype(jnp.float32) * jnp.float32(
        1.0 / (1 << 24)
    )


def _dot3(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def _eval_bsdf_lum(mtype, metallic, roughness, nx, ny, nz, wox, woy, woz,
                   wix, wiy, wiz, has_met=True):
    """Luminance of the demodulated BSDF (baseColor = 1): lambert + GGX
    metallic workflow, dielectric -> 0 (delta). Mirrors ops/bsdf.
    has_met=False (static, cfg.scene_has_metallic) drops the whole GGX
    chain (~33 ops) for scenes with no metallic materials."""
    if not has_met:
        return jnp.where(mtype == _LAMBERTIAN, _INV_PI, 0.0)
    cos_o = _dot3(nx, ny, nz, wox, woy, woz)
    cos_i = _dot3(nx, ny, nz, wix, wiy, wiz)

    lam = jnp.full_like(cos_o, _INV_PI)

    hx, hy, hz = wox + wix, woy + wiy, woz + wiz
    # per-component division, NOT reciprocal-multiply or rsqrt: the GTR2
    # denominator cancels catastrophically near cos_h = 1, so last-ulp
    # differences vs mathx.safe_normalize show up at 1e-4 relative
    hl = jnp.maximum(jnp.sqrt(hx * hx + hy * hy + hz * hz), 1e-20)
    hx, hy, hz = hx / hl, hy / hl, hz / hl
    alpha = roughness * roughness
    cos_h = _dot3(nx, ny, nz, hx, hy, hz)
    hdoto = _dot3(hx, hy, hz, wox, woy, woz)

    aa = alpha * alpha
    denom = cos_h * cos_h * (aa - 1.0) + 1.0
    d_ggx = jnp.where(
        cos_h < 1e-6, 0.0, aa / jnp.maximum(denom * denom * _PI, 1e-20)
    )
    a_half = alpha * 0.5

    def schlick_g(c):
        c = jnp.abs(c)
        return c / jnp.maximum(c * (1.0 - a_half) + a_half, 1e-20)

    g = schlick_g(cos_o) * schlick_g(cos_i)
    f0 = 0.08 * (1.0 - metallic) + metallic
    # UNclamped Schlick in mix() form — ops/bsdf.fresnel_schlick exactly
    one_m = 1.0 - hdoto
    p5 = one_m * one_m
    p5 = p5 * p5 * one_m
    fr = f0 * (1.0 - p5) + p5
    spec = g * d_ggx / jnp.maximum(4.0 * cos_i * cos_o, 1e-20)
    diffuse = _INV_PI * (1.0 - metallic)
    met = diffuse * (1.0 - fr) + spec * fr
    met = jnp.where(cos_i * cos_o >= 1e-7, met, 0.0)

    return jnp.where(
        mtype == _LAMBERTIAN, lam, jnp.where(mtype == _METALLIC, met, 0.0)
    )


def _ris_kernel(in_ref, psi_a_ref, psi_b_ref, psi_c_ref, lumarea_ref,
                tri_lo_ref, light_ref, xu_ref, xv_ref, xw_ref, looper_ref,
                out_ref, *, l_pad: int, k: int, single_sided: bool,
                ctr_base: int, n_pad: int, nb: int, has_met: bool = True):
    cg = in_ref.shape[1]  # tile/128
    b = cg * 128

    def ch(i):
        return in_ref[i, :, :].reshape(b)

    px, py, pz = ch(_IN_POS), ch(_IN_POS + 1), ch(_IN_POS + 2)
    nx, ny, nz = ch(_IN_NORM), ch(_IN_NORM + 1), ch(_IN_NORM + 2)
    wox, woy, woz = ch(_IN_WO), ch(_IN_WO + 1), ch(_IN_WO + 2)
    mtype = ch(_IN_MTYPE)
    metallic = ch(_IN_METAL)
    roughness = ch(_IN_ROUGH)
    shade = ch(_IN_SHADE) > 0.5
    tile_id = pl.program_id(0)
    pix = tile_id * b + jax.lax.broadcasted_iota(jnp.int32, (b, 1), 0).reshape(b)
    looper = looper_ref[0]

    # ---- bilinear target weights over all lights (MXU), [L, B]
    from .intersect_kernel import dot_exact_a, dot_exact_b, dot_f32x3, _hi_lo

    ndx = _dot3(nx, ny, nz, px, py, pz)
    ones_b = jnp.ones_like(px)
    phi_a = jnp.stack([nx, ny, nz, -ndx], axis=0)  # [4, B]
    a = dot_f32x3(psi_a_ref[:, :], phi_a)
    phi_b = jnp.stack([px, py, pz, ones_b], axis=0)
    bb = dot_f32x3(psi_b_ref[:, :], phi_b)
    x2 = px * px + py * py + pz * pz
    phi_c = jnp.stack([-2.0 * px, -2.0 * py, -2.0 * pz, ones_b, x2], axis=0)
    d2 = jnp.maximum(dot_f32x3(psi_c_ref[:, :], phi_c), 1e-8)
    side = bb > 0.0 if single_sided else jnp.abs(bb) > 0.0
    # conservative horizon cull + clamped selection weight — must mirror
    # ops/lights.sample_light_cdf exactly (see its comment)
    lum_area = lumarea_ref[:, 0:1]
    rad = lumarea_ref[:, 1:2]
    above = (a + rad) > 0.0
    a_eff = jnp.maximum(a, 0.1 * rad)
    t = jnp.where(
        above & side, lum_area * a_eff * jnp.abs(bb) / (d2 * d2), 0.0
    )  # [L, B]

    # ---- CDF via lower-triangular matmul: cdf_l = sum_{l' <= l} T_l'
    # (the 0/1 triangular mask is bf16-exact: 3 split passes, f32-exact)
    cdf = dot_exact_a(tri_lo_ref[:, :], t)
    total = cdf[l_pad - 1, :]  # [B]
    has_any = total > 0.0

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (l_pad, b), 0)
    from .intersect_kernel import _hi_mid_lo

    light_split = _hi_mid_lo(light_ref[:, :])  # hoisted out of the K loop

    # ---- K candidate draws + streaming reservoir (all [B] registers)
    zero = jnp.zeros_like(px)
    ws, attrs = [], []
    r_sel = None

    for kk in range(k):
        u1, u2, u3, u4 = _pcg4d(
            pix, jnp.full((b,), looper, jnp.uint32),
            jnp.full((b,), ctr_base + kk, jnp.uint32),
            jnp.full((b,), 0x02, jnp.uint32),
        )
        r1, r2, r3, r4 = _unit(u1), _unit(u2), _unit(u3), _unit(u4)
        if kk == 0:
            r_sel = r4  # selection draw (see winner pick below)

        thresh = r1 * total
        below = (cdf <= thresh[None, :]).astype(jnp.int32)
        idx = jnp.minimum(jnp.sum(below, axis=0), l_pad - 1)  # [B]
        onehot = row_ids == idx[None, :]  # [L, B]
        q = jnp.sum(jnp.where(onehot, t, 0.0), axis=0) / jnp.maximum(total, 1e-20)
        fetch = dot_exact_b(
            light_ref[:, :], onehot.astype(jnp.float32), a_split=light_split
        )  # [LIGHT_COLS, B]

        # uniform point on the triangle (mathUtil.h:94 sqrt warp, same
        # (ru, rv) = (r2, r3) convention as utils.math.sample_triangle_uniform)
        sr = jnp.sqrt(jnp.maximum(r3, 0.0))
        bu = 1.0 - sr
        bv = r2 * sr
        sx = fetch[0] + bu * fetch[3] + bv * fetch[6]
        sy = fetch[1] + bu * fetch[4] + bv * fetch[7]
        sz = fetch[2] + bu * fetch[5] + bv * fetch[8]
        lnx, lny, lnz = fetch[9], fetch[10], fetch[11]
        li_x, li_y, li_z = fetch[12], fetch[13], fetch[14]
        area = fetch[15]

        tox, toy, toz = sx - px, sy - py, sz - pz
        dist2 = jnp.maximum(tox * tox + toy * toy + toz * toz, 1e-20)
        inv_dist = jax.lax.rsqrt(dist2)
        dist = dist2 * inv_dist
        wix, wiy, wiz = tox * inv_dist, toy * inv_dist, toz * inv_dist

        cos_l = _dot3(lnx, lny, lnz, wix, wiy, wiz)
        pdf = q * dist2 / jnp.maximum(area * jnp.abs(cos_l), 1e-20)
        if single_sided:
            pdf = jnp.where(cos_l <= -1e-6, pdf, -1.0)
        pdf = jnp.where(has_any & (q > 0.0), pdf, -1.0)

        f_lum = _eval_bsdf_lum(
            mtype, metallic, roughness, nx, ny, nz, wox, woy, woz,
            wix, wiy, wiz, has_met=has_met,
        )
        li_lum = 0.2126 * li_x + 0.7152 * li_y + 0.0722 * li_z
        cos_s = jnp.maximum(_dot3(nx, ny, nz, wix, wiy, wiz), 0.0)
        p_hat = li_lum * f_lum * cos_s
        w = p_hat / pdf
        bad = jnp.isnan(w) | jnp.isinf(w) | (pdf <= 0.0)
        w = jnp.where(bad | ~shade, 0.0, w)
        ws.append(w)
        attrs.append((li_x, li_y, li_z, wix, wiy, wiz, dist))

    # single-draw inverse-CDF winner: P(pick k) = w_k / W, the same
    # distribution as the reference's K streaming updates (restir.h:38-44)
    # — mirrors models/restir_di._ris_cdf bit-for-bit
    cums = []
    c = ws[0]
    for kk in range(1, k):
        cums.append(c)
        c = c + ws[kk]
    r_weight = c
    thresh = r_sel * r_weight
    jsel = jnp.zeros_like(r_weight)
    for cj in cums:
        jsel = jsel + (cj <= thresh).astype(jnp.float32)
    gate = shade & (r_weight > 0.0)
    r_li_x, r_li_y, r_li_z = zero, zero, zero
    r_wi_x, r_wi_y, r_wi_z = zero, zero, zero
    r_dist = zero
    for kk in range(k):
        take = gate & (jsel == float(kk))
        li_x, li_y, li_z, wix, wiy, wiz, dist = attrs[kk]
        r_li_x = jnp.where(take, li_x, r_li_x)
        r_li_y = jnp.where(take, li_y, r_li_y)
        r_li_z = jnp.where(take, li_z, r_li_z)
        r_wi_x = jnp.where(take, wix, r_wi_x)
        r_wi_y = jnp.where(take, wiy, r_wi_y)
        r_wi_z = jnp.where(take, wiz, r_wi_z)
        r_dist = jnp.where(take, dist, r_dist)

    m_count = jnp.where(shade, float(k), 0.0)

    # ---- winner visibility in-kernel (restir.cu:172-176): brute-force
    # any-hit over triangle blocks; occluded => weight 0. The origin
    # primitive is excluded by id, so DEFAULT matmul precision suffices
    # at the near end; the far end uses a relative distance margin.
    prim_origin = ch(_IN_PRIM).astype(jnp.int32)
    ox = px + r_wi_x * 1e-5
    oy = py + r_wi_y * 1e-5
    oz = pz + r_wi_z * 1e-5
    limit = r_dist * (1.0 - 1e-3) - 1e-4
    oh4 = jnp.stack([ox, oy, oz, jnp.ones_like(ox)], axis=0)  # [4, B]
    dh4 = jnp.stack([r_wi_x, r_wi_y, r_wi_z, jnp.zeros_like(ox)], axis=0)
    oh4_split = _hi_lo(oh4)
    dh4_split = _hi_lo(dh4)

    n_blocks = n_pad // nb

    def vis_body(i, occluded):
        col = pl.multiple_of(i * nb, nb)
        xu = xu_ref[:, pl.ds(col, nb)]  # [4, nb]
        xv = xv_ref[:, pl.ds(col, nb)]
        xw = xw_ref[:, pl.ds(col, nb)]
        # [nb, B] hit matrices: triangles on sublanes, rays on lanes
        oou = dot_f32x3(xu.T, None, b_split=oh4_split)
        oov = dot_f32x3(xv.T, None, b_split=oh4_split)
        oow = dot_f32x3(xw.T, None, b_split=oh4_split)
        ddu = dot_f32x3(xu.T, None, b_split=dh4_split)
        ddv = dot_f32x3(xv.T, None, b_split=dh4_split)
        ddw = dot_f32x3(xw.T, None, b_split=dh4_split)
        nondeg = jnp.abs(ddw) >= 1e-12
        tt = -oow / jnp.where(nondeg, ddw, 1.0)
        uu = oou + tt * ddu
        vv = oov + tt * ddv
        tri_ids = jax.lax.broadcasted_iota(jnp.int32, (nb, b), 0) + i * nb
        blocked = (
            nondeg & (tt > 0.0) & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
            & (tt < limit[None, :])
            & (tri_ids != prim_origin[None, :])
        )
        # f32 carry: Mosaic cannot thread 1-D i1 vectors through scf.for
        return jnp.maximum(
            occluded, jnp.max(blocked.astype(jnp.float32), axis=0)
        )

    occluded = jax.lax.fori_loop(
        0, n_blocks, vis_body, jnp.zeros_like(r_weight)
    )
    r_weight = jnp.where(occluded > 0.5, 0.0, r_weight)

    def put(i, val):
        out_ref[i, :, :] = val.reshape(cg, 128)

    put(0, r_li_x)
    put(1, r_li_y)
    put(2, r_li_z)
    put(3, r_wi_x)
    put(4, r_wi_y)
    put(5, r_wi_z)
    put(6, r_dist)
    put(7, r_weight)
    put(8, m_count)
    put(9, jnp.zeros_like(r_weight))


def _round_up(x, m):
    return -(-x // m) * m


def build_light_tables(light_verts, light_normal, light_radiance, light_area,
                       light_center, light_radius, l_pad: int,
                       env_tile_rad=None, env_tile_uv=None, env_tile_sa=None):
    """Per-frame constant tables for the CDF candidate stage, padded to
    l_pad rows: (psi_a, psi_b, psi_c, lum_aux, tri_lo, light_table).

    When env tables are given, the ENV_TILE rows join as "virtual
    lights" after the area rows (mirrors ops/lights.sample_light_cdf's
    has_env branch): their psi rows evaluate the target
    T = lum*sa * relu-ish(n . d_tile) through the SAME three matmuls —
    psi_a = (d_tile, 0) so a = n.d; psi_b = (0,0,0,1) so b = 1;
    psi_c = (0,0,0,1,0) so d2 = 1. Their light_table columns carry
    (u0,v0,0| du,0,0| dv,0,0| 0,0,0| tile radiance | tile solid angle).
    """
    nl = light_verts.shape[0]

    lv9 = light_verts.reshape(nl, 9).astype(jnp.float32)
    ln = light_normal.astype(jnp.float32)
    lr = light_radiance.astype(jnp.float32)
    la = light_area.astype(jnp.float32)
    lc = light_center.astype(jnp.float32)
    lrad = light_radius.astype(jnp.float32)

    table = jnp.concatenate(
        [
            lv9[:, 0:3],
            lv9[:, 3:6] - lv9[:, 0:3],
            lv9[:, 6:9] - lv9[:, 0:3],
            ln,
            lr,
            la[:, None],
        ],
        axis=1,
    )  # [nl, LIGHT_COLS]

    psi_a = jnp.concatenate([lc, jnp.ones((nl, 1))], axis=1)  # [nl, 4]
    psi_b = jnp.concatenate(
        [ln, -jnp.sum(ln * lc, axis=-1, keepdims=True)], axis=1
    )
    c2 = jnp.sum(lc * lc, axis=-1, keepdims=True)
    # phi_c rows are (-2px, -2py, -2pz, 1, |x|^2); psi columns must be
    # (cx, cy, cz, |c|^2, 1) so that the product is |x|^2 - 2 x.c + |c|^2
    psi_c = jnp.concatenate([lc, c2, jnp.ones((nl, 1))], axis=1)
    lum = 0.2126 * lr[:, 0] + 0.7152 * lr[:, 1] + 0.0722 * lr[:, 2]
    lum_aux = jnp.stack([lum * la, lrad], axis=1)  # [nl, 2]

    if env_tile_rad is not None:
        et = env_tile_rad.shape[0]
        euv = env_tile_uv.astype(jnp.float32)
        erad = env_tile_rad.astype(jnp.float32)
        esa = env_tile_sa.astype(jnp.float32)
        # tile-center directions (to_sphere, mathUtil.h:134)
        uc = (euv[:, 0] + 0.5 * euv[:, 2]) * (2.0 * _PI)
        vc = (euv[:, 1] + 0.5 * euv[:, 3]) * _PI
        st = jnp.sin(vc)
        d_t = jnp.stack(
            [jnp.cos(uc) * st, jnp.cos(vc), jnp.sin(uc) * st], axis=-1
        )
        psi_a = jnp.concatenate(
            [psi_a, jnp.concatenate([d_t, jnp.zeros((et, 1))], axis=1)]
        )
        psi_b = jnp.concatenate(
            [psi_b,
             jnp.concatenate([jnp.zeros((et, 3)), jnp.ones((et, 1))], axis=1)]
        )
        psi_c_env = jnp.concatenate(
            [jnp.zeros((et, 3)), jnp.ones((et, 1)), jnp.zeros((et, 1))],
            axis=1,
        )
        psi_c = jnp.concatenate([psi_c, psi_c_env])
        ang = 0.5 * jnp.sqrt(
            (_PI * euv[:, 3]) ** 2 + (2.0 * _PI * euv[:, 2]) ** 2
        )
        elum = 0.2126 * erad[:, 0] + 0.7152 * erad[:, 1] + 0.0722 * erad[:, 2]
        lum_aux = jnp.concatenate(
            [lum_aux, jnp.stack([elum * esa, ang], axis=1)]
        )
        zero3 = jnp.zeros((et, 3))
        etab = jnp.concatenate(
            [
                jnp.stack([euv[:, 0], euv[:, 1], jnp.zeros(et)], axis=1),
                jnp.stack([euv[:, 2], jnp.zeros(et), jnp.zeros(et)], axis=1),
                jnp.stack([euv[:, 3], jnp.zeros(et), jnp.zeros(et)], axis=1),
                zero3,
                erad,
                esa[:, None],
            ],
            axis=1,
        )
        table = jnp.concatenate([table, etab])

    rows = table.shape[0]

    def padl(x):
        if x.shape[0] == l_pad:
            return x
        return jnp.concatenate(
            [x, jnp.zeros((l_pad - x.shape[0],) + x.shape[1:], jnp.float32)]
        )

    light_table = padl(table).T  # [LIGHT_COLS, l_pad]
    psi_a = padl(psi_a)
    psi_b = padl(psi_b)
    psi_c = padl(psi_c)
    lum_aux = padl(lum_aux)
    tri_lo = jnp.tril(jnp.ones((l_pad, l_pad), jnp.float32))
    return psi_a, psi_b, psi_c, lum_aux, tri_lo, light_table


@functools.partial(
    jax.jit, static_argnames=("k", "single_sided", "ctr_base", "tile", "nb",
                              "has_met", "interpret")
)
def ris_cdf_pallas(
    pos, norm, wo, mtype, metallic, roughness, shade, prim_id, looper,
    light_verts, light_normal, light_radiance, light_area, light_center,
    light_radius, tri_xform,
    k: int = 4, single_sided: bool = True, ctr_base: int = 8,
    tile: int = 1024, nb: int = 128, has_met: bool = True,
    interpret: bool = False,
):
    """Fused candidate stage + winner visibility. Returns a reservoir
    SoA tuple (li [R,3], wi [R,3], dist [R], weight [R], m [R] int32)
    with occluded winners' weights already zeroed."""
    r = pos.shape[0]
    nl = light_verts.shape[0]
    l_pad = _round_up(max(nl, 128), 128)
    psi_a, psi_b, psi_c, lum_area, tri_lo, light_table = build_light_tables(
        light_verts, light_normal, light_radiance, light_area, light_center,
        light_radius, l_pad,
    )

    r_pad = _round_up(r, tile)

    def padr(x, fill=0.0):
        if x.shape[0] == r_pad:
            return x
        pad = jnp.full((r_pad - x.shape[0],) + x.shape[1:], fill, x.dtype)
        return jnp.concatenate([x, pad])

    g = r_pad // 128
    chans = jnp.stack(
        [
            padr(pos[:, 0]), padr(pos[:, 1]), padr(pos[:, 2]),
            padr(norm[:, 0]), padr(norm[:, 1]), padr(norm[:, 2]),
            padr(wo[:, 0]), padr(wo[:, 1]), padr(wo[:, 2]),
            padr(mtype.astype(jnp.float32)),
            padr(metallic), padr(roughness),
            padr(shade.astype(jnp.float32)),
            padr(prim_id.astype(jnp.float32), fill=-1.0),
        ]
    ).reshape(CIN, g, 128)

    n_tri = tri_xform.shape[1] // 3
    nb = min(nb, _round_up(n_tri, 128))
    n_pad = _round_up(max(n_tri, nb), nb)
    from .intersect_kernel import _split_planes

    xu, xv, xw = _split_planes(tri_xform, n_pad)

    kernel = functools.partial(
        _ris_kernel, l_pad=l_pad, k=k, single_sided=single_sided,
        ctr_base=ctr_base, n_pad=n_pad, nb=nb, has_met=has_met,
    )
    tg = tile // 128
    out = pl.pallas_call(
        kernel,
        grid=(r_pad // tile,),
        in_specs=[
            pl.BlockSpec((CIN, tg, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((l_pad, 4), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((l_pad, 4), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((l_pad, 5), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((l_pad, 2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((l_pad, l_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (LIGHT_COLS, l_pad), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((4, n_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, n_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, n_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (COUT, tg, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((COUT, g, 128), jnp.float32),
        interpret=interpret,
    )(chans, psi_a, psi_b, psi_c, lum_area, tri_lo, light_table,
      xu, xv, xw, jnp.asarray([looper], jnp.uint32))

    ch = out.reshape(COUT, r_pad)[:, :r]
    li = ch[0:3].T
    wi = ch[3:6].T
    dist = ch[6]
    weight = ch[7]
    m = ch[8].astype(jnp.int32)
    return li, wi, dist, weight, m
