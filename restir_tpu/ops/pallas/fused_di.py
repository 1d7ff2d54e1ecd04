"""Fully fused ReSTIR DI frame: three Pallas kernels, zero XLA glue.

Round-1 profiling (BASELINE.md) showed the DI frame spending ~400 ms of
its 710 ms in XLA *between* the kernels: every [R, 3] / [R, 1] tensor is
tile-padded 128x on TPU (a 2M-pixel boolean mask costs 253 MB), so the
whole-frame array ops around the kernels were pure padded-layout
traffic. This module keeps every per-pixel quantity in ONE channel-major
[C, R/128, 128] f32 tensor end-to-end:

  kernel G (gbuffer):   camera raygen + closest hit + attribute/material
                        interpolation + motion reprojection
                        -> gb pack   [GB_CH, R]      (gbuffer.cu:3-73)
  kernel R (reuse):     RIS candidates (CDF mode) + winner visibility +
                        TEMPORAL merge (windowed in-kernel motion gather)
                        -> pt pack   [PT_CH, R]      (restir.cu:111-188)
  kernel S (spatial):   5-neighbor spatial merges + shade + accumulate
                        -> radiance  [3, R]          (restir.cu:190-230)

The temporal motion gather — a per-pixel random gather XLA lowers to a
~24 ms relayout — becomes a per-tile windowed one-hot matmul: the
previous frame's reuse rows live in HBM, each tile DMAs the [PT_CH, S]
window starting at its pixels' minimum motion index (computed in XLA,
passed via scalar prefetch) and gathers in-VMEM with an exact
bf16-split one-hot matmul. Pixels whose motion falls outside the window
are treated as reprojection failures (same fallback as a geometry
mismatch).

Spatial reuse deviation (vs restir.cu:53): neighbor disk offsets are
drawn per (tile, neighbor, frame) instead of per pixel — a per-pixel
offset would need a [21k, B] gather per neighbor. Offsets re-randomize
every frame and every 1024-pixel tile, so there is no frame-wide
correlation (the round-1 XLA path shared offsets across the whole
frame); the merge randomness and similarity rejection remain per-pixel.

The fused path covers env maps (env-tile CDF rows sampled alongside
area lights), base-color AND metallic/roughness/normal-map textures
(mip-clamped VMEM atlas, aux maps behind one per-tile cond), EAW and
SVGF denoisers (kernel T temporal accumulation + plane wavelets), and
multi-chip row-band sharding (parallel/fused_sharding.py).

Eligibility (the model falls back to models/restir_di.py otherwise):
RESTIR_DI tracer, brute/clustered intersector, cdf RIS mode, pcg4d
sampler, no DoF, W % 128 == 0 and H % 8 == 0 — see
models/restir_di_fused.eligible and `eligible` below.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect_kernel import (
    ATTR_COLS,
    MAT_COLS,
    NULL_PRIMITIVE,
    _BIG,
    _bdot,
    _hi_lo,
    _hi_mid_lo,
    _round_up,
    _split_planes,
    dot_exact_a,
    dot_exact_b,
    dot_f32x3,
)
from .ris_kernel import (
    LIGHT_COLS,
    _dot3,
    _eval_bsdf_lum,
    _pcg4d,
    _unit,
    build_light_tables,
)

# material type constants (scene/scene_data.py:35-39)
_LAMBERTIAN, _METALLIC, _DIELECTRIC, _LIGHT = 0.0, 1.0, 2.0, 4.0
LIGHT_ID = -2.0  # gbuffer light remap (gbuffer.cu:31)
_NULL = -1.0

# rng counter layout (must match models/restir_di.py + utils/rng.py salts)
_SALT_CAMERA = 0x01
_SALT_RESTIR = 0x02
_CTR_TEMPORAL = 0
_CTR_SPATIAL = 1
_CTR_RIS = 8

# ---- gb pack channel layout ([GB_CH, R]) ----
G_POS = 0  # 3: world hit position (0 on miss)
G_NORM = 3  # 3: interpolated shading normal (0 on miss)
G_DIR = 6  # 3: primary ray direction
G_ALB = 9  # 3: demodulation albedo (base color; 0 on miss)
G_DEPTH = 12  # camera distance (1 on miss)
G_MOTION = 13  # last-frame linear pixel index (-1 invalid, 0 on miss)
G_PRIMR = 14  # matId | LIGHT_ID | NULL (prim remap, gbuffer.cu:28-42)
G_MTYPE = 15
G_METAL = 16
G_ROUGH = 17
G_SHADE = 18  # valid & ~is_light
G_LIGHT = 19  # is_light
G_MISS = 20
G_PRIM = 21  # true triangle id (visibility self-exclusion)
G_X = 22  # raster x (copied from the const grid; used by kernel S)
G_Y = 23  # raster y
GB_CH = 24

# ---- pt (reuse) pack channel layout ([PT_CH, R]) ----
P_LI = 0  # 3
P_WI = 3  # 3
P_DIST = 6
P_WEIGHT = 7
P_M = 8
P_PRIMR = 9  # similarity attributes of the frame that wrote the pack
P_NORM = 10  # 3
P_DEPTH = 13
PT_CH = 16  # padded to a multiple of 8 (14 used)

# ---- rs (candidate reservoir) pack, kernel R1 -> R2 ([RS_CH, R]) ----
RS_LI = 0  # 3
RS_WI = 3  # 3
RS_DIST = 6
RS_W = 7
RS_CH = 8

_TILE = 1024
# below this triangle count, kernels G/R2 keep the whole geometry VMEM-
# resident (per-cluster DMA sync overhead beats the culling win)
_RESIDENT_MAX_TRIS = 1024
_EPI = 3.14159265358979
_ENV_DIST = 1.0e8  # ops/lights.ENV_DIST (vis ray = "until any hit")
# env tile grid (must match scene_data.ENV_TILE_H/W)
_ETH, _ETW = 16, 32


def _pseudo_angle_const(phi: float) -> float:
    """Monotone trig-free angle surrogate p(phi) in [0, 4): evaluated in
    PYTHON for static tile boundaries; the kernel computes the same p
    from (dx, dz) with ~6 VPU ops and compares against these."""
    import math

    ax_, az_ = math.cos(phi), math.sin(phi)
    p = az_ / (abs(ax_) + abs(az_) + 1e-20)
    if ax_ < 0:
        p = 2.0 - p
    elif az_ < 0:
        p = 4.0 + p
    return p


def _tex_bilinear(atlas_ref, meta, u_uv, v_uv):
    """Wrap-mode bilinear fetch from the fused mip-clamped atlas
    (image.h:41-74 semantics, mirrors ops/texture.bilinear_sample).

    atlas_ref: [384, rows_pad] with [c*128 + x, row] = texel (row,x,c);
    meta: (row0, w, h) as 1-D [B] f32 vectors. Each y-tap is one
    [384, rows] one-hot matmul (row fetch); each x-tap a 128-sublane
    lane select — no gathers, which Mosaic does not have.
    """
    b = u_uv.shape[0]
    rows = atlas_ref.shape[1]
    row0, tw, th = meta

    u = u_uv - jnp.floor(u_uv)
    v = v_uv - jnp.floor(v_uv)
    fx = u * tw - 0.5
    fy = v * th - 0.5
    ix = jnp.floor(fx)
    iy = jnp.floor(fy)
    lx = fx - ix
    ly = fy - iy

    def wrap(a, m):
        w_ = a - jnp.floor(a / m) * m
        return jnp.where(w_ >= m, 0.0, w_)  # guard f32 edge

    x0 = wrap(ix, tw)
    y0 = wrap(iy, th)
    x1 = wrap(x0 + 1.0, tw)
    y1 = wrap(y0 + 1.0, th)

    atlas_split = _hi_mid_lo(atlas_ref[:, :])
    rrow = jax.lax.broadcasted_iota(jnp.int32, (rows, b), 0)

    def row_fetch(y):
        oh = (rrow == (row0 + y).astype(jnp.int32)[None, :]).astype(
            jnp.float32
        )
        return dot_exact_b(None, oh, a_split=atlas_split)  # [384, B]

    f0 = row_fetch(y0)
    f1 = row_fetch(y1)
    lrow = jax.lax.broadcasted_iota(jnp.int32, (128, b), 0)
    oh_x0 = (lrow == x0.astype(jnp.int32)[None, :]).astype(jnp.float32)
    oh_x1 = (lrow == x1.astype(jnp.int32)[None, :]).astype(jnp.float32)

    out = []
    for c in range(3):
        blk0 = f0[c * 128:(c + 1) * 128, :]
        blk1 = f1[c * 128:(c + 1) * 128, :]
        c00 = jnp.sum(blk0 * oh_x0, axis=0)
        c10 = jnp.sum(blk0 * oh_x1, axis=0)
        c01 = jnp.sum(blk1 * oh_x0, axis=0)
        c11 = jnp.sum(blk1 * oh_x1, axis=0)
        cx0 = c00 + (c10 - c00) * lx
        cx1 = c01 + (c11 - c01) * lx
        out.append(cx0 + (cx1 - cx0) * ly)
    return out


def _procedural_tex(u_uv, v_uv):
    """Sine-grid procedural texture — mirrors ops/texture.
    procedural_texture (scene.h:68-76) with the same SALT_DEBUG
    pcg4d jitter stream."""
    cell = ((u_uv * 1024.0).astype(jnp.int32) * 1024
            + (v_uv * 1024.0).astype(jnp.int32))
    b = u_uv.shape[0]
    u1, u2, _, _ = _pcg4d(
        cell, jnp.zeros((b,), jnp.uint32), jnp.zeros((b,), jnp.uint32),
        jnp.full((b,), 0x7F, jnp.uint32),
    )
    rx, ry = _unit(u1), _unit(u2)
    two_pi = 2.0 * _EPI
    f = (jnp.sin(u_uv * 10.0 * two_pi + rx * two_pi) + 1.0) * 0.5
    g = (jnp.sin(v_uv * 10.0 * two_pi + ry * two_pi) + 1.0) * 0.5
    return f * g


def _env_tile_radiance(env_rad_ref, dx, dy, dz):
    """Piecewise-constant env radiance along (dx,dy,dz), 1-D per lane.

    Tile selection is EXACT and trig-free: the elevation tile comes from
    15 static cos-threshold compares on dy; the azimuth tile from 31
    static pseudo-angle-threshold compares on (dx, dz). The winner
    tile's radiance is a [3, ET] one-hot matmul fetch.
    """
    import math

    b = dx.shape[0]
    ty = jnp.zeros_like(dy)
    for tt in range(1, _ETH):
        ty = ty + (dy <= math.cos(math.pi * tt / _ETH)).astype(jnp.float32)
    p = dz / (jnp.abs(dx) + jnp.abs(dz) + 1e-20)
    p = jnp.where(dx < 0.0, 2.0 - p, jnp.where(dz < 0.0, 4.0 + p, p))
    tx = jnp.zeros_like(dy)
    for s in range(1, _ETW):
        bound = _pseudo_angle_const(2.0 * math.pi * s / _ETW)
        tx = tx + (p >= bound).astype(jnp.float32)
    tile = (ty * float(_ETW) + tx).astype(jnp.int32)
    et = _ETH * _ETW
    rows = jax.lax.broadcasted_iota(jnp.int32, (et, b), 0)
    onehot = (rows == tile[None, :]).astype(jnp.float32)
    fetch = dot_exact_b(env_rad_ref[0:3, :], onehot)  # [3, B]
    return fetch[0], fetch[1], fetch[2]


def eligible(cfg, scene_has_env: bool, with_textures: bool) -> bool:
    # env maps, base-color textures AND metallic/roughness/normal maps
    # are all handled natively (env-tile CDF rows, in-kernel mip-clamped
    # atlas fetch, aux maps behind one per-tile cond); the remaining
    # static gates live in restir_di_fused.eligible
    return (
        not cfg.enable_dof
        and cfg.width % 128 == 0
        and cfg.height % 8 == 0
    )


# ---------------------------------------------------------------------------
# kernel G: raygen + closest hit + gbuffer pack


def _tile_raster_xy(width):
    """Raster coords of the 8x128-pixel tile at 2-D grid position."""
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    b = 8 * 128
    xl = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1).astype(jnp.float32)
    yl = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0).astype(jnp.float32)
    x = (xl + (tj * 128).astype(jnp.float32)).reshape(b)
    y = (yl + (ti * 8).astype(jnp.float32)).reshape(b)
    pix = (y * float(width) + x).astype(jnp.int32)
    return x, y, pix


def _raygen(cam_ref, looper, x, y, pix, *, width, height, aa_jitter,
            rxy=None):
    """Camera raygen (Camera::sample, sceneStructs.h:69-86). `rxy`
    passes jitter uniforms precomputed by a sublane-BATCHED pcg4d call
    (the mega-kernel computes all its RNG in one call — per-op dispatch
    on the ~25-op 1-D hash chain costs ~9 ms/frame at 1080p; the
    batched form pays it once)."""
    b = x.shape[0]
    if aa_jitter:
        if rxy is not None:
            rx, ry = rxy
        else:
            u1, u2, _, _ = _pcg4d(
                pix.astype(jnp.uint32), jnp.full((b,), looper, jnp.uint32),
                jnp.full((b,), 0, jnp.uint32),
                jnp.full((b,), _SALT_CAMERA, jnp.uint32),
            )
            rx, ry = _unit(u1), _unit(u2)
    else:
        rx = jnp.full((b,), 0.5, jnp.float32)
        ry = jnp.full((b,), 0.5, jnp.float32)

    aspect = float(width) / float(height)
    tanf = cam_ref[12]
    focal = cam_ref[13]
    ruv_x = 1.0 - 2.0 * (x + rx) * (1.0 / width)
    ruv_y = 1.0 - 2.0 * (y + ry) * (1.0 / height)
    fx = ruv_x * (aspect * tanf * focal)
    fy = ruv_y * (tanf * focal)

    dx = cam_ref[3] * fx + cam_ref[6] * fy + cam_ref[9] * focal
    dy = cam_ref[4] * fx + cam_ref[7] * fy + cam_ref[10] * focal
    dz = cam_ref[5] * fx + cam_ref[8] * fy + cam_ref[11] * focal
    dinv = jax.lax.rsqrt(dx * dx + dy * dy + dz * dz)
    dx, dy, dz = dx * dinv, dy * dinv, dz * dinv
    ox = jnp.full((b,), cam_ref[0], jnp.float32)
    oy = jnp.full((b,), cam_ref[1], jnp.float32)
    oz = jnp.full((b,), cam_ref[2], jnp.float32)
    return ox, oy, oz, dx, dy, dz


def _gbuffer_epilogue(out_ref, lcam_ref, mat_ref, best_dist, best_prim,
                      best_u, best_v, at, x, y, ox, oy, oz, dx, dy, dz,
                      *, m_pad, width, height, single_sided,
                      env_rad_ref=None, tex_refs=None):
    """Attribute/material interpolation + motion reprojection + pack
    write (shared by the streaming and resident closest-hit loops).

    `at` is the winner's attribute fetch in TRANSPOSED [ATTR_COLS, B]
    orientation and `mat_ref` is the transposed [MAT_COLS, m_pad]
    material table: every op here runs on 1-D [B] vectors (8 VPU tiles).
    The previous rays-major [B, 32]/[B, 3] forms cost 32-128 tiles PER
    OP (the lane dim pads to 128) — ~40 ms/frame of the round-2 kernel G
    was this epilogue's narrow-op tile traffic."""
    b = x.shape[0]
    missed = best_dist >= _BIG
    valid0 = ~missed

    u = best_u
    v = best_v
    pxp = at[0] + u * at[3] + v * at[6]
    pyp = at[1] + u * at[4] + v * at[7]
    pzp = at[2] + u * at[5] + v * at[8]
    nxp = at[9] + u * at[12] + v * at[15]
    nyp = at[10] + u * at[13] + v * at[16]
    nzp = at[11] + u * at[14] + v * at[17]
    nlen = jax.lax.rsqrt(
        jnp.maximum(nxp * nxp + nyp * nyp + nzp * nzp, 1e-20)
    )
    nxp, nyp, nzp = nxp * nlen, nyp * nlen, nzp * nlen
    mat_id_f = at[24]
    mat_id = mat_id_f.astype(jnp.int32)

    mrow = jax.lax.broadcasted_iota(jnp.int32, (m_pad, b), 0)
    oh_mat = (mrow == mat_id[None, :]).astype(jnp.float32)
    matp = dot_exact_b(mat_ref[:, :], oh_mat)  # [MAT_COLS, B]

    metallic = matp[4]
    roughness = matp[5]
    if tex_refs is not None:
        # metallic / roughness / normal MAPS (getTexturedMaterialAndSurface,
        # scene.h:86-97): fetched from the same mip-clamped atlas. One
        # per-tile cond skips all three fetches (2 one-hot row matmuls
        # each) when no hit lane references an aux map, so untextured-
        # aux scenes pay ~0.4 us/tile. The normal remap happens HERE —
        # before the front-face/single-sided logic — mirroring
        # ops/primary.trace_primary, which replaces it.norm before the
        # gbuffer consumes it.
        atlas_ref, meta_ref = tex_refs
        t_pad = meta_ref.shape[1]
        trow = jax.lax.broadcasted_iota(jnp.int32, (t_pad, b), 0)
        u_uv = at[18] + u * at[20] + v * at[22]
        v_uv = at[19] + u * at[21] + v * at[23]
        met_id, rough_id, nrm_id = matp[8], matp[9], matp[10]
        need_aux = (
            jnp.max(jnp.where(
                valid0,
                jnp.maximum(jnp.maximum(met_id, rough_id), nrm_id),
                -1.0,
            )) > -0.5
        )

        def fetch_aux(tid):
            oh_t = (
                trow == jnp.maximum(tid, 0.0).astype(jnp.int32)[None, :]
            ).astype(jnp.float32)
            tm = dot_exact_b(meta_ref[:, :], oh_t)  # [8, B]
            return _tex_bilinear(
                atlas_ref,
                (tm[0], jnp.maximum(tm[1], 1.0), jnp.maximum(tm[2], 1.0)),
                u_uv, v_uv,
            )

        def with_aux(carry):
            met, rough, nx0, ny0, nz0 = carry
            m_rgb = fetch_aux(met_id)
            met = jnp.where(met_id > -0.5, m_rgb[0], met)
            r_rgb = fetch_aux(rough_id)
            rough = jnp.where(rough_id > -0.5, r_rgb[0], rough)
            n_rgb = fetch_aux(nrm_id)
            # local_to_world(norm, safe_normalize(texel - 0.5)) in 1-D
            # channels (utils/math.py:196-219 conventions)
            vx0 = n_rgb[0] - 0.5
            vy0 = n_rgb[1] - 0.5
            vz0 = n_rgb[2] - 0.5
            vinv = 1.0 / jnp.maximum(
                jnp.sqrt(vx0 * vx0 + vy0 * vy0 + vz0 * vz0), 1e-20
            )
            vx0, vy0, vz0 = vx0 * vinv, vy0 * vinv, vz0 * vinv
            usez = jnp.abs(ny0) > 0.9999  # helper = z-axis near poles
            bx = jnp.where(usez, ny0, -nz0)
            by = jnp.where(usez, -nx0, 0.0)
            bz = jnp.where(usez, 0.0, nx0)
            binv = 1.0 / jnp.maximum(
                jnp.sqrt(bx * bx + by * by + bz * bz), 1e-20
            )
            bx, by, bz = bx * binv, by * binv, bz * binv
            tx = by * nz0 - bz * ny0
            ty = bz * nx0 - bx * nz0
            tz = bx * ny0 - by * nx0
            rx = tx * vx0 + bx * vy0 + nx0 * vz0
            ry = ty * vx0 + by * vy0 + ny0 * vz0
            rz = tz * vx0 + bz * vy0 + nz0 * vz0
            rinv = 1.0 / jnp.maximum(
                jnp.sqrt(rx * rx + ry * ry + rz * rz), 1e-20
            )
            remap = nrm_id > -0.5
            nx1 = jnp.where(remap, rx * rinv, nx0)
            ny1 = jnp.where(remap, ry * rinv, ny0)
            nz1 = jnp.where(remap, rz * rinv, nz0)
            return met, rough, nx1, ny1, nz1

        metallic, roughness, nxp, nyp, nzp = jax.lax.cond(
            need_aux, with_aux, lambda c: c,
            (metallic, roughness, nxp, nyp, nzp),
        )

    mtype = matp[0]
    is_light = valid0 & (mtype == _LIGHT)
    ndotd = nxp * dx + nyp * dy + nzp * dz
    front = ndotd < 0.0
    if single_sided:
        # back-face light hits become misses (gbuffer.cu:32-36)
        valid = valid0 & ~(is_light & ~front)
    else:
        valid = valid0
    is_light = is_light & valid
    shade = valid & ~is_light

    prim_remap = jnp.where(
        valid, jnp.where(is_light, LIGHT_ID, mat_id_f), _NULL
    )

    px = jnp.where(valid, pxp, 0.0)
    py = jnp.where(valid, pyp, 0.0)
    pz = jnp.where(valid, pzp, 0.0)
    tox, toy, toz = px - ox, py - oy, pz - oz
    depth = jnp.where(valid, jnp.sqrt(tox * tox + toy * toy + toz * toz), 1.0)

    # --- motion index: reproject through lastCamera (gbuffer.cu:49-55,
    # Camera::getRasterUV sceneStructs.h:23-46)
    aspect = float(width) / float(height)
    lx_, ly_, lz_ = px - lcam_ref[0], py - lcam_ref[1], pz - lcam_ref[2]
    linv = jax.lax.rsqrt(jnp.maximum(lx_ * lx_ + ly_ * ly_ + lz_ * lz_, 1e-20))
    lx_, ly_, lz_ = lx_ * linv, ly_ * linv, lz_ * linv
    ldep = lx_ * lcam_ref[9] + ly_ * lcam_ref[10] + lz_ * lcam_ref[11]
    ldep_inv = 1.0 / jnp.where(jnp.abs(ldep) < 1e-20, 1e-20, ldep)
    prx = (lx_ * lcam_ref[3] + ly_ * lcam_ref[4] + lz_ * lcam_ref[5]) * ldep_inv
    pry = (lx_ * lcam_ref[6] + ly_ * lcam_ref[7] + lz_ * lcam_ref[8]) * ldep_inv
    ltan = lcam_ref[12]
    un = (-(prx / (aspect * ltan))) * 0.5 + 0.5
    vn = (-(pry / ltan)) * 0.5 + 0.5
    mx = (un * width).astype(jnp.int32)
    my = (vn * height).astype(jnp.int32)
    in_b = (mx >= 0) & (mx < width) & (my >= 0) & (my < height)
    motion = jnp.where(
        valid,
        jnp.where(in_b, (my * width + mx).astype(jnp.float32), _NULL),
        0.0,
    )

    vals = [None] * GB_CH

    if out_ref.ndim == 5:
        # streaming path: 5-D tile-blocked pack [GB_CH, 1, 1, 8, 128].
        # Per-tile output blocks must be CONTIGUOUS in HBM or the block
        # copy fragments into 192 strided 512 B transfers per tile
        # (~390k DMA descriptors/frame = ~70 ms measured at 1080p); an
        # XLA transpose converts to the linear pack afterwards.
        def put(i, val):
            out_ref[i, 0, 0, :, :] = val.reshape(8, 128)
    else:
        # resident path: channel values collect into ONE stacked store
        # at the end (24 separate stores pay 24 op dispatches)
        def put(i, val):
            vals[i] = val

    put(G_POS, px)
    put(G_POS + 1, py)
    put(G_POS + 2, pz)
    vf = valid
    put(G_NORM, jnp.where(vf, nxp, 0.0))
    put(G_NORM + 1, jnp.where(vf, nyp, 0.0))
    put(G_NORM + 2, jnp.where(vf, nzp, 0.0))
    put(G_DIR, dx)
    put(G_DIR + 1, dy)
    put(G_DIR + 2, dz)
    base = [matp[1], matp[2], matp[3]]
    if tex_refs is not None:
        # textured base color (getTexturedMaterialAndSurface,
        # scene.h:78-99): bilinear atlas fetch + procedural option
        # (u_uv/v_uv/trow computed above with the aux-map fetches)
        tid = matp[7]  # base map id (-1 none, -2 procedural)
        tex_rgb = fetch_aux(tid)
        proc = _procedural_tex(u_uv, v_uv)
        use_tex = tid > -0.5
        use_proc = (tid > -2.5) & (tid < -1.5)
        base = [
            jnp.where(use_tex, tex_rgb[k],
                      jnp.where(use_proc, proc, base[k]))
            for k in range(3)
        ]
    if env_rad_ref is not None:
        # miss pixels carry the env background in the albedo slot (the
        # demodulated convention: kernel S shades miss as 1.0 * albedo;
        # gbuffer.cu stores env radiance the same way)
        ex, ey, ez = _env_tile_radiance(env_rad_ref, dx, dy, dz)
        put(G_ALB, jnp.where(vf, base[0], ex))
        put(G_ALB + 1, jnp.where(vf, base[1], ey))
        put(G_ALB + 2, jnp.where(vf, base[2], ez))
    else:
        for k in range(3):
            put(G_ALB + k, jnp.where(vf, base[k], 0.0))
    put(G_DEPTH, depth)
    put(G_MOTION, motion)
    put(G_PRIMR, prim_remap)
    put(G_MTYPE, mtype)
    put(G_METAL, metallic)
    put(G_ROUGH, roughness)
    put(G_SHADE, shade.astype(jnp.float32))
    put(G_LIGHT, is_light.astype(jnp.float32))
    put(G_MISS, (~valid).astype(jnp.float32))
    put(G_PRIM, jnp.where(valid, best_prim.astype(jnp.float32), _NULL))
    put(G_X, x)
    put(G_Y, y)
    if out_ref.ndim != 5:
        cg_out = out_ref.shape[1]
        out_ref[:, :, :] = jnp.stack(vals, axis=0).reshape(
            GB_CH, cg_out, 128)


def _gbuffer_kernel_resident(cam_ref, lcam_ref, looper_ref, xy_ref, xpt_ref,
                             attr_ref, mat_ref, env_ref,
                             atlas_ref, texmeta_ref, out_ref,
                             *, n_pad, nb, m_pad, width, height, aa_jitter,
                             single_sided, has_env, with_textures,
                             rxy=None):
    """Small-scene variant: triangle planes + attribute rows live in
    VMEM (no per-cluster DMA, no culling), the hit matmuls run at a
    wider block size, and — critically — the grid is 1-D over LINEAR
    1024-pixel tiles so the output blocks are contiguous rows of the
    [GB_CH, R/128, 128] pack. 2-D 8x128 pixel tiles (the streaming
    path's layout, needed there for tight frusta) cost ~70 ms/frame at
    1080p in layout permutation alone, whether paid as fragmented
    kernel-output DMA or as an XLA transpose."""
    tile_id = pl.program_id(0)
    b = xy_ref.shape[1] * 128  # rays per grid step (tile width)
    x = xy_ref[0, :, :].reshape(b)
    y = xy_ref[1, :, :].reshape(b)
    pix = looper_ref[1].astype(jnp.int32) + tile_id * b + (
        jax.lax.broadcasted_iota(jnp.int32, (b, 1), 0).reshape(b)
    )
    looper = looper_ref[0]
    ox, oy, oz, dx, dy, dz = _raygen(
        cam_ref, looper, x, y, pix, width=width, height=height,
        aa_jitter=aa_jitter, rxy=rxy,
    )

    # tris-on-sublanes orientation ([nb, B] hit matrices, like the vis
    # kernels): sublane reductions replace lane reductions, and the
    # winner's attribute row is fetched ONCE after the loop in the
    # transposed [ATTR_COLS, B] form the epilogue consumes 1-D.
    # The K=4 homogeneous dots run as VPU FMA chains over lane-broadcast
    # plane coefficients, NOT MXU matmuls: a K=4 contraction pads K to
    # 128 (32x MAC waste) and needs 3 bf16-split passes for f32 — the
    # FMA form measured 1.7x faster at this exact shape (prof/prof_fma)
    # and is natively f32-exact.
    oxr, oyr, ozr = (v.reshape(1, b) for v in (ox, oy, oz))
    dxr, dyr, dzr = (v.reshape(1, b) for v in (dx, dy, dz))

    def bc(xp, lo):
        # [nb, 1] coefficient column -> broadcast along lanes
        return jnp.broadcast_to(xp[:, lo:lo + 1], (nb, b))

    def body(i, carry):
        best_dist, best_prim, best_u, best_v = carry
        row = pl.multiple_of(i * nb, nb)
        xp = xpt_ref[pl.ds(row, nb), :]  # [nb, 128] tri-major planes
        oou = bc(xp, 0) * oxr + bc(xp, 1) * oyr + bc(xp, 2) * ozr + bc(xp, 3)
        oov = bc(xp, 4) * oxr + bc(xp, 5) * oyr + bc(xp, 6) * ozr + bc(xp, 7)
        oow = (bc(xp, 8) * oxr + bc(xp, 9) * oyr + bc(xp, 10) * ozr
               + bc(xp, 11))
        ddu = bc(xp, 0) * dxr + bc(xp, 1) * dyr + bc(xp, 2) * dzr
        ddv = bc(xp, 4) * dxr + bc(xp, 5) * dyr + bc(xp, 6) * dzr
        ddw = bc(xp, 8) * dxr + bc(xp, 9) * dyr + bc(xp, 10) * dzr
        nondeg = jnp.abs(ddw) >= 1e-12
        t = -oow / jnp.where(nondeg, ddw, 1.0)
        u = oou + t * ddu
        v = oov + t * ddv
        hit = nondeg & (t > 0.0) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
        dist = jnp.where(hit, t, _BIG)
        j = jnp.argmin(dist, axis=0)  # [B]
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (nb, b), 0)
        oh_best = row_ids == j[None, :]
        d_best = jnp.min(dist, axis=0)
        u_best = jnp.sum(jnp.where(oh_best, u, 0.0), axis=0)
        v_best = jnp.sum(jnp.where(oh_best, v, 0.0), axis=0)
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
    # winner attribute fetch: full-M mod-gather when the tri axis
    # chunks 128-wide (saves the ATTR_COLS->128 M-pad waste), else the
    # plain one-hot product. The attr table is 128-granular (its own
    # a_pad) while the hit tables are 64-granular.
    a_pad = attr_ref.shape[1]
    nchunk_a = a_pad // 128
    if nchunk_a > 1 and ATTR_COLS * nchunk_a <= 256 \
            and a_pad % (128 * nchunk_a) == 0:
        at = _gather_cols_exact(attr_ref[:, :], best_prim, nchunk_a)
    else:
        prow = jax.lax.broadcasted_iota(jnp.int32, (a_pad, b), 0)
        oh_prim = (prow == best_prim[None, :]).astype(jnp.float32)
        at = dot_exact_b(attr_ref[:, :], oh_prim)  # [ATTR_COLS, B]
    _gbuffer_epilogue(
        out_ref, lcam_ref, mat_ref, best_dist, best_prim, best_u, best_v,
        at, x, y, ox, oy, oz, dx, dy, dz,
        m_pad=m_pad, width=width, height=height, single_sided=single_sided,
        env_rad_ref=env_ref if has_env else None,
        tex_refs=(atlas_ref, texmeta_ref) if with_textures else None,
    )


def _gbuffer_kernel(counts_ref, dmin_ref, ids_hbm_ref, cam_ref, lcam_ref,
                    looper_ref, xp_hbm_ref, attr_hbm_ref, mat_ref, clb_ref,
                    env_ref, atlas_ref, texmeta_ref, rxy_ref, out_ref,
                    ids_ref, ids_sem, xpb_ref, attrb_ref, geo_sem,
                    *, n_pad, nb, m_pad, width, height, aa_jitter,
                    single_sided, use_pretest, has_env, with_textures):
    # 2-D pixel tiles (8 rows x 128 cols): tight frusta for cluster
    # culling; raster coords come from the grid position (no division)
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    tile = ti * pl.num_programs(1) + tj
    cg = 8
    b = cg * 128
    x, y, pix = _tile_raster_xy(width)
    # fetch this tile's cluster work list into SMEM (the full [T, K]
    # table would blow the 1 MB SMEM budget as a prefetch operand; the
    # table is FLAT [T*Kp] because row-slicing a 2-D i32 table trips
    # Mosaic's (8,128) tiling alignment)
    kp = ids_ref.shape[0]
    ids_dma = pltpu.make_async_copy(
        ids_hbm_ref.at[pl.ds(pl.multiple_of(tile * kp, 1024), kp)],
        ids_ref, ids_sem,
    )
    ids_dma.start()
    looper = looper_ref[0]
    rxy = ((rxy_ref[0, 0, 0, :, :].reshape(b),
            rxy_ref[1, 0, 0, :, :].reshape(b))
           if aa_jitter else None)
    ox, oy, oz, dx, dy, dz = _raygen(
        cam_ref, looper, x, y, pix, width=width, height=height,
        aa_jitter=aa_jitter, rxy=rxy,
    )

    # --- closest hit over triangle blocks (VPU FMA chains over lane-
    # broadcast plane coefficients — see _gbuffer_kernel_resident)
    oxr, oyr, ozr = (v.reshape(1, b) for v in (ox, oy, oz))
    dxr, dyr, dzr = (v.reshape(1, b) for v in (dx, dy, dz))

    def bcp(xp, lo, m):
        return jnp.broadcast_to(xp[:, lo:lo + 1], (m, b))

    tiny = 1e-12
    inv_dx = 1.0 / jnp.where(jnp.abs(dx) < tiny, tiny, dx)
    inv_dy = 1.0 / jnp.where(jnp.abs(dy) < tiny, tiny, dy)
    inv_dz = 1.0 / jnp.where(jnp.abs(dz) < tiny, tiny, dz)

    ids_dma.wait()
    # geometry stays in HBM; each listed cluster's tri planes + attr
    # rows stream through a double-buffered VMEM slot
    count = counts_ref[tile]

    # cluster PAIRS per iteration (same rationale as the vis loop: the
    # work lists are per-ray-exact, pairing halves DMA-sync + dispatch;
    # odd tails re-test the first listed cluster — harmless for closest
    # hit). The AABB pretest is KEPT here: for primary rays the
    # (t_near < best_dist) term is occlusion culling that strengthens
    # as the front-to-back walk shrinks best_dist.
    pcnt = (count + 1) // 2

    def pair_ids(j):
        c0 = ids_ref[2 * j]
        c1 = ids_ref[jnp.minimum(2 * j + 1, jnp.maximum(count - 1, 0))]
        return c0, c1

    def fetch(j, slot):
        c0, c1 = pair_ids(j)
        for hk, c in ((0, c0), (1, c1)):
            col = pl.multiple_of(c * nb, nb)
            pltpu.make_async_copy(
                xp_hbm_ref.at[pl.ds(col, nb), :],
                xpb_ref.at[slot, hk * nb:(hk + 1) * nb, :],
                geo_sem.at[slot, 2 * hk],
            ).start()
            pltpu.make_async_copy(
                attr_hbm_ref.at[:, pl.ds(col, nb)],
                attrb_ref.at[slot, :, hk * nb:(hk + 1) * nb],
                geo_sem.at[slot, 2 * hk + 1],
            ).start()

    def fetch_wait(j, slot):
        c0, c1 = pair_ids(j)
        for hk, c in ((0, c0), (1, c1)):
            col = pl.multiple_of(c * nb, nb)
            pltpu.make_async_copy(
                xp_hbm_ref.at[pl.ds(col, nb), :],
                xpb_ref.at[slot, hk * nb:(hk + 1) * nb, :],
                geo_sem.at[slot, 2 * hk],
            ).wait()
            pltpu.make_async_copy(
                attr_hbm_ref.at[:, pl.ds(col, nb)],
                attrb_ref.at[slot, :, hk * nb:(hk + 1) * nb],
                geo_sem.at[slot, 2 * hk + 1],
            ).wait()

    @pl.when(pcnt > 0)
    def _():
        fetch(0, 0)

    def body(state):
        i, _, carry = state
        best_dist, best_prim, best_u, best_v, best_attr = carry
        c0, c1 = pair_ids(i)
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < pcnt)
        def _():
            fetch(i + 1, jax.lax.rem(i + 1, 2))

        fetch_wait(i, slot)

        # per-ray AABB pretest over BOTH boxes of the pair
        def box_touch(c):
            t1x = (clb_ref[c, 0] - ox) * inv_dx
            t2x = (clb_ref[c, 4] - ox) * inv_dx
            t1y = (clb_ref[c, 1] - oy) * inv_dy
            t2y = (clb_ref[c, 5] - oy) * inv_dy
            t1z = (clb_ref[c, 2] - oz) * inv_dz
            t2z = (clb_ref[c, 6] - oz) * inv_dz
            t_near = jnp.maximum(
                jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
                jnp.minimum(t1z, t2z),
            )
            t_far = jnp.minimum(
                jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
                jnp.maximum(t1z, t2z),
            )
            return (t_far >= 0.0) & (t_far >= t_near) & (t_near < best_dist)

        if use_pretest:
            touch = box_touch(c0) | box_touch(c1)
            any_touch = jnp.max(touch.astype(jnp.float32)) > 0.0
        else:
            any_touch = True

        def test_cluster(carry):
            best_dist, best_prim, best_u, best_v, best_attr = carry
            xp = xpb_ref[slot]  # [2*nb, 128] tri-major planes
            m2 = 2 * nb
            oou = (bcp(xp, 0, m2) * oxr + bcp(xp, 1, m2) * oyr
                   + bcp(xp, 2, m2) * ozr + bcp(xp, 3, m2))
            oov = (bcp(xp, 4, m2) * oxr + bcp(xp, 5, m2) * oyr
                   + bcp(xp, 6, m2) * ozr + bcp(xp, 7, m2))
            oow = (bcp(xp, 8, m2) * oxr + bcp(xp, 9, m2) * oyr
                   + bcp(xp, 10, m2) * ozr + bcp(xp, 11, m2))
            ddu = (bcp(xp, 0, m2) * dxr + bcp(xp, 1, m2) * dyr
                   + bcp(xp, 2, m2) * dzr)
            ddv = (bcp(xp, 4, m2) * dxr + bcp(xp, 5, m2) * dyr
                   + bcp(xp, 6, m2) * dzr)
            ddw = (bcp(xp, 8, m2) * dxr + bcp(xp, 9, m2) * dyr
                   + bcp(xp, 10, m2) * dzr)
            nondeg = jnp.abs(ddw) >= 1e-12
            t = -oow / jnp.where(nondeg, ddw, 1.0)
            u = oou + t * ddu
            v = oov + t * ddv
            hit = nondeg & (t > 0.0) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
            dist = jnp.where(hit, t, _BIG)
            j = jnp.argmin(dist, axis=0)
            row_ids = jax.lax.broadcasted_iota(jnp.int32, (2 * nb, b), 0)
            oh_best = row_ids == j[None, :]
            d_best = jnp.min(dist, axis=0)
            u_best = jnp.sum(jnp.where(oh_best, u, 0.0), axis=0)
            v_best = jnp.sum(jnp.where(oh_best, v, 0.0), axis=0)
            # global prim id: halves map to different clusters
            prim_new = jnp.where(
                j < nb, j + c0 * nb, j - nb + c1 * nb
            )
            # transposed attr fetch: [ATTR_COLS, 2nb] @ one-hot [2nb, B]
            attr_best = dot_exact_b(
                attrb_ref[slot], oh_best.astype(jnp.float32)
            )  # [ATTR_COLS, B]
            closer = d_best < best_dist
            return (
                jnp.minimum(best_dist, d_best),
                jnp.where(closer, prim_new, best_prim),
                jnp.where(closer, u_best, best_u),
                jnp.where(closer, v_best, best_v),
                jnp.where(closer[None, :], attr_best, best_attr),
            )

        cr0 = (best_dist, best_prim, best_u, best_v, best_attr)
        if use_pretest:
            carry = jax.lax.cond(any_touch, test_cluster, lambda cr: cr, cr0)
        else:
            carry = test_cluster(cr0)
        new_best = carry[0]
        # occlusion early-termination: the work list is sorted
        # front-to-back by camera->AABB distance, so once every ray's
        # best hit is nearer than the NEXT pair can possibly be, stop
        nxt_c = ids_ref[jnp.minimum(2 * (i + 1), jnp.maximum(count - 1, 0))]
        done = (i + 1 >= pcnt) | (jnp.max(new_best) < dmin_ref[nxt_c])
        return (i + 1, done, carry)

    def cond(state):
        i, done, _ = state
        return jnp.logical_not(done)

    init = (
        jnp.int32(0),
        count <= 0,
        (
            jnp.full((b,), _BIG, jnp.float32),
            jnp.full((b,), NULL_PRIMITIVE, jnp.int32),
            jnp.zeros((b,), jnp.float32),
            jnp.zeros((b,), jnp.float32),
            jnp.zeros((ATTR_COLS, b), jnp.float32),
        ),
    )
    n_done, _, (best_dist, best_prim, best_u, best_v, a) = jax.lax.while_loop(
        cond, body, init
    )

    # drain the in-flight prefetch when the loop exited early (the DMA
    # for the next pair was started in the last iteration but never
    # consumed; an unconsumed DMA at kernel end is a runtime error)
    @pl.when((n_done > 0) & (n_done < pcnt))
    def _():
        fetch_wait(n_done, jax.lax.rem(n_done, 2))
    _gbuffer_epilogue(
        out_ref, lcam_ref, mat_ref, best_dist, best_prim, best_u, best_v,
        a, x, y, ox, oy, oz, dx, dy, dz,
        m_pad=m_pad, width=width, height=height, single_sided=single_sided,
        env_rad_ref=env_ref if has_env else None,
        tex_refs=(atlas_ref, texmeta_ref) if with_textures else None,
    )


def _dot_t_exact(a, b_exact):
    """f32-exact a.T @ b for exactly-bf16-representable b (one-hot
    selectors): contraction on dim 0 of BOTH operands, so the [rows,
    lanes] tri-major attr buffer feeds the MXU without an explicit
    transpose. Mirrors dot_exact_b's hi/mid/lo split."""
    dn = (((0,), (0,)), ((), ()))
    bb = b_exact.astype(jnp.bfloat16)
    ah, am, al = _hi_mid_lo(a)

    def f(x):
        return jax.lax.dot_general(
            x.astype(jnp.bfloat16), bb, dn,
            preferred_element_type=jnp.float32)

    return f(ah) + (f(am) + f(al))


def _gbuffer_kernel_sub(counts_ref, dmin_ref, ids_hbm_ref, cam_ref, lcam_ref,
                        looper_ref, xp_hbm_ref, attr_hbm_ref, mat_ref,
                        env_ref, atlas_ref, texmeta_ref, rxy_ref, out_ref,
                        ids_ref, ids_sem, xpb_ref, attrb_ref, geo_sem,
                        *, m_pad, width, height, aa_jitter,
                        single_sided, has_env, with_textures, unit=32):
    """Streaming closest hit over per-tile frustum-exact 32-tri
    SUB-BLOCK work lists (the closest-hit twin of _vis_sorted_kernel;
    the reference's per-ray BVH walk, scene.h:245-284). Each iteration
    flushes EIGHT sub-blocks: [32, 128] tri-major plane AND attr slices
    DMA along sublanes into [256, 128] buffers, the FMA hit chain runs
    once at [256, B], and the winner's attr row is extracted with a
    contraction-on-dim-0 exact dot. The list is front-to-back by
    camera->AABB distance, so the walk stops once every ray's best hit
    is nearer than the next flush's first block can be."""
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    tile = ti * pl.num_programs(1) + tj
    cg = 8
    b = cg * 128
    x, y, pix = _tile_raster_xy(width)
    kp = ids_ref.shape[0]
    ids_dma = pltpu.make_async_copy(
        ids_hbm_ref.at[pl.ds(pl.multiple_of(tile * kp, 1024), kp)],
        ids_ref, ids_sem,
    )
    ids_dma.start()
    looper = looper_ref[0]
    rxy = ((rxy_ref[0, 0, 0, :, :].reshape(b),
            rxy_ref[1, 0, 0, :, :].reshape(b))
           if aa_jitter else None)
    ox, oy, oz, dx, dy, dz = _raygen(
        cam_ref, looper, x, y, pix, width=width, height=height,
        aa_jitter=aa_jitter, rxy=rxy,
    )
    oxr, oyr, ozr = (v.reshape(1, b) for v in (ox, oy, oz))
    dxr, dyr, dzr = (v.reshape(1, b) for v in (dx, dy, dz))

    ids_dma.wait()
    count = counts_ref[tile]
    # flushes of 256 tri rows; tail entries beyond `count` are just the
    # nearest non-crossing blocks (argsort order) — testing them is
    # harmless for closest hit
    per_flush = 256 // unit
    nflush = (count + per_flush - 1) // per_flush

    def fetch(f, slot, wait):
        for q in range(per_flush):
            blk = ids_ref[f * per_flush + q]
            row = pl.multiple_of(blk * unit, unit)
            cp = pltpu.make_async_copy(
                xp_hbm_ref.at[pl.ds(row, unit), :],
                xpb_ref.at[slot, unit * q:unit * (q + 1), :],
                geo_sem.at[slot, q],
            )
            cp.wait() if wait else cp.start()
            ca = pltpu.make_async_copy(
                attr_hbm_ref.at[pl.ds(row, unit), :],
                attrb_ref.at[slot, unit * q:unit * (q + 1), :],
                geo_sem.at[slot, per_flush + q],
            )
            ca.wait() if wait else ca.start()

    @pl.when(nflush > 0)
    def _():
        fetch(0, 0, False)

    def bcp(xp, lo):
        return jnp.broadcast_to(xp[:, lo:lo + 1], (256, b))

    def body(state):
        f, _, carry = state
        best_dist, best_prim, best_u, best_v, best_attr = carry
        slot = jax.lax.rem(f, 2)

        @pl.when(f + 1 < nflush)
        def _():
            fetch(f + 1, jax.lax.rem(f + 1, 2), False)

        fetch(f, slot, True)

        xp = xpb_ref[slot]  # [256, 128] = 8 blocks x 32 tris, tri-major
        oou = bcp(xp, 0) * oxr + bcp(xp, 1) * oyr + bcp(xp, 2) * ozr \
            + bcp(xp, 3)
        oov = bcp(xp, 4) * oxr + bcp(xp, 5) * oyr + bcp(xp, 6) * ozr \
            + bcp(xp, 7)
        oow = bcp(xp, 8) * oxr + bcp(xp, 9) * oyr + bcp(xp, 10) * ozr \
            + bcp(xp, 11)
        ddu = bcp(xp, 0) * dxr + bcp(xp, 1) * dyr + bcp(xp, 2) * dzr
        ddv = bcp(xp, 4) * dxr + bcp(xp, 5) * dyr + bcp(xp, 6) * dzr
        ddw = bcp(xp, 8) * dxr + bcp(xp, 9) * dyr + bcp(xp, 10) * dzr
        nondeg = jnp.abs(ddw) >= 1e-12
        t = -oow / jnp.where(nondeg, ddw, 1.0)
        u = oou + t * ddu
        v = oov + t * ddv
        hit = nondeg & (t > 0.0) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
        dist = jnp.where(hit, t, _BIG)
        j = jnp.argmin(dist, axis=0)
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (256, b), 0)
        oh_best = row_ids == j[None, :]
        d_best = jnp.min(dist, axis=0)
        u_best = jnp.sum(jnp.where(oh_best, u, 0.0), axis=0)
        v_best = jnp.sum(jnp.where(oh_best, v, 0.0), axis=0)
        # global prim id: row q*unit+r of flush f is
        # tri ids[f*per_flush+q]*unit + r
        prim_new = jnp.full((b,), 0, jnp.int32)
        for q in range(per_flush):
            blk = ids_ref[f * per_flush + q]
            in_q = (j >= unit * q) & (j < unit * (q + 1))
            prim_new = jnp.where(
                in_q, j - unit * q + blk * unit, prim_new)
        attr_best = _dot_t_exact(
            attrb_ref[slot], oh_best.astype(jnp.float32)
        )[:ATTR_COLS]  # [ATTR_COLS, B]
        closer = d_best < best_dist
        carry = (
            jnp.minimum(best_dist, d_best),
            jnp.where(closer, prim_new, best_prim),
            jnp.where(closer, u_best, best_u),
            jnp.where(closer, v_best, best_v),
            jnp.where(closer[None, :], attr_best, best_attr),
        )
        # occlusion early-out: front-to-back list; once every ray's best
        # hit is nearer than the NEXT flush's first block, stop
        nxt = ids_ref[jnp.minimum(per_flush * (f + 1),
                                  jnp.maximum(count - 1, 0))]
        done = (f + 1 >= nflush) | (jnp.max(carry[0]) < dmin_ref[nxt])
        return (f + 1, done, carry)

    def cond(state):
        f, done, _ = state
        return jnp.logical_not(done)

    init = (
        jnp.int32(0),
        count <= 0,
        (
            jnp.full((b,), _BIG, jnp.float32),
            jnp.full((b,), NULL_PRIMITIVE, jnp.int32),
            jnp.zeros((b,), jnp.float32),
            jnp.zeros((b,), jnp.float32),
            jnp.zeros((ATTR_COLS, b), jnp.float32),
        ),
    )
    n_done, _, (best_dist, best_prim, best_u, best_v, a) = jax.lax.while_loop(
        cond, body, init
    )

    # drain the in-flight prefetch when the loop exited early
    @pl.when((n_done > 0) & (n_done < nflush))
    def _():
        fetch(n_done, jax.lax.rem(n_done, 2), True)
    _gbuffer_epilogue(
        out_ref, lcam_ref, mat_ref, best_dist, best_prim, best_u, best_v,
        a, x, y, ox, oy, oz, dx, dy, dz,
        m_pad=m_pad, width=width, height=height, single_sided=single_sided,
        env_rad_ref=env_ref if has_env else None,
        tex_refs=(atlas_ref, texmeta_ref) if with_textures else None,
    )


def pack_camera(cam, width: int, height: int):
    """Camera -> [16] f32 SMEM vector for the fused kernels."""
    tanf = jnp.tan(jnp.deg2rad(cam.fov_y))
    return jnp.concatenate(
        [
            cam.position.astype(jnp.float32),
            cam.right.astype(jnp.float32),
            cam.up.astype(jnp.float32),
            cam.view.astype(jnp.float32),
            jnp.stack([
                tanf.astype(jnp.float32),
                cam.focal_dist.astype(jnp.float32),
                jnp.float32(0.0),
                jnp.float32(0.0),
            ]),
        ]
    )



def _primary_cluster_lists(cam_vec, width, height, tile, cluster_lo,
                           cluster_hi):
    """Per-tile cluster work lists for primary rays (XLA-side).

    All primary rays share one origin, so the per-tile candidate set is
    an exact camera-frustum vs AABB p-vertex test on [T, K] — measured
    within ~7% of the per-ray slab crossing (round-3: tile-list mean 87
    vs 93) at ~1/60th its cost: the slab form materializes [rays, K]
    intermediates (~60 ms/frame of HBM traffic at 1080p x 634 clusters),
    the frustum form only [T, K]. The 4 side planes are widened by the
    3-pixel AA-jitter margin. Returns (counts [T] i32, ids [T, K] i32
    front-to-back, dmin [K]).
    """
    pos = cam_vec[0:3]
    right, up, view = cam_vec[3:6], cam_vec[6:9], cam_vec[9:12]
    tanf, focal = cam_vec[12], cam_vec[13]
    aspect = width / height
    n_ty, n_tx = height // 8, width // 128

    # inflated pixel bounds per tile (x: 128-wide, y: 8-tall, +-3 px)
    tx = jnp.arange(n_tx, dtype=jnp.float32)
    ty = jnp.arange(n_ty, dtype=jnp.float32)
    kx = aspect * tanf * focal
    ky = tanf * focal
    fx_a = (1.0 - 2.0 * (tx * 128.0 - 3.0) / width) * kx  # [n_tx]
    fx_b = (1.0 - 2.0 * (tx * 128.0 + 131.0) / width) * kx
    fy_a = (1.0 - 2.0 * (ty * 8.0 - 3.0) / height) * ky  # [n_ty]
    fy_b = (1.0 - 2.0 * (ty * 8.0 + 11.0) / height) * ky

    # tile order = ti * n_tx + tj (the streaming kernel's convention)
    def bc(v_y, v_x):
        return (jnp.broadcast_to(v_y[:, None], (n_ty, n_tx)).reshape(-1),
                jnp.broadcast_to(v_x[None, :], (n_ty, n_tx)).reshape(-1))

    fy0, fx0 = bc(fy_a, fx_a)
    fy1, fx1 = bc(fy_b, fx_b)

    def corner(fx, fy):
        return (right[None, :] * fx[:, None] + up[None, :] * fy[:, None]
                + view[None, :] * focal)  # [T, 3]

    c00, c01 = corner(fx0, fy0), corner(fx0, fy1)
    c10, c11 = corner(fx1, fy0), corner(fx1, fy1)
    cc = corner(0.5 * (fx0 + fx1), 0.5 * (fy0 + fy1))

    lo_rel = (cluster_lo - pos[None, :]).astype(jnp.float32)  # [K, 3]
    hi_rel = (cluster_hi - pos[None, :]).astype(jnp.float32)

    def max_side(n3):  # max over box corners of n.(c - pos), [T, K]
        return (jnp.maximum(n3, 0.0) @ hi_rel.T
                + jnp.minimum(n3, 0.0) @ lo_rel.T)

    inside = max_side(view[None, :]) >= 0.0  # in front of the apex
    for ca, cb in ((c00, c01), (c01, c11), (c11, c10), (c10, c00)):
        n3 = jnp.cross(ca, cb)
        n3 = n3 * jnp.sign(jnp.sum(n3 * cc, axis=1, keepdims=True))
        inside &= max_side(n3) >= 0.0

    nearest = jnp.clip(pos[None, :], cluster_lo, cluster_hi)
    dmin = jnp.linalg.norm(nearest - pos[None, :], axis=-1)  # [K]
    counts = jnp.sum(inside, axis=1).astype(jnp.int32)
    # front-to-back order: sort each tile's PASSING clusters by the
    # camera->AABB distance (enables in-kernel occlusion termination)
    key = jnp.where(inside, dmin[None, :], jnp.float32(3e38))
    order = jnp.argsort(key, axis=1, stable=True).astype(jnp.int32)
    return counts, order, dmin.astype(jnp.float32)


def _env_tex_tables(has_env, env_tile_rad, with_textures, fused_atlas,
                    fused_tex_meta):
    """Env-tile radiance + texture atlas/meta in the kernel-ready
    transposed forms (zero placeholders when the feature is off)."""
    if has_env:
        et = env_tile_rad.shape[0]
        assert et == _ETH * _ETW
        env8 = jnp.concatenate(
            [env_tile_rad.astype(jnp.float32).T, jnp.zeros((5, et))]
        )  # [8, ET]
    else:
        env8 = jnp.zeros((8, 128), jnp.float32)
    if with_textures:
        atlas = fused_atlas.astype(jnp.float32)
        tmeta = fused_tex_meta.astype(jnp.float32)
        meta_t = jnp.concatenate(
            [tmeta.T, jnp.zeros((8 - tmeta.shape[1], tmeta.shape[0]))]
        )  # [8, T_pad]
    else:
        atlas = jnp.zeros((384, 128), jnp.float32)
        meta_t = jnp.zeros((8, 8), jnp.float32)
    return env8, atlas, meta_t


def _gather_cols_exact(table, idx, nchunk):
    """Exact per-lane column gather out[c, i] = table[c, idx[i]] via the
    full-M mod-gather (same trick as the temporal gather in
    _temporal_merge_pack): the table's cols/nchunk-wide column chunks
    stack on SUBLANES, every chunk is gathered at idx %% cw with ONE
    [C*nchunk, cw] @ [cw, B] exact product (0/1 bf16 one-hot x
    hi/mid/lo split), and the true chunk's C-row block (idx // cw) is
    masked + block-summed. vs the naive [C->128, n] one-hot form this
    wastes no MXU M rows. Out-of-range idx (NULL primitives) gathers
    exact 0.0, matching the naive form. Constraints: table cols %
    nchunk == 0 with cw % 128 == 0, and C * nchunk <= 256 (larger
    vector ops SIGABRT the TPU compiler — BASELINE round 5)."""
    C = table.shape[0]
    cw = table.shape[1] // nchunk
    b = idx.shape[0]
    t2 = jnp.concatenate(
        [table[:, j * cw:(j + 1) * cw] for j in range(nchunk)], axis=0)
    rows = jax.lax.broadcasted_iota(jnp.int32, (cw, b), 0)
    oh = (rows == jax.lax.rem(idx, cw)[None, :]).astype(jnp.bfloat16)
    th, tm, tl = _hi_mid_lo(t2)
    out = _bdot(th, oh) + (_bdot(tm, oh) + _bdot(tl, oh))
    jstar = idx // cw
    blk_row = jax.lax.broadcasted_iota(
        jnp.int32, (C * nchunk, b), 0) // C
    out = jnp.where(blk_row == jstar[None, :], out, 0.0)
    acc = out[0:C]
    for j in range(1, nchunk):
        acc = acc + out[j * C:(j + 1) * C]
    return acc


def _resident_tables(tri_xform, prim_attr, tile: int = 1024):
    """VMEM-resident geometry tables: tri-major plane table (cols 0:4 xu,
    4:8 xv, 8:12 xw; zero lanes pad to the 128-lane tile) + transposed
    attribute table, at the wider resident block size.

    `tile` scales the hit-loop block height DOWN as tiles get wider so
    each [nb, tile] loop intermediate stays ~1 MB (nb * tile ~ 256k
    lanes): total tri x ray work and op count are nb-invariant, but
    VMEM peak is nb-proportional (tile 3072 at nb=256 exceeded the
    16 MB scoped budget, BASELINE round 2)."""
    import os

    n = tri_xform.shape[1] // 3
    # 64-granular padding: the hit/vis loops are linear in padded rows
    # (a 426-tri scene pays 448 rows instead of 512); nb = the padded
    # count split into <=256-row blocks (>256-sublane lane-broadcasts
    # SIGABRT the TPU compiler — BASELINE round 5)
    n_pad = _round_up(max(n, 128), 64)
    nb_env = int(os.environ.get("RESIDENT_NB", "0"))
    if nb_env:
        nb_res = min(nb_env, n_pad)
    else:
        cap = min(max(64, ((256 * 1024) // max(tile, 1024)) // 64 * 64),
                  n_pad)
        k_blocks = -(-n_pad // cap)
        while n_pad % k_blocks or (n_pad // k_blocks) % 8:
            k_blocks += 1
        nb_res = n_pad // k_blocks
    n_pad_res = _round_up(n_pad, nb_res)
    xu, xv, xw = _split_planes(tri_xform, n_pad_res)
    xpt_res = jnp.concatenate(
        [xu, xv, xw, jnp.zeros((116, n_pad_res), xu.dtype)], axis=0).T
    # attr table at its own 128-granular pad (the mod-gather fetch
    # needs 128-wide chunks; the hit loop doesn't read it)
    a_pad = _round_up(n_pad_res, 128)
    attr_res = prim_attr
    if a_pad != attr_res.shape[0]:
        attr_res = jnp.concatenate([
            attr_res,
            jnp.zeros((a_pad - attr_res.shape[0], ATTR_COLS),
                      attr_res.dtype),
        ])
    attr_res = attr_res.T  # [ATTR_COLS, a_pad]
    return xpt_res, attr_res, nb_res, n_pad_res


@functools.partial(jax.jit, static_argnames=("width", "height", "aa_jitter",
                                              "single_sided", "nb", "has_env",
                                              "with_textures", "interpret"))
def gbuffer_pack_pallas(
    cam_vec, lcam_vec, looper, tri_xform, prim_attr, mat_attr,
    cluster_lo, cluster_hi, sub_lo=None, sub_hi=None,
    width: int = 0, height: int = 0, aa_jitter: bool = True,
    single_sided: bool = True, nb: int = 128,
    has_env: bool = False, env_tile_rad=None,
    with_textures: bool = False, fused_atlas=None, fused_tex_meta=None,
    pix0=0, xy=None,
    interpret: bool = False,
):
    """Returns the gbuffer pack [GB_CH, R/128, 128]. The resident path
    runs 1-D linear-pixel tiles; the streaming path uses 2-D 8x128-pixel
    tiles for tight per-tile cluster frusta. Under shard_map row-band
    parallelism, pass the band's raster grid as `xy` ([2, g_local, 128])
    plus its global first-pixel index `pix0` — the kernel then renders
    just that band (resident geometry only)."""
    r = width * height
    env8, atlas, meta_t = _env_tex_tables(
        has_env, env_tile_rad, with_textures, fused_atlas, fused_tex_meta
    )
    assert width % 128 == 0 and height % 8 == 0
    n = tri_xform.shape[1] // 3
    assert nb == 128, "cluster blocks are CLUSTER_SIZE=128 wide"
    n_pad = _round_up(max(n, nb), nb)
    xu, xv, xw = _split_planes(tri_xform, n_pad)
    # tri-major plane table [n_pad, 128] (cols 0:4 xu, 4:8 xv, 8:12 xw;
    # zero lanes pad to the tile) — per-cluster DMAs slice SUBLANE rows
    # and feed the FMA hit chains directly (see _gbuffer_kernel_resident)
    xplanes = jnp.concatenate(
        [xu, xv, xw, jnp.zeros((116, n_pad), xu.dtype)], axis=0).T
    # attr + material tables travel TRANSPOSED (attributes on sublanes)
    # so winner fetches land as [ATTR_COLS, B] and the epilogue runs on
    # 1-D row vectors (see _gbuffer_epilogue)
    attr = prim_attr
    if n_pad != attr.shape[0]:
        attr = jnp.concatenate(
            [attr, jnp.zeros((n_pad - attr.shape[0], ATTR_COLS), attr.dtype)]
        )
    attr_t = attr.T  # [ATTR_COLS, n_pad]
    m = mat_attr.shape[0]
    m_pad = _round_up(m, 8)
    mat = mat_attr
    if m_pad != m:
        mat = jnp.concatenate([mat, jnp.zeros((m_pad - m, MAT_COLS), mat.dtype)])
    mat_t = mat.T  # [MAT_COLS, m_pad]

    if n <= _RESIDENT_MAX_TRIS:
        # small scene: all geometry fits VMEM — skip the cluster
        # streaming (its DMA sync overhead dominates at few clusters)
        # and run the hit matmuls at a wider block size
        xpt_res, attr_res, nb_res, n_pad_res = _resident_tables(
            tri_xform, prim_attr
        )
        kernel = functools.partial(
            _gbuffer_kernel_resident, n_pad=n_pad_res, nb=nb_res,
            m_pad=m_pad, width=width, height=height, aa_jitter=aa_jitter,
            single_sided=single_sided, has_env=has_env,
            with_textures=with_textures,
        )
        full1 = lambda i: (0, 0)  # noqa: E731
        if xy is None:
            xy = make_xy_grid(width, height)
        r_loc = xy.shape[1] * 128  # == r unless sharded to a row band
        out = pl.pallas_call(
            kernel,
            grid=(r_loc // _TILE,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((2, _TILE // 128, 128), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_pad_res, 128), full1,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ATTR_COLS, attr_res.shape[1]), full1,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((MAT_COLS, m_pad), full1, memory_space=pltpu.VMEM),
                pl.BlockSpec(env8.shape, full1, memory_space=pltpu.VMEM),
                pl.BlockSpec(atlas.shape, full1, memory_space=pltpu.VMEM),
                pl.BlockSpec(meta_t.shape, full1, memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (GB_CH, _TILE // 128, 128), lambda i: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct(
                (GB_CH, r_loc // 128, 128), jnp.float32
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(cam_vec, lcam_vec,
          jnp.asarray(jnp.stack([jnp.asarray(looper, jnp.uint32),
                                  jnp.asarray(pix0, jnp.uint32)])),
          xy, xpt_res, attr_res, mat_t, env8, atlas, meta_t)
        return out

    # per-tile frustum-culled work lists (front-to-back)
    assert xy is None, "sharded row bands need the resident path"
    assert nb == 128, "cluster blocks are CLUSTER_SIZE=128 wide"
    # camera-jitter RNG precomputed WHOLE-FRAME in XLA (~0.3 ms
    # vectorized) instead of in-kernel (~8 ms/frame of Mosaic per-op
    # dispatch on the ~25-op 1-D pcg4d chain); streams bit-identical
    # (utils/rng == the in-kernel hash, tests/test_pallas_kernels.py).
    # Layout-shuffled to the 2-D 8x128-pixel tile blocks.
    if aa_jitter:
        from ...utils import rng as _rngm

        pixg = jnp.arange(r, dtype=jnp.uint32)
        rxf, ryf, _, _ = _rngm.uniform4(
            pixg, looper, 0, _rngm.SALT_CAMERA)
        rxy5 = jnp.stack([rxf, ryf]).reshape(
            2, height // 8, 8, width // 128, 128).transpose(0, 1, 3, 2, 4)
    else:
        rxy5 = jnp.zeros(
            (2, height // 8, width // 128, 8, 128), jnp.float32)
    if sub_lo is not None:
        # 32-tri SUB-BLOCK granularity (the closest-hit twin of the
        # shadow-vis sub-block lists): frustum-exact lists vs the 4x
        # tighter sub-AABBs cut tested tris x rays ~2-3x vs whole
        # 128-tri clusters
        counts, ids, dmin = _primary_cluster_lists(
            cam_vec, width, height, 1024, sub_lo, sub_hi
        )
        kp = _round_up(ids.shape[1], 1024)
        if kp != ids.shape[1]:
            ids = jnp.concatenate(
                [ids, jnp.zeros((ids.shape[0], kp - ids.shape[1]),
                                jnp.int32)], 1)
        ids = ids.reshape(-1)
        # tri-major attr table [n_pad, 128] (ATTR_COLS lanes used):
        # 32-row sublane DMA slices; extraction via _dot_t_exact
        attr_tm = jnp.concatenate(
            [attr.astype(jnp.float32),
             jnp.zeros((n_pad, 128 - ATTR_COLS), jnp.float32)], axis=1)
        g = r // 128
        unit_g = max(8, n_pad // sub_lo.shape[0])
        kernel = functools.partial(
            _gbuffer_kernel_sub, m_pad=m_pad, width=width, height=height,
            aa_jitter=aa_jitter, single_sided=single_sided,
            has_env=has_env, with_textures=with_textures, unit=unit_g,
        )
        full = lambda i, j, *_: (0, 0)  # noqa: E731
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(height // 8, width // 128),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # ids table (HBM, flat)
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),  # tri planes (HBM)
                pl.BlockSpec(memory_space=pl.ANY),  # tri-major attrs (HBM)
                pl.BlockSpec((MAT_COLS, m_pad), full,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(env8.shape, lambda i, j, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(atlas.shape, lambda i, j, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(meta_t.shape, lambda i, j, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, 1, 1, 8, 128),
                             lambda i, j, *_: (0, i, j, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (GB_CH, 1, 1, 8, 128), lambda i, j, *_: (0, i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.SMEM((kp,), jnp.int32),
                pltpu.SemaphoreType.DMA,
                pltpu.VMEM((2, 256, 128), jnp.float32),
                pltpu.VMEM((2, 256, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((2, 2 * (256 // unit_g))),
            ],
        )
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                (GB_CH, height // 8, width // 128, 8, 128), jnp.float32
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(counts, dmin, ids, cam_vec, lcam_vec,
          _lp2(looper, pix0), xplanes, attr_tm, mat_t, env8, atlas,
          meta_t, rxy5)
        return _untile_pack(out, width, height)

    counts, ids, dmin = _primary_cluster_lists(
        cam_vec, width, height, 1024, cluster_lo, cluster_hi
    )
    # packed cluster bounds for the in-kernel per-ray AABB pretest
    kz = cluster_lo.shape[0]
    clb = jnp.concatenate(
        [cluster_lo.astype(jnp.float32), jnp.zeros((kz, 1)),
         cluster_hi.astype(jnp.float32), jnp.zeros((kz, 1))], axis=1,
    )  # [K, 8]: lo3 _ hi3 _
    # flatten to [T*Kp]; 1-D i32 slices must be 1024-aligned/sized
    kp = _round_up(ids.shape[1], 1024)
    if kp != ids.shape[1]:
        ids = jnp.concatenate(
            [ids, jnp.zeros((ids.shape[0], kp - ids.shape[1]), jnp.int32)], 1
        )
    ids = ids.reshape(-1)

    g = r // 128
    kernel = functools.partial(
        _gbuffer_kernel, n_pad=n_pad, nb=nb, m_pad=m_pad, width=width,
        height=height, aa_jitter=aa_jitter, single_sided=single_sided,
        use_pretest=cluster_lo.shape[0] > 16, has_env=has_env,
        with_textures=with_textures,
    )
    full = lambda i, j, *_: (0, 0)  # noqa: E731
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(height // 8, width // 128),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # ids table (HBM, flat)
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # tri planes (HBM)
            pl.BlockSpec(memory_space=pl.ANY),  # attr rows (HBM)
            pl.BlockSpec((MAT_COLS, m_pad), full, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # cluster bounds
            pl.BlockSpec(env8.shape, lambda i, j, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(atlas.shape, lambda i, j, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(meta_t.shape, lambda i, j, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 1, 1, 8, 128),
                         lambda i, j, *_: (0, i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (GB_CH, 1, 1, 8, 128), lambda i, j, *_: (0, i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.SMEM((kp,), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.VMEM((2, 2 * nb, 128), jnp.float32),
            pltpu.VMEM((2, ATTR_COLS, 2 * nb), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (GB_CH, height // 8, width // 128, 8, 128), jnp.float32
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(counts, dmin, ids, cam_vec, lcam_vec,
      _lp2(looper, pix0), xplanes, attr_t, mat_t, clb, env8, atlas,
      meta_t, rxy5)
    return _untile_pack(out, width, height)


def _lp2(looper, pix0):
    """[looper, pix0] SMEM vector (pix0 = global index of this shard's
    first pixel — nonzero only under shard_map row-band parallelism)."""
    return jnp.stack([jnp.asarray(looper, jnp.uint32),
                      jnp.asarray(pix0, jnp.uint32)])


def _untile_pack(out, width: int, height: int):
    """[C, H/8, W/128, 8, 128] tile-blocked kernel output -> the linear
    channel-major pack [C, R/128, 128] (one XLA transpose)."""
    c = out.shape[0]
    out = jnp.transpose(out, (0, 1, 3, 2, 4))  # [C, H/8, 8, W/128, 128]
    return out.reshape(c, (width * height) // 128, 128)


def make_xy_grid(width: int, height: int):
    """Constant raster-coordinate planes [2, R/128, 128] (f32 x, y)."""
    ys, xs = jnp.meshgrid(
        jnp.arange(height, dtype=jnp.float32),
        jnp.arange(width, dtype=jnp.float32),
        indexing="ij",
    )
    r = width * height
    return jnp.stack([xs.reshape(r // 128, 128), ys.reshape(r // 128, 128)])


# ---------------------------------------------------------------------------
# kernel R: RIS + winner visibility + temporal merge


def _ris_select_kernel(gb_ref, psi_a_ref, psi_b_ref, psi_c_ref,
                       lumaux_ref, tri_lo_ref, light_ref, looper_ref,
                       rng_ref, out_ref, *, l_pad, k, single_sided,
                       n_area, has_env, has_met=True):
    """Lane-batched RIS candidate stage (kernel R1 of the streaming
    pipeline; the resident pipeline runs the same core fused into
    _di_resident_kernel)."""
    cg = gb_ref.shape[1]
    b = cg * 128
    tile_id = pl.program_id(0)
    pix = looper_ref[1].astype(jnp.int32) + tile_id * b + (
        jax.lax.broadcasted_iota(jnp.int32, (b, 1), 0).reshape(b)
    )
    looper = looper_ref[0]
    # RNG precomputed whole-frame in XLA (see gbuffer_pack_pallas note)
    rng = tuple(rng_ref[c, :, :, :].reshape(-1, 128) for c in range(4))
    sel = _ris_select_core(
        gb_ref, psi_a_ref, psi_b_ref, psi_c_ref, lumaux_ref, tri_lo_ref,
        light_ref, pix, looper, l_pad=l_pad, k=k,
        single_sided=single_sided, n_area=n_area, has_env=has_env,
        has_met=has_met, rng=rng,
    )
    for i in range(RS_CH):
        out_ref[i, :, :] = sel[i]


def _ris_select_core(gb_ref, psi_a_ref, psi_b_ref, psi_c_ref,
                     lumaux_ref, tri_lo_ref, light_ref, pix, looper,
                     *, l_pad, k, single_sided, n_area,
                     has_env, has_met=True, rng=None):
    """Lane-batched RIS candidate selection (restir.cu:156-169).

    Round-2 profiling (BASELINE.md) showed the K-iteration candidate
    loop dominated by Mosaic's fixed per-op dispatch overhead on narrow
    elementwise chains (~15 ms per ~50-op chain at 1080p, independent of
    layout). This rewrite runs all K candidates through ONE op chain:
    per-candidate quantities live as a [K*8, 128] array whose 8-sublane
    blocks are candidates (a flat [K*B] lane order shared with the
    [L, K*B] selection matrices), so the chain executes K-for-1.

    Winner selection is a single-draw inverse CDF over the K candidate
    weights — distribution-identical to the reference's K streaming
    reservoir updates (restir.h:38-44: P(pick k) = w_k / W either way)
    and mirrored exactly by models/restir_di._ris_cdf. The selection
    draw is candidate 0's 4th uniform (unused by the draw itself).

    Returns the RS pack channels (RS_LI..RS_W) as [cg, 128] arrays.
    """
    cg = gb_ref.shape[1]
    b = cg * 128
    kb = k * cg  # batched sublane rows

    def ch(i):
        return gb_ref[i, :, :].reshape(b)

    px, py, pz = ch(G_POS), ch(G_POS + 1), ch(G_POS + 2)
    nx, ny, nz = ch(G_NORM), ch(G_NORM + 1), ch(G_NORM + 2)
    dxv, dyv, dzv = ch(G_DIR), ch(G_DIR + 1), ch(G_DIR + 2)
    wox, woy, woz = -dxv, -dyv, -dzv
    mtype = ch(G_MTYPE)
    metallic = ch(G_METAL)
    roughness = ch(G_ROUGH)
    shade_f = ch(G_SHADE)

    # shading normal orientation (models/restir_di.py: non-dielectric
    # normals flip toward wo)
    ndotwo = _dot3(nx, ny, nz, wox, woy, woz)
    flip = (mtype != _DIELECTRIC) & (ndotwo < 0.0)
    sgn = jnp.where(flip, -1.0, 1.0)
    nx, ny, nz = nx * sgn, ny * sgn, nz * sgn

    # ---- per-(light, pixel) target weights (identical math to
    # ris_kernel._ris_kernel)
    ndx = _dot3(nx, ny, nz, px, py, pz)
    ones_b = jnp.ones_like(px)
    phi_a = jnp.stack([nx, ny, nz, -ndx], axis=0)
    a = dot_f32x3(psi_a_ref[:, :], phi_a)
    phi_b = jnp.stack([px, py, pz, ones_b], axis=0)
    bb = dot_f32x3(psi_b_ref[:, :], phi_b)
    x2 = px * px + py * py + pz * pz
    phi_c = jnp.stack([-2.0 * px, -2.0 * py, -2.0 * pz, ones_b, x2], axis=0)
    d2 = jnp.maximum(dot_f32x3(psi_c_ref[:, :], phi_c), 1e-8)
    side = bb > 0.0 if single_sided else jnp.abs(bb) > 0.0
    lum_area = lumaux_ref[:, 0:1]
    rad = lumaux_ref[:, 1:2]
    above = (a + rad) > 0.0
    a_eff = jnp.maximum(a, 0.1 * rad)
    t = jnp.where(above & side, lum_area * a_eff * jnp.abs(bb) / (d2 * d2), 0.0)

    cdf = dot_exact_a(tri_lo_ref[:, :], t)
    total = cdf[l_pad - 1, :]
    light_split = _hi_mid_lo(light_ref[:, :])

    def wide(v):
        # [B] per-pixel value -> [K*8, 128] candidate-block array
        v2 = v.reshape(cg, 128)
        return jnp.concatenate([v2] * k, axis=0)

    # ---- batched RNG: candidate kk's draws in sublane block kk (same
    # pcg4d streams as the per-candidate loop / utils.rng); the mega-
    # kernel precomputes these in its whole-kernel batched call (`rng`)
    if rng is not None:
        r1w, r2w, r3w, r4w = rng
    else:
        pix_w = wide(pix)
        blk = jax.lax.broadcasted_iota(jnp.int32, (kb, 128), 0) // cg
        u1, u2, u3, u4 = _pcg4d(
            pix_w, jnp.full((kb, 128), looper, jnp.uint32),
            (_CTR_RIS + blk).astype(jnp.uint32),
            jnp.full((kb, 128), _SALT_RESTIR, jnp.uint32),
        )
        r1w, r2w, r3w, r4w = _unit(u1), _unit(u2), _unit(u3), _unit(u4)

    # ---- batched inverse-CDF light pick on [L, K*B]
    total_w = wide(total)
    thresh_flat = (r1w * total_w).reshape(k * b)
    cdf_t = jnp.concatenate([cdf] * k, axis=1)  # [L, K*B]
    t_t = jnp.concatenate([t] * k, axis=1)
    below = (cdf_t <= thresh_flat[None, :]).astype(jnp.int32)
    idx = jnp.minimum(jnp.sum(below, axis=0), l_pad - 1)
    row_ids_t = jax.lax.broadcasted_iota(jnp.int32, (l_pad, k * b), 0)
    onehot = row_ids_t == idx[None, :]
    total_flat = total_w.reshape(k * b)
    q_flat = jnp.sum(jnp.where(onehot, t_t, 0.0), axis=0) / jnp.maximum(
        total_flat, 1e-20
    )
    fetch = dot_exact_b(
        light_ref[:, :], onehot.astype(jnp.float32), a_split=light_split
    )  # [LIGHT_COLS, K*B]

    def fw(j):
        return fetch[j].reshape(kb, 128)

    q_w = q_flat.reshape(kb, 128)

    # ---- one candidate-math chain for all K candidates
    sr = jnp.sqrt(jnp.maximum(r3w, 0.0))
    bu = 1.0 - sr
    bv = r2w * sr
    sx = fw(0) + bu * fw(3) + bv * fw(6)
    sy = fw(1) + bu * fw(4) + bv * fw(7)
    sz = fw(2) + bu * fw(5) + bv * fw(8)
    lnx, lny, lnz = fw(9), fw(10), fw(11)
    li_xw, li_yw, li_zw = fw(12), fw(13), fw(14)
    area = fw(15)

    px_w, py_w, pz_w = wide(px), wide(py), wide(pz)
    tox, toy, toz = sx - px_w, sy - py_w, sz - pz_w
    dist2 = jnp.maximum(tox * tox + toy * toy + toz * toz, 1e-20)
    inv_dist = jax.lax.rsqrt(dist2)
    dist_w = dist2 * inv_dist
    wixw, wiyw, wizw = tox * inv_dist, toy * inv_dist, toz * inv_dist

    cos_l = _dot3(lnx, lny, lnz, wixw, wiyw, wizw)
    pdf = q_w * dist2 / jnp.maximum(area * jnp.abs(cos_l), 1e-20)
    if single_sided:
        pdf = jnp.where(cos_l <= -1e-6, pdf, -1.0)
    pdf = jnp.where((total_w > 0.0) & (q_w > 0.0), pdf, -1.0)

    if has_env:
        # env-tile candidates (rows >= n_area): uv-uniform point in the
        # winner tile, direction via to_sphere, exact solid-angle pdf
        # (mirrors ops/lights.sample_light_cdf has_env branch)
        env_m = (idx >= n_area).astype(jnp.float32).reshape(kb, 128) > 0.5
        u_s = fw(0) + r2w * fw(3)  # u0 + r2 * du
        v_s = fw(1) + r3w * fw(6)  # v0 + r3 * dv
        phi_e = u_s * (2.0 * _EPI)
        th_e = v_s * _EPI
        st_e = jnp.sin(th_e)
        wiex = jnp.cos(phi_e) * st_e
        wiey = jnp.cos(th_e)
        wiez = jnp.sin(phi_e) * st_e
        pdf_env = q_w / jnp.maximum(
            fw(3) * fw(6) * (2.0 * _EPI * _EPI)
            * jnp.maximum(st_e, 1e-6),
            1e-20,
        )
        pdf_env = jnp.where((total_w > 0.0) & (q_w > 0.0), pdf_env, -1.0)
        pdf = jnp.where(env_m, pdf_env, pdf)
        wixw = jnp.where(env_m, wiex, wixw)
        wiyw = jnp.where(env_m, wiey, wiyw)
        wizw = jnp.where(env_m, wiez, wizw)
        dist_w = jnp.where(env_m, _ENV_DIST, dist_w)

    nx_w, ny_w, nz_w = wide(nx), wide(ny), wide(nz)
    wox_w, woy_w, woz_w = wide(wox), wide(woy), wide(woz)
    f_lum = _eval_bsdf_lum(
        wide(mtype), wide(metallic), wide(roughness),
        nx_w, ny_w, nz_w, wox_w, woy_w, woz_w, wixw, wiyw, wizw,
        has_met=has_met,
    )
    li_lum = 0.2126 * li_xw + 0.7152 * li_yw + 0.0722 * li_zw
    cos_s = jnp.maximum(_dot3(nx_w, ny_w, nz_w, wixw, wiyw, wizw), 0.0)
    p_hat = li_lum * f_lum * cos_s
    w = p_hat / pdf
    shade_w = wide(shade_f) > 0.5
    bad = jnp.isnan(w) | jnp.isinf(w) | (pdf <= 0.0)
    w = jnp.where(bad | ~shade_w, 0.0, w)

    # ---- single-draw winner selection across the K blocks
    def blk_get(arr, j):
        return arr[j * cg:(j + 1) * cg, :]

    cums = []
    c = blk_get(w, 0)
    for j in range(1, k):
        cums.append(c)
        c = c + blk_get(w, j)
    r_weight = c  # == W; already 0 on ~shade lanes
    thresh_sel = blk_get(r4w, 0) * r_weight
    jsel = jnp.zeros_like(r_weight)
    for cj in cums:
        jsel = jsel + (cj <= thresh_sel).astype(jnp.float32)
    shade2d = shade_f.reshape(cg, 128) > 0.5
    gate = jnp.where((r_weight > 0.0) & shade2d, 1.0, 0.0)
    take_all = jnp.concatenate(
        [(jsel == float(j)).astype(jnp.float32) * gate for j in range(k)],
        axis=0,
    )  # [K*8, 128]

    # winner attributes via one exact block-sum selector matmul:
    # P[s, j*8+s] = 1 sums candidate blocks; take_all one-hots the winner
    a_cat = jnp.concatenate(
        [li_xw, li_yw, li_zw, wixw, wiyw, wizw, dist_w], axis=1
    )  # [K*8, 7*128]
    take_cat = jnp.concatenate([take_all] * 7, axis=1)
    rowp = jax.lax.broadcasted_iota(jnp.int32, (cg, kb), 0)
    colp = jax.lax.broadcasted_iota(jnp.int32, (cg, kb), 1)
    p_sel = (jax.lax.rem(colp, cg) == rowp).astype(jnp.float32)
    sel = dot_exact_a(p_sel, a_cat * take_cat)  # [8, 7*128]

    out = [None] * RS_CH
    out[RS_LI] = sel[:, 0:128]
    out[RS_LI + 1] = sel[:, 128:256]
    out[RS_LI + 2] = sel[:, 256:384]
    out[RS_WI] = sel[:, 384:512]
    out[RS_WI + 1] = sel[:, 512:640]
    out[RS_WI + 2] = sel[:, 640:768]
    out[RS_DIST] = sel[:, 768:896]
    out[RS_W] = r_weight
    return tuple(out)


# ray-pack channel layout for the wavefront-sorted visibility kernel
# ([RP_CH, R] in SORTED ray order; built XLA-side in reuse_pallas)
RP_O = 0  # 3: shadow-ray origin (hit pos nudged along wi)
RP_D = 3  # 3: winner direction
RP_LIM = 6  # occlusion t limit, >= 0 (dist * (1-1e-3) - 1e-4 clamped);
#             SIGN carries liveness: -1.0 where no shadow ray exists
#             (one fewer lax.sort payload operand, ~1.5 ms at 1080p)
RP_PRIM = 7  # origin triangle id (self-exclusion)
RP_CH = 8


def _vis_sorted_kernel(vcounts_ref, vids_hbm_ref, rp_ref, xp_hbm_ref,
                       out_ref, vids_ref, ids_sem, xpb_ref, geo_sem,
                       early_exit=True, unit=32):
    """Winner visibility (restir.cu:172-176) over WAVEFRONT-SORTED rays
    with 32-tri SUB-BLOCK work lists.

    Rays are globally reordered by a (coarse origin, quantized
    direction) key XLA-side so the 1024 lockstep rays of a tile share
    nearly the same crossing set; the per-tile lists hold the 32-tri
    sub-blocks some live ray truly crosses (~2x fewer tri*ray MXU
    tests than 128-tri clusters, prof/prof_union.py) — the TPU answer
    to the reference's per-ray BVH any-hit walk (scene.h:286-316).

    Each iteration flushes EIGHT sub-blocks: their plane rows are
    DMA-gathered along SUBLANES (tri-major [32, 128] slices of the
    transposed plane table — lane starts must be 128-aligned, sublane
    starts only 8-aligned) into one [256, 128] buffer, and the plane
    projections run as broadcast FMA chains at [256, B] (sub-block
    plane columns broadcast against ray-channel rows) — exact in f32
    on the VPU, replacing the earlier 3-pass bf16-split dot whose
    hi/mid/lo passes tripled the MXU MACs (8.7 -> 11.7 fps headline).
    List tails are SENTINEL blocks (zero planes, always miss).
    Outputs the occlusion flag per sorted ray; temporal merge runs in
    a separate kernel in original pixel order."""
    cg = rp_ref.shape[1]
    b = cg * 128
    tile_id = pl.program_id(0)

    # start the work-list DMA so it overlaps setup
    kp = vids_ref.shape[0]
    ids_dma = pltpu.make_async_copy(
        vids_hbm_ref.at[pl.ds(pl.multiple_of(tile_id * kp, 1024), kp)],
        vids_ref, ids_sem,
    )
    ids_dma.start()

    def ch(i):
        return rp_ref[i, :, :].reshape(b)

    oxr = ch(RP_O).reshape(1, b)
    oyr = ch(RP_O + 1).reshape(1, b)
    ozr = ch(RP_O + 2).reshape(1, b)
    dxr = ch(RP_D).reshape(1, b)
    dyr = ch(RP_D + 1).reshape(1, b)
    dzr = ch(RP_D + 2).reshape(1, b)
    limit = ch(RP_LIM).reshape(1, b)
    prim_origin = ch(RP_PRIM).astype(jnp.int32)
    live = ch(RP_LIM) >= 0.0

    def bcp(xp, lo):
        return jnp.broadcast_to(xp[:, lo:lo + 1], (256, b))

    ids_dma.wait()
    vcount = vcounts_ref[tile_id]
    per_flush = 256 // unit
    nflush = (vcount + per_flush - 1) // per_flush

    def fetch(f, slot, wait):
        # per-flush DMA dispatch is ~half this kernel's cost at
        # unit=32 (8 start+wait pairs per [256,128] flush); unit=64
        # (pair-granular work lists) halves the DMA count per tested
        # row — the lists coarsen but results stay bitwise identical
        # (extra tested tris only re-find hits inside their AABB)
        for q in range(per_flush):
            blk = vids_ref[f * per_flush + q]
            cp = pltpu.make_async_copy(
                xp_hbm_ref.at[pl.ds(pl.multiple_of(blk * unit, unit),
                                    unit), :],
                xpb_ref.at[slot, unit * q:unit * (q + 1), :],
                geo_sem.at[slot, q],
            )
            cp.wait() if wait else cp.start()

    @pl.when(nflush > 0)
    def _():
        fetch(0, 0, False)

    def vis_body(f, occluded):
        slot = jax.lax.rem(f, 2)

        @pl.when(f + 1 < nflush)
        def _():
            fetch(f + 1, jax.lax.rem(f + 1, 2), False)

        fetch(f, slot, True)

        xp = xpb_ref[slot]  # [256, 128] = 8 blocks x 32 tris, tri-major
        oou = bcp(xp, 0) * oxr + bcp(xp, 1) * oyr + bcp(xp, 2) * ozr \
            + bcp(xp, 3)
        oov = bcp(xp, 4) * oxr + bcp(xp, 5) * oyr + bcp(xp, 6) * ozr \
            + bcp(xp, 7)
        oow = bcp(xp, 8) * oxr + bcp(xp, 9) * oyr + bcp(xp, 10) * ozr \
            + bcp(xp, 11)
        ddu = bcp(xp, 0) * dxr + bcp(xp, 1) * dyr + bcp(xp, 2) * dzr
        ddv = bcp(xp, 4) * dxr + bcp(xp, 5) * dyr + bcp(xp, 6) * dzr
        ddw = bcp(xp, 8) * dxr + bcp(xp, 9) * dyr + bcp(xp, 10) * dzr
        nondeg = jnp.abs(ddw) >= 1e-12
        tt = -oow / jnp.where(nondeg, ddw, 1.0)
        uu = oou + tt * ddu
        vv = oov + tt * ddv
        # self-exclusion: each ray's origin triangle appears in at most
        # one of the (distinct) blocks -> one excluded row id per ray
        exrow = jnp.full((b,), -1, jnp.int32)
        for q in range(per_flush):
            blk = vids_ref[f * per_flush + q]
            rel = prim_origin - blk * unit
            exrow = jnp.where(
                (rel >= 0) & (rel < unit), rel + unit * q, exrow)
        row = jax.lax.broadcasted_iota(jnp.int32, (256, b), 0)
        blocked = (
            nondeg & (tt > 0.0) & (uu >= 0.0) & (vv >= 0.0)
            & (uu + vv <= 1.0)
            & (tt < limit)
            & (row != exrow[None, :])
        )
        return jnp.maximum(
            occluded, jnp.max(blocked.astype(jnp.float32), axis=0)
        )

    occ0 = jnp.where(~live, 1.0, 0.0)
    if not early_exit:
        occluded = jax.lax.fori_loop(0, nflush, vis_body, occ0)
        out_ref[0, :, :] = occluded.reshape(cg, 128)
        return
    # all-occluded EARLY EXIT: dead rays start occluded, the work lists
    # are front-to-back ordered, and the wavefront sort makes the 1024
    # lockstep rays coherent — fully shadowed tiles stop after the
    # first few flushes instead of scanning the whole list (the
    # round-3 "net loss" measurement predates the global sort). The
    # exit leaves one prefetched flush's DMA in flight; drain it.
    def vis_cond(carry):
        f, occluded = carry
        return jnp.logical_and(f < nflush, jnp.min(occluded) < 0.5)

    def vis_body_w(carry):
        f, occluded = carry
        return f + 1, vis_body(f, occluded)

    f_end, occluded = jax.lax.while_loop(
        vis_cond, vis_body_w, (jnp.int32(0), occ0)
    )

    @pl.when(f_end < nflush)
    def _():
        fetch(f_end, jax.lax.rem(f_end, 2), True)

    out_ref[0, :, :] = occluded.reshape(cg, 128)


def _window_start(gb_ref, prev_ref, window):
    """Temporal-window DMA start for this tile, computed in-kernel (was
    an XLA pre-pass over the whole motion plane): min valid motion index
    over the tile, 128-aligned, clamped so [w0, w0+window) stays inside
    the prev pack. Miss pixels carry motion = 0 (not -1); including
    them would poison the min for any tile seeing background."""
    cg = gb_ref.shape[1]
    b = cg * 128
    r_prev = prev_ref.shape[1]
    motion = gb_ref[G_MOTION, :, :].reshape(b)
    miss = gb_ref[G_MISS, :, :].reshape(b) > 0.5
    m_valid = jnp.where((motion >= 0.0) & ~miss, motion, float(r_prev))
    w0 = jnp.min(m_valid).astype(jnp.int32)
    w0 = (w0 // 128) * 128
    w0 = jnp.clip(w0, 0, max(r_prev - window, 0))
    return pl.multiple_of(w0, 128)


def _merge_sorted_kernel(gb_ref, rs_ref, occ_ref, prev_ref,
                         looper_ref, rt_ref, out_ref, win_ref, sem,
                         *, k, window, temporal, temporal_clamp):
    """Consumes the unsorted occlusion flags from _vis_sorted_kernel and
    runs the temporal merge in original pixel order (the wavefront
    reordering never touches the reuse RNG streams)."""
    cg = gb_ref.shape[1]
    b = cg * 128
    tile_id = pl.program_id(0)
    pix = looper_ref[1].astype(jnp.int32) + tile_id * b + (
        jax.lax.broadcasted_iota(jnp.int32, (b, 1), 0).reshape(b)
    )
    looper = looper_ref[0]

    if temporal:
        w0 = _window_start(gb_ref, prev_ref, window)
        pltpu.make_async_copy(
            prev_ref.at[:, pl.ds(w0, window)], win_ref, sem
        ).start()
    else:
        w0 = None

    def ch(i):
        return gb_ref[i, :, :].reshape(b)

    def rch(i):
        return rs_ref[i, :, :].reshape(b)

    shade = ch(G_SHADE) > 0.5
    occluded = occ_ref[0, :, :].reshape(b)
    r_weight = jnp.where(occluded > 0.5, 0.0, rch(RS_W))
    res = (rch(RS_LI), rch(RS_LI + 1), rch(RS_LI + 2),
           rch(RS_WI), rch(RS_WI + 1), rch(RS_WI + 2),
           rch(RS_DIST), r_weight,
           jnp.where(shade, float(k), 0.0))
    _temporal_merge_pack(
        gb_ref, out_ref, prev_ref, w0, win_ref, sem, looper, pix,
        res, window=window, temporal=temporal,
        temporal_clamp=temporal_clamp,
        r_t=rt_ref[0, :, :].reshape(b) if temporal else None,
    )


def _vis_resident_kernel(gb_ref, rs_ref, xpt_ref,
                         prev_ref, looper_ref, rt_ref, out_ref, win_ref,
                         sem,
                         *, k, nb, n_pad, window, temporal, temporal_clamp):
    """Small-scene winner-visibility kernel: triangle planes are
    VMEM-resident and the any-hit loop is a plain block fori (no work
    lists, no per-cluster DMA sync)."""
    cg = gb_ref.shape[1]
    b = cg * 128
    tile_id = pl.program_id(0)
    pix = looper_ref[1].astype(jnp.int32) + tile_id * b + (
        jax.lax.broadcasted_iota(jnp.int32, (b, 1), 0).reshape(b)
    )
    looper = looper_ref[0]

    def rch(i):
        return rs_ref[i, :, :].reshape(b)

    rs_vals = tuple(rch(i) for i in range(RS_CH))
    _vis_resident_core(
        gb_ref, rs_vals, xpt_ref, prev_ref, looper, pix, out_ref,
        win_ref, sem, k=k, nb=nb, n_pad=n_pad, window=window,
        temporal=temporal, temporal_clamp=temporal_clamp,
        r_t=rt_ref[0, :, :].reshape(b) if temporal else None,
    )


def _vis_resident_core(gb_ref, rs_vals, xpt_ref, prev_ref, looper, pix,
                       out_ref, win_ref, sem,
                       *, k, nb, n_pad, window, temporal, temporal_clamp,
                       r_t=None):
    """Winner visibility (brute over resident plane blocks) + temporal
    merge. `rs_vals` are the RS-pack channels as 1-D [B] arrays."""
    cg = gb_ref.shape[1]
    b = cg * 128

    def ch(i):
        return gb_ref[i, :, :].reshape(b)

    if temporal:
        w0 = _window_start(gb_ref, prev_ref, window)
        pltpu.make_async_copy(
            prev_ref.at[:, pl.ds(w0, window)], win_ref, sem
        ).start()
    else:
        w0 = None

    px, py, pz = ch(G_POS), ch(G_POS + 1), ch(G_POS + 2)
    shade = ch(G_SHADE) > 0.5
    prim_origin = ch(G_PRIM).astype(jnp.int32)

    r_li_x, r_li_y, r_li_z = rs_vals[RS_LI], rs_vals[RS_LI + 1], rs_vals[RS_LI + 2]
    r_wi_x, r_wi_y, r_wi_z = rs_vals[RS_WI], rs_vals[RS_WI + 1], rs_vals[RS_WI + 2]
    r_dist = rs_vals[RS_DIST]
    r_weight = rs_vals[RS_W]
    r_m = jnp.where(shade, float(k), 0.0)

    # winner visibility (restir.cu:172-176), brute over resident blocks
    # as VPU FMA chains over lane-broadcast plane coefficients (see
    # _gbuffer_kernel_resident: 1.7x over the K=4-padded MXU form)
    oxr = (px + r_wi_x * 1e-5).reshape(1, b)
    oyr = (py + r_wi_y * 1e-5).reshape(1, b)
    ozr = (pz + r_wi_z * 1e-5).reshape(1, b)
    dxr = r_wi_x.reshape(1, b)
    dyr = r_wi_y.reshape(1, b)
    dzr = r_wi_z.reshape(1, b)
    limit = (r_dist * (1.0 - 1e-3) - 1e-4).reshape(1, b)
    prim_o = prim_origin.reshape(1, b)

    def bc(xp, lo):
        return jnp.broadcast_to(xp[:, lo:lo + 1], (nb, b))

    def vis_body(i, occluded):
        row = pl.multiple_of(i * nb, nb)
        xp = xpt_ref[pl.ds(row, nb), :]  # [nb, 128] tri-major planes
        oou = bc(xp, 0) * oxr + bc(xp, 1) * oyr + bc(xp, 2) * ozr + bc(xp, 3)
        oov = bc(xp, 4) * oxr + bc(xp, 5) * oyr + bc(xp, 6) * ozr + bc(xp, 7)
        oow = (bc(xp, 8) * oxr + bc(xp, 9) * oyr + bc(xp, 10) * ozr
               + bc(xp, 11))
        ddu = bc(xp, 0) * dxr + bc(xp, 1) * dyr + bc(xp, 2) * dzr
        ddv = bc(xp, 4) * dxr + bc(xp, 5) * dyr + bc(xp, 6) * dzr
        ddw = bc(xp, 8) * dxr + bc(xp, 9) * dyr + bc(xp, 10) * dzr
        nondeg = jnp.abs(ddw) >= 1e-12
        tt = -oow / jnp.where(nondeg, ddw, 1.0)
        uu = oou + tt * ddu
        vv = oov + tt * ddv
        tri_ids = jax.lax.broadcasted_iota(jnp.int32, (nb, b), 0) + i * nb
        blocked = (
            nondeg & (tt > 0.0) & (uu >= 0.0) & (vv >= 0.0)
            & (uu + vv <= 1.0)
            & (tt < limit)
            & (tri_ids != prim_o)
        )
        return jnp.maximum(
            occluded, jnp.max(blocked.astype(jnp.float32), axis=0,
                              keepdims=True)
        )

    occluded = jax.lax.fori_loop(
        0, n_pad // nb, vis_body, jnp.zeros((1, b), jnp.float32)
    )
    r_weight = jnp.where(occluded.reshape(b) > 0.5, 0.0, r_weight)

    _temporal_merge_pack(
        gb_ref, out_ref, prev_ref, w0, win_ref, sem, looper, pix,
        (r_li_x, r_li_y, r_li_z, r_wi_x, r_wi_y, r_wi_z, r_dist, r_weight,
         r_m),
        window=window, temporal=temporal, temporal_clamp=temporal_clamp,
        r_t=r_t,
    )


def _temporal_merge_pack(gb_ref, out_ref, prev_ref, w0, win_ref, sem,
                         looper, pix, res, *, window, temporal,
                         temporal_clamp, r_t=None):
    """Temporal reuse (restir.cu:180-185; findTemporalNeighbor :21-45) +
    pt-pack write, shared by the streaming and resident vis kernels. The
    caller must have STARTED the window DMA (prev -> win_ref via sem)
    from start `w0` (see _window_start)."""
    cg = gb_ref.shape[1]
    b = cg * 128
    (r_li_x, r_li_y, r_li_z, r_wi_x, r_wi_y, r_wi_z, r_dist, r_weight,
     r_m) = res

    def ch(i):
        return gb_ref[i, :, :].reshape(b)

    shade = ch(G_SHADE) > 0.5

    if temporal:
        dma = pltpu.make_async_copy(
            prev_ref.at[:, pl.ds(w0, window)], win_ref, sem
        )
        dma.wait()
        motion = ch(G_MOTION).astype(jnp.int32)
        rel = motion - w0
        in_win = (motion >= 0) & (rel >= 0) & (rel < window)
        rel = jnp.where(in_win, rel, 0)

        # Mod-gather: the naive [window, B] one-hot matmul pads PT_CH=16
        # MXU rows to 128 (8x MAC waste, and a [window, B] f32 one-hot
        # in VMEM). Instead stack the window's 8 lane-chunks on the
        # SUBLANE axis (win2[16j+i, t] = win[i, j*cw+t] — a tile-level
        # rearrangement), gather every chunk at rel %% cw with ONE
        # [128, cw] @ [cw, B] exact product, then keep only the true
        # chunk's 16-row block per lane (rel // cw) and block-sum.
        # All 128 MXU rows are useful and the one-hot shrinks 8x.
        # Bitwise identical to the padded form: the matmul is an exact
        # gather (0/1 bf16 one-hot x hi/mid/lo split), masked blocks
        # contribute exact +0.0. (A coherent-shift pltpu.roll fast path
        # behind lax.cond measured NO win here: Mosaic evaluates both
        # branches of in-kernel conds.)
        nchunk = 8  # 8 * PT_CH = 128 = full MXU M
        cw = window // nchunk
        win2 = jnp.concatenate(
            [win_ref[:, j * cw:(j + 1) * cw] for j in range(nchunk)],
            axis=0)  # [128, cw]
        rel_mod = jax.lax.rem(rel, cw)
        jstar = rel // cw
        rows = jax.lax.broadcasted_iota(jnp.int32, (cw, b), 0)
        oh = (rows == rel_mod[None, :]).astype(jnp.bfloat16)
        wh, wm, wl = _hi_mid_lo(win2)
        out = _bdot(wh, oh) + (_bdot(wm, oh) + _bdot(wl, oh))  # [128, B]
        blk_row = jax.lax.broadcasted_iota(
            jnp.int32, (nchunk * PT_CH, b), 0) // PT_CH
        out = jnp.where(blk_row == jstar[None, :], out, 0.0)
        acc = out[0:PT_CH]
        for j in range(1, nchunk):
            acc = acc + out[j * PT_CH:(j + 1) * PT_CH]
        gathered = acc  # [PT_CH, B]

        n_li_x, n_li_y, n_li_z = gathered[P_LI], gathered[P_LI + 1], gathered[P_LI + 2]
        n_wi_x, n_wi_y, n_wi_z = gathered[P_WI], gathered[P_WI + 1], gathered[P_WI + 2]
        n_dist = gathered[P_DIST]
        n_weight = gathered[P_WEIGHT]
        n_m = gathered[P_M]
        n_prim = gathered[P_PRIMR]
        n_nx, n_ny, n_nz = gathered[P_NORM], gathered[P_NORM + 1], gathered[P_NORM + 2]
        n_depth = gathered[P_DEPTH]

        # geometric similarity rejection (unflipped gbuffer normals)
        g_nx, g_ny, g_nz = ch(G_NORM), ch(G_NORM + 1), ch(G_NORM + 2)
        depth = ch(G_DEPTH)
        prim_remap = ch(G_PRIMR)
        ok = in_win & (prim_remap > _NULL)
        ok = ok & (n_prim == prim_remap)
        ok = ok & (jnp.abs(_dot3(g_nx, g_ny, g_nz, n_nx, n_ny, n_nz)) >= 0.9)
        ok = ok & (jnp.abs(n_depth - depth) <= depth * 0.1)
        ok = ok & shade
        # neighbor reservoir validity (restir.h:51-53)
        n_bad = jnp.isnan(n_weight) | jnp.isinf(n_weight) | (n_weight < 0.0)
        ok = ok & ~n_bad

        # preClampedMerge<cap> (restir.h:95-102): clamp rhs history to
        # (cap-1)*a.M, then merge
        cap = float(temporal_clamp)
        limit_m = jnp.where(r_m > 0.0, (cap - 1.0) * r_m, n_m)
        over = n_m > limit_m
        scale = limit_m / jnp.maximum(n_m, 1.0)
        n_weight = jnp.where(over, n_weight * scale, n_weight)
        n_m = jnp.where(over, limit_m, n_m)

        if r_t is None:
            u1, _, _, _ = _pcg4d(
                pix, jnp.full((b,), looper, jnp.uint32),
                jnp.full((b,), _CTR_TEMPORAL, jnp.uint32),
                jnp.full((b,), _SALT_RESTIR, jnp.uint32),
            )
            r_t = _unit(u1)
        w_new = jnp.where(ok, r_weight + n_weight, r_weight)
        m_new = jnp.where(ok, r_m + n_m, r_m)
        take = ok & (r_t * w_new < n_weight)
        r_li_x = jnp.where(take, n_li_x, r_li_x)
        r_li_y = jnp.where(take, n_li_y, r_li_y)
        r_li_z = jnp.where(take, n_li_z, r_li_z)
        r_wi_x = jnp.where(take, n_wi_x, r_wi_x)
        r_wi_y = jnp.where(take, n_wi_y, r_wi_y)
        r_wi_z = jnp.where(take, n_wi_z, r_wi_z)
        r_dist = jnp.where(take, n_dist, r_dist)
        r_weight = w_new
        r_m = m_new

    # check_validity (restir.h:55-59)
    bad = jnp.isnan(r_weight) | jnp.isinf(r_weight) | (r_weight < 0.0)
    r_weight = jnp.where(bad, 0.0, r_weight)
    r_m = jnp.where(bad, 0.0, r_m)

    # ONE stacked store for the whole pt pack (16 separate channel
    # stores pay 16 op dispatches; PT channel order per the P_* layout)
    zero = jnp.zeros_like(r_weight)
    vals = [None] * PT_CH
    vals[P_LI], vals[P_LI + 1], vals[P_LI + 2] = r_li_x, r_li_y, r_li_z
    vals[P_WI], vals[P_WI + 1], vals[P_WI + 2] = r_wi_x, r_wi_y, r_wi_z
    vals[P_DIST] = r_dist
    vals[P_WEIGHT] = r_weight
    vals[P_M] = r_m
    vals[P_PRIMR] = ch(G_PRIMR)
    vals[P_NORM] = ch(G_NORM)
    vals[P_NORM + 1] = ch(G_NORM + 1)
    vals[P_NORM + 2] = ch(G_NORM + 2)
    vals[P_DEPTH] = ch(G_DEPTH)
    vals[14] = zero
    vals[15] = zero
    out_ref[:, :, :] = jnp.stack(vals, axis=0).reshape(PT_CH, cg, 128)


def _ray_cluster_crossing(o3, d3, tmax, live, tile, cluster_lo, cluster_hi,
                          rad_scale=None):
    """Per-ray-EXACT cluster-AABB crossing, reduced per tile (XLA-side).

    The slab test t = (bound - o) * inv_d is bilinear in (per-cluster
    bound, per-ray inv_d / o*inv_d): six tiny [B, 2] @ [2, K] matmuls
    plus elementwise min/max per ray chunk give the exact AABB interval
    test the in-kernel pretest runs — so the work lists contain ONLY
    clusters some live ray truly crosses. This replaces the round-2
    segment-union cull (>3x over-coverage on deep views) and the
    round-3a bounding-sphere variant (~2x over-coverage on long-thin
    Morton clusters); it is the any-hit pruning the reference's per-ray
    BVH walk gets structurally (scene.h:286-316).

    Returns any[T, K] bool. Processed in tile bands to bound the
    [rays, K] intermediates. `rad_scale` ([K]) optionally inflates the
    AABBs (AA-jitter margin for primary rays).
    """
    r = o3.shape[0]
    n_t = r // tile
    kz = cluster_lo.shape[0]
    lo = cluster_lo.astype(jnp.float32)
    hi = cluster_hi.astype(jnp.float32)
    if rad_scale is not None:
        lo = lo - rad_scale[:, None]
        hi = hi + rad_scale[:, None]

    band = max(1, min(n_t, 8))
    while n_t % band:
        band -= 1
    nb_t = n_t // band
    br = band * tile

    def per_band(args):
        o_b, d_b, tm_b, lv_b = args
        tiny = 1e-12
        inv = 1.0 / jnp.where(jnp.abs(d_b) < tiny, tiny, d_b)  # [br, 3]
        # slab bounds per axis, matmul form:
        # t = (bound - o) * inv = bound * inv - o * inv
        t_near = jnp.full((br, kz), -3e38, jnp.float32)
        t_far = jnp.full((br, kz), 3e38, jnp.float32)
        for ax in range(3):
            # explicit broadcast FMAs (see _ray_cluster_crossing_rows:
            # the dot form may lower to MXU convs whose [br, K] outputs
            # spill to HBM)
            o_inv = -o_b[:, ax] * inv[:, ax]
            t1 = inv[:, ax, None] * lo[None, :, ax] + o_inv[:, None]
            t2 = inv[:, ax, None] * hi[None, :, ax] + o_inv[:, None]
            t_near = jnp.maximum(t_near, jnp.minimum(t1, t2))
            t_far = jnp.minimum(t_far, jnp.maximum(t1, t2))
        cross = (
            (t_far >= t_near) & (t_far >= 0.0)
            & (t_near <= tm_b[:, None])
            & lv_b[:, None]
        )
        return jnp.any(cross.reshape(band, tile, kz), axis=1)  # [band, K]

    inputs = (
        o3.reshape(nb_t, br, 3), d3.reshape(nb_t, br, 3),
        tmax.reshape(nb_t, br), live.reshape(nb_t, br),
    )
    any_cross = jax.lax.map(per_band, inputs)  # [nb_t, band, K]
    return any_cross.reshape(n_t, kz)


def _wavefront_key(o3c, w3, live, cluster_lo, cluster_hi):
    """Shadow-ray wavefront sort key = (coarse origin cell, quantized
    direction), computed on CHANNEL ROWS ([R] per axis). Coherent rays
    land in the same 1024-ray tile, so per-tile cluster work lists
    collapse toward the per-ray crossing mean (measured on the 81k-tri
    hall: union mean 240 -> 49 of 634; per-ray exact mean 14). Dead
    rays sort to the tail, so fully-dead tiles skip their streaming
    loop entirely."""
    lo_w = jnp.min(cluster_lo, axis=0)
    ext = jnp.maximum(jnp.max(cluster_hi, axis=0) - lo_w, 1e-6)
    # origin: 2 bits/axis; direction: 3 bits/axis (prof/prof_wavefront)
    q = [jnp.clip(((o3c[ax] - lo_w[ax]) / ext[ax] * 4.0).astype(jnp.int32),
                  0, 3) for ax in range(3)]
    pos6 = (q[0] << 4) | (q[1] << 2) | q[2]
    nrm = jnp.maximum(jnp.maximum(jnp.abs(w3[0]), jnp.abs(w3[1])),
                      jnp.abs(w3[2]))
    nrm = jnp.maximum(nrm, 1e-9)
    dq = [((w3[ax] / nrm + 1.0) * 3.5).astype(jnp.int32) for ax in range(3)]
    dir9 = (dq[0] << 6) | (dq[1] << 3) | dq[2]
    key = (pos6 << 9) | dir9
    return jnp.where(live, key, jnp.int32(0x7FFFFFFF))


def _wavefront_perm(o3, d3, live, cluster_lo, cluster_hi):
    """[R, 3]-input wrapper around _wavefront_key returning (perm, inv).
    Kept for the prof harnesses; the pipeline uses the payload-carrying
    sort instead (a 2M-row XLA take costs ~50 ms — ~2.4 ns/element,
    per-element loads — while an 11-operand lax.sort moves the same
    payload in ~16 ms and a 2-operand re-sort by the carried perm
    replaces the inverse-permutation gather, prof/prof_take2.py)."""
    o3c = [o3[:, ax] for ax in range(3)]
    w3 = [d3[:, ax] for ax in range(3)]
    key = _wavefront_key(o3c, w3, live, cluster_lo, cluster_hi)
    perm = jnp.argsort(key)
    r = perm.shape[0]
    inv = jnp.zeros((r,), jnp.int32).at[perm].set(
        jnp.arange(r, dtype=jnp.int32)
    )
    return perm, inv


def _ray_cluster_crossing_rows(o3r, d3r, tmax, live, tile, blo, bhi):
    """_ray_cluster_crossing with CHANNEL-ROW ray inputs ([3, R]).

    Same banded per-ray-exact slab test, but every per-axis access is a
    contiguous 1-D row instead of a strided column of an [R, 3] view:
    inside the fused reuse jit the transposed form made XLA fuse
    strided rp[...].T reads into every band of the [rays, S] test,
    measured 225 ms vs 58 ms isolated on the 81k-tri hall at S=2536.
    Returns any[T, S] bool."""
    r = o3r.shape[1]
    n_t = r // tile
    kz = blo.shape[0]
    lo = blo.astype(jnp.float32)
    hi = bhi.astype(jnp.float32)

    band = max(1, min(n_t, 8))
    while n_t % band:
        band -= 1
    nb_t = n_t // band
    br = band * tile

    def per_band(args):
        o_b, d_b, tm_b, lv_b = args  # o_b, d_b: [3, br]
        tiny = 1e-12
        # fold liveness into tmax ([br] op, not a [br, S] mask) and
        # collapse the exit test: with tn0 = max(t_near, 0),
        # (t_far>=t_near & t_far>=0 & t_near<=tm & live) == for live
        # rays (tn0<=t_far & tn0<=tm) and is identically false for
        # dead rows once tm==-1 — 3 fewer [br, S] VPU ops of ~22
        tm2 = jnp.where(lv_b, tm_b, -1.0)
        t_near = None
        t_far = None
        for ax in range(3):
            d_ax = d_b[ax]
            inv = 1.0 / jnp.where(jnp.abs(d_ax) < tiny, tiny, d_ax)
            o_inv = -o_b[ax] * inv
            # EXPLICIT broadcast FMAs, not a [br,2]@[2,K] dot: left as
            # a dot, XLA (context-dependently) lowers it to MXU
            # convolutions whose [br, K] f32 outputs spill to HBM —
            # measured 225 ms vs 58 ms for the same math fused on the
            # VPU (hall, S=2536)
            t1 = inv[:, None] * lo[None, :, ax] + o_inv[:, None]
            t2 = inv[:, None] * hi[None, :, ax] + o_inv[:, None]
            if ax == 0:
                t_near = jnp.minimum(t1, t2)
                t_far = jnp.maximum(t1, t2)
            else:
                t_near = jnp.maximum(t_near, jnp.minimum(t1, t2))
                t_far = jnp.minimum(t_far, jnp.maximum(t1, t2))
        tn0 = jnp.maximum(t_near, 0.0)
        cross = (tn0 <= t_far) & (tn0 <= tm2[:, None])
        return jnp.any(cross.reshape(band, tile, kz), axis=1)

    inputs = (
        jnp.moveaxis(o3r.reshape(3, nb_t, br), 1, 0),
        jnp.moveaxis(d3r.reshape(3, nb_t, br), 1, 0),
        tmax.reshape(nb_t, br), live.reshape(nb_t, br),
    )
    any_cross = jax.lax.map(per_band, inputs)  # [nb_t, band, K]
    return any_cross.reshape(n_t, kz)


def _sub_block_lists(o3r, d3r, tmax, live, tile, sub_lo, sub_hi,
                     order="near"):
    """Per-tile shadow-ray work lists over SORTED rays at 32-tri
    SUB-BLOCK granularity: per-ray-exact crossing
    (_ray_cluster_crossing_rows vs the 4-per-cluster sub-AABBs; ray
    inputs are CHANNEL ROWS [3, R]) cuts the MXU tri*ray tests ~2x vs
    whole clusters on the 81k-tri hall (prof/prof_union.py: 12.9G ->
    6.38G). order="near" sorts each list front-to-back by box-center
    distance from the tile's mean shadow-ray origin (a [T, S] FMA
    chain, ~free next to the crossing itself) so the vis kernel's
    all-occluded early exit fires as soon as the nearby blockers have
    been tested; order="id" keeps the unordered form. Entries beyond
    the count are a SENTINEL block of zero planes (always-miss).
    Returns (counts [T], ids flat i32, kp)."""
    overlap = _ray_cluster_crossing_rows(
        o3r, d3r, tmax, live, tile, sub_lo, sub_hi
    )  # [T, S]
    counts = jnp.sum(overlap, axis=1).astype(jnp.int32)
    s = overlap.shape[1]
    if order == "near":
        r = o3r.shape[1]
        o_t = jnp.mean(o3r.reshape(3, r // tile, tile), axis=2)  # [3, T]
        ctr = (sub_lo.astype(jnp.float32)
               + sub_hi.astype(jnp.float32)) * 0.5  # [S, 3]
        d2 = jnp.zeros(overlap.shape, jnp.float32)
        for ax in range(3):
            df = o_t[ax][:, None] - ctr[None, :, ax]
            d2 = d2 + df * df
        key = jnp.where(overlap, d2, jnp.float32(3e38))
    else:
        idx = jax.lax.broadcasted_iota(jnp.int32, overlap.shape, 1)
        key = jnp.where(overlap, idx, jnp.int32(0x7FFFFFFF))
    ids = jnp.argsort(key, axis=1).astype(jnp.int32)
    pos = jax.lax.broadcasted_iota(jnp.int32, ids.shape, 1)
    ids = jnp.where(pos < counts[:, None], ids, jnp.int32(s))
    kp = _round_up(ids.shape[1], 1024)
    if kp != ids.shape[1]:
        ids = jnp.concatenate(
            [ids,
             jnp.full((ids.shape[0], kp - ids.shape[1]), s, jnp.int32)], 1
        )
    return counts, ids.reshape(-1), kp


@functools.partial(jax.jit, static_argnames=(
    "k", "single_sided", "nb", "window", "temporal", "temporal_clamp",
    "has_env", "has_met", "interpret"))
def reuse_pallas(
    gb_pack, prev_pack, looper,
    light_verts, light_normal, light_radiance, light_area, light_center,
    light_radius, tri_xform, cluster_lo, cluster_hi,
    sub_lo=None, sub_hi=None,
    k: int = 4, single_sided: bool = True, nb: int = 128,
    window: int = 2048, temporal: bool = True, temporal_clamp: int = 20,
    has_env: bool = False, env_tile_rad=None, env_tile_uv=None,
    env_tile_sa=None,
    pix0=0, prev_base=0, has_met: bool = True,
    interpret: bool = False,
):
    """RIS + winner visibility + temporal merge, as two kernels with an
    XLA shadow-segment cluster-culling step between them.

    gb_pack: [GB_CH, R/128, 128]; prev_pack: [PT_CH, R] (previous
    frame's output, flat). Returns the post-temporal pt pack
    [PT_CH, R/128, 128]."""
    g = gb_pack.shape[1]
    r = g * 128
    # under shard_map row-band parallelism, prev_pack is the local band
    # extended by halos and prev_base is the global pixel index of its
    # first column: rebase motion so all window math is pack-local
    if not (isinstance(prev_base, int) and prev_base == 0):
        # single-chip callers pass a static 0: skip the whole-pack copy
        mo = gb_pack[G_MOTION]
        gb_pack = gb_pack.at[G_MOTION].set(
            jnp.where(mo >= 0.0, mo - jnp.float32(prev_base), mo)
        )
    nl = light_verts.shape[0]
    n_env = env_tile_rad.shape[0] if has_env else 0
    l_pad = _round_up(max(nl + n_env, 128), 128)
    psi_a, psi_b, psi_c, lum_aux, tri_lo, light_table = build_light_tables(
        light_verts, light_normal, light_radiance, light_area, light_center,
        light_radius, l_pad,
        env_tile_rad=env_tile_rad if has_env else None,
        env_tile_uv=env_tile_uv if has_env else None,
        env_tile_sa=env_tile_sa if has_env else None,
    )

    assert nb == 128, "cluster blocks are CLUSTER_SIZE=128 wide"
    # RIS-candidate + temporal RNG precomputed WHOLE-FRAME in XLA
    # (~0.3 ms vectorized vs ~8 ms/frame per in-kernel 1-D pcg4d chain
    # in Mosaic per-op dispatch); streams bit-identical to the
    # in-kernel hash. Candidate block layout matches
    # _ris_select_core's wide() sublane blocks.
    from ...utils import rng as _rngm

    pixg = (jnp.asarray(pix0, jnp.uint32)
            + jnp.arange(r, dtype=jnp.uint32))
    us = [_rngm.uniform4(pixg, looper, _CTR_RIS + kk, _rngm.SALT_RESTIR)
          for kk in range(k)]
    rngk = jnp.stack(
        [jnp.stack([us[kk][c] for kk in range(k)]) for c in range(4)]
    ).reshape(4, k, g, 128)
    if temporal:
        rt1 = _rngm.uniform1(
            pixg, looper, _CTR_TEMPORAL, _rngm.SALT_RESTIR
        ).reshape(1, g, 128)
    else:
        rt1 = jnp.zeros((1, g, 128), jnp.float32)
    n_tri = tri_xform.shape[1] // 3
    n_pad = _round_up(max(n_tri, nb), nb)
    xu, xv, xw = _split_planes(tri_xform, n_pad)
    # TRANSPOSED plane table [n_pad + 32, 128] (tri-major rows; cols
    # 0:4 xu, 4:8 xv, 8:12 xw, 12:128 zero): the vis kernel DMA-gathers
    # 32-tri sub-blocks along SUBLANES as full-lane-width [32, 128]
    # slices (HBM lane slices must be 128-aligned AND 128-wide — Mosaic
    # pads the trailing dim to the tile anyway, so the zero lanes cost
    # nothing but HBM bytes), and feeds the whole [256, 128] buffer as
    # the matmul LHS against a K=128 zero-padded RHS — identical MXU
    # passes, since K<128 contractions pad to 128 regardless. The final
    # 32 zero rows are the SENTINEL always-miss block padding work-list
    # tails.
    xplanes_t = jnp.concatenate(
        [jnp.concatenate(
            [xu, xv, xw, jnp.zeros((116, n_pad), xu.dtype)], axis=0).T,
         jnp.zeros((64, 128), xu.dtype)], axis=0,
    )  # 64 zero rows = the SENTINEL always-miss 64-tri pair
    n_tiles = r // _TILE
    tg = _TILE // 128
    full_p = lambda i, *_: (0, 0)  # noqa: E731

    # ---- kernel R1: RIS candidate selection
    r1 = functools.partial(
        _ris_select_kernel, l_pad=l_pad, k=k, single_sided=single_sided,
        n_area=nl, has_env=has_env, has_met=has_met,
    )
    rs = pl.pallas_call(
        r1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((GB_CH, tg, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((l_pad, 4), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((l_pad, 4), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((l_pad, 5), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((l_pad, 2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((l_pad, l_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LIGHT_COLS, l_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((4, k, tg, 128), lambda i: (0, 0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (RS_CH, tg, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((RS_CH, g, 128), jnp.float32),
        interpret=interpret,
    )(gb_pack, psi_a, psi_b, psi_c, lum_aux, tri_lo, light_table,
      _lp2(looper, pix0), rngk)

    # ---- XLA: temporal window starts (+ the wavefront ray sort and its
    # cluster work lists on the streaming path)
    resident = n_tri <= _RESIDENT_MAX_TRIS
    if not resident:
        shade = gb_pack[G_SHADE].reshape(-1) > 0.5
        live = shade & (rs[RS_W].reshape(-1) > 0.0)
        w3 = [rs[RS_WI + ax].reshape(-1) for ax in range(3)]
        o3c = [gb_pack[G_POS + ax].reshape(-1) + w3[ax] * 1e-5
               for ax in range(3)]
        limit = rs[RS_DIST].reshape(-1) * (1.0 - 1e-3) - 1e-4
        # liveness rides in the limit's sign (dead = -1; live limits
        # clamp to >= 0, where `tt < 0` can never occlude anyway)
        limit = jnp.where(live, jnp.maximum(limit, 0.0), -1.0)
        key = _wavefront_key(o3c, w3, live, cluster_lo, cluster_hi)
        # payload-carrying sort: the key rides with the 8 rp channels
        # and an iota (-> perm), ~15 ms vs ~50 ms for argsort + a 2M-row
        # XLA take (per-element loads; prof/prof_take2.py). Stable sort
        # with an iota payload == jnp.argsort, so the perm (and every
        # downstream bit) is unchanged.
        srt = jax.lax.sort(
            (key, jnp.arange(key.shape[0], dtype=jnp.int32))
            + tuple(o3c) + tuple(w3)
            + (limit, gb_pack[G_PRIM].reshape(-1)),
            num_keys=1,
        )
        perm = srt[1]
        rp = jnp.stack(srt[2:], axis=0)  # [RP_CH, R], sorted
        # limit as the crossing tmax is exact: a blocking triangle at
        # tt < limit lies inside its sub-block AABB, so t_near <= tt.
        # Lists are built at 64-tri PAIR granularity (union AABBs of
        # adjacent 32-tri Morton sub-blocks): the vis kernel's cost is
        # ~half DMA dispatch, and pairs halve the per-flush DMA count
        # for ~30% more tested rows — measured net win; results are
        # bitwise identical (a hit inside an AABB is found whether or
        # not its sibling was the listed reason). The crossing glue
        # also halves ([rays x S/2] FMAs).
        import os

        # list/DMA granularity follows the scene's sub-AABBs
        # (scene_data.SUB_BLOCK); VIS_UNIT=2*SUB_BLOCK pairs adjacent
        # blocks (measured 10% slower at 64 vs 32 — kept as a knob)
        unit_d = max(8, n_pad // sub_lo.shape[0])
        vis_unit = int(os.environ.get("VIS_UNIT", str(unit_d)))
        if vis_unit == 2 * unit_d:
            # empty sub-blocks are degenerate far points (lo = hi =
            # 3e37, scene_data): their hi must not poison a real
            # sibling's union (a [lo_real, 3e37] box would cross
            # everything), so flip it to -3e37 first; a both-empty
            # pair becomes an inverted (never-crossing) interval
            is_empty = (sub_lo[:, 0] > 1e37)[:, None]
            hi_u = jnp.where(is_empty, jnp.float32(-3e37), sub_hi)
            list_lo = jnp.minimum(sub_lo[0::2], sub_lo[1::2])
            list_hi = jnp.maximum(hi_u[0::2], hi_u[1::2])
        else:
            list_lo, list_hi = sub_lo, sub_hi
        vcounts, vids, v_kp = _sub_block_lists(
            rp[RP_O:RP_O + 3], rp[RP_D:RP_D + 3], rp[RP_LIM],
            rp[RP_LIM] >= 0.0, _TILE, list_lo, list_hi
        )
        rp = rp.reshape(RP_CH, g, 128)
    # temporal window starts are derived IN-KERNEL per tile from the
    # motion/miss channels (_window_start) — no XLA pre-pass

    if resident:
        # ---- kernel R2 (resident): VMEM geometry, no work lists
        nb_res = min(256, n_pad)
        n_pad_res = _round_up(n_pad, nb_res)
        xu_r, xv_r, xw_r = _split_planes(tri_xform, n_pad_res)
        # tri-major plane table for the FMA hit chains (see kernel G)
        xpt_r = jnp.concatenate(
            [xu_r, xv_r, xw_r, jnp.zeros((116, n_pad_res), xu_r.dtype)],
            axis=0).T
        r2 = functools.partial(
            _vis_resident_kernel, k=k, nb=nb_res, n_pad=n_pad_res,
            window=window, temporal=temporal, temporal_clamp=temporal_clamp,
        )
        return pl.pallas_call(
            r2,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((GB_CH, tg, 128), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((RS_CH, tg, 128), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_pad_res, 128), full_p,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),  # prev pack (HBM)
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, tg, 128), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (PT_CH, tg, 128), lambda i: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((PT_CH, window), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
            out_shape=jax.ShapeDtypeStruct((PT_CH, g, 128), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(gb_pack, rs, xpt_r, prev_pack, _lp2(looper, pix0), rt1)

    # ---- kernel R2a: wavefront-sorted winner visibility (streams only
    # the 32-tri sub-blocks the tile's coherent rays truly cross)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # vis work lists (HBM)
            pl.BlockSpec((RP_CH, tg, 128), lambda i, *_: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # tri planes (HBM)
        ],
        out_specs=pl.BlockSpec(
            (1, tg, 128), lambda i, *_: (0, i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.SMEM((v_kp,), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.VMEM((2, 256, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 256 // vis_unit)),
        ],
    )
    occ_s = pl.pallas_call(
        functools.partial(_vis_sorted_kernel, unit=vis_unit),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, g, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(vcounts, vids, rp, xplanes_t)
    # unsort by re-sorting on the carried perm (perm is a permutation of
    # iota, so this is exact; ~7 ms vs inverse-perm scatter + take)
    occ = jax.lax.sort(
        (perm, occ_s.reshape(-1)), num_keys=1
    )[1].reshape(1, g, 128)

    # ---- kernel R2b: temporal merge in original pixel order
    mk = functools.partial(
        _merge_sorted_kernel, k=k, window=window, temporal=temporal,
        temporal_clamp=temporal_clamp,
    )
    return pl.pallas_call(
        mk,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((GB_CH, tg, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RS_CH, tg, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tg, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # prev pack (HBM)
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, tg, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (PT_CH, tg, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((PT_CH, window), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        out_shape=jax.ShapeDtypeStruct((PT_CH, g, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(gb_pack, rs, occ, prev_pack, _lp2(looper, pix0), rt1)


# ---------------------------------------------------------------------------
# fused resident DI kernel: G + R1 + R2 in one dispatch


def _di_resident_kernel(cam_ref, lcam_ref, looper_ref, xy_ref, xpt_ref,
                        attr_ref, mat_ref, env_ref, atlas_ref, texmeta_ref,
                        psi_a_ref, psi_b_ref, psi_c_ref, lumaux_ref,
                        tri_lo_ref, light_ref, prev_ref,
                        gb_ref, pt_ref, win_ref, sem,
                        *, n_pad, nb, m_pad, width, height, aa_jitter,
                        single_sided, has_env, with_textures,
                        l_pad, k, n_area, has_met,
                        window, temporal, temporal_clamp):
    """ONE kernel for the whole resident DI reuse chain: primary hit +
    G-buffer epilogue (writes gb_ref), RIS candidate selection, winner
    visibility, temporal merge (writes pt_ref) — kernels G/R1/R2 fused.

    Small resident scenes are dispatch-bound: at 1080p the 3-kernel
    chain pays 3 x 2025 grid steps x ~1.9 us of per-step overhead plus
    the RS pack HBM round trip; fusing removes two of the three floors.
    The bodies are the exact cores the standalone kernels run (the R1
    stage reads the gb channels back from the just-written output
    block), so parity with the split chain is bitwise."""
    cg = gb_ref.shape[1]
    b = cg * 128
    tile_id = pl.program_id(0)
    pix = looper_ref[1].astype(jnp.int32) + tile_id * b + (
        jax.lax.broadcasted_iota(jnp.int32, (b, 1), 0).reshape(b)
    )
    looper = looper_ref[0]

    # ONE sublane-batched pcg4d for every RNG consumer in the kernel
    # (pcg4d is an elementwise hash, so batching preserves each
    # consumer's stream bit for bit). Separate calls cost ~9 ms/frame
    # EACH at 1080p in per-op dispatch on the ~25-op 1-D chain; blocks:
    # 0..k-1 = RIS candidates, k = camera jitter, k+1 = temporal draw.
    pix2 = pix.reshape(cg, 128).astype(jnp.uint32)
    tot = (k + 2) * cg
    pix_all = jnp.concatenate([pix2] * (k + 2), axis=0)
    blk = jax.lax.broadcasted_iota(jnp.int32, (tot, 128), 0) // cg
    ctr = jnp.where(
        blk < k, _CTR_RIS + blk,
        jnp.where(blk == k, 0, _CTR_TEMPORAL),
    ).astype(jnp.uint32)
    salt = jnp.where(
        blk == k, _SALT_CAMERA, _SALT_RESTIR
    ).astype(jnp.uint32)
    u1, u2, u3, u4 = _pcg4d(
        pix_all, jnp.full((tot, 128), looper, jnp.uint32), ctr, salt
    )
    kb = k * cg
    rng_ris = (_unit(u1[:kb]), _unit(u2[:kb]), _unit(u3[:kb]),
               _unit(u4[:kb]))
    rxy = (_unit(u1[kb:kb + cg]).reshape(b),
           _unit(u2[kb:kb + cg]).reshape(b)) if aa_jitter else None
    r_t = _unit(u1[kb + cg:]).reshape(b) if temporal else None

    _gbuffer_kernel_resident(
        cam_ref, lcam_ref, looper_ref, xy_ref, xpt_ref, attr_ref,
        mat_ref, env_ref, atlas_ref, texmeta_ref, gb_ref,
        n_pad=n_pad, nb=nb, m_pad=m_pad, width=width, height=height,
        aa_jitter=aa_jitter, single_sided=single_sided, has_env=has_env,
        with_textures=with_textures, rxy=rxy,
    )
    sel = _ris_select_core(
        gb_ref, psi_a_ref, psi_b_ref, psi_c_ref, lumaux_ref, tri_lo_ref,
        light_ref, pix, looper, l_pad=l_pad, k=k,
        single_sided=single_sided, n_area=n_area, has_env=has_env,
        has_met=has_met, rng=rng_ris,
    )
    rs_vals = tuple(v.reshape(b) for v in sel)
    _vis_resident_core(
        gb_ref, rs_vals, xpt_ref, prev_ref, looper, pix, pt_ref,
        win_ref, sem, k=k, nb=nb, n_pad=n_pad, window=window,
        temporal=temporal, temporal_clamp=temporal_clamp, r_t=r_t,
    )


@functools.partial(jax.jit, static_argnames=(
    "width", "height", "aa_jitter", "single_sided", "k", "window",
    "temporal", "temporal_clamp", "has_env", "with_textures", "has_met",
    "tile", "interpret"))
def di_resident_pallas(
    cam_vec, lcam_vec, looper, prev_pack, tri_xform, prim_attr, mat_attr,
    light_verts, light_normal, light_radiance, light_area, light_center,
    light_radius,
    *, width, height, aa_jitter=True, single_sided=True, k=4,
    window=2048, temporal=True, temporal_clamp=20,
    has_env=False, env_tile_rad=None, env_tile_uv=None, env_tile_sa=None,
    with_textures=False, fused_atlas=None, fused_tex_meta=None,
    has_met=True, tile=0, interpret=False,
):
    """Fused resident-scene DI reuse chain: returns (gb_pack, pt_pack),
    bitwise-identical to gbuffer_pack_pallas + reuse_pallas. Single-chip
    only — the sharded row-band path keeps the split kernels (it feeds
    per-band xy grids / rebased motion between them).

    `tile` (rays per grid step, 0 = _TILE) must divide the frame and the
    temporal `window` must cover a tile's motion spread (use >= 2*tile,
    or temporal taps past the window read as disocclusions): the in-
    kernel RNG keys on global pixel indices, so results are tile-
    invariant apart from that window clamp."""
    r = width * height
    g = r // 128
    if tile <= 0:
        tile = _TILE
    assert r % tile == 0, (r, tile)
    assert tile % 128 == 0, tile  # tg = tile // 128 must cover the tile
    assert window >= 2 * tile or not temporal, (window, tile)
    # mod-gather chunks the window 8-ways on sublanes; each chunk's
    # lane slice must be 128-aligned and 128-wide
    assert window % 1024 == 0, window
    env8, atlas, meta_t = _env_tex_tables(
        has_env, env_tile_rad, with_textures, fused_atlas, fused_tex_meta
    )
    xpt_res, attr_res, nb_res, n_pad_res = _resident_tables(
        tri_xform, prim_attr, tile=tile
    )
    m = mat_attr.shape[0]
    m_pad = _round_up(m, 8)
    mat = mat_attr
    if m_pad != m:
        mat = jnp.concatenate(
            [mat, jnp.zeros((m_pad - m, MAT_COLS), mat.dtype)]
        )
    mat_t = mat.T
    nl = light_verts.shape[0]
    n_env = env_tile_rad.shape[0] if has_env else 0
    l_pad = _round_up(max(nl + n_env, 128), 128)
    psi_a, psi_b, psi_c, lum_aux, tri_lo, light_table = build_light_tables(
        light_verts, light_normal, light_radiance, light_area, light_center,
        light_radius, l_pad,
        env_tile_rad=env_tile_rad if has_env else None,
        env_tile_uv=env_tile_uv if has_env else None,
        env_tile_sa=env_tile_sa if has_env else None,
    )
    xy = make_xy_grid(width, height)
    tg = tile // 128
    kernel = functools.partial(
        _di_resident_kernel, n_pad=n_pad_res, nb=nb_res, m_pad=m_pad,
        width=width, height=height, aa_jitter=aa_jitter,
        single_sided=single_sided, has_env=has_env,
        with_textures=with_textures, l_pad=l_pad, k=k, n_area=nl,
        has_met=has_met, window=window, temporal=temporal,
        temporal_clamp=temporal_clamp,
    )
    full1 = lambda i: (0, 0)  # noqa: E731
    gb, pt = pl.pallas_call(
        kernel,
        grid=(r // tile,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((2, tg, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad_res, 128), full1, memory_space=pltpu.VMEM),
            pl.BlockSpec((ATTR_COLS, attr_res.shape[1]), full1,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((MAT_COLS, m_pad), full1, memory_space=pltpu.VMEM),
            pl.BlockSpec(env8.shape, full1, memory_space=pltpu.VMEM),
            pl.BlockSpec(atlas.shape, full1, memory_space=pltpu.VMEM),
            pl.BlockSpec(meta_t.shape, full1, memory_space=pltpu.VMEM),
            pl.BlockSpec((l_pad, 4), full1, memory_space=pltpu.VMEM),
            pl.BlockSpec((l_pad, 4), full1, memory_space=pltpu.VMEM),
            pl.BlockSpec((l_pad, 5), full1, memory_space=pltpu.VMEM),
            pl.BlockSpec((l_pad, 2), full1, memory_space=pltpu.VMEM),
            pl.BlockSpec((l_pad, l_pad), full1, memory_space=pltpu.VMEM),
            pl.BlockSpec((LIGHT_COLS, l_pad), full1,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # prev pack (HBM)
        ],
        out_specs=[
            pl.BlockSpec((GB_CH, tg, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((PT_CH, tg, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((GB_CH, g, 128), jnp.float32),
            jax.ShapeDtypeStruct((PT_CH, g, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((PT_CH, window), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(cam_vec, lcam_vec, _lp2(looper, 0), xy, xpt_res, attr_res, mat_t,
      env8, atlas, meta_t, psi_a, psi_b, psi_c, lum_aux, tri_lo,
      light_table, prev_pack)
    return gb, pt


# ---------------------------------------------------------------------------
# kernel T: SVGF temporal accumulation (fused-path denoiser.cu:250-305)

# svgf pack channel layout ([SV_CH, R]): the state carried between
# frames for the fused SVGF path
SV_COL = 0  # 3: color history (level-0 wavelet output)
SV_M1 = 3  # E[lum]
SV_M2 = 4  # E[lum^2]
SV_HIST = 5  # history length
SV_PRIM = 6  # similarity attrs of the frame that wrote the pack
SV_NORM = 7  # 3
SV_CH = 16  # padded (10 used)

SVGF_ALPHA = 0.2  # denoiser.cu:256


def _svgf_temporal_kernel(gb_ref, col_ref, prev_ref, out_ref,
                          win_ref, sem, *, window):
    """Motion-gathered alpha-blend of color + (lum, lum^2) moments with
    disocclusion reset — temporalAccumulate (denoiser.cu:250-305), via
    the same windowed one-hot motion gather as the reuse kernel."""
    cg = gb_ref.shape[1]
    b = cg * 128

    w0 = _window_start(gb_ref, prev_ref, window)
    dma = pltpu.make_async_copy(
        prev_ref.at[:, pl.ds(w0, window)], win_ref, sem
    )
    dma.start()

    def ch(i):
        return gb_ref[i, :, :].reshape(b)

    def cch(i):
        return col_ref[i, :, :].reshape(b)

    cx, cy, cz = cch(0), cch(1), cch(2)
    lum = 0.2126 * cx + 0.7152 * cy + 0.0722 * cz

    motion = ch(G_MOTION).astype(jnp.int32)
    rel = motion - w0
    in_win = (motion >= 0) & (rel >= 0) & (rel < window)
    rel = jnp.where(in_win, rel, 0)

    dma.wait()
    win_rows = jax.lax.broadcasted_iota(jnp.int32, (window, b), 0)
    onehot = (win_rows == rel[None, :]).astype(jnp.float32)
    gathered = dot_exact_b(win_ref[:, :], onehot)  # [SV_CH, B]

    l_cx, l_cy, l_cz = gathered[SV_COL], gathered[SV_COL + 1], gathered[SV_COL + 2]
    l_m1, l_m2 = gathered[SV_M1], gathered[SV_M2]
    l_hist = gathered[SV_HIST]
    l_prim = gathered[SV_PRIM]
    l_nx, l_ny, l_nz = gathered[SV_NORM], gathered[SV_NORM + 1], gathered[SV_NORM + 2]

    prim_remap = ch(G_PRIMR)
    g_nx, g_ny, g_nz = ch(G_NORM), ch(G_NORM + 1), ch(G_NORM + 2)
    diff = ~in_win
    diff |= prim_remap <= _NULL
    diff |= l_prim != prim_remap
    diff |= jnp.abs(_dot3(g_nx, g_ny, g_nz, l_nx, l_ny, l_nz)) < 0.1

    a = SVGF_ALPHA
    bx = l_cx + (cx - l_cx) * a
    by = l_cy + (cy - l_cy) * a
    bz = l_cz + (cz - l_cz) * a
    bm1 = l_m1 + (lum - l_m1) * a
    bm2 = l_m2 + (lum * lum - l_m2) * a
    hist = l_hist + 1.0

    def put(i, val):
        out_ref[i, :, :] = val.reshape(cg, 128)

    put(SV_COL, jnp.where(diff, cx, bx))
    put(SV_COL + 1, jnp.where(diff, cy, by))
    put(SV_COL + 2, jnp.where(diff, cz, bz))
    put(SV_M1, jnp.where(diff, lum, bm1))
    put(SV_M2, jnp.where(diff, lum * lum, bm2))
    put(SV_HIST, jnp.where(diff, 0.0, hist))
    put(SV_PRIM, prim_remap)
    put(SV_NORM, g_nx)
    put(SV_NORM + 1, g_ny)
    put(SV_NORM + 2, g_nz)
    for i in range(SV_NORM + 3, SV_CH):
        put(i, jnp.zeros_like(cx))


@functools.partial(jax.jit, static_argnames=("window", "interpret"))
def svgf_temporal_pallas(gb_pack, color, prev_svgf, window: int = 2048,
                         prev_base=0,
                         interpret: bool = False):
    """Fused SVGF temporal accumulation. color: [3, R/128, 128]
    (demodulated); prev_svgf: [SV_CH, R] flat. Returns the accumulated
    svgf pack [SV_CH, R/128, 128]."""
    g = gb_pack.shape[1]
    r = g * 128
    n_tiles = r // _TILE
    tg = _TILE // 128

    if not (isinstance(prev_base, int) and prev_base == 0):
        # single-chip callers pass a static 0: skip the whole-pack copy
        mo = gb_pack[G_MOTION]
        gb_pack = gb_pack.at[G_MOTION].set(
            jnp.where(mo >= 0.0, mo - jnp.float32(prev_base), mo))

    kernel = functools.partial(_svgf_temporal_kernel, window=window)
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((GB_CH, tg, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tg, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # prev svgf pack (HBM)
        ],
        out_specs=pl.BlockSpec(
            (SV_CH, tg, 128), lambda i: (0, i, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((SV_CH, window), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        out_shape=jax.ShapeDtypeStruct((SV_CH, g, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(gb_pack, color, prev_svgf)


# ---------------------------------------------------------------------------
# kernel S: spatial reuse + shade + accumulate


def _spatial_kernel(off_ref, gb_ref, pt_self_ref, pt_hbm_ref, acc_in_ref,
                    sc_ref, acc_out_ref, nbr_ref, sem, *, width, height,
                    neighbors, radius, accumulate, reuse_spatial,
                    has_met=True):
    cg = gb_ref.shape[1]
    b = cg * 128
    tile_id = pl.program_id(0)
    pix = sc_ref[2].astype(jnp.int32) + tile_id * b + (
        jax.lax.broadcasted_iota(jnp.int32, (b, 1), 0).reshape(b)
    )
    looper = sc_ref[0]
    iteration = sc_ref[1]

    def gch(i):
        return gb_ref[i, :, :].reshape(b)

    def pch(ref, i):
        return ref[i, :, :].reshape(b)

    x = gch(G_X)
    y = gch(G_Y)
    depth = gch(G_DEPTH)
    prim_remap = gch(G_PRIMR)
    g_nx, g_ny, g_nz = gch(G_NORM), gch(G_NORM + 1), gch(G_NORM + 2)
    shade = gch(G_SHADE) > 0.5

    r_li_x, r_li_y, r_li_z = pch(pt_self_ref, P_LI), pch(pt_self_ref, P_LI + 1), pch(pt_self_ref, P_LI + 2)
    r_wi_x, r_wi_y, r_wi_z = pch(pt_self_ref, P_WI), pch(pt_self_ref, P_WI + 1), pch(pt_self_ref, P_WI + 2)
    r_dist = pch(pt_self_ref, P_DIST)
    r_weight = pch(pt_self_ref, P_WEIGHT)
    r_m = pch(pt_self_ref, P_M)

    if reuse_spatial:
        # aggregate neighbor reservoir (mergeSpatialNeighborDirect,
        # restir.cu:87-100); offsets drawn per (tile, neighbor, frame).
        # All N neighbors ride ONE op chain as an [N*8, 128] sublane-
        # block array (same batching as _ris_select_kernel: Mosaic's
        # fixed per-op dispatch dominates N narrow chains), and the
        # aggregate winner is a single-draw inverse CDF over the N
        # neighbor weights — distribution-identical to N streaming
        # merges (P(pick i) = w_i / W either way).
        nwin = b + 128
        # issue ALL neighbor window DMAs up front (they run on parallel
        # DMA engines; serializing start/wait pairs costs ~2.5 us each,
        # ~30 ms/frame at 1080p)
        for i in range(neighbors):
            start = pl.multiple_of(off_ref[0, i, 0], 128)
            pltpu.make_async_copy(
                pt_hbm_ref.at[:, pl.ds(start, nwin)], nbr_ref.at[i], sem.at[i]
            ).start()
        rolled_all = []
        for i in range(neighbors):
            # per-(tile, neighbor, frame) offsets, precomputed in XLA:
            # (128-aligned dma start, dx, dy, lane residue, valid). The
            # window is fetched 128 lanes wide of the target and rotated
            # by the residue (HBM DMA starts must be 128-aligned).
            delta = off_ref[0, i, 3]
            pltpu.make_async_copy(
                pt_hbm_ref.at[:, pl.ds(pl.multiple_of(off_ref[0, i, 0], 128),
                                       nwin)],
                nbr_ref.at[i], sem.at[i]
            ).wait()
            rolled_all.append(
                pltpu.roll(nbr_ref[i, :, :], nwin - delta, axis=1)[:, 0:b]
            )
        rolled_cat = jnp.concatenate(rolled_all, axis=1)  # [PT_CH, N*B]
        nb8 = neighbors * cg

        def nrow(q):
            return rolled_cat[q].reshape(nb8, 128)

        def wide(v):  # [B] per-pixel -> [N*8, 128] neighbor blocks
            v2 = v.reshape(cg, 128)
            return jnp.concatenate([v2] * neighbors, axis=0)

        def scal(col, cast=True):  # per-neighbor SMEM scalar -> blocks
            vals = [off_ref[0, i, col] for i in range(neighbors)]
            if cast:
                vals = [v.astype(jnp.float32) for v in vals]
            return jnp.concatenate(
                [jnp.full((cg, 128), v) for v in vals], axis=0
            )

        dx_w = scal(1)
        dy_w = scal(2)
        usable_w = scal(4) > 0.5
        npx = wide(x) + dx_w
        npy = wide(y) + dy_w
        # the fetch is a LINEAR window: lanes whose x+dx crosses the
        # row edge received a wrapped pixel — reject them (same
        # bounds mask as the XLA path's rolled-image fetch)
        ok = (
            usable_w
            & (npx >= 0.0) & (npx < float(width))
            & (npy >= 0.0) & (npy < float(height))
        )
        n_weight = nrow(P_WEIGHT)
        ok = ok & (nrow(P_PRIMR) == wide(prim_remap))
        ok = ok & (
            _dot3(wide(g_nx), wide(g_ny), wide(g_nz),
                  nrow(P_NORM), nrow(P_NORM + 1), nrow(P_NORM + 2)) >= 0.9
        )
        depth_w = wide(depth)
        ok = ok & (jnp.abs(depth_w - nrow(P_DEPTH)) <= depth_w * 0.1)
        n_bad = jnp.isnan(n_weight) | jnp.isinf(n_weight) | (n_weight < 0.0)
        ok = ok & ~n_bad
        okf = ok.astype(jnp.float32)
        w_all = okf * n_weight

        def blk(arr, j):
            return arr[j * cg:(j + 1) * cg, :]

        cums = []
        c = blk(w_all, 0)
        for j in range(1, neighbors):
            cums.append(c)
            c = c + blk(w_all, j)
        a_weight = c
        m_masked = okf * nrow(P_M)
        a_m = blk(m_masked, 0)
        for j in range(1, neighbors):
            a_m = a_m + blk(m_masked, j)

        # ONE batched pcg4d for both spatial draws (selection +
        # self-merge) — elementwise hash, so each stream is bit-
        # identical to the separate calls it replaces; the second 1-D
        # ~25-op chain cost ~4 ms/frame at 1080p in per-op dispatch.
        pix2s = pix.reshape(cg, 128)
        blk2 = jax.lax.broadcasted_iota(jnp.int32, (2 * cg, 128), 0) // cg
        ctr2 = jnp.where(
            blk2 == 0, _CTR_SPATIAL, _CTR_SPATIAL + neighbors
        ).astype(jnp.uint32)
        su1, _, _, _ = _pcg4d(
            jnp.concatenate([pix2s] * 2, axis=0),
            jnp.full((2 * cg, 128), looper, jnp.uint32), ctr2,
            jnp.full((2 * cg, 128), _SALT_RESTIR, jnp.uint32),
        )
        r_merge_draw = _unit(su1[cg:]).reshape(b)
        thresh = _unit(su1[:cg]) * a_weight
        jsel = jnp.zeros_like(a_weight)
        for cj in cums:
            jsel = jsel + (cj <= thresh).astype(jnp.float32)
        gate = jnp.where(a_weight > 0.0, 1.0, 0.0)
        take_all = jnp.concatenate(
            [(jsel == float(j)).astype(jnp.float32) * gate
             for j in range(neighbors)],
            axis=0,
        ) * okf
        a_cat = jnp.concatenate(
            [nrow(P_LI), nrow(P_LI + 1), nrow(P_LI + 2),
             nrow(P_WI), nrow(P_WI + 1), nrow(P_WI + 2), nrow(P_DIST)],
            axis=1,
        )  # [N*8, 7*128]
        take_cat = jnp.concatenate([take_all] * 7, axis=1)
        rowp = jax.lax.broadcasted_iota(jnp.int32, (cg, nb8), 0)
        colp = jax.lax.broadcasted_iota(jnp.int32, (cg, nb8), 1)
        p_sel = (jax.lax.rem(colp, cg) == rowp).astype(jnp.float32)
        sel = dot_exact_a(p_sel, a_cat * take_cat)  # [8, 7*128]
        a_li_x = sel[:, 0:128].reshape(b)
        a_li_y = sel[:, 128:256].reshape(b)
        a_li_z = sel[:, 256:384].reshape(b)
        a_wi_x = sel[:, 384:512].reshape(b)
        a_wi_y = sel[:, 512:640].reshape(b)
        a_wi_z = sel[:, 640:768].reshape(b)
        a_dist = sel[:, 768:896].reshape(b)
        a_weight = a_weight.reshape(b)
        a_m = a_m.reshape(b)

        # merge(self, agg, r_s) (restir.cu:205-210)
        a_bad = jnp.isnan(a_weight) | jnp.isinf(a_weight) | (a_weight < 0.0)
        s_bad = jnp.isnan(r_weight) | jnp.isinf(r_weight) | (r_weight < 0.0)
        ok = ~a_bad & ~s_bad & shade
        r_s = r_merge_draw
        w_new = jnp.where(ok, r_weight + a_weight, r_weight)
        m_new = jnp.where(ok, r_m + a_m, r_m)
        take = ok & (r_s * w_new < a_weight)
        r_li_x = jnp.where(take, a_li_x, r_li_x)
        r_li_y = jnp.where(take, a_li_y, r_li_y)
        r_li_z = jnp.where(take, a_li_z, r_li_z)
        r_wi_x = jnp.where(take, a_wi_x, r_wi_x)
        r_wi_y = jnp.where(take, a_wi_y, r_wi_y)
        r_wi_z = jnp.where(take, a_wi_z, r_wi_z)
        r_dist = jnp.where(take, a_dist, r_dist)
        r_weight = w_new
        r_m = m_new

    # ---- shade (restir.cu:216-230; demodulated material => gray BSDF,
    # see models/restir_di.py step 5)
    mtype = gch(G_MTYPE)
    metallic = gch(G_METAL)
    roughness = gch(G_ROUGH)
    wox, woy, woz = -gch(G_DIR), -gch(G_DIR + 1), -gch(G_DIR + 2)
    ndotwo = _dot3(g_nx, g_ny, g_nz, wox, woy, woz)
    flip = (mtype != _DIELECTRIC) & (ndotwo < 0.0)
    sgn = jnp.where(flip, -1.0, 1.0)
    snx, sny, snz = g_nx * sgn, g_ny * sgn, g_nz * sgn
    f_lum = _eval_bsdf_lum(
        mtype, metallic, roughness, snx, sny, snz, wox, woy, woz,
        r_wi_x, r_wi_y, r_wi_z, has_met=has_met,
    )
    li_lum = 0.2126 * r_li_x + 0.7152 * r_li_y + 0.0722 * r_li_z
    inv_bad = jnp.isnan(r_weight) | jnp.isinf(r_weight) | (r_weight < 0.0)
    w_big = r_weight / jnp.maximum(r_m, 1.0)
    scale = w_big / jnp.maximum(li_lum, 1e-20)
    live = shade & ~inv_bad & (f_lum > 0.0) & (li_lum > 0.0)
    scale = jnp.where(live, scale, 0.0)
    out_r = r_li_x * scale
    out_g = r_li_y * scale
    out_b = r_li_z * scale

    def guard(v):
        return jnp.where(jnp.isnan(v) | jnp.isinf(v), 0.0, v)

    out_r, out_g, out_b = guard(out_r), guard(out_g), guard(out_b)

    is_light = gch(G_LIGHT) > 0.5
    miss = gch(G_MISS) > 0.5
    one = is_light | miss
    out_r = jnp.where(one, 1.0, out_r)
    out_g = jnp.where(one, 1.0, out_g)
    out_b = jnp.where(one, 1.0, out_b)

    # modulate by albedo (restir.cu:229)
    out_r = out_r * gch(G_ALB)
    out_g = out_g * gch(G_ALB + 1)
    out_b = out_b * gch(G_ALB + 2)

    if accumulate:
        # Mosaic lacks a u32 -> f32 cast; go through i32
        it = iteration.astype(jnp.int32).astype(jnp.float32)
        inv = 1.0 / (it + 1.0)
        out_r = (pch(acc_in_ref, 0) * it + out_r) * inv
        out_g = (pch(acc_in_ref, 1) * it + out_g) * inv
        out_b = (pch(acc_in_ref, 2) * it + out_b) * inv

    acc_out_ref[0, :, :] = out_r.reshape(cg, 128)
    acc_out_ref[1, :, :] = out_g.reshape(cg, 128)
    acc_out_ref[2, :, :] = out_b.reshape(cg, 128)


@functools.partial(jax.jit, static_argnames=(
    "width", "height", "neighbors", "radius", "accumulate", "reuse_spatial",
    "has_met", "interpret"), donate_argnums=(3,))
def spatial_shade_pallas(
    gb_pack, pt_pack, pt_flat, accum, looper, iteration,
    width: int, height: int, neighbors: int = 5, radius: float = 5.0,
    accumulate: bool = True, reuse_spatial: bool = True,
    pix0=0, halo: int = 0, r_total=None, has_met: bool = True,
    interpret: bool = False,
):
    """Spatial merges + shading + running-mean accumulation.

    gb_pack/pt_pack: [C, R/128, 128]; pt_flat: the SAME pt data as a flat
    [PT_CH, R] array (neighbor windows are DMA'd from HBM); accum:
    [3, R/128, 128] (donated; aliased to the output)."""
    from ...utils import rng as rngmod

    g = gb_pack.shape[1]
    r = g * 128
    n_tiles = r // _TILE

    # per-(tile, neighbor, frame) disk offsets (see module docstring):
    # (dma start, dx, dy, valid) precomputed in XLA, SMEM-blocked per tile
    # global tile ids seed the per-(tile, neighbor, frame) offsets so
    # sharded row bands draw the same offsets as a single-chip frame
    tiles = (jnp.asarray(pix0, jnp.uint32) // _TILE
             + jnp.arange(n_tiles, dtype=jnp.uint32))
    r_ext = pt_flat.shape[1]  # local band + 2*halo under shard_map
    if r_total is None:
        r_total = r_ext
    cols = []
    for i in range(neighbors):
        s1, s2, _, _ = rngmod.uniform4(
            tiles, looper, _CTR_SPATIAL + i, rngmod.SALT_RESTIR
        )
        rr = jnp.sqrt(s1) * radius
        theta = s2 * (2.0 * 3.14159265358979)
        dx = (0.5 + rr * jnp.cos(theta)).astype(jnp.int32)
        dy = (0.5 + rr * jnp.sin(theta)).astype(jnp.int32)
        off = dy * width + dx
        # validity uses GLOBAL frame indices (identical to a
        # single-chip frame); the DMA start uses band-local + halo
        start_g = (jnp.asarray(pix0, jnp.int32)
                   + jnp.arange(n_tiles, dtype=jnp.int32) * _TILE + off)
        start_ga = (start_g // 128) * 128
        valid = (
            (start_ga >= 0) & (start_ga <= r_total - _TILE - 128)
            & ~((dx == 0) & (dy == 0))
        )
        start0 = (jnp.arange(n_tiles, dtype=jnp.int32) * _TILE + off
                  + halo)
        start_a = (start0 // 128) * 128  # 128-aligned DMA start
        delta = start0 - start_a  # lane residue, undone in-kernel
        start_a = jnp.clip(start_a, 0, r_ext - _TILE - 128)
        cols.append(
            jnp.stack([start_a, dx, dy, delta, valid.astype(jnp.int32)], -1)
        )
    offs = jnp.stack(cols, axis=1)  # [T, N, 5] i32

    kernel = functools.partial(
        _spatial_kernel, width=width, height=height, neighbors=neighbors,
        radius=radius, accumulate=accumulate, reuse_spatial=reuse_spatial,
        has_met=has_met,
    )
    tg = _TILE // 128
    sc = jnp.stack([jnp.asarray(looper, jnp.uint32),
                    jnp.asarray(iteration, jnp.uint32),
                    jnp.asarray(pix0, jnp.uint32)])
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, neighbors, 5), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((GB_CH, tg, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((PT_CH, tg, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((3, tg, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (3, tg, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((3, g, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((neighbors, PT_CH, _TILE + 128), jnp.float32),
            pltpu.SemaphoreType.DMA((neighbors,)),
        ],
        input_output_aliases={4: 0},
        interpret=interpret,
    )(offs, gb_pack, pt_pack, pt_flat, accum, sc)
