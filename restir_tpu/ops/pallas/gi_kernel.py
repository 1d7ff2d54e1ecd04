"""Fused ReSTIR GI path-trace kernel (VMEM-resident scenes).

One Pallas kernel traces the ENTIRE indirect path sample of
models/restir_gi.trace_gi_sample (reference: ReSTIRIndirectKernel,
/root/reference/src/restir.cu:242-416) per 1024-ray tile: the
statically-unrolled bounce loop runs closest-hit + NEE (alias light
sample + shadow test) + BSDF sampling entirely in channel-major 1-D
form — no whole-frame [R, 3] XLA ops, whose (8,128)-tile lane padding
made the XLA GI path ~2.15 s/frame at 1080p (BASELINE.md round 3).

Bit-parity contract: identical RNG streams (pcg4d(pix, looper, ctr,
SALT_GI), counters as in models/restir_gi), identical BSDF math
(ops/bsdf.py), identical intersection predicates (ops/intersect_bf:
t > 0, |ddw| >= 1e-12, RAY_OFFSET 1e-5, occlusion limit
dist - 2e-4), identical alias light sampling (scene/alias_table.py).
tests/test_gi_fused.py asserts lane-for-lane agreement vs the XLA
tracer in interpret mode.

Eligibility (the wrapper's): pcg4d sampler, no env map, no textures,
n_tri <= 1024 (planes + attrs live in VMEM; the reference cornell-class
scenes). Streaming-scene GI keeps the banded XLA pipeline.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect_kernel import (
    ATTR_COLS,
    MAT_COLS,
    _bdot,
    _hi_lo,
    _hi_mid_lo,
    dot_exact_b,
    dot_f32x3,
)
from .fused_di import _procedural_tex
from .ris_kernel import _eval_bsdf_lum, _pcg4d, _unit

# material types (scene/scene_data.py)
_LAMBERTIAN = 0.0
_METALLIC = 1.0
_DIELECTRIC = 2.0
_LIGHT = 4.0

_PI = 3.14159265358979323846
_INV_PI = 1.0 / _PI
_TWO_PI = 2.0 * _PI
_BIG = 3e38

# BSDF sample-type flags (ops/bsdf.py, material.h:16-25)
_F_DIFFUSE = 1
_F_GLOSSY = 2
_F_SPECULAR = 4
_F_REFLECTION = 16
_F_TRANSMISSION = 32
_F_INVALID = 1 << 15

_RAY_OFFSET = 1e-5  # intersections.h:13
_OCCL_EPS = 1e-4  # scene.h:287

# ---- input pack channels (built XLA-side by the wrapper)
IN_POS = 0  # 3: primary hit position
IN_NORM = 3  # 3: primary interpolated normal
IN_DIR = 6  # 3: primary ray direction
IN_MTYPE = 9
IN_METAL = 10
IN_ROUGH = 11
IN_IOR = 12
IN_ALIVE = 13  # it.valid & (mat.type != LIGHT)
IN_CH = 16

# ---- output pack channels
GO_LO = 0  # 3
GO_NV = 3  # 3
GO_XS = 6  # 3
GO_NS = 9  # 3
GO_PDF = 12  # primary-bounce pdf
GO_DELTA = 13  # primary bounce was a delta lobe
GO_CH = 16

# per-depth path state pack ([ST_CH, R/128, 128]): the bounce loop runs
# as ONE KERNEL PER BOUNCE chained over this pack, so compile size stays
# O(one bounce) while the tile width (the 1-D dispatch amortizer) can
# grow. Channels 0:14 are layout-aligned with the GO pack, so the final
# state slices straight into the trace output.
ST_LO = 0  # 3 (== GO_LO)
ST_NV = 3  # 3 (== GO_NV)
ST_XS = 6  # 3 (== GO_XS)
ST_NS = 9  # 3 (== GO_NS)
ST_PDF = 12  # == GO_PDF
ST_DELTA = 13  # == GO_DELTA
ST_POS = 14  # 3: current path vertex
ST_NORM = 17  # 3: its shading normal (pre-flip)
ST_WO = 20  # 3: outgoing (toward previous vertex)
ST_MTYPE = 23
ST_BASE = 24  # 3: base color at the vertex
ST_METAL = 27
ST_ROUGH = 28
ST_IOR = 29
ST_ALIVE = 30
ST_THR = 31  # 3: path throughput
ST_CH = 34

# GI pass RNG counters (models/restir_gi)
_CTR_UPDATE = 0
_CTR_TEMPORAL = 1
_CTR_PATH = 2
_SALT_GI = 0x04

# ---- resolve-pack channels: the GI reservoir + similarity attrs
# carried between frames ([Q_CH, R] flat), the fused twin of
# RenderState.gi_reservoir + last_gb (restir.h:13-27 IndirectLiSample)
Q_LO = 0  # 3: sample outgoing radiance Lo
Q_XV = 3  # 3: visible point
Q_NV = 6  # 3: its normal
Q_XS = 9  # 3: sample point
Q_NS = 12  # 3: its normal
Q_W = 15  # cumulative resampling weight
Q_M = 16  # history length (int carried as f32)
Q_PRIM = 17  # similarity attrs of the frame that wrote the pack
Q_GNORM = 18  # 3
Q_DEPTH = 21
Q_CH = 24  # padded (22 used)

# ---- per-frame G-buffer rows the resolve kernel consumes
GQ_MOTION = 0
GQ_PRIM = 1
GQ_DEPTH = 2
GQ_NORM = 3  # 3
GQ_ALB = 6  # 3
GQ_SHADE = 9  # it.valid & (gb.prim_id != LIGHT_ID)
GQ_CH = 10

_NULL_PRIM = -1.0  # intersect.NULL_PRIMITIVE

# light-table rows (built by the wrapper).
# MEASURED DEAD END (prof/prof_gi_depth.py, round 4): precomputing the
# light GEOMETRY (v0/e01/e02/normal) into extra table rows and reading
# it via row extracts of the [24, B] where-blended fetch made the
# depth-5 trace 245 -> 381 ms (compile 52 -> 118 s) — Mosaic handles
# row extracts of the blended table FAR worse than the one-hot attr
# dot it replaced. Keep the 8-row table + per-bounce attr fetch.
LT_PROB = 0
LT_ALIAS = 1
LT_PRIM = 2
LT_RAD = 3  # 3
LT_ROWS = 8


def _dot3(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def _cross3(ax, ay, az, bx, by, bz):
    return (ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx)


def _norm3(x, y, z, eps=1e-20):
    inv = 1.0 / jnp.maximum(jnp.sqrt(x * x + y * y + z * z), eps)
    return x * inv, y * inv, z * inv


def _local_frame(nx, ny, nz):
    """(t, b) about n — utils/math.local_ref_frame conventions."""
    usez = jnp.abs(ny) > 0.9999
    bx = jnp.where(usez, ny, -nz)
    by = jnp.where(usez, -nx, 0.0)
    bz = jnp.where(usez, 0.0, nx)
    bx, by, bz = _norm3(bx, by, bz)
    tx, ty, tz = _cross3(bx, by, bz, nx, ny, nz)
    return tx, ty, tz, bx, by, bz


def _to_disk(rx, ry):
    r = jnp.sqrt(rx)
    th = ry * _TWO_PI
    return jnp.cos(th) * r, jnp.sin(th) * r


def _cosine_hemisphere(nx, ny, nz, rx, ry):
    dx_, dy_ = _to_disk(rx, ry)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - dx_ * dx_ - dy_ * dy_))
    tx, ty, tz, bx, by, bz = _local_frame(nx, ny, nz)
    return _norm3(
        tx * dx_ + bx * dy_ + nx * z,
        ty * dx_ + by * dy_ + ny * z,
        tz * dx_ + bz * dy_ + nz * z,
    )


def _schlick_g(c, alpha):
    a = alpha * 0.5
    c = jnp.abs(c)
    return c / jnp.maximum(c * (1.0 - a) + a, 1e-20)


def _gtr2(cos_h, alpha):
    aa = alpha * alpha
    den = cos_h * cos_h * (aa - 1.0) + 1.0
    return jnp.where(
        cos_h < 1e-6, 0.0, aa / jnp.maximum(den * den * _PI, 1e-20)
    )


def _metallic_eval(base, metallic, alpha, nx, ny, nz,
                   wox, woy, woz, wix, wiy, wiz):
    """RGB metallic-workflow eval — ops/bsdf._metallic_eval in 1-D."""
    hx, hy, hz = _norm3(wox + wix, woy + wiy, woz + wiz)
    cos_o = _dot3(nx, ny, nz, wox, woy, woz)
    cos_i = _dot3(nx, ny, nz, wix, wiy, wiz)
    ok = cos_i * cos_o >= 1e-7
    hdoto = _dot3(hx, hy, hz, wox, woy, woz)
    one_m = 1.0 - hdoto
    p5 = one_m * one_m
    p5 = p5 * p5 * one_m
    g = _schlick_g(cos_o, alpha) * _schlick_g(cos_i, alpha)
    d = _gtr2(_dot3(nx, ny, nz, hx, hy, hz), alpha)
    spec = g * d / jnp.maximum(4.0 * cos_i * cos_o, 1e-20)
    out = []
    for bc in base:
        f0 = 0.08 * (1.0 - metallic) + bc * metallic
        fr = f0 + (1.0 - f0) * p5
        diffuse = bc * _INV_PI * (1.0 - metallic)
        out.append(jnp.where(ok, diffuse * (1.0 - fr) + spec * fr, 0.0))
    return out


def _metallic_pdf(metallic, alpha, nx, ny, nz, wox, woy, woz,
                  wix, wiy, wiz):
    hx, hy, hz = _norm3(wox + wix, woy + wiy, woz + wiz)
    cos_h = _dot3(nx, ny, nz, hx, hy, hz)
    cos_o = _dot3(nx, ny, nz, wox, woy, woz)
    hdoto = _dot3(hx, hy, hz, wox, woy, woz)
    spec_pdf = (
        _gtr2(cos_h, alpha) * _schlick_g(cos_o, alpha) * jnp.abs(hdoto)
        / jnp.maximum(jnp.abs(cos_o), 1e-20)
    ) / jnp.maximum(4.0 * jnp.abs(hdoto), 1e-20)
    diff_pdf = (
        jnp.maximum(_dot3(nx, ny, nz, wix, wiy, wiz), 0.0) * _INV_PI
    )
    t = 1.0 / (2.0 - metallic)
    return diff_pdf + (spec_pdf - diff_pdf) * t


def _eval_bsdf_rgb(mtype, base, metallic, roughness, nx, ny, nz,
                   wox, woy, woz, wix, wiy, wiz, has_met=True):
    """f(wo, wi) RGB — ops/bsdf.eval_bsdf in 1-D (delta lobes -> 0).
    has_met=False (static) drops the GGX chain entirely."""
    out = []
    if has_met:
        alpha = roughness * roughness
        met = _metallic_eval(base, metallic, alpha, nx, ny, nz,
                             wox, woy, woz, wix, wiy, wiz)
    for k in range(3):
        lam = base[k] * _INV_PI
        out.append(jnp.where(
            mtype == _LAMBERTIAN, lam,
            jnp.where(mtype == _METALLIC, met[k], 0.0) if has_met
            else 0.0,
        ))
    return out


def _pdf_bsdf(mtype, metallic, roughness, nx, ny, nz,
              wox, woy, woz, wix, wiy, wiz, has_met=True):
    lam = jnp.maximum(_dot3(nx, ny, nz, wix, wiy, wiz), 0.0) * _INV_PI
    if not has_met:
        return jnp.where(mtype == _LAMBERTIAN, lam, 0.0)
    alpha = roughness * roughness
    met = _metallic_pdf(metallic, alpha, nx, ny, nz,
                        wox, woy, woz, wix, wiy, wiz)
    return jnp.where(
        mtype == _LAMBERTIAN, lam,
        jnp.where(mtype == _METALLIC, met, 0.0),
    )


def _fresnel_dielectric(cos_in, ior):
    flip = cos_in < 0.0
    ior = jnp.where(flip, 1.0 / ior, ior)
    cos_in = jnp.abs(cos_in)
    sin_in = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_in * cos_in))
    sin_tr = sin_in / ior
    tir = sin_tr >= 1.0
    cos_tr = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin_tr * sin_tr))
    rs = (cos_in - ior * cos_tr) / jnp.maximum(cos_in + ior * cos_tr, 1e-20)
    rp = (ior * cos_in - cos_tr) / jnp.maximum(ior * cos_in + cos_tr, 1e-20)
    return jnp.where(tir, 1.0, (rs * rs + rp * rp) * 0.5)


def _sample_vndf(nx, ny, nz, wox, woy, woz, alpha, rx, ry):
    """Heitz VNDF GGX half-vector sample — ops/bsdf.gtr2_sample_vndf."""
    tx, ty, tz, bx, by, bz = _local_frame(nx, ny, nz)
    lx = _dot3(wox, woy, woz, tx, ty, tz)
    ly = _dot3(wox, woy, woz, bx, by, bz)
    lz = _dot3(wox, woy, woz, nx, ny, nz)
    vx, vy, vz = _norm3(lx * alpha, ly * alpha, lz)
    len_sq = vx * vx + vy * vy
    has = len_sq > 0.0
    linv = 1.0 / jnp.sqrt(jnp.maximum(len_sq, 1e-20))
    t1x = jnp.where(has, -vy * linv, 1.0)
    t1y = jnp.where(has, vx * linv, 0.0)
    t1z = jnp.zeros_like(vx)
    t2x, t2y, t2z = _cross3(vx, vy, vz, t1x, t1y, t1z)
    px, py0 = _to_disk(rx, ry)
    s = 0.5 * (vz + 1.0)
    py = (1.0 - s) * jnp.sqrt(jnp.maximum(0.0, 1.0 - px * px)) + s * py0
    pz = jnp.sqrt(jnp.maximum(0.0, 1.0 - px * px - py * py))
    hx = t1x * px + t2x * py + vx * pz
    hy = t1y * px + t2y * py + vy * pz
    hz = t1z * px + t2z * py + vz * pz
    hx, hy, hz = hx * alpha, hy * alpha, jnp.maximum(hz, 0.0)
    wx = tx * hx + bx * hy + nx * hz
    wy = ty * hx + by * hy + ny * hz
    wz = tz * hx + bz * hy + nz * hz
    return _norm3(wx, wy, wz)


def _gi_trace_kernel(looper_ref, st_ref, xu_ref, xv_ref, xw_ref, xpt_ref,
                     attr_ref, mat_ref, light_ref, scal_ref, out_ref,
                     *, n_pad, a_pad, m_pad, l_pad, n_lights, d_lo, d_hi,
                     single_sided, hit_fma=False, has_met=True,
                     has_die=True, has_proc=True, dbg=()):
    # dbg: prof-only decomposition knobs (prof/prof_gi_depth.py) —
    # "occl" skips the NEE shadow traversal, "nee" the whole NEE stage,
    # "trace" the closest-hit traversal (constant fake hits). Results
    # are WRONG with any knob on; never set outside prof scripts.
    """Bounces d_lo..d_hi of the fused GI path trace over the [ST_CH]
    state pack (state advanced in place; the wrapper chains one kernel
    per bounce so compile size stays O(one bounce) while the tile width
    — the 1-D dispatch amortizer — can grow)."""
    cg = st_ref.shape[1]
    b = cg * 128
    tile_id = pl.program_id(0)
    looper = looper_ref[0]
    pix = looper_ref[1].astype(jnp.int32) + tile_id * b + (
        jax.lax.broadcasted_iota(jnp.int32, (b, 1), 0).reshape(b)
    )
    sum_inv = scal_ref[0]

    def ch(i):
        return st_ref[i, :, :].reshape(b)

    px, py, pz = ch(ST_POS), ch(ST_POS + 1), ch(ST_POS + 2)
    nx, ny, nz = ch(ST_NORM), ch(ST_NORM + 1), ch(ST_NORM + 2)
    wox, woy, woz = ch(ST_WO), ch(ST_WO + 1), ch(ST_WO + 2)
    mtype = ch(ST_MTYPE)
    metallic = ch(ST_METAL)
    roughness = ch(ST_ROUGH)
    ior = ch(ST_IOR)
    alive = ch(ST_ALIVE) > 0.5
    basr, basg, basb = ch(ST_BASE), ch(ST_BASE + 1), ch(ST_BASE + 2)

    # hit-test lane chunk: the 2-D [n_pad, lanes] closest-hit
    # intermediates are Mosaic-unrolled per vreg, so their lane width is
    # pinned at <= 1024 regardless of the tile width (wider tiles would
    # explode compile memory); the 1-D shading chain still runs at the
    # full tile width, which is where the per-op dispatch tax amortizes
    hb = min(b, 1024)

    if hit_fma:
        # VPU-FMA plane projections over the TRI-MAJOR table (the DI
        # kernels' hit-test form, fused_di._vis_sorted_kernel): exact
        # f32, no bf16 splits, no K=4-padded MXU passes. At n_pad=128
        # (cornell) the 6 MXU dots measured FASTER (287 vs 246 ms,
        # prof/prof_gi_tile.py) — FMA op count is flat in n_pad blocks
        # while dot MACs grow linearly, so FMA wins back at bench-class
        # tri counts (448 rows: re-measure per scene). Broadcast blocks
        # are chunked to <= 256 sublanes (larger lane-broadcasts
        # SIGABRT the TPU compiler — BASELINE round 5).
        fma_blk = n_pad
        while fma_blk > 256 or n_pad % fma_blk:
            fma_blk = n_pad // (n_pad // fma_blk + 1)

        def _proj6(o3sl, d3sl, hb_):
            oxr = o3sl[0].reshape(1, hb_)
            oyr = o3sl[1].reshape(1, hb_)
            ozr = o3sl[2].reshape(1, hb_)
            dxr = d3sl[0].reshape(1, hb_)
            dyr = d3sl[1].reshape(1, hb_)
            dzr = d3sl[2].reshape(1, hb_)

            parts = ([], [], [], [], [], [])
            for r0 in range(0, n_pad, fma_blk):
                xp = xpt_ref[r0:r0 + fma_blk, :]

                def bcp(lo, _xp=xp):
                    return jnp.broadcast_to(
                        _xp[:, lo:lo + 1], (fma_blk, hb_))

                parts[0].append(bcp(0) * oxr + bcp(1) * oyr
                                + bcp(2) * ozr + bcp(3))
                parts[1].append(bcp(4) * oxr + bcp(5) * oyr
                                + bcp(6) * ozr + bcp(7))
                parts[2].append(bcp(8) * oxr + bcp(9) * oyr
                                + bcp(10) * ozr + bcp(11))
                parts[3].append(bcp(0) * dxr + bcp(1) * dyr
                                + bcp(2) * dzr)
                parts[4].append(bcp(4) * dxr + bcp(5) * dyr
                                + bcp(6) * dzr)
                parts[5].append(bcp(8) * dxr + bcp(9) * dyr
                                + bcp(10) * dzr)
            return tuple(_cat(p) for p in parts)
    else:
        # plane hi/lo splits hoisted once per tile ([n_pad, 4] operands)
        xu_t = _hi_lo(xu_ref[:, :].T)
        xv_t = _hi_lo(xv_ref[:, :].T)
        xw_t = _hi_lo(xw_ref[:, :].T)

        def _proj6(o3sl, d3sl, hb_):
            one = jnp.ones((hb_,), jnp.float32)
            oh4 = jnp.stack(
                [o3sl[0], o3sl[1], o3sl[2], one], axis=0)  # [4, hb]
            dh4 = jnp.stack(
                [d3sl[0], d3sl[1], d3sl[2], one * 0.0], axis=0)
            oh_s, dh_s = _hi_lo(oh4), _hi_lo(dh4)
            oou = dot_f32x3(None, None, a_split=xu_t, b_split=oh_s)
            oov = dot_f32x3(None, None, a_split=xv_t, b_split=oh_s)
            oow = dot_f32x3(None, None, a_split=xw_t, b_split=oh_s)
            ddu = dot_f32x3(None, None, a_split=xu_t, b_split=dh_s)
            ddv = dot_f32x3(None, None, a_split=xv_t, b_split=dh_s)
            ddw = dot_f32x3(None, None, a_split=xw_t, b_split=dh_s)
            return oou, oov, oow, ddu, ddv, ddw
    row_np = jax.lax.broadcasted_iota(jnp.int32, (n_pad, hb), 0)
    row_m = jax.lax.broadcasted_iota(jnp.int32, (m_pad, b), 0)
    row_l = jax.lax.broadcasted_iota(
        jnp.int32, (l_pad, b if l_pad <= 128 else hb), 0)

    def _cat(parts, axis=0):
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis)

    def trace(ox_, oy_, oz_, ddx, ddy, ddz, active):
        """Closest hit over ALL resident triangles (brute, mirrors
        ops/intersect_bf._chunk_hits predicates), in hb-lane chunks.
        Returns (hit, dist, u, v, winner one-hot [n_pad, B] f32). The
        one-hot (the argmin row; row of the _BIG sentinel for misses —
        every consumer is masked by `hit`) replaces the per-bounce
        attr-fetch one-hot rebuild."""
        if "trace" in dbg:
            k = jnp.ones_like(ox_)
            oh0 = (jax.lax.broadcasted_iota(jnp.int32, (n_pad, b), 0)
                   == 0).astype(jnp.float32)
            return (active, k, k * 0.25, k * 0.25, oh0)
        outs = ([], [], [], [])
        for c in range(0, b, hb):
            sl = slice(c, c + hb)
            oou, oov, oow, ddu, ddv, ddw = _proj6(
                (ox_[sl], oy_[sl], oz_[sl]),
                (ddx[sl], ddy[sl], ddz[sl]), hb)
            nondeg = jnp.abs(ddw) >= 1e-12
            t = -oow / jnp.where(nondeg, ddw, 1.0)
            u = oou + t * ddu
            v = oov + t * ddv
            hit2 = (
                nondeg & (t > 0.0) & (u >= 0.0) & (v >= 0.0)
                & (u + v <= 1.0)
            )
            dist2 = jnp.where(hit2, t, _BIG)
            j = jnp.argmin(dist2, axis=0)  # [hb]
            oh_best = row_np == j[None, :]
            outs[0].append(jnp.min(dist2, axis=0))
            # where (not *): 0 * inf = NaN if a degenerate plane row
            # overflows u/v on non-winning rows
            outs[1].append(jnp.sum(jnp.where(oh_best, u, 0.0), axis=0))
            outs[2].append(jnp.sum(jnp.where(oh_best, v, 0.0), axis=0))
            outs[3].append(oh_best.astype(jnp.float32))
        d_best = _cat(outs[0])
        u_best = _cat(outs[1])
        v_best = _cat(outs[2])
        oh_all = _cat(outs[3], axis=1)
        got = active & (d_best < _BIG)
        return got, d_best, u_best, v_best, oh_all

    def occluded_test(ox_, oy_, oz_, tx_, ty_, tz_, active):
        """Any-hit x -> target (ops/intersect_bf.test_occlusion_bf
        semantics: offset origin, limit = dist - 2e-4). TRUE any-hit:
        `any(hit & t < limit)` is bitwise `min_hit_dist < limit`, so
        the closest-hit trace's argmin / min / one-hot u,v extraction
        (~5 [n_pad, hb]-sized ops per chunk) are skipped."""
        sx, sy, sz = tx_ - ox_, ty_ - oy_, tz_ - oz_
        dist = jnp.sqrt(sx * sx + sy * sy + sz * sz)
        dinv = 1.0 / jnp.maximum(dist, 1e-20)
        ddx, ddy, ddz = sx * dinv, sy * dinv, sz * dinv
        o2x = ox_ + ddx * _RAY_OFFSET
        o2y = oy_ + ddy * _RAY_OFFSET
        o2z = oz_ + ddz * _RAY_OFFSET
        limit = dist - _OCCL_EPS * 2.0
        if "occl" in dbg:
            return active & (limit < 0.0)
        outs = []
        for c in range(0, b, hb):
            sl = slice(c, c + hb)
            oou, oov, oow, ddu, ddv, ddw = _proj6(
                (o2x[sl], o2y[sl], o2z[sl]),
                (ddx[sl], ddy[sl], ddz[sl]), hb)
            nondeg = jnp.abs(ddw) >= 1e-12
            t = -oow / jnp.where(nondeg, ddw, 1.0)
            u = oou + t * ddu
            v = oov + t * ddv
            hit2 = (
                nondeg & (t > 0.0) & (u >= 0.0) & (v >= 0.0)
                & (u + v <= 1.0) & (t < limit[sl][None, :])
            )
            outs.append(jnp.max(hit2.astype(jnp.float32), axis=0))
        return active & (_cat(outs) > 0.5)

    def fetch_attr_oh(ohf):
        # winner one-hot [n_pad, B] f32 comes straight from trace()'s
        # argmin (no rebuild — the [n_pad, B] compare is ~0.8 ms/frame).
        # The attr table is 128-granular (a_pad) while the hit tables
        # are 64-granular (n_pad): pad the one-hot's dead rows.
        if a_pad != n_pad:
            ohf = jnp.concatenate(
                [ohf, jnp.zeros((a_pad - n_pad, ohf.shape[1]),
                                ohf.dtype)])
        return dot_exact_b(attr_ref[:, :], ohf)  # [ATTR_COLS, B]

    def fetch_attr(prim):
        # full-M mod-gather when the tri axis chunks 128-wide (saves
        # the ATTR_COLS->128 MXU M-pad waste; see
        # fused_di._gather_cols_exact), else the plain one-hot product
        nchunk_a = a_pad // 128
        if nchunk_a > 1 and ATTR_COLS * nchunk_a <= 256:
            from .fused_di import _gather_cols_exact

            return _gather_cols_exact(attr_ref[:, :], prim, nchunk_a)
        row_a = jax.lax.broadcasted_iota(jnp.int32, (a_pad, hb), 0)
        return dot_exact_b(attr_ref[:, :], _cat([
            (row_a == prim[c:c + hb][None, :]).astype(jnp.float32)
            for c in range(0, b, hb)], axis=1))  # [ATTR_COLS, B]

    def fetch_mat(mid):
        # m_pad is ~8 rows: the [m_pad, b] one-hot stays cheap unchunked
        oh = (row_m == mid[None, :]).astype(jnp.float32)
        return dot_exact_b(mat_ref[:, :], oh)  # [MAT_COLS, B]

    def fetch_light(lid):
        if l_pad <= 128:
            oh = (row_l == lid[None, :]).astype(jnp.float32)
            return dot_exact_b(light_ref[:, :], oh)  # [LT_ROWS, B]
        return _cat([
            dot_exact_b(light_ref[:, :],
                        (row_l == lid[c:c + hb][None, :]).astype(
                            jnp.float32))
            for c in range(0, b, hb)], axis=1)  # [LT_ROWS, B]

    lo = [ch(ST_LO), ch(ST_LO + 1), ch(ST_LO + 2)]
    nvx, nvy, nvz = ch(ST_NV), ch(ST_NV + 1), ch(ST_NV + 2)
    xsx, xsy, xsz = ch(ST_XS), ch(ST_XS + 1), ch(ST_XS + 2)
    nsx, nsy, nsz = ch(ST_NS), ch(ST_NS + 1), ch(ST_NS + 2)
    prim_pdf = ch(ST_PDF)
    prim_delta = ch(ST_DELTA)  # bool as f32
    thr = [ch(ST_THR), ch(ST_THR + 1), ch(ST_THR + 2)]

    upix = pix.astype(jnp.uint32)

    # ONE sublane-batched pcg4d for every bounce's two draw sets (NEE
    # 4-D + BSDF 3-D): pcg4d is an elementwise hash, so batching keeps
    # each stream bit-identical to the separate calls it replaces —
    # which cost ~7-9 ms/frame EACH at 1080p in Mosaic per-op dispatch
    # on the ~25-op 1-D chain (fused_di round-5 finding). Counter
    # layout: block (d_i - d_lo)*2 + stage == ctr - (_CTR_PATH +
    # (d_lo-1)*2), i.e. consecutive counters across blocks.
    nblk = 2 * (d_hi - d_lo + 1)
    if nblk * cg <= 256:  # >256-sublane vector ops SIGABRT the compiler
        pix2 = upix.reshape(cg, 128)
        pix_all = jnp.concatenate([pix2] * nblk, axis=0)
        blk_i = jax.lax.broadcasted_iota(
            jnp.int32, (nblk * cg, 128), 0) // cg
        ctr_all = (_CTR_PATH + (d_lo - 1) * 2 + blk_i).astype(jnp.uint32)
        ru = _pcg4d(
            pix_all, jnp.full((nblk * cg, 128), looper, jnp.uint32),
            ctr_all, jnp.full((nblk * cg, 128), _SALT_GI, jnp.uint32))

        def rng_blk(idx, _ru=ru):
            sl = slice(idx * cg, (idx + 1) * cg)
            return tuple(_unit(u[sl]).reshape(b) for u in _ru)
    else:
        def rng_blk(idx):
            ctr = _CTR_PATH + (d_lo - 1) * 2 + idx
            u = _pcg4d(
                upix, jnp.full((b,), looper, jnp.uint32),
                jnp.full((b,), ctr, jnp.uint32),
                jnp.full((b,), _SALT_GI, jnp.uint32))
            return tuple(_unit(x) for x in u)

    for d_i in range(d_lo, d_hi + 1):
        first = d_i == 1
        delta_bsdf = mtype == _DIELECTRIC
        # orient the shading normal toward wo for non-delta materials
        flip = (~delta_bsdf) & (
            _dot3(nx, ny, nz, wox, woy, woz) < 0.0
        )
        sgn = jnp.where(flip, -1.0, 1.0)
        nx, ny, nz = nx * sgn, ny * sgn, nz * sgn
        if first:
            nvx, nvy, nvz = nx, ny, nz

        if not first and "nee" not in dbg:
            # ---- NEE (restir.cu:290-300): alias light sample + shadow
            r1, r2, r3, r4 = rng_blk((d_i - d_lo) * 2)
            shade_nee = alive & (~delta_bsdf)
            pass_id = jnp.minimum(
                (r1 * float(n_lights)).astype(jnp.int32), n_lights - 1
            )
            lt_p = fetch_light(pass_id)
            accept = r2 < lt_p[LT_PROB]
            lid = jnp.where(
                accept, pass_id, lt_p[LT_ALIAS].astype(jnp.int32)
            )
            lt = jnp.where(accept[None, :], lt_p, fetch_light(lid))
            lprim = lt[LT_PRIM].astype(jnp.int32)
            lat = fetch_attr(lprim)
            # v0 + e01/e02 spans; uniform point (mathUtil.h:94 warp)
            sr = jnp.sqrt(r4)
            su = 1.0 - sr
            sv = r3 * sr
            # sample = v1*su + v2*sv + v0*(1-su-sv)
            #        = v0 + e01*su + e02*sv
            smx = lat[0] + lat[3] * su + lat[6] * sv
            smy = lat[1] + lat[4] * su + lat[7] * sv
            smz = lat[2] + lat[5] * su + lat[8] * sv
            lnx, lny, lnz = _cross3(
                lat[3], lat[4], lat[5], lat[6], lat[7], lat[8]
            )
            lnx, lny, lnz = _norm3(lnx, lny, lnz)
            tox, toy, toz = smx - px, smy - py, smz - pz
            ldist = jnp.sqrt(tox * tox + toy * toy + toz * toz)
            linv = 1.0 / jnp.maximum(ldist, 1e-20)
            wix, wiy, wiz = tox * linv, toy * linv, toz * linv
            lrad = [lt[LT_RAD], lt[LT_RAD + 1], lt[LT_RAD + 2]]
            llum = (0.2126 * lrad[0] + 0.7152 * lrad[1]
                    + 0.0722 * lrad[2])
            pdf_area = llum * 2.0 * _PI * sum_inv
            # area -> solid angle at the sample (mathUtil.h:182)
            cos_l = jnp.abs(_dot3(lnx, lny, lnz, -wix, -wiy, -wiz))
            lpdf = pdf_area * ldist * ldist / jnp.maximum(cos_l, 1e-20)
            if single_sided:
                lfront = _dot3(lnx, lny, lnz, tox, toy, toz) <= -1e-6
                lpdf = jnp.where(lfront, lpdf, -1.0)
            # shadow ray (sample_direct_light: target at the sample)
            shoot = shade_nee & (lpdf > 0.0)
            occ = occluded_test(px, py, pz, smx, smy, smz, shoot)
            lpdf = jnp.where(occ, -1.0, lpdf)
            f_rgb = _eval_bsdf_rgb(
                mtype, [basr, basg, basb], metallic, roughness,
                nx, ny, nz, wox, woy, woz, wix, wiy, wiz,
                has_met=has_met,
            )
            bpdf = _pdf_bsdf(
                mtype, metallic, roughness, nx, ny, nz,
                wox, woy, woz, wix, wiy, wiz, has_met=has_met,
            )
            mis = lpdf * lpdf / jnp.maximum(
                lpdf * lpdf + bpdf * bpdf, 1e-37
            )
            cos_s = jnp.maximum(_dot3(nx, ny, nz, wix, wiy, wiz), 0.0)
            scale = cos_s * mis / jnp.maximum(lpdf, 1e-20)
            add = shade_nee & (lpdf > 0.0)
            for k in range(3):
                lo[k] = lo[k] + jnp.where(
                    add, thr[k] * f_rgb[k] * lrad[k] * scale, 0.0
                )

        # ---- BSDF bounce (restir.cu:302-325; ops/bsdf.sample_bsdf)
        b1, b2, b3, _ = rng_blk((d_i - d_lo) * 2 + 1)
        lam_x, lam_y, lam_z = _cosine_hemisphere(nx, ny, nz, b1, b2)
        # material-set specialization (cfg.scene_has_metallic /
        # scene_has_dielectric): lockstep lanes pay the UNION of all
        # compiled BSDF chains, so scenes without a material type drop
        # its whole sampling/eval chain at compile time (the TPU answer
        # to the reference's per-thread material switch). The
        # has_met & has_die branch is bit-identical to the original
        # unconditional code; reduced branches only change don't-care
        # lanes (unknown types, which `invalid` kills either way).
        if has_met:
            alpha = roughness * roughness
            hx, hy, hz = _sample_vndf(
                nx, ny, nz, wox, woy, woz, alpha, b1, b2
            )
            hdoto = _dot3(hx, hy, hz, wox, woy, woz)
            rfx, rfy, rfz = _norm3(
                -wox + 2.0 * hdoto * hx,
                -woy + 2.0 * hdoto * hy,
                -woz + 2.0 * hdoto * hz,
            )
            pick_diff = b3 > 1.0 / (2.0 - metallic)
            met_x = jnp.where(pick_diff, lam_x, rfx)
            met_y = jnp.where(pick_diff, lam_y, rfy)
            met_z = jnp.where(pick_diff, lam_z, rfz)
            met_invalid = _dot3(nx, ny, nz, met_x, met_y, met_z) < 0.0

        if has_die:
            cos_wo = _dot3(nx, ny, nz, wox, woy, woz)
            pdf_refl = _fresnel_dielectric(cos_wo, ior)
            rlx, rly, rlz = _norm3(
                -wox + 2.0 * cos_wo * nx,
                -woy + 2.0 * cos_wo * ny,
                -woz + 2.0 * cos_wo * nz,
            )
            # refract (utils/math.refract): eta flip on the incident side
            eta_r = jnp.where(cos_wo < 0.0, 1.0 / ior, ior)
            sin2_in = jnp.maximum(0.0, 1.0 - cos_wo * cos_wo)
            sin2_tr = sin2_in / (eta_r * eta_r)
            refr_ok = sin2_tr < 1.0
            cos_tr = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2_tr))
            cos_tr = jnp.where(cos_wo < 0.0, -cos_tr, cos_tr)
            tscale = cos_wo / eta_r - cos_tr
            einv = 1.0 / eta_r
            rtx, rty, rtz = _norm3(
                -wox * einv + nx * tscale,
                -woy * einv + ny * tscale,
                -woz * einv + nz * tscale,
            )
            choose_refl = b3 < pdf_refl
            die_x = jnp.where(choose_refl, rlx, rtx)
            die_y = jnp.where(choose_refl, rly, rty)
            die_z = jnp.where(choose_refl, rlz, rtz)
            die_fs = jnp.where(choose_refl, 1.0, 1.0 / (eta_r * eta_r))
            die_invalid = (~choose_refl) & (~refr_ok)

        is_lam = mtype == _LAMBERTIAN
        is_met = mtype == _METALLIC
        is_die = mtype == _DIELECTRIC
        if has_met and has_die:
            wix = jnp.where(is_lam, lam_x, jnp.where(is_met, met_x, die_x))
            wiy = jnp.where(is_lam, lam_y, jnp.where(is_met, met_y, die_y))
            wiz = jnp.where(is_lam, lam_z, jnp.where(is_met, met_z, die_z))
        elif has_met:
            wix = jnp.where(is_met, met_x, lam_x)
            wiy = jnp.where(is_met, met_y, lam_y)
            wiz = jnp.where(is_met, met_z, lam_z)
        elif has_die:
            wix = jnp.where(is_die, die_x, lam_x)
            wiy = jnp.where(is_die, die_y, lam_y)
            wiz = jnp.where(is_die, die_z, lam_z)
        else:
            wix, wiy, wiz = lam_x, lam_y, lam_z

        lam_pdf = jnp.maximum(
            _dot3(nx, ny, nz, lam_x, lam_y, lam_z), 0.0
        ) * _INV_PI
        if has_met:
            met_f = _metallic_eval(
                [basr, basg, basb], metallic, alpha, nx, ny, nz,
                wox, woy, woz, met_x, met_y, met_z,
            )
            met_pdf = _metallic_pdf(
                metallic, alpha, nx, ny, nz, wox, woy, woz,
                met_x, met_y, met_z,
            )
        f_s = []
        for k, bc in enumerate((basr, basg, basb)):
            lam_f = bc * _INV_PI
            if has_met and has_die:
                f_s.append(jnp.where(
                    is_lam, lam_f,
                    jnp.where(is_met, met_f[k], bc * die_fs),
                ))
            elif has_met:
                f_s.append(jnp.where(is_met, met_f[k], lam_f))
            elif has_die:
                f_s.append(jnp.where(is_die, bc * die_fs, lam_f))
            else:
                f_s.append(lam_f)
        if has_met and has_die:
            pdf_s = jnp.where(
                is_lam, lam_pdf, jnp.where(is_met, met_pdf, 1.0)
            )
        elif has_met:
            pdf_s = jnp.where(is_met, met_pdf, lam_pdf)
        elif has_die:
            pdf_s = jnp.where(is_die, 1.0, lam_pdf)
        else:
            pdf_s = lam_pdf
        # pure boolean algebra (a scalar-bool jnp.where lowers to an
        # i8 -> i1 trunci Mosaic cannot compile): lambert never invalid,
        # unknown types always invalid
        invalid = ~(is_lam | is_met | is_die)
        if has_met:
            invalid = invalid | (is_met & met_invalid)
        if has_die:
            invalid = invalid | (is_die & die_invalid)
        delta_sample = is_die & ~invalid  # SPECULAR flag lobes

        ok = alive & (~invalid) & (pdf_s >= 1e-8)
        if first:
            prim_pdf = jnp.where(ok, pdf_s, prim_pdf)
            prim_delta = jnp.where(
                ok, delta_sample.astype(jnp.float32), prim_delta
            )
        weight = jnp.where(
            delta_sample, 1.0,
            jnp.abs(_dot3(nx, ny, nz, wix, wiy, wiz)),
        )
        if not first:
            upd = ok
            ws = weight / jnp.maximum(pdf_s, 1e-20)
            for k in range(3):
                thr[k] = jnp.where(upd, thr[k] * f_s[k] * ws, thr[k])
        alive = ok

        # offset ray + closest hit (intersections.h:13)
        rox = px + wix * _RAY_OFFSET
        roy = py + wiy * _RAY_OFFSET
        roz = pz + wiz * _RAY_OFFSET
        got, hdist, hu, hv, oh_hit = trace(
            rox, roy, roz, wix, wiy, wiz, alive
        )
        alive = alive & got
        at = fetch_attr_oh(oh_hit)
        npx = at[0] + hu * at[3] + hv * at[6]
        npy = at[1] + hu * at[4] + hv * at[7]
        npz = at[2] + hu * at[5] + hv * at[8]
        nnx = at[9] + hu * at[12] + hv * at[15]
        nny = at[10] + hu * at[13] + hv * at[16]
        nnz = at[11] + hu * at[14] + hv * at[17]
        nnx, nny, nnz = _norm3(nnx, nny, nnz)
        nmid = at[24].astype(jnp.int32)
        nmat = fetch_mat(nmid)
        if has_proc:
            # procedural base color applies regardless of with_textures
            # (ops/texture.fetch_textured_material:102-104); scenes
            # without the marker drop the whole chain (a full pcg4d +
            # 2 sins + the uv interpolation) at compile time
            u_uv = at[18] + hu * at[20] + hv * at[22]
            v_uv = at[19] + hu * at[21] + hv * at[23]
            proc = _procedural_tex(u_uv, v_uv)
            is_proc = nmat[7] < -1.5
            nbase = [jnp.where(is_proc, proc, nmat[1 + k])
                     for k in range(3)]
        else:
            nbase = [nmat[1 + k] for k in range(3)]

        # ---- light hit with MIS (restir.cu:345-367)
        hit_light = alive & (nmat[0] == _LIGHT)
        lfront2 = _dot3(nnx, nny, nnz, wix, wiy, wiz) < 0.0
        lit = hit_light & lfront2 if single_sided else hit_light
        le = nbase
        le_lum = 0.2126 * le[0] + 0.7152 * le[1] + 0.0722 * le[2]
        lp_area = le_lum * 2.0 * _PI * sum_inv
        tox2, toy2, toz2 = npx - px, npy - py, npz - pz
        d2h = tox2 * tox2 + toy2 * toy2 + toz2 * toz2
        tinv = 1.0 / jnp.maximum(jnp.sqrt(d2h), 1e-20)
        cos_h2 = jnp.abs(_dot3(
            nnx, nny, nnz, -tox2 * tinv, -toy2 * tinv, -toz2 * tinv
        ))
        lp_sa = lp_area * d2h / jnp.maximum(cos_h2, 1e-20)
        w_hit = jnp.where(
            delta_sample | first, 1.0,
            pdf_s * pdf_s / jnp.maximum(
                pdf_s * pdf_s + lp_sa * lp_sa, 1e-37
            ),
        )
        for k in range(3):
            lo[k] = lo[k] + jnp.where(lit, le[k] * thr[k] * w_hit, 0.0)

        if first:
            got1 = ok & got
            xsx = jnp.where(got1, npx, xsx)
            xsy = jnp.where(got1, npy, xsy)
            xsz = jnp.where(got1, npz, xsz)
            nsx = jnp.where(got1, nnx, nsx)
            nsy = jnp.where(got1, nny, nsy)
            nsz = jnp.where(got1, nnz, nsz)

        alive = alive & ~hit_light
        # advance the path state
        px, py, pz = npx, npy, npz
        nx, ny, nz = nnx, nny, nnz
        wox, woy, woz = -wix, -wiy, -wiz
        mtype = nmat[0]
        basr, basg, basb = nbase
        metallic = nmat[4]
        roughness = nmat[5]
        ior = nmat[6]

    # ONE stacked store for the whole state pack (ST_CH separate
    # channel stores pay ST_CH op dispatches)
    vals = [None] * ST_CH

    def put(i, val):
        vals[i] = val

    put(ST_LO, lo[0])
    put(ST_LO + 1, lo[1])
    put(ST_LO + 2, lo[2])
    put(ST_NV, nvx)
    put(ST_NV + 1, nvy)
    put(ST_NV + 2, nvz)
    put(ST_XS, xsx)
    put(ST_XS + 1, xsy)
    put(ST_XS + 2, xsz)
    put(ST_NS, nsx)
    put(ST_NS + 1, nsy)
    put(ST_NS + 2, nsz)
    put(ST_PDF, prim_pdf)
    put(ST_DELTA, prim_delta)
    put(ST_POS, px)
    put(ST_POS + 1, py)
    put(ST_POS + 2, pz)
    put(ST_NORM, nx)
    put(ST_NORM + 1, ny)
    put(ST_NORM + 2, nz)
    put(ST_WO, wox)
    put(ST_WO + 1, woy)
    put(ST_WO + 2, woz)
    put(ST_MTYPE, mtype)
    put(ST_BASE, basr)
    put(ST_BASE + 1, basg)
    put(ST_BASE + 2, basb)
    put(ST_METAL, metallic)
    put(ST_ROUGH, roughness)
    put(ST_IOR, ior)
    put(ST_ALIVE, jnp.where(alive, 1.0, 0.0))
    put(ST_THR, thr[0])
    put(ST_THR + 1, thr[1])
    put(ST_THR + 2, thr[2])
    for i in range(ST_CH):
        if vals[i] is None:
            vals[i] = jnp.zeros((b,), jnp.float32)
    out_ref[:, :, :] = jnp.stack(vals, axis=0).reshape(ST_CH, cg, 128)


@functools.partial(jax.jit, static_argnames=(
    "depth", "single_sided", "n_lights", "tile", "groups", "hit_fma",
    "has_met", "has_die", "has_proc", "dbg", "interpret"))
def gi_trace_pallas(
    in_pack, looper, tri_xform, prim_attr, mat_attr,
    light_prob, light_alias, light_prim_ids, light_radiance,
    sum_light_power_inv,
    depth: int = 5, single_sided: bool = True, n_lights: int = 1,
    pix0=0, tile: int = 0, groups=None, hit_fma=None,
    has_met: bool = True, has_die: bool = True, has_proc: bool = True,
    dbg=(), interpret: bool = False,
):
    """Run the fused GI trace. in_pack: [IN_CH, R/128, 128].
    Returns [GO_CH, R/128, 128].

    `tile` = rays per grid step (0 = auto). The per-bounce body is a
    long 1-D scalar chain (~300 ops) whose cost at tile=1024 is Mosaic
    per-op dispatch, not compute — wider tiles amortize it. The loop
    runs as ONE KERNEL PER BOUNCE chained over the [ST_CH] state pack
    (HBM round trip ~1 ms/bounce at 1080p), which keeps each compile
    O(one bounce): the monolithic depth-5 kernel OOM-killed the XLA
    compile helper beyond tile 1024 (prof/prof_gi_tile.py). In-kernel
    hit tests are chunked to <= 1024 lanes, so the wide tile only
    widens the 1-D chain. Results are tile-invariant: the in-kernel
    RNG keys on the global ray index. Inputs not a tile multiple are
    zero-padded here and sliced back."""
    from .fused_di import _lp2, _round_up, _split_planes

    g_in = in_pack.shape[1]
    n_tri = tri_xform.shape[1] // 3
    # 64-granular padding: geometry cost is linear in padded rows and
    # the brute traversals are ~85% of this kernel on bench-class
    # scenes (BASELINE r5) — a 426-tri scene at 128-granularity pays
    # 512 rows (17% waste), at 64 only 448
    n_pad = _round_up(max(n_tri, 128), 64)
    assert n_pad <= 1024, "fused GI is for VMEM-resident scenes"
    if hit_fma is None:
        # chunked VPU-FMA hit tests by default: (a) FASTER at bench-
        # class tri counts (448 rows: 300 -> 256 ms/frame at 1080p
        # depth 5 — FMA op count is ~flat per 224-row block while the
        # K=4-padded dot MACs grow linearly), and (b) UNBIASED: a
        # 3-way A/B vs the exact-f32 XLA tracer on the many-light
        # scene measured the 3-pass bf16-split dots 2.9% LOW (shared-
        # edge cracks lose whole paths) while FMA matched the f32
        # reference to 7 digits (BASELINE round 5). The dots path is
        # kept for A/B only.
        hit_fma = True
    if tile <= 0:
        tile = min(1024, _round_up(g_in * 128, 128))
    if groups is None:
        # bounces per kernel; (depth,) = the whole loop in one kernel
        groups = (depth,)
    tg = tile // 128
    g = _round_up(g_in, tg)
    if g != g_in:
        in_pack = jnp.concatenate(
            [in_pack, jnp.zeros((IN_CH, g - g_in, 128), in_pack.dtype)],
            axis=1)
    xu, xv, xw = _split_planes(tri_xform, n_pad)
    # tri-major plane table for the FMA hit tests (cols 0:4 xu, 4:8 xv,
    # 8:12 xw; zero lanes pad to the 128 tile anyway)
    xpt = jnp.concatenate(
        [xu, xv, xw, jnp.zeros((116, n_pad), xu.dtype)], axis=0).T
    a_pad = _round_up(n_pad, 128)
    attr_t = jnp.zeros((ATTR_COLS, a_pad), jnp.float32)
    attr_t = attr_t.at[:, :prim_attr.shape[0]].set(
        prim_attr.T.astype(jnp.float32)
    )
    m_pad = _round_up(max(mat_attr.shape[0], 8), 8)
    mat_t = jnp.zeros((MAT_COLS, m_pad), jnp.float32)
    mat_t = mat_t.at[:, :mat_attr.shape[0]].set(
        mat_attr.T.astype(jnp.float32)
    )
    # NOTE: l_pad < 128 measured 2.3x SLOWER end-to-end (384 vs 246 ms,
    # prof/prof_gi_depth.py): Mosaic lowers the skinny [24, 8] @ [8, B]
    # table dot far worse than the K=128 form — keep the 128 floor
    l_pad = _round_up(max(n_lights, 128), 128)
    lt = jnp.zeros((LT_ROWS, l_pad), jnp.float32)
    lt = lt.at[LT_PROB, :n_lights].set(light_prob[:n_lights])
    lt = lt.at[LT_ALIAS, :n_lights].set(
        light_alias[:n_lights].astype(jnp.float32)
    )
    lt = lt.at[LT_PRIM, :n_lights].set(
        light_prim_ids[:n_lights].astype(jnp.float32)
    )
    lt = lt.at[LT_RAD:LT_RAD + 3, :light_radiance.shape[0]].set(
        light_radiance.T
    )
    scal = jnp.stack(
        [jnp.asarray(sum_light_power_inv, jnp.float32),
         jnp.float32(0.0)]
    )

    n_tiles = g // tg
    full_p = lambda i: (0, 0)  # noqa: E731

    # seed the state pack from the primary-hit inputs (channel shuffle;
    # see the ST_* layout note)
    zero3 = jnp.zeros((3, g, 128), jnp.float32)
    one1 = jnp.ones((1, g, 128), jnp.float32)
    st = jnp.concatenate([
        zero3, zero3, zero3, zero3,                      # LO NV XS NS
        one1, one1 * 0.0,                                # PDF DELTA
        in_pack[IN_POS:IN_POS + 3],                      # POS
        in_pack[IN_NORM:IN_NORM + 3],                    # NORM
        -in_pack[IN_DIR:IN_DIR + 3],                     # WO
        in_pack[IN_MTYPE:IN_MTYPE + 1],
        zero3,                                           # BASE
        in_pack[IN_METAL:IN_METAL + 1],
        in_pack[IN_ROUGH:IN_ROUGH + 1],
        in_pack[IN_IOR:IN_IOR + 1],
        in_pack[IN_ALIVE:IN_ALIVE + 1],
        one1, one1, one1,                                # THR
    ], axis=0)

    lp = _lp2(looper, pix0)
    d0 = 1
    for gsz in groups:
        if d0 > depth:
            break
        d1 = min(d0 + int(gsz) - 1, depth)
        kern = functools.partial(
            _gi_trace_kernel, n_pad=n_pad, a_pad=a_pad, m_pad=m_pad, l_pad=l_pad,
            n_lights=n_lights, d_lo=d0, d_hi=d1,
            single_sided=single_sided, hit_fma=hit_fma,
            has_met=has_met, has_die=has_die, has_proc=has_proc,
            dbg=dbg,
        )
        d0 = d1 + 1
        st = pl.pallas_call(
            kern,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((ST_CH, tg, 128), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((4, n_pad), full_p, memory_space=pltpu.VMEM),
                pl.BlockSpec((4, n_pad), full_p, memory_space=pltpu.VMEM),
                pl.BlockSpec((4, n_pad), full_p, memory_space=pltpu.VMEM),
                pl.BlockSpec((n_pad, 128), full_p,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ATTR_COLS, a_pad), full_p,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((MAT_COLS, m_pad), full_p,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((LT_ROWS, l_pad), full_p,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(
                (ST_CH, tg, 128), lambda i: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((ST_CH, g, 128), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(lp, st, xu, xv, xw, xpt, attr_t, mat_t, lt, scal)

    # GO = the layout-aligned first 14 state channels + zero padding
    out = jnp.concatenate(
        [st[:GO_DELTA + 1],
         jnp.zeros((GO_CH - GO_DELTA - 1, g, 128), jnp.float32)], axis=0)
    return out[:, :g_in] if g != g_in else out


# ---------------------------------------------------------------------------
# GI resolve kernel: RIS update + temporal merge + clamp + shade
# (models/restir_gi.restir_indirect steps 3-5; reference
# ReSTIRIndirectKernel restir.cu:375-408). One kernel per 1024-ray
# tile over the trace-output pack — the [R, 3] whole-frame reservoir
# ops this replaces pad 43x under (8,128) tiling (BASELINE.md round 3).


def _gi_resolve_kernel(go_ref, in_ref, gq_ref, prev_ref,
                       looper_ref, q_ref, ind_ref, win_ref, sem,
                       *, window, temporal, temporal_clamp,
                       has_met=True):
    cg = go_ref.shape[1]
    b = cg * 128
    tile_id = pl.program_id(0)
    pix = looper_ref[1].astype(jnp.int32) + tile_id * b + (
        jax.lax.broadcasted_iota(jnp.int32, (b, 1), 0).reshape(b)
    )
    looper = looper_ref[0]

    if temporal:
        # temporal-window DMA start, in-kernel (see fused_di._window_start;
        # the GI validity mask keys on prim > NULL instead of the miss flag)
        r_prev = prev_ref.shape[1]
        m_f = gq_ref[GQ_MOTION, :, :].reshape(b)
        p_f = gq_ref[GQ_PRIM, :, :].reshape(b)
        m_valid = jnp.where(
            (m_f >= 0.0) & (p_f > _NULL_PRIM), m_f, float(r_prev))
        w0 = jnp.min(m_valid).astype(jnp.int32)
        w0 = (w0 // 128) * 128
        w0 = pl.multiple_of(
            jnp.clip(w0, 0, max(r_prev - window, 0)), 128)
        dma = pltpu.make_async_copy(
            prev_ref.at[:, pl.ds(w0, window)], win_ref, sem
        )
        dma.start()

    def go(i):
        return go_ref[i, :, :].reshape(b)

    def inn(i):
        return in_ref[i, :, :].reshape(b)

    def gq(i):
        return gq_ref[i, :, :].reshape(b)

    def _bad(x):
        return jnp.isnan(x) | jnp.isinf(x)

    # ---- trace output -> candidate sample (wrapper epilogue of
    # trace_gi_sample_fused, lane-exact)
    lx, ly, lz = go(GO_LO), go(GO_LO + 1), go(GO_LO + 2)
    lo_bad = _bad(lx) | _bad(ly) | _bad(lz)  # zero_nan_or_inf(lo)
    lx = jnp.where(lo_bad, 0.0, lx)
    ly = jnp.where(lo_bad, 0.0, ly)
    lz = jnp.where(lo_bad, 0.0, lz)
    xvx, xvy, xvz = inn(IN_POS), inn(IN_POS + 1), inn(IN_POS + 2)
    nvx, nvy, nvz = go(GO_NV), go(GO_NV + 1), go(GO_NV + 2)
    xsx, xsy, xsz = go(GO_XS), go(GO_XS + 1), go(GO_XS + 2)
    nsx, nsy, nsz = go(GO_NS), go(GO_NS + 1), go(GO_NS + 2)
    prim_pdf = go(GO_PDF)
    prim_delta = go(GO_DELTA) > 0.5

    lum = 0.2126 * lx + 0.7152 * ly + 0.0722 * lz
    dxx, dxy, dxz = xsx - xvx, xsy - xvy, xsz - xvz
    seg2 = dxx * dxx + dxy * dxy + dxz * dxz
    valid = (lum >= 1e-8) & (seg2 > 0.0)

    # ---- RIS weight + streaming update into an empty reservoir
    # (restir.cu:375-385; restir.h:38-44 with M 0 -> 1)
    w = lum / jnp.maximum(prim_pdf, 1e-20)
    w = jnp.where(_bad(w) | (w < 0.0) | ~valid, 0.0, w)
    # ONE batched pcg4d for both resolve draws (update + temporal) —
    # elementwise hash, streams bit-identical to the separate calls
    # (each ~25-op 1-D chain costs ~7-9 ms/frame at 1080p in per-op
    # dispatch); _CTR_UPDATE=0 / _CTR_TEMPORAL=1 are consecutive.
    cg_ = b // 128
    pix2 = pix.reshape(cg_, 128)
    blk2 = jax.lax.broadcasted_iota(jnp.int32, (2 * cg_, 128), 0) // cg_
    bu1, _, _, _ = _pcg4d(
        jnp.concatenate([pix2] * 2, axis=0),
        jnp.full((2 * cg_, 128), looper, jnp.uint32),
        (_CTR_UPDATE + blk2).astype(jnp.uint32),
        jnp.full((2 * cg_, 128), _SALT_GI, jnp.uint32),
    )
    r_upd = _unit(bu1[:cg_]).reshape(b)
    r_temp = _unit(bu1[cg_:]).reshape(b)
    take0 = r_upd * w < w  # empty reservoir: take iff w > 0
    zero = jnp.zeros_like(w)
    s_lx = jnp.where(take0, lx, zero)
    s_ly = jnp.where(take0, ly, zero)
    s_lz = jnp.where(take0, lz, zero)
    s_xvx = jnp.where(take0, xvx, zero)
    s_xvy = jnp.where(take0, xvy, zero)
    s_xvz = jnp.where(take0, xvz, zero)
    s_nvx = jnp.where(take0, nvx, zero)
    s_nvy = jnp.where(take0, nvy, zero)
    s_nvz = jnp.where(take0, nvz, zero)
    s_xsx = jnp.where(take0, xsx, zero)
    s_xsy = jnp.where(take0, xsy, zero)
    s_xsz = jnp.where(take0, xsz, zero)
    s_nsx = jnp.where(take0, nsx, zero)
    s_nsy = jnp.where(take0, nsy, zero)
    s_nsz = jnp.where(take0, nsz, zero)
    r_w = w
    r_m = jnp.ones_like(w)

    prim = gq(GQ_PRIM)
    g_nx, g_ny, g_nz = gq(GQ_NORM), gq(GQ_NORM + 1), gq(GQ_NORM + 2)
    depth = gq(GQ_DEPTH)

    if temporal:
        # ---- windowed one-hot motion gather of the previous reservoir
        # (findTemporalNeighbor restir.cu:21-45; same windowed-gather
        # deviation as the DI reuse kernel)
        motion = gq(GQ_MOTION).astype(jnp.int32)
        rel = motion - w0
        in_win = (motion >= 0) & (rel >= 0) & (rel < window)
        rel = jnp.where(in_win, rel, 0)
        dma.wait()
        # full-M mod-gather (see fused_di._temporal_merge_pack): the
        # window's lane-chunks stack on sublanes so the MXU M dim is
        # Q_CH*nchunk instead of Q_CH padded to 128; bitwise equal to
        # the padded one-hot form (exact 0/1 bf16 x hi/mid/lo product,
        # masked blocks contribute exact +0.0)
        nchunk = next(
            (n for n in (8, 4, 2)
             if window % (n * 128) == 0 and Q_CH * n <= 256), 1)
        if nchunk > 1:
            cw = window // nchunk
            win2 = jnp.concatenate(
                [win_ref[:, j * cw:(j + 1) * cw] for j in range(nchunk)],
                axis=0)  # [Q_CH*nchunk, cw]
            rows = jax.lax.broadcasted_iota(jnp.int32, (cw, b), 0)
            oh = (rows == jax.lax.rem(rel, cw)[None, :]).astype(
                jnp.bfloat16)
            wh, wm, wl = _hi_mid_lo(win2)
            outg = _bdot(wh, oh) + (_bdot(wm, oh) + _bdot(wl, oh))
            jstar = rel // cw
            blk_row = jax.lax.broadcasted_iota(
                jnp.int32, (Q_CH * nchunk, b), 0) // Q_CH
            outg = jnp.where(blk_row == jstar[None, :], outg, 0.0)
            gathered = outg[0:Q_CH]
            for j in range(1, nchunk):
                gathered = gathered + outg[j * Q_CH:(j + 1) * Q_CH]
        else:
            win_rows = jax.lax.broadcasted_iota(
                jnp.int32, (window, b), 0)
            onehot = (win_rows == rel[None, :]).astype(jnp.float32)
            gathered = dot_exact_b(win_ref[:, :], onehot)  # [Q_CH, B]

        n_w = gathered[Q_W]
        n_m = gathered[Q_M]
        ok = in_win & (prim > _NULL_PRIM)
        ok &= gathered[Q_PRIM] == prim
        ok &= jnp.abs(_dot3(
            g_nx, g_ny, g_nz,
            gathered[Q_GNORM], gathered[Q_GNORM + 1], gathered[Q_GNORM + 2],
        )) >= 0.9
        ok &= jnp.abs(gathered[Q_DEPTH] - depth) <= depth * 0.1
        ok &= ~(_bad(n_w) | (n_w < 0.0))  # ~invalid(temporal)

        r_t = r_temp
        w_new = jnp.where(ok, r_w + n_w, r_w)
        m_new = jnp.where(ok, r_m + n_m, r_m)
        take = ok & (r_t * w_new < n_w)
        s_lx = jnp.where(take, gathered[Q_LO], s_lx)
        s_ly = jnp.where(take, gathered[Q_LO + 1], s_ly)
        s_lz = jnp.where(take, gathered[Q_LO + 2], s_lz)
        s_xvx = jnp.where(take, gathered[Q_XV], s_xvx)
        s_xvy = jnp.where(take, gathered[Q_XV + 1], s_xvy)
        s_xvz = jnp.where(take, gathered[Q_XV + 2], s_xvz)
        s_nvx = jnp.where(take, gathered[Q_NV], s_nvx)
        s_nvy = jnp.where(take, gathered[Q_NV + 1], s_nvy)
        s_nvz = jnp.where(take, gathered[Q_NV + 2], s_nvz)
        s_xsx = jnp.where(take, gathered[Q_XS], s_xsx)
        s_xsy = jnp.where(take, gathered[Q_XS + 1], s_xsy)
        s_xsz = jnp.where(take, gathered[Q_XS + 2], s_xsz)
        s_nsx = jnp.where(take, gathered[Q_NS], s_nsx)
        s_nsy = jnp.where(take, gathered[Q_NS + 1], s_nsy)
        s_nsz = jnp.where(take, gathered[Q_NS + 2], s_nsz)
        r_w = w_new
        r_m = m_new

    # ---- M-cap (restir.h:88-93; restir.cu:397)
    cap = float(temporal_clamp)
    over = r_m > cap
    scale = cap / jnp.maximum(r_m, 1.0)
    r_w = jnp.where(over, r_w * scale, r_w)
    r_m = jnp.where(over, cap, r_m)

    # ---- shade at the visible point (restir.cu:399-408), demodulated
    wix, wiy, wiz = s_xsx - s_xvx, s_xsy - s_xvy, s_xsz - s_xvz
    inv_l = 1.0 / jnp.maximum(
        jnp.sqrt(wix * wix + wiy * wiy + wiz * wiz), 1e-20)
    wix, wiy, wiz = wix * inv_l, wiy * inv_l, wiz * inv_l
    wox = -inn(IN_DIR)
    woy = -inn(IN_DIR + 1)
    woz = -inn(IN_DIR + 2)
    scalar = 0.2126 * s_lx + 0.7152 * s_ly + 0.0722 * s_lz
    w_big = r_w / jnp.maximum(r_m, 1.0)
    inv_sc = 1.0 / jnp.maximum(scalar, 1e-20)
    f = _eval_bsdf_lum(
        inn(IN_MTYPE), inn(IN_METAL), inn(IN_ROUGH),
        s_nvx, s_nvy, s_nvz, wox, woy, woz, wix, wiy, wiz,
        has_met=has_met,
    )
    cosw = jnp.where(
        prim_delta, 1.0,
        jnp.maximum(_dot3(s_nvx, s_nvy, s_nvz, wix, wiy, wiz), 0.0),
    )
    fc = f * cosw
    ix_ = s_lx * inv_sc * w_big * fc
    iy_ = s_ly * inv_sc * w_big * fc
    iz_ = s_lz * inv_sc * w_big * fc
    res_bad = _bad(r_w) | (r_w < 0.0)
    mask = (gq(GQ_SHADE) > 0.5) & ~res_bad & (scalar > 0.0)
    ix_ = jnp.where(mask, ix_, 0.0)
    iy_ = jnp.where(mask, iy_, 0.0)
    iz_ = jnp.where(mask, iz_, 0.0)
    ind_bad = _bad(ix_) | _bad(iy_) | _bad(iz_)  # zero_nan_or_inf
    ix_ = jnp.where(ind_bad, 0.0, ix_) * gq(GQ_ALB)
    iy_ = jnp.where(ind_bad, 0.0, iy_) * gq(GQ_ALB + 1)
    iz_ = jnp.where(ind_bad, 0.0, iz_) * gq(GQ_ALB + 2)

    # check_validity (restir.h:55-59)
    r_w = jnp.where(res_bad, 0.0, r_w)
    r_m = jnp.where(res_bad, 0.0, r_m)

    def put(i, val):
        q_ref[i, :, :] = val.reshape(cg, 128)

    put(Q_LO, s_lx)
    put(Q_LO + 1, s_ly)
    put(Q_LO + 2, s_lz)
    put(Q_XV, s_xvx)
    put(Q_XV + 1, s_xvy)
    put(Q_XV + 2, s_xvz)
    put(Q_NV, s_nvx)
    put(Q_NV + 1, s_nvy)
    put(Q_NV + 2, s_nvz)
    put(Q_XS, s_xsx)
    put(Q_XS + 1, s_xsy)
    put(Q_XS + 2, s_xsz)
    put(Q_NS, s_nsx)
    put(Q_NS + 1, s_nsy)
    put(Q_NS + 2, s_nsz)
    put(Q_W, r_w)
    put(Q_M, r_m)
    put(Q_PRIM, prim)
    put(Q_GNORM, g_nx)
    put(Q_GNORM + 1, g_ny)
    put(Q_GNORM + 2, g_nz)
    put(Q_DEPTH, depth)
    for i in range(Q_DEPTH + 1, Q_CH):
        put(i, zero)
    ind_ref[0, :, :] = ix_.reshape(cg, 128)
    ind_ref[1, :, :] = iy_.reshape(cg, 128)
    ind_ref[2, :, :] = iz_.reshape(cg, 128)


@functools.partial(jax.jit, static_argnames=(
    "window", "temporal", "temporal_clamp", "has_met", "interpret"))
def gi_resolve_pallas(
    go_pack, in_pack, gq_pack, prev_q, looper,
    window: int = 2048, temporal: bool = True, temporal_clamp: int = 20,
    pix0=0, has_met: bool = True, interpret: bool = False,
):
    """RIS update + temporal merge + clamp + shade over the trace-output
    pack. go_pack/in_pack/gq_pack: [*, R/128, 128]; prev_q: [Q_CH,
    R_prev] flat (previous frame's resolve pack). Returns
    (indirect [3, R/128, 128], resolve pack [Q_CH, R/128, 128])."""
    from .fused_di import _lp2

    g = go_pack.shape[1]
    r = g * 128
    n_tiles = r // 1024
    tg = 8

    kern = functools.partial(
        _gi_resolve_kernel, window=window, temporal=temporal,
        temporal_clamp=temporal_clamp, has_met=has_met,
    )
    q, ind = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((GO_CH, tg, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((IN_CH, tg, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GQ_CH, tg, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # prev resolve pack (HBM)
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((Q_CH, tg, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tg, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((Q_CH, window), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Q_CH, g, 128), jnp.float32),
            jax.ShapeDtypeStruct((3, g, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(go_pack, in_pack, gq_pack, prev_q, _lp2(looper, pix0))
    return ind, q
