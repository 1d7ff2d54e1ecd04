"""ReSTIR GI: reservoir resampling of indirect-lighting path samples.

TPU re-design of /root/reference/src/restir.cu:242-416
(`ReSTIRIndirectKernel` — the reference implements it fully but leaves it
commented out of the frame loop, main.cpp:168; here it is a first-class
tracer mode). Per pixel and frame:

  1. trace ONE path from the shared primary hit: the depth-1 BSDF bounce
     defines the sample's visible point xv/nv (primary hit) and sample
     point xs/ns (secondary hit); its pdf is kept OUT of the reservoir
     target (restir.cu:313-322) — RIS re-weights by 1/primSamplePdf;
  2. accumulate the path's outgoing radiance Lo at xs: NEE (depth >= 2)
     with MIS + BSDF bounces + env/light hits with MIS
     (restir.cu:283-373);
  3. reservoir update with w = luminance(Lo) / primSamplePdf, NaN/neg
     zeroed at the source (restir.cu:375-385);
  4. temporal merge via motion-vector gather + M-clamp at 20
     (restir.cu:387-397);
  5. shade: Lo/luminance(Lo) * W/M * f(nv, wo, wi) * cos (restir.cu:399-408).

The divergent `break`s of the CUDA path loop become masked lanes of a
statically-unrolled bounce loop, same shape as models/path_tracer.py.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import RenderConfig, ReuseMode
from ..ops import bsdf as bsdf_ops
from ..ops import intersect as ix
from ..ops import lights as light_ops
from ..ops import reservoir as rsv
from ..ops import surface as surf
from ..ops.primary import trace_primary
from ..ops.texture import env_sample_bilinear
from ..scene.scene_data import DIELECTRIC, LIGHT, SceneData, traversal_arrays
from ..utils import math as mathx
from ..utils import rng as rngmod
from .gbuffer import LIGHT_ID, GBufferFrame
from .restir_di import find_temporal_neighbor

_CTR_UPDATE = 0
_CTR_TEMPORAL = 1
_CTR_PATH = 2  # two slots (NEE 4D, BSDF 3D) per bounce


def _p_hat_gi(sample: rsv.IndirectSample) -> jnp.ndarray:
    """Target p̂ = Lo (restir.cu:233-236 uses the Lo-only variant)."""
    return mathx.luminance(sample.lo)


def gi_fused_eligible(scene: SceneData, cfg: RenderConfig,
                      r: int) -> bool:
    """Static gate for the fused GI trace kernel
    (ops/pallas/gi_kernel.py): VMEM-resident geometry, pcg4d streams,
    no env map, no loaded textures (procedural base colors ARE
    handled in-kernel), whole 1024-ray tiles."""
    return (
        cfg.sampler == "pcg4d"
        and not cfg.has_env_map
        and not cfg.with_textures
        and scene.tex_data.shape[0] <= 1  # dummy [1, 3] when untextured
        and scene.verts.shape[0] <= 1024
    )


def _build_gi_in_pack(it, mat, ray_dir):
    """[IN_CH, R/128, 128] trace-kernel input pack from the primary-hit
    structs (pads partial 1024-ray tiles)."""
    from ..ops.pallas import gi_kernel as gk

    r = it.pos.shape[0]
    rp = -(-r // 1024) * 1024  # kernel tiles are 1024 rays
    alive = it.valid & (mat.type != LIGHT)
    zeros = jnp.zeros((r,), jnp.float32)
    rows = [
        it.pos[:, 0], it.pos[:, 1], it.pos[:, 2],
        it.norm[:, 0], it.norm[:, 1], it.norm[:, 2],
        ray_dir[:, 0], ray_dir[:, 1], ray_dir[:, 2],
        mat.type.astype(jnp.float32), mat.metallic, mat.roughness,
        mat.ior, alive.astype(jnp.float32), zeros, zeros,
    ]
    in_pack = jnp.stack(rows, axis=0)
    if rp != r:
        in_pack = jnp.concatenate(
            [in_pack, jnp.zeros((gk.IN_CH, rp - r), jnp.float32)], axis=1
        )
    return in_pack.reshape(gk.IN_CH, rp // 128, 128)


def trace_gi_sample_fused(
    scene: SceneData,
    it,
    mat,
    ray_dir,
    cfg: RenderConfig,
    looper,
    pix0,
    interpret: bool = False,
):
    """Fused-kernel twin of trace_gi_sample (lane-for-lane parity
    asserted in tests/test_gi_fused.py). `pix0` is the global index of
    the first ray (band slices are contiguous)."""
    from ..ops.pallas import gi_kernel as gk

    r = it.pos.shape[0]
    in_pack = _build_gi_in_pack(it, mat, ray_dir)
    out = gk.gi_trace_pallas(
        in_pack, looper, scene.tri_xform, scene.prim_attr,
        scene.mat_attr, scene.light_prob, scene.light_alias,
        scene.light_prim_ids, scene.light_radiance,
        scene.sum_light_power_inv,
        depth=cfg.trace_depth, single_sided=cfg.single_sided_lights,
        n_lights=int(scene.light_prob.shape[0]), pix0=pix0,
        has_met=cfg.scene_has_metallic, has_die=cfg.scene_has_dielectric,
        has_proc=cfg.scene_has_procedural,
        interpret=interpret,
    )

    def ch3(i):
        return jnp.stack(
            [out[i + k].reshape(-1)[:r] for k in range(3)], axis=-1
        )

    lo = mathx.zero_nan_or_inf(ch3(gk.GO_LO))
    xs = ch3(gk.GO_XS)
    sample = rsv.IndirectSample(
        lo=lo, xv=it.pos, nv=ch3(gk.GO_NV), xs=xs, ns=ch3(gk.GO_NS),
    )
    prim_pdf = out[gk.GO_PDF].reshape(-1)[:r]
    prim_delta = out[gk.GO_DELTA].reshape(-1)[:r] > 0.5
    valid = (mathx.luminance(lo) >= 1e-8) & (
        mathx.length(xs - it.pos) > 0.0
    )
    return sample, prim_pdf, prim_delta, valid


def trace_gi_sample(
    scene: SceneData,
    it,  # primary Interaction
    mat,  # primary SurfaceMaterial
    ray_dir,
    cfg: RenderConfig,
    looper,
    pix,
) -> Tuple[rsv.IndirectSample, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Trace one indirect path sample per pixel.

    Returns (sample, prim_sample_pdf [R], prim_delta [R] bool,
    valid [R] bool).
    """
    from ..ops.intersect import _on_tpu

    if gi_fused_eligible(scene, cfg, pix.shape[0]) and _on_tpu():
        # band slices are contiguous: pix[0] is the global base index
        return trace_gi_sample_fused(
            scene, it, mat, ray_dir, cfg, looper, pix[0]
        )

    trv = traversal_arrays(scene, cfg.intersector)
    R = pix.shape[0]  # may be a band slice of the frame

    # Bounce loop as lax.scan (bounded carry — see path_tracer.pt_trace):
    # depth-1 bookkeeping (xv/nv/xs/ns, primary pdf) is handled with
    # `where(depth == 1)` selects inside the scanned body.
    def bounce(carry, depth):
        (lo, nv, xs, ns, prim_pdf, prim_delta, alive, throughput,
         pos, norm, wo, cur_mat) = carry
        first = depth == 1

        delta_bsdf = cur_mat.type == DIELECTRIC
        norm = jnp.where(
            (~delta_bsdf & (mathx.dot(norm, wo) < 0))[..., None], -norm, norm
        )
        # xv's normal after the orientation fix (restir.cu:286-288,321)
        nv = jnp.where(first, norm, nv)

        ctr = _CTR_PATH + (depth - 1) * 2
        # --- NEE from depth >= 2 (restir.cu:290-300)
        l1, l2, l3, l4 = rngmod.uniform4(pix, looper, ctr, rngmod.SALT_GI)
        shade = alive & ~delta_bsdf & ~first
        ls = light_ops.sample_direct_light(
            scene, trv, pos, l1, l2, l3, l4,
            has_env=cfg.has_env_map, single_sided=cfg.single_sided_lights,
            active=shade,
        )
        f = bsdf_ops.eval_bsdf(cur_mat, norm, wo, ls.wi)
        bsdf_pdf = bsdf_ops.pdf_bsdf(cur_mat, norm, wo, ls.wi)
        mis_w = mathx.power_heuristic(ls.pdf, bsdf_pdf)
        nee = (
            throughput * f * ls.radiance
            * (mathx.sat_dot(norm, ls.wi) * mis_w
               / jnp.maximum(ls.pdf, 1e-20))[..., None]
        )
        lo = lo + jnp.where((shade & (ls.pdf > 0))[..., None], nee, 0.0)

        # --- BSDF bounce (restir.cu:302-325)
        b1, b2, b3, _ = rngmod.uniform4(pix, looper, ctr + 1, rngmod.SALT_GI)
        bs = bsdf_ops.sample_bsdf(cur_mat, norm, wo, (b1, b2, b3))
        ok = alive & ~bsdf_ops.is_invalid(bs.type) & (bs.pdf >= 1e-8)
        delta_sample = bsdf_ops.is_delta(bs.type)

        prim_pdf = jnp.where(first & ok, bs.pdf, prim_pdf)
        prim_delta = jnp.where(first & ok, delta_sample, prim_delta)
        weight = jnp.where(delta_sample, 1.0, mathx.abs_dot(norm, bs.wi))
        throughput = jnp.where(
            (ok & ~first)[..., None],
            throughput * bs.f * (weight / jnp.maximum(bs.pdf, 1e-20))[..., None],
            throughput,
        )
        alive = ok

        ro, rd = ix.make_offseted_ray(pos, bs.wi)
        new_it, new_mat, hit = trace_primary(
            scene, trv, ro, rd, cfg.with_textures, active=alive
        )

        # env miss with MIS (restir.cu:331-342)
        if cfg.has_env_map:
            env_r = env_sample_bilinear(scene.env_map, mathx.to_plane(rd))
            env_pdf = light_ops.env_map_pdf(scene, rd)
            w = jnp.where(delta_sample, 1.0, mathx.power_heuristic(bs.pdf, env_pdf))
            hit_env = alive & ~new_it.valid
            lo = lo + jnp.where(
                hit_env[..., None], env_r * throughput * w[..., None], 0.0
            )
        alive = alive & new_it.valid

        # light hit with MIS (restir.cu:345-367)
        hit_light = alive & (new_mat.type == LIGHT)
        front = mathx.dot(new_it.norm, rd) < 0
        lit = hit_light & front if cfg.single_sided_lights else hit_light
        le = new_mat.base_color
        light_pdf_area = (
            mathx.luminance(le) * 2.0 * mathx.PI * scene.sum_light_power_inv
        )
        light_pdf = mathx.pdf_area_to_solid_angle(
            light_pdf_area, pos, new_it.pos, new_it.norm
        )
        w = jnp.where(
            delta_sample | first,
            1.0,
            mathx.power_heuristic(bs.pdf, light_pdf),
        )
        lo = lo + jnp.where(lit[..., None], le * throughput * w[..., None], 0.0)

        # record the sample point whether light or surface (restir.cu:362-372)
        got = first & ok & new_it.valid
        xs = jnp.where(got[..., None], new_it.pos, xs)
        ns = jnp.where(got[..., None], new_it.norm, ns)

        alive = alive & ~hit_light
        return (
            lo, nv, xs, ns, prim_pdf, prim_delta, alive, throughput,
            new_it.pos, new_it.norm, -rd, new_mat,
        ), None

    xv = it.pos
    init = (
        jnp.zeros((R, 3)), it.norm, jnp.zeros((R, 3)), jnp.zeros((R, 3)),
        jnp.ones((R,)), jnp.zeros((R,), bool),
        it.valid & (mat.type != LIGHT), jnp.ones((R, 3)),
        it.pos, it.norm, -ray_dir, mat,
    )
    depths = jnp.arange(1, cfg.trace_depth + 1)
    (lo, nv, xs, ns, prim_pdf, prim_delta, *_), _ = jax.lax.scan(
        bounce, init, depths
    )

    sample = rsv.IndirectSample(
        lo=mathx.zero_nan_or_inf(lo), xv=xv, nv=nv, xs=xs, ns=ns
    )
    # invalid() == luminance(Lo) < 1e-8 (restir.h:16-18); also require a
    # recorded secondary point
    valid = (mathx.luminance(sample.lo) >= 1e-8) & (
        mathx.length(xs - xv) > 0.0
    )
    return sample, prim_pdf, prim_delta, valid


def gi_resolve_fused_eligible(scene: SceneData, cfg: RenderConfig,
                              r: int) -> bool:
    """Static gate for the FULLY fused GI pipeline (trace kernel +
    resolve kernel, no whole-frame [R, 3] reservoir ops): the trace
    kernel's eligibility plus whole 1024-ray frames. The windowed
    temporal gather inherits the fused-DI deviation (pixels whose
    motion index falls outside the 2048-window lose temporal reuse)."""
    return gi_fused_eligible(scene, cfg, r) and r % 1024 == 0


def restir_indirect_fused(
    scene: SceneData,
    gb: GBufferFrame,
    it,
    mat,
    ray_dir,
    q_prev: jnp.ndarray,  # [Q_CH, R] flat resolve pack
    cfg: RenderConfig,
    looper,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fully fused ReSTIR GI frame: the trace kernel's output pack feeds
    the resolve kernel (RIS + windowed temporal merge + clamp + shade)
    directly — no [R, 3] reservoir ops, no band split (reference: one
    fused ReSTIRIndirectKernel, restir.cu:242-416). Returns (indirect
    [R, 3], next resolve pack [Q_CH, R])."""
    from ..ops.pallas import gi_kernel as gk

    r = it.pos.shape[0]
    in_pack = _build_gi_in_pack(it, mat, ray_dir)
    go = gk.gi_trace_pallas(
        in_pack, looper, scene.tri_xform, scene.prim_attr,
        scene.mat_attr, scene.light_prob, scene.light_alias,
        scene.light_prim_ids, scene.light_radiance,
        scene.sum_light_power_inv,
        depth=cfg.trace_depth, single_sided=cfg.single_sided_lights,
        n_lights=int(scene.light_prob.shape[0]), pix0=0,
        has_met=cfg.scene_has_metallic, has_die=cfg.scene_has_dielectric,
        has_proc=cfg.scene_has_procedural,
        interpret=interpret,
    )
    shade = it.valid & (gb.prim_id != LIGHT_ID)
    gq = jnp.stack([
        gb.motion.astype(jnp.float32), gb.prim_id.astype(jnp.float32),
        gb.depth, gb.norm[:, 0], gb.norm[:, 1], gb.norm[:, 2],
        gb.albedo[:, 0], gb.albedo[:, 1], gb.albedo[:, 2],
        shade.astype(jnp.float32),
    ], axis=0).reshape(gk.GQ_CH, r // 128, 128)
    ind, q = gk.gi_resolve_pallas(
        go, in_pack, gq, q_prev, looper,
        temporal=bool(cfg.reuse & ReuseMode.TEMPORAL),
        temporal_clamp=cfg.temporal_clamp,
        has_met=cfg.scene_has_metallic, interpret=interpret,
    )
    return ind.reshape(3, r).T, q.reshape(gk.Q_CH, r)


def init_gi_resolve_pack(r: int) -> jnp.ndarray:
    """Zeroed [Q_CH, R] resolve pack. Zeros are a safe empty history:
    the stored normal (0,0,0) fails the |dot| >= 0.9 similarity test, so
    the first frame never merges it."""
    from ..ops.pallas import gi_kernel as gk

    return jnp.zeros((gk.Q_CH, r), jnp.float32)


def restir_indirect(
    scene: SceneData,
    gb: GBufferFrame,
    last_gb: GBufferFrame,
    it,
    mat,
    ray_dir,
    res_in: rsv.Reservoir,
    cfg: RenderConfig,
    looper,
    pix=None,
) -> Tuple[jnp.ndarray, rsv.Reservoir]:
    """One ReSTIR GI frame. Returns (indirect radiance [R,3], reservoir
    for the next frame's temporal pass).

    `pix` (global pixel indices) enables band-sliced calls: every other
    per-pixel input is then the matching slice, while `res_in` and
    `last_gb` stay full-frame (the temporal motion gather may index any
    previous pixel). RNG streams use the global indices, so a banded
    render is bit-identical to a whole-frame one.

    When `res_in` is a raw [Q_CH, R] array (the fused resolve pack the
    renderer's init_state builds on eligible TPU configs), the whole
    frame routes through the fully fused kernel pipeline instead."""
    if isinstance(res_in, jnp.ndarray):
        assert pix is None, "fused GI is whole-frame (no band split)"
        return restir_indirect_fused(
            scene, gb, it, mat, ray_dir, res_in, cfg, looper
        )
    if pix is None:
        pix = jnp.arange(cfg.num_pixels, dtype=jnp.uint32)
    R = pix.shape[0]

    sample, prim_pdf, prim_delta, valid = trace_gi_sample(
        scene, it, mat, ray_dir, cfg, looper, pix
    )

    # RIS weight (restir.cu:375-385)
    w = _p_hat_gi(sample) / jnp.maximum(prim_pdf, 1e-20)
    w = jnp.where(mathx.is_nan_or_inf(w) | (w < 0) | ~valid, 0.0, w)

    r_upd = rngmod.uniform1(pix, looper, _CTR_UPDATE, rngmod.SALT_GI)
    res = rsv.update(rsv.zeros_indirect(int(R)), sample, w, r_upd)

    if cfg.reuse & ReuseMode.TEMPORAL:
        temporal, ok = find_temporal_neighbor(res_in, gb, last_gb)
        ok = ok & ~rsv.invalid(temporal)
        r_t = rngmod.uniform1(pix, looper, _CTR_TEMPORAL, rngmod.SALT_GI)
        res = rsv.merge(res, temporal, r_t, active=ok)

    res = rsv.clamp(res, jnp.int32(cfg.temporal_clamp))  # restir.cu:397

    # shade at the primary hit (restir.cu:399-408); demodulated material
    dmat = mat._replace(base_color=jnp.ones_like(mat.base_color))
    s = res.sample
    prim_wi = mathx.safe_normalize(s.xs - s.xv)
    wo = -ray_dir
    scalar = mathx.luminance(s.lo)
    w_big = res.weight / jnp.maximum(res.m.astype(jnp.float32), 1.0)
    indirect = s.lo / jnp.maximum(scalar, 1e-20)[..., None] * w_big[..., None]
    f = bsdf_ops.eval_bsdf(dmat, s.nv, wo, prim_wi)
    cosw = jnp.where(prim_delta, 1.0, mathx.sat_dot(s.nv, prim_wi))
    indirect = indirect * f * cosw[..., None]

    shade = it.valid & (gb.prim_id != LIGHT_ID)
    indirect = jnp.where(
        (shade & ~rsv.invalid(res) & (scalar > 0))[..., None], indirect, 0.0
    )
    indirect = mathx.zero_nan_or_inf(indirect)

    return indirect * gb.albedo, rsv.check_validity(res)
