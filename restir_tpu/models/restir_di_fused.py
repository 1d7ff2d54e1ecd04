"""Fused channel-major ReSTIR DI frame (TPU fast path).

Drives the three Pallas kernels in ops/pallas/fused_di.py with a
channel-major state pytree — no [R, 3] / [R, 1] tensor ever exists on
this path, eliminating the ~400 ms/frame of 128x tile-padding traffic
the round-1 whole-frame XLA ops paid (BASELINE.md).

The algorithm is the reference's ReSTIR DI pipeline
(/root/reference/src/restir.cu:111-231) with the same structure as
models/restir_di.py; see fused_di.py for the per-kernel mapping and the
documented deviations (windowed temporal gather, per-tile spatial
offsets).

State layout: everything is [C, R/128, 128] f32. The displayable frame
is the accumulator itself ([3, R/128, 128]); renderer.frame_to_image
accepts this channel-major form directly.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..config import DenoiserType, RenderConfig, ReuseMode, TracerType
from ..ops.camera import Camera
from ..ops.pallas import fused_di as fk
from ..scene.scene_data import SceneData


class FusedDIState(NamedTuple):
    looper: jnp.ndarray  # uint32 scalar
    iteration: jnp.ndarray  # int32 scalar
    accum: jnp.ndarray  # [3, R/128, 128] running-mean direct radiance
    pt_pack: jnp.ndarray  # [PT_CH, R/128, 128] post-temporal reuse pack
    svgf_pack: jnp.ndarray  # [SV_CH, R/128, 128] (or [1,1,1] w/o SVGF)
    accum_ind: jnp.ndarray  # [3, R/128, 128] indirect mean ([1,1,1] DI)
    gi_q: jnp.ndarray  # [Q_CH, R/128, 128] GI resolve pack ([1,1,1] DI)
    last_camera: Camera


def eligible(scene: SceneData, cfg: RenderConfig) -> bool:
    """Static gate for the fused path (everything else falls back to the
    general models/restir_di.py pipeline). RESTIR_GI rides the same
    pipeline with the two GI kernels appended when the GI gate
    (models/restir_gi.gi_resolve_fused_eligible) also passes."""
    from ..ops.intersect import _on_tpu
    from ..models.restir_di import resolve_ris_mode

    if cfg.tracer == TracerType.RESTIR_GI:
        from ..models.restir_gi import gi_resolve_fused_eligible

        if not gi_resolve_fused_eligible(scene, cfg, cfg.num_pixels):
            return False
    elif cfg.tracer != TracerType.RESTIR_DI:
        return False
    return (
        _on_tpu()
        and fk.eligible(cfg, cfg.has_env_map, cfg.with_textures)
        and resolve_ris_mode(cfg) == "cdf"
        and cfg.denoiser in (
            DenoiserType.NONE, DenoiserType.EAW, DenoiserType.SVGF
        )
        # scene geometry is HBM-resident and streamed per cluster, so
        # there is no triangle-count ceiling on this path (the general
        # pipeline's brute/bvh split does not apply).
        # sampler == "pcg4d": documented decision (r4 VERDICT #6) NOT
        # to port Sobol in-kernel this round — the hash-based Owen
        # scramble (utils/sobol.py) is in principle portable (same
        # pattern as the in-kernel pcg4d), but it adds a ~60-op chain
        # per draw site across 6+ sites in the hot kernels for a
        # sampler whose benefit at 1 spp under spatiotemporal reuse is
        # unmeasurable; init_state warns on the fallback instead.
        and cfg.sampler == "pcg4d"
        and cfg.intersector in ("auto", "brute", "clustered")
    )


def ineligibility_reason(scene: SceneData, cfg: RenderConfig):
    """Why a RESTIR_DI/GI config falls off the fused TPU path (None if
    eligible). The fallback is the ~6x slower general pipeline, so
    renderer.init_state logs this once — the reference's single hot
    path (restir.cu:111-231) carries every option at full speed and has
    no silent degradation mode."""
    from ..ops.intersect import _on_tpu
    from ..models.restir_di import resolve_ris_mode

    if cfg.tracer not in (TracerType.RESTIR_DI, TracerType.RESTIR_GI):
        return None  # other tracers have no fused variant to miss
    if eligible(scene, cfg):
        return None
    if not _on_tpu():
        # off-TPU (CPU tests / dev) the general pipeline IS the
        # intended path — nothing to warn about
        return None
    reasons = []
    if cfg.tracer == TracerType.RESTIR_GI:
        from ..models.restir_gi import gi_resolve_fused_eligible

        if not gi_resolve_fused_eligible(scene, cfg, cfg.num_pixels):
            reasons.append("GI resolve gate (gi_resolve_fused_eligible)")
    if not _on_tpu():
        reasons.append("not running on TPU")
    if cfg.enable_dof:
        reasons.append("thin-lens DoF enabled")
    if cfg.width % 128 != 0:
        reasons.append(f"width {cfg.width} not a multiple of 128")
    if cfg.height % 8 != 0:
        reasons.append(f"height {cfg.height} not a multiple of 8")
    if resolve_ris_mode(cfg) != "cdf":
        reasons.append(f"ris_mode resolves to {resolve_ris_mode(cfg)!r}"
                       " (fused path needs 'cdf')")
    if cfg.sampler != "pcg4d":
        reasons.append(f"sampler {cfg.sampler!r} (fused path is pcg4d)")
    if cfg.intersector not in ("auto", "brute", "clustered"):
        reasons.append(f"intersector {cfg.intersector!r}")
    if cfg.denoiser not in (
        DenoiserType.NONE, DenoiserType.EAW, DenoiserType.SVGF
    ):
        reasons.append(f"denoiser {cfg.denoiser}")
    return "; ".join(reasons) or "unknown gate"


def init_state(cfg: RenderConfig, cam: Camera) -> FusedDIState:
    g = cfg.num_pixels // 128
    cam = jax.tree.map(lambda x: jnp.array(x, copy=True), cam)
    if cfg.denoiser == DenoiserType.SVGF:
        svgf = jnp.zeros((fk.SV_CH, g, 128))
        # prim history = NULL so the first frame disoccludes everywhere
        svgf = svgf.at[fk.SV_PRIM].set(-1.0)
    else:
        svgf = jnp.zeros((1, 1, 1))
    if cfg.tracer == TracerType.RESTIR_GI:
        from ..ops.pallas import gi_kernel as gk

        accum_ind = jnp.zeros((3, g, 128))
        gi_q = jnp.zeros((gk.Q_CH, g, 128))
    else:
        accum_ind = jnp.zeros((1, 1, 1))
        gi_q = jnp.zeros((1, 1, 1))
    return FusedDIState(
        looper=jnp.uint32(0),
        iteration=jnp.int32(0),
        accum=jnp.zeros((3, g, 128)),
        pt_pack=jnp.zeros((fk.PT_CH, g, 128)),
        svgf_pack=svgf,
        accum_ind=accum_ind,
        gi_q=gi_q,
        last_camera=cam,
    )


def reset_accumulation(state: FusedDIState) -> FusedDIState:
    svgf = jnp.zeros_like(state.svgf_pack)
    if svgf.shape[0] == fk.SV_CH:
        # prim history = NULL (as in init_state) so the first frame
        # after a reset disoccludes everywhere; 0.0 is a VALID prim id
        # and would alpha-blend stale black history into those pixels
        svgf = svgf.at[fk.SV_PRIM].set(-1.0)
    return state._replace(
        iteration=jnp.int32(0),
        accum=jnp.zeros_like(state.accum),
        pt_pack=jnp.zeros_like(state.pt_pack),
        svgf_pack=svgf,
        accum_ind=jnp.zeros_like(state.accum_ind),
        gi_q=jnp.zeros_like(state.gi_q),
    )


def step_fused(
    scene: SceneData,
    state: FusedDIState,
    cam: Camera,
    cfg: RenderConfig,
    interpret: bool = False,
) -> Tuple[FusedDIState, jnp.ndarray]:
    """One fused frame. Returns (state', frame [3, R/128, 128]).
    `interpret` runs the kernels in the Pallas interpreter (CPU tests)."""
    looper = state.looper
    r = cfg.num_pixels

    cam_vec = fk.pack_camera(cam, cfg.width, cfg.height)
    lcam_vec = fk.pack_camera(state.last_camera, cfg.width, cfg.height)

    has_env = cfg.has_env_map

    n_tri = scene.tri_xform.shape[1] // 3
    if n_tri <= fk._RESIDENT_MAX_TRIS:
        # resident scenes run G + R1 + R2 as ONE fused kernel (two fewer
        # per-frame dispatch floors; bitwise-identical to the split
        # chain — see fused_di._di_resident_kernel)
        gb, pt = fk.di_resident_pallas(
            cam_vec, lcam_vec, looper,
            state.pt_pack.reshape(fk.PT_CH, r),
            scene.tri_xform, scene.prim_attr, scene.mat_attr,
            scene.light_verts, scene.light_normal, scene.light_radiance,
            scene.light_area, scene.light_center, scene.light_radius,
            width=cfg.width, height=cfg.height,
            aa_jitter=cfg.aa_jitter,
            single_sided=cfg.single_sided_lights,
            k=cfg.cdf_candidates,
            temporal=bool(cfg.reuse & ReuseMode.TEMPORAL),
            temporal_clamp=cfg.temporal_clamp,
            has_env=has_env, env_tile_rad=scene.env_tile_rad,
            env_tile_uv=scene.env_tile_uv, env_tile_sa=scene.env_tile_sa,
            with_textures=cfg.with_textures,
            fused_atlas=scene.fused_atlas,
            fused_tex_meta=scene.fused_tex_meta,
            has_met=cfg.scene_has_metallic,
            interpret=interpret,
        )
    else:
        gb = fk.gbuffer_pack_pallas(
            cam_vec, lcam_vec, looper, scene.tri_xform, scene.prim_attr,
            scene.mat_attr, scene.cluster_lo, scene.cluster_hi,
            scene.sub_lo, scene.sub_hi,
            width=cfg.width, height=cfg.height,
            aa_jitter=cfg.aa_jitter, single_sided=cfg.single_sided_lights,
            has_env=has_env, env_tile_rad=scene.env_tile_rad,
            with_textures=cfg.with_textures, fused_atlas=scene.fused_atlas,
            fused_tex_meta=scene.fused_tex_meta,
            interpret=interpret,
        )

        pt = fk.reuse_pallas(
            gb, state.pt_pack.reshape(fk.PT_CH, r), looper,
            scene.light_verts, scene.light_normal, scene.light_radiance,
            scene.light_area, scene.light_center, scene.light_radius,
            scene.tri_xform, scene.cluster_lo, scene.cluster_hi,
            scene.sub_lo, scene.sub_hi,
            k=cfg.cdf_candidates, single_sided=cfg.single_sided_lights,
            temporal=bool(cfg.reuse & ReuseMode.TEMPORAL),
            temporal_clamp=cfg.temporal_clamp,
            has_env=has_env, env_tile_rad=scene.env_tile_rad,
            env_tile_uv=scene.env_tile_uv, env_tile_sa=scene.env_tile_sa,
            has_met=cfg.scene_has_metallic,
            interpret=interpret,
        )

    accum = fk.spatial_shade_pallas(
        gb, pt, pt.reshape(fk.PT_CH, r), state.accum, looper,
        state.iteration, width=cfg.width, height=cfg.height,
        neighbors=cfg.spatial_neighbors, radius=cfg.spatial_radius,
        accumulate=cfg.accumulate,
        reuse_spatial=bool(cfg.reuse & ReuseMode.SPATIAL),
        has_met=cfg.scene_has_metallic,
        interpret=interpret,
    )

    accum_ind = state.accum_ind
    gi_q = state.gi_q
    if cfg.tracer == TracerType.RESTIR_GI:
        ind, gi_q = _gi_stage(scene, gb, state.gi_q, cfg, looper,
                              interpret=interpret)
        it_f = state.iteration.astype(jnp.float32)
        if cfg.accumulate:
            accum_ind = (state.accum_ind * it_f + ind) / (it_f + 1.0)
        else:
            accum_ind = ind
        frame = accum + accum_ind
    else:
        frame = accum

    svgf_pack = state.svgf_pack
    if cfg.denoiser == DenoiserType.EAW:
        frame = eaw_filter_packed(frame, gb, cfg, interpret=interpret)
    elif cfg.denoiser == DenoiserType.SVGF:
        frame, svgf_pack = svgf_filter_packed(
            frame, gb, state.svgf_pack, cfg, interpret=interpret
        )

    next_state = FusedDIState(
        looper=looper + jnp.uint32(1),
        iteration=state.iteration + 1,
        accum=accum,
        pt_pack=pt,
        svgf_pack=svgf_pack,
        accum_ind=accum_ind,
        gi_q=gi_q,
        last_camera=cam,
    )
    return next_state, frame


def _gi_stage(scene, gb, gi_q, cfg: RenderConfig, looper,
              interpret: bool = False):
    """ReSTIR GI over the fused G-buffer pack: the trace and resolve
    kernels consume gb-pack channel rows directly (no [R, 3] structs,
    no band split — reference ReSTIRIndirectKernel restir.cu:242-416).
    Returns (indirect radiance [3, R/128, 128], next resolve pack)."""
    from ..ops.pallas import gi_kernel as gk

    g = gb.shape[1]
    r = g * 128

    # per-pixel ior from the material table via matId where-chains (the
    # gb pack carries type/metal/rough but not ior; the table is tiny)
    matid = gb[fk.G_PRIMR]
    ior = jnp.zeros_like(matid)
    for mi in range(scene.mat_attr.shape[0]):
        ior = jnp.where(matid == float(mi), scene.mat_attr[mi, 6], ior)

    zero1 = jnp.zeros((1, g, 128), jnp.float32)
    in_pack = jnp.concatenate([
        gb[fk.G_POS:fk.G_POS + 3],
        gb[fk.G_NORM:fk.G_NORM + 3],
        gb[fk.G_DIR:fk.G_DIR + 3],
        gb[fk.G_MTYPE:fk.G_MTYPE + 1],
        gb[fk.G_METAL:fk.G_METAL + 1],
        gb[fk.G_ROUGH:fk.G_ROUGH + 1],
        ior[None],
        gb[fk.G_SHADE:fk.G_SHADE + 1],  # alive = valid & ~is_light
        zero1, zero1,
    ], axis=0)
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
    gq = jnp.concatenate([
        gb[fk.G_MOTION:fk.G_MOTION + 1],
        gb[fk.G_PRIMR:fk.G_PRIMR + 1],
        gb[fk.G_DEPTH:fk.G_DEPTH + 1],
        gb[fk.G_NORM:fk.G_NORM + 3],
        gb[fk.G_ALB:fk.G_ALB + 3],
        gb[fk.G_SHADE:fk.G_SHADE + 1],
    ], axis=0)
    return gk.gi_resolve_pallas(
        go, in_pack, gq, gi_q.reshape(gk.Q_CH, r), looper,
        temporal=bool(cfg.reuse & ReuseMode.TEMPORAL),
        temporal_clamp=cfg.temporal_clamp,
        has_met=cfg.scene_has_metallic, interpret=interpret,
    )


def _atrous_bands(cfg: RenderConfig, c_in: int):
    """Per-level Pallas band sizes (entries are None for levels whose
    window can't fit the VMEM budget — those levels run the XLA plane
    fallback; the rest stay Pallas). Returns None when the whole chain
    must be XLA (width not lane-aligned)."""
    from ..ops.pallas import atrous_kernel as ak

    if cfg.width % 128 != 0:
        return None
    g = cfg.num_pixels // 128
    return [ak.pick_band(g, 1 << lv, cfg.width // 128, c_in)
            for lv in range(cfg.eaw_levels)]


def _guide_pack(gb_pack: jnp.ndarray) -> jnp.ndarray:
    """[7, R/128, 128] à-trous guide channels (prim remap, normal, pos)
    in the atrous_kernel A_* layout."""
    return jnp.concatenate([
        gb_pack[fk.G_PRIMR:fk.G_PRIMR + 1],
        gb_pack[fk.G_NORM:fk.G_NORM + 3],
        gb_pack[fk.G_POS:fk.G_POS + 3],
    ], axis=0)


def eaw_filter_packed(
    frame: jnp.ndarray,  # [3, R/128, 128]
    gb_pack: jnp.ndarray,  # [GB_CH, R/128, 128]
    cfg: RenderConfig,
    interpret: bool = False,
    use_pallas: bool = True,
) -> jnp.ndarray:
    """EAW à-trous filter on channel-major planes. The hot path runs
    each level as a Pallas row-band kernel (ops/pallas/atrous_kernel.py,
    VERDICT r3 next-#3: the XLA plane shifts were 23 ms of the 1080p
    frame); the XLA plane core in models/denoiser.py remains the
    fallback AND the sharded path (plane shifts partition under
    NamedSharding with automatic halos — parallel/fused_sharding.py
    passes use_pallas=False)."""
    from . import denoiser as dn
    from ..ops.pallas import atrous_kernel as ak

    h, w = cfg.height, cfg.width

    albedo = jnp.maximum(gb_pack[fk.G_ALB:fk.G_ALB + 3], 0.0)
    if cfg.modulate_albedo:
        safe = jnp.where(albedo > 1e-4, albedo, 1.0)
        color = frame / safe
    else:
        safe = jnp.ones_like(albedo)
        color = frame

    g = cfg.num_pixels // 128
    bands = _atrous_bands(cfg, ak.C_EAW) if use_pallas else None
    guide = _guide_pack(gb_pack) if bands is not None else None

    def plane(i):
        return gb_pack[i].reshape(h, w)

    def planes3(i):
        return gb_pack[i:i + 3].reshape(3, h, w)

    gb_planes = (plane(fk.G_PRIMR), planes3(fk.G_NORM), planes3(fk.G_POS))
    for level in range(cfg.eaw_levels):
        if bands is not None and bands[level] is not None:
            inp = jnp.concatenate([color, guide], axis=0)
            color = ak.atrous_level_pallas(
                inp, mode="eaw", level=level, width=w, height=h,
                band=bands[level], sig_l=cfg.sig_luminance,
                sig_n=cfg.sig_normal, sig_d=cfg.sig_depth,
                interpret=interpret)
        else:
            color = dn.eaw_filter_level(
                color.reshape(3, h, w), gb_planes, cfg, level
            ).reshape(3, g, 128)
    return color * safe


def svgf_filter_packed(
    frame: jnp.ndarray,  # [3, R/128, 128] modulated running-mean
    gb_pack: jnp.ndarray,  # [GB_CH, R/128, 128]
    svgf_prev: jnp.ndarray,  # [SV_CH, R/128, 128]
    cfg: RenderConfig,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """SVGF on channel-major planes (denoiser.cu:479-568): the temporal
    accumulation runs as a Pallas kernel (windowed motion gather, see
    fused_di.svgf_temporal_pallas); variance estimation and the
    variance-guided wavelet chain reuse the plane-based core in
    models/denoiser.py. Returns (filtered frame, next svgf pack) — the
    color history fed forward is the level-0 wavelet output
    (denoiser.cu:542-543)."""
    demod, safe = _svgf_demod(frame, gb_pack, cfg)
    sv = fk.svgf_temporal_pallas(
        gb_pack, demod, svgf_prev.reshape(fk.SV_CH, cfg.num_pixels),
        interpret=interpret,
    )
    return _svgf_wavelets(sv, gb_pack, safe, cfg, interpret=interpret)


def _svgf_demod(frame, gb_pack, cfg: RenderConfig):
    albedo = jnp.maximum(gb_pack[fk.G_ALB:fk.G_ALB + 3], 0.0)
    if cfg.modulate_albedo:
        safe = jnp.where(albedo > 1e-4, albedo, 1.0)
        return frame / safe, safe
    return frame, jnp.ones_like(albedo)


def _svgf_wavelets(sv, gb_pack, safe, cfg: RenderConfig,
                   interpret: bool = False, use_pallas: bool = True):
    """Variance estimate + variance-guided wavelet chain on the
    temporally-accumulated svgf pack. The hot path runs each wavelet
    level as a Pallas row-band kernel (variance estimate and the 3x3
    variance prefilter stay XLA — single-channel 3x3s, not the tax);
    the XLA plane chain remains the fallback and the sharded path
    (use_pallas=False from parallel/fused_sharding.py, where the plane
    shifts partition under NamedSharding with automatic row halos)."""
    from . import denoiser as dn
    from ..ops.pallas import atrous_kernel as ak

    h, w = cfg.height, cfg.width
    g = cfg.num_pixels // 128

    moments = sv[fk.SV_M1:fk.SV_M1 + 3].reshape(3, h, w)
    var = dn.svgf_estimate_variance(moments).reshape(1, g, 128)
    color = sv[fk.SV_COL:fk.SV_COL + 3]

    bands = _atrous_bands(cfg, ak.C_SVGF) if use_pallas else None
    guide = _guide_pack(gb_pack) if bands is not None else None

    def plane(i):
        return gb_pack[i].reshape(h, w)

    def planes3(i):
        return gb_pack[i:i + 3].reshape(3, h, w)

    gb_planes = (plane(fk.G_PRIMR), planes3(fk.G_NORM), planes3(fk.G_POS))
    history = color
    for level in range(cfg.eaw_levels):
        if bands is not None and bands[level] is not None:
            fv = dn.svgf_filter_variance(
                var.reshape(h, w)).reshape(1, g, 128)
            inp = jnp.concatenate([color, guide, var, fv], axis=0)
            out = ak.atrous_level_pallas(
                inp, mode="svgf", level=level, width=w, height=h,
                band=bands[level], sig_l=cfg.sig_luminance,
                sig_n=cfg.svgf_sig_normal, sig_d=cfg.svgf_sig_depth,
                interpret=interpret)
            color, var = out[0:3], out[3:4]
        else:
            c_hw, v_hw = dn.svgf_wavelet_level(
                color.reshape(3, h, w), var.reshape(h, w), gb_planes,
                cfg, level)
            color = c_hw.reshape(3, g, 128)
            var = v_hw.reshape(1, g, 128)
        if level == 0:
            history = color
    next_sv = sv.at[fk.SV_COL:fk.SV_COL + 3].set(history)
    return color * safe, next_sv
