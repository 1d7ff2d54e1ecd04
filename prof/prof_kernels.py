"""Per-kernel timing of the fused DI pipeline on real TPU.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python /root/repo/prof/prof_kernels.py [hall]
"""
import json
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from restir_tpu import renderer
from restir_tpu.config import DenoiserType, RenderConfig, TracerType
from restir_tpu.ops.camera import make_camera
from restir_tpu.scene.procedural import many_light_scene
from restir_tpu.ops.pallas import fused_di as fk
from restir_tpu.models import restir_di_fused as fused


def sync(x):
    return float(jnp.sum(x))


def timeit(fn, n=8):
    out = fn()
    sync(out if isinstance(out, jnp.ndarray) else jax.tree.leaves(out)[0])
    t = time.perf_counter()
    for _ in range(n):
        out = fn()
    sync(out if isinstance(out, jnp.ndarray) else jax.tree.leaves(out)[0])
    return (time.perf_counter() - t) / n * 1000.0


def main():
    width, height = 1920, 1080
    cfg = RenderConfig(width=width, height=height,
                       tracer=TracerType.RESTIR_DI,
                       denoiser=DenoiserType.EAW)
    if len(sys.argv) > 1 and sys.argv[1] == "hall":
        import os
        sys.path.insert(0, "/root/repo/scenes")
        from make_hall import ensure_assets
        ensure_assets()
        from restir_tpu.scene.loader import parse_scene_file
        sf = parse_scene_file("/root/repo/scenes/hall.txt")
        scene = sf.build()
        cam = sf.make_camera()
    else:
        scene, camkw = many_light_scene(n_lights=64, n_blocks=24)
        cam = make_camera(**camkw)
    from restir_tpu.config import mat_flags
    cfg = cfg.replace(**mat_flags(scene))

    print("tris:", scene.tri_xform.shape[1] // 3,
          "clusters:", scene.cluster_lo.shape[0],
          "lights:", scene.light_verts.shape[0])

    state = renderer.init_state(cfg, cam, scene)
    assert isinstance(state, fused.FusedDIState), "fused path not taken!"
    looper = state.looper
    r = cfg.num_pixels

    cam_vec = fk.pack_camera(cam, width, height)
    lcam_vec = fk.pack_camera(state.last_camera, width, height)

    res = {}

    gb = fk.gbuffer_pack_pallas(
        cam_vec, lcam_vec, looper, scene.tri_xform, scene.prim_attr,
        scene.mat_attr, scene.cluster_lo, scene.cluster_hi,
        width=width, height=height, aa_jitter=cfg.aa_jitter,
        single_sided=cfg.single_sided_lights)
    res["G_ms"] = timeit(lambda: fk.gbuffer_pack_pallas(
        cam_vec, lcam_vec, looper, scene.tri_xform, scene.prim_attr,
        scene.mat_attr, scene.cluster_lo, scene.cluster_hi,
        width=width, height=height, aa_jitter=cfg.aa_jitter,
        single_sided=cfg.single_sided_lights))

    prev = state.pt_pack.reshape(fk.PT_CH, r)
    pt = fk.reuse_pallas(
        gb, prev, looper,
        scene.light_verts, scene.light_normal, scene.light_radiance,
        scene.light_area, scene.light_center, scene.light_radius,
        scene.tri_xform, scene.cluster_lo, scene.cluster_hi,
        scene.sub_lo, scene.sub_hi,
        k=cfg.cdf_candidates, single_sided=cfg.single_sided_lights,
        temporal=True, temporal_clamp=cfg.temporal_clamp,
        has_met=cfg.scene_has_metallic)
    res["R_ms"] = timeit(lambda: fk.reuse_pallas(
        gb, prev, looper,
        scene.light_verts, scene.light_normal, scene.light_radiance,
        scene.light_area, scene.light_center, scene.light_radius,
        scene.tri_xform, scene.cluster_lo, scene.cluster_hi,
        scene.sub_lo, scene.sub_hi,
        k=cfg.cdf_candidates, single_sided=cfg.single_sided_lights,
        temporal=True, temporal_clamp=cfg.temporal_clamp,
        has_met=cfg.scene_has_metallic))

    def run_s():
        acc = jnp.zeros((3, r // 128, 128))
        return fk.spatial_shade_pallas(
            gb, pt, pt.reshape(fk.PT_CH, r), acc, looper, state.iteration,
            width=width, height=height, neighbors=cfg.spatial_neighbors,
            radius=cfg.spatial_radius, accumulate=cfg.accumulate,
            reuse_spatial=True, has_met=cfg.scene_has_metallic)
    res["S_ms"] = timeit(run_s)

    accum = run_s()
    res["EAW_ms"] = timeit(
        lambda: jax.jit(fused.eaw_filter_packed, static_argnames=("cfg",))(
            accum, gb, cfg))

    # full step for reference
    st2 = renderer.init_state(cfg, cam, scene)
    st2, frame = renderer.step_jit(scene, st2, cam, cfg)
    sync(frame)
    t = time.perf_counter()
    n = 8
    for _ in range(n):
        st2, frame = renderer.step_jit(scene, st2, cam, cfg)
    sync(frame)
    res["full_step_ms"] = (time.perf_counter() - t) / n * 1000.0

    print(json.dumps({k: round(v, 2) for k, v in res.items()}))


if __name__ == "__main__":
    main()
