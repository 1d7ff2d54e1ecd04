"""A/B the hall shadow-vis work-list granularity: VIS_UNIT=32 (8 DMAs
per [256,128] flush) vs 64 (pair lists, 4 DMAs, ~more tested rows).
Env is read at trace time, so the jit cache is cleared between
variants; timings alternate rounds (cross-process axon noise is
30-50%, in-process alternation is the trustworthy form).

PYTHONPATH=/root/repo:/root/.axon_site python prof/prof_visunit.py
"""
import os
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))), "scenes"))
from make_hall import ensure_assets

ensure_assets()
from restir_tpu import renderer
from restir_tpu.config import DenoiserType, RenderConfig, TracerType, mat_flags
from restir_tpu.scene.loader import parse_scene_file

sf = parse_scene_file(os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scenes", "hall.txt"))
scene = sf.build()
cam = sf.make_camera()
cfg = RenderConfig(width=1920, height=1080, tracer=TracerType.RESTIR_DI,
                   denoiser=DenoiserType.EAW, **mat_flags(scene))


def measure(unit, reps=3):
    os.environ["VIS_UNIT"] = str(unit)
    renderer._step_fused_jit.clear_cache()
    from restir_tpu.ops.pallas import fused_di as fk
    fk.reuse_pallas.clear_cache()
    state = renderer.init_state(cfg, cam, scene)
    t0 = time.time()
    state, frame = renderer.step_jit(scene, state, cam, cfg)
    float(jnp.sum(frame))
    print(f"unit {unit}: compiled {time.time()-t0:.1f}s", flush=True)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(4):
            state, frame = renderer.step_jit(scene, state, cam, cfg)
        float(jnp.sum(frame))
        best = min(best, (time.perf_counter() - t0) / 4)
    print(f"unit {unit}: min {best*1e3:.1f} ms ({1e3/best/1e3:.2f} fps)",
          flush=True)
    return best


for rnd in range(2):
    measure(32)
    measure(64)
