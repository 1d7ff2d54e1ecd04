"""In-CONTEXT ablation of the headline DI step: full renderer.step_jit
with stages toggled via cfg (each variant is its own compiled program,
so deltas measure the stage cost as pipelined in the real step, unlike
the isolated per-kernel timings whose sync overhead double-counts).

PYTHONPATH=/root/repo:/root/.axon_site python prof/prof_ablate.py
"""
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from restir_tpu import renderer
from restir_tpu.config import (DenoiserType, RenderConfig, ReuseMode,
                               TracerType, mat_flags)
from restir_tpu.ops.camera import make_camera
from restir_tpu.scene.procedural import many_light_scene


def sync(x):
    return float(jnp.sum(x))


width, height = 1920, 1080
scene, camkw = many_light_scene(n_lights=64, n_blocks=24)
cam = make_camera(**camkw)
flags = mat_flags(scene)

variants = {
    "full_eaw": dict(denoiser=DenoiserType.EAW),
    "no_denoise": dict(denoiser=DenoiserType.NONE),
    "no_spatial": dict(denoiser=DenoiserType.NONE,
                       reuse=ReuseMode.TEMPORAL),
    "ris_only": dict(denoiser=DenoiserType.NONE, reuse=ReuseMode.NONE),
}

steps = {}
for name, kw in variants.items():
    cfg = RenderConfig(width=width, height=height,
                       tracer=TracerType.RESTIR_DI, **flags, **kw)
    state = renderer.init_state(cfg, cam, scene)
    state, frame = renderer.step_jit(scene, state, cam, cfg)
    sync(frame)
    steps[name] = (cfg, renderer.init_state(cfg, cam, scene))

# interleaved A/B/C/D. step_jit DONATES the state, so the post-step
# state must be threaded back into `steps` each rep (a stale cached
# state would be a deleted jax.Array on rep 1).
times = {k: [] for k in steps}
for rep in range(6):
    for name, (cfg, state) in steps.items():
        st = state
        t0 = time.perf_counter()
        for _ in range(4):
            st, frame = renderer.step_jit(scene, st, cam, cfg)
        sync(frame)
        times[name].append((time.perf_counter() - t0) / 4)
        steps[name] = (cfg, st)
for name, ts in times.items():
    ts = sorted(ts)
    print(f"{name}: min {ts[0]*1e3:.1f} ms  med {ts[len(ts)//2]*1e3:.1f} ms",
          flush=True)
