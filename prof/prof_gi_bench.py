"""End-to-end RESTIR_GI at 1080p on the BENCH-CLASS many-light scene
(mixed Lambertian/metallic/dielectric — the honest GI workload,
VERDICT r4 #3). Interleaved A/B vs the cornell-box scene for the
specialization delta.

PYTHONPATH=/root/repo:/root/.axon_site python prof/prof_gi_bench.py
"""
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from restir_tpu import renderer
from restir_tpu.config import RenderConfig, TracerType, mat_flags
from restir_tpu.ops.camera import make_camera
from restir_tpu.scene.procedural import cornell_box, many_light_scene

width, height = 1920, 1080

scenes = {}
s1, ck1 = many_light_scene(n_lights=64, n_blocks=24)
scenes["many_light"] = (s1, make_camera(**ck1))
s2, ck2 = cornell_box()
scenes["cornell"] = (s2, make_camera(**ck2))

steps = {}
for name, (scene, cam) in scenes.items():
    cfg = RenderConfig(width=width, height=height,
                       tracer=TracerType.RESTIR_GI, **mat_flags(scene))
    state = renderer.init_state(cfg, cam, scene)
    t0 = time.time()
    state, frame = renderer.step_jit(scene, state, cam, cfg)
    float(jnp.sum(frame))
    print(f"{name}: compiled {time.time()-t0:.1f}s "
          f"(fused={type(state).__name__})", flush=True)
    steps[name] = (cfg, scene, cam, state)

times = {k: [] for k in steps}
for rep in range(5):
    for name in steps:
        cfg, scene, cam, st = steps[name]
        t0 = time.perf_counter()
        for _ in range(3):
            st, frame = renderer.step_jit(scene, st, cam, cfg)
        float(jnp.sum(frame))
        times[name].append((time.perf_counter() - t0) / 3)
        steps[name] = (cfg, scene, cam, st)
for name, ts in times.items():
    ts = sorted(ts)
    print(f"{name}: min {ts[0]*1e3:.1f} ms ({1.0/ts[0]:.2f} fps)  "
          f"med {ts[len(ts)//2]*1e3:.1f} ms", flush=True)
