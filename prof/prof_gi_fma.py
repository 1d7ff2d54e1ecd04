"""A/B the GI hit-test forms on the bench-class many-light scene:
chunked VPU-FMA vs 3-pass bf16-split dots (timing + closeness).
The 3-way BIAS check against the exact-f32 XLA tracer lives in
tests/test_gi_fused.py::test_gi_trace_fma_matches_f32_reference
(BASELINE r5: dots measured ~3% low via shared-edge cracks).

PYTHONPATH=/root/repo:/root/.axon_site python prof/prof_gi_fma.py
"""
import functools, time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
from restir_tpu.config import RenderConfig, TracerType, mat_flags
from restir_tpu.models import gbuffer as gbuf
from restir_tpu.models import restir_gi
from restir_tpu.ops.camera import make_camera
from restir_tpu.scene.procedural import many_light_scene

width, height = 1920, 1080
scene, camkw = many_light_scene(n_lights=64, n_blocks=24)
cfg = RenderConfig(width=width, height=height, tracer=TracerType.RESTIR_GI,
                   **mat_flags(scene))
cam = make_camera(**camkw)
looper = jnp.uint32(1)
gb, it, mat, ray_dir = jax.jit(
    gbuf.render_gbuffer, static_argnames=("cfg",))(
        scene, cam, cam, cfg, looper)
float(jnp.sum(gb.depth))
in_pack = restir_gi._build_gi_in_pack(it, mat, ray_dir)
from restir_tpu.ops.pallas import gi_kernel as gk

@functools.partial(jax.jit, static_argnames=("fma",))
def trace(in_pack, looper, fma):
    return gk.gi_trace_pallas(
        in_pack, looper, scene.tri_xform, scene.prim_attr,
        scene.mat_attr, scene.light_prob, scene.light_alias,
        scene.light_prim_ids, scene.light_radiance,
        scene.sum_light_power_inv,
        depth=cfg.trace_depth, single_sided=cfg.single_sided_lights,
        n_lights=int(scene.light_prob.shape[0]), hit_fma=fma,
        has_met=cfg.scene_has_metallic, has_die=cfg.scene_has_dielectric)

import numpy as np
outs = {}
for fma in (False, True):
    t0 = time.time()
    outs[fma] = trace(in_pack, looper, fma)
    float(jnp.sum(outs[fma]))
    print(f"fma={fma}: compiled {time.time()-t0:.1f}s", flush=True)
a, b_ = np.asarray(outs[False]), np.asarray(outs[True])
m = np.isclose(a, b_, rtol=2e-3, atol=1e-4).mean()
print(f"closeness: {m:.4f}", flush=True)
times = {f: [] for f in (False, True)}
for rep in range(5):
    for fma in (False, True):
        t0 = time.perf_counter()
        for _ in range(3):
            out = trace(in_pack, looper, fma)
        float(jnp.sum(out))
        times[fma].append((time.perf_counter() - t0) / 3)
for fma, ts in times.items():
    print(f"fma={fma}: min {min(ts)*1e3:.1f} ms", flush=True)
