"""Decompose the resident DI mega-kernel (G+R1+R2) at 1080p:
interleaved in-process A/B of (a) the full 426-tri headline scene,
(b) the same kernel with the tri tables truncated to 32 tris (the hit
and vis fori loops shrink ~13x -> lower-bounds the non-geometry work:
raygen + epilogue + RIS chain + temporal + dispatch floor), and
(c) temporal=False variants of both.

PYTHONPATH=/root/repo:/root/.axon_site python prof/prof_resident_split.py
"""
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from restir_tpu.ops.camera import make_camera
from restir_tpu.ops.pallas import fused_di as fk
from restir_tpu.scene.procedural import many_light_scene

width, height = 1920, 1080
r = width * height
scene, camkw = many_light_scene(n_lights=64, n_blocks=24)
cam = make_camera(**camkw)
cam_vec = fk.pack_camera(cam, width, height)
looper = jnp.uint32(0)
prev = jnp.zeros((fk.PT_CH, r))


def run(n_tri, temporal):
    tx = scene.tri_xform[:, : 3 * n_tri] if n_tri else scene.tri_xform
    pa = scene.prim_attr[:n_tri] if n_tri else scene.prim_attr
    return fk.di_resident_pallas(
        cam_vec, cam_vec, looper, prev,
        tx, pa, scene.mat_attr,
        scene.light_verts, scene.light_normal, scene.light_radiance,
        scene.light_area, scene.light_center, scene.light_radius,
        width=width, height=height, k=4, temporal=temporal)[1]


variants = {
    "full_426": (0, True),
    "full_426_noT": (0, False),
}

outs = {}
for name, (n, t) in variants.items():
    t0 = time.time()
    outs[name] = run(n, t)
    float(jnp.sum(outs[name]))
    print(f"{name}: compiled {time.time()-t0:.1f}s", flush=True)

times = {k: [] for k in variants}
for rep in range(6):
    for name, (n, t) in variants.items():
        t0 = time.perf_counter()
        for _ in range(4):
            out = run(n, t)
        float(jnp.sum(out))
        times[name].append((time.perf_counter() - t0) / 4)
for name, ts in times.items():
    ts = sorted(ts)
    print(f"{name}: min {ts[0]*1e3:.1f} ms  med {ts[len(ts)//2]*1e3:.1f} ms",
          flush=True)
