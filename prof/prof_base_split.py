"""Split the resident mega-kernel's non-geometry 'base' cost (~31 ms
at 1080p): K-candidate sweep (k=1 vs 4 bounds the RIS candidate chain),
aa_jitter off (raygen share), single_sided toggle. All with tri tables
truncated to 32 tris and temporal=False so geometry/temporal don't mask
the deltas.

PYTHONPATH=/root/repo:/root/.axon_site python prof/prof_base_split.py
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

N_TRI = 32


def run(k=4, aa=True):
    tx = scene.tri_xform[:, : 3 * N_TRI]
    pa = scene.prim_attr[:N_TRI]
    return fk.di_resident_pallas(
        cam_vec, cam_vec, looper, prev,
        tx, pa, scene.mat_attr,
        scene.light_verts, scene.light_normal, scene.light_radiance,
        scene.light_area, scene.light_center, scene.light_radius,
        width=width, height=height, k=k, temporal=False,
        aa_jitter=aa)[1]


variants = {
    "k4": dict(),
    "k1": dict(k=1),
    "k2": dict(k=2),
    "no_aa": dict(aa=False),
}

outs = {}
for name, kw in variants.items():
    t0 = time.time()
    outs[name] = run(**kw)
    float(jnp.sum(outs[name]))
    print(f"{name}: compiled {time.time()-t0:.1f}s", flush=True)

times = {k: [] for k in variants}
for rep in range(6):
    for name, kw in variants.items():
        t0 = time.perf_counter()
        for _ in range(4):
            out = run(**kw)
        float(jnp.sum(out))
        times[name].append((time.perf_counter() - t0) / 4)
for name, ts in times.items():
    ts = sorted(ts)
    print(f"{name}: min {ts[0]*1e3:.1f} ms  med {ts[len(ts)//2]*1e3:.1f} ms",
          flush=True)
