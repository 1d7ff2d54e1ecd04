"""Tile-size sweep for the resident DI mega-kernel (G+R1+R2): wider
tiles amortize the per-grid-step dispatch floor. The temporal WINDOW is
held FIXED across all tiles (max over the sweep) so timings isolate the
tile/dispatch effect — window size changes both the one-hot gather cost
([window, tile] iota/onehot, ~window*tile*4 B VMEM) and, per the
docstring on di_resident_pallas, the results themselves (window clamp),
so a confounded sweep would time AND parity-check different programs.

PYTHONPATH=/root/repo:/root/.axon_site python prof/prof_megatile.py
"""
import os
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

tiles = [int(t) for t in os.environ.get("MEGA_TILES",
                                        "1024,3072,5120").split(",")]
WINDOW = -(-max(2048, 2 * max(tiles)) // 1024) * 1024  # fixed across
# the sweep, rounded to the mod-gather's 1024 granularity


def run(tile):
    return fk.di_resident_pallas(
        cam_vec, cam_vec, looper, prev,
        scene.tri_xform, scene.prim_attr, scene.mat_attr,
        scene.light_verts, scene.light_normal, scene.light_radiance,
        scene.light_area, scene.light_center, scene.light_radius,
        width=width, height=height, k=4,
        tile=tile, window=WINDOW)[1]


outs = {}
for t in tiles:
    t0 = time.time()
    try:
        outs[t] = run(t)
        float(jnp.sum(outs[t]))
        print(f"tile {t}: compiled {time.time()-t0:.1f}s", flush=True)
    except Exception as e:
        print(f"tile {t}: FAILED {type(e).__name__}: {e}", flush=True)
        tiles = [x for x in tiles if x != t]

import numpy as np
import sys
if not tiles:
    sys.exit("all tile variants failed to compile (see messages above)")
ref = np.asarray(outs[tiles[0]])
for t in tiles[1:]:
    print(f"tile {t}: mismatch {np.mean(np.asarray(outs[t]) != ref):.2e}",
          flush=True)

times = {t: [] for t in tiles}
for rep in range(6):
    for t in tiles:
        t0 = time.perf_counter()
        for _ in range(4):
            out = run(t)
        float(jnp.sum(out))
        times[t].append((time.perf_counter() - t0) / 4)
for t, ts in times.items():
    ts = sorted(ts)
    print(f"tile {t}: min {ts[0]*1e3:.1f} ms  med {ts[len(ts)//2]*1e3:.1f} ms")
