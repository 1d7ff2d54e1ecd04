"""GI trace kernel tile-size sweep: the kernel body is a ~1500-op 1-D
chain, so per-op Mosaic dispatch dominates at tile=1024 — wider tiles
amortize it. Interleaved A/B at 1080p cornell.

PYTHONPATH=/root/repo:/root/.axon_site python prof/prof_gi_tile.py
"""
import functools
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

from restir_tpu.config import RenderConfig, TracerType
from restir_tpu.models import gbuffer as gbuf
from restir_tpu.models import restir_gi
from restir_tpu.ops.camera import make_camera
from restir_tpu.scene.procedural import cornell_box

width, height = 1920, 1080
cfg = RenderConfig(width=width, height=height, tracer=TracerType.RESTIR_GI)
scene, camkw = cornell_box()
cam = make_camera(**camkw)
looper = jnp.uint32(1)

gb, it, mat, ray_dir = jax.jit(
    gbuf.render_gbuffer, static_argnames=("cfg",))(
        scene, cam, cam, cfg, looper)
float(jnp.sum(gb.depth))

in_pack = restir_gi._build_gi_in_pack(it, mat, ray_dir)
from restir_tpu.ops.pallas import gi_kernel as gk


@functools.partial(jax.jit, static_argnames=("tile",))
def trace(in_pack, looper, tile):
    return gk.gi_trace_pallas(
        in_pack, looper, scene.tri_xform, scene.prim_attr,
        scene.mat_attr, scene.light_prob, scene.light_alias,
        scene.light_prim_ids, scene.light_radiance,
        scene.sum_light_power_inv,
        depth=cfg.trace_depth, single_sided=cfg.single_sided_lights,
        n_lights=int(scene.light_prob.shape[0]), tile=tile)


variants = {}
import os
_tiles = tuple(int(t) for t in os.environ.get(
    "GI_TILES", "1024,2048,4096,8192").split(","))
for tile in _tiles:
    variants[tile] = (lambda t: lambda: trace(in_pack, looper, t))(tile)

outs = {}
for name, fn in list(variants.items()):
    try:
        t0 = time.time()
        outs[name] = fn()
        float(jnp.sum(outs[name]))
        print(f"tile {name}: compiled {time.time()-t0:.1f}s", flush=True)
    except Exception as e:
        print(f"tile {name}: FAILED {type(e).__name__}: {e}", flush=True)
        del variants[name]

import numpy as np
ref = np.asarray(outs.get(1024))
for name, o in outs.items():
    if name != 1024:
        print(f"tile {name}: mismatch {np.mean(np.asarray(o) != ref):.2e}")

times = {k: [] for k in variants}
for rep in range(6):
    for name, fn in variants.items():
        t0 = time.perf_counter()
        for _ in range(2):
            out = fn()
        float(jnp.sum(out))
        times[name].append((time.perf_counter() - t0) / 2)
for name, ts in times.items():
    ts = sorted(ts)
    print(f"tile {name}: min {ts[0]*1e3:.1f} ms  med {ts[len(ts)//2]*1e3:.1f} ms")
