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
scene, camkw = cornell_box()
from restir_tpu.config import mat_flags
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


@functools.partial(jax.jit, static_argnames=("tile", "groups", "hit_fma"))
def trace(in_pack, looper, tile, groups, hit_fma):
    return gk.gi_trace_pallas(
        in_pack, looper, scene.tri_xform, scene.prim_attr,
        scene.mat_attr, scene.light_prob, scene.light_alias,
        scene.light_prim_ids, scene.light_radiance,
        scene.sum_light_power_inv,
        depth=cfg.trace_depth, single_sided=cfg.single_sided_lights,
        n_lights=int(scene.light_prob.shape[0]), tile=tile,
        groups=groups, hit_fma=hit_fma,
        has_met=cfg.scene_has_metallic, has_die=cfg.scene_has_dielectric)


variants = {}
import os
# GI_VARIANTS: "tile:g,g[:fma|:dot]|..." e.g. "1024:5:fma|1024:5:dot"
_var = os.environ.get("GI_VARIANTS", "1024:5:fma|1024:5:dot")
for spec in _var.split("|"):
    parts = spec.split(":")
    tile = int(parts[0])
    groups = tuple(int(x) for x in parts[1].split(","))
    fma = (parts[2] if len(parts) > 2 else "fma") == "fma"
    variants[spec] = (
        lambda t, gr, fm: lambda: trace(in_pack, looper, t, gr, fm)
    )(tile, groups, fma)

outs = {}
for name, fn in list(variants.items()):
    # the remote compile helper OOM-kills flakily under memory pressure
    # (SIGKILL 9) — retry with a backoff before declaring a variant dead
    for attempt in range(3):
        try:
            t0 = time.time()
            outs[name] = fn()
            float(jnp.sum(outs[name]))
            print(f"tile {name}: compiled {time.time()-t0:.1f}s",
                  flush=True)
            break
        except Exception as e:
            print(f"tile {name}: attempt {attempt} FAILED "
                  f"{type(e).__name__}: {e}", flush=True)
            time.sleep(90)
    else:
        del variants[name]

import numpy as np
if outs:
    ref_key = next(iter(outs))
    ref = np.asarray(outs[ref_key])
    for name, o in outs.items():
        if name != ref_key:
            print(f"tile {name}: mismatch "
                  f"{np.mean(np.asarray(o) != ref):.2e}")

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
