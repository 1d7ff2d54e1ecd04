"""GI trace kernel decomposition: which of (closest-hit traversal,
NEE shadow traversal, 1-D shading chain) owns the ~246 ms at 1080p?
Interleaved A/B with the dbg skip knobs (results WRONG, timing only).

PYTHONPATH=/root/repo:/root/.axon_site python prof/prof_gi_depth.py
"""
import functools
import os
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

from restir_tpu.config import RenderConfig, TracerType, mat_flags
from restir_tpu.models import gbuffer as gbuf
from restir_tpu.models import restir_gi
from restir_tpu.ops.camera import make_camera
from restir_tpu.scene.procedural import cornell_box

width, height = 1920, 1080
scene, camkw = cornell_box()
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


@functools.partial(jax.jit, static_argnames=("depth", "dbg"))
def trace(in_pack, looper, depth, dbg):
    return gk.gi_trace_pallas(
        in_pack, looper, scene.tri_xform, scene.prim_attr,
        scene.mat_attr, scene.light_prob, scene.light_alias,
        scene.light_prim_ids, scene.light_radiance,
        scene.sum_light_power_inv,
        depth=depth, single_sided=cfg.single_sided_lights,
        n_lights=int(scene.light_prob.shape[0]), dbg=dbg,
        has_met=cfg.scene_has_metallic, has_die=cfg.scene_has_dielectric,
        has_proc=cfg.scene_has_procedural)


# spec: "name=depth:dbg,dbg" via GI_DBG env, default decomposition set
_var = os.environ.get(
    "GI_DBG",
    "full=5:|nooccl=5:occl|nonee=5:nee|notrace=5:trace|"
    "chain=5:nee,trace|d1=1:|d2=2:")
variants = {}
for spec in _var.split("|"):
    name, rest = spec.split("=")
    dstr, dbgstr = rest.split(":")
    dbg = tuple(x for x in dbgstr.split(",") if x)
    variants[name] = (
        lambda d, g: lambda: trace(in_pack, looper, d, g)
    )(int(dstr), dbg)

for name, fn in variants.items():
    t0 = time.time()
    float(jnp.sum(fn()))
    print(f"{name}: compiled {time.time()-t0:.1f}s", flush=True)

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
    print(f"{name}: min {ts[0]*1e3:.1f} ms  med {ts[len(ts)//2]*1e3:.1f} ms")
