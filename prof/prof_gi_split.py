"""Many-light GI trace decomposition via dbg knobs (results WRONG,
timing only): full / no_occl / no_nee / no_trace / lambert_only.
BASELINE r5: geometry traversals are ~85% of the kernel.

PYTHONPATH=/root/repo:/root/.axon_site python prof/prof_gi_split.py
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

@functools.partial(jax.jit, static_argnames=("dbg", "has_met", "has_die"))
def trace(in_pack, looper, dbg, has_met, has_die):
    return gk.gi_trace_pallas(
        in_pack, looper, scene.tri_xform, scene.prim_attr,
        scene.mat_attr, scene.light_prob, scene.light_alias,
        scene.light_prim_ids, scene.light_radiance,
        scene.sum_light_power_inv,
        depth=cfg.trace_depth, single_sided=cfg.single_sided_lights,
        n_lights=int(scene.light_prob.shape[0]), dbg=dbg,
        has_met=has_met, has_die=has_die)

variants = {
    "full": ((), True, True),
    "no_occl": (("occl",), True, True),
    "no_nee": (("nee",), True, True),
    "no_trace": (("trace",), True, True),
    "lambert_only": ((), False, False),
}
ok = {}
for name, (dbg, hm, hd) in variants.items():
    t0 = time.time()
    try:
        float(jnp.sum(trace(in_pack, looper, dbg, hm, hd)))
        print(f"{name}: compiled {time.time()-t0:.1f}s", flush=True)
        ok[name] = (dbg, hm, hd)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}", flush=True)
times = {n: [] for n in ok}
for rep in range(5):
    for n, (dbg, hm, hd) in ok.items():
        t0 = time.perf_counter()
        for _ in range(3):
            out = trace(in_pack, looper, dbg, hm, hd)
        float(jnp.sum(out))
        times[n].append((time.perf_counter() - t0) / 3)
for n, ts in times.items():
    print(f"{n}: min {min(ts)*1e3:.1f} ms", flush=True)
