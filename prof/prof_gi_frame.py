"""GI FRAME staging at 1080p on cornell: full RESTIR_GI step vs its
pieces (RESTIR_DI step, trace kernel, resolve kernel) to locate glue.

PYTHONPATH=/root/repo:/root/.axon_site python prof/prof_gi_frame.py
"""
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from restir_tpu import renderer
from restir_tpu.config import RenderConfig, TracerType, mat_flags
from restir_tpu.models import restir_di_fused as fused
from restir_tpu.models import restir_gi
from restir_tpu.ops.camera import make_camera
from restir_tpu.ops.pallas import fused_di as fk
from restir_tpu.ops.pallas import gi_kernel as gk
from restir_tpu.scene.procedural import cornell_box

width, height = 1920, 1080
scene, camkw = cornell_box()
cam = make_camera(**camkw)


def sync(x):
    return float(jnp.sum(x))


def timeit(fn, n=8):
    out = fn()
    sync(out if isinstance(out, jnp.ndarray) else jax.tree.leaves(out)[0])
    t = time.perf_counter()
    for _ in range(n):
        out = fn()
    sync(out if isinstance(out, jnp.ndarray) else jax.tree.leaves(out)[0])
    return (time.perf_counter() - t) / n * 1000.0


res = {}
for tracer, name in ((TracerType.RESTIR_DI, "di_step"),
                     (TracerType.RESTIR_GI, "gi_step")):
    cfg = RenderConfig(width=width, height=height, tracer=tracer,
                       **mat_flags(scene))
    state = renderer.init_state(cfg, cam, scene)
    assert isinstance(state, fused.FusedDIState), type(state)

    def step(state=state, cfg=cfg):
        _, frame = renderer.step_jit(scene, state, cam, cfg)
        return frame

    res[name] = timeit(step)

cfg = RenderConfig(width=width, height=height, tracer=TracerType.RESTIR_GI,
                   **mat_flags(scene))
state = renderer.init_state(cfg, cam, scene)
looper = state.looper
cam_vec = fk.pack_camera(cam, width, height)
gb = fk.gbuffer_pack_pallas(
    cam_vec, cam_vec, looper, scene.tri_xform, scene.prim_attr,
    scene.mat_attr, scene.cluster_lo, scene.cluster_hi,
    width=width, height=height, aa_jitter=cfg.aa_jitter,
    single_sided=cfg.single_sided_lights)
sync(gb)

# build the trace input exactly as _gi_stage does
matid = gb[fk.G_PRIMR]
ior = jnp.zeros_like(matid)
for mi in range(scene.mat_attr.shape[0]):
    ior = jnp.where(matid == float(mi), scene.mat_attr[mi, 6], ior)
g = gb.shape[1]
zero1 = jnp.zeros((1, g, 128), jnp.float32)
in_pack = jnp.concatenate([
    gb[fk.G_POS:fk.G_POS + 3], gb[fk.G_NORM:fk.G_NORM + 3],
    gb[fk.G_DIR:fk.G_DIR + 3], gb[fk.G_MTYPE:fk.G_MTYPE + 1],
    gb[fk.G_METAL:fk.G_METAL + 1], gb[fk.G_ROUGH:fk.G_ROUGH + 1],
    ior[None], gb[fk.G_SHADE:fk.G_SHADE + 1], zero1, zero1,
], axis=0)
sync(in_pack)


def trace():
    return gk.gi_trace_pallas(
        in_pack, looper, scene.tri_xform, scene.prim_attr,
        scene.mat_attr, scene.light_prob, scene.light_alias,
        scene.light_prim_ids, scene.light_radiance,
        scene.sum_light_power_inv,
        depth=cfg.trace_depth, single_sided=cfg.single_sided_lights,
        n_lights=int(scene.light_prob.shape[0]),
        has_met=cfg.scene_has_metallic, has_die=cfg.scene_has_dielectric,
        has_proc=cfg.scene_has_procedural)


res["trace_ms"] = timeit(trace)

go = trace()
r = g * 128
gq = jnp.concatenate([
    gb[fk.G_MOTION:fk.G_MOTION + 1], gb[fk.G_PRIMR:fk.G_PRIMR + 1],
    gb[fk.G_DEPTH:fk.G_DEPTH + 1], gb[fk.G_NORM:fk.G_NORM + 3],
    gb[fk.G_ALB:fk.G_ALB + 3], gb[fk.G_SHADE:fk.G_SHADE + 1],
], axis=0)
gi_q = state.gi_q


def resolve():
    return gk.gi_resolve_pallas(
        go, in_pack, gq, gi_q.reshape(gk.Q_CH, r), looper,
        temporal=True, temporal_clamp=cfg.temporal_clamp,
        has_met=cfg.scene_has_metallic)[0]


res["resolve_ms"] = timeit(resolve)
res["in_pack_glue_ms"] = timeit(lambda: jnp.concatenate([
    gb[fk.G_POS:fk.G_POS + 3], gb[fk.G_NORM:fk.G_NORM + 3],
    gb[fk.G_DIR:fk.G_DIR + 3], gb[fk.G_MTYPE:fk.G_MTYPE + 1],
    gb[fk.G_METAL:fk.G_METAL + 1], gb[fk.G_ROUGH:fk.G_ROUGH + 1],
    ior[None], gb[fk.G_SHADE:fk.G_SHADE + 1], zero1, zero1,
], axis=0))

print({k: round(v, 1) for k, v in res.items()})
