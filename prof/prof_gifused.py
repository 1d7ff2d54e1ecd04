"""Stage split of the FUSED ReSTIR GI pipeline at 1080p (cornell).

Times, within one process (interleaved reps): the full fused step, the
three DI kernels, the GI trace kernel, the GI resolve kernel, and the
XLA glue around them (in_pack build / ior chain / gq concat).

PYTHONPATH=/root/repo:/root/.axon_site python prof/prof_gifused.py
"""
import functools
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from restir_tpu import renderer
from restir_tpu.config import RenderConfig, TracerType
from restir_tpu.models import restir_di_fused as fused
from restir_tpu.ops.camera import make_camera
from restir_tpu.ops.pallas import fused_di as fk
from restir_tpu.ops.pallas import gi_kernel as gk
from restir_tpu.scene.procedural import cornell_box


def sync(tree):
    return float(jnp.sum(jax.tree.leaves(tree)[0]))


def timeit(name, fn, n=6):
    t0 = time.time()
    out = fn()
    sync(out)
    print(f"{name} first {time.time() - t0:.1f}s", flush=True)
    ts = []
    for _ in range(n):
        t = time.perf_counter()
        out = fn()
        sync(out)
        ts.append(time.perf_counter() - t)
    ts = sorted(ts)
    print(f"{name}: min {ts[0]*1e3:.1f} med {ts[len(ts)//2]*1e3:.1f} ms",
          flush=True)
    return out


width, height = 1920, 1080
scene, camkw = cornell_box()
from restir_tpu.config import mat_flags
cfg = RenderConfig(width=width, height=height, tracer=TracerType.RESTIR_GI,
                   **mat_flags(scene))
cam = make_camera(**camkw)

state = renderer.init_state(cfg, cam, scene)
assert isinstance(state, fused.FusedDIState), "fused GI path not taken!"
print("tris:", scene.tri_xform.shape[1] // 3,
      "lights:", scene.light_verts.shape[0], flush=True)

holder = {"state": state}
del state


def frame_step():
    holder["state"], img = renderer.step_jit(scene, holder["state"], cam, cfg)
    return img


timeit("frame", frame_step)
looper = holder["state"].looper
r = cfg.num_pixels

# ---- standalone stages (fresh inputs from one un-donated step pieces)
cam_vec = fk.pack_camera(cam, cfg.width, cfg.height)


@functools.partial(jax.jit, static_argnames=("cfg",))
def g_prog(scene, cam_vec, looper, cfg: RenderConfig):
    return fk.gbuffer_pack_pallas(
        cam_vec, cam_vec, looper, scene.tri_xform, scene.prim_attr,
        scene.mat_attr, scene.cluster_lo, scene.cluster_hi,
        width=cfg.width, height=cfg.height,
        aa_jitter=cfg.aa_jitter, single_sided=cfg.single_sided_lights,
        has_env=False, env_tile_rad=scene.env_tile_rad,
        with_textures=False, fused_atlas=scene.fused_atlas,
        fused_tex_meta=scene.fused_tex_meta)


gb = timeit("G", lambda: g_prog(scene, cam_vec, looper, cfg))


@functools.partial(jax.jit, static_argnames=("cfg",))
def gi_glue_in(scene, gb, cfg: RenderConfig):
    g = gb.shape[1]
    matid = gb[fk.G_PRIMR]
    ior = jnp.zeros_like(matid)
    for mi in range(scene.mat_attr.shape[0]):
        ior = jnp.where(matid == float(mi), scene.mat_attr[mi, 6], ior)
    zero1 = jnp.zeros((1, g, 128), jnp.float32)
    return jnp.concatenate([
        gb[fk.G_POS:fk.G_POS + 3], gb[fk.G_NORM:fk.G_NORM + 3],
        gb[fk.G_DIR:fk.G_DIR + 3], gb[fk.G_MTYPE:fk.G_MTYPE + 1],
        gb[fk.G_METAL:fk.G_METAL + 1], gb[fk.G_ROUGH:fk.G_ROUGH + 1],
        ior[None], gb[fk.G_SHADE:fk.G_SHADE + 1], zero1, zero1,
    ], axis=0)


in_pack = timeit("glue_in", lambda: gi_glue_in(scene, gb, cfg))


@functools.partial(jax.jit, static_argnames=("cfg",))
def trace_prog(scene, in_pack, looper, cfg: RenderConfig):
    return gk.gi_trace_pallas(
        in_pack, looper, scene.tri_xform, scene.prim_attr,
        scene.mat_attr, scene.light_prob, scene.light_alias,
        scene.light_prim_ids, scene.light_radiance,
        scene.sum_light_power_inv,
        depth=cfg.trace_depth, single_sided=cfg.single_sided_lights,
        n_lights=int(scene.light_prob.shape[0]), pix0=0)


go = timeit("trace", lambda: trace_prog(scene, in_pack, looper, cfg))


@functools.partial(jax.jit, static_argnames=("cfg",))
def resolve_prog(go, in_pack, gb, gi_q, looper, cfg: RenderConfig):
    gq = jnp.concatenate([
        gb[fk.G_MOTION:fk.G_MOTION + 1], gb[fk.G_PRIMR:fk.G_PRIMR + 1],
        gb[fk.G_DEPTH:fk.G_DEPTH + 1], gb[fk.G_NORM:fk.G_NORM + 3],
        gb[fk.G_ALB:fk.G_ALB + 3], gb[fk.G_SHADE:fk.G_SHADE + 1],
    ], axis=0)
    return gk.gi_resolve_pallas(
        go, in_pack, gq, gi_q.reshape(gk.Q_CH, gb.shape[1] * 128), looper,
        temporal=True, temporal_clamp=cfg.temporal_clamp)


gi_q = jnp.zeros((gk.Q_CH, r // 128, 128))
timeit("resolve", lambda: resolve_prog(go, in_pack, gb, gi_q, looper, cfg))

# DI reuse + spatial for completeness
pt_pack = jnp.zeros((fk.PT_CH, r // 128, 128))


@functools.partial(jax.jit, static_argnames=("cfg",))
def r_prog(scene, gb, pt_pack, looper, cfg: RenderConfig):
    return fk.reuse_pallas(
        gb, pt_pack.reshape(fk.PT_CH, r), looper,
        scene.light_verts, scene.light_normal, scene.light_radiance,
        scene.light_area, scene.light_center, scene.light_radius,
        scene.tri_xform, scene.cluster_lo, scene.cluster_hi,
        scene.sub_lo, scene.sub_hi,
        k=cfg.cdf_candidates, single_sided=cfg.single_sided_lights,
        temporal=True, temporal_clamp=cfg.temporal_clamp,
        has_env=False, env_tile_rad=scene.env_tile_rad,
        env_tile_uv=scene.env_tile_uv, env_tile_sa=scene.env_tile_sa)


pt = timeit("R", lambda: r_prog(scene, gb, pt_pack, looper, cfg))
