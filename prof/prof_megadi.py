"""A/B the fused resident DI kernel (G+R1+R2 in one dispatch) vs the
split 3-kernel chain, plus the full step, at 1080p on the headline scene.

PYTHONPATH=/root/repo:/root/.axon_site python prof/prof_megadi.py
"""
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from restir_tpu import renderer
from restir_tpu.config import DenoiserType, RenderConfig, TracerType, mat_flags
from restir_tpu.ops.camera import make_camera
from restir_tpu.ops.pallas import fused_di as fk
from restir_tpu.scene.procedural import many_light_scene


def sync(x):
    if isinstance(x, tuple):
        x = x[0]
    return float(jnp.sum(x))


def timeit(fn, n=8):
    sync(fn())
    t = time.perf_counter()
    for _ in range(n):
        out = fn()
    sync(out)
    return (time.perf_counter() - t) / n * 1000.0


width, height = 1920, 1080
r = width * height
scene, camkw = many_light_scene(n_lights=64, n_blocks=24)
cam = make_camera(**camkw)
cam_vec = fk.pack_camera(cam, width, height)
looper = jnp.uint32(0)
cfg = RenderConfig(width=width, height=height, tracer=TracerType.RESTIR_DI,
                   denoiser=DenoiserType.EAW, **mat_flags(scene))

prev = jnp.zeros((fk.PT_CH, r))


def split():
    gb = fk.gbuffer_pack_pallas(
        cam_vec, cam_vec, looper, scene.tri_xform, scene.prim_attr,
        scene.mat_attr, scene.cluster_lo, scene.cluster_hi,
        width=width, height=height)
    return fk.reuse_pallas(
        gb, prev, looper,
        scene.light_verts, scene.light_normal, scene.light_radiance,
        scene.light_area, scene.light_center, scene.light_radius,
        scene.tri_xform, scene.cluster_lo, scene.cluster_hi,
        scene.sub_lo, scene.sub_hi, k=4)


def mega():
    return fk.di_resident_pallas(
        cam_vec, cam_vec, looper, prev,
        scene.tri_xform, scene.prim_attr, scene.mat_attr,
        scene.light_verts, scene.light_normal, scene.light_radiance,
        scene.light_area, scene.light_center, scene.light_radius,
        width=width, height=height, k=4)[1]


# interleaved A/B
sync(split()); sync(mega())
a = b = 0.0
for _ in range(4):
    a += timeit(split, n=4)
    b += timeit(mega, n=4)
print({"split_GR_ms": round(a / 4, 2), "mega_GR_ms": round(b / 4, 2)})

state = renderer.init_state(cfg, cam, scene)
st2, frame = renderer.step_jit(scene, state, cam, cfg)
sync(frame)
t = time.perf_counter()
n = 16
for _ in range(n):
    st2, frame = renderer.step_jit(scene, st2, cam, cfg)
sync(frame)
print({"full_step_ms": round((time.perf_counter() - t) / n * 1000.0, 2)})
