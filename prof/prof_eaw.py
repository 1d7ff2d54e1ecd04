"""EAW à-trous: Pallas row-band kernels vs XLA plane shifts, interleaved.

PYTHONPATH=/root/repo:/root/.axon_site python prof/prof_eaw.py
"""
import functools
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

from restir_tpu.config import DenoiserType, RenderConfig, TracerType
from restir_tpu.models import restir_di_fused as fused
from restir_tpu.ops.camera import make_camera
from restir_tpu.ops.pallas import fused_di as fk
from restir_tpu.scene.procedural import many_light_scene


def sync(x):
    return float(jnp.sum(x))


width, height = 1920, 1080
cfg = RenderConfig(width=width, height=height, tracer=TracerType.RESTIR_DI,
                   denoiser=DenoiserType.NONE)
scene, camkw = many_light_scene(n_lights=64, n_blocks=24)
cam = make_camera(**camkw)

state = fused.init_state(cfg, cam)
state, accum = jax.jit(
    fused.step_fused, static_argnames=("cfg",))(scene, state, cam, cfg)
cam_vec = fk.pack_camera(cam, width, height)
gb = fk.gbuffer_pack_pallas(
    cam_vec, cam_vec, state.looper, scene.tri_xform, scene.prim_attr,
    scene.mat_attr, scene.cluster_lo, scene.cluster_hi,
    width=width, height=height, aa_jitter=cfg.aa_jitter,
    single_sided=cfg.single_sided_lights, has_env=False,
    env_tile_rad=scene.env_tile_rad, with_textures=False,
    fused_atlas=scene.fused_atlas, fused_tex_meta=scene.fused_tex_meta)
sync(gb)


@functools.partial(jax.jit, static_argnames=("use_pallas",))
def eaw(accum, gb, use_pallas):
    return fused.eaw_filter_packed(accum, gb, cfg, use_pallas=use_pallas)


variants = {
    "pallas": lambda: eaw(accum, gb, True),
    "xla": lambda: eaw(accum, gb, False),
}
for name, fn in variants.items():
    sync(fn())

times = {k: [] for k in variants}
for rep in range(8):
    for name, fn in variants.items():
        t0 = time.perf_counter()
        for _ in range(4):
            out = fn()
        sync(out)
        times[name].append((time.perf_counter() - t0) / 4)
for name, ts in times.items():
    ts = sorted(ts)
    print(f"{name}: min {min(ts)*1e3:.2f} ms  med {ts[len(ts)//2]*1e3:.2f} ms")
