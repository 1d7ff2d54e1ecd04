"""Split kernel G's cost: full vs epilogue-stubbed vs hitloop-stubbed.

PYTHONPATH=/root/repo:/root/.axon_site python prof/prof_gsplit.py
"""
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

from restir_tpu.config import RenderConfig, TracerType
from restir_tpu.ops.camera import make_camera
from restir_tpu.scene.procedural import many_light_scene
from restir_tpu.ops.pallas import fused_di as fk


def sync(x):
    return float(jnp.sum(x))


def timeit(fn, n=8):
    out = fn()
    sync(out)
    t = time.perf_counter()
    for _ in range(n):
        out = fn()
    sync(out)
    return (time.perf_counter() - t) / n * 1000.0


def main():
    width, height = 1920, 1080
    scene, camkw = many_light_scene(n_lights=64, n_blocks=24)
    cam = make_camera(**camkw)
    cam_vec = fk.pack_camera(cam, width, height)
    looper = jnp.uint32(0)

    raw = fk.gbuffer_pack_pallas.__wrapped__

    def run():
        return raw(cam_vec, cam_vec, looper, scene.tri_xform,
                   scene.prim_attr, scene.mat_attr, scene.cluster_lo,
                   scene.cluster_hi, width=width, height=height,
                   aa_jitter=True, single_sided=True, nb=128,
                   interpret=False)

    print("full:", round(timeit(jax.jit(run)), 2))

    # stub the epilogue: write constants only
    orig_epi = fk._gbuffer_epilogue

    def stub_epi(out_ref, lcam_ref, mat_ref, best_dist, best_prim, best_u,
                 best_v, a, x, y, ox, oy, oz, dx, dy, dz, **kw):
        out_ref[0, :, :] = (best_dist + best_u + best_v
                           + a[:, 0] + best_prim.astype(jnp.float32)
                           ).reshape(8, 128)
        for i in range(1, fk.GB_CH):
            out_ref[i, :, :] = dx.reshape(8, 128)

    fk._gbuffer_epilogue = stub_epi
    try:
        print("no-epilogue:", round(timeit(jax.jit(run)), 2))
    finally:
        fk._gbuffer_epilogue = orig_epi

    # stub the hit loop: constant results into the real epilogue
    orig_res = fk._gbuffer_kernel_resident

    def stub_res(cam_ref, lcam_ref, looper_ref, xu_ref, xv_ref, xw_ref,
                 attr_ref, mat_ref, out_ref, *, n_pad, nb, m_pad, width,
                 height, aa_jitter, single_sided):
        x, y, pix = fk._tile_raster_xy(width)
        b = x.shape[0]
        looper = looper_ref[0]
        ox, oy, oz, dx, dy, dz = fk._raygen(
            cam_ref, looper, x, y, pix, width=width, height=height,
            aa_jitter=aa_jitter)
        best_dist = jnp.full((b,), 5.0, jnp.float32) + dx
        best_prim = jnp.full((b,), 3, jnp.int32)
        best_u = jnp.full((b,), 0.3, jnp.float32)
        best_v = jnp.full((b,), 0.3, jnp.float32)
        a = jnp.zeros((b, fk.ATTR_COLS), jnp.float32) + dy[:, None]
        fk._gbuffer_epilogue(
            out_ref, lcam_ref, mat_ref, best_dist, best_prim, best_u,
            best_v, a, x, y, ox, oy, oz, dx, dy, dz,
            m_pad=m_pad, width=width, height=height,
            single_sided=single_sided)

    fk._gbuffer_kernel_resident = stub_res
    try:
        print("no-hitloop:", round(timeit(jax.jit(run)), 2))
    finally:
        fk._gbuffer_kernel_resident = orig_res


if __name__ == "__main__":
    main()

# appended: constant-only kernel (no raygen, no hit, no epilogue)
def run_const():
    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    width, height = 1920, 1080

    def kernel(cam_ref, out_ref):
        t = cam_ref[0]
        for i in range(fk.GB_CH):
            out_ref[i, 0, 0, :, :] = jnp.full((8, 128), t + float(i))

    cam_vec = jnp.arange(16, dtype=jnp.float32)
    fn = jax.jit(lambda: pl.pallas_call(
        kernel,
        grid=(height // 8, width // 128),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((fk.GB_CH, 1, 1, 8, 128),
                               lambda i, j: (0, i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (fk.GB_CH, height // 8, width // 128, 8, 128), jnp.float32),
    )(cam_vec))
    print("const-only:", round(timeit(fn), 2))


def run_raygen_only():
    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    width, height = 1920, 1080

    def kernel(cam_ref, looper_ref, out_ref):
        x, y, pix = fk._tile_raster_xy(width)
        looper = looper_ref[0]
        ox, oy, oz, dx, dy, dz = fk._raygen(
            cam_ref, looper, x, y, pix, width=width, height=height,
            aa_jitter=True)
        out_ref[0, 0, 0, :, :] = (ox + dx).reshape(8, 128)
        out_ref[1, 0, 0, :, :] = (oy + dy).reshape(8, 128)
        out_ref[2, 0, 0, :, :] = (oz + dz).reshape(8, 128)
        for i in range(3, fk.GB_CH):
            out_ref[i, 0, 0, :, :] = dz.reshape(8, 128)

    scene, camkw = many_light_scene(n_lights=16, n_blocks=2)
    cam = make_camera(**camkw)
    cam_vec = fk.pack_camera(cam, width, height)
    fn = jax.jit(lambda: pl.pallas_call(
        kernel,
        grid=(height // 8, width // 128),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((fk.GB_CH, 1, 1, 8, 128),
                               lambda i, j: (0, i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (fk.GB_CH, height // 8, width // 128, 8, 128), jnp.float32),
    )(cam_vec, jnp.asarray([0], jnp.uint32)))
    print("raygen-only:", round(timeit(fn), 2))


if __name__ == "__main__":
    pass
