"""Split kernel R cost: R1 alone, R2 with vis/temporal toggled.

PYTHONPATH=/root/repo:/root/.axon_site python prof/prof_rsplit.py
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
    r = width * height
    scene, camkw = many_light_scene(n_lights=64, n_blocks=24)
    cam = make_camera(**camkw)
    cam_vec = fk.pack_camera(cam, width, height)
    looper = jnp.uint32(0)
    cfg = RenderConfig(width=width, height=height,
                       tracer=TracerType.RESTIR_DI)

    gb = fk.gbuffer_pack_pallas(
        cam_vec, cam_vec, looper, scene.tri_xform, scene.prim_attr,
        scene.mat_attr, scene.cluster_lo, scene.cluster_hi,
        width=width, height=height)
    prev = jnp.zeros((fk.PT_CH, r))

    def run(temporal):
        return fk.reuse_pallas(
            gb, prev, looper,
            scene.light_verts, scene.light_normal, scene.light_radiance,
            scene.light_area, scene.light_center, scene.light_radius,
            scene.tri_xform, scene.cluster_lo, scene.cluster_hi,
            scene.sub_lo, scene.sub_hi,
            k=4, single_sided=True, temporal=temporal)

    # R1 alone: call the internal pieces via a custom jit
    import functools
    raw = fk.reuse_pallas.__wrapped__

    print("R full:", round(timeit(lambda: run(True)), 2))
    print("R no-temporal:", round(timeit(lambda: run(False)), 2))

    # stub the vis loop: occluded := 0 everywhere (keep temporal)
    orig = fk._vis_resident_kernel
    import jax.experimental.pallas as pl_
    from jax.experimental.pallas import tpu as pltpu_

    def novis(gb_ref, rs_ref, xpt_ref, prev_ref, looper_ref, out_ref,
              win_ref, sem, *, k, nb, n_pad, window, temporal,
              temporal_clamp):
        cg = gb_ref.shape[1]
        b = cg * 128
        tile_id = pl_.program_id(0)
        pix = looper_ref[1].astype(jnp.int32) + tile_id * b + (
            jax.lax.broadcasted_iota(jnp.int32, (b, 1), 0).reshape(b))
        looper = looper_ref[0]
        if temporal:
            w0 = fk._window_start(gb_ref, prev_ref, window)
            pltpu_.make_async_copy(
                prev_ref.at[:, pl_.ds(w0, window)], win_ref, sem).start()
        else:
            w0 = None

        def ch(i):
            return gb_ref[i, :, :].reshape(b)

        def rch(i):
            return rs_ref[i, :, :].reshape(b)

        shade = ch(fk.G_SHADE) > 0.5
        res = (rch(fk.RS_LI), rch(fk.RS_LI + 1), rch(fk.RS_LI + 2),
               rch(fk.RS_WI), rch(fk.RS_WI + 1), rch(fk.RS_WI + 2),
               rch(fk.RS_DIST), rch(fk.RS_W),
               jnp.where(shade, float(k), 0.0))
        fk._temporal_merge_pack(
            gb_ref, out_ref, prev_ref, w0, win_ref, sem, looper, pix,
            res, window=window, temporal=temporal,
            temporal_clamp=temporal_clamp)

    fk._vis_resident_kernel = novis
    try:
        print("R no-vis:", round(timeit(jax.jit(
            lambda: raw(gb, prev, looper,
                        scene.light_verts, scene.light_normal,
                        scene.light_radiance, scene.light_area,
                        scene.light_center, scene.light_radius,
                        scene.tri_xform, scene.cluster_lo, scene.cluster_hi,
                        scene.sub_lo, scene.sub_hi,
                        k=4, single_sided=True, nb=128, window=2048,
                        temporal=True, temporal_clamp=20,
                        interpret=False))), 2))
    finally:
        fk._vis_resident_kernel = orig


if __name__ == "__main__":
    main()
