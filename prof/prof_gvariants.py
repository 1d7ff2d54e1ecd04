"""Five G-kernel variants, compiled up-front, interleaved timing.

PYTHONPATH=/root/repo:/root/.axon_site python prof/prof_gvariants.py
"""
import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

from restir_tpu.ops.camera import make_camera
from restir_tpu.scene.procedural import many_light_scene
from restir_tpu.ops.pallas import fused_di as fk
from restir_tpu.ops.pallas.intersect_kernel import (
    ATTR_COLS, MAT_COLS, NULL_PRIMITIVE, _BIG, _hi_lo, _round_up,
    _split_planes, dot_exact_a, dot_f32x3,
)


def sync(x):
    return float(jnp.sum(x))


width, height = 1920, 1080
r = width * height
TILE = 1024
scene, camkw = many_light_scene(n_lights=64, n_blocks=24)
cam = make_camera(**camkw)
cam_vec = fk.pack_camera(cam, width, height)
n = scene.tri_xform.shape[1] // 3
nb_res = 256
n_pad = _round_up(max(n, nb_res), nb_res)
xu, xv, xw = _split_planes(scene.tri_xform, n_pad)
attr = scene.prim_attr
attr = jnp.concatenate(
    [attr, jnp.zeros((n_pad - attr.shape[0], ATTR_COLS), attr.dtype)])
m_pad = _round_up(scene.mat_attr.shape[0], 8)
mat = jnp.concatenate(
    [scene.mat_attr,
     jnp.zeros((m_pad - scene.mat_attr.shape[0], MAT_COLS))])
xy = fk.make_xy_grid(width, height)


def hit_loop(xu_ref, xv_ref, xw_ref, attr_ref, oh_split, dh_split, b):
    def body(i, carry):
        best_dist, best_prim, best_u, best_v, best_attr = carry
        col = pl.multiple_of(i * nb_res, nb_res)
        xu_ = xu_ref[:, pl.ds(col, nb_res)]
        xv_ = xv_ref[:, pl.ds(col, nb_res)]
        xw_ = xw_ref[:, pl.ds(col, nb_res)]
        oou = dot_f32x3(None, xu_, a_split=oh_split)
        oov = dot_f32x3(None, xv_, a_split=oh_split)
        oow = dot_f32x3(None, xw_, a_split=oh_split)
        ddu = dot_f32x3(None, xu_, a_split=dh_split)
        ddv = dot_f32x3(None, xv_, a_split=dh_split)
        ddw = dot_f32x3(None, xw_, a_split=dh_split)
        nondeg = jnp.abs(ddw) >= 1e-12
        t = -oow / jnp.where(nondeg, ddw, 1.0)
        u = oou + t * ddu
        v = oov + t * ddv
        hit = nondeg & (t > 0.0) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
        dist = jnp.where(hit, t, _BIG)
        j = jnp.argmin(dist, axis=-1)
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (b, nb_res), 1)
        oh_best = col_ids == j[:, None]
        d_best = jnp.min(dist, axis=-1)
        u_best = jnp.sum(jnp.where(oh_best, u, 0.0), axis=-1)
        v_best = jnp.sum(jnp.where(oh_best, v, 0.0), axis=-1)
        attr_block = attr_ref[pl.ds(col, nb_res), 0:ATTR_COLS]
        attr_best = dot_exact_a(oh_best.astype(jnp.float32), attr_block)
        closer = d_best < best_dist
        return (
            jnp.minimum(best_dist, d_best),
            jnp.where(closer, j + i * nb_res, best_prim),
            jnp.where(closer, u_best, best_u),
            jnp.where(closer, v_best, best_v),
            jnp.where(closer[:, None], attr_best, best_attr),
        )

    init = (
        jnp.full((b,), _BIG, jnp.float32),
        jnp.full((b,), NULL_PRIMITIVE, jnp.int32),
        jnp.zeros((b,), jnp.float32),
        jnp.zeros((b,), jnp.float32),
        jnp.zeros((b, ATTR_COLS), jnp.float32),
    )
    return jax.lax.fori_loop(0, n_pad // nb_res, body, init)


def make_kernel(mode):
    def kernel(cam_ref, lcam_ref, looper_ref, xy_ref, xu_ref, xv_ref,
               xw_ref, attr_ref, mat_ref, out_ref):
        tile_id = pl.program_id(0)
        b = 8 * 128
        x = xy_ref[0, :, :].reshape(b)
        y = xy_ref[1, :, :].reshape(b)
        pix = tile_id * b + jax.lax.broadcasted_iota(
            jnp.int32, (b, 1), 0).reshape(b)
        looper = looper_ref[0]
        if mode == "const":
            for i in range(fk.GB_CH):
                out_ref[i, :, :] = (x + float(i)).reshape(8, 128)
            return
        ox, oy, oz, dx, dy, dz = fk._raygen(
            cam_ref, looper, x, y, pix, width=width, height=height,
            aa_jitter=True)
        if mode == "raygen":
            for i in range(fk.GB_CH):
                out_ref[i, :, :] = (dx + float(i)).reshape(8, 128)
            return
        if mode in ("hit", "full"):
            oh = jnp.stack([ox, oy, oz, jnp.ones_like(ox)], axis=1)
            dh = jnp.stack([dx, dy, dz, jnp.zeros_like(ox)], axis=1)
            oh_split, dh_split = _hi_lo(oh), _hi_lo(dh)
            best_dist, best_prim, best_u, best_v, a = hit_loop(
                xu_ref, xv_ref, xw_ref, attr_ref, oh_split, dh_split, b)
        else:  # "epi": constant hit results
            best_dist = jnp.full((b,), 5.0) + dx
            best_prim = jnp.full((b,), 3, jnp.int32)
            best_u = jnp.full((b,), 0.3)
            best_v = jnp.full((b,), 0.3)
            a = jnp.zeros((b, ATTR_COLS)) + dy[:, None]
        if mode == "hit":
            out_ref[0, :, :] = (best_dist + best_u + best_v + a[:, 0]
                                + best_prim.astype(jnp.float32)).reshape(8, 128)
            for i in range(1, fk.GB_CH):
                out_ref[i, :, :] = dx.reshape(8, 128)
            return
        fk._gbuffer_epilogue(
            out_ref, lcam_ref, mat_ref, best_dist, best_prim, best_u,
            best_v, a, x, y, ox, oy, oz, dx, dy, dz,
            m_pad=m_pad, width=width, height=height, single_sided=True)
    return kernel


def build(mode):
    full1 = lambda i: (0, 0)  # noqa: E731
    call = pl.pallas_call(
        make_kernel(mode),
        grid=(r // TILE,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((2, TILE // 128, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, n_pad), full1, memory_space=pltpu.VMEM),
            pl.BlockSpec((4, n_pad), full1, memory_space=pltpu.VMEM),
            pl.BlockSpec((4, n_pad), full1, memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, ATTR_COLS), full1, memory_space=pltpu.VMEM),
            pl.BlockSpec((m_pad, MAT_COLS), full1, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((fk.GB_CH, TILE // 128, 128),
                               lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((fk.GB_CH, r // 128, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    lp = jnp.asarray([0], jnp.uint32)
    return jax.jit(functools.partial(
        call, cam_vec, cam_vec, lp, xy, xu, xv, xw, attr, mat))


def main():
    modes = ["const", "raygen", "hit", "epi", "full"]
    fns = {m: build(m) for m in modes}
    for m in modes:  # compile + warm
        sync(fns[m]())
    results = {m: [] for m in modes}
    for rep in range(3):
        for m in modes:
            t = time.perf_counter()
            for _ in range(8):
                out = fns[m]()
            sync(out)
            results[m].append((time.perf_counter() - t) / 8 * 1000)
    for m in modes:
        print(m, [round(v, 1) for v in results[m]])


if __name__ == "__main__":
    main()
