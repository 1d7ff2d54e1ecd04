"""Price a VPU-FMA any-hit test against the MXU dot_f32x3 block loop.

The K=4 homogeneous hit matmuls pad K to 128 (32x MAC waste, round-3
finding); a tris-on-sublanes FMA form has no padding waste but pays VPU
tile counts + broadcast lowering. Headline-scene shape: 512 padded
tris, 1080p (2025 tiles of 1024 rays).

PYTHONPATH=/root/repo:/root/.axon_site python prof/prof_fma.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

from restir_tpu.ops.pallas.intersect_kernel import (
    _hi_lo, dot_f32x3, _split_planes)

_TILE = 1024
R = 1920 * 1080
G = R // 128
N_TILES = R // _TILE
TG = _TILE // 128


def _mxu_kernel(ray_ref, xu_ref, xv_ref, xw_ref, out_ref, *, nb, n_pad):
    b = _TILE

    def ch(i):
        return ray_ref[i, :, :].reshape(b)

    ox, oy, oz = ch(0), ch(1), ch(2)
    wx, wy, wz = ch(3), ch(4), ch(5)
    limit = ch(6)
    oh4 = jnp.stack([ox, oy, oz, jnp.ones_like(ox)], axis=0)
    dh4 = jnp.stack([wx, wy, wz, jnp.zeros_like(ox)], axis=0)
    oh4_split = _hi_lo(oh4)
    dh4_split = _hi_lo(dh4)

    def vis_body(i, occluded):
        col = pl.multiple_of(i * nb, nb)
        xu = xu_ref[:, pl.ds(col, nb)]
        xv = xv_ref[:, pl.ds(col, nb)]
        xw = xw_ref[:, pl.ds(col, nb)]
        oou = dot_f32x3(xu.T, None, b_split=oh4_split)
        oov = dot_f32x3(xv.T, None, b_split=oh4_split)
        oow = dot_f32x3(xw.T, None, b_split=oh4_split)
        ddu = dot_f32x3(xu.T, None, b_split=dh4_split)
        ddv = dot_f32x3(xv.T, None, b_split=dh4_split)
        ddw = dot_f32x3(xw.T, None, b_split=dh4_split)
        nondeg = jnp.abs(ddw) >= 1e-12
        tt = -oow / jnp.where(nondeg, ddw, 1.0)
        uu = oou + tt * ddu
        vv = oov + tt * ddv
        blocked = (
            nondeg & (tt > 0.0) & (uu >= 0.0) & (vv >= 0.0)
            & (uu + vv <= 1.0) & (tt < limit[None, :])
        )
        return jnp.maximum(
            occluded, jnp.max(blocked.astype(jnp.float32), axis=0))

    occ = jax.lax.fori_loop(
        0, n_pad // nb, vis_body, jnp.zeros((b,), jnp.float32))
    out_ref[0, :, :] = occ.reshape(TG, 128)


def _fma_kernel(ray_ref, xpt_ref, out_ref, *, nb, n_pad):
    b = _TILE

    def ch(i):
        return ray_ref[i, :, :].reshape(1, b)

    ox, oy, oz = ch(0), ch(1), ch(2)
    wx, wy, wz = ch(3), ch(4), ch(5)
    limit = ch(6)

    def bc(col2, lo):
        # [nb, 1] coefficient column -> broadcast along lanes
        return jnp.broadcast_to(col2[:, lo:lo + 1], (nb, b))

    def vis_body(i, occluded):
        row = pl.multiple_of(i * nb, nb)
        xp = xpt_ref[pl.ds(row, nb), :]  # [nb, 128] tri-major planes
        oou = bc(xp, 0) * ox + bc(xp, 1) * oy + bc(xp, 2) * oz + bc(xp, 3)
        oov = bc(xp, 4) * ox + bc(xp, 5) * oy + bc(xp, 6) * oz + bc(xp, 7)
        oow = bc(xp, 8) * ox + bc(xp, 9) * oy + bc(xp, 10) * oz + bc(xp, 11)
        ddu = bc(xp, 0) * wx + bc(xp, 1) * wy + bc(xp, 2) * wz
        ddv = bc(xp, 4) * wx + bc(xp, 5) * wy + bc(xp, 6) * wz
        ddw = bc(xp, 8) * wx + bc(xp, 9) * wy + bc(xp, 10) * wz
        nondeg = jnp.abs(ddw) >= 1e-12
        tt = -oow / jnp.where(nondeg, ddw, 1.0)
        uu = oou + tt * ddu
        vv = oov + tt * ddv
        blocked = (
            nondeg & (tt > 0.0) & (uu >= 0.0) & (vv >= 0.0)
            & (uu + vv <= 1.0) & (tt < limit)
        )
        return jnp.maximum(
            occluded, jnp.max(blocked.astype(jnp.float32), axis=0,
                              keepdims=True))

    occ = jax.lax.fori_loop(
        0, n_pad // nb, vis_body, jnp.zeros((1, b), jnp.float32))
    out_ref[0, :, :] = occ.reshape(TG, 128)


@functools.partial(jax.jit, static_argnames=("nb",))
def run_mxu(rays, xu, xv, xw, nb):
    n_pad = xu.shape[1]
    kern = functools.partial(_mxu_kernel, nb=nb, n_pad=n_pad)
    return pl.pallas_call(
        kern,
        grid=(N_TILES,),
        in_specs=[
            pl.BlockSpec((8, TG, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, n_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, n_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, n_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TG, 128), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, G, 128), jnp.float32),
    )(rays, xu, xv, xw)


@functools.partial(jax.jit, static_argnames=("nb",))
def run_fma(rays, xpt, nb):
    n_pad = xpt.shape[0]
    kern = functools.partial(_fma_kernel, nb=nb, n_pad=n_pad)
    return pl.pallas_call(
        kern,
        grid=(N_TILES,),
        in_specs=[
            pl.BlockSpec((8, TG, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TG, 128), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, G, 128), jnp.float32),
    )(rays, xpt)


def main():
    from restir_tpu.scene.procedural import many_light_scene
    scene, _ = many_light_scene(n_lights=64, n_blocks=24)
    n_tri = scene.tri_xform.shape[1] // 3
    n_pad = -(-max(n_tri, 256) // 256) * 256
    xu, xv, xw = _split_planes(scene.tri_xform, n_pad)
    xpt = jnp.concatenate(
        [xu, xv, xw, jnp.zeros((116, n_pad), xu.dtype)], axis=0).T

    rng = np.random.default_rng(0)
    lo = np.asarray(jnp.min(scene.cluster_lo, axis=0))
    hi = np.asarray(jnp.max(scene.cluster_hi, axis=0))
    o3 = rng.uniform(lo, hi, size=(R, 3)).astype(np.float32)
    d3 = rng.normal(size=(R, 3)).astype(np.float32)
    d3 /= np.linalg.norm(d3, axis=1, keepdims=True)
    lim = rng.uniform(1.0, 30.0, size=R).astype(np.float32)
    rays = jnp.asarray(
        np.stack([o3[:, 0], o3[:, 1], o3[:, 2],
                  d3[:, 0], d3[:, 1], d3[:, 2],
                  lim, np.zeros(R, np.float32)], axis=0)
    ).reshape(8, G, 128)

    variants = {
        "mxu_nb256": lambda: run_mxu(rays, xu, xv, xw, 256),
        "fma_nb128": lambda: run_fma(rays, xpt, 128),
        "fma_nb256": lambda: run_fma(rays, xpt, 256),
        "fma_nb512": lambda: run_fma(rays, xpt, 512),
    }
    outs = {}
    for name, fn in variants.items():
        try:
            outs[name] = np.asarray(fn())
            print(f"{name}: compiled, occ rate "
                  f"{outs[name].mean():.4f}", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)
            variants[name] = None
    variants = {k: v for k, v in variants.items() if v is not None}
    ref = outs.get("mxu_nb256")
    for name, o in outs.items():
        if ref is not None and name != "mxu_nb256":
            print(f"{name}: mismatch vs mxu {np.mean(o != ref):.2e}")

    times = {k: [] for k in variants}
    for rep in range(8):
        for name, fn in variants.items():
            t0 = time.perf_counter()
            for _ in range(4):
                out = fn()
            float(jnp.sum(out))
            times[name].append((time.perf_counter() - t0) / 4)
    for name, ts in times.items():
        ts = sorted(ts)
        print(f"{name}: min {min(ts)*1e3:.2f} ms  "
              f"med {ts[len(ts)//2]*1e3:.2f} ms")


if __name__ == "__main__":
    main()
