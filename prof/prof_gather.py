"""Probe Mosaic support + cost of in-kernel dynamic gathers (texture
fetch candidates): take_along_axis along sublanes / lanes on VMEM data.

PYTHONPATH=/root/repo:/root/.axon_site python prof/prof_gather.py
"""
import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")


def sync(x):
    return float(jnp.sum(x))


def timeit(fn, n=20):
    out = fn()
    sync(out)
    t = time.perf_counter()
    for _ in range(n):
        out = fn()
    sync(out)
    return (time.perf_counter() - t) / n * 1000.0


R = 1920 * 1088
G = R // 128
TILE = 1024
TG = TILE // 128
N_TILES = R // TILE


def try_variant(name, kernel, tbl_shape, extra_ok=True):
    tbl = jnp.arange(tbl_shape[0] * tbl_shape[1], dtype=jnp.float32).reshape(tbl_shape)
    idx = (jnp.arange(R, dtype=jnp.int32) * 7919) % tbl_shape[0]
    idx = idx.reshape(G, 128)
    try:
        fn = jax.jit(lambda: pl.pallas_call(
            kernel,
            grid=(N_TILES,),
            in_specs=[
                pl.BlockSpec((TG, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(tbl_shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TG, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((G, 128), jnp.float32),
        )(idx, tbl))
        ms = timeit(fn)
        print(f"{name}: {ms:.2f} ms")
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"{name}: FAIL {type(e).__name__}: {msg}")
        return False


# variant 1: take_along_axis along sublanes of [K, 128] table, idx [8,128]
def k_sub(idx_ref, tbl_ref, out_ref):
    idx = idx_ref[...].reshape(8, 128)
    tbl = tbl_ref[...]
    out = jnp.take_along_axis(tbl, idx % tbl.shape[0], axis=0)
    out_ref[...] = out


# variant 2: 1-D table gather: tbl [1, K] lanes, idx per lane
def k_lane(idx_ref, tbl_ref, out_ref):
    idx = idx_ref[...].reshape(8, 128)
    tbl = tbl_ref[...]  # [8, K]
    out = jnp.take_along_axis(tbl, idx % tbl.shape[1], axis=1)
    out_ref[...] = out


# variant 3: transcendentals (env-map direction math)
def k_trans(idx_ref, tbl_ref, out_ref):
    x = idx_ref[...].astype(jnp.float32) * 1e-3
    y = jnp.sin(x) + jnp.cos(x)
    out_ref[...] = y


def k_atan2(idx_ref, tbl_ref, out_ref):
    x = idx_ref[...].astype(jnp.float32) * 1e-3
    out_ref[...] = jnp.arctan2(x, 1.0 + x) + jnp.arccos(
        jnp.clip(x * 1e-4, -1.0, 1.0))


def main():
    try_variant("take_along_axis sublane [1024,128] tbl", k_sub, (1024, 128))
    try_variant("take_along_axis sublane [8192,128] tbl", k_sub, (8192, 128))
    try_variant("take_along_axis lane [8, 2048] tbl", k_lane, (8, 2048))
    try_variant("sin/cos", k_trans, (8, 128))
    try_variant("atan2/acos", k_atan2, (8, 128))


if __name__ == "__main__":
    main()
