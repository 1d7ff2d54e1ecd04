"""Honest payload-gather cost (jit ARGS, not closed-over constants —
those constant-fold and lie). Compares element gathers ([9, R] channel
layout) vs row gathers ([R, 16] ray-major) vs a payload-carrying sort.

PYTHONPATH=/root/repo:/root/.axon_site python prof/prof_take2.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

R = 1920 * 1080


def sync(x):
    return float(jnp.sum(x)) if x.dtype != jnp.int32 else int(jnp.sum(x))


def timeit(fn, *args, n=8):
    out = fn(*args)
    sync(out[0] if isinstance(out, tuple) else out)
    t = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    sync(out[0] if isinstance(out, tuple) else out)
    return (time.perf_counter() - t) / n * 1000.0


rng = np.random.default_rng(0)
perm = jnp.asarray(rng.permutation(R).astype(np.int32))
rp9 = jnp.asarray(rng.standard_normal((9, R), dtype=np.float32))
rp16 = jnp.asarray(rng.standard_normal((R, 16), dtype=np.float32))
key = jnp.asarray(rng.integers(0, 1 << 15, size=R).astype(np.int32))

v_ch9 = jax.jit(lambda x, p: jnp.take(x, p, axis=1))
v_row16 = jax.jit(lambda x, p: jnp.take(x, p, axis=0))
v_row16_t = jax.jit(
    lambda x, p: jnp.take(x, p, axis=0).T.reshape(16, R // 128, 128))


@jax.jit
def v_sort9(k, x):
    ops = (k,) + tuple(x[i] for i in range(9))
    out = jax.lax.sort(ops, num_keys=1)
    return out[1]


@jax.jit
def v_sort11(k, x):
    # the real replacement: key + iota (perm payload) + 9 channels
    iota = jax.lax.iota(jnp.int32, R)
    ops = (k, iota) + tuple(x[i] for i in range(9))
    out = jax.lax.sort(ops, num_keys=1)
    return out[1], jnp.stack(out[2:], axis=0)


@jax.jit
def v_unsort2(p, occ):
    # unsort occ by sorting on the carried perm (replaces inv scatter +
    # 1-channel gather)
    out = jax.lax.sort((p, occ), num_keys=1)
    return out[1]


print("ch9 take      :", round(timeit(v_ch9, rp9, perm), 1), flush=True)
print("row16 take    :", round(timeit(v_row16, rp16, perm), 1), flush=True)
print("row16 take + T:", round(timeit(v_row16_t, rp16, perm), 1), flush=True)
print("sort 9-payload:", round(timeit(v_sort9, key, rp9), 1), flush=True)
print("sort 11-op    :", round(timeit(v_sort11, key, rp9), 1), flush=True)
print("unsort 2-op   :", round(timeit(v_unsort2, perm, rp9[0]), 1),
      flush=True)
