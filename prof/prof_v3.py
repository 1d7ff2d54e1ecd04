"""Price vec3 SUBLANE-BLOCK batching for the GI chain: does one op on
a [3*cg, 128] stacked triplet beat three ops on 1-D [b] components?

Three kernels run the same arithmetic (90 triplet FMA/where rounds over
a channel pack) at 1080p, 1024-ray tiles:
  scalar3: 3 ops per round on [1024] 1-D components (the GI kernel's
           current form)
  v3:      1 op per round on a [24, 128] stacked triplet
  v3stack: v3 but re-stacking from 1-D components each round (prices
           the stack/unstack tax at chain boundaries)

PYTHONPATH=/root/repo:/root/.axon_site python prof/prof_v3.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

_TILE = 1024
R = 1920 * 1080
G = R // 128
N_TILES = R // _TILE
TG = _TILE // 128
ROUNDS = 90


def _scalar3_kernel(in_ref, out_ref):
    b = TG * 128

    def ch(i):
        return in_ref[i, :, :].reshape(b)

    ax, ay, az = ch(0), ch(1), ch(2)
    bx, by, bz = ch(3), ch(4), ch(5)
    m = ch(6) > 0.5
    for i in range(ROUNDS):
        c = 0.5 + i * 1e-3
        ax = jnp.where(m, ax * c + bx, ax)
        ay = jnp.where(m, ay * c + by, ay)
        az = jnp.where(m, az * c + bz, az)
    out_ref[0, :, :] = ax.reshape(TG, 128)
    out_ref[1, :, :] = ay.reshape(TG, 128)
    out_ref[2, :, :] = az.reshape(TG, 128)


def _v3_kernel(in_ref, out_ref):
    a3 = in_ref[0:3, :, :].reshape(3 * TG, 128)
    b3 = in_ref[3:6, :, :].reshape(3 * TG, 128)
    m = in_ref[6, :, :].reshape(TG, 128) > 0.5
    m3 = jnp.concatenate([m, m, m], axis=0)
    for i in range(ROUNDS):
        c = 0.5 + i * 1e-3
        a3 = jnp.where(m3, a3 * c + b3, a3)
    out_ref[0:3, :, :] = a3.reshape(3, TG, 128)


def _v3stack_kernel(in_ref, out_ref):
    b = TG * 128

    def ch(i):
        return in_ref[i, :, :].reshape(b)

    ax, ay, az = ch(0), ch(1), ch(2)
    bx, by, bz = ch(3), ch(4), ch(5)
    m = ch(6) > 0.5
    m3 = jnp.concatenate(
        [m.reshape(TG, 128)] * 3, axis=0)
    for i in range(ROUNDS):
        c = 0.5 + i * 1e-3
        # stack -> one op -> unstack (the boundary-tax worst case)
        a3 = jnp.concatenate(
            [ax.reshape(TG, 128), ay.reshape(TG, 128),
             az.reshape(TG, 128)], axis=0)
        b3 = jnp.concatenate(
            [bx.reshape(TG, 128), by.reshape(TG, 128),
             bz.reshape(TG, 128)], axis=0)
        a3 = jnp.where(m3, a3 * c + b3, a3)
        ax = a3[0:TG].reshape(b)
        ay = a3[TG:2 * TG].reshape(b)
        az = a3[2 * TG:].reshape(b)
    out_ref[0, :, :] = ax.reshape(TG, 128)
    out_ref[1, :, :] = ay.reshape(TG, 128)
    out_ref[2, :, :] = az.reshape(TG, 128)


def run(kernel, name):
    f = pl.pallas_call(
        kernel,
        grid=(N_TILES,),
        in_specs=[pl.BlockSpec((8, TG, 128), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((3, TG, 128), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, G, 128), jnp.float32),
    )
    x = jnp.ones((8, G, 128), jnp.float32) * 0.9
    f = jax.jit(lambda x: f(x))
    t0 = time.time()
    float(jnp.sum(f(x)))
    print(f"{name}: compiled {time.time()-t0:.1f}s", flush=True)
    return f, x


fns = {}
for kern, name in ((_scalar3_kernel, "scalar3"), (_v3_kernel, "v3"),
                   (_v3stack_kernel, "v3stack")):
    fns[name] = run(kern, name)

times = {k: [] for k in fns}
for rep in range(6):
    for name, (f, x) in fns.items():
        t0 = time.perf_counter()
        for _ in range(4):
            out = f(x)
        float(jnp.sum(out))
        times[name].append((time.perf_counter() - t0) / 4)
for name, ts in times.items():
    ts = sorted(ts)
    print(f"{name}: min {ts[0]*1e3:.2f} ms  med {ts[len(ts)//2]*1e3:.2f} ms")
