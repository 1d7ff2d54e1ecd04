"""Payload-gather (jnp.take of the 9-channel rp pack by the wavefront
perm) variants, in-process on the real TPU. The round-3 finding: the
take costs ~44-50 ms inside the reuse jit vs ~6 ms isolated — find a
formulation that keeps the isolated cost in context.

PYTHONPATH=/root/repo:/root/.axon_site python prof/prof_take.py
"""
import os
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))), "scenes"))

from restir_tpu.config import RenderConfig, TracerType
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
    from make_hall import ensure_assets
    ensure_assets()
    from restir_tpu.scene.loader import parse_scene_file
    sf = parse_scene_file(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scenes", "hall.txt"))
    scene = sf.build()
    cam = sf.make_camera()
    width, height = 1920, 1080
    r = width * height
    cfg = RenderConfig(width=width, height=height,
                       tracer=TracerType.RESTIR_DI)
    cam_vec = fk.pack_camera(cam, width, height)
    looper = jnp.uint32(0)

    gb = jax.jit(lambda: fk.gbuffer_pack_pallas(
        cam_vec, cam_vec, looper, scene.tri_xform, scene.prim_attr,
        scene.mat_attr, scene.cluster_lo, scene.cluster_hi,
        scene.sub_lo, scene.sub_hi,
        width=width, height=height, aa_jitter=cfg.aa_jitter,
        single_sided=cfg.single_sided_lights))()
    sync(gb)

    key = jax.random.PRNGKey(0)

    def inputs():
        # rp stands in for the real payload; same producers (channel
        # reshapes off the gb pack + arithmetic)
        w3 = [gb[fk.G_NORM + ax].reshape(-1) for ax in range(3)]
        o3c = [gb[fk.G_POS + ax].reshape(-1) + w3[ax] * 1e-5
               for ax in range(3)]
        limit = gb[fk.G_DEPTH].reshape(-1) * (1.0 - 1e-3) - 1e-4
        live = gb[fk.G_SHADE].reshape(-1)
        o3 = jnp.stack(o3c, axis=-1)
        d3 = jnp.stack(w3, axis=-1)
        rp = jnp.stack(
            o3c + w3 + [limit, gb[fk.G_PRIM].reshape(-1), live], axis=0)
        perm, inv = fk._wavefront_perm(
            o3, d3, live > 0.5, scene.cluster_lo, scene.cluster_hi)
        return rp, perm

    rp0, perm0 = jax.jit(inputs)()
    sync(rp0)
    sync(perm0.astype(jnp.float32))

    # 0: isolated take (inputs materialized)
    print("isolated take:", round(timeit(jax.jit(
        lambda: jnp.take(rp0, perm0, axis=1))), 1), flush=True)

    # 1: in-context take (producers in the same jit) — the baseline trap
    def v_ctx():
        rp, perm = inputs()
        return jnp.take(rp, perm, axis=1)
    print("in-context take:", round(timeit(jax.jit(v_ctx)), 1), flush=True)

    # 2: barriers on BOTH operands right before the take
    def v_bar():
        rp, perm = inputs()
        rp, perm = jax.lax.optimization_barrier((rp, perm))
        return jnp.take(rp, perm, axis=1)
    print("barrier take:", round(timeit(jax.jit(v_bar)), 1), flush=True)

    # 3: barrier AFTER the take (keep consumers out of the gather fusion)
    def v_bar_out():
        rp, perm = inputs()
        out = jnp.take(rp, perm, axis=1)
        return jax.lax.optimization_barrier(out)
    print("out-barrier take:", round(timeit(jax.jit(v_bar_out)), 1),
          flush=True)

    # 4: per-channel 1-D takes
    def v_rows():
        rp, perm = inputs()
        return jnp.stack([jnp.take(rp[i], perm) for i in range(9)], axis=0)
    print("per-row takes:", round(timeit(jax.jit(v_rows)), 1), flush=True)

    # 5: unique_indices hint
    def v_uniq():
        rp, perm = inputs()
        return jnp.take(rp, perm, axis=1, unique_indices=True,
                        indices_are_sorted=False)
    print("unique take:", round(timeit(jax.jit(v_uniq)), 1), flush=True)

    # 6: gather expressed as [R]-indexed dynamic_slice-free x[perm] on a
    # transposed-in-lane view: x reshaped [9, R] -> take along lanes of
    # [9, g, 128]? (plain x[:, perm] equivalent; included for lowering
    # comparison)
    def v_idx():
        rp, perm = inputs()
        return rp[:, perm]
    print("adv-index take:", round(timeit(jax.jit(v_idx)), 1), flush=True)

    # 7: pin rp through a trivial pallas identity copy (forces a real
    # HBM buffer in the gather operand's natural layout, unlike
    # optimization_barrier which only orders the graph)
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def _pin(x):
        c, rr = x.shape
        gg = rr // 128
        return pl.pallas_call(
            lambda x_ref, o_ref: o_ref.__setitem__(
                (slice(None),) * 3, x_ref[...]),
            grid=(gg // 8,),
            in_specs=[pl.BlockSpec((c, 8, 128), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((c, 8, 128), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((c, gg, 128), x.dtype),
        )(x.reshape(c, gg, 128)).reshape(c, rr)

    def v_pin():
        rp, perm = inputs()
        return jnp.take(_pin(rp), perm, axis=1)
    print("pin-rp take:", round(timeit(jax.jit(v_pin)), 1), flush=True)

    # 8: pin BOTH operands (perm pinned via an f32-bitcast copy)
    def v_pin2():
        rp, perm = inputs()
        permf = _pin(jax.lax.bitcast_convert_type(
            perm, jnp.float32)[None, :])
        perm2 = jax.lax.bitcast_convert_type(permf[0], jnp.int32)
        return jnp.take(_pin(rp), perm2, axis=1)
    print("pin-both take:", round(timeit(jax.jit(v_pin2)), 1), flush=True)

    # 9: scatter formulation: out[:, inv[j]] = rp[:, j]
    def v_scat():
        rp, perm = inputs()
        r = perm.shape[0]
        inv = jnp.zeros((r,), jnp.int32).at[perm].set(
            jnp.arange(r, dtype=jnp.int32))
        return jnp.zeros_like(rp).at[:, inv].set(rp)
    print("scatter take:", round(timeit(jax.jit(v_scat)), 1), flush=True)


if __name__ == "__main__":
    main()
