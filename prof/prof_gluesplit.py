"""Split the shadow-vis XLA glue cost (sort / crossing / list-build)
and price the block-32 sub-list variant before building it.

PYTHONPATH=/root/repo:/root/.axon_site python prof/prof_gluesplit.py
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))), "scenes"))

from restir_tpu.config import RenderConfig, TracerType
from restir_tpu.ops.pallas import fused_di as fk


def sync(*xs):
    return [float(jnp.sum(x)) for x in xs]


def timeit(fn, n=8):
    out = fn()
    sync(*jax.tree.leaves(out))
    t = time.perf_counter()
    for _ in range(n):
        out = fn()
    sync(*jax.tree.leaves(out))
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

    rng = np.random.default_rng(0)
    lo_w = np.asarray(jnp.min(scene.cluster_lo, axis=0))
    hi_w = np.asarray(jnp.max(scene.cluster_hi, axis=0))
    o3 = jnp.asarray(
        rng.uniform(lo_w, hi_w, size=(r, 3)).astype(np.float32))
    d3n = rng.normal(size=(r, 3)).astype(np.float32)
    d3 = jnp.asarray(d3n / np.linalg.norm(d3n, axis=1, keepdims=True))
    live = jnp.asarray(rng.uniform(size=r) < 0.94)
    limit = jnp.asarray(rng.uniform(5.0, 50.0, size=r).astype(np.float32))

    # sub-block AABBs (32 tris)
    pa = np.asarray(scene.prim_attr)
    n_tri = scene.tri_xform.shape[1] // 3
    pa = pa[:n_tri]
    v0, e01, e02 = pa[:, 0:3], pa[:, 3:6], pa[:, 6:9]
    c1, c2 = v0 + e01, v0 + e02
    tlo = np.minimum(np.minimum(v0, c1), c2)
    thi = np.maximum(np.maximum(v0, c1), c2)
    bs = 32
    nblk = (n_tri + bs - 1) // bs
    pad = nblk * bs - n_tri
    bl = np.concatenate([tlo, np.full((pad, 3), 3e38)], 0)
    bh = np.concatenate([thi, np.full((pad, 3), -3e38)], 0)
    sub_lo = jnp.asarray(bl.reshape(nblk, bs, 3).min(1))
    sub_hi = jnp.asarray(bh.reshape(nblk, bs, 3).max(1))
    print(f"n_tri={n_tri} clusters={scene.cluster_lo.shape[0]} sub={nblk}")

    perm_j = jax.jit(lambda: fk._wavefront_perm(
        o3, d3, live, scene.cluster_lo, scene.cluster_hi))
    print("wavefront perm (argsort 2.07M):", round(timeit(perm_j), 1))

    cross634_j = jax.jit(lambda: fk._ray_cluster_crossing(
        o3, d3, limit, live, 1024, scene.cluster_lo, scene.cluster_hi))
    print("crossing K=634:", round(timeit(cross634_j), 1))

    crosssub_j = jax.jit(lambda: fk._ray_cluster_crossing(
        o3, d3, limit, live, 1024, sub_lo, sub_hi))
    print(f"crossing K={nblk}:", round(timeit(crosssub_j), 1))

    cross634 = cross634_j()
    crosssub = crosssub_j()

    def tile_argsort(cross):
        k = cross.shape[1]
        idx = jax.lax.broadcasted_iota(jnp.int32, cross.shape, 1)
        key = jnp.where(cross, idx, jnp.int32(0x7FFFFFF))
        ids = jnp.argsort(key, axis=1).astype(jnp.int32)
        counts = jnp.sum(cross, axis=1).astype(jnp.int32)
        pos = jax.lax.broadcasted_iota(jnp.int32, cross.shape, 1)
        ids = jnp.where(pos < counts[:, None], ids, jnp.int32(k))
        return counts, ids

    print("tile argsort K=634:",
          round(timeit(jax.jit(lambda: tile_argsort(cross634))), 1))
    print(f"tile argsort K={nblk}:",
          round(timeit(jax.jit(lambda: tile_argsort(crosssub))), 1))

    # sort-free compaction: chunked prefix-sum + one-hot scatter matmul
    def tile_scan_compact(cross, cap):
        t, k = cross.shape
        ci = cross.astype(jnp.int32)
        pos = jnp.cumsum(ci, axis=1) - ci  # exclusive prefix
        idx = jax.lax.broadcasted_iota(jnp.int32, cross.shape, 1)
        # scatter idx -> slot pos (only where cross); cap slots
        slot = jnp.where(cross & (pos < cap), pos, cap)
        out = jnp.full((t, cap + 1), k, jnp.int32)
        out = out.at[jnp.arange(t)[:, None], slot].set(
            jnp.where(cross, idx, k), mode="drop")
        counts = jnp.sum(ci, axis=1)
        return counts, out[:, :cap]

    print(f"tile scan-compact K={nblk}:",
          round(timeit(jax.jit(
              lambda: tile_scan_compact(crosssub, 1024))), 1))

    m = float(jnp.mean(jnp.sum(crosssub, axis=1).astype(jnp.float32)))
    print("sub list mean (random rays):", round(m, 1))


if __name__ == "__main__":
    main()
