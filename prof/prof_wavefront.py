"""Measure the wavefront-sort hypothesis for hall-scene shadow rays.

The streaming vis kernel is K-padding-bound: cost ~ sum over tiles of
per-tile cluster-list length. Sorting rays by a coherence key should
shrink per-tile unions toward the per-ray crossing mean.

PYTHONPATH=/root/repo:/root/.axon_site python prof/prof_wavefront.py
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

from restir_tpu.config import DenoiserType, RenderConfig, TracerType
from restir_tpu.ops.pallas import fused_di as fk
from restir_tpu.models import restir_di_fused as fused


def sync(x):
    return float(jnp.sum(x))


def timeit(fn, n=6):
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
                       tracer=TracerType.RESTIR_DI,
                       denoiser=DenoiserType.EAW)

    cam_vec = fk.pack_camera(cam, width, height)
    looper = jnp.uint32(0)

    gb = fk.gbuffer_pack_pallas(
        cam_vec, cam_vec, looper, scene.tri_xform, scene.prim_attr,
        scene.mat_attr, scene.cluster_lo, scene.cluster_hi,
        width=width, height=height, aa_jitter=cfg.aa_jitter,
        single_sided=cfg.single_sided_lights)
    prev = jnp.zeros((fk.PT_CH, r))

    # run reuse once to get the rs pack: replicate R1 via reuse internals
    # (cheapest: call reuse_pallas and also recompute rs via the internal
    # kernel is awkward; instead reconstruct rs by calling the full
    # reuse and separately the R1-only pieces). We only need rs for
    # statistics, so rebuild it with the same pallas call R1 uses.
    import functools
    nl = scene.light_verts.shape[0]
    l_pad = fk._round_up(max(nl, 128), 128)
    psi_a, psi_b, psi_c, lum_aux, tri_lo, light_table = fk.build_light_tables(
        scene.light_verts, scene.light_normal, scene.light_radiance,
        scene.light_area, scene.light_center, scene.light_radius, l_pad)
    g = r // 128
    n_tiles = r // fk._TILE
    tg = fk._TILE // 128
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    r1 = functools.partial(
        fk._ris_select_kernel, l_pad=l_pad, k=cfg.cdf_candidates,
        single_sided=cfg.single_sided_lights, n_area=nl, has_env=False)
    rs = pl.pallas_call(
        r1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((fk.GB_CH, tg, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((l_pad, 4), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((l_pad, 4), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((l_pad, 5), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((l_pad, 2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((l_pad, l_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((fk.LIGHT_COLS, l_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (fk.RS_CH, tg, 128), lambda i: (0, i, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((fk.RS_CH, g, 128), jnp.float32),
    )(gb, psi_a, psi_b, psi_c, lum_aux, tri_lo, light_table,
      fk._lp2(looper, 0))
    sync(rs)

    shade = gb[fk.G_SHADE].reshape(-1) > 0.5
    live = shade & (rs[fk.RS_W].reshape(-1) > 0.0)
    o3 = jnp.stack([gb[fk.G_POS + ax].reshape(-1) for ax in range(3)], -1)
    d3 = jnp.stack([rs[fk.RS_WI + ax].reshape(-1) for ax in range(3)], -1)
    tmax = rs[fk.RS_DIST].reshape(-1)
    print("live fraction:", float(jnp.mean(live.astype(jnp.float32))))

    lo_w = jnp.min(scene.cluster_lo, axis=0)
    hi_w = jnp.max(scene.cluster_hi, axis=0)
    ext = jnp.maximum(hi_w - lo_w, 1e-6)

    tile = fk._TILE

    @jax.jit
    def tile_union(o3, d3, tmax, live):
        ov = fk._ray_cluster_crossing(
            o3, d3, tmax, live, tile, scene.cluster_lo, scene.cluster_hi)
        return jnp.sum(ov, axis=1)

    @jax.jit
    def per_ray_counts(o3, d3, tmax, live):
        # per-ray crossing count (band-chunked like _ray_cluster_crossing)
        kz = scene.cluster_lo.shape[0]
        lo = scene.cluster_lo.astype(jnp.float32)
        hi = scene.cluster_hi.astype(jnp.float32)
        n_b = 32
        br = r // n_b

        def per_band(args):
            o_b, d_b, tm_b, lv_b = args
            tiny = 1e-12
            inv = 1.0 / jnp.where(jnp.abs(d_b) < tiny, tiny, d_b)
            t_near = jnp.full((br, kz), -3e38, jnp.float32)
            t_far = jnp.full((br, kz), 3e38, jnp.float32)
            for ax in range(3):
                phi = jnp.stack([inv[:, ax], -o_b[:, ax] * inv[:, ax]], 1)
                psi_lo = jnp.stack([lo[:, ax], jnp.ones(kz)], 1)
                psi_hi = jnp.stack([hi[:, ax], jnp.ones(kz)], 1)
                t1 = phi @ psi_lo.T
                t2 = phi @ psi_hi.T
                t_near = jnp.maximum(t_near, jnp.minimum(t1, t2))
                t_far = jnp.minimum(t_far, jnp.maximum(t1, t2))
            cross = ((t_far >= t_near) & (t_far >= 0.0)
                     & (t_near <= tm_b[:, None]) & lv_b[:, None])
            return jnp.sum(cross, axis=1)

        return jax.lax.map(per_band, (
            o3.reshape(n_b, br, 3), d3.reshape(n_b, br, 3),
            tmax.reshape(n_b, br), live.reshape(n_b, br))).reshape(-1)

    base = np.asarray(tile_union(o3, d3, tmax, live))
    print(f"baseline tile-union: mean {base.mean():.1f} "
          f"p50 {np.percentile(base, 50):.0f} p90 {np.percentile(base, 90):.0f}")
    prc = np.asarray(per_ray_counts(o3, d3, tmax, live))
    lv = np.asarray(live)
    print(f"per-ray crossings (live rays): mean {prc[lv].mean():.1f} "
          f"p50 {np.percentile(prc[lv], 50):.0f} "
          f"p90 {np.percentile(prc[lv], 90):.0f}")

    def oct_bits(d3, bits):
        # quantized direction: octahedral-ish via (theta-less) sign+abs
        n = jnp.max(jnp.abs(d3), axis=1, keepdims=True)
        d = d3 / jnp.maximum(n, 1e-9)
        q = ((d + 1.0) * 0.5 * (2 ** bits - 1)).astype(jnp.int32)
        return (q[:, 0] << (2 * bits)) | (q[:, 1] << bits) | q[:, 2]

    def pos_bits(o3, bits):
        q = jnp.clip(((o3 - lo_w) / ext * (2 ** bits)).astype(jnp.int32),
                     0, 2 ** bits - 1)
        return (q[:, 0] << (2 * bits)) | (q[:, 1] << bits) | q[:, 2]

    prim = gb[fk.G_PRIM].reshape(-1).astype(jnp.int32)
    pclu = jnp.maximum(prim, 0) // 128  # Morton cluster of the origin tri
    variants = {
        "pos3x2_dir3x3": (pos_bits(o3, 2) << 9) | oct_bits(d3, 3),
        "pclu_dir3x3": (pclu << 9) | oct_bits(d3, 3),
        "pclu_dir3x4": (pclu << 12) | oct_bits(d3, 4),
        "pclu4_dir3x3": ((pclu // 4) << 9) | oct_bits(d3, 3),
        "dir3x3_pclu": (oct_bits(d3, 3) << 12) | pclu,
    }
    for name, key in variants.items():
        key = jnp.where(live, key, jnp.int32(0x7FFFFFFF))
        perm = jnp.argsort(key)
        u = np.asarray(tile_union(o3[perm], d3[perm], tmax[perm],
                                  live[perm]))
        # only tiles with any live ray cost anything
        nz = u[u > 0]
        print(f"sorted[{name}]: tile-union mean {u.mean():.1f} "
              f"(nonzero mean {nz.mean():.1f}, n={len(nz)}/{len(u)})")

    # --- timing of the permutation machinery
    key = jnp.where(live, variants["pos3x2_dir3x3"], jnp.int32(0x7FFFFFFF))
    t_sort = timeit(jax.jit(lambda: jnp.argsort(key)))
    perm = jnp.argsort(key)
    inv = jnp.argsort(perm)
    pack16 = jnp.concatenate([gb[:8], rs[:8]], 0).reshape(16, r)
    t_gather16 = timeit(jax.jit(lambda: jnp.take(pack16, perm, axis=1)))
    one = rs[fk.RS_W].reshape(-1)
    t_gather1 = timeit(jax.jit(lambda: jnp.take(one, inv)))
    print(f"argsort {t_sort:.1f} ms; gather[16,R] {t_gather16:.1f} ms; "
          f"gather[R] {t_gather1:.1f} ms")


if __name__ == "__main__":
    main()
