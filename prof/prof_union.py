"""Measure shadow-ray work-list unions at (ray-group x geom-block)
granularities on the hall scene — sizing the wavefront vis kernel's
compaction headroom (prof_vissplit showed the kernel is MXU-MAC-bound,
so tested tris x rays is the only lever).

PYTHONPATH=/root/repo:/root/.axon_site python prof/prof_union.py
"""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))), "scenes"))

import functools

import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu

from restir_tpu.config import RenderConfig, TracerType
from restir_tpu.ops.pallas import fused_di as fk


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
    g = r // 128
    cfg = RenderConfig(width=width, height=height,
                       tracer=TracerType.RESTIR_DI)
    cam_vec = fk.pack_camera(cam, width, height)
    looper = jnp.uint32(0)

    gb = fk.gbuffer_pack_pallas(
        cam_vec, cam_vec, looper, scene.tri_xform, scene.prim_attr,
        scene.mat_attr, scene.cluster_lo, scene.cluster_hi,
        width=width, height=height, aa_jitter=cfg.aa_jitter,
        single_sided=cfg.single_sided_lights)

    nl = scene.light_verts.shape[0]
    l_pad = fk._round_up(max(nl, 128), 128)
    n_tiles = r // fk._TILE
    tg = fk._TILE // 128
    tabs = fk.build_light_tables(
        scene.light_verts, scene.light_normal, scene.light_radiance,
        scene.light_area, scene.light_center, scene.light_radius, l_pad)
    psi_a, psi_b, psi_c, lum_aux, tri_lo, light_table = tabs
    r1 = functools.partial(
        fk._ris_select_kernel, l_pad=l_pad, k=cfg.cdf_candidates,
        single_sided=cfg.single_sided_lights, n_area=nl, has_env=False)
    rs = pl.pallas_call(
        r1, grid=(n_tiles,),
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
        out_specs=pl.BlockSpec((fk.RS_CH, tg, 128), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((fk.RS_CH, g, 128), jnp.float32),
    )(gb, psi_a, psi_b, psi_c, lum_aux, tri_lo, light_table,
      fk._lp2(looper, 0))

    shade = gb[fk.G_SHADE].reshape(-1) > 0.5
    live = shade & (rs[fk.RS_W].reshape(-1) > 0.0)
    w3 = [rs[fk.RS_WI + ax].reshape(-1) for ax in range(3)]
    o3c = [gb[fk.G_POS + ax].reshape(-1) + w3[ax] * 1e-5 for ax in range(3)]
    limit = rs[fk.RS_DIST].reshape(-1) * (1.0 - 1e-3) - 1e-4
    o3 = jnp.stack(o3c, axis=-1)
    d3 = jnp.stack(w3, axis=-1)
    perm, inv_perm = fk._wavefront_perm(
        o3, d3, live, scene.cluster_lo, scene.cluster_hi)
    o3 = jnp.take(o3, perm, axis=0)
    d3 = jnp.take(d3, perm, axis=0)
    live_s = jnp.take(live, perm)
    limit_s = jnp.take(limit, perm)

    # ---- sub-block AABBs at 32/64-tri granularity from prim_attr
    pa = np.asarray(scene.prim_attr)  # [N, 32]: v0 0:3 e01 3:6 e02 6:9
    n_tri = scene.tri_xform.shape[1] // 3
    pa = pa[:n_tri]
    v0, e01, e02 = pa[:, 0:3], pa[:, 3:6], pa[:, 6:9]
    c1, c2 = v0 + e01, v0 + e02
    tlo = np.minimum(np.minimum(v0, c1), c2)
    thi = np.maximum(np.maximum(v0, c1), c2)

    def block_boxes(bs):
        nblk = (n_tri + bs - 1) // bs
        pad = nblk * bs - n_tri
        bl = np.concatenate([tlo, np.full((pad, 3), 3e38)], 0)
        bh = np.concatenate([thi, np.full((pad, 3), -3e38)], 0)
        return (jnp.asarray(bl.reshape(nblk, bs, 3).min(1)),
                jnp.asarray(bh.reshape(nblk, bs, 3).max(1)))

    kz = scene.cluster_lo.shape[0]
    print(f"n_tri={n_tri} clusters={kz} live={float(jnp.mean(live_s.astype(jnp.float32))):.3f}")

    for bs, (blo, bhi) in [(128, (scene.cluster_lo, scene.cluster_hi)),
                           (64, block_boxes(64)), (32, block_boxes(32))]:
        for tile in (1024, 512, 256, 128):
            cross = fk._ray_cluster_crossing(
                o3, d3, limit_s, live_s, tile, blo, bhi)  # [T, K]
            m = float(jnp.mean(jnp.sum(cross, axis=1).astype(jnp.float32)))
            # tested tris per ray-group per listed block = bs
            # MAC proxy per frame: groups x mean x bs-tris x tile-rays
            groups = r // tile
            mac = groups * m * bs * tile
            print(f"block={bs:4d} tile={tile:5d} mean_list={m:8.1f} "
                  f"tri_ray_tests={mac / 1e9:8.2f}G")


if __name__ == "__main__":
    main()
