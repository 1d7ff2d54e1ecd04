"""Split the hall shadow-vis XLA glue (sort + payload gather + sub-block
lists) into its pieces, timed within one process on the real TPU.

PYTHONPATH=/root/repo:/root/.axon_site python prof/prof_gluesplit2.py
"""
import os
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))), "scenes"))

from restir_tpu.config import DenoiserType, RenderConfig, TracerType
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
    g = r // 128
    cfg = RenderConfig(width=width, height=height,
                       tracer=TracerType.RESTIR_DI,
                       denoiser=DenoiserType.EAW)
    cam_vec = fk.pack_camera(cam, width, height)
    looper = jnp.uint32(0)

    gb = jax.jit(lambda: fk.gbuffer_pack_pallas(
        cam_vec, cam_vec, looper, scene.tri_xform, scene.prim_attr,
        scene.mat_attr, scene.cluster_lo, scene.cluster_hi,
        scene.sub_lo, scene.sub_hi,
        width=width, height=height, aa_jitter=cfg.aa_jitter,
        single_sided=cfg.single_sided_lights))()
    sync(gb)

    # fake rs pack (RIS output shape): reuse gb-derived directions
    nl = scene.light_verts.shape[0]
    l_pad = fk._round_up(max(nl, 128), 128)
    tabs = fk.build_light_tables(
        scene.light_verts, scene.light_normal, scene.light_radiance,
        scene.light_area, scene.light_center, scene.light_radius, l_pad)
    psi_a, psi_b, psi_c, lum_aux, tri_lo, light_table = tabs
    import functools
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    n_tiles = r // fk._TILE
    tg = fk._TILE // 128
    r1 = functools.partial(
        fk._ris_select_kernel, l_pad=l_pad, k=cfg.cdf_candidates,
        single_sided=cfg.single_sided_lights, n_area=nl, has_env=False)
    rs = jax.jit(lambda: pl.pallas_call(
        r1, grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((fk.GB_CH, tg, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((l_pad, 4), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((l_pad, 4), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((l_pad, 5), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((l_pad, 2), lambda i: (0, 0), memory_space=pltpu.VMEM),
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
      fk._lp2(looper, 0)))()
    sync(rs)

    def inputs():
        shade = gb[fk.G_SHADE].reshape(-1) > 0.5
        live = shade & (rs[fk.RS_W].reshape(-1) > 0.0)
        w3 = [rs[fk.RS_WI + ax].reshape(-1) for ax in range(3)]
        o3c = [gb[fk.G_POS + ax].reshape(-1) + w3[ax] * 1e-5
               for ax in range(3)]
        limit = rs[fk.RS_DIST].reshape(-1) * (1.0 - 1e-3) - 1e-4
        limit = jnp.where(live, jnp.maximum(limit, 0.0), -1.0)
        o3 = jnp.stack(o3c, axis=-1)
        d3 = jnp.stack(w3, axis=-1)
        rp = jnp.stack(
            o3c + w3 + [limit, gb[fk.G_PRIM].reshape(-1)], axis=0)
        return o3, d3, live, rp

    # piece 1: key+argsort perm (+inv)
    def p_perm():
        o3, d3, live, rp = inputs()
        perm, inv = fk._wavefront_perm(
            o3, d3, live, scene.cluster_lo, scene.cluster_hi)
        return perm + inv

    # piece 2: perm + payload take
    def p_take():
        o3, d3, live, rp = inputs()
        perm, inv = fk._wavefront_perm(
            o3, d3, live, scene.cluster_lo, scene.cluster_hi)
        return jnp.take(rp, perm, axis=1)

    # piece 3: crossing rows only (on sorted rays)
    rp_s = jax.jit(p_take)()
    sync(rp_s)

    def p_cross():
        return fk._ray_cluster_crossing_rows(
            rp_s[fk.RP_O:fk.RP_O + 3], rp_s[fk.RP_D:fk.RP_D + 3],
            rp_s[fk.RP_LIM], rp_s[fk.RP_LIM] >= 0.0, fk._TILE,
            scene.sub_lo, scene.sub_hi)

    # piece 4: full lists from sorted rays (crossing + ids argsort)
    def p_lists():
        return fk._sub_block_lists(
            rp_s[fk.RP_O:fk.RP_O + 3], rp_s[fk.RP_D:fk.RP_D + 3],
            rp_s[fk.RP_LIM], rp_s[fk.RP_LIM] >= 0.0, fk._TILE,
            scene.sub_lo, scene.sub_hi)[1]

    # piece 5: everything (the real glue)
    def p_all():
        o3, d3, live, rp = inputs()
        perm, inv = fk._wavefront_perm(
            o3, d3, live, scene.cluster_lo, scene.cluster_hi)
        rp = jnp.take(rp, perm, axis=1)
        vcounts, vids, kp = fk._sub_block_lists(
            rp[fk.RP_O:fk.RP_O + 3], rp[fk.RP_D:fk.RP_D + 3],
            rp[fk.RP_LIM], rp[fk.RP_LIM] >= 0.0, fk._TILE,
            scene.sub_lo, scene.sub_hi)
        return vids

    for name, f in [("perm", p_perm), ("perm+take", p_take),
                    ("crossing", p_cross), ("crossing+ids", p_lists),
                    ("all glue", p_all)]:
        print(name + ":", round(timeit(jax.jit(f)), 1), flush=True)


if __name__ == "__main__":
    main()
