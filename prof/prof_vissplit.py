"""Isolate the vis-kernel per-pair cost: DMA sync vs compute vs loop.

PYTHONPATH=/root/repo:/root/.axon_site python prof/prof_vissplit.py
"""
import functools
import os
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))), "scenes"))

import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu

from restir_tpu.config import RenderConfig, TracerType
from restir_tpu.ops.pallas import fused_di as fk
from restir_tpu.ops.pallas.intersect_kernel import dot_f32x3, _hi_lo


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


def make_kernel(mode, nb):
    def kern(vcounts_ref, vids_hbm_ref, rp_ref, xp_hbm_ref,
             out_ref, vids_ref, ids_sem, xpb_ref, geo_sem):
        cg = rp_ref.shape[1]
        b = cg * 128
        tile_id = pl.program_id(0)
        kp = vids_ref.shape[0]
        ids_dma = pltpu.make_async_copy(
            vids_hbm_ref.at[pl.ds(pl.multiple_of(tile_id * kp, 1024), kp)],
            vids_ref, ids_sem)
        ids_dma.start()

        def ch(i):
            return rp_ref[i, :, :].reshape(b)

        ox, oy, oz = ch(0), ch(1), ch(2)
        dx, dy, dz = ch(3), ch(4), ch(5)
        limit = ch(6)
        prim_origin = ch(7).astype(jnp.int32)
        live = ch(8) > 0.5
        od8 = jnp.concatenate([
            jnp.stack([ox, oy, oz, jnp.ones_like(ox)], axis=0),
            jnp.stack([dx, dy, dz, jnp.zeros_like(ox)], axis=0),
        ], axis=1)
        od8_split = _hi_lo(od8)
        ids_dma.wait()
        vcount = vcounts_ref[tile_id]
        pc = (vcount + 1) // 2

        def pair_ids(j):
            c0 = vids_ref[2 * j]
            c1 = vids_ref[jnp.minimum(2 * j + 1, jnp.maximum(vcount - 1, 0))]
            return c0, c1

        def vfetch(j, slot):
            c0, c1 = pair_ids(j)
            pltpu.make_async_copy(
                xp_hbm_ref.at[:, pl.ds(pl.multiple_of(c0 * nb, nb), nb)],
                xpb_ref.at[slot, :, 0:nb], geo_sem.at[slot, 0]).start()
            pltpu.make_async_copy(
                xp_hbm_ref.at[:, pl.ds(pl.multiple_of(c1 * nb, nb), nb)],
                xpb_ref.at[slot, :, nb:2 * nb], geo_sem.at[slot, 1]).start()

        def vfetch_wait(j, slot):
            c0, c1 = pair_ids(j)
            pltpu.make_async_copy(
                xp_hbm_ref.at[:, pl.ds(pl.multiple_of(c0 * nb, nb), nb)],
                xpb_ref.at[slot, :, 0:nb], geo_sem.at[slot, 0]).wait()
            pltpu.make_async_copy(
                xp_hbm_ref.at[:, pl.ds(pl.multiple_of(c1 * nb, nb), nb)],
                xpb_ref.at[slot, :, nb:2 * nb], geo_sem.at[slot, 1]).wait()

        if mode != "nodma":
            @pl.when(pc > 0)
            def _():
                vfetch(0, 0)

        def vis_body(state):
            i, _, occluded = state
            c0, c1 = pair_ids(i)
            slot = jax.lax.rem(i, 2)

            if mode != "nodma":
                @pl.when(i + 1 < pc)
                def _():
                    vfetch(i + 1, jax.lax.rem(i + 1, 2))
                vfetch_wait(i, slot)

            if mode not in ("nocompute",):
                xu = xpb_ref[slot, 0:4, :]
                xv = xpb_ref[slot, 4:8, :]
                xw = xpb_ref[slot, 8:12, :]
                odu = dot_f32x3(xu.T, None, b_split=od8_split)
                odv = dot_f32x3(xv.T, None, b_split=od8_split)
                odw = dot_f32x3(xw.T, None, b_split=od8_split)
                oou, ddu = odu[:, :b], odu[:, b:]
                oov, ddv = odv[:, :b], odv[:, b:]
                oow, ddw = odw[:, :b], odw[:, b:]
                nondeg = jnp.abs(ddw) >= 1e-12
                tt = -oow / jnp.where(nondeg, ddw, 1.0)
                uu = oou + tt * ddu
                vv = oov + tt * ddv
                if mode == "mm":
                    # keep the matmul+div results live without the mask
                    # chain: impossible sentinel comparison
                    occluded = jnp.maximum(
                        occluded,
                        jnp.where(jnp.max(tt + uu + vv, axis=0) > 3e38,
                                  1.0, 0.0))
                elif mode == "arith":
                    # mask-free epilogue: min-chain of signed margins
                    rowf = jax.lax.broadcasted_iota(
                        jnp.int32, (2 * nb, b), 0).astype(jnp.float32)
                    rel0 = prim_origin - c0 * nb
                    rel0f = jnp.where((rel0 >= 0) & (rel0 < nb),
                                      rel0, -1).astype(jnp.float32)
                    rel1 = prim_origin - c1 * nb + nb
                    rel1f = jnp.where((rel1 >= nb) & (rel1 < 2 * nb),
                                      rel1, -1).astype(jnp.float32)
                    m = jnp.minimum(tt, uu)
                    m = jnp.minimum(m, vv)
                    m = jnp.minimum(m, 1.0 - uu - vv)
                    m = jnp.minimum(m, limit[None, :] - tt)
                    m = jnp.minimum(m, jnp.abs(ddw) - 1e-12)
                    m = jnp.minimum(m, jnp.abs(rowf - rel0f[None, :]) - 0.5)
                    m = jnp.minimum(m, jnp.abs(rowf - rel1f[None, :]) - 0.5)
                    occluded = jnp.maximum(
                        occluded,
                        jnp.where(jnp.max(m, axis=0) > 0.0, 1.0, 0.0))
                else:
                    row = jax.lax.broadcasted_iota(
                        jnp.int32, (2 * nb, b), 0)
                    rel0 = prim_origin - c0 * nb
                    rel0 = jnp.where((rel0 >= 0) & (rel0 < nb), rel0, -1)
                    rel1 = prim_origin - c1 * nb + nb
                    rel1 = jnp.where(
                        (rel1 >= nb) & (rel1 < 2 * nb), rel1, -1)
                    blocked = (
                        nondeg & (tt > 0.0) & (uu >= 0.0) & (vv >= 0.0)
                        & (uu + vv <= 1.0)
                        & (tt < limit[None, :])
                        & (row != rel0[None, :]) & (row != rel1[None, :]))
                    occluded = jnp.maximum(
                        occluded,
                        jnp.max(blocked.astype(jnp.float32), axis=0))
            if mode == "noexit":
                done = i + 1 >= pc
            else:
                done = (i + 1 >= pc) | (jnp.min(occluded) > 0.5)
            return (i + 1, done, occluded)

        occ0 = jnp.where(~live, 1.0, 0.0)
        v_done, _, occluded = jax.lax.while_loop(
            lambda st: jnp.logical_not(st[1]),
            vis_body,
            (jnp.int32(0), (pc <= 0) | (jnp.min(occ0) > 0.5), occ0))

        if mode != "nodma":
            @pl.when((v_done > 0) & (v_done < pc))
            def _():
                vfetch_wait(v_done, jax.lax.rem(v_done, 2))
        out_ref[0, :, :] = occluded.reshape(cg, 128)

    return kern


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
    prev = jnp.zeros((fk.PT_CH, r))
    pt = fk.reuse_pallas(
        gb, prev, looper,
        scene.light_verts, scene.light_normal, scene.light_radiance,
        scene.light_area, scene.light_center, scene.light_radius,
        scene.tri_xform, scene.cluster_lo, scene.cluster_hi,
        scene.sub_lo, scene.sub_hi,
        k=cfg.cdf_candidates, single_sided=cfg.single_sided_lights,
        temporal=True, temporal_clamp=cfg.temporal_clamp)
    sync(pt)

    # rebuild the sorted inputs exactly as reuse_pallas does (reuse its
    # internals through a stripped jit)
    nl = scene.light_verts.shape[0]
    l_pad = fk._round_up(max(nl, 128), 128)
    n_tiles = r // fk._TILE
    tg = fk._TILE // 128

    # get rs via R1 (same as prof_hallsplit)
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
      fk._lp2(looper, 0))

    shade = gb[fk.G_SHADE].reshape(-1) > 0.5
    live = shade & (rs[fk.RS_W].reshape(-1) > 0.0)
    w3 = [rs[fk.RS_WI + ax].reshape(-1) for ax in range(3)]
    o3c = [gb[fk.G_POS + ax].reshape(-1) + w3[ax] * 1e-5 for ax in range(3)]
    limit = rs[fk.RS_DIST].reshape(-1) * (1.0 - 1e-3) - 1e-4
    limit = jnp.where(live, jnp.maximum(limit, 0.0), -1.0)
    o3 = jnp.stack(o3c, axis=-1)
    d3 = jnp.stack(w3, axis=-1)
    perm, inv_perm = fk._wavefront_perm(
        o3, d3, live, scene.cluster_lo, scene.cluster_hi)
    rp = jnp.stack(
        o3c + w3 + [limit, gb[fk.G_PRIM].reshape(-1)], axis=0)
    rp = jnp.take(rp, perm, axis=1)
    vcounts, vids, v_kp = fk._sub_block_lists(
        rp[fk.RP_O:fk.RP_O + 3], rp[fk.RP_D:fk.RP_D + 3],
        rp[fk.RP_LIM], rp[fk.RP_LIM] >= 0.0, fk._TILE,
        scene.cluster_lo, scene.cluster_hi)
    rp = rp.reshape(fk.RP_CH, g, 128)
    import numpy as np
    print("mean vcount:", float(jnp.mean(vcounts)),
          "live:", float(jnp.mean(live.astype(jnp.float32))))

    nb = 128
    n_tri = scene.tri_xform.shape[1] // 3
    n_pad = fk._round_up(max(n_tri, nb), nb)
    xu, xv, xw = fk._split_planes(scene.tri_xform, n_pad)
    xplanes = jnp.concatenate(
        [xu, xv, xw, jnp.zeros((4, n_pad), xu.dtype)], axis=0)

    for mode in ["full", "noexit", "mm", "arith", "nocompute"]:
        kern = make_kernel(mode, nb)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((fk.RP_CH, tg, 128), lambda i, *_: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, tg, 128), lambda i, *_: (0, i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.SMEM((v_kp,), jnp.int32),
                pltpu.SemaphoreType.DMA,
                pltpu.VMEM((2, 16, 2 * nb), jnp.float32),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
        )
        fn = jax.jit(lambda k2=kern, gs=grid_spec: pl.pallas_call(
            k2, grid_spec=gs,
            out_shape=jax.ShapeDtypeStruct((1, g, 128), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(vcounts, vids, rp, xplanes))
        print(mode, round(timeit(fn), 1))


if __name__ == "__main__":
    main()
