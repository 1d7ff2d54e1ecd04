"""Hall-scene stage decomposition on the real TPU (within-process A/B).

PYTHONPATH=/root/repo:/root/.axon_site python prof/prof_hallsplit.py
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

from restir_tpu.config import DenoiserType, RenderConfig, TracerType
from restir_tpu.ops.pallas import fused_di as fk


def sync(x):
    return float(jnp.sum(x)) if not isinstance(x, tuple) else float(
        jnp.sum(x[0]))


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
    from restir_tpu.config import mat_flags
    cfg = RenderConfig(width=width, height=height,
                       tracer=TracerType.RESTIR_DI,
                       denoiser=DenoiserType.EAW, **mat_flags(scene))
    print("mat flags:", cfg.scene_has_metallic, cfg.scene_has_dielectric)
    cam_vec = fk.pack_camera(cam, width, height)
    looper = jnp.uint32(0)

    gb_fn = jax.jit(lambda: fk.gbuffer_pack_pallas(
        cam_vec, cam_vec, looper, scene.tri_xform, scene.prim_attr,
        scene.mat_attr, scene.cluster_lo, scene.cluster_hi,
        width=width, height=height, aa_jitter=cfg.aa_jitter,
        single_sided=cfg.single_sided_lights))
    gb_sub_fn = jax.jit(lambda: fk.gbuffer_pack_pallas(
        cam_vec, cam_vec, looper, scene.tri_xform, scene.prim_attr,
        scene.mat_attr, scene.cluster_lo, scene.cluster_hi,
        scene.sub_lo, scene.sub_hi,
        width=width, height=height, aa_jitter=cfg.aa_jitter,
        single_sided=cfg.single_sided_lights))
    print("G (cluster pairs):", round(timeit(gb_fn), 1))
    print("G (sub-blocks):", round(timeit(gb_sub_fn), 1))
    gb = gb_sub_fn()
    prev = jnp.zeros((fk.PT_CH, r))

    reuse_fn = lambda: fk.reuse_pallas(  # noqa: E731
        gb, prev, looper,
        scene.light_verts, scene.light_normal, scene.light_radiance,
        scene.light_area, scene.light_center, scene.light_radius,
        scene.tri_xform, scene.cluster_lo, scene.cluster_hi,
        scene.sub_lo, scene.sub_hi,
        k=cfg.cdf_candidates, single_sided=cfg.single_sided_lights,
        temporal=True, temporal_clamp=cfg.temporal_clamp,
        has_met=cfg.scene_has_metallic)
    print("R total:", round(timeit(reuse_fn), 1))
    rs = None

    # R1 alone
    nl = scene.light_verts.shape[0]
    l_pad = fk._round_up(max(nl, 128), 128)
    tabs = fk.build_light_tables(
        scene.light_verts, scene.light_normal, scene.light_radiance,
        scene.light_area, scene.light_center, scene.light_radius, l_pad)
    psi_a, psi_b, psi_c, lum_aux, tri_lo, light_table = tabs
    n_tiles = r // fk._TILE
    tg = fk._TILE // 128
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    r1 = functools.partial(
        fk._ris_select_kernel, l_pad=l_pad, k=cfg.cdf_candidates,
        single_sided=cfg.single_sided_lights, n_area=nl, has_env=False,
        has_met=cfg.scene_has_metallic)
    r1_fn = jax.jit(lambda: pl.pallas_call(
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
      fk._lp2(looper, 0)))
    print("R1:", round(timeit(r1_fn), 1))
    rs = r1_fn()

    # XLA glue: payload-carrying sort + lists (gb/rs as jit ARGS —
    # closed-over constants let XLA fold gathers and lie)
    def glue(gb, rs, order):
        shade = gb[fk.G_SHADE].reshape(-1) > 0.5
        live = shade & (rs[fk.RS_W].reshape(-1) > 0.0)
        w3 = [rs[fk.RS_WI + ax].reshape(-1) for ax in range(3)]
        o3c = [gb[fk.G_POS + ax].reshape(-1) + w3[ax] * 1e-5
               for ax in range(3)]
        limit = rs[fk.RS_DIST].reshape(-1) * (1.0 - 1e-3) - 1e-4
        limit = jnp.where(live, jnp.maximum(limit, 0.0), -1.0)
        key = fk._wavefront_key(o3c, w3, live, scene.cluster_lo,
                                scene.cluster_hi)
        srt = jax.lax.sort(
            (key, jnp.arange(key.shape[0], dtype=jnp.int32))
            + tuple(o3c) + tuple(w3)
            + (limit, gb[fk.G_PRIM].reshape(-1)),
            num_keys=1)
        perm = srt[1]
        rp = jnp.stack(srt[2:], axis=0)
        vcounts, vids, v_kp = fk._sub_block_lists(
            rp[fk.RP_O:fk.RP_O + 3], rp[fk.RP_D:fk.RP_D + 3],
            rp[fk.RP_LIM], rp[fk.RP_LIM] >= 0.0, fk._TILE,
            scene.sub_lo, scene.sub_hi, order=order)
        return vcounts, vids, rp.reshape(fk.RP_CH, g, 128), perm

    glue_j = jax.jit(glue, static_argnames=("order",))
    print("glue near (sort+lists):",
          round(timeit(lambda: glue_j(gb, rs, "near")[1]), 1))
    print("glue id   (sort+lists):",
          round(timeit(lambda: glue_j(gb, rs, "id")[1]), 1))
    vcounts, vids, rp, perm = glue_j(gb, rs, "near")
    vcounts_id, vids_id, _, _ = glue_j(gb, rs, "id")
    v_kp = fk._round_up(scene.sub_lo.shape[0], 1024)

    n_tri = scene.tri_xform.shape[1] // 3
    nb = 128
    n_pad = fk._round_up(max(n_tri, nb), nb)
    xu, xv, xw = fk._split_planes(scene.tri_xform, n_pad)
    xplanes = jnp.concatenate(
        [jnp.concatenate(
            [xu, xv, xw, jnp.zeros((116, n_pad), xu.dtype)], axis=0).T,
         jnp.zeros((32, 128), xu.dtype)], axis=0)

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
            pltpu.VMEM((2, 256, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 8)),
        ],
    )
    def vis_fn(vc, vi, early):
        vk = functools.partial(fk._vis_sorted_kernel, early_exit=early)
        return jax.jit(lambda: pl.pallas_call(
            vk, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((1, g, 128), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(vc, vi, rp, xplanes))

    variants = {
        "id/noexit (old)": vis_fn(vcounts_id, vids_id, False),
        "id/exit": vis_fn(vcounts_id, vids_id, True),
        "near/exit": vis_fn(vcounts, vids, True),
    }
    import numpy as np
    outs = {}
    for name, f in variants.items():
        outs[name] = f()
        sync(outs[name])
    ref = np.asarray(outs["id/noexit (old)"])
    for name, o in outs.items():
        mism = float(np.mean(np.asarray(o) != ref))
        print(f"vis {name}: mismatch {mism:.2e}")
    for rep in range(3):
        for name, f in variants.items():
            print(f"vis {name}:", round(timeit(f), 1))
    occ_s = outs["near/exit"]
    unsort_j = jax.jit(lambda p, o: jax.lax.sort(
        (p, o.reshape(-1)), num_keys=1)[1])
    print("unsort occ:", round(timeit(
        lambda: unsort_j(perm, occ_s)), 1))


if __name__ == "__main__":
    main()
