"""Sharding the FUSED channel-major pipeline over row bands (shard_map).

The general pipeline shards transparently through `NamedSharding` (XLA
partitions whole-frame array ops and inserts the collectives). The
fused pipeline's Pallas kernels must be partitioned explicitly:
`shard_map` splits every [C, R/128, 128] pack on its row dim into
contiguous 1024-pixel-aligned bands, each device runs the SAME four
kernels on its band, and the only cross-device traffic is:

- temporal motion windows: a +-window halo of the previous frame's pt
  pack, exchanged with `jax.lax.ppermute` (nearest-neighbor ICI);
- spatial disk merges: a +-(radius rows) halo of the current pt pack;
- SVGF temporal accumulation: a +-window halo of the svgf pack;
- EAW / SVGF wavelet chains run OUTSIDE shard_map as plane ops under
  the same sharding — XLA inserts their row-halo collective-permutes.

RNG-stream identity with the single-chip step is maintained by passing
each band's global first-pixel index (pix0 = axis_index * band_pixels)
into the kernels, so a sharded frame is bit-comparable to a
single-device frame (tests/test_sharding.py::test_fused_sharded*).

This goes beyond the reference (strictly single-GPU, SURVEY.md §2
parallelism checklist).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import DenoiserType, RenderConfig, ReuseMode
from ..models import restir_di_fused as fused
from ..models.restir_di_fused import FusedDIState
from ..ops.pallas import fused_di as fk
from .sharding import PIXEL_AXIS

from jax import shard_map  # jax >= 0.8


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def pack_sharding(mesh: Mesh) -> NamedSharding:
    """[C, R/128, 128] packs shard their row dim into row bands."""
    return NamedSharding(mesh, P(None, PIXEL_AXIS, None))


def shard_fused_state(state: FusedDIState, mesh: Mesh) -> FusedDIState:
    pack = pack_sharding(mesh)
    rep = NamedSharding(mesh, P())

    def put(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim == 3 and leaf.shape[-1] == 128:
            return jax.device_put(leaf, pack)
        return jax.device_put(leaf, rep)

    return jax.tree.map(put, state)


def make_fused_sharded_step(cfg: RenderConfig, mesh: Mesh,
                            interpret: bool = False):
    """Returns jitted fn(scene, state, cam) -> (state', frame) running
    the fused DI pipeline with every pack sharded into row bands."""
    n = int(np.prod(mesh.devices.shape))
    w_img, h_img, r = cfg.width, cfg.height, cfg.num_pixels
    assert r % (n * fk._TILE) == 0, "bands must be 1024-pixel aligned"
    r_loc = r // n
    window = min(2048, r_loc)
    # spatial halo must cover the disk radius: taps reach up to
    # ceil(radius) rows away plus ceil(radius) lanes, and the kernel's
    # band-local DMA start is clamped — an undersized halo would fetch
    # wrong neighbor rows SILENTLY (the validity check uses global
    # frame bounds). Derive from cfg, don't hardcode radius 5.
    rad = int(np.ceil(cfg.spatial_radius))
    halo_s = min(_round_up((rad + 1) * w_img + 133, fk._TILE), r_loc)
    use_svgf = cfg.denoiser == DenoiserType.SVGF
    fwd = [(i, i + 1) for i in range(n - 1)]
    bwd = [(i + 1, i) for i in range(n - 1)]

    def body(xy, pt_prev, svgf_prev, accum, looper, iteration,
             cam_vec, lcam_vec, scene):
        pix0 = jax.lax.axis_index(PIXEL_AXIS) * r_loc

        gb = fk.gbuffer_pack_pallas(
            cam_vec, lcam_vec, looper, scene.tri_xform, scene.prim_attr,
            scene.mat_attr, scene.cluster_lo, scene.cluster_hi,
            width=w_img, height=h_img, aa_jitter=cfg.aa_jitter,
            single_sided=cfg.single_sided_lights,
            has_env=cfg.has_env_map, env_tile_rad=scene.env_tile_rad,
            with_textures=cfg.with_textures,
            fused_atlas=scene.fused_atlas,
            fused_tex_meta=scene.fused_tex_meta,
            pix0=pix0, xy=xy, interpret=interpret,
        )

        def haloed(flat, h):
            lo = jax.lax.ppermute(flat[:, r_loc - h:], PIXEL_AXIS, fwd)
            hi = jax.lax.ppermute(flat[:, :h], PIXEL_AXIS, bwd)
            return jnp.concatenate([lo, flat, hi], axis=1)

        prev_ext = haloed(pt_prev.reshape(fk.PT_CH, r_loc), window)
        pt = fk.reuse_pallas(
            gb, prev_ext, looper,
            scene.light_verts, scene.light_normal, scene.light_radiance,
            scene.light_area, scene.light_center, scene.light_radius,
            scene.tri_xform, scene.cluster_lo, scene.cluster_hi,
            scene.sub_lo, scene.sub_hi,
            k=cfg.cdf_candidates, single_sided=cfg.single_sided_lights,
            window=window,
            temporal=bool(cfg.reuse & ReuseMode.TEMPORAL),
            temporal_clamp=cfg.temporal_clamp,
            has_env=cfg.has_env_map, env_tile_rad=scene.env_tile_rad,
            env_tile_uv=scene.env_tile_uv, env_tile_sa=scene.env_tile_sa,
            has_met=cfg.scene_has_metallic,
            pix0=pix0, prev_base=pix0 - window, interpret=interpret,
        )

        pt_ext = haloed(pt.reshape(fk.PT_CH, r_loc), halo_s)
        accum2 = fk.spatial_shade_pallas(
            gb, pt, pt_ext, accum, looper, iteration,
            width=w_img, height=h_img, neighbors=cfg.spatial_neighbors,
            radius=cfg.spatial_radius, accumulate=cfg.accumulate,
            reuse_spatial=bool(cfg.reuse & ReuseMode.SPATIAL),
            has_met=cfg.scene_has_metallic,
            pix0=pix0, halo=halo_s, r_total=r, interpret=interpret,
        )

        if use_svgf:
            demod, _ = fused._svgf_demod(accum2, gb, cfg)
            sv_ext = haloed(svgf_prev.reshape(fk.SV_CH, r_loc), window)
            sv = fk.svgf_temporal_pallas(
                gb, demod, sv_ext, window=window,
                prev_base=pix0 - window, interpret=interpret,
            )
        else:
            sv = svgf_prev
        return gb, pt, accum2, sv

    pack = P(None, PIXEL_AXIS, None)
    rep = P()
    sharded_body = None  # built lazily inside jit closure below

    def step(scene, state, cam):
        cam_vec = fk.pack_camera(cam, w_img, h_img)
        lcam_vec = fk.pack_camera(state.last_camera, w_img, h_img)
        xy = fk.make_xy_grid(w_img, h_img)

        scene_specs = jax.tree.map(lambda _: rep, scene)
        gb, pt, accum, sv = shard_map(
            body, mesh=mesh,
            in_specs=(pack, pack, pack if use_svgf else rep, pack,
                      rep, rep, rep, rep, scene_specs),
            out_specs=(pack, pack, pack, pack if use_svgf else rep),
            check_vma=False,
        )(xy, state.pt_pack, state.svgf_pack, state.accum,
          state.looper, state.iteration, cam_vec, lcam_vec, scene)

        frame = accum
        svgf_pack = sv
        # use_pallas=False: the XLA plane wavelets partition under
        # NamedSharding with automatic row halos; a pallas_call here
        # (outside shard_map) would force a gather of the sharded frame
        if cfg.denoiser == DenoiserType.EAW:
            frame = fused.eaw_filter_packed(accum, gb, cfg,
                                            use_pallas=False)
        elif use_svgf:
            _, safe = fused._svgf_demod(accum, gb, cfg)
            frame, svgf_pack = fused._svgf_wavelets(sv, gb, safe, cfg,
                                                    use_pallas=False)

        next_state = FusedDIState(
            looper=state.looper + jnp.uint32(1),
            iteration=state.iteration + 1,
            accum=accum,
            pt_pack=pt,
            svgf_pack=svgf_pack,
            accum_ind=state.accum_ind,  # sharded path is DI-only
            gi_q=state.gi_q,
            last_camera=cam,
        )
        return next_state, frame

    return jax.jit(step, donate_argnums=(1,))
