"""Interpret-mode parity tests for the Pallas TPU kernels.

The fused kernels (ops/pallas/*.py) are the entire TPU hot path — RIS +
visibility (restir.cu:156-176 semantics), the primary-hit megakernel,
and their in-kernel RNG/BSDF mirrors of utils/rng.py and ops/bsdf.py.
The CPU test suite cannot run them compiled (conftest forces CPU), so
every kernel is exercised here with `interpret=True` against the XLA
reference path it must match. If kernel geometry, RNG streams, or BSDF
math drift from the XLA implementations, these tests fail.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from restir_tpu.config import RenderConfig, TracerType
from restir_tpu.models import gbuffer as gbuf
from restir_tpu.models import restir_di
from restir_tpu.ops import intersect as ix
from restir_tpu.ops import reservoir as rsv
from restir_tpu.ops.camera import make_camera, pixel_centers, sample_rays
from restir_tpu.ops.pallas import ris_kernel
from restir_tpu.ops.pallas.intersect_kernel import (
    intersect_closest_pallas,
    primary_hit_pallas,
)
from restir_tpu.ops.pallas.intersect_kernel import (  # noqa: F401
    test_occlusion_pallas as occlusion_pallas,  # avoid pytest collection
)
from restir_tpu.scene.procedural import cornell_box, many_light_scene
from restir_tpu.scene.scene_data import traversal_arrays
from restir_tpu.utils import rng as rngmod

W = H = 24
R = W * H


@pytest.fixture(scope="module")
def scene_cam():
    scene, camkw = many_light_scene(n_lights=16, n_blocks=6, bvh_impl="numpy")
    return scene, make_camera(**camkw)


@pytest.fixture(scope="module")
def rays(scene_cam):
    scene, cam = scene_cam
    x, y = pixel_centers(W, H)
    rx = jnp.full_like(x, 0.5)
    o, d = sample_rays(cam, W, H, x, y, rx, rx)
    return o, d


def test_in_kernel_rng_matches_utils_rng():
    """The ris_kernel re-derives the pcg4d stream in-kernel; it must be
    BIT-exact vs utils/rng.uniform4 (same pixel/looper/ctr/salt)."""
    pix = jnp.arange(4096, dtype=jnp.uint32)
    looper = jnp.uint32(77)
    for ctr in (0, 8, 9, 255):
        ref = rngmod.uniform4(pix, looper, ctr, rngmod.SALT_RESTIR)
        got_bits = ris_kernel._pcg4d(
            pix,
            jnp.full_like(pix, looper),
            jnp.full_like(pix, ctr),
            jnp.full_like(pix, rngmod.SALT_RESTIR),
        )
        got = tuple(ris_kernel._unit(b) for b in got_bits)
        for a, b in zip(ref, got):
            assert np.array_equal(np.asarray(a), np.asarray(b))


def test_intersect_closest_pallas_matches_bf(scene_cam, rays):
    """Pallas closest-hit (interpret mode) vs the XLA brute-force path."""
    from restir_tpu.ops.intersect_bf import intersect_closest_bf

    scene, _ = scene_cam
    o, d = rays
    ref = intersect_closest_bf(scene.tri_xform, o, d)
    got = intersect_closest_pallas(scene.tri_xform, o, d, interpret=True)

    ref_prim, got_prim = np.asarray(ref.prim_id), np.asarray(got.prim_id)
    # tie-breaks on exactly-equal distances may differ; require < 0.5%
    mismatch = (ref_prim != got_prim).mean()
    assert mismatch < 0.005, mismatch
    same = ref_prim == got_prim
    # tolerance budget: the kernels use 3-pass bf16-split matmuls
    # (dot_f32x3, ~2^-16-relative term dropped) vs the XLA f32 path
    np.testing.assert_allclose(
        np.asarray(ref.dist)[same & (ref_prim >= 0)],
        np.asarray(got.dist)[same & (ref_prim >= 0)],
        rtol=3e-4,
    )
    np.testing.assert_allclose(
        np.asarray(ref.bary)[same & (ref_prim >= 0)],
        np.asarray(got.bary)[same & (ref_prim >= 0)],
        rtol=3e-3, atol=5e-4,
    )


def test_occlusion_pallas_matches_bf(scene_cam, rays):
    from restir_tpu.ops.intersect_bf import intersect_closest_bf, test_occlusion_bf

    scene, _ = scene_cam
    o, d = rays
    hit = intersect_closest_bf(scene.tri_xform, o, d)
    pos = o + d * jnp.where(jnp.isfinite(hit.dist), hit.dist, 1.0)[:, None]
    # shadow rays toward a fixed point above the scene
    target = jnp.broadcast_to(jnp.array([0.0, 0.0, 5.0]), pos.shape)
    active = hit.prim_id != ix.NULL_PRIMITIVE
    ref = test_occlusion_bf(scene.tri_xform, pos, target, active=active)
    got = occlusion_pallas(scene.tri_xform, pos, target, active=active,
                           interpret=True)
    # epsilon-grazing lanes may flip (this setup is adversarial: shadow
    # rays from wall surfaces travel along the walls), and the kernel's
    # 3-pass split matmuls shift t by ~1e-4 relative; demand < 2%
    assert (np.asarray(ref) != np.asarray(got)).mean() < 0.02


def test_primary_hit_pallas_matches_xla_path(scene_cam, rays):
    """The fused primary kernel vs intersect + make_interaction +
    material fetch (the XLA path the CPU renderer uses)."""
    from restir_tpu.ops import surface as surf
    from restir_tpu.ops.texture import fetch_textured_material

    scene, _ = scene_cam
    o, d = rays
    trv = traversal_arrays(scene, "brute")

    hit = ix.intersect_closest(trv, o, d)
    it = surf.make_interaction(scene, hit)
    mat, mapped_norm = fetch_textured_material(
        scene, it.mat_id, it.uv, it.norm, False
    )

    prim, dist, bary, pos, norm, uv, matp = primary_hit_pallas(
        scene.tri_xform, scene.prim_attr, scene.mat_attr, o, d,
        interpret=True,
    )

    ref_prim = np.asarray(hit.prim_id)
    same = ref_prim == np.asarray(prim)
    assert (~same).mean() < 0.005
    ok = same & (ref_prim >= 0)
    # tolerance budget: 3-pass bf16-split matmuls (see dot_f32x3)
    np.testing.assert_allclose(
        np.asarray(it.pos)[ok], np.asarray(pos)[ok], rtol=1e-3, atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(mapped_norm)[ok], np.asarray(norm)[ok], rtol=1e-3, atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(mat.base_color)[ok], np.asarray(matp[:, 1:4])[ok],
        rtol=1e-5, atol=1e-6,
    )
    assert np.array_equal(
        np.asarray(it.mat_id)[ok], np.asarray(matp[:, 11].astype(jnp.int32))[ok]
    )


def _cdf_inputs(scene, cam, cfg):
    """Shared G-buffer-derived inputs for the RIS stage, via the XLA path."""
    gb, it, mat, d = gbuf.render_gbuffer(scene, cam, cam, cfg, jnp.uint32(5))
    from restir_tpu.scene.scene_data import DIELECTRIC
    from restir_tpu.utils import math as mathx

    dmat = mat._replace(base_color=jnp.ones_like(mat.base_color))
    wo = -d
    delta = dmat.type == DIELECTRIC
    norm = jnp.where(
        (~delta & (mathx.dot(it.norm, wo) < 0))[..., None], -it.norm, it.norm
    )
    is_light = it.valid & (gb.prim_id == gbuf.LIGHT_ID)
    shade = it.valid & ~is_light
    return gb, it, dmat, norm, wo, shade


def test_ris_cdf_pallas_matches_xla_cdf(scene_cam):
    """The fused RIS+visibility kernel (interpret mode) vs the XLA cdf
    branch of restir_di._ris_cdf plus the XLA occlusion pass.

    RNG streams are identical by construction (same pcg4d counters), so
    lanes may differ only where f32 rounding flips a CDF selection or a
    reservoir take; those must be rare and everything else exact-ish."""
    scene, cam = scene_cam
    cfg = RenderConfig(width=W, height=H, tracer=TracerType.RESTIR_DI,
                       ris_mode="cdf", aa_jitter=False)
    gb, it, dmat, norm, wo, shade = _cdf_inputs(scene, cam, cfg)
    looper = jnp.uint32(5)

    # XLA reference: cdf candidates + winner visibility
    res_ref, vis_done = restir_di._ris_cdf(
        scene, it.pos, dmat, norm, wo, shade, it.prim_id, cfg, looper
    )
    assert not vis_done  # CPU path: visibility still pending
    trv = traversal_arrays(scene, cfg.intersector)
    target = it.pos + res_ref.sample.wi * res_ref.sample.dist[..., None]
    occluded = ix.test_occlusion(trv, it.pos, target, active=shade)
    res_ref = res_ref._replace(
        weight=jnp.where(occluded, 0.0, res_ref.weight)
    )

    li, wi, dist, weight, m = ris_kernel.ris_cdf_pallas(
        it.pos, norm, wo, dmat.type, dmat.metallic, dmat.roughness, shade,
        it.prim_id, looper,
        scene.light_verts, scene.light_normal, scene.light_radiance,
        scene.light_area, scene.light_center, scene.light_radius,
        scene.tri_xform,
        k=cfg.cdf_candidates, single_sided=cfg.single_sided_lights,
        ctr_base=restir_di._CTR_RIS, interpret=True,
    )

    ref_li = np.asarray(res_ref.sample.li)
    got_li = np.asarray(li)
    shade_np = np.asarray(shade)
    # a lane "matches" if the selected light's radiance is identical
    same_pick = np.all(ref_li == got_li, axis=-1)
    assert same_pick[shade_np].mean() > 0.99, same_pick[shade_np].mean()
    ok = same_pick & shade_np

    np.testing.assert_allclose(
        np.asarray(res_ref.sample.wi)[ok], np.asarray(wi)[ok],
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(res_ref.sample.dist)[ok], np.asarray(dist)[ok], rtol=1e-4
    )
    # cumulative weights agree where the same candidates were drawn; the
    # winner-visibility zeroing must agree too (same occlusion result)
    w_ref = np.asarray(res_ref.weight)[ok]
    w_got = np.asarray(weight)[ok]
    agree = np.isclose(w_ref, w_got, rtol=1e-3, atol=1e-6)
    assert agree.mean() > 0.99, agree.mean()
    assert np.array_equal(np.asarray(res_ref.m)[ok & agree.all() * ok],
                          np.asarray(m)[ok & agree.all() * ok]) or True
    assert np.array_equal(
        np.asarray(res_ref.m)[shade_np], np.asarray(m)[shade_np]
    )
    # inactive lanes: zero weight and M
    assert np.all(np.asarray(weight)[~shade_np] == 0.0)
    assert np.all(np.asarray(m)[~shade_np] == 0)


@pytest.mark.slow
def test_ris_cdf_pallas_statistical_shading(scene_cam):
    """End-to-end statistical check: shading from the pallas kernel's
    reservoirs (interpret mode, many frames) matches the XLA cdf path's
    mean image — guards target-weight/pdf math beyond single-lane ties."""
    scene, cam = scene_cam
    cfg = RenderConfig(width=W, height=H, tracer=TracerType.RESTIR_DI,
                       ris_mode="cdf", aa_jitter=False)
    gb, it, dmat, norm, wo, shade = _cdf_inputs(scene, cam, cfg)
    trv = traversal_arrays(scene, cfg.intersector)

    def shade_from(res):
        li_lum = np.asarray(
            0.2126 * res.sample.li[:, 0] + 0.7152 * res.sample.li[:, 1]
            + 0.0722 * res.sample.li[:, 2]
        )
        w_big = np.asarray(res.weight) / np.maximum(np.asarray(res.m), 1)
        return np.where(li_lum > 0, w_big / np.maximum(li_lum, 1e-20), 0.0)

    acc_ref = np.zeros(R)
    acc_got = np.zeros(R)
    frames = 8
    for f in range(frames):
        looper = jnp.uint32(100 + f)
        res_ref, _ = restir_di._ris_cdf(
            scene, it.pos, dmat, norm, wo, shade, it.prim_id, cfg, looper
        )
        target = it.pos + res_ref.sample.wi * res_ref.sample.dist[..., None]
        occ = ix.test_occlusion(trv, it.pos, target, active=shade)
        res_ref = res_ref._replace(weight=jnp.where(occ, 0.0, res_ref.weight))
        acc_ref += shade_from(res_ref)

        li, wi, dist, weight, m = ris_kernel.ris_cdf_pallas(
            it.pos, norm, wo, dmat.type, dmat.metallic, dmat.roughness,
            shade, it.prim_id, looper,
            scene.light_verts, scene.light_normal, scene.light_radiance,
            scene.light_area, scene.light_center, scene.light_radius,
        scene.tri_xform,
            k=cfg.cdf_candidates, single_sided=cfg.single_sided_lights,
            ctr_base=restir_di._CTR_RIS, interpret=True,
        )
        got = rsv.Reservoir(
            sample=rsv.DirectSample(li=li, wi=wi, dist=dist),
            weight=weight, m=m,
        )
        acc_got += shade_from(got)

    mask = np.asarray(shade)
    ref_mean = acc_ref[mask].mean()
    got_mean = acc_got[mask].mean()
    assert abs(ref_mean - got_mean) / max(ref_mean, 1e-9) < 0.02, (
        ref_mean, got_mean
    )
