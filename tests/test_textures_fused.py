"""Base-color textures on the fused pipeline.

The fused path fetches base-color textures from a mip-clamped VMEM
atlas (scene_data._build_fused_atlas) via one-hot row matmuls + lane
selects (fused_di._tex_bilinear — Mosaic has no gathers). Textures
<= 128 px wide are stored exactly, so the fused fetch must match the
general path's bilinear_sample (ops/texture.py, image.h:41-74)
bit-near; the procedural texture shares the exact pcg4d+sin math.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from restir_tpu import renderer
from restir_tpu.config import RenderConfig, TracerType
from restir_tpu.models import gbuffer as gbuf
from restir_tpu.models import restir_di_fused
from restir_tpu.ops.camera import make_camera
from restir_tpu.ops.pallas import fused_di as fk
from restir_tpu.scene import procedural

W, H = 128, 16
R = W * H


@pytest.fixture(scope="module")
def scene_cam():
    scene, camkw = procedural.textured_scene(bvh_impl="numpy")
    return scene, make_camera(**camkw)


def _cfg(**kw):
    kw.setdefault("width", W)
    kw.setdefault("height", H)
    kw.setdefault("tracer", TracerType.RESTIR_DI)
    kw.setdefault("ris_mode", "cdf")
    kw.setdefault("with_textures", True)
    return RenderConfig(**kw)


def _ch(pack, i):
    return np.asarray(pack[i]).reshape(-1)


def _ch3(pack, i):
    return np.stack([_ch(pack, i + k) for k in range(3)], axis=-1)


def test_fused_atlas_exact_for_small_textures(scene_cam):
    """<=128-wide textures round-trip through the atlas unchanged."""
    scene, _ = scene_cam
    atlas = np.asarray(scene.fused_atlas)
    meta = np.asarray(scene.fused_tex_meta)
    tex0 = np.asarray(scene.tex_data)[: 64 * 64].reshape(64, 64, 3)
    r0, w, h = int(meta[0, 0]), int(meta[0, 1]), int(meta[0, 2])
    assert (w, h) == (64, 64) and meta[0, 3] == 1.0
    got = np.stack(
        [atlas[c * 128:c * 128 + w, r0:r0 + h].T for c in range(3)], axis=-1
    )
    np.testing.assert_array_equal(got, tex0)


def test_textured_eligibility(scene_cam, monkeypatch):
    scene, cam = scene_cam
    cfg = _cfg()
    from restir_tpu.ops import intersect as ix
    monkeypatch.setattr(ix, "_on_tpu", lambda: True)
    assert restir_di_fused.eligible(scene, cfg)


def test_textured_gbuffer_albedo_matches_general(scene_cam):
    """Fused in-kernel texture fetch vs the general path's
    bilinear_sample + procedural, lane-for-lane on matched hits."""
    scene, cam = scene_cam
    cfg = _cfg(aa_jitter=False)
    looper = jnp.uint32(3)

    gb, it, mat, d = gbuf.render_gbuffer(scene, cam, cam, cfg, looper)
    cam_vec = fk.pack_camera(cam, cfg.width, cfg.height)
    pack = fk.gbuffer_pack_pallas(
        cam_vec, cam_vec, looper, scene.tri_xform, scene.prim_attr,
        scene.mat_attr, scene.cluster_lo, scene.cluster_hi,
        width=cfg.width, height=cfg.height, aa_jitter=False,
        single_sided=cfg.single_sided_lights,
        with_textures=True, fused_atlas=scene.fused_atlas,
        fused_tex_meta=scene.fused_tex_meta, interpret=True,
    )

    prim_ref = np.asarray(gb.prim_id)
    prim_got = _ch(pack, fk.G_PRIMR).astype(np.int32)
    ok = (prim_ref == prim_got) & (prim_ref >= 0)
    assert ok.mean() > 0.98
    alb_ref = np.asarray(gb.albedo)[ok]
    alb_got = _ch3(pack, fk.G_ALB)[ok]
    close = np.isclose(alb_ref, alb_got, rtol=1e-4, atol=1e-5).all(axis=-1)
    # ~1% of lanes straddle hard checkerboard texel edges where the
    # bf16-split hit test rounds uv across the boundary — a texel flip,
    # not a fetch error; all remaining lanes must be bit-near
    assert close.mean() > 0.98, close.mean()
    assert np.abs(alb_ref - alb_got).mean() < 0.01
    # the textured materials must actually vary across the surface
    assert alb_got.std(axis=0).max() > 0.05


@pytest.mark.slow
def test_textured_fused_step_statistical(scene_cam, monkeypatch):
    scene, cam = scene_cam
    cfg = _cfg()
    frames = 8

    from restir_tpu.ops import intersect as ix
    monkeypatch.setattr(ix, "_on_tpu", lambda: False)

    state = renderer.init_state(cfg, cam)
    f_general = None
    for _ in range(frames):
        state, f_general = renderer._step_jit_plain(scene, state, cam, cfg)
    img_general = np.asarray(f_general)

    fstate = restir_di_fused.init_state(cfg, cam)
    f_fused = None
    for _ in range(frames):
        fstate, f_fused = restir_di_fused.step_fused(
            scene, fstate, cam, cfg, interpret=True
        )
    img_fused = np.asarray(f_fused).reshape(3, -1).T

    assert np.isfinite(img_fused).all()
    ref = img_general.mean()
    assert abs(img_fused.mean() - ref) / max(ref, 1e-9) < 0.05, (
        img_fused.mean(), ref
    )


@pytest.fixture(scope="module")
def aux_scene_cam():
    scene, camkw = procedural.textured_scene(bvh_impl="numpy",
                                             aux_maps=True)
    return scene, make_camera(**camkw)


def test_aux_maps_eligibility(aux_scene_cam, monkeypatch):
    """Metallic/roughness/normal-mapped scenes run the fused path."""
    scene, cam = aux_scene_cam
    cfg = _cfg()
    from restir_tpu.ops import intersect as ix
    monkeypatch.setattr(ix, "_on_tpu", lambda: True)
    assert restir_di_fused.eligible(scene, cfg)


def test_aux_maps_gbuffer_matches_general(aux_scene_cam):
    """In-kernel metallic/roughness-map fetch + normal remap vs the
    general path (ops/primary.trace_primary), lane-for-lane."""
    scene, cam = aux_scene_cam
    cfg = _cfg(aa_jitter=False)
    looper = jnp.uint32(3)

    gb, it, mat, d = gbuf.render_gbuffer(scene, cam, cam, cfg, looper)
    cam_vec = fk.pack_camera(cam, cfg.width, cfg.height)
    pack = fk.gbuffer_pack_pallas(
        cam_vec, cam_vec, looper, scene.tri_xform, scene.prim_attr,
        scene.mat_attr, scene.cluster_lo, scene.cluster_hi,
        width=cfg.width, height=cfg.height, aa_jitter=False,
        single_sided=cfg.single_sided_lights,
        with_textures=True, fused_atlas=scene.fused_atlas,
        fused_tex_meta=scene.fused_tex_meta, interpret=True,
    )

    prim_ref = np.asarray(gb.prim_id)
    prim_got = _ch(pack, fk.G_PRIMR).astype(np.int32)
    ok = (prim_ref == prim_got) & (prim_ref >= 0)
    assert ok.mean() > 0.98

    met_ref = np.asarray(mat.metallic)[ok]
    met_got = _ch(pack, fk.G_METAL)[ok]
    close = np.isclose(met_ref, met_got, rtol=1e-4, atol=1e-5)
    assert close.mean() > 0.98, close.mean()
    # the metallic map must actually vary (stripes)
    assert met_got.std() > 0.05

    rough_ref = np.asarray(mat.roughness)[ok]
    rough_got = _ch(pack, fk.G_ROUGH)[ok]
    close = np.isclose(rough_ref, rough_got, rtol=1e-4, atol=1e-5)
    assert close.mean() > 0.98, close.mean()

    nrm_ref = np.asarray(it.norm)[ok]
    nrm_got = _ch3(pack, fk.G_NORM)[ok]
    close = np.isclose(nrm_ref, nrm_got, rtol=1e-3, atol=1e-4).all(axis=-1)
    assert close.mean() > 0.98, close.mean()
    # the normal-mapped wall's normals must actually be perturbed: the
    # flat wall would otherwise contribute a CONSTANT normal, so any
    # variation beyond the room's 6 flat planes shows the remap ran
    assert len(np.unique(np.round(nrm_got, 3), axis=0)) > 16
