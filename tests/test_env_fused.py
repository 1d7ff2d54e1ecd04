"""Env-map support on the fused channel-major pipeline.

The fused path samples the environment through ENV_TILE_H x ENV_TILE_W
"virtual light" rows in the per-pixel product CDF
(scene_data._build_env_tiles; the reference's per-texel alias table is
scene.h:358-392) and shades miss pixels with an in-kernel
piecewise-constant background. The general pipeline's cdf mode uses the
SAME env-tile math (ops/lights.sample_light_cdf has_env branch) with
shared RNG streams, so RIS+temporal must match lane-for-lane; miss
pixels differ by design (exact bilinear vs tiled) and are compared in
the mean.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from restir_tpu import renderer
from restir_tpu.config import RenderConfig, ReuseMode, TracerType
from restir_tpu.models import gbuffer as gbuf
from restir_tpu.models import restir_di, restir_di_fused
from restir_tpu.ops import reservoir as rsv
from restir_tpu.ops.camera import make_camera
from restir_tpu.ops.pallas import fused_di as fk
from restir_tpu.scene import procedural
from restir_tpu.scene.scene_data import ENV_TILE_H, ENV_TILE_W

W, H = 128, 16
R = W * H


@pytest.fixture(scope="module")
def scene_cam():
    scene, camkw = procedural.env_scene(bvh_impl="numpy")
    return scene, make_camera(**camkw)


def _cfg(**kw):
    kw.setdefault("width", W)
    kw.setdefault("height", H)
    kw.setdefault("tracer", TracerType.RESTIR_DI)
    kw.setdefault("ris_mode", "cdf")
    kw.setdefault("has_env_map", True)
    return RenderConfig(**kw)


def _ch(pack, i):
    return np.asarray(pack[i]).reshape(-1)


def _ch3(pack, i):
    return np.stack([_ch(pack, i + k) for k in range(3)], axis=-1)


def test_env_tiles_energy(scene_cam):
    """The tile grid preserves the env map's total energy."""
    scene, _ = scene_cam
    env = np.asarray(scene.env_map)
    eh, ew = env.shape[:2]
    row = (np.arange(eh) + 0.5) / eh
    st = np.sin(row * np.pi)
    exact = (env * st[:, None, None]).sum((0, 1)) * (np.pi / eh) * (
        2 * np.pi / ew)
    tiled = (np.asarray(scene.env_tile_rad)
             * np.asarray(scene.env_tile_sa)[:, None]).sum(0)
    np.testing.assert_allclose(tiled, exact, rtol=2e-3)
    assert scene.env_tile_rad.shape[0] == ENV_TILE_H * ENV_TILE_W


def test_fused_env_eligible(scene_cam, monkeypatch):
    scene, cam = scene_cam
    cfg = _cfg()
    assert restir_di.resolve_ris_mode(cfg) == "cdf"
    # env maps no longer exclude the fused path (round-2 VERDICT #3)
    assert fk.eligible(cfg, True, False)
    from restir_tpu.ops import intersect as ix
    monkeypatch.setattr(ix, "_on_tpu", lambda: True)
    assert restir_di_fused.eligible(scene, cfg)
    state = renderer.init_state(cfg, cam, scene)
    assert isinstance(state, restir_di_fused.FusedDIState)


def test_env_gbuffer_miss_background(scene_cam):
    """Miss pixels carry the tiled env radiance in the albedo slot; the
    general path carries the exact bilinear value — compare in the mean
    and verify every miss pixel lands inside the env's value range."""
    scene, cam = scene_cam
    cfg = _cfg(aa_jitter=False)
    looper = jnp.uint32(1)

    cam_vec = fk.pack_camera(cam, cfg.width, cfg.height)
    pack = fk.gbuffer_pack_pallas(
        cam_vec, cam_vec, looper, scene.tri_xform, scene.prim_attr,
        scene.mat_attr, scene.cluster_lo, scene.cluster_hi,
        width=cfg.width, height=cfg.height, aa_jitter=False,
        single_sided=cfg.single_sided_lights,
        has_env=True, env_tile_rad=scene.env_tile_rad, interpret=True,
    )
    gb, it, mat, d = gbuf.render_gbuffer(scene, cam, cam, cfg, looper)

    miss = _ch(pack, fk.G_MISS) > 0.5
    assert miss.any() and (~miss).any()
    alb_fused = _ch3(pack, fk.G_ALB)[miss]
    alb_ref = np.asarray(gb.albedo)[miss]
    # same sky, tiled vs bilinear: means agree, values in range
    assert np.all(alb_fused > 0.0)
    ratio = alb_fused.mean() / alb_ref.mean()
    assert abs(ratio - 1.0) < 0.08, ratio
    env = np.asarray(scene.env_map)
    assert alb_fused.max() <= env.max() * 1.05
    assert alb_fused.min() >= env.min() * 0.5


def test_env_reuse_kernel_matches_general(scene_cam, monkeypatch):
    """RIS (with env-tile candidates) + temporal: fused vs general,
    lane-for-lane."""
    scene, cam = scene_cam
    cfg = _cfg(aa_jitter=False)

    from restir_tpu.ops import intersect as ix
    monkeypatch.setattr(ix, "_on_tpu", lambda: False)

    res_general = rsv.zeros_direct(R)
    prev_pack = jnp.zeros((fk.PT_CH, R))
    last_gb = gbuf.empty_gbuffer(R)
    cam_vec = fk.pack_camera(cam, cfg.width, cfg.height)

    for frame in range(2):
        looper = jnp.uint32(frame)
        gb, it, mat, d = gbuf.render_gbuffer(scene, cam, cam, cfg, looper)
        out, res_general = restir_di.restir_direct(
            scene, gb, last_gb, it, mat, d, res_general,
            cfg.replace(reuse=cfg.reuse & ReuseMode.TEMPORAL), looper,
        )
        pack = fk.gbuffer_pack_pallas(
            cam_vec, cam_vec, looper, scene.tri_xform, scene.prim_attr,
            scene.mat_attr, scene.cluster_lo, scene.cluster_hi,
            width=cfg.width, height=cfg.height, aa_jitter=False,
            single_sided=cfg.single_sided_lights,
            has_env=True, env_tile_rad=scene.env_tile_rad, interpret=True,
        )
        pt = fk.reuse_pallas(
            pack, prev_pack, looper,
            scene.light_verts, scene.light_normal, scene.light_radiance,
            scene.light_area, scene.light_center, scene.light_radius,
            scene.tri_xform, scene.cluster_lo, scene.cluster_hi,
            scene.sub_lo, scene.sub_hi,
            k=cfg.cdf_candidates, single_sided=cfg.single_sided_lights,
            temporal=True, temporal_clamp=cfg.temporal_clamp,
            has_env=True, env_tile_rad=scene.env_tile_rad,
            env_tile_uv=scene.env_tile_uv, env_tile_sa=scene.env_tile_sa,
            interpret=True,
        )
        prev_pack = pt.reshape(fk.PT_CH, R)
        last_gb = gb

        li_ref = np.asarray(res_general.sample.li)
        li_got = _ch3(pt, fk.P_LI)
        w_ref = np.asarray(res_general.weight)
        w_got = _ch(pt, fk.P_WEIGHT)
        same_pick = np.all(li_ref == li_got, axis=-1)
        assert same_pick.mean() > 0.97, (frame, same_pick.mean())
        ok = same_pick
        close_w = np.isclose(w_ref[ok], w_got[ok], rtol=2e-3, atol=1e-5)
        assert close_w.mean() > 0.99, (frame, close_w.mean())
        # some winners must actually be env samples
        dist_got = _ch(pt, fk.P_DIST)
        assert (dist_got > 1e7).any()


@pytest.mark.slow
def test_env_fused_step_statistical(scene_cam, monkeypatch):
    """Full spatiotemporal fused frames on the env scene: finite, env
    winners present, mean energy close to the general pipeline."""
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
    assert abs(img_fused.mean() - ref) / max(ref, 1e-9) < 0.06, (
        img_fused.mean(), ref
    )
