"""Denoiser tests: EAW / SVGF smoothing + edge preservation."""

import numpy as np
import jax.numpy as jnp
import pytest

from restir_tpu.config import DenoiserType, RenderConfig, TracerType
from restir_tpu.models import denoiser as dn
from restir_tpu.models.gbuffer import GBufferFrame, NULL_PRIMITIVE
from restir_tpu.ops.camera import make_camera
from restir_tpu.scene.procedural import cornell_box
from restir_tpu import renderer

W = H = 32
R = W * H


def _flat_gbuffer(prim_plane, norm=None):
    """Synthetic G-buffer: constant normal/pos per prim id region."""
    prim = jnp.asarray(prim_plane.reshape(-1), jnp.int32)
    if norm is None:
        n = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (R, 1))
    else:
        n = jnp.asarray(norm.reshape(-1, 3))
    pos = jnp.stack(
        [jnp.arange(R) % W * 0.01, jnp.arange(R) // W * 0.01, jnp.zeros(R)], -1
    ).astype(jnp.float32)
    return GBufferFrame(
        albedo=jnp.ones((R, 3)),
        norm=n,
        prim_id=prim,
        depth=jnp.ones((R,)),
        pos=pos,
        motion=jnp.arange(R, dtype=jnp.int32),
    )


def test_eaw_reduces_noise_flat_region():
    rng = np.random.default_rng(0)
    noisy = 0.5 + 0.2 * rng.standard_normal((R, 3)).astype(np.float32)
    gb = _flat_gbuffer(np.zeros((H, W), np.int32))
    cfg = RenderConfig(width=W, height=H, modulate_albedo=False)
    cam = make_camera((0, 0, 0))
    out = np.asarray(dn.eaw_filter(jnp.asarray(noisy), gb, cam, cfg))
    assert out.std() < noisy.std() * 0.5
    assert abs(out.mean() - noisy.mean()) < 0.01


def test_eaw_preserves_prim_edges():
    """Taps across a primId boundary are skipped (denoiser.cu:107-109)."""
    prim = np.zeros((H, W), np.int32)
    prim[:, W // 2:] = 1
    img = np.zeros((H, W, 3), np.float32)
    img[:, W // 2:] = 1.0
    gb = _flat_gbuffer(prim)
    cfg = RenderConfig(width=W, height=H, modulate_albedo=False)
    cam = make_camera((0, 0, 0))
    out = np.asarray(dn.eaw_filter(jnp.asarray(img.reshape(-1, 3)), gb, cam, cfg))
    out = out.reshape(H, W, 3)
    assert np.allclose(out[:, : W // 2], 0.0, atol=1e-5)
    assert np.allclose(out[:, W // 2:], 1.0, atol=1e-5)


def test_svgf_temporal_accumulate_blends():
    gb = _flat_gbuffer(np.zeros((H, W), np.int32))
    state = dn.init_svgf_state(R)
    c0 = jnp.ones((R, 3))
    # first frame: history rejected (last prim_id = -1) => passthrough
    last_gb = gb._replace(prim_id=jnp.full((R,), NULL_PRIMITIVE, jnp.int32))
    state = dn.svgf_temporal_accumulate(c0, gb, last_gb, state)
    assert np.allclose(np.asarray(state.accum_color), 1.0)
    assert np.allclose(np.asarray(state.accum_moment[:, 2]), 0.0)
    # second frame with valid history: alpha blend at 0.2
    c1 = jnp.zeros((R, 3))
    state = dn.svgf_temporal_accumulate(c1, gb, gb, state)
    assert np.allclose(np.asarray(state.accum_color), 0.8, atol=1e-5)
    assert np.allclose(np.asarray(state.accum_moment[:, 2]), 1.0)


@pytest.mark.slow
def test_svgf_end_to_end_smooths():
    """SVGF on a genuinely noisy signal: single-frame full path tracing
    (bounce noise). Emissive/miss pixels are excluded: the filter passes
    them through by design (denoiser.cu:79-82), and their residual is AA
    edge noise, not shading noise."""
    from restir_tpu.models import gbuffer as gbuf

    scene, camkw = cornell_box(bvh_impl="numpy")
    cam = make_camera(**camkw)
    base = RenderConfig(width=W, height=H, tracer=TracerType.PT_FULL,
                        accumulate=False, trace_depth=3)
    svgf_cfg = base.replace(denoiser=DenoiserType.SVGF)

    _, raw = renderer.render(scene, cam, base, 8)
    _, den = renderer.render(scene, cam, svgf_cfg, 8)
    _, ref = renderer.render(scene, cam, base.replace(accumulate=True), 400)

    gb, it, _, _ = gbuf.render_gbuffer(scene, cam, cam, base, 7)
    mask = np.asarray(gb.prim_id) >= 0  # surface pixels only

    raw, den, ref = map(np.asarray, (raw, den, ref))
    err_raw = np.sqrt(((raw - ref) ** 2).mean(-1)[mask].mean())
    err_den = np.sqrt(((den - ref) ** 2).mean(-1)[mask].mean())
    assert np.isfinite(den).all()
    assert err_den < err_raw * 0.7, (err_den, err_raw)
