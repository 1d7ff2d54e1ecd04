"""Parity tests for the Pallas à-trous kernels (ops/pallas/atrous_kernel)
against the XLA plane-shift reference in models/denoiser.py — the same
math as the reference's waveletFilter kernels (denoiser.cu:64-216).

Synthetic structured inputs (piecewise-constant prim regions, smooth
position/normal fields, noisy color) exercise every mask: frame bounds
(top/bottom band clipping, lane-crossing x taps), prim mismatch, and
miss-pixel passthrough.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from restir_tpu.config import RenderConfig, TracerType
from restir_tpu.models import denoiser as dn
from restir_tpu.models import restir_di_fused as fused
from restir_tpu.ops.pallas import atrous_kernel as ak
from restir_tpu.ops.pallas import fused_di as fk

W, H = 256, 32
G = W * H // 128


def _cfg(**kw):
    kw.setdefault("width", W)
    kw.setdefault("height", H)
    kw.setdefault("tracer", TracerType.RESTIR_DI)
    return RenderConfig(**kw)


def _synthetic(seed=0, w=W, h=H):
    """(color [3,h,w], prim [h,w], norm [3,h,w], pos [3,h,w], var [h,w])"""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    # prim regions: 8x32 blocks of constant id, some NULL (miss) and
    # LIGHT_ID patches for the passthrough path
    prim = (np.floor(yy / 8) * 8 + np.floor(xx / 32)).astype(np.float32)
    prim[h // 2:h // 2 + 4, :16] = -1.0  # NULL
    prim[:4, -16:] = -2.0  # LIGHT_ID
    norm = np.stack([np.sin(xx * 0.05), np.cos(yy * 0.07),
                     np.ones_like(xx)], 0)
    norm /= np.linalg.norm(norm, axis=0, keepdims=True)
    pos = np.stack([xx * 0.01, yy * 0.01, 1.0 + 0.001 * xx * yy], 0)
    color = np.abs(rng.randn(3, h, w)).astype(np.float32)
    var = np.abs(rng.randn(h, w)).astype(np.float32) * 0.1
    return (jnp.asarray(color), jnp.asarray(prim), jnp.asarray(norm),
            jnp.asarray(pos), jnp.asarray(var))


def _pack(hw_arr):
    """[..., h, w] -> [..., R/128, 128]"""
    a = jnp.asarray(hw_arr)
    lead = a.shape[:-2]
    return a.reshape(lead + (a.shape[-2] * a.shape[-1] // 128, 128))


@pytest.mark.parametrize("level", [0, 1, 2])
def test_eaw_level_matches_xla(level):
    cfg = _cfg()
    color, prim, norm, pos, _ = _synthetic()
    ref = dn.eaw_filter_level(color, (prim, norm, pos), cfg, level)

    band = ak.pick_band(G, 1 << level, W // 128, ak.C_EAW)
    assert band is not None and G % band == 0
    inp = jnp.concatenate([
        _pack(color), _pack(prim)[None], _pack(norm), _pack(pos)], 0)
    got = ak.atrous_level_pallas(
        inp, mode="eaw", level=level, width=W, height=H, band=band,
        sig_l=cfg.sig_luminance, sig_n=cfg.sig_normal,
        sig_d=cfg.sig_depth, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got).reshape(3, H, W), np.asarray(ref),
        rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("level", [0, 2])
def test_svgf_level_matches_xla(level):
    cfg = _cfg()
    color, prim, norm, pos, var = _synthetic(seed=3)
    ref_c, ref_v = dn.svgf_wavelet_level(
        color, var, (prim, norm, pos), cfg, level)

    band = ak.pick_band(G, 1 << level, W // 128, ak.C_SVGF)
    assert band is not None
    fv = dn.svgf_filter_variance(var)
    inp = jnp.concatenate([
        _pack(color), _pack(prim)[None], _pack(norm), _pack(pos),
        _pack(var)[None], _pack(fv)[None]], 0)
    got = ak.atrous_level_pallas(
        inp, mode="svgf", level=level, width=W, height=H, band=band,
        sig_l=cfg.sig_luminance, sig_n=cfg.svgf_sig_normal,
        sig_d=cfg.svgf_sig_depth, interpret=True)
    got = np.asarray(got)
    # svgf wn uses exp(sig*log x) in-kernel vs jnp.power in XLA: allow
    # a hair more slack than the EAW test
    np.testing.assert_allclose(
        got[0:3].reshape(3, H, W), np.asarray(ref_c), rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(
        got[3].reshape(H, W), np.asarray(ref_v), rtol=2e-4, atol=1e-6)


def test_eaw_small_frame_band_equals_g():
    """W=128/H=16 (g=16): levels whose tap reach exceeds the frame use
    the band == g escape hatch + out-of-frame tap skipping."""
    w, h = 128, 16
    g = w * h // 128
    cfg = _cfg(width=w, height=h)
    color, prim, norm, pos, _ = _synthetic(seed=5, w=w, h=h)
    x = color
    for level in range(4):
        x = dn.eaw_filter_level(x, (prim, norm, pos), cfg, level)
    ref = x

    guide = jnp.concatenate([_pack(prim)[None], _pack(norm), _pack(pos)], 0)
    got = _pack(color)
    for level in range(4):
        band = ak.pick_band(g, 1 << level, w // 128, ak.C_EAW)
        assert band is not None
        got = ak.atrous_level_pallas(
            jnp.concatenate([got, guide], 0), mode="eaw", level=level,
            width=w, height=h, band=band, sig_l=cfg.sig_luminance,
            sig_n=cfg.sig_normal, sig_d=cfg.sig_depth, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got).reshape(3, h, w), np.asarray(ref),
        rtol=1e-4, atol=1e-6)


def test_fused_eaw_pallas_matches_plane_chain():
    """End-to-end eaw_filter_packed: use_pallas=True vs the XLA plane
    chain (the sharded-path variant), full 5-level default config."""
    cfg = _cfg(width=W, height=H)
    color, prim, norm, pos, _ = _synthetic(seed=9)
    gb = jnp.zeros((fk.GB_CH, G, 128))
    gb = gb.at[fk.G_POS:fk.G_POS + 3].set(_pack(pos))
    gb = gb.at[fk.G_NORM:fk.G_NORM + 3].set(_pack(norm))
    gb = gb.at[fk.G_PRIMR].set(_pack(prim))
    gb = gb.at[fk.G_ALB:fk.G_ALB + 3].set(
        _pack(jnp.clip(pos * 0.3 + 0.2, 0.05, 1.0)))
    frame = _pack(color)

    ref = fused.eaw_filter_packed(frame, gb, cfg, use_pallas=False)
    got = fused.eaw_filter_packed(frame, gb, cfg, interpret=True,
                                  use_pallas=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-6)
