import jax.numpy as jnp
import numpy as np
import pytest

from restir_tpu.utils import math as m


def test_luminance_white():
    assert np.isclose(float(m.luminance(jnp.ones(3))), 1.0, atol=1e-5)


def test_hdr_ldr_roundtrip():
    c = jnp.array([0.1, 1.0, 7.3])
    back = m.ldr_to_hdr(m.hdr_to_ldr(c))
    np.testing.assert_allclose(np.asarray(back), np.asarray(c), rtol=2e-3)


def test_aces_monotone_and_bounded():
    xs = jnp.linspace(0.0, 20.0, 100)[:, None] * jnp.ones(3)
    ys = np.asarray(m.aces(xs))[:, 0]
    assert np.all(np.diff(ys) > 0)
    assert ys[-1] < 1.2


def test_power_heuristic():
    assert np.isclose(float(m.power_heuristic(1.0, 1.0)), 0.5)
    assert float(m.power_heuristic(10.0, 0.1)) > 0.99


def test_concentric_disk_in_unit_disk():
    rng = np.random.default_rng(0)
    x, y = rng.random(1000).astype(np.float32), rng.random(1000).astype(np.float32)
    d = np.asarray(m.to_concentric_disk(jnp.array(x), jnp.array(y)))
    r = np.linalg.norm(d, axis=-1)
    assert np.all(r <= 1.0 + 1e-6)
    # r^2 should be ~uniform (area-uniform disk sampling)
    assert abs(np.mean(r**2) - 0.5) < 0.03


def test_sphere_plane_roundtrip():
    rng = np.random.default_rng(1)
    uv = rng.random((500, 2)).astype(np.float32)
    # avoid the poles where phi is ill-conditioned
    uv[:, 1] = uv[:, 1] * 0.9 + 0.05
    w = m.to_sphere(jnp.array(uv))
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(w), axis=-1), 1.0, atol=1e-5
    )
    uv2 = np.asarray(m.to_plane(w))
    wrap = np.minimum(np.abs(uv2[:, 0] - uv[:, 0]), 1.0 - np.abs(uv2[:, 0] - uv[:, 0]))
    assert np.max(wrap) < 1e-4
    np.testing.assert_allclose(uv2[:, 1], uv[:, 1], atol=1e-4)


def test_hemisphere_cosine_distribution():
    n = jnp.array([0.0, 0.0, 1.0])
    rng = np.random.default_rng(2)
    rx = jnp.array(rng.random(20000, dtype=np.float32))
    ry = jnp.array(rng.random(20000, dtype=np.float32))
    wi = np.asarray(m.sample_hemisphere_cosine(jnp.broadcast_to(n, (20000, 3)), rx, ry))
    cos = wi[:, 2]
    assert np.all(cos >= -1e-6)
    # E[cos theta] for cosine-weighted = 2/3
    assert abs(np.mean(cos) - 2.0 / 3.0) < 0.01


def test_local_to_world_preserves_z_alignment():
    rng = np.random.default_rng(3)
    n = rng.normal(size=(100, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    v = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (100, 3))
    out = np.asarray(m.local_to_world(jnp.array(n), v))
    np.testing.assert_allclose(out, n, atol=1e-5)


def test_refract_straight_through_and_tir():
    n = jnp.array([[0.0, 0.0, 1.0]])
    wi = jnp.array([[0.0, 0.0, 1.0]])
    ok, wt = m.refract(n, wi, jnp.array([1.5]))
    assert bool(ok[0])
    np.testing.assert_allclose(np.asarray(wt[0]), [0, 0, -1], atol=1e-5)
    # grazing ray from the dense side (wi below surface) -> TIR
    grazing = jnp.array([[np.sin(1.4), 0.0, -np.cos(1.4)]], dtype=jnp.float32)
    ok2, _ = m.refract(n, grazing, jnp.array([1.5]))
    assert not bool(ok2[0])


def test_refract_snell_angle():
    n = jnp.array([[0.0, 0.0, 1.0]])
    theta_i = 0.5
    wi = jnp.array([[np.sin(theta_i), 0.0, np.cos(theta_i)]], dtype=jnp.float32)
    ok, wt = m.refract(n, wi, jnp.array([1.5]))
    assert bool(ok[0])
    sin_t = float(jnp.abs(wt[0, 0]))
    assert np.isclose(sin_t, np.sin(theta_i) / 1.5, atol=1e-5)


def test_normal_hemioct_roundtrip():
    rng = np.random.default_rng(4)
    n = rng.normal(size=(200, 3)).astype(np.float32)
    n[:, 2] = np.abs(n[:, 2])  # hemi encoding assumes +z hemisphere
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    dec = np.asarray(m.decode_normal_hemi_oct(m.encode_normal_hemi_oct(jnp.array(n))))
    np.testing.assert_allclose(dec, n, atol=1e-5)


def test_triangle_area_and_sampling():
    v0 = jnp.array([0.0, 0.0, 0.0])
    v1 = jnp.array([1.0, 0.0, 0.0])
    v2 = jnp.array([0.0, 1.0, 0.0])
    assert np.isclose(float(m.triangle_area(v0, v1, v2)), 0.5)
    rng = np.random.default_rng(5)
    ru = jnp.array(rng.random(5000, dtype=np.float32))
    rv = jnp.array(rng.random(5000, dtype=np.float32))
    p = np.asarray(
        m.sample_triangle_uniform(
            jnp.broadcast_to(v0, (5000, 3)),
            jnp.broadcast_to(v1, (5000, 3)),
            jnp.broadcast_to(v2, (5000, 3)),
            ru,
            rv,
        )
    )
    assert np.all(p[:, 0] >= -1e-6) and np.all(p[:, 1] >= -1e-6)
    assert np.all(p[:, 0] + p[:, 1] <= 1 + 1e-5)
    # centroid of uniform samples ~ (1/3, 1/3)
    np.testing.assert_allclose(p.mean(axis=0)[:2], [1 / 3, 1 / 3], atol=0.02)


def test_pdf_area_to_solid_angle():
    # light at distance d facing the shading point: pdf_sa = pdf_area * d^2
    x = jnp.array([0.0, 0.0, 0.0])
    y = jnp.array([0.0, 0.0, 2.0])
    ny = jnp.array([0.0, 0.0, -1.0])
    out = float(m.pdf_area_to_solid_angle(jnp.float32(1.0), x, y, ny))
    assert np.isclose(out, 4.0, atol=1e-5)


def test_zero_nan_or_inf():
    v = jnp.array([[1.0, np.nan, 2.0], [1.0, 2.0, 3.0], [np.inf, 0.0, 0.0]])
    out = np.asarray(m.zero_nan_or_inf(v))
    np.testing.assert_allclose(out[0], 0.0)
    np.testing.assert_allclose(out[2], 0.0)
    np.testing.assert_allclose(out[1], [1, 2, 3])
