import jax.numpy as jnp
import numpy as np

from restir_tpu.utils import rng


def _draws(n, ctr=0, looper=0, salt=1):
    pix = jnp.arange(n, dtype=jnp.uint32)
    return np.stack(
        [np.asarray(u) for u in rng.uniform4(pix, looper, ctr, salt)], axis=-1
    )


def test_range_and_determinism():
    u = _draws(10000)
    assert np.all(u >= 0.0) and np.all(u < 1.0)
    u2 = _draws(10000)
    np.testing.assert_array_equal(u, u2)


def test_mean_and_variance():
    u = _draws(50000).ravel()
    assert abs(u.mean() - 0.5) < 0.005
    assert abs(u.var() - 1 / 12) < 0.005


def test_streams_differ_by_counter_looper_salt():
    a = _draws(1000, ctr=0)
    b = _draws(1000, ctr=1)
    c = _draws(1000, ctr=0, looper=1)
    d = _draws(1000, ctr=0, salt=2)
    assert not np.allclose(a, b)
    assert not np.allclose(a, c)
    assert not np.allclose(a, d)


def test_no_pixel_correlation():
    """Adjacent pixels must be uncorrelated (common LCG failure)."""
    u = _draws(100001)[:, 0]
    x, y = u[:-1], u[1:]
    corr = np.corrcoef(x, y)[0, 1]
    assert abs(corr) < 0.01


def test_chi2_uniformity():
    u = _draws(65536)[:, 0]
    hist, _ = np.histogram(u, bins=64, range=(0, 1))
    expected = len(u) / 64
    chi2 = np.sum((hist - expected) ** 2 / expected)
    # 63 dof: mean 63, std ~11.2; 5-sigma bound
    assert chi2 < 63 + 5 * np.sqrt(2 * 63)


def test_utilhash_matches_reference_values():
    # Golden values computed from the C formula in mathUtil.h:190-198.
    def ref(a):
        M = 0xFFFFFFFF
        a = ((a + 0x7ED55D16) + (a << 12)) & M
        a = ((a ^ 0xC761C23C) ^ (a >> 19)) & M
        a = ((a + 0x165667B1) + (a << 5)) & M
        a = ((a + 0xD3A2646C) ^ (a << 9)) & M
        a = ((a + 0xFD7046C5) + (a << 3)) & M
        a = ((a ^ 0xB55A4F09) ^ (a >> 16)) & M
        return a

    for v in [0, 1, 42, 123456789, 0xFFFFFFFF]:
        assert int(rng.utilhash(jnp.uint32(v))) == ref(v)
