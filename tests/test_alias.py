import jax.numpy as jnp
import numpy as np

from restir_tpu.scene.alias_table import build_alias_table, sample_alias
from restir_tpu.utils import rng


def test_alias_table_distribution():
    weights = np.array([1.0, 2.0, 3.0, 4.0, 0.5, 10.0])
    table = build_alias_table(weights)
    assert np.isclose(table.sum_all, weights.sum())

    n = 200000
    pix = jnp.arange(n, dtype=jnp.uint32)
    r1, r2, _, _ = rng.uniform4(pix, 7, 0, rng.SALT_DEBUG)
    idx = np.asarray(sample_alias(table.prob, table.fail_id, r1, r2))
    counts = np.bincount(idx, minlength=len(weights))
    freq = counts / n
    expect = weights / weights.sum()
    np.testing.assert_allclose(freq, expect, atol=0.01)


def test_alias_table_single_and_uniform():
    t1 = build_alias_table([5.0])
    idx = sample_alias(t1.prob, t1.fail_id, jnp.array([0.7]), jnp.array([0.3]))
    assert int(idx[0]) == 0

    tu = build_alias_table(np.ones(17))
    n = 100000
    pix = jnp.arange(n, dtype=jnp.uint32)
    r1, r2, _, _ = rng.uniform4(pix, 3, 1, rng.SALT_DEBUG)
    idx = np.asarray(sample_alias(tu.prob, tu.fail_id, r1, r2))
    counts = np.bincount(idx, minlength=17)
    np.testing.assert_allclose(counts / n, 1 / 17, atol=0.01)


def test_alias_table_extreme_skew():
    weights = np.array([1e-6, 1.0, 1e-6])
    t = build_alias_table(weights)
    n = 50000
    pix = jnp.arange(n, dtype=jnp.uint32)
    r1, r2, _, _ = rng.uniform4(pix, 9, 2, rng.SALT_DEBUG)
    idx = np.asarray(sample_alias(t.prob, t.fail_id, r1, r2))
    assert np.mean(idx == 1) > 0.999
