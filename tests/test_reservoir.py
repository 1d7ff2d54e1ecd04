"""Reservoir (WRS) unit + distribution tests — restir.h:29-126 semantics."""

import numpy as np
import jax.numpy as jnp

from restir_tpu.ops import reservoir as rsv
from restir_tpu.utils import rng as rngmod


def _scalar_sample(r, val):
    """Use DirectSample.li.x as the payload id channel."""
    return rsv.DirectSample(
        li=jnp.stack([val, jnp.zeros_like(val), jnp.zeros_like(val)], -1),
        wi=jnp.zeros((r, 3)),
        dist=jnp.zeros((r,)),
    )


def test_update_accumulates_weight_and_count():
    r = 4
    res = rsv.zeros_direct(r)
    w = jnp.full((r,), 2.0)
    res = rsv.update(res, _scalar_sample(r, jnp.ones(r)), w, jnp.full((r,), 0.99))
    res = rsv.update(res, _scalar_sample(r, 2 * jnp.ones(r)), w, jnp.full((r,), 0.99))
    assert np.allclose(res.weight, 4.0)
    assert np.all(np.asarray(res.m) == 2)


def test_update_selection_distribution():
    """P(select candidate i) = w_i / sum(w) — restir.h:38-44."""
    lanes = 20000
    weights = [1.0, 3.0, 6.0]
    res = rsv.zeros_direct(lanes)
    pix = jnp.arange(lanes, dtype=jnp.uint32)
    for i, w in enumerate(weights):
        r = rngmod.uniform1(pix, 7, i, rngmod.SALT_DEBUG)
        res = rsv.update(
            res, _scalar_sample(lanes, jnp.full((lanes,), float(i))),
            jnp.full((lanes,), w), r,
        )
    picked = np.asarray(res.sample.li[:, 0])
    total = sum(weights)
    for i, w in enumerate(weights):
        frac = (picked == i).mean()
        assert abs(frac - w / total) < 0.02, (i, frac, w / total)


def test_merge_matches_streaming():
    """Merging two reservoirs preserves total weight/M and the selection
    distribution over the union stream."""
    lanes = 20000
    pix = jnp.arange(lanes, dtype=jnp.uint32)

    a = rsv.zeros_direct(lanes)
    a = rsv.update(a, _scalar_sample(lanes, jnp.zeros(lanes)), jnp.full((lanes,), 2.0),
                   rngmod.uniform1(pix, 1, 0, rngmod.SALT_DEBUG))
    b = rsv.zeros_direct(lanes)
    b = rsv.update(b, _scalar_sample(lanes, jnp.ones(lanes)), jnp.full((lanes,), 6.0),
                   rngmod.uniform1(pix, 1, 1, rngmod.SALT_DEBUG))
    m = rsv.merge(a, b, rngmod.uniform1(pix, 1, 2, rngmod.SALT_DEBUG))
    assert np.allclose(m.weight, 8.0)
    assert np.all(np.asarray(m.m) == 2)
    frac_b = (np.asarray(m.sample.li[:, 0]) == 1.0).mean()
    assert abs(frac_b - 6.0 / 8.0) < 0.02


def test_clamp_scales_weight():
    r = 3
    res = rsv.Reservoir(
        sample=_scalar_sample(r, jnp.zeros(r)),
        weight=jnp.array([10.0, 10.0, 10.0]),
        m=jnp.array([40, 20, 10], jnp.int32),
    )
    out = rsv.clamp(res, 20)
    assert np.allclose(out.weight, [5.0, 10.0, 10.0])
    assert np.all(np.asarray(out.m) == [20, 20, 10])


def test_pre_clamped_merge_caps_history():
    """preClampedMerge<M>: rhs clamped to (M-1)*lhs.M — restir.h:95-102."""
    r = 1
    a = rsv.Reservoir(_scalar_sample(r, jnp.zeros(r)), jnp.array([1.0]),
                      jnp.array([1], jnp.int32))
    b = rsv.Reservoir(_scalar_sample(r, jnp.ones(r)), jnp.array([100.0]),
                      jnp.array([100], jnp.int32))
    out = rsv.pre_clamped_merge(a, b, 20, jnp.array([0.5]))
    # b clamped to 19 samples, weight scaled 100*19/100 = 19
    assert np.allclose(out.weight, 20.0)
    assert np.all(np.asarray(out.m) == 20)


def test_check_validity_zeroes_nan_neg():
    r = 3
    res = rsv.Reservoir(
        sample=_scalar_sample(r, jnp.zeros(r)),
        weight=jnp.array([jnp.nan, -1.0, 5.0]),
        m=jnp.array([4, 4, 4], jnp.int32),
    )
    out = rsv.check_validity(res)
    assert np.allclose(np.asarray(out.weight), [0.0, 0.0, 5.0])
    assert np.all(np.asarray(out.m) == [0, 0, 4])


def test_gather_reindexes_all_leaves():
    r = 4
    res = rsv.Reservoir(
        sample=_scalar_sample(r, jnp.arange(4.0)),
        weight=jnp.arange(4.0),
        m=jnp.arange(4, dtype=jnp.int32),
    )
    idx = jnp.array([3, 2, 1, 0], jnp.int32)
    out = rsv.gather(res, idx)
    assert np.allclose(np.asarray(out.weight), [3, 2, 1, 0])
    assert np.allclose(np.asarray(out.sample.li[:, 0]), [3, 2, 1, 0])
