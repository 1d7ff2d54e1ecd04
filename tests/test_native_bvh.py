"""Native C++ BVH builder vs the NumPy reference implementation."""

import numpy as np
import pytest

from restir_tpu.scene.bvh import _build_bvh_numpy

try:
    from restir_tpu.native.bvh_native import build_bvh_native

    _HAVE_NATIVE = True
    _SKIP_REASON = ""
except Exception as e:  # no toolchain
    _HAVE_NATIVE = False
    _SKIP_REASON = str(e)

pytestmark = pytest.mark.skipif(
    not _HAVE_NATIVE, reason=f"native builder unavailable: {_SKIP_REASON}"
)


def _random_tris(n, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-4, 4, (n, 1, 3))
    return (centers + rng.normal(0, 0.5, (n, 3, 3))).astype(np.float32).reshape(-1, 3)


@pytest.mark.parametrize("n,seed", [(1, 0), (2, 1), (33, 2), (500, 3), (2000, 4)])
def test_native_matches_numpy(n, seed):
    verts = _random_tris(n, seed)
    a = _build_bvh_numpy(verts)
    b = build_bvh_native(verts)
    assert a.size == b.size
    assert np.array_equal(a.bounds_lo, b.bounds_lo)
    assert np.array_equal(a.bounds_hi, b.bounds_hi)
    assert np.array_equal(a.prim_id, b.prim_id)
    assert np.array_equal(a.box_id, b.box_id)
    assert np.array_equal(a.miss, b.miss)


def test_degenerate_identical_centroids():
    tri = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    verts = np.tile(tri, (16, 1))  # 16 identical triangles
    a = _build_bvh_numpy(verts)
    b = build_bvh_native(verts)
    assert np.array_equal(a.prim_id, b.prim_id)
    assert np.array_equal(a.miss, b.miss)


def test_native_traversal_correct():
    """Native-built tree must give correct closest hits."""
    import jax.numpy as jnp
    from restir_tpu.ops import intersect as ix

    verts = _random_tris(200, 7)
    bvh = build_bvh_native(verts)
    trv = ix.TraversalArrays(
        verts=jnp.asarray(verts.reshape(-1, 3, 3)),
        bounds_lo=jnp.asarray(bvh.bounds_lo),
        bounds_hi=jnp.asarray(bvh.bounds_hi),
        prim_flat=jnp.asarray(bvh.prim_id.reshape(-1)),
        box_flat=jnp.asarray(bvh.box_id.reshape(-1)),
        miss_flat=jnp.asarray(bvh.miss.reshape(-1)),
        size=bvh.size,
        method="bvh",
    )
    rng = np.random.default_rng(9)
    o = jnp.asarray(rng.uniform(-6, 6, (256, 3)).astype(np.float32))
    d0 = rng.standard_normal((256, 3)).astype(np.float32)
    d = jnp.asarray(d0 / np.linalg.norm(d0, axis=-1, keepdims=True))
    got = ix.intersect_closest_bvh(trv, o, d)
    ref = ix.brute_force_closest(jnp.asarray(verts.reshape(-1, 3, 3)), o, d)
    hit_g = np.asarray(got.prim_id) >= 0
    hit_r = np.asarray(ref.prim_id) >= 0
    assert (hit_g == hit_r).mean() > 0.995
    both = hit_g & hit_r
    assert np.allclose(np.asarray(got.dist)[both], np.asarray(ref.dist)[both],
                       rtol=1e-4)
