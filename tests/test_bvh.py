import jax.numpy as jnp
import numpy as np
import pytest

from restir_tpu.ops import intersect as ix
from restir_tpu.scene.bvh import build_bvh, get_mtbvh_id


def random_tris(n, seed=0, spread=4.0):
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-spread, spread, (n, 1, 3))
    tris = centers + rng.normal(0, 0.5, (n, 3, 3))
    return tris.astype(np.float32).reshape(-1, 3)


def to_trv(bvh, verts):
    return ix.TraversalArrays(
        verts=jnp.asarray(verts.reshape(-1, 3, 3)),
        bounds_lo=jnp.asarray(bvh.bounds_lo),
        bounds_hi=jnp.asarray(bvh.bounds_hi),
        prim_flat=jnp.asarray(bvh.prim_id.reshape(-1)),
        box_flat=jnp.asarray(bvh.box_id.reshape(-1)),
        miss_flat=jnp.asarray(bvh.miss.reshape(-1)),
        size=bvh.size,
    )


def test_bvh_structure_invariants():
    verts = random_tris(100, seed=1)
    bvh = build_bvh(verts, impl="numpy")
    n = 100
    assert bvh.size == 2 * n - 1
    for d in range(6):
        prims = bvh.prim_id[d]
        leaves = prims[prims >= 0]
        # every primitive appears exactly once per layout
        assert sorted(leaves.tolist()) == list(range(n))
        # miss pointers are strictly increasing targets within [1, size]
        assert np.all(bvh.miss[d] > np.arange(bvh.size))
        assert np.all(bvh.miss[d] <= bvh.size)
        # every node's box contains its leaf triangle
        tri = verts.reshape(-1, 3, 3)
        for i in range(bvh.size):
            p = prims[i]
            if p >= 0:
                b = bvh.box_id[d][i]
                assert np.all(tri[p].min(0) >= bvh.bounds_lo[b] - 1e-4)
                assert np.all(tri[p].max(0) <= bvh.bounds_hi[b] + 1e-4)


@pytest.mark.parametrize("n_tris,seed", [(1, 0), (2, 1), (7, 2), (64, 3), (257, 4)])
def test_traversal_matches_brute_force(n_tris, seed):
    verts = random_tris(n_tris, seed=seed)
    bvh = build_bvh(verts, impl="numpy")
    trv = to_trv(bvh, verts)

    rng = np.random.default_rng(seed + 100)
    R = 500
    o = jnp.asarray(rng.uniform(-8, 8, (R, 3)).astype(np.float32))
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)

    fast = ix.intersect_closest(trv, o, d)
    slow = ix.brute_force_closest(trv.verts, o, d)

    np.testing.assert_array_equal(np.asarray(fast.prim_id), np.asarray(slow.prim_id))
    hit = np.asarray(fast.prim_id) >= 0
    np.testing.assert_allclose(
        np.asarray(fast.dist)[hit], np.asarray(slow.dist)[hit], rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(fast.bary)[hit], np.asarray(slow.bary)[hit], rtol=1e-4, atol=1e-5
    )


def test_occlusion_matches_closest():
    verts = random_tris(50, seed=9)
    bvh = build_bvh(verts, impl="numpy")
    trv = to_trv(bvh, verts)

    rng = np.random.default_rng(77)
    R = 400
    x = jnp.asarray(rng.uniform(-8, 8, (R, 3)).astype(np.float32))
    y = jnp.asarray(rng.uniform(-8, 8, (R, 3)).astype(np.float32))

    occ = np.asarray(ix.test_occlusion(trv, x, y))

    # oracle: closest hit along the segment closer than |y-x| - eps
    seg = np.asarray(y) - np.asarray(x)
    dist = np.linalg.norm(seg, axis=-1)
    d = jnp.asarray(seg / dist[:, None])
    o = x + d * ix.RAY_OFFSET
    hit = ix.brute_force_closest(trv.verts, o, d)
    expect = (np.asarray(hit.prim_id) >= 0) & (
        np.asarray(hit.dist) < dist - ix.OCCLUSION_EPS * 2
    )
    np.testing.assert_array_equal(occ, expect)


def test_mtbvh_id():
    dirs = jnp.array(
        [
            [1.0, 0.1, 0.1],
            [-1.0, 0.1, 0.1],
            [0.1, 1.0, 0.1],
            [0.1, -1.0, 0.1],
            [0.1, 0.1, 1.0],
            [0.1, 0.1, -1.0],
        ]
    )
    ids = np.asarray(get_mtbvh_id(dirs))
    np.testing.assert_array_equal(ids, [0, 1, 2, 3, 4, 5])


def test_aabb_intersect_inside_and_parallel():
    o = jnp.array([[0.5, 0.5, 0.5], [2.0, 0.5, 0.5], [0.5, 2.0, 0.5]])
    d = jnp.array([[1.0, 0.0, 0.0], [-1.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
    lo = jnp.zeros((3, 3))
    hi = jnp.ones((3, 3))
    hit, t = ix.intersect_aabb(o, d, lo, hi)
    assert bool(hit[0])  # inside
    assert float(t[0]) <= 0.0
    assert bool(hit[1]) and np.isclose(float(t[1]), 1.0)
    assert not bool(hit[2])  # parallel, outside slab


def test_visualize_counts_positive_on_hits():
    verts = random_tris(64, seed=5)
    bvh = build_bvh(verts, impl="numpy")
    trv = to_trv(bvh, verts)
    o = jnp.zeros((16, 3))
    d = np.random.default_rng(0).normal(size=(16, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    counts = np.asarray(ix.intersect_visualize(trv, o, jnp.asarray(d)))
    assert np.all(counts >= 0)
    assert counts.max() <= bvh.size
