import jax
import jax.numpy as jnp
import numpy as np

from restir_tpu.config import RenderConfig
from restir_tpu.models.path_tracer import bvh_heatmap, pt_direct, pt_trace
from restir_tpu.ops.camera import make_camera
from restir_tpu.scene.procedural import cornell_box

_SCENE = {}


def get_scene():
    if "s" not in _SCENE:
        _SCENE["s"] = cornell_box(bvh_impl="numpy")
    return _SCENE["s"]


def test_pt_direct_finite_and_deterministic():
    scene, camkw = get_scene()
    cfg = RenderConfig(width=48, height=48, trace_depth=3)
    cam = make_camera(**camkw)
    f = jax.jit(lambda lp: pt_direct(scene, cam, cfg, lp))
    a = np.asarray(f(jnp.int32(0)))
    b = np.asarray(f(jnp.int32(0)))
    np.testing.assert_array_equal(a, b)  # same seed -> bit identical
    c = np.asarray(f(jnp.int32(1)))
    assert not np.array_equal(a, c)  # different seed -> different noise
    assert np.all(np.isfinite(a))
    assert a.mean() > 0.01  # scene is lit


def test_pt_trace_direct_matches_pt_direct():
    """Depth-1 NEE of the full PT must estimate the same integral as the
    dedicated direct kernel (different RNG counters, so compare means)."""
    scene, camkw = get_scene()
    cfg = RenderConfig(width=40, height=40, trace_depth=2)
    cam = make_camera(**camkw)
    fd = jax.jit(lambda lp: pt_direct(scene, cam, cfg, lp))
    ft = jax.jit(lambda lp: pt_trace(scene, cam, cfg, lp))
    n = 24
    acc_d = np.zeros(3)
    acc_t = np.zeros(3)
    for i in range(n):
        acc_d += np.asarray(fd(jnp.int32(i))).mean(axis=0)
        d, _ = ft(jnp.int32(i))
        acc_t += np.asarray(d).mean(axis=0)
    np.testing.assert_allclose(acc_d / n, acc_t / n, rtol=0.05)


def test_pt_indirect_adds_energy():
    scene, camkw = get_scene()
    cfg = RenderConfig(width=32, height=32, trace_depth=4)
    cam = make_camera(**camkw)
    d, ind = jax.jit(lambda lp: pt_trace(scene, cam, cfg, lp))(jnp.int32(3))
    assert float(jnp.mean(ind)) > 0.001  # GI bounces exist
    assert np.all(np.isfinite(np.asarray(ind)))


def test_bvh_heatmap():
    scene, camkw = get_scene()
    cfg = RenderConfig(width=32, height=32)
    cam = make_camera(**camkw)
    counts = np.asarray(bvh_heatmap(scene, cam, cfg))
    assert counts.max() > 0
    assert counts.max() <= scene.bounds_lo.shape[0]
