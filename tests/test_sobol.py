"""Owen-scrambled Sobol sampler tests."""

import numpy as np
import jax.numpy as jnp

from restir_tpu.utils.sobol import sobol4, _sobol_bits


def test_sobol_dim0_is_van_der_corput():
    idx = jnp.arange(8, dtype=jnp.uint32)
    bits = np.asarray(_sobol_bits(idx, 0))
    vals = bits.astype(np.float64) / 2**32
    assert np.allclose(vals, [0, 0.5, 0.25, 0.75, 0.125, 0.625, 0.375, 0.875])


def test_sobol_stratification_beats_random():
    """First 256 scrambled Sobol points: 16x16 stratification should be
    near-perfect (1 point per cell), far better than iid uniform."""
    pix = jnp.zeros(256, jnp.uint32)
    idx = jnp.arange(256, dtype=jnp.uint32)
    x, y, _, _ = sobol4(pix, idx, 3, 7)
    x, y = np.asarray(x), np.asarray(y)
    assert ((x >= 0) & (x < 1)).all() and ((y >= 0) & (y < 1)).all()
    h = np.histogram2d(x, y, bins=16, range=[[0, 1], [0, 1]])[0]
    # Owen-scrambled (0,2)-sequences keep perfect 16x16 stratification
    assert (h == 1).mean() > 0.95, h.std()


def test_sobol_mean_unbiased():
    pix = jnp.zeros(4096, jnp.uint32)
    idx = jnp.arange(4096, dtype=jnp.uint32)
    for ctr in range(3):
        vals = sobol4(pix, idx, ctr, 1)
        for v in vals:
            assert abs(float(jnp.mean(v)) - 0.5) < 0.01


def test_sobol_decorrelated_across_pixels():
    idx = jnp.zeros(512, jnp.uint32) + 5
    pix = jnp.arange(512, dtype=jnp.uint32)
    x, _, _, _ = sobol4(pix, idx, 0, 1)
    x = np.asarray(x)
    assert x.std() > 0.2  # not the same point for every pixel


def test_pt_runs_with_sobol():
    from restir_tpu.config import RenderConfig, TracerType
    from restir_tpu.ops.camera import make_camera
    from restir_tpu.scene.procedural import cornell_box
    from restir_tpu import renderer

    scene, camkw = cornell_box(bvh_impl="numpy")
    cam = make_camera(**camkw)
    cfg = RenderConfig(width=16, height=16, tracer=TracerType.PT_DIRECT,
                       sampler="sobol")
    state, frame = renderer.render(scene, cam, cfg, 4)
    assert np.isfinite(np.asarray(frame)).all()
    assert float(np.asarray(frame).mean()) > 0
