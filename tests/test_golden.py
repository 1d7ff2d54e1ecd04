"""Golden-image regression tests (SURVEY.md §4 test strategy).

Every pass is a pure function of (scene, camera, seed), so tiny fixed
renders are exact regression anchors: a behavioral change in any layer
(math, sampler, BVH, BSDF, lights, reservoirs) shifts these images.
Goldens were rendered on the CPU backend; a loose tolerance absorbs
backend float differences, a tight mean check catches energy drift.

Regenerate after INTENTIONAL changes with:
    python tests/test_golden.py regen
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from restir_tpu import renderer
from restir_tpu.config import RenderConfig, ReuseMode, TracerType
from restir_tpu.ops.camera import make_camera
from restir_tpu.scene.procedural import cornell_box

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "cornell_32.npz")

CONFIGS = {
    "pt_direct": RenderConfig(width=32, height=32, tracer=TracerType.PT_DIRECT),
    "pt_full": RenderConfig(
        width=32, height=32, tracer=TracerType.PT_FULL, trace_depth=3
    ),
    "restir_di": RenderConfig(
        width=32, height=32, tracer=TracerType.RESTIR_DI,
        reuse=ReuseMode.SPATIOTEMPORAL, ris_mode="cdf",
    ),
}


def _render(name):
    scene, camkw = cornell_box(bvh_impl="numpy")
    cam = make_camera(**camkw)
    state, frame = renderer.render(scene, cam, CONFIGS[name], 4)
    return np.asarray(frame)


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_golden(name):
    data = np.load(GOLDEN)
    got = _render(name)
    ref = data[name]
    assert got.shape == ref.shape
    # energy drift
    assert abs(got.mean() - ref.mean()) < 1e-3 * max(ref.mean(), 1e-6), (
        got.mean(), ref.mean()
    )
    # pixel-level regression (loose enough for backend float diffs)
    close = np.isclose(got, ref, rtol=1e-3, atol=1e-4).mean()
    assert close > 0.99, close


if __name__ == "__main__":
    import sys

    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        np.savez(GOLDEN, **{name: _render(name) for name in CONFIGS})
        print(f"regenerated {GOLDEN}")
