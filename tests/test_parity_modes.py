"""Reference-comparison parity: the six-way mode study.

The reference's only quantitative artifact is a qualitative six-image
study of direct illumination under equal settings
(/root/reference/README.md:7-28, img/5_*.jpg): spatiotemporal /
temporal / spatial / RIS-only / raw 1-sample / converged reference.
This test recreates that protocol numerically: every mode renders the
same scene for the same frame budget and is scored by RMSE against a
converged PT-direct reference. The reference's qualitative ordering
(each reuse stage reduces error; everything beats the raw 1-sample
estimator) must hold.

Run `python tests/test_parity_modes.py table` to print the full table
(the BASELINE.md numbers come from that).
"""

import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from restir_tpu import renderer
from restir_tpu.config import RenderConfig, ReuseMode, TracerType
from restir_tpu.ops.camera import make_camera
from restir_tpu.scene.procedural import many_light_scene

W = H = 48
FRAMES = 10


def _rmse(img, ref, mask):
    d2 = ((img - ref) ** 2).mean(-1)[mask]
    return float(np.sqrt(d2.mean()))


def _mode_table(width=W, height=H, frames=FRAMES, ref_frames=600):
    scene, camkw = many_light_scene(n_lights=25, n_blocks=10,
                                    bvh_impl="numpy")
    cam = make_camera(**camkw)
    # the reference's study compares SINGLE (non-accumulated) frames
    # after a short warm-up, against a converged accumulation
    base = RenderConfig(width=width, height=height,
                        tracer=TracerType.RESTIR_DI, ris_mode="reference",
                        ris_candidates=8, accumulate=False)

    _, ref = renderer.render(
        scene, cam,
        base.replace(tracer=TracerType.PT_DIRECT, accumulate=True),
        ref_frames,
    )
    ref = np.asarray(ref)

    from restir_tpu.models import gbuffer as gbuf

    gb, _, _, _ = gbuf.render_gbuffer(scene, cam, cam, base, 3)
    mask = np.asarray(gb.prim_id) >= 0

    modes = {
        "spatiotemporal": base.replace(reuse=ReuseMode.SPATIOTEMPORAL),
        "temporal": base.replace(reuse=ReuseMode.TEMPORAL),
        "spatial": base.replace(reuse=ReuseMode.SPATIAL),
        "ris": base.replace(reuse=ReuseMode.NONE),
        "raw": base.replace(reuse=ReuseMode.NONE, ris_candidates=1),
    }
    table = {}
    for name, cfg in modes.items():
        _, frame = renderer.render(scene, cam, cfg, frames)
        img = np.asarray(frame)
        err2 = ((img - ref) ** 2).mean(-1)[mask]
        table[name] = {
            "rmse": float(np.sqrt(err2.mean())),
            # the firefly tail dominates RMSE at 1 spp; the median is
            # the robust ordering statistic
            "median": float(np.sqrt(np.median(err2))),
        }
    return table


@pytest.fixture(scope="module")
def table():
    return _mode_table()


def test_reuse_reduces_error(table):
    """Reference ordering (README.md sextet): every reuse stage improves
    on RIS alone, and RIS improves on the raw 1-sample estimator."""
    m = {k: v["median"] for k, v in table.items()}
    assert m["spatiotemporal"] < m["ris"], table
    assert m["temporal"] < m["ris"], table
    assert m["spatial"] < m["ris"], table
    assert m["ris"] < m["raw"], table


def test_spatiotemporal_best(table):
    """Combining both reuse axes beats either alone (with slack for the
    small-resolution noise floor)."""
    m = {k: v["median"] for k, v in table.items()}
    assert m["spatiotemporal"] <= m["temporal"] * 1.1, table
    assert m["spatiotemporal"] <= m["spatial"] * 1.1, table


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "table":
        t = _mode_table(width=96, height=96, frames=16, ref_frames=1200)
        for k, v in t.items():
            print(f"{k:16s} rmse = {v['rmse']:.4f}  median = {v['median']:.4f}")
