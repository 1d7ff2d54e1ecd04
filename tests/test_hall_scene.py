"""Benchmark mesh scene: generation + loading + cluster structure.

Protects the bench.py secondary metric path: scenes/make_hall.py must
deterministically generate a valid .glb/.obj set, the reference-format
scene file must load it, and the Morton clustering must produce sound
AABBs (every triangle inside its cluster's box).
"""

import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

SCENES = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scenes")


@pytest.fixture(scope="module")
def hall():
    sys.path.insert(0, SCENES)
    from make_hall import ensure_assets

    ensure_assets()
    from restir_tpu.scene.loader import parse_scene_file

    sf = parse_scene_file(os.path.join(SCENES, "hall.txt"))
    return sf, sf.build()


def test_hall_loads_at_scale(hall):
    sf, scene = hall
    n = scene.verts.shape[0]
    assert n > 50_000, n  # "many-light glTF scene" at real mesh scale
    assert scene.light_prim_ids.shape[0] == 128
    assert sf.resolution == (1920, 1080)


def test_cluster_aabbs_sound(hall):
    _, scene = hall
    from restir_tpu.scene.scene_data import CLUSTER_SIZE

    verts = np.asarray(scene.verts)  # [N, 3, 3], Morton-ordered
    lo = np.asarray(scene.cluster_lo)
    hi = np.asarray(scene.cluster_hi)
    n = verts.shape[0]
    assert lo.shape[0] == -(-n // CLUSTER_SIZE)
    cid = np.arange(n) // CLUSTER_SIZE
    vmin = verts.min(axis=1)
    vmax = verts.max(axis=1)
    eps = 1e-4
    assert (vmin >= lo[cid] - eps).all()
    assert (vmax <= hi[cid] + eps).all()
    # Morton ordering should make clusters compact: the mean cluster
    # diagonal must be far below the scene diagonal
    scene_diag = np.linalg.norm(verts.reshape(-1, 3).max(0)
                                - verts.reshape(-1, 3).min(0))
    diag = np.linalg.norm(hi - lo, axis=-1)
    assert diag.mean() < scene_diag * 0.2, (diag.mean(), scene_diag)


def test_hall_renders_small(hall):
    """A tiny render through the general pipeline (CPU) must be finite
    and lit (the TPU fused path is covered by bench.py on hardware)."""
    from restir_tpu import renderer
    from restir_tpu.config import RenderConfig, TracerType

    sf, scene = hall
    cam = sf.make_camera()
    cfg = RenderConfig(width=64, height=40, tracer=TracerType.RESTIR_DI,
                       intersector="bvh")
    state, frame = renderer.render(scene, cam, cfg, 2)
    img = np.asarray(frame)
    assert np.isfinite(img).all()
    assert img.mean() > 0
