"""Viewer smoke tests (server logic without sockets)."""

import numpy as np

from restir_tpu.config import RenderConfig, TracerType
from restir_tpu.ops.camera import make_camera
from restir_tpu.viewer import ViewerState, _PAGE


def test_page_served_controls():
    for control in ["tracer", "reuse", "denoiser", "tonemap", "/stream", "/stats"]:
        assert control in _PAGE


def test_viewer_state_camera_mutation():
    cfg = RenderConfig(width=16, height=16, tracer=TracerType.RESTIR_DI)
    cam = make_camera((0.0, 1.0, 5.0), (-90.0, 0.0, 0.0))
    vs = ViewerState(cfg, cam)
    assert not vs.cam_changed
    vs.rotation[0] += 3.0
    vs.cam_changed = True
    assert vs.position.shape == (3,)
    assert vs.cfg.width == 16


def test_render_loop_produces_jpeg():
    import threading
    import time

    from restir_tpu.scene.procedural import cornell_box
    from restir_tpu import viewer as viewer_mod

    scene, camkw = cornell_box(bvh_impl="numpy")
    cam = make_camera(**camkw)
    cfg = RenderConfig(width=16, height=16, tracer=TracerType.PT_DIRECT)
    vs = ViewerState(cfg, cam)
    t = threading.Thread(
        target=viewer_mod._render_loop, args=(scene, vs), daemon=True
    )
    t.start()
    deadline = time.time() + 120
    while time.time() < deadline and not vs.frame_jpeg:
        time.sleep(0.5)
    vs.running = False
    assert vs.frame_jpeg.startswith(b"\xff\xd8\xff")  # JPEG magic
