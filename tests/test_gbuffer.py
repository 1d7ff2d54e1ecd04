"""G-buffer pass tests — gbuffer.cu:3-86 semantics."""

import numpy as np
import jax.numpy as jnp

from restir_tpu.config import RenderConfig, TracerType
from restir_tpu.models import gbuffer as gbuf
from restir_tpu.ops.camera import make_camera, update_camera
from restir_tpu.scene.procedural import cornell_box

CFG = RenderConfig(width=24, height=24, aa_jitter=False)


def _setup():
    scene, camkw = cornell_box(bvh_impl="numpy")
    cam = make_camera(**camkw)
    return scene, cam


def test_static_camera_motion_is_identity():
    """With an unmoved camera, every valid pixel's motion index must be
    its own linear index (reprojection through the same camera)."""
    scene, cam = _setup()
    gb, it, mat, d = gbuf.render_gbuffer(scene, cam, cam, CFG, 0)
    valid = np.asarray(it.valid)
    motion = np.asarray(gb.motion)
    own = np.arange(CFG.num_pixels)
    assert valid.mean() > 0.9  # camera looks into the box
    assert (motion[valid] == own[valid]).mean() > 0.98


def test_light_pixels_remapped():
    scene, cam = _setup()
    gb, it, mat, d = gbuf.render_gbuffer(scene, cam, cam, CFG, 0)
    prim = np.asarray(gb.prim_id)
    assert (prim == gbuf.LIGHT_ID).any()  # ceiling light visible
    # light pixels keep valid interaction but remapped id
    assert prim.max() >= 0  # regular materials present too


def test_depth_and_albedo():
    scene, cam = _setup()
    gb, it, mat, d = gbuf.render_gbuffer(scene, cam, cam, CFG, 0)
    valid = np.asarray(it.valid)
    depth = np.asarray(gb.depth)
    assert (depth[valid] > 0).all()
    albedo = np.asarray(gb.albedo)
    assert albedo.min() >= 0.0
    # white back wall should be visible
    assert (np.abs(albedo - np.array([0.725, 0.71, 0.68])) < 1e-3).all(-1).any()


def test_camera_translation_shifts_motion():
    """Moving the camera right shifts reprojected indices consistently:
    the raster x of a static point should DECREASE or INCREASE uniformly."""
    scene, cam = _setup()
    cam2 = update_camera(cam, position=np.asarray(cam.position) + np.array([0.8, 0, 0], np.float32))
    gb, it, _, _ = gbuf.render_gbuffer(scene, cam2, cam, CFG, 0)
    valid = np.asarray(it.valid) & (np.asarray(gb.motion) >= 0)
    motion = np.asarray(gb.motion)[valid]
    own = np.arange(CFG.num_pixels)[valid]
    dx = motion % CFG.width - own % CFG.width
    # most pixels reproject with a consistent sign of shift
    nonzero = dx[dx != 0]
    assert nonzero.size > 0
    sign = np.sign(np.median(nonzero))
    assert (np.sign(nonzero) == sign).mean() > 0.9
