"""Camera: ray generation, reprojection, depth->position reconstruction.

Mirrors /root/reference/src/sceneStructs.h:22-126, including its quirks:

- ``fov_y`` is the scene-file FovY in degrees used directly as the
  *half*-angle tangent argument (``tan(radians(fov.y))`` in
  Camera::sample, sceneStructs.h:72 — the "fov.y-is-half-angle quirk",
  see scene.cpp:344-349);
- the aperture sample is zeroed (pAperture(0.f), sceneStructs.h:78)
  even though lens_radius/focal_dist are parsed — thin-lens plumbing
  exists but DoF is disabled, same as the reference;
- raster axes: ruv = 1 - 2*uv, so +x pixel runs right-to-left; the
  image writer mirrors horizontally at save time (main.cpp:127).

The camera is a small pytree of jnp scalars/vectors so it can be traced
(animated) without recompiling the frame step.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class Camera(NamedTuple):
    position: jnp.ndarray  # [3]
    rotation: jnp.ndarray  # [3] yaw/pitch/roll degrees
    view: jnp.ndarray  # [3]
    up: jnp.ndarray  # [3]
    right: jnp.ndarray  # [3]
    fov_y: jnp.ndarray  # scalar, degrees (half-angle by the quirk above)
    lens_radius: jnp.ndarray  # scalar
    focal_dist: jnp.ndarray  # scalar


def derive_basis(rotation_deg):
    """view/right/up from yaw-pitch rotation — Camera::update (sceneStructs.h:88)."""
    rot = jnp.deg2rad(jnp.asarray(rotation_deg, jnp.float32))
    yaw, pitch = rot[..., 0], rot[..., 1]
    view = jnp.stack(
        [
            jnp.cos(yaw) * jnp.cos(pitch),
            jnp.sin(pitch),
            jnp.sin(yaw) * jnp.cos(pitch),
        ],
        axis=-1,
    )
    view = view / jnp.linalg.norm(view, axis=-1, keepdims=True)
    world_up = jnp.array([0.0, 1.0, 0.0], jnp.float32)
    right = jnp.cross(view, world_up)
    right = right / jnp.linalg.norm(right, axis=-1, keepdims=True)
    up = jnp.cross(right, view)
    up = up / jnp.linalg.norm(up, axis=-1, keepdims=True)
    return view, right, up


def make_camera(
    position,
    rotation=(0.0, 0.0, 0.0),
    fov_y=19.5,
    lens_radius=0.0,
    focal_dist=1.0,
) -> Camera:
    position = jnp.asarray(position, jnp.float32)
    rotation = jnp.asarray(rotation, jnp.float32)
    view, right, up = derive_basis(rotation)
    return Camera(
        position=position,
        rotation=rotation,
        view=view,
        up=up,
        right=right,
        fov_y=jnp.float32(fov_y),
        lens_radius=jnp.float32(lens_radius),
        focal_dist=jnp.float32(focal_dist),
    )


def update_camera(cam: Camera, position=None, rotation=None) -> Camera:
    position = cam.position if position is None else jnp.asarray(position, jnp.float32)
    rotation = cam.rotation if rotation is None else jnp.asarray(rotation, jnp.float32)
    view, right, up = derive_basis(rotation)
    return cam._replace(position=position, rotation=rotation, view=view, right=right, up=up)


def _tan_fovy(cam: Camera):
    return jnp.tan(jnp.deg2rad(cam.fov_y))


def pixel_centers(width: int, height: int):
    """(x, y) integer pixel coordinate grids, flattened [H*W]."""
    ys, xs = jnp.meshgrid(
        jnp.arange(height, dtype=jnp.float32),
        jnp.arange(width, dtype=jnp.float32),
        indexing="ij",
    )
    return xs.reshape(-1), ys.reshape(-1)


def sample_rays(cam: Camera, width: int, height: int, x, y, rx, ry,
                ra=None, rb=None):
    """Primary rays for pixels (x, y) with sub-pixel jitter (rx, ry) in
    [0,1) — Camera::sample, sceneStructs.h:69-86. Returns (o[R,3], d[R,3]).

    Thin-lens depth of field: the reference parses lensRadius/focalDist
    but zeroes the aperture sample (pAperture(0.f), sceneStructs.h:78).
    Here passing (ra, rb) lens uniforms with lens_radius > 0 enables the
    full thin-lens model the reference plumbed but never finished.
    """
    aspect = width / height
    tan_fovy = _tan_fovy(cam)
    ruv_x = 1.0 - 2.0 * (x + rx) / width
    ruv_y = 1.0 - 2.0 * (y + ry) / height

    fx = ruv_x * aspect * tan_fovy * cam.focal_dist
    fy = ruv_y * tan_fovy * cam.focal_dist
    fz = jnp.broadcast_to(cam.focal_dist, fx.shape)

    if ra is not None:
        from ..utils import math as mathx

        p = mathx.to_concentric_disk(ra, rb) * cam.lens_radius
        lx, ly = p[..., 0], p[..., 1]
    else:
        lx = jnp.zeros_like(fx)
        ly = jnp.zeros_like(fy)

    d = (
        cam.right[None, :] * (fx - lx)[..., None]
        + cam.up[None, :] * (fy - ly)[..., None]
        + cam.view[None, :] * fz[..., None]
    )
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = (
        cam.position[None, :]
        + cam.right[None, :] * lx[..., None]
        + cam.up[None, :] * ly[..., None]
    )
    return jnp.broadcast_to(o, d.shape), d


def raster_uv(cam: Camera, width: int, height: int, pos):
    """Project world pos into this camera's raster uv in [0,1]^2 —
    Camera::getRasterUV (sceneStructs.h:23-41). Used for motion vectors."""
    aspect = width / height
    tan_fovy = _tan_fovy(cam)
    dirv = pos - cam.position
    dirv = dirv / jnp.linalg.norm(dirv, axis=-1, keepdims=True)
    depth = jnp.sum(dirv * cam.view, axis=-1)
    inv_depth = 1.0 / depth
    px = jnp.sum(dirv * cam.right, axis=-1) * inv_depth
    py = jnp.sum(dirv * cam.up, axis=-1) * inv_depth
    ndc_x = -(px / (aspect * tan_fovy))
    ndc_y = -(py / tan_fovy)
    return ndc_x * 0.5 + 0.5, ndc_y * 0.5 + 0.5


def raster_coord(cam: Camera, width: int, height: int, pos):
    """Integer raster coords (trunc toward zero like the C float->int
    cast) — Camera::getRasterCoord (sceneStructs.h:43-46)."""
    u, v = raster_uv(cam, width, height, pos)
    return (u * width).astype(jnp.int32), (v * height).astype(jnp.int32)


def position_from_depth(cam: Camera, width: int, height: int, x, y, dist):
    """Reconstruct the world position seen through pixel center (x, y)
    at camera distance dist — Camera::getPosition (sceneStructs.h:48-64)."""
    o, d = sample_rays(
        cam, width, height, x, y, jnp.full_like(x, 0.5), jnp.full_like(y, 0.5)
    )
    return o + d * dist[..., None]


def animate_position(base_position, t, radius):
    """Circular camera animation — main.cpp:149-153."""
    return base_position + jnp.stack(
        [jnp.cos(t), jnp.zeros_like(t), jnp.sin(t)], axis=-1
    ) * radius


def as_numpy_camera(cam: Camera):
    return Camera(*(np.asarray(f) for f in cam))
