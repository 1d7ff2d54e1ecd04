"""Surface interaction assembly from a traversal Hit.

Port of DevScene::getIntersecGeomInfo (/root/reference/src/scene.h:135-151):
barycentric interpolation of position/normal/uv plus material id lookup.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..scene.scene_data import SceneData
from ..utils import math as mathx
from .intersect import Hit, NULL_PRIMITIVE


class Interaction(NamedTuple):
    valid: jnp.ndarray  # [R] bool — hit anything
    prim_id: jnp.ndarray  # [R] int32
    mat_id: jnp.ndarray  # [R] int32
    pos: jnp.ndarray  # [R, 3]
    norm: jnp.ndarray  # [R, 3]
    uv: jnp.ndarray  # [R, 2]


def make_interaction(scene: SceneData, hit: Hit) -> Interaction:
    prim = jnp.maximum(hit.prim_id, 0)
    tri_v = scene.verts[prim]  # [R,3,3]
    tri_n = scene.norms[prim]
    tri_t = scene.uvs[prim]
    bx = hit.bary[..., 0:1]
    by = hit.bary[..., 1:2]
    w0 = 1.0 - bx - by

    pos = tri_v[..., 1, :] * bx + tri_v[..., 2, :] * by + tri_v[..., 0, :] * w0
    norm = mathx.safe_normalize(
        tri_n[..., 1, :] * bx + tri_n[..., 2, :] * by + tri_n[..., 0, :] * w0
    )
    uv = tri_t[..., 1, :] * bx + tri_t[..., 2, :] * by + tri_t[..., 0, :] * w0

    return Interaction(
        valid=hit.prim_id != NULL_PRIMITIVE,
        prim_id=hit.prim_id,
        mat_id=scene.mat_ids[prim],
        pos=pos,
        norm=norm,
        uv=uv,
    )


def prim_area(scene: SceneData, prim_id):
    """DevScene::getPrimitiveArea (scene.h:121-126)."""
    tri = scene.verts[jnp.maximum(prim_id, 0)]
    return mathx.triangle_area(tri[..., 0, :], tri[..., 1, :], tri[..., 2, :])
