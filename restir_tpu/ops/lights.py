"""Next-event estimation: alias-table light + environment-map sampling.

Vectorized port of DevScene::sampleDirectLight{,NoVisibility} and the
env-map samplers (/root/reference/src/scene.h:358-459).

pdf convention: returned pdf is in solid-angle measure at the shading
point; pdf <= 0 (INVALID_PDF) marks a failed/occluded sample. Note the
deliberate pdf correction vs the reference documented in
scene/scene_data.py: pdf_area = luminance(Le) * 2pi * sum_power_inv,
self-consistent with the selection weights built there.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..scene.alias_table import sample_alias
from ..scene.scene_data import SceneData
from ..utils import math as mathx
from . import intersect as ix
from .texture import env_sample_bilinear

INVALID_PDF = -1.0


class LightSample(NamedTuple):
    pdf: jnp.ndarray  # [R] solid-angle pdf (INVALID_PDF on failure)
    radiance: jnp.ndarray  # [R, 3]
    wi: jnp.ndarray  # [R, 3]
    dist: jnp.ndarray  # [R] distance to the light sample


def env_map_pdf(scene: SceneData, w):
    """Solid-angle pdf of the env importance sampler for direction w.

    Self-consistent value (the sin(theta) of the build-time density and
    of the per-texel solid angle cancel): lum * W * H / (2 pi^2 * sum).
    Matches the constant in scene.h:373-374.
    """
    eh, ew = scene.env_map.shape[0], scene.env_map.shape[1]
    radiance = env_sample_bilinear(scene.env_map, mathx.to_plane(w))
    return (
        mathx.luminance(radiance)
        * scene.sum_light_power_inv
        * (ew * eh)
        * mathx.INV_PI
        * mathx.INV_PI
        * 0.5
    )


def _sample_env_map(scene: SceneData, r3, r4):
    """Pick a texel by luminance*sin(theta) alias table — scene.h:364-375."""
    eh, ew = scene.env_map.shape[0], scene.env_map.shape[1]
    pix = sample_alias(scene.env_prob, scene.env_alias, r3, r4)
    y = pix // ew
    x = pix - y * ew
    radiance = scene.env_map.reshape(-1, 3)[pix]
    uv = jnp.stack(
        [(x.astype(jnp.float32) + 0.5) / ew, (y.astype(jnp.float32) + 0.5) / eh],
        axis=-1,
    )
    wi = mathx.to_sphere(uv)
    pdf = (
        mathx.luminance(radiance)
        * scene.sum_light_power_inv
        * (ew * eh)
        * mathx.INV_PI
        * mathx.INV_PI
        * 0.5
    )
    return pdf, radiance, wi


def sample_direct_light_no_visibility(
    scene: SceneData,
    pos,
    r1, r2, r3, r4,
    has_env: bool,
    single_sided: bool = True,
) -> LightSample:
    """DevScene::sampleDirectLightNoVisibility (scene.h:394-425).

    `has_env` and `single_sided` are static flags (compile-time branches).
    """
    n_entries = scene.light_prob.shape[0]
    light_id = sample_alias(scene.light_prob, scene.light_alias, r1, r2)

    # --- area-light branch
    prim = scene.light_prim_ids[jnp.minimum(light_id, scene.light_prim_ids.shape[0] - 1)]
    tri = scene.verts[prim]
    v0, v1, v2 = tri[..., 0, :], tri[..., 1, :], tri[..., 2, :]
    sampled = mathx.sample_triangle_uniform(v0, v1, v2, r3, r4)
    normal = mathx.triangle_normal(v0, v1, v2)
    to_sampled = sampled - pos

    radiance = scene.light_radiance[
        jnp.minimum(light_id, scene.light_radiance.shape[0] - 1)
    ]
    wi = mathx.safe_normalize(to_sampled)
    dist = mathx.length(to_sampled)
    # pdf_area = power/sum/area = luminance * 2pi * sum_inv (see module doc)
    pdf_area = mathx.luminance(radiance) * 2.0 * mathx.PI * scene.sum_light_power_inv
    pdf = mathx.pdf_area_to_solid_angle(pdf_area, pos, sampled, normal)
    if single_sided:
        # SCENE_LIGHT_SINGLE_SIDED (common.h:6, scene.h:414-418)
        front = mathx.dot(normal, to_sampled) <= -1e-6
        pdf = jnp.where(front, pdf, INVALID_PDF)

    if has_env:
        env_pdf, env_rad, env_wi = _sample_env_map(scene, r3, r4)
        is_env = light_id == n_entries - 1
        pdf = jnp.where(is_env, env_pdf, pdf)
        radiance = jnp.where(is_env[..., None], env_rad, radiance)
        wi = jnp.where(is_env[..., None], env_wi, wi)
        dist = jnp.where(is_env, 1e10, dist)

    return LightSample(pdf=pdf, radiance=radiance, wi=wi, dist=dist)


def sample_direct_light(
    scene: SceneData,
    trv: ix.TraversalArrays,
    pos,
    r1, r2, r3, r4,
    has_env: bool,
    single_sided: bool = True,
    active=None,
) -> LightSample:
    """DevScene::sampleDirectLight (scene.h:427-459): NEE sample with a
    shadow ray; occluded samples get pdf = INVALID_PDF."""
    ls = sample_direct_light_no_visibility(
        scene, pos, r1, r2, r3, r4, has_env=has_env, single_sided=single_sided
    )
    # env samples use a far point (scene.h:386); area lights their sample
    target = pos + ls.wi * jnp.minimum(ls.dist, 1e6)[..., None]
    if active is None:
        shoot = ls.pdf > 0
    else:
        shoot = active & (ls.pdf > 0)
    occluded = ix.test_occlusion(trv, pos, target, active=shoot)
    pdf = jnp.where(occluded, INVALID_PDF, ls.pdf)
    return ls._replace(pdf=pdf)
