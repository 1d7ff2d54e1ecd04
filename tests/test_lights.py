"""NEE unbiasedness: the alias-table light sampler must agree with a
brute-force hemisphere estimator of direct illumination."""

import jax.numpy as jnp
import numpy as np

from restir_tpu.ops import intersect as ix
from restir_tpu.ops import lights as lo
from restir_tpu.scene.procedural import cornell_box
from restir_tpu.scene.scene_data import LIGHT, traversal_arrays
from restir_tpu.utils import math as mathx
from restir_tpu.utils import rng


def test_nee_matches_hemisphere_sampling():
    scene, _ = cornell_box(with_blocks=False, bvh_impl="numpy")
    trv = traversal_arrays(scene)

    n = 60000
    pos = jnp.broadcast_to(jnp.array([0.5, 1.0, 0.5]), (n, 3))
    normal = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0]), (n, 3))
    pix = jnp.arange(n, dtype=jnp.uint32)

    # --- estimator A: NEE via alias table (Lambertian albedo 1)
    r1, r2, r3, r4 = rng.uniform4(pix, 0, 0, rng.SALT_DEBUG)
    ls = lo.sample_direct_light(
        scene, trv, pos, r1, r2, r3, r4, has_env=False, single_sided=True
    )
    ok = ls.pdf > 0
    est_a = (
        mathx.luminance(ls.radiance)
        * mathx.sat_dot(normal, ls.wi)
        / jnp.maximum(ls.pdf, 1e-20)
    )
    est_a = np.asarray(jnp.where(ok, est_a, 0.0)).mean() / np.pi  # f = 1/pi

    # --- estimator B: cosine hemisphere rays, hit the light geometrically
    h1, h2, _, _ = rng.uniform4(pix, 1, 1, rng.SALT_DEBUG)
    wi = mathx.sample_hemisphere_cosine(normal, h1, h2)
    o, d = ix.make_offseted_ray(pos, wi)
    hit = ix.intersect_closest(trv, o, d)
    mat_type = scene.mat_type[scene.mat_ids[jnp.maximum(hit.prim_id, 0)]]
    hit_light = (hit.prim_id >= 0) & (mat_type == LIGHT)
    le = scene.mat_base_color[scene.mat_ids[jnp.maximum(hit.prim_id, 0)]]
    # pdf = cos/pi, f = 1/pi -> contribution = Le * pi * (1/pi) = Le
    est_b = np.asarray(
        jnp.where(hit_light, mathx.luminance(le), 0.0)
    ).mean()

    assert est_a > 0.01 and est_b > 0.01
    np.testing.assert_allclose(est_a, est_b, rtol=0.05)


def test_nee_occlusion():
    scene, _ = cornell_box(with_blocks=True, bvh_impl="numpy")
    trv = traversal_arrays(scene)
    n = 4000
    # a point under the tall block: fully occluded from the light
    pos = jnp.broadcast_to(jnp.array([-0.95, 0.05, -0.85]), (n, 3))
    pix = jnp.arange(n, dtype=jnp.uint32)
    r1, r2, r3, r4 = rng.uniform4(pix, 2, 0, rng.SALT_DEBUG)
    ls = lo.sample_direct_light(
        scene, trv, pos, r1, r2, r3, r4, has_env=False, single_sided=True
    )
    assert np.asarray(ls.pdf > 0).mean() < 0.01


def test_single_sided_rejection():
    scene, _ = cornell_box(with_blocks=False, bvh_impl="numpy")
    n = 4000
    # point ABOVE the light quad (between light and ceiling): back side
    pos = jnp.broadcast_to(jnp.array([0.0, 5.495, 0.0]), (n, 3))
    pix = jnp.arange(n, dtype=jnp.uint32)
    r1, r2, r3, r4 = rng.uniform4(pix, 3, 0, rng.SALT_DEBUG)
    ls = lo.sample_direct_light_no_visibility(
        scene, pos, r1, r2, r3, r4, has_env=False, single_sided=True
    )
    assert np.all(np.asarray(ls.pdf) <= 0)
