import jax.numpy as jnp
import numpy as np

from restir_tpu.ops import bsdf as b
from restir_tpu.scene.scene_data import DIELECTRIC, LAMBERTIAN, METALLIC_WORKFLOW
from restir_tpu.utils import math as mathx
from restir_tpu.utils import rng


def make_mat(mtype, n, base=(1.0, 1.0, 1.0), metallic=0.0, roughness=0.5, ior=1.5):
    return b.SurfaceMaterial(
        type=jnp.full((n,), mtype, jnp.int32),
        base_color=jnp.broadcast_to(jnp.array(base), (n, 3)),
        metallic=jnp.full((n,), metallic),
        roughness=jnp.full((n,), roughness),
        ior=jnp.full((n,), ior),
    )


def draws(n, ctr, looper=0):
    pix = jnp.arange(n, dtype=jnp.uint32)
    return rng.uniform4(pix, looper, ctr, rng.SALT_DEBUG)


def test_lambertian_white_furnace():
    """E[f * cos / pdf] over cosine-sampled wi == albedo."""
    n = 40000
    mat = make_mat(LAMBERTIAN, n, base=(0.7, 0.5, 0.3))
    normal = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (n, 3))
    wo = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (n, 3))
    r1, r2, r3, _ = draws(n, 0)
    s = b.sample_bsdf(mat, normal, wo, (r1, r2, r3))
    est = s.f * (mathx.sat_dot(normal, s.wi) / jnp.maximum(s.pdf, 1e-20))[..., None]
    mean = np.asarray(est).mean(axis=0)
    np.testing.assert_allclose(mean, [0.7, 0.5, 0.3], atol=0.01)


def test_metallic_sample_pdf_consistency():
    """pdf returned by sample_bsdf must equal pdf_bsdf(wi)."""
    n = 5000
    for metallic, rough in [(0.0, 0.8), (0.5, 0.3), (1.0, 0.1)]:
        mat = make_mat(METALLIC_WORKFLOW, n, metallic=metallic, roughness=rough)
        normal = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (n, 3))
        wo_dir = np.array([0.3, 0.1, 0.9])
        wo_dir /= np.linalg.norm(wo_dir)
        wo = jnp.broadcast_to(jnp.asarray(wo_dir, jnp.float32), (n, 3))
        r1, r2, r3, _ = draws(n, 1)
        s = b.sample_bsdf(mat, normal, wo, (r1, r2, r3))
        valid = ~np.asarray(b.is_invalid(s.type))
        pdf2 = np.asarray(b.pdf_bsdf(mat, normal, wo, s.wi))
        np.testing.assert_allclose(
            np.asarray(s.pdf)[valid], pdf2[valid], rtol=2e-3, atol=1e-5
        )


def test_metallic_furnace_rough():
    """Rough full-metal furnace: E[f cos/pdf] should be close to F ~ base
    (energy loss from single-scatter GGX is expected but bounded)."""
    n = 60000
    mat = make_mat(METALLIC_WORKFLOW, n, base=(1.0, 1.0, 1.0), metallic=1.0, roughness=0.5)
    normal = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (n, 3))
    wo = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (n, 3))
    r1, r2, r3, _ = draws(n, 2)
    s = b.sample_bsdf(mat, normal, wo, (r1, r2, r3))
    valid = (~np.asarray(b.is_invalid(s.type))) & (np.asarray(s.pdf) > 1e-8)
    est = np.asarray(
        s.f * (mathx.sat_dot(normal, s.wi) / jnp.maximum(s.pdf, 1e-20))[..., None]
    )
    mean = est[valid].mean(axis=0) * valid.mean()
    assert 0.75 < mean[0] <= 1.05  # single-scatter GGX loses some energy


def test_dielectric_delta_and_energy():
    n = 20000
    mat = make_mat(DIELECTRIC, n, ior=1.5)
    normal = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (n, 3))
    ang = 0.7
    wo = jnp.broadcast_to(
        jnp.array([np.sin(ang), 0.0, np.cos(ang)], dtype=jnp.float32), (n, 3)
    )
    r1, r2, r3, _ = draws(n, 3)
    s = b.sample_bsdf(mat, normal, wo, (r1, r2, r3))
    types = np.asarray(s.type)
    refl = (types & b.REFLECTION) != 0
    trans = (types & b.TRANSMISSION) != 0
    assert np.all((types & b.SPECULAR) != 0)
    # fraction reflecting should equal fresnel
    fres = float(b.fresnel_dielectric(jnp.cos(jnp.float32(ang)), jnp.float32(1.5)))
    assert abs(refl.mean() - fres) < 0.02
    # reflected dir mirrors wo about n
    wr = np.asarray(s.wi)[refl][0]
    np.testing.assert_allclose(wr, [-np.sin(ang), 0, np.cos(ang)], atol=1e-5)
    # transmitted obeys Snell
    wt = np.asarray(s.wi)[trans][0]
    assert np.isclose(abs(wt[0]), np.sin(ang) / 1.5, atol=1e-4)
    # eval/pdf of delta lobes are zero
    assert float(jnp.max(b.eval_bsdf(mat, normal, wo, s.wi))) == 0.0
    assert float(jnp.max(b.pdf_bsdf(mat, normal, wo, s.wi))) == 0.0


def test_eval_matches_sample_f():
    """For non-delta lobes, sample.f must equal eval_bsdf at sampled wi."""
    n = 3000
    for mtype, kw in [
        (LAMBERTIAN, {}),
        (METALLIC_WORKFLOW, dict(metallic=0.7, roughness=0.4)),
    ]:
        mat = make_mat(mtype, n, base=(0.8, 0.6, 0.4), **kw)
        normal = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (n, 3))
        wo = jnp.broadcast_to(jnp.array([0.2, 0.0, 0.98]), (n, 3))
        wo = wo / jnp.linalg.norm(wo, axis=-1, keepdims=True)
        r1, r2, r3, _ = draws(n, 4)
        s = b.sample_bsdf(mat, normal, wo, (r1, r2, r3))
        f2 = b.eval_bsdf(mat, normal, wo, s.wi)
        valid = ~np.asarray(b.is_invalid(s.type))
        np.testing.assert_allclose(
            np.asarray(s.f)[valid], np.asarray(f2)[valid], rtol=1e-4, atol=1e-6
        )
