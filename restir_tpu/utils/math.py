"""Vectorized math primitives for the renderer.

Functional parity with the reference math library
(/root/reference/src/mathUtil.h:27-198), re-expressed as jnp ops over
arrays with a trailing component axis (``[..., 3]`` vectors). Everything
here is shape-polymorphic and jit/vmap friendly.
"""

from __future__ import annotations

import jax.numpy as jnp

PI = 3.1415926535897932384626433832795
TWO_PI = 2.0 * PI
INV_PI = 1.0 / PI


# ---------------------------------------------------------------------------
# small helpers


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def sat_dot(a, b):
    """max(dot(a, b), 0) — mathUtil.h:64."""
    return jnp.maximum(dot(a, b), 0.0)


def abs_dot(a, b):
    """|dot(a, b)| — mathUtil.h:68."""
    return jnp.abs(dot(a, b))


def length(v):
    return jnp.sqrt(jnp.sum(v * v, axis=-1))


def normalize(v, eps: float = 0.0):
    n = length(v)[..., None]
    if eps:
        n = jnp.maximum(n, eps)
    return v / n


def safe_normalize(v):
    return normalize(v, eps=1e-20)


def cross(a, b):
    return jnp.cross(a, b)


def pow5(x):
    x2 = x * x
    return x2 * x2 * x


def square(x):
    return x * x


def mix(a, b, t):
    return a * (1.0 - t) + b * t


def power_heuristic(f, g):
    """Two-sample power heuristic (beta=2) — mathUtil.h:81."""
    f2 = f * f
    return f2 / (f2 + g * g)


# ---------------------------------------------------------------------------
# color


def luminance(c):
    """Rec.709 luminance — mathUtil.h:119."""
    return c[..., 0] * 0.2126 + c[..., 1] * 0.7152 + c[..., 2] * 0.0722


def hdr_to_ldr(c):
    """Reinhard-style range compressor — mathUtil.h:36."""
    return c / (c + 1.0)


def ldr_to_hdr(c):
    """Inverse of hdr_to_ldr — mathUtil.h:40."""
    return c / (1.0 - c + 1e-4)


def _calc_filmic(c):
    return (c * (c * 0.22 + 0.03) + 0.002) / (c * (c * 0.22 + 0.3) + 0.06) - 1.0 / 30.0


def filmic(c):
    """Hable filmic tonemap — mathUtil.h:107."""
    return _calc_filmic(c * 1.6) / _calc_filmic(jnp.float32(11.2))


def aces(c):
    """ACES approximation — mathUtil.h:111."""
    return (c * (c * 2.51 + 0.03)) / (c * (c * 2.43 + 0.59) + 0.14)


def correct_gamma(c):
    """Gamma 2.2 encode — mathUtil.h:115."""
    return jnp.power(jnp.maximum(c, 0.0), 1.0 / 2.2)


# ---------------------------------------------------------------------------
# normal encoding (hemi-octahedral, 32-bit pair) — mathUtil.h:45-54


def encode_normal_hemi_oct(n):
    p = n[..., :2] * (1.0 / (jnp.abs(n[..., 0]) + jnp.abs(n[..., 1]) + n[..., 2]))[..., None]
    return jnp.stack([p[..., 0] + p[..., 1], p[..., 0] - p[..., 1]], axis=-1)


def decode_normal_hemi_oct(e):
    tx = (e[..., 0] + e[..., 1]) * 0.5
    ty = (e[..., 0] - e[..., 1]) * 0.5
    v = jnp.stack([tx, ty, 1.0 - jnp.abs(tx) - jnp.abs(ty)], axis=-1)
    return safe_normalize(v)


# ---------------------------------------------------------------------------
# NaN hygiene


def is_nan_or_inf(x):
    return jnp.isnan(x) | jnp.isinf(x)


def has_nan_or_inf(v):
    return jnp.any(is_nan_or_inf(v), axis=-1)


def zero_nan_or_inf(v):
    """Replace any NaN/Inf vector with zeros (restir.cu:224-226 guard)."""
    return jnp.where(has_nan_or_inf(v)[..., None], 0.0, v)


# ---------------------------------------------------------------------------
# triangles


def triangle_area(v0, v1, v2):
    return length(jnp.cross(v1 - v0, v2 - v0)) * 0.5


def triangle_normal(v0, v1, v2):
    return safe_normalize(jnp.cross(v1 - v0, v2 - v0))


def sample_triangle_uniform(v0, v1, v2, ru, rv):
    """Uniform area sampling — mathUtil.h:94 (sqrt warp)."""
    r = jnp.sqrt(rv)
    u = 1.0 - r
    v = ru * r
    return (
        v1 * u[..., None]
        + v2 * v[..., None]
        + v0 * (1.0 - u - v)[..., None]
    )


# ---------------------------------------------------------------------------
# sampling maps


def to_concentric_disk(x, y):
    """[0,1)^2 -> disk, polar warp — mathUtil.h:128."""
    r = jnp.sqrt(x)
    theta = y * TWO_PI
    return jnp.stack([jnp.cos(theta) * r, jnp.sin(theta) * r], axis=-1)


def to_sphere(uv):
    """Equirect [0,1]^2 -> unit sphere dir — mathUtil.h:134."""
    phi = uv[..., 0] * TWO_PI
    theta = uv[..., 1] * PI
    st = jnp.sin(theta)
    return jnp.stack([jnp.cos(phi) * st, jnp.cos(theta), jnp.sin(phi) * st], axis=-1)


def to_plane(v):
    """Unit dir -> equirect uv — mathUtil.h:139."""
    u = jnp.arctan2(v[..., 2], v[..., 0]) * INV_PI * 0.5 + 1.0
    u = u - jnp.floor(u)
    w = jnp.arctan2(jnp.sqrt(v[..., 0] ** 2 + v[..., 2] ** 2), v[..., 1]) * INV_PI
    return jnp.stack([u, w], axis=-1)


def local_ref_frame(n):
    """Tangent frame (t, b, n) around normal — mathUtil.h:146.

    Returns (t, b) with the same convention as the reference's
    localRefMatrix: helper = (0,0,1) when |n.y| > 0.9999 else (0,1,0);
    b = normalize(cross(n, helper)); t = cross(b, n).
    """
    cond = (jnp.abs(n[..., 1]) > 0.9999)[..., None]
    helper = jnp.where(
        cond,
        jnp.array([0.0, 0.0, 1.0], n.dtype),
        jnp.array([0.0, 1.0, 0.0], n.dtype),
    )
    b = safe_normalize(jnp.cross(n, helper))
    t = jnp.cross(b, n)
    return t, b


def local_to_world(n, v):
    """mathUtil.h:153 — rotate local vector v into the frame of n."""
    t, b = local_ref_frame(n)
    return safe_normalize(
        t * v[..., 0:1] + b * v[..., 1:2] + n * v[..., 2:3]
    )


def sample_hemisphere_cosine(n, rx, ry):
    """Cosine-weighted hemisphere sample about n — mathUtil.h:157."""
    d = to_concentric_disk(rx, ry)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - jnp.sum(d * d, axis=-1)))
    local = jnp.concatenate([d, z[..., None]], axis=-1)
    return local_to_world(n, local)


def refract(n, wi, ior):
    """Snell refraction — mathUtil.h:163.

    Returns (ok, wt). ior is the material's eta (outside->inside); the
    incident-side flip is handled internally like the reference.
    """
    cos_in = dot(n, wi)
    ior = jnp.where(cos_in < 0, 1.0 / ior, ior)
    sin2_in = jnp.maximum(0.0, 1.0 - cos_in * cos_in)
    sin2_tr = sin2_in / (ior * ior)
    ok = sin2_tr < 1.0
    cos_tr = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2_tr))
    cos_tr = jnp.where(cos_in < 0, -cos_tr, cos_tr)
    wt = safe_normalize(
        -wi / ior[..., None] + n * ((cos_in / ior) - cos_tr)[..., None]
    )
    return ok, wt


def pdf_area_to_solid_angle(pdf, x, y, ny):
    """Convert area-measure pdf at y (normal ny) seen from x — mathUtil.h:182."""
    yx = x - y
    d2 = jnp.sum(yx * yx, axis=-1)
    return pdf * d2 / jnp.maximum(abs_dot(ny, safe_normalize(yx)), 1e-20)
