"""Pallas à-trous wavelet kernels: EAW + SVGF levels on channel-major packs.

TPU re-design of the reference's wavelet filters
(/root/reference/src/denoiser.cu:64-216). The XLA plane-shift version in
models/denoiser.py (kept as the CPU/test reference and the sharded-path
implementation) materializes ~25 shifted whole-frame copies per level in
HBM — measured 23 ms of the 114.7 ms 1080p DI frame (BASELINE.md r3).
This kernel keeps a 3-band row window in VMEM and reads/writes each
frame channel once per level.

Layout. Packs are [C, g, 128] with flat pixel p = row * 128 + lane and
W % 128 == 0, so a 2-D tap offset o = dy*W + dx is a STATIC sublane
shift s = floor(o / 128) plus a lane residue t = o mod 128:

    shifted[r, l] = where(l < 128 - t, roll(U, -t), roll(V, -t))[r, l]
    U = window rows shifted by s, V = rows shifted by s + 1

Window. Each grid step DMAs three band-sized row slabs — previous /
current / next band, starts clipped to [0, g - band] — into ONE
contiguous [C, 3*band, 128] scratch, so every tap is a static slice of
it. The clip duplicates the edge band at i = 0 / i = n-1; duplicated
rows are only ever read by lanes whose tap falls outside the frame,
which the x/y bounds mask zeroes (same rejection as the reference's
`continue`, denoiser.cu:80-84). Correct for any tap with
|s| + 1 <= band, which the band search guarantees.

No scalar prefetch: slab starts are program_id arithmetic, every slice
offset is Python-static.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_di import _NULL

# 5x5 Gaussian (denoiser.cu:11-17) — must match models/denoiser.py
_GAUSSIAN_5 = (
    (0.0030, 0.0133, 0.0219, 0.0133, 0.0030),
    (0.0133, 0.0596, 0.0983, 0.0596, 0.0133),
    (0.0219, 0.0983, 0.1621, 0.0983, 0.0219),
    (0.0133, 0.0596, 0.0983, 0.0596, 0.0133),
    (0.0030, 0.0133, 0.0219, 0.0133, 0.0030),
)

# input channel layout of the per-level concat (built by the callers)
A_COL = 0  # 3: color (demodulated radiance / svgf history)
A_PRIM = 3  # prim remap (G_PRIMR)
A_NORM = 4  # 3
A_POS = 7  # 3
C_EAW = 10
A_VAR = 10  # svgf only: variance
A_FV = 11  # svgf only: 3x3-prefiltered variance (filterVariance)
C_SVGF = 12

# conservative per-kernel VMEM budget (bytes): window + double-buffered
# output block must fit ~16 MB/core with Mosaic overhead (the v5e has
# more physical VMEM; ATROUS_VMEM_MB env overrides for A/B sweeps)
import os as _os

_VMEM_BUDGET = int(_os.environ.get("ATROUS_VMEM_MB", "14")) * 1024 * 1024
_F32_EPS = float(jnp.finfo(jnp.float32).eps)


def pick_band(g: int, step: int, wpr: int, c_in: int):
    """Largest band (divisor of g, multiple of 8) whose 3-band window
    fits the VMEM budget and covers the tap reach (band >= smax + 1).
    Returns None when no feasible band exists (callers fall back to the
    XLA plane path)."""
    smax = 2 * step * wpr + 1
    win_bytes_per_row = 3 * c_in * 128 * 4
    out_bytes_per_row = 2 * 4 * 128 * 4  # <=4 out channels, 2x buffered
    bmax = (_VMEM_BUDGET - (1 << 20)) // (win_bytes_per_row + out_bytes_per_row)
    best = None
    b = 8
    while b <= min(g, bmax):
        if g % b == 0 and (b >= smax + 1 or b == g):
            best = b
        b += 8
    if best is not None and best < smax + 1 and best != g:
        return None
    return best


def _atrous_kernel(inp_ref, out_ref, win_ref, sems, *, mode, step, band,
                   wpr, width, height, g, sig_l, sig_n, sig_d):
    """One à-trous level. mode: 'eaw' (waveletFilter, denoiser.cu:64-134)
    or 'svgf' (variance-guided, denoiser.cu:139-216)."""
    c_in = inp_ref.shape[0]
    i = pl.program_id(0)

    starts = (
        jnp.clip((i - 1) * band, 0, g - band),
        i * band,
        jnp.clip((i + 1) * band, 0, g - band),
    )
    copies = [
        pltpu.make_async_copy(
            inp_ref.at[:, pl.ds(pl.multiple_of(s, 8), band), :],
            win_ref.at[:, k * band:(k + 1) * band, :],
            sems.at[k],
        )
        for k, s in enumerate(starts)
    ]
    for c in copies:
        c.start()

    # raster coords of the output band (for the frame-bounds mask)
    row = (i * band + jax.lax.broadcasted_iota(jnp.int32, (band, 128), 0)
           ).astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (band, 128), 1).astype(
        jnp.float32)
    y = jnp.floor(row * (1.0 / wpr))
    x = (row - y * wpr) * 128.0 + lane

    for c in copies:
        c.wait()

    lane_i = jax.lax.broadcasted_iota(jnp.int32, (1, band, 128), 2)

    def shifted(c0, c1, i_t, j_t):
        """[c1-c0, band, 128] input channels at tap offset
        (dy, dx) = (i_t*step, j_t*step)."""
        o = i_t * step * wpr * 128 + j_t * step
        s, t = o // 128, o % 128
        u = win_ref[c0:c1, band + s:band + s + band, :]
        if t == 0:
            return u
        v = win_ref[c0:c1, band + s + 1:band + s + 1 + band, :]
        ru = pltpu.roll(u, 128 - t, axis=2)
        rv = pltpu.roll(v, 128 - t, axis=2)
        return jnp.where(lane_i < 128 - t, ru, rv)

    def center(c0, c1):
        return win_ref[c0:c1, band:2 * band, :]

    color = center(A_COL, A_COL + 3)
    prim = center(A_PRIM, A_PRIM + 1)[0]
    norm = center(A_NORM, A_NORM + 3)
    pos = center(A_POS, A_POS + 3)
    if mode == "svgf":
        var = center(A_VAR, A_VAR + 1)[0]
        lum_p = (0.2126 * color[0] + 0.7152 * color[1] + 0.0722 * color[2])
        sum_v = jnp.zeros_like(var)
        sum_w2 = jnp.zeros_like(var)

    sum_c = jnp.zeros_like(color)
    sum_w = jnp.zeros_like(prim)
    for i_t in range(-2, 3):
        if abs(i_t) * step >= height:
            continue  # tap is out of frame for every pixel
        for j_t in range(-2, 3):
            if abs(j_t) * step >= width:
                continue
            gk = _GAUSSIAN_5[i_t + 2][j_t + 2]
            ok = (x + j_t * step >= 0.0) & (x + j_t * step < width)
            ok &= (y + i_t * step >= 0.0) & (y + i_t * step < height)
            q = shifted(0, c_in, i_t, j_t)
            ok &= q[A_PRIM] == prim
            cq = q[A_COL:A_COL + 3]
            nq = q[A_NORM:A_NORM + 3]
            pq = q[A_POS:A_POS + 3]
            d2p = ((pos[0] - pq[0]) ** 2 + (pos[1] - pq[1]) ** 2
                   + (pos[2] - pq[2]) ** 2)
            if mode == "eaw":
                d2c = ((color[0] - cq[0]) ** 2 + (color[1] - cq[1]) ** 2
                       + (color[2] - cq[2]) ** 2)
                wc = jnp.minimum(1.0, jnp.exp(-d2c / sig_l))
                d2n = ((norm[0] - nq[0]) ** 2 + (norm[1] - nq[1]) ** 2
                       + (norm[2] - nq[2]) ** 2)
                wn = jnp.minimum(1.0, jnp.exp(-d2n / sig_n))
                wp = jnp.minimum(1.0, jnp.exp(-d2p / sig_d))
                weight = jnp.where(ok, wc * wn * wp * gk, 0.0)
            else:
                wp = jnp.exp(-d2p / sig_d) + 1e-4
                ndot = jnp.maximum(
                    norm[0] * nq[0] + norm[1] * nq[1] + norm[2] * nq[2], 0.0)
                # x**sig_n with sig_n a large even int (128): exp/log
                # matches jnp.power's float lowering; clamp log(0)
                wn = jnp.exp(
                    sig_n * jnp.log(jnp.maximum(ndot, 1e-30))) + 1e-4
                lum_q = 0.2126 * cq[0] + 0.7152 * cq[1] + 0.0722 * cq[2]
                fvq = q[A_FV]
                denom = sig_l * jnp.sqrt(jnp.maximum(fvq, 0.0)) + 1e-4
                wc = jnp.exp(-jnp.abs(lum_p - lum_q) / denom) + 1e-4
                weight = jnp.where(ok, wc * wn * wp * gk, 0.0)
                w2 = weight * weight
                sum_v = sum_v + q[A_VAR] * w2
                sum_w2 = sum_w2 + w2
            sum_c = sum_c + cq * weight[None]
            sum_w = sum_w + weight

    if mode == "eaw":
        keep = (sum_w == 0.0) | (prim <= _NULL)
        out = sum_c / jnp.maximum(sum_w, 1e-20)[None]
        out_ref[0:3] = jnp.where(keep[None], color, out)
    else:
        keep = (sum_w < _F32_EPS) | (prim <= _NULL)
        out_c = sum_c / jnp.maximum(sum_w, 1e-20)[None]
        out_v = sum_v / jnp.maximum(sum_w2, 1e-20)
        out_ref[0:3] = jnp.where(keep[None], color, out_c)
        out_ref[3] = jnp.where(keep, var, out_v)


@functools.partial(jax.jit, static_argnames=(
    "mode", "level", "width", "height", "band", "sig_l", "sig_n", "sig_d",
    "interpret"))
def atrous_level_pallas(inp, *, mode, level, width, height, band,
                        sig_l, sig_n, sig_d, interpret=False):
    """One wavelet level over the channel-major concat `inp`
    ([C_EAW or C_SVGF, g, 128], see the A_* layout). Returns
    [3, g, 128] filtered color for 'eaw', [4, g, 128]
    (color, variance) for 'svgf'. `band` from pick_band; sigmas are
    cfg.sig_luminance / sig_normal / sig_depth for 'eaw' and
    cfg.sig_luminance / svgf_sig_normal / svgf_sig_depth for 'svgf'."""
    c_in = inp.shape[0]
    g = inp.shape[1]
    wpr = width // 128
    step = 1 << level
    c_out = 3 if mode == "eaw" else 4

    kernel = functools.partial(
        _atrous_kernel, mode=mode, step=step, band=band, wpr=wpr,
        width=float(width), height=float(height), g=g,
        sig_l=float(sig_l), sig_n=float(sig_n), sig_d=float(sig_d))

    return pl.pallas_call(
        kernel,
        grid=(g // band,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((c_out, band, 128), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c_out, g, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((c_in, 3 * band, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(inp)
