"""Tone mapping + quantization — the display path.

Port of sendImageToPBO (/root/reference/src/pathtrace.cu:30-56): optional
Filmic/ACES tonemap, gamma 2.2, quantize to uint8.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import ToneMapping
from ..utils import math as mathx


def tonemap(color, mode: int, scale: float = 1.0):
    color = color * scale
    if mode == ToneMapping.FILMIC:
        color = mathx.filmic(color)
    elif mode == ToneMapping.ACES:
        color = mathx.aces(color)
    return mathx.correct_gamma(color)


def to_uint8(color):
    return jnp.clip(color * 255.0, 0, 255).astype(jnp.uint8)
