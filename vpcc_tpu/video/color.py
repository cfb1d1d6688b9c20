"""Color conversion RGB444 <-> YCbCr 4:2:0/4:4:4 (the PccLibColorConverter
equivalent).

Behavioral reference: `PCCInternalColorConverter` BT.709 conversion with
selectable down/upsampling filters
(source/lib/PccLibColorConverter/include/PCCInternalColorConverter.h:63-145).
Device-side elementwise math; filters are separable 2-tap averages (DF_F0) —
the longer filter banks can be added as alternative taps.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=())
def rgb_to_ycbcr(rgb: jax.Array) -> jax.Array:
    """(H, W, 3) uint8 RGB -> (H, W, 3) float32 YCbCr, full range [0,255]
    (BT.709 coefficients, reference PCCInternalColorConverter.h RGBtoYUV)."""
    r = rgb[..., 0].astype(jnp.float32)
    g = rgb[..., 1].astype(jnp.float32)
    b = rgb[..., 2].astype(jnp.float32)
    y = 0.2126 * r + 0.7152 * g + 0.0722 * b
    cb = (b - y) / 1.8556 + 128.0
    cr = (r - y) / 1.5748 + 128.0
    return jnp.stack([y, cb, cr], axis=-1)


@functools.partial(jax.jit, static_argnames=())
def ycbcr_to_rgb(ycc: jax.Array) -> jax.Array:
    """(H, W, 3) float YCbCr full-range -> (H, W, 3) uint8 RGB."""
    y = ycc[..., 0]
    cb = ycc[..., 1] - 128.0
    cr = ycc[..., 2] - 128.0
    r = y + 1.5748 * cr
    b = y + 1.8556 * cb
    g = (y - 0.2126 * r - 0.0722 * b) / 0.7152
    rgb = jnp.stack([r, g, b], axis=-1)
    return jnp.clip(jnp.round(rgb), 0, 255).astype(jnp.uint8)


def downsample_420(plane: jax.Array) -> jax.Array:
    """(H, W) float -> (H/2, W/2) via 2x2 mean."""
    h, w = plane.shape
    return plane.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))


def upsample_420(plane: jax.Array) -> jax.Array:
    """(H/2, W/2) -> (H, W) nearest (reference default chroma upsampling is
    a filter bank; nearest is the F0 fallback)."""
    return jnp.repeat(jnp.repeat(plane, 2, axis=0), 2, axis=1)
