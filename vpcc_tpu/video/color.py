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


# ---------------------------------------------------------------------------
# Selectable chroma resampling filter banks (reference g_filter444to420 /
# g_filter420to444, PCCInternalColorConverter.cpp:37-330).  Each downsample
# filter is a (odd-phase taps, even-phase taps, offset, shift) pair applied
# separably (horizontal to half width with the odd/even pair, then vertical);
# each upsample filter carries 4 phase kernels (v0, v1, h0, h1).  Names per
# the reference enum: DF_F0 / DF_F1 / DF_TM5 / DF_WCS; UF_F0 / UF_FV /
# UF_GS / UF_LS3 / UF_TM.

DOWN_FILTERS = {
    0: ([64, 384, 64], [256, 256], 256.0, 9),            # DF_F0
    1: ([128, 256, 128], [256, 256], 256.0, 9),          # DF_F1
    2: ([21, 0, -52, 0, 159, 256, 159, 0, -52, 0, 21],
        [5, 11, -21, -37, 70, 228, 228, 70, -37, -21, 11, 5],
        256.0, 9),                                        # DF_TM5
    5: ([2, -3, -9, 6, 39, 58, 39, 6, -9, -3, 2],
        [1, 0, -7, -5, 22, 53, 53, 22, -5, -7, 0, 1],
        64.0, 7),                                         # DF_WCS
}

UP_FILTERS = {
    0: ([0, 256], [-8, 64, 216, -16], [-16, 144, 144, -16],
        [-16, 216, 64, -8], 128.0, 8),                    # UF_F0
    1: ([0, 256], [0, -16, 56, 240, -32, 8], [-16, 144, 144, -16],
        [8, -32, 240, 56, -16, 0], 128.0, 8),             # UF_FV
    2: ([0, 256], [-6, 58, 222, -18], [-16, 144, 144, -16],
        [-18, 222, 58, -6], 128.0, 8),                    # UF_GS
    3: ([0, 256], [2, -18, 70, 228, -34, 8], [6, -34, 156, 156, -34, 6],
        [8, -34, 228, 70, -18, 2], 128.0, 8),             # UF_LS3
    5: ([0, 256], [3, -16, 67, 227, -32, 7], [21, -52, 159, 159, -52, 21],
        [7, -32, 227, 67, -16, 3], 128.0, 8),             # UF_TM
}


def _conv_phase(x: np.ndarray, taps, center: int, axis: int,
                phase: int) -> np.ndarray:
    """Edge-replicated 1-D convolution sampled at 2k+phase along `axis`."""
    t = np.asarray(taps, np.float64)
    n = len(t)
    x = np.moveaxis(np.asarray(x, np.float64), axis, 0)
    L = x.shape[0]
    pad_l, pad_r = center, n - 1 - center
    xp = np.concatenate(
        [np.repeat(x[:1], pad_l, 0), x, np.repeat(x[-1:], pad_r, 0)], 0
    )
    pos = np.arange(phase, L, 2)
    out = np.zeros((len(pos),) + x.shape[1:], np.float64)
    for k in range(n):
        out += t[k] * xp[pos + k]
    return np.moveaxis(out, 0, axis)


def downsample_420_filter(plane: np.ndarray, filt: int = 0) -> np.ndarray:
    """444 -> 420 chroma downsampling with the selected reference filter
    (separable: odd-phase horizontal to half width, even-phase vertical to
    half height; reference downsampling(), PCCInternalColorConverter.cpp:
    645-668)."""
    odd, even, offset, shift = DOWN_FILTERS[int(filt)]
    del offset  # integer-rounding bias in the reference; float path omits it
    scale = 1.0 / (1 << shift)
    h = _conv_phase(plane, odd, len(odd) // 2, axis=1, phase=0) * scale
    return _conv_phase(h, even, len(even) // 2 - 1, axis=0, phase=0) * scale


def upsample_420_filter(plane: np.ndarray, filt: int = 0) -> np.ndarray:
    """420 -> 444 chroma upsampling with the selected reference filter.

    The 4 kernels are PHASE kernels (reference upsampling(),
    PCCInternalColorConverter.cpp:670-696): chroma sits co-sited
    horizontally and interstitial vertically, so the vertical pass
    interpolates at -1/4 / +1/4 (kernels 1 and 3) and the horizontal pass
    at 0 / +1/2 (kernels 0 and 2)."""
    p0, p1, p2, p3, offset, shift = UP_FILTERS[int(filt)]
    del offset  # integer-rounding bias; the float path omits it
    scale = 1.0 / (1 << shift)

    def up_axis(x, taps_even, c_even, taps_odd, c_odd, axis):
        x = np.moveaxis(np.asarray(x, np.float64), axis, 0)
        L = x.shape[0]
        out = np.zeros((2 * L,) + x.shape[1:], np.float64)

        def apply(taps, center):
            t = np.asarray(taps, np.float64)
            n = len(t)
            pad_l, pad_r = center, n - 1 - center
            xp = np.concatenate(
                [np.repeat(x[:1], pad_l, 0), x, np.repeat(x[-1:], pad_r, 0)],
                0,
            )
            acc = np.zeros_like(x)
            for k in range(n):
                acc += t[k] * xp[np.arange(L) + k]
            return acc * scale

        out[0::2] = apply(taps_even, c_even)
        out[1::2] = apply(taps_odd, c_odd)
        return np.moveaxis(out, 0, axis)

    v = up_axis(plane, p1, len(p1) // 2, p3, len(p3) // 2 - 1, axis=0)
    return up_axis(v, p0, len(p0) - 1, p2, len(p2) // 2 - 1, axis=1)
