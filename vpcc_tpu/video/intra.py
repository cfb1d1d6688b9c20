"""TPU-native intra video codec.

Replaces the reference's external HM/JM/VTM encode path for the geometry and
attribute substreams (reference: PCCVideoEncoder::compress,
source/lib/PccLibEncoder/source/PCCVideoEncoder.cpp:282-440, which shells
out to HM — SURVEY.md §3.1 marks that subprocess as the hottest stage).

TPU-first split:
- 8x8 DCT-II + quantization as batched MXU matmuls (video/transform.py);
- DC intra prediction as a parallel prefix-sum DPCM over quantized DCs
  (order-independent, no raster-scan dependency);
- bit-serial adaptive arithmetic coding on the host (video/entropy.py,
  native C++), mirroring HM's CABAC role.

Frame container layout (little-endian): u8 codec-tag is written by the
dispatcher (video/codecs.py); this module serializes
[u16 h][u16 w][u8 qp][u8 flags][u32 len][payload] per plane.
"""

from __future__ import annotations

import functools
import struct
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vpcc_tpu.ops import padding
from vpcc_tpu.video import color, entropy, transform

AVAILABLE = True


@functools.partial(jax.jit, static_argnames=("qp",))
def _fill_forward(plane: jax.Array, occ: jax.Array, qp: int) -> jax.Array:
    """Fused device pass: push-pull background fill -> DCT -> quant ->
    DC-DPCM.  One dispatch, one (nblocks, 64) int32 download."""
    filled = padding.push_pull_fill(plane, occ)
    return transform.dc_dpcm(transform.forward(filled, qp))


@functools.partial(jax.jit, static_argnames=("qp",))
def _forward_only(plane: jax.Array, qp: int) -> jax.Array:
    return transform.dc_dpcm(transform.forward(plane.astype(jnp.float32), qp))


def _encode_plane(plane, qp: int, occ=None) -> Tuple[bytes, np.ndarray]:
    """Returns (payload bytes, decoded plane float32) for one (H, W) plane.
    H, W must be multiples of 8. `plane` may be a jax or numpy array; with
    `occ` given, unoccupied pixels are push-pull filled on device first."""
    h, w = plane.shape
    if occ is not None:
        coeffs = _fill_forward(jnp.asarray(plane, jnp.float32), jnp.asarray(occ), qp)
    else:
        coeffs = _forward_only(jnp.asarray(plane), qp)
    coeffs_h = np.asarray(coeffs)
    payload = entropy.encode_coeffs(coeffs_h)
    # encoder-side reconstruction (must match decoder bit-exactly)
    dec = _decode_plane_from_coeffs(coeffs_h, qp, h, w)
    return payload, dec


def _decode_plane_from_coeffs(coeffs: np.ndarray, qp: int, h: int, w: int) -> np.ndarray:
    c = transform.dc_dpcm_inverse(jnp.asarray(coeffs))
    return np.asarray(transform.inverse(c, qp, h, w))


def _decode_plane(payload: bytes, qp: int, h: int, w: int) -> np.ndarray:
    nblocks = (h // 8) * (w // 8)
    coeffs = entropy.decode_coeffs(payload, nblocks)
    return _decode_plane_from_coeffs(coeffs, qp, h, w)


def _pack(planes: List[Tuple[np.ndarray, int, bytes]]) -> bytes:
    out = bytearray()
    out.append(len(planes))
    for shape_hw, qp, payload in planes:
        out.extend(struct.pack("<HHBBI", shape_hw[0], shape_hw[1], qp, 0, len(payload)))
        out.extend(payload)
    return bytes(out)


def _unpack(data: bytes) -> List[Tuple[Tuple[int, int], int, bytes]]:
    n = data[0]
    pos = 1
    planes = []
    for _ in range(n):
        h, w, qp, _flags, ln = struct.unpack("<HHBBI", data[pos : pos + 10])
        pos += 10
        planes.append(((h, w), qp, data[pos : pos + ln]))
        pos += ln
    return planes


# ---------------------------------------------------------------------------
# host-side fill helpers (lossless fallback path)

def fill_plane_host(plane, occ) -> np.ndarray:
    filled = padding.push_pull_fill(jnp.asarray(plane, jnp.float32), jnp.asarray(occ))
    return np.round(np.asarray(filled)).astype(np.asarray(plane).dtype)


def fill_rgb_host(attr, occ) -> np.ndarray:
    occ_d = jnp.asarray(occ)
    chans = [
        padding.push_pull_fill(jnp.asarray(np.asarray(attr)[..., c], jnp.float32), occ_d)
        for c in range(3)
    ]
    return np.clip(np.round(np.stack([np.asarray(c) for c in chans], -1)), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# mono (geometry) frames

def encode_frame_mono(plane, qp: int, bitdepth: int = 8, occ=None) -> bytes:
    payload, _ = _encode_plane(plane, qp, occ=occ)
    return _pack([(plane.shape, qp, payload)])


def decode_frame_mono(data: bytes, bitdepth: int = 8) -> np.ndarray:
    (hw, qp, payload), = _unpack(data)
    dec = _decode_plane(payload, qp, hw[0], hw[1])
    return np.clip(np.round(dec), 0, (1 << bitdepth) - 1).astype(np.uint16)


def reconstruct_frame_mono(plane, qp: int, bitdepth: int = 8, occ=None) -> Tuple[bytes, np.ndarray]:
    """One-pass encode + encoder-side reconstruction (saves a decode)."""
    payload, dec = _encode_plane(plane, qp, occ=occ)
    rec = np.clip(np.round(dec), 0, (1 << bitdepth) - 1).astype(np.uint16)
    return _pack([(plane.shape, qp, payload)]), rec


# ---------------------------------------------------------------------------
# RGB (attribute) frames: BT.709 + 4:2:0 chroma

@functools.partial(jax.jit, static_argnames=())
def _rgb_to_planes(attr: jax.Array, occ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    ycc = color.rgb_to_ycbcr(attr)
    y, cb, cr = ycc[..., 0], ycc[..., 1], ycc[..., 2]
    if occ is not None:
        y = padding.push_pull_fill(y, occ)
        cb = padding.push_pull_fill(cb, occ)
        cr = padding.push_pull_fill(cr, occ)
    return y, color.downsample_420(cb), color.downsample_420(cr)


def encode_frame_rgb(attr, qp: int, occ=None) -> bytes:
    y, cb, cr = _rgb_to_planes(
        jnp.asarray(attr), None if occ is None else jnp.asarray(occ)
    )
    chroma_qp = min(qp + 3, 51)
    py, _ = _encode_plane(y, qp)
    pcb, _ = _encode_plane(cb, chroma_qp)
    pcr, _ = _encode_plane(cr, chroma_qp)
    return _pack([(tuple(y.shape), qp, py), (tuple(cb.shape), chroma_qp, pcb), (tuple(cr.shape), chroma_qp, pcr)])


def decode_frame_rgb(data: bytes) -> np.ndarray:
    planes = _unpack(data)
    (hwy, qpy, py), (hwc, qpc, pcb), (_, _, pcr) = planes
    y = _decode_plane(py, qpy, hwy[0], hwy[1])
    cb = _decode_plane(pcb, qpc, hwc[0], hwc[1])
    cr = _decode_plane(pcr, qpc, hwc[0], hwc[1])
    ycc = jnp.stack(
        [
            jnp.asarray(y),
            color.upsample_420(jnp.asarray(cb)),
            color.upsample_420(jnp.asarray(cr)),
        ],
        axis=-1,
    )
    return np.asarray(color.ycbcr_to_rgb(ycc))
