"""Video-codec dispatch (the PCCVirtualVideoEncoder factory equivalent).

Reference: `PCCVirtualVideoEncoder<T>::create(codecId)`
(source/lib/PccLibVideoEncoder/include/PCCVirtualVideoEncoder.h:67-74)
selects HM/JM/VTM/...; here the codec id (signalled in our VPS) selects
between the TPU-native transform codec and the lossless fallback.
"""

from __future__ import annotations

import numpy as np

from vpcc_tpu.bitstream import v3c
from vpcc_tpu.utils.config import VPCCConfig
from vpcc_tpu.video import lossless


def encode_occupancy(occ_video: np.ndarray, cfg: VPCCConfig) -> bytes:
    """Lossless binary occupancy via the native context-adaptive arithmetic
    coder (native/entropy.cpp), ~5-10x smaller than deflate on these maps."""
    import struct

    from vpcc_tpu.video import entropy

    h, w = occ_video.shape
    return struct.pack("<HH", h, w) + entropy.encode_binary_plane(occ_video)


def decode_occupancy(payload: bytes, cfg: VPCCConfig) -> np.ndarray:
    import struct

    from vpcc_tpu.video import entropy

    h, w = struct.unpack("<HH", payload[:4])
    return entropy.decode_binary_plane(payload[4:], h, w)


def encode_geometry(geo: np.ndarray, cfg: VPCCConfig, occ=None) -> bytes:
    from vpcc_tpu.video import intra
    if cfg.geometryQP <= 4 or not intra.AVAILABLE:
        if occ is not None:
            geo = intra.fill_plane_host(geo, occ)
        return bytes([v3c.CODEC_LOSSLESS_ZLIB]) + lossless.encode_plane(np.asarray(geo).astype(np.uint16))
    return bytes([v3c.CODEC_TPU_INTRA]) + intra.encode_frame_mono(
        geo, qp=cfg.geometryQP, bitdepth=cfg.geometryBitDepth2D, occ=occ
    )


def decode_geometry(payload: bytes, cfg: VPCCConfig) -> np.ndarray:
    from vpcc_tpu.video import intra
    codec = payload[0]
    if codec == v3c.CODEC_LOSSLESS_ZLIB:
        return lossless.decode_plane(payload[1:])
    return intra.decode_frame_mono(payload[1:]).astype(np.uint16)


def encode_attribute(attr: np.ndarray, cfg: VPCCConfig, occ=None) -> bytes:
    from vpcc_tpu.video import intra
    if cfg.attributeQP <= 4 or not intra.AVAILABLE:
        if occ is not None:
            attr = intra.fill_rgb_host(attr, occ)
        return bytes([v3c.CODEC_LOSSLESS_ZLIB]) + lossless.encode_plane(np.asarray(attr).astype(np.uint8))
    return bytes([v3c.CODEC_TPU_INTRA]) + intra.encode_frame_rgb(attr, qp=cfg.attributeQP, occ=occ)


def decode_attribute(payload: bytes, cfg: VPCCConfig) -> np.ndarray:
    from vpcc_tpu.video import intra
    codec = payload[0]
    if codec == v3c.CODEC_LOSSLESS_ZLIB:
        return lossless.decode_plane(payload[1:])
    return intra.decode_frame_rgb(payload[1:])
