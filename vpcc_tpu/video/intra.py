"""TPU-native intra video codec — placeholder module.

The real transform codec (intra prediction on the VPU, DCT via MXU matmuls,
quantization, host entropy finalization) lands in video/intra.py as build
phase D (SURVEY.md §7 step 5).  Until then AVAILABLE=False routes all
substreams through the lossless fallback.
"""

AVAILABLE = False


def encode_frame_mono(*a, **k):  # pragma: no cover
    raise NotImplementedError


def decode_frame_mono(*a, **k):  # pragma: no cover
    raise NotImplementedError


def encode_frame_rgb(*a, **k):  # pragma: no cover
    raise NotImplementedError


def decode_frame_rgb(*a, **k):  # pragma: no cover
    raise NotImplementedError
