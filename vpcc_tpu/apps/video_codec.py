"""PccAppVideoEncoder / PccAppVideoDecoder equivalents: direct access to the
video-codec layer for one raw stream.

Reference: source/app/PccAppVideoEncoder/PccAppVideoEncoder.cpp:105,
PccAppVideoDecoder.cpp:54 — encode/decode one YUV/RGB stream with the plugin
layer, bypassing the point-cloud pipeline.

Usage:
    python -m vpcc_tpu.apps.video_codec encode in.npy out.bin --qp=24
    python -m vpcc_tpu.apps.video_codec decode out.bin rec.npy
(.npy: (F, H, W) uint16 mono or (F, H, W, 3) uint8 RGB)
"""

from __future__ import annotations

import sys

import numpy as np

from vpcc_tpu.utils.config import VPCCConfig
from vpcc_tpu.video import codecs


def main(argv=None) -> int:
    args = argv if argv is not None else sys.argv[1:]
    pos = [a for a in args if not a.startswith("--")]
    cfg = VPCCConfig.from_args(args)
    if len(pos) < 3:
        print(__doc__, file=sys.stderr)
        return 1
    mode, inp, outp = pos[:3]
    qp = int(cfg.extra.get("qp", 24))
    if mode == "encode":
        frames = np.load(inp)
        rgb = frames.ndim == 4
        cfg.geometryQP = qp
        cfg.attributeQP = qp
        if rgb:
            enc = codecs.AttributeSubstreamEncoder(cfg)
        else:
            enc = codecs.GeometrySubstreamEncoder(cfg)
        payloads = [enc.encode(f)[0] for f in frames]
        with open(outp, "wb") as f:
            f.write(len(payloads).to_bytes(4, "little"))
            f.write((1 if rgb else 0).to_bytes(1, "little"))
            for p in payloads:
                f.write(len(p).to_bytes(4, "little"))
                f.write(p)
        total = sum(len(p) for p in payloads)
        print(f"encoded {len(payloads)} frames, {total} bytes")
    elif mode == "decode":
        data = open(inp, "rb").read()
        n = int.from_bytes(data[:4], "little")
        rgb = data[4] == 1
        pos_b = 5
        dec = (
            codecs.AttributeSubstreamDecoder(cfg)
            if rgb
            else codecs.GeometrySubstreamDecoder(cfg)
        )
        frames = []
        for _ in range(n):
            ln = int.from_bytes(data[pos_b : pos_b + 4], "little")
            pos_b += 4
            frames.append(dec.decode(data[pos_b : pos_b + ln]))
            pos_b += ln
        np.save(outp, np.stack(frames))
        print(f"decoded {n} frames -> {outp}")
    else:
        print(f"unknown mode {mode}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
