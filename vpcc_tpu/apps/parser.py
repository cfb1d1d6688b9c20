"""PccAppParser equivalent: inspect a V3C sample stream's structure.

Reference: source/app/PccAppParser/PccAppParser.cpp:50-90 (parses coded
streams for debugging).

Usage:
    python -m vpcc_tpu.apps.parser --compressedStreamPath=in.vpcc
"""

from __future__ import annotations

import sys
from pathlib import Path

from vpcc_tpu.bitstream import v3c
from vpcc_tpu.bitstream.bitio import BitReader
from vpcc_tpu.utils.config import VPCCConfig

_UNIT_NAMES = {
    v3c.V3C_VPS: "V3C_VPS",
    v3c.V3C_AD: "V3C_AD",
    v3c.V3C_OVD: "V3C_OVD",
    v3c.V3C_GVD: "V3C_GVD",
    v3c.V3C_AVD: "V3C_AVD",
}


def main(argv=None) -> int:
    cfg = VPCCConfig.from_args(argv if argv is not None else sys.argv[1:])
    if not cfg.compressedStreamPath:
        print("error: --compressedStreamPath required", file=sys.stderr)
        return 1
    data = Path(cfg.compressedStreamPath).read_bytes()
    pos = 0
    gof = 0
    while pos < len(data):
        size = int.from_bytes(data[pos : pos + 8], "big")
        pos += 8
        units = v3c.read_sample_stream(data[pos : pos + size])
        pos += size
        print(f"GOF {gof}: {size} bytes, {len(units)} units")
        for utype, payload in units:
            name = _UNIT_NAMES.get(utype, f"unit_{utype}")
            line = f"  {name:8s} {len(payload):9d} bytes"
            if utype == v3c.V3C_VPS:
                vps = v3c.V3CParameterSet.read(BitReader(payload))
                line += (
                    f"  {vps.frame_width}x{vps.frame_height}, "
                    f"{vps.frame_count} frames, maps {vps.map_count_minus1 + 1}"
                )
            elif utype == v3c.V3C_AD:
                br = BitReader(payload)
                n_tiles = 0
                n_patches = 0
                while br.more_data():
                    t = v3c.AtlasTileLayer.read(br)
                    n_tiles += 1
                    n_patches += len(t.patches)
                    if br.position >= len(payload):
                        break
                line += f"  {n_tiles} tile layers, {n_patches} patches"
            print(line)
        gof += 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
