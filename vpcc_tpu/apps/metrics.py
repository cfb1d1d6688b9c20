"""PccAppMetrics equivalent: standalone source-vs-decoded metrics.

Reference: source/app/PccAppMetrics/PccAppMetrics.cpp:50-186.

Usage:
    python -m vpcc_tpu.apps.metrics --uncompressedDataPath=src_%04d.ply \
        --reconstructedDataPath=dec_%04d.ply --frameCount=N \
        [--resolution=1023] [--normalDataPath=nrm_%04d.ply]
"""

from __future__ import annotations

import sys

import numpy as np

from vpcc_tpu.ops.metrics import compute_metrics
from vpcc_tpu.utils.config import VPCCConfig
from vpcc_tpu.utils.ply import read_ply


def main(argv=None) -> int:
    cfg = VPCCConfig.from_args(argv if argv is not None else sys.argv[1:])
    if not cfg.uncompressedDataPath or not cfg.reconstructedDataPath:
        print("error: need --uncompressedDataPath and --reconstructedDataPath",
              file=sys.stderr)
        return 1
    agg = []
    for i in range(cfg.startFrameNumber, cfg.startFrameNumber + cfg.frameCount):
        src_p = cfg.uncompressedDataPath % i if "%" in cfg.uncompressedDataPath else cfg.uncompressedDataPath
        rec_p = cfg.reconstructedDataPath % i if "%" in cfg.reconstructedDataPath else cfg.reconstructedDataPath
        src = read_ply(src_p)
        rec = read_ply(rec_p)
        nrm = None
        if cfg.normalDataPath:
            np_p = cfg.normalDataPath % i if "%" in cfg.normalDataPath else cfg.normalDataPath
            nrm = read_ply(np_p).normals
        m = compute_metrics(
            src.positions.astype(np.int32), src.colors,
            rec.positions.astype(np.int32), rec.colors,
            resolution=cfg.resolution,
            src_normals=nrm,
            grid_bits=cfg.geometryBitDepth3D,
            with_d2=True,
            src_refl=src.reflectances,
            rec_refl=rec.reflectances,
        )
        line = f"frame {i}: {m.summary()}"
        if m.reflectance_psnr != float("inf"):
            line += f"  R {m.reflectance_psnr:8.4f}"
        print(line)
        agg.append(m)
    if agg:
        print(
            "mean:  D1 %8.4f dB  D2 %8.4f dB  Y %8.4f"
            % (
                float(np.mean([m.c2c_psnr for m in agg])),
                float(np.mean([m.c2p_psnr for m in agg])),
                float(np.mean([m.color_psnr[0] for m in agg])),
            )
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
