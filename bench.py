"""Benchmark: V-PCC encode throughput on a vox10-class frame (real device).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline anchor: the reference TMC2 (CPU, nbThread=1, CTC all-intra r3 on
longdress_vox10) encodes at roughly 60 s/frame — wall-clock is dominated by
the external HM encoder's RDO (SURVEY.md §3.1 "HOTTEST"), with segmentation/
packing adding ~15-30 s/frame.  The CTC datasets are not redistributable, so
the bench uses a deterministic synthetic vox10 surface with matched point
count (~750k); BASELINE.md records the protocol.
"""

import json
import sys
import time

TMC2_SECONDS_PER_FRAME = 60.0  # single-thread anchor estimate (see docstring)


def main():
    from vpcc_tpu.encoder import Encoder
    from vpcc_tpu.utils.config import VPCCConfig
    from vpcc_tpu.utils.synthetic import make_person_cloud

    cfg = VPCCConfig.from_cfg_files(
        "/root/reference/cfg/common/ctc-common.cfg",
        "/root/reference/cfg/rate/ctc-r3.cfg",
    )
    cfg.geometry3dCoordinatesBitdepth = 10
    cfg.resolution = 1023
    cfg.iterationCountRefineSegmentation = 10

    frames = [make_person_cloud(bits=10, n_samples=3_000_000, seed=s) for s in (7, 8)]
    npts = sum(f.point_count for f in frames) / len(frames)

    enc = Encoder(cfg)
    # warmup (compile)
    enc.encode_frame(frames[0])

    t0 = time.perf_counter()
    stream, recons = enc.encode_gof(frames)
    dt = time.perf_counter() - t0
    fps = len(frames) / dt

    bpp = len(stream) * 8 / (npts * len(frames))
    vs = fps / (1.0 / TMC2_SECONDS_PER_FRAME)
    print(
        json.dumps(
            {
                "metric": "vpcc_encode_fps_vox10",
                "value": round(fps, 4),
                "unit": "frames/s/chip",
                "vs_baseline": round(vs, 2),
                "detail": {
                    "points_per_frame": int(npts),
                    "seconds_per_frame": round(dt / len(frames), 3),
                    "bits_per_point": round(bpp, 3),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
