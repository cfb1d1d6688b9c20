"""Child process for the bench-regime regression gate (test_bench_gate.py).

Runs OUTSIDE the CPU-forced test conftest so the real TPU backend compiles
the production pipeline: the round-3 regression this gate pins (recolor
k-NN fused-dispatch miscompilation, see ops/recolor.py:_compact_gather) was
invisible on CPU and at <300k points — it only appeared on the axon TPU
platform at the bench's 607k-point regime.

Encodes a 2-frame 607k-point vox10 GOF at r1 and r3, decodes the streams,
and prints one JSON line with per-rate bpp / D1 / Y plus decoded-vs-recon
parity flags for positions AND colors.
"""

import json
import sys

import numpy as np


def run_rate(frames, rate_cfg):
    from vpcc_tpu.decoder import Decoder
    from vpcc_tpu.encoder import Encoder
    from vpcc_tpu.ops.metrics import compute_metrics
    from vpcc_tpu.utils.config import VPCCConfig

    cfg = VPCCConfig.from_cfg_files(
        "/root/reference/cfg/common/ctc-common.cfg", rate_cfg
    )
    cfg.geometry3dCoordinatesBitdepth = 10
    cfg.resolution = 1023
    cfg.iterationCountRefineSegmentation = 10
    cfg.gridBasedSegmentation = 1

    enc = Encoder(cfg)
    stream, recons = enc.encode_gof(frames)
    npts = sum(f.point_count for f in frames) / len(frames)
    bpp = len(stream) * 8 / (npts * len(frames))

    dec = Decoder(VPCCConfig.from_args(["--removeDuplicatePoints=1"]))
    decoded = dec.decode(stream)
    pos_parity = True
    col_parity = True
    for a, b in zip(recons, decoded):
        if a.point_count != b.point_count:
            pos_parity = col_parity = False
            continue
        # composite sort (pos, color) so duplicate positions order stably
        ra = np.concatenate([a.positions.astype(np.int64), a.colors.astype(np.int64)], 1)
        rb = np.concatenate([b.positions.astype(np.int64), b.colors.astype(np.int64)], 1)
        ra = ra[np.lexsort(ra.T[::-1])]
        rb = rb[np.lexsort(rb.T[::-1])]
        if not np.array_equal(ra[:, :3], rb[:, :3]):
            pos_parity = False
        if not np.array_equal(ra[:, 3:], rb[:, 3:]):
            col_parity = False

    ys, d1s = [], []
    for src, rec in zip(frames, recons):
        m = compute_metrics(
            src.positions.astype("int32"), src.colors,
            rec.positions.astype("int32"), rec.colors,
            resolution=1023, grid_bits=10,
        )
        ys.append(m.color_psnr[0])
        d1s.append(m.c2c_psnr)
    return {
        "bpp": round(float(bpp), 4),
        "y_db": round(float(np.mean(ys)), 2),
        "y_db_min": round(float(np.min(ys)), 2),
        "d1_db": round(float(np.mean(d1s)), 2),
        "pos_parity": pos_parity,
        "col_parity": col_parity,
    }


def main():
    from vpcc_tpu.utils.synthetic import make_person_cloud

    frames = [
        make_person_cloud(bits=10, n_samples=3_000_000, seed=s) for s in (7, 8)
    ]
    out = {
        "points_per_frame": int(
            sum(f.point_count for f in frames) / len(frames)
        ),
        "r1": run_rate(frames, "/root/reference/cfg/rate/ctc-r1.cfg"),
        "r3": run_rate(frames, "/root/reference/cfg/rate/ctc-r3.cfg"),
    }
    json.dump(out, sys.stdout)
    print()


if __name__ == "__main__":
    main()
