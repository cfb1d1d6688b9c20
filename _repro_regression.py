"""Repro: per-frame Y-PSNR + bpp at r1 settings, 2-frame GOF, small cloud.
Run on CPU to avoid TPU contention."""
import os
pass
import numpy as np

from vpcc_tpu.utils.config import VPCCConfig
from vpcc_tpu.utils.synthetic import make_person_cloud
from vpcc_tpu.encoder import Encoder
from vpcc_tpu.ops.metrics import compute_metrics

cfg = VPCCConfig.from_cfg_files(
    "/root/reference/cfg/common/ctc-common.cfg",
    "/root/reference/cfg/rate/ctc-r1.cfg",
)
cfg.geometry3dCoordinatesBitdepth = 10
cfg.resolution = 1023
cfg.iterationCountRefineSegmentation = 2
cfg.gridBasedSegmentation = 1

frames = [make_person_cloud(bits=10, n_samples=300_000, seed=s) for s in (7, 8)]
print("pts:", [f.point_count for f in frames])
enc = Encoder(cfg)
stream, recons = enc.encode_gof(frames)
npts = sum(f.point_count for f in frames) / 2
print(f"bpp={len(stream)*8/(npts*2):.4f}")
for i, (src, rec) in enumerate(zip(frames, recons)):
    m = compute_metrics(
        src.positions.astype("int32"), src.colors,
        rec.positions.astype("int32"), rec.colors,
        resolution=1023, grid_bits=10,
    )
    print(f"frame {i}: d1={m.c2c_psnr:.2f}  y={m.color_psnr[0]:.2f} "
          f"u={m.color_psnr[1]:.2f} v={m.color_psnr[2]:.2f}")
    # also: how good was the recolor BEFORE video coding? compare recon
    # colors vs nearest-source color would need encoder internals; skip.
st = enc.stats
for s in st:
    print(f"stages: seg={s.segmentation_s:.2f} patch={s.patchgen_s:.2f} "
          f"video={s.video_s:.2f} recolor={s.recolor_s:.2f}")
