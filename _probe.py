"""Quick perf/RD probe at bench regime for one rate point."""
import sys
import time

from vpcc_tpu.utils.config import VPCCConfig
from vpcc_tpu.utils.synthetic import make_person_cloud
from vpcc_tpu.ops.metrics import compute_metrics

RATE = sys.argv[1] if len(sys.argv) > 1 else "r3"
NF = int(sys.argv[2]) if len(sys.argv) > 2 else 2

from vpcc_tpu.encoder import Encoder

cfg = VPCCConfig.from_cfg_files(
    "/root/reference/cfg/common/ctc-common.cfg",
    f"/root/reference/cfg/rate/ctc-{RATE}.cfg",
)
cfg.geometry3dCoordinatesBitdepth = 10
cfg.resolution = 1023
cfg.iterationCountRefineSegmentation = 10
cfg.gridBasedSegmentation = 1

frames = [make_person_cloud(bits=10, n_samples=3_000_000, seed=s)
          for s in (7, 8, 9, 10)][:NF]
enc = Encoder(cfg)
enc.encode_frame(frames[0])  # warmup compile
enc.stats.clear()
enc._height_hint = 0
t0 = time.perf_counter()
stream, recons = enc.encode_gof(frames)
dt = time.perf_counter() - t0
npts = sum(f.point_count for f in frames) / len(frames)
print(f"rate={RATE} bpp={len(stream)*8/(npts*len(frames)):.4f} "
      f"enc_s_per_frame={dt/len(frames):.2f}", flush=True)
for i, (src, rec) in enumerate(zip(frames, recons)):
    m = compute_metrics(
        src.positions.astype("int32"), src.colors,
        rec.positions.astype("int32"), rec.colors,
        resolution=1023, grid_bits=10,
    )
    print(f"frame {i}: d1={m.c2c_psnr:.2f}  y={m.color_psnr[0]:.2f}", flush=True)
for s in enc.stats:
    print(f"stages: seg={s.segmentation_s:.2f} patch={s.patchgen_s:.2f} "
          f"pack={s.packing_s:.2f} video={s.video_s:.2f} "
          f"recolor={s.recolor_s:.2f} recon={s.reconstruct_s:.2f} "
          f"total={s.total_s:.2f}", flush=True)
print("substream bytes:", getattr(enc, "last_stream_stats", {}))
