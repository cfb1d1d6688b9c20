"""Exact bench repro at r1, per-frame metrics, compact vs full recolor."""
import time
import numpy as np
import jax.numpy as jnp

from vpcc_tpu.utils.config import VPCCConfig
from vpcc_tpu.utils.synthetic import make_person_cloud
from vpcc_tpu import encoder as enc_mod
from vpcc_tpu.encoder import Encoder
from vpcc_tpu.ops import recolor
from vpcc_tpu.ops.metrics import compute_metrics

cfg = VPCCConfig.from_cfg_files(
    "/root/reference/cfg/common/ctc-common.cfg",
    "/root/reference/cfg/rate/ctc-r1.cfg",
)
cfg.geometry3dCoordinatesBitdepth = 10
cfg.resolution = 1023
cfg.iterationCountRefineSegmentation = 10
cfg.gridBasedSegmentation = 1

frames = [make_person_cloud(bits=10, n_samples=3_000_000, seed=s) for s in (7, 8)]
npts = sum(f.point_count for f in frames) / 2
print("pts:", [f.point_count for f in frames])


def run(label):
    enc = Encoder(cfg)
    t0 = time.perf_counter()
    stream, recons = enc.encode_gof(frames)
    dt = time.perf_counter() - t0
    print(f"[{label}] bpp={len(stream)*8/(npts*2):.4f}  t={dt:.1f}s")
    for i, (src, rec) in enumerate(zip(frames, recons)):
        m = compute_metrics(
            src.positions.astype("int32"), src.colors,
            rec.positions.astype("int32"), rec.colors,
            resolution=1023, grid_bits=10,
        )
        print(f"[{label}] frame {i}: d1={m.c2c_psnr:.2f} y={m.color_psnr[0]:.2f} "
              f"u={m.color_psnr[1]:.2f} v={m.color_psnr[2]:.2f} n_rec={rec.point_count}")
    for s in enc.stats:
        print(f"[{label}] stages: patch={s.patchgen_s:.2f} video={s.video_s:.2f} "
              f"recolor={s.recolor_s:.2f}")


run("compact")

# ---- swap in the full (round-2) recolor path
orig = recolor.transfer_colors_compact

def full_path(sp, sc, s_cnt, tp, t_cnt, grid_bits=10, **kw):
    ei, he = recolor.exact_matches(
        np.asarray(sp), np.asarray(tp), int(s_cnt), grid_bits
    )
    out = recolor.transfer_colors(
        sp, sc, jnp.asarray(int(s_cnt)), tp, t_cnt,
        jnp.asarray(ei), jnp.asarray(he), grid_bits=grid_bits,
        k=kw.get("k", 8), k_bwd=kw.get("k_bwd", 1),
        max_geom_d2_fwd=kw.get("max_geom_d2_fwd", 1000.0),
        max_geom_d2_bwd=kw.get("max_geom_d2_bwd", 1000.0),
        max_color_d2_fwd=kw.get("max_color_d2_fwd", 1000.0),
        dist_offset_fwd=kw.get("dist_offset_fwd", 4.0),
    )
    return out, (None, None)

recolor_mod = recolor
enc_mod.recolor.transfer_colors_compact = full_path
run("full")
