"""Production-path profiling of the r3 encode (steady state, GOF regime).

Monkeypatch-instruments the real encode path: host entropy calls, video
device waits, recolor sub-dispatches, patchgen rounds.  Run manually:
    python -u profile_prod.py
"""
import time
from collections import defaultdict

import numpy as np

ACC = defaultdict(float)
CNT = defaultdict(int)


def wrap(mod, name, key):
    orig = getattr(mod, name)

    def timed(*a, **kw):
        t0 = time.perf_counter()
        out = orig(*a, **kw)
        ACC[key] += time.perf_counter() - t0
        CNT[key] += 1
        return out

    setattr(mod, name, timed)
    return orig


def main():
    from vpcc_tpu.utils.config import VPCCConfig
    from vpcc_tpu.utils.synthetic import make_person_cloud
    from vpcc_tpu.encoder import Encoder
    from vpcc_tpu.video import entropy, hevc, codecs
    from vpcc_tpu.ops import recolor, neighbors, cc as cc_mod, coverage
    from vpcc_tpu.core import atlas as atlas_mod
    from vpcc_tpu import pipeline

    # host entropy (native arithmetic coder)
    for nm in ("encode_hevc32_plane", "encode_hevc_plane", "encode_coeffs",
               "encode_mvs", "encode_binary_plane", "decode_binary_plane",
               "decode_hevc32_plane", "decode_hevc_plane", "decode_coeffs"):
        if hasattr(entropy, nm):
            wrap(entropy, nm, f"entropy.{nm}")
    # device video
    wrap(hevc, "encode_planes", "hevc.encode_planes_total")
    wrap(hevc, "encode_rgb", "hevc.encode_rgb_total")
    wrap(hevc, "_rgb_to_int_planes", "hevc.rgb2planes")
    # recolor pieces
    wrap(recolor, "_exact_and_counts", "recolor.exact_and_counts")
    wrap(recolor, "_compact_gather", "recolor.compact_gather")
    wrap(recolor, "_fwd_blend", "recolor.fwd_blend")
    wrap(recolor, "_bwd_and_merge_compact", "recolor.bwd_and_merge")
    wrap(neighbors, "knn", "neighbors.knn")
    wrap(neighbors, "nearest", "neighbors.nearest")
    wrap(neighbors, "build_grid", "neighbors.build_grid")
    # patchgen pieces
    wrap(cc_mod, "cc_labels_device", "cc.labels_device")
    wrap(cc_mod, "cc_round_voxel_compact", "cc.round_voxel_compact")
    wrap(cc_mod, "round_stats", "cc.round_stats")
    wrap(cc_mod, "components_from_labels", "cc.components_from_labels")
    wrap(coverage, "covered_radius_slab", "coverage.slab")
    # atlas
    wrap(atlas_mod, "rasterize_frame", "atlas.rasterize")
    wrap(atlas_mod, "derive_block_to_patch", "atlas.btp")
    wrap(atlas_mod, "downsample_occupancy", "atlas.occ_down")
    wrap(atlas_mod, "upsample_occupancy", "atlas.occ_up")
    wrap(pipeline, "reconstruct_frame_device", "pipe.recon")
    wrap(pipeline, "paint_attribute", "pipe.paint")
    wrap(pipeline, "gather_decoded_colors", "pipe.gather_cols")
    wrap(pipeline, "apply_color_smoothing_device", "pipe.color_smooth")
    wrap(pipeline, "download_recon", "pipe.download_recon")

    cfg = VPCCConfig.from_cfg_files(
        "/root/reference/cfg/common/ctc-common.cfg",
        "/root/reference/cfg/rate/ctc-r3.cfg",
    )
    cfg.geometry3dCoordinatesBitdepth = 10
    cfg.resolution = 1023
    cfg.iterationCountRefineSegmentation = 10
    cfg.gridBasedSegmentation = 1

    frames = [make_person_cloud(bits=10, n_samples=3_000_000, seed=s)
              for s in (7, 8)]
    enc = Encoder(cfg)
    print("warmup gof...", flush=True)
    t0 = time.perf_counter()
    enc.encode_gof(frames)
    print(f"warmup took {time.perf_counter()-t0:.1f}s", flush=True)
    ACC.clear(); CNT.clear()
    enc.stats.clear()

    t0 = time.perf_counter()
    enc.encode_gof(frames)
    dt = time.perf_counter() - t0
    print(f"\nsteady GOF: {dt:.2f}s = {dt/len(frames):.2f} s/frame", flush=True)
    import dataclasses
    agg = {}
    for s in enc.stats[-len(frames):]:
        for k, v in dataclasses.asdict(s).items():
            if k.endswith("_s"):
                agg[k] = round(agg.get(k, 0.0) + v / len(frames), 3)
    print("stages:", agg)
    print(f"\n{'call':40s} {'total_s':>9s} {'n':>5s}")
    for k in sorted(ACC, key=lambda k: -ACC[k]):
        print(f"{k:40s} {ACC[k]:9.3f} {CNT[k]:5d}")


if __name__ == "__main__":
    main()
