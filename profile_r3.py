"""Fine-grained profiling of the r3 hot stages (patchgen, recolor).

Not a test; run manually: python -u profile_r3.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from vpcc_tpu.utils.config import VPCCConfig
from vpcc_tpu.utils.synthetic import make_person_cloud
from vpcc_tpu.encoder import Encoder
from vpcc_tpu.core.patch import build_patch_from_component
from vpcc_tpu.core.pointcloud import PAD_COORD, shape_bucket
from vpcc_tpu.ops import cc as cc_mod, coverage, neighbors, recolor
from vpcc_tpu.ops.segmentation import partition_to_view


def t(label, fn, *a, **kw):
    t0 = time.perf_counter()
    out = fn(*a, **kw)
    jax.block_until_ready(out) if hasattr(out, "block_until_ready") or isinstance(out, (jax.Array, tuple)) else None
    dt = time.perf_counter() - t0
    print(f"  {label:40s} {dt*1000:9.1f} ms")
    return out


def main():
    cfg = VPCCConfig.from_cfg_files(
        "/root/reference/cfg/common/ctc-common.cfg",
        "/root/reference/cfg/rate/ctc-r3.cfg",
    )
    cfg.geometry3dCoordinatesBitdepth = 10
    cfg.resolution = 1023
    cfg.iterationCountRefineSegmentation = 10
    cfg.gridBasedSegmentation = 1

    pc = make_person_cloud(bits=10, n_samples=3_000_000, seed=7)
    print(f"points: {pc.point_count}")
    enc = Encoder(cfg)

    # warmup (compiles)
    print("warmup encode_frame...")
    t0 = time.perf_counter()
    enc.encode_frame(pc)
    print(f"warmup took {time.perf_counter()-t0:.1f}s")
    enc.stats.clear()

    # --- patchgen breakdown -------------------------------------------
    print("\n=== segmentation ===")
    t0 = time.perf_counter()
    seg = enc.segment_dispatch(pc)
    partition, dev_graph, _n = enc.segment_fetch(seg)
    print(f"  segment total: {(time.perf_counter()-t0)*1000:.0f} ms")

    print("\n=== generate_patches breakdown ===")
    part_dev, nn_idx_dev, nn_valid_dev, point_vox, pos_dev = dev_graph
    vcap = int(nn_idx_dev.shape[0])
    cap = vcap if point_vox is None else int(point_vox.shape[0])
    positions = np.asarray(pc.positions, np.int32)
    colors = pc.colors
    n = positions.shape[0]
    bits3d = cfg.geometryBitDepth3D
    r2_sel = int(round(cfg.maxAllowedDist2RawPointsSelection))
    r2_det = int(round(cfg.maxAllowedDist2RawPointsDetection))
    cov_sel_dev = jnp.zeros((cap,), bool)
    cov_det_dev = jnp.zeros((cap,), bool)
    valid_pt = jnp.arange(cap) < n
    patches = []
    total0 = time.perf_counter()
    for _round in range(4):
        print(f" -- round {_round}")
        tr = time.perf_counter()
        seeds = ~np.asarray(cov_det_dev)[:n]
        print(f"  {'seeds download':40s} {(time.perf_counter()-tr)*1000:9.1f} ms")
        if not seeds.any():
            break
        act_dev = ~cov_sel_dev & valid_pt
        tr = time.perf_counter()
        labels = cc_mod.cc_round_voxel(
            nn_idx_dev, nn_valid_dev, part_dev, point_vox, act_dev, vcap
        )
        labels_h = np.asarray(labels)[:n]
        print(f"  {'cc device + download':40s} {(time.perf_counter()-tr)*1000:9.1f} ms")
        tr = time.perf_counter()
        comps = cc_mod.components_from_labels(
            labels_h, seeds, cfg.minPointCountPerCCPatchSegmentation, sentinel=vcap
        )
        print(f"  {'components_from_labels':40s} {(time.perf_counter()-tr)*1000:9.1f} ms  ({len(comps)} comps)")
        if not comps:
            break
        tr = time.perf_counter()
        new_patches = []
        for comp in comps:
            view_id = partition_to_view(int(partition[comp[0]]), cfg.additionalProjectionPlaneMode)
            p = build_patch_from_component(
                len(patches) + len(new_patches), positions, colors, comp, view_id, cfg
            )
            if p is not None:
                new_patches.append(p)
        print(f"  {'build_patch loop':40s} {(time.perf_counter()-tr)*1000:9.1f} ms  ({len(new_patches)} patches)")
        patches.extend(new_patches)
        tr = time.perf_counter()
        res_pts = [pp for p in new_patches for pp in p.generate_points()[:2]]
        res_pts = np.concatenate([r for r in res_pts if len(r)], axis=0)
        print(f"  {'generate_points (coverage src)':40s} {(time.perf_counter()-tr)*1000:9.1f} ms  ({len(res_pts)} pts)")
        tr = time.perf_counter()
        rcap = shape_bucket(len(res_pts))
        rp = np.full((rcap, 3), PAD_COORD, np.int32)
        rp[: len(res_pts)] = res_pts
        rp_dev = jnp.asarray(rp)
        s_new, d_new = coverage.covered_radius(rp_dev, pos_dev, bits3d, r2_sel=r2_sel, r2_det=r2_det)
        cov_sel_dev = (cov_sel_dev | s_new).block_until_ready()
        cov_det_dev = cov_det_dev | d_new
        print(f"  {'coverage upload+dilate':40s} {(time.perf_counter()-tr)*1000:9.1f} ms")
    print(f" patchgen total: {(time.perf_counter()-total0)*1000:.0f} ms, {len(patches)} patches")

    # --- recolor breakdown --------------------------------------------
    print("\n=== recolor breakdown ===")
    # reconstruct to get a target cloud
    from vpcc_tpu.core import atlas as atlas_mod, packing
    from vpcc_tpu import pipeline
    from vpcc_tpu.video import codecs

    packing.pack_flexible(patches, cfg)
    frame = atlas_mod.rasterize_frame(patches, *_wh(patches, cfg), cfg)

    width, height = _wh(patches, cfg)
    occ_video = atlas_mod.downsample_occupancy(frame.occupancy, cfg.occupancyPrecision)
    occ_payload = codecs.encode_occupancy(occ_video, cfg)
    occ_dec = codecs.decode_occupancy(occ_payload, cfg)
    occ_rec = atlas_mod.upsample_occupancy(occ_dec, cfg.occupancyPrecision)
    btp = atlas_mod.derive_block_to_patch(occ_rec, patches, width, height, cfg.occupancyResolution)
    streams = enc._new_streams()
    geo_dec = []
    for name, g in (("geo0", frame.geometry0), ("geo1", frame.geometry1)):
        _, dec = streams[name].encode(g, occ=frame.occupancy, layer_ref=geo_dec[0] if geo_dec else None, weight=occ_rec)
        geo_dec.append(dec)
    recon = pipeline.reconstruct_frame_device(occ_rec, geo_dec, btp, patches, cfg)
    jax.block_until_ready(recon.pos)
    print(f"  recon count ~ {int(np.asarray(recon.count))}, cap {recon.pos.shape[0]}")

    src_cap = shape_bucket(pc.point_count)
    sp_dev = pos_dev
    sc = np.zeros((src_cap, 3), np.int32)
    sc[: pc.point_count] = pc.colors
    sc_dev = jnp.asarray(sc)
    src_valid = jnp.arange(src_cap) < pc.point_count

    for rep in range(2):
        print(f" -- rep {rep}")
        tr = time.perf_counter()
        exact_idx, has_exact = recolor.exact_matches_device(sp_dev, src_valid, recon.pos, 10)
        jax.block_until_ready(has_exact)
        print(f"  {'exact_matches_device':40s} {(time.perf_counter()-tr)*1000:9.1f} ms")
        tr = time.perf_counter()
        grid_s = neighbors.build_grid(sp_dev, 10)
        jax.block_until_ready(grid_s.table)
        print(f"  {'build_grid(src)':40s} {(time.perf_counter()-tr)*1000:9.1f} ms")
        tr = time.perf_counter()
        idx, d2 = neighbors.knn(grid_s, sp_dev, recon.pos, k=cfg.numNeighborsColorTransferFwd, bucket=6)
        jax.block_until_ready(d2)
        print(f"  {'knn fwd k=%d' % cfg.numNeighborsColorTransferFwd:40s} {(time.perf_counter()-tr)*1000:9.1f} ms  (Nt={recon.pos.shape[0]})")
        if cfg.numNeighborsColorTransferBwd > 0:
            tr = time.perf_counter()
            grid_t = neighbors.build_grid(recon.pos, 10)
            tidx, td2 = neighbors.nearest(grid_t, recon.pos, sp_dev, bucket=6)
            jax.block_until_ready(td2)
            print(f"  {'bwd nearest':40s} {(time.perf_counter()-tr)*1000:9.1f} ms")
        tr = time.perf_counter()
        out = recolor._blend(sp_dev, sc_dev, jnp.asarray(pc.point_count), recon.pos,
                             exact_idx, has_exact, idx, d2,
                             jnp.zeros((src_cap,), jnp.int32), jnp.full((src_cap,), neighbors.MAX_DIST2),
                             jnp.float32(cfg.maxGeometryDist2Fwd), jnp.float32(cfg.maxGeometryDist2Bwd),
                             jnp.float32(cfg.maxColorDist2Fwd), jnp.float32(cfg.distOffsetFwd))
        jax.block_until_ready(out)
        print(f"  {'blend':40s} {(time.perf_counter()-tr)*1000:9.1f} ms")


def _wh(patches, cfg):
    from vpcc_tpu.core import packing
    return packing.pack_flexible(patches, cfg)


if __name__ == "__main__":
    main()
