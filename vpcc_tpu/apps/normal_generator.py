"""PccAppNormalGenerator equivalent: batch normal estimation to PLY.

Reference: source/app/PccAppNormalGenerator/PccAppNormalGenerator.cpp:297 —
estimates per-point normals (used as D2 metric inputs) and writes PLYs.

Usage:
    python -m vpcc_tpu.apps.normal_generator \
        --uncompressedDataPath=src_%04d.ply --normalDataPath=nrm_%04d.ply \
        --frameCount=N [--nnNormalEstimation=16]
"""

from __future__ import annotations

import sys

import jax.numpy as jnp
import numpy as np

from vpcc_tpu.core.pointcloud import from_host
from vpcc_tpu.ops import neighbors
from vpcc_tpu.ops.normals import compute_normals
from vpcc_tpu.utils.config import VPCCConfig
from vpcc_tpu.utils.ply import PointCloudData, read_ply, write_ply


def estimate_normals(pc_host: PointCloudData, k: int, grid_bits: int) -> np.ndarray:
    pc = from_host(pc_host)
    grid = neighbors.build_grid(pc.positions, grid_bits)
    idx, d2 = neighbors.knn(grid, pc.positions, pc.positions, k=k)
    valid = pc.valid_mask()
    nn_valid = (d2 < neighbors.MAX_DIST2) & valid[:, None]
    nrm = compute_normals(pc.positions, idx, nn_valid, valid)
    return np.asarray(nrm)[: pc_host.point_count]


def main(argv=None) -> int:
    cfg = VPCCConfig.from_args(argv if argv is not None else sys.argv[1:])
    if not cfg.uncompressedDataPath or not cfg.normalDataPath:
        print("error: need --uncompressedDataPath and --normalDataPath", file=sys.stderr)
        return 1
    for i in range(cfg.startFrameNumber, cfg.startFrameNumber + cfg.frameCount):
        src_p = cfg.uncompressedDataPath % i if "%" in cfg.uncompressedDataPath else cfg.uncompressedDataPath
        out_p = cfg.normalDataPath % i if "%" in cfg.normalDataPath else cfg.normalDataPath
        pc = read_ply(src_p)
        normals = estimate_normals(pc, cfg.nnNormalEstimation, cfg.geometryBitDepth3D)
        write_ply(out_p, PointCloudData(pc.positions, pc.colors, normals))
        print(f"frame {i}: {pc.point_count} normals -> {out_p}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
