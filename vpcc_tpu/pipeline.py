"""Shared reconstruction pipeline (used by both encoder and decoder).

The reference factors reconstruction into `PCCCodec` precisely because the
encoder must reproduce the decoder's output bit-exactly
(reference: source/lib/PccLibCommon/source/PCCCodec.cpp:519 generatePointCloud,
:1067 smoothPointCloudGrid); this module is our equivalent seam.
"""

from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp
import numpy as np

from vpcc_tpu.core import atlas as atlas_mod
from vpcc_tpu.core.patch import Patch
from vpcc_tpu.core.pointcloud import PAD_COORD, shape_bucket
from vpcc_tpu.ops import reconstruct, smoothing
from vpcc_tpu.utils.config import VPCCConfig


def reconstruct_frame_points(
    occ_rec: np.ndarray,       # (H, W) uint8 decoded+expanded occupancy
    geo_dec: List[np.ndarray],  # decoded geometry maps (>=1)
    btp: np.ndarray,           # block-to-patch
    patches: List[Patch],
    cfg: VPCCConfig,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Returns compacted (positions (M,3) i32, pixel_xy (M,2), layer (M,),
    patch_of (M,), boundary (M,)) — after grid geometry smoothing when
    enabled."""
    pts, valid, pixel_xy, pid = reconstruct.generate_point_cloud(
        jnp.asarray(occ_rec),
        jnp.asarray(geo_dec[0].astype(np.int32)),
        jnp.asarray((geo_dec[1] if len(geo_dec) > 1 else geo_dec[0]).astype(np.int32)),
        jnp.asarray(btp),
        jnp.asarray(atlas_mod.patch_table(patches)),
        cfg.occupancyResolution,
    )
    boundary_img = smoothing.boundary_pixels(jnp.asarray(occ_rec), jnp.asarray(btp))

    pts_h = np.asarray(pts).reshape(-1, 3)
    valid_h = np.asarray(valid).reshape(-1)
    pix = np.repeat(np.asarray(pixel_xy), 2, axis=0)
    pid_h = np.repeat(np.asarray(pid), 2, axis=0)
    bnd_h = np.repeat(np.asarray(boundary_img).reshape(-1), 2, axis=0)
    layer = np.tile(np.array([0, 1], np.int32), len(valid_h) // 2)

    sel = np.nonzero(valid_h)[0]
    pos = pts_h[sel]
    pix_s = pix[sel]
    lay_s = layer[sel]
    pid_s = pid_h[sel]
    bnd_s = bnd_h[sel]

    if cfg.flagGeometrySmoothing and cfg.gridSmoothing and len(pos):
        cap = shape_bucket(len(pos))
        pp = np.full((cap, 3), 0, np.int32)
        pp[: len(pos)] = pos
        vv = np.zeros(cap, bool)
        vv[: len(pos)] = True
        pi = np.zeros(cap, np.int32)
        pi[: len(pos)] = pid_s
        bb = np.zeros(cap, bool)
        bb[: len(pos)] = bnd_s
        sm = smoothing.smooth_point_cloud_grid(
            jnp.asarray(pp), jnp.asarray(vv), jnp.asarray(pi), jnp.asarray(bb),
            float(cfg.thresholdSmoothing),
            grid_size=cfg.gridSize,
            grid_bits=cfg.geometryBitDepth3D,
        )
        pos = np.asarray(sm)[: len(pos)]

    return pos, pix_s, lay_s, pid_s, bnd_s


def apply_color_smoothing(pos, col, pid, bnd, cfg: VPCCConfig):
    """Grid color smoothing on the reconstructed cloud (both sides)."""
    from vpcc_tpu.ops import smoothing as sm

    if not (cfg.flagColorSmoothing and len(pos)):
        return col
    cap = shape_bucket(len(pos))
    pp = np.zeros((cap, 3), np.int32); pp[: len(pos)] = pos
    cc = np.zeros((cap, 3), np.int32); cc[: len(pos)] = col
    vv = np.zeros(cap, bool); vv[: len(pos)] = True
    pi = np.zeros(cap, np.int32); pi[: len(pos)] = pid
    bb = np.zeros(cap, bool); bb[: len(pos)] = bnd
    out = sm.color_smoothing_grid(
        jnp.asarray(pp), jnp.asarray(cc), jnp.asarray(vv), jnp.asarray(pi),
        jnp.asarray(bb), float(cfg.thresholdColorSmoothing),
        float(cfg.thresholdColorVariation),
        grid_size=cfg.cgridSize, grid_bits=cfg.geometryBitDepth3D,
    )
    return np.asarray(out)[: len(pos)].astype(np.uint8)
