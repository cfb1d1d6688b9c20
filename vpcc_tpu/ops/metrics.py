"""Objective quality metrics: D1 (point-to-point), D2 (point-to-plane),
color PSNR — the PccLibMetrics equivalent, on device.

Behavioral reference: source/lib/PccLibMetrics/source/PCCMetrics.cpp —
`getPSNR` (:42: 10*log10(factor*p^2/mse), factor 3 for geometry),
`QualityMetrics::compute` (:73-230: per-point NN search, c2c = nearest dist^2,
c2p = (err . normal_B)^2, color MSE on BT.709 YUV in [0,1]), symmetric merge
= max of the two directional MSEs (:289-322).

The KD-tree per-point searches become two batched grid-KNN sweeps.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vpcc_tpu.ops import neighbors


def rgb_to_yuv_bt709(rgb: jax.Array) -> jax.Array:
    """(…, 3) uint8/int -> (…, 3) float YUV in [0,1]
    (reference: PCCMetrics.cpp:49-55)."""
    r = rgb[..., 0].astype(jnp.float32)
    g = rgb[..., 1].astype(jnp.float32)
    b = rgb[..., 2].astype(jnp.float32)
    y = (0.2126 * r + 0.7152 * g + 0.0722 * b) / 255.0
    u = (-0.1146 * r - 0.3854 * g + 0.5000 * b) / 255.0 + 0.5
    v = (0.5000 * r - 0.4542 * g - 0.0458 * b) / 255.0 + 0.5
    return jnp.stack([y, u, v], axis=-1)


@dataclasses.dataclass
class FrameMetrics:
    c2c_mse: float
    c2c_psnr: float
    c2p_mse: float
    c2p_psnr: float
    color_psnr: tuple  # (Y, U, V)
    c2c_hausdorff: float = 0.0
    c2c_hausdorff_psnr: float = float("inf")
    reflectance_psnr: float = float("inf")

    def summary(self) -> str:
        return (
            f"D1 {self.c2c_psnr:8.4f} dB  D2 {self.c2p_psnr:8.4f} dB  "
            f"Y {self.color_psnr[0]:8.4f}  U {self.color_psnr[1]:8.4f}  "
            f"V {self.color_psnr[2]:8.4f}"
        )


def _directional(
    pos_a, col_a, cnt_a, pos_b, col_b, normals_b, grid_bits
):
    """A->B: for each A point, nearest B point. Returns (mse_c2c, mse_c2p,
    mse_color[3]) as jnp scalars.

    The grid search only sees a 3x3x3 cell neighborhood; the rare far-out
    queries (beyond ~2 cells) fall back to an exact host KD search so the
    MSE is never polluted by the MAX_DIST2 sentinel."""
    grid_b = neighbors.build_grid(pos_b, grid_bits)
    idx, d2 = neighbors.nearest(grid_b, pos_b, pos_a)
    n = pos_a.shape[0]
    valid_a = np.asarray(jnp.arange(n) < cnt_a)
    idx = np.array(idx)  # writable copies (np.asarray of a jax array is RO)
    d2 = np.array(d2).astype(np.int64)
    missed = valid_a & (d2 >= int(neighbors.MAX_DIST2))
    if missed.any():
        from scipy.spatial import cKDTree

        pb = np.asarray(pos_b)
        pb_valid = np.all(np.abs(pb) < (1 << 24), axis=1)
        tree = cKDTree(pb[pb_valid])
        dd, ii = tree.query(np.asarray(pos_a)[missed].astype(np.float64))
        remap = np.nonzero(pb_valid)[0]
        idx[missed] = remap[ii]
        d2[missed] = np.round(dd * dd).astype(np.int64)
    idx = jnp.asarray(idx)
    d2 = jnp.asarray(d2)
    w = jnp.asarray(valid_a).astype(jnp.float32)
    num = jnp.maximum(jnp.sum(w), 1.0)
    mse_c2c = jnp.sum(d2.astype(jnp.float32) * w) / num
    haus = jnp.max(d2.astype(jnp.float32) * w)
    err = (pos_a - pos_b[idx]).astype(jnp.float32)
    if normals_b is not None:
        proj = jnp.sum(err * normals_b[idx], axis=-1)
        mse_c2p = jnp.sum(proj * proj * w) / num
    else:
        mse_c2p = mse_c2c
    if col_a is not None and col_b is not None:
        ya = rgb_to_yuv_bt709(col_a)
        yb = rgb_to_yuv_bt709(col_b[idx])
        ce = (ya - yb) ** 2
        mse_col = jnp.sum(ce * w[:, None], axis=0) / num
    else:
        mse_col = jnp.zeros((3,), jnp.float32)
    return mse_c2c, mse_c2p, mse_col, haus


def estimate_normals(pos: np.ndarray, grid_bits: int, k: int = 16) -> np.ndarray:
    """PCA normals for a host cloud (used when the caller has no normals so
    D2 is a real point-to-plane number; reference feeds normals from
    PccAppNormalGenerator, PCCMetrics.cpp:361)."""
    from vpcc_tpu.core.pointcloud import PAD_COORD, shape_bucket
    from vpcc_tpu.ops import normals as normals_mod

    n = pos.shape[0]
    cap = shape_bucket(n)
    p = np.full((cap, 3), PAD_COORD, np.int32)
    p[:n] = pos
    pd = jnp.asarray(p)
    grid = neighbors.build_grid(pd, grid_bits)
    nn_idx, nn_d2 = neighbors.knn(grid, pd, pd, k=k, bucket=12)
    valid_rows = jnp.arange(cap) < n
    nn_valid = (nn_d2 < neighbors.MAX_DIST2) & valid_rows[:, None]
    nrm = normals_mod.compute_normals(pd, nn_idx, nn_valid, valid_rows)
    return np.asarray(nrm)[:n]


def transfer_normals(
    src_pos: np.ndarray, src_normals: np.ndarray, dst_pos: np.ndarray,
    grid_bits: int,
) -> np.ndarray:
    """Nearest-neighbor normal transfer source -> reconstructed cloud (the
    reference metric evaluates point-to-plane against the original surface
    normals on both directions)."""
    from vpcc_tpu.core.pointcloud import PAD_COORD, shape_bucket

    ns, nd = src_pos.shape[0], dst_pos.shape[0]
    cs, cd = shape_bucket(ns), shape_bucket(nd)
    ps = np.full((cs, 3), PAD_COORD, np.int32)
    ps[:ns] = src_pos
    pd = np.full((cd, 3), PAD_COORD, np.int32)
    pd[:nd] = dst_pos
    ps_d = jnp.asarray(ps)
    grid = neighbors.build_grid(ps_d, grid_bits)
    idx, _ = neighbors.nearest(grid, ps_d, jnp.asarray(pd))
    idx = np.clip(np.asarray(idx)[:nd], 0, ns - 1)
    return src_normals[idx]


def compute_metrics(
    src_pos: np.ndarray,
    src_col: Optional[np.ndarray],
    rec_pos: np.ndarray,
    rec_col: Optional[np.ndarray],
    resolution: int,
    src_normals: Optional[np.ndarray] = None,
    rec_normals: Optional[np.ndarray] = None,
    grid_bits: int = 10,
    with_d2: bool = False,
    src_refl: Optional[np.ndarray] = None,
    rec_refl: Optional[np.ndarray] = None,
) -> FrameMetrics:
    """Symmetric metrics between source and reconstructed clouds (host API,
    device compute). Positions (N,3) int; colors (N,3) uint8 or None.
    with_d2=True estimates source normals (PCA) and NN-transfers them to the
    reconstruction so D2 is a true point-to-plane PSNR even when the caller
    has no normals (VERDICT.md weak item 6)."""
    from vpcc_tpu.core.pointcloud import PAD_COORD, shape_bucket

    if with_d2 and src_normals is None:
        src_normals = estimate_normals(src_pos, grid_bits)
    if src_normals is not None and rec_normals is None:
        rec_normals = transfer_normals(src_pos, src_normals, rec_pos, grid_bits)

    def pad(pos, col, norm):
        n = pos.shape[0]
        cap = shape_bucket(n)
        p = np.full((cap, 3), PAD_COORD, np.int32)
        p[:n] = pos
        c = None
        if col is not None:
            c = np.zeros((cap, 3), np.int32)
            c[:n] = col
        nr = None
        if norm is not None:
            nr = np.zeros((cap, 3), np.float32)
            nr[:n] = norm
        return jnp.asarray(p), None if c is None else jnp.asarray(c), (
            None if nr is None else jnp.asarray(nr)
        ), n

    pa, ca, na_, n_a = pad(src_pos, src_col, src_normals)
    pb, cb, nb_, n_b = pad(rec_pos, rec_col, rec_normals)

    ab = _directional(pa, ca, n_a, pb, cb, nb_, grid_bits)
    ba = _directional(pb, cb, n_b, pa, ca, na_, grid_bits)

    c2c = max(float(ab[0]), float(ba[0]))
    c2p = max(float(ab[1]), float(ba[1]))
    col = np.maximum(np.asarray(ab[2]), np.asarray(ba[2]))
    haus = max(float(ab[3]), float(ba[3]))

    def psnr(mse, peak, factor=1.0):
        if mse <= 0:
            return float("inf")
        return 10.0 * math.log10(factor * peak * peak / mse)

    refl_psnr = float("inf")
    if src_refl is not None and rec_refl is not None:
        refl_psnr = psnr(
            reflectance_mse(src_pos, src_refl, rec_pos, rec_refl, grid_bits),
            65535.0,  # 16-bit reflectance peak (reference PCCMetrics.cpp:218-227)
        )

    return FrameMetrics(
        c2c_mse=c2c,
        c2c_psnr=psnr(c2c, resolution, 3.0),
        c2p_mse=c2p,
        c2p_psnr=psnr(c2p, resolution, 3.0),
        color_psnr=tuple(psnr(float(m), 1.0) for m in col),
        c2c_hausdorff=haus,
        c2c_hausdorff_psnr=psnr(haus, resolution, 3.0),
        reflectance_psnr=refl_psnr,
    )


def reflectance_mse(src_pos, src_refl, rec_pos, rec_refl,
                    grid_bits: int = 10) -> float:
    """Symmetric nearest-neighbor reflectance MSE (reference
    PCCMetrics.cpp:218-227 reflectance branch of computeMetric): each
    point compares its 16-bit reflectance to its nearest neighbor's in
    the other cloud; the worse direction wins."""
    from vpcc_tpu.core.pointcloud import PAD_COORD, shape_bucket
    from vpcc_tpu.ops import neighbors

    def direction(pa, ra, pb, rb):
        na = pa.shape[0]
        cap_a, cap_b = shape_bucket(na), shape_bucket(pb.shape[0])
        qp = np.full((cap_a, 3), PAD_COORD, np.int32)
        qp[:na] = pa
        tp = np.full((cap_b, 3), PAD_COORD, np.int32)
        tp[: pb.shape[0]] = pb
        idx, d2 = neighbors.nearest(
            neighbors.build_grid(jnp.asarray(tp), grid_bits),
            jnp.asarray(tp), jnp.asarray(qp), bucket=8,
        )
        idx = np.asarray(idx)[:na]
        ok = np.asarray(d2)[:na] < int(neighbors.MAX_DIST2)
        diff = ra.astype(np.float64) - rb[np.clip(idx, 0, len(rb) - 1)].astype(np.float64)
        return float(np.mean(np.where(ok, diff, 0.0) ** 2))

    return max(
        direction(src_pos, src_refl, rec_pos, rec_refl),
        direction(rec_pos, rec_refl, src_pos, src_refl),
    )
