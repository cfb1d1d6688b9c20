"""Patch-coverage test as bit-volume dilation (device).

The patch-generation loop only THRESHOLDS the distance from every source
point to the resampled patch cloud (reference `while rawPoints` loop,
PCCPatchSegmenter.cpp:804-1320: maxAllowedDist2RawPointsSelection = 1,
maxAllowedDist2RawPointsDetection = 9).  A thresholded distance query is
exactly a membership test in the Minkowski dilation of the resampled cloud
by a Euclidean ball — so instead of a per-point KNN (the hottest gather in
the encoder), we scatter the resampled points into a bit-packed voxel
volume, dilate it by the exact integer ball offsets with static shifts
(pure vector ops, no gathers), and do one word-gather per query point.

~50x less gather traffic than the grid-KNN formulation at vox10 scale.
Falls back to the KNN path for bits > 10 (volume would exceed HBM budget).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from vpcc_tpu.core.pointcloud import PAD_COORD


@functools.lru_cache(maxsize=None)
def _ball_offsets(r2: int):
    r = int(np.floor(np.sqrt(r2)))
    g = np.mgrid[-r : r + 1, -r : r + 1, -r : r + 1].reshape(3, -1).T
    keep = (g ** 2).sum(1) <= r2
    # plain python ints: numpy int64 scalars would promote the uint32 word
    # shifts to SIGNED int32 (arithmetic >> smears the top bit)
    return tuple(tuple(int(v) for v in row) for row in g[keep])


def _dilate(vol, r2: int, G: int, W: int):
    """OR of `vol` shifted by every integer offset in the Euclidean ball
    radius^2 <= r2.  One fori_loop body with dynamic slices (compact HLO —
    an unrolled 123-way concat graph breaks the TPU compiler at vox10
    volume sizes); the z shift is a funnel shift across the packed words."""
    offs = jnp.asarray(np.asarray(_ball_offsets(r2), np.int32))
    padded = jnp.pad(vol, ((3, 3), (3, 3), (2, 1)))

    def body(i, acc):
        dx, dy, dz = offs[i, 0], offs[i, 1], offs[i, 2]
        t = dz + 32                      # 0..64; w in {0,1,2}
        w = t >> 5
        k = (t & 31).astype(jnp.uint32)
        a = jax.lax.dynamic_slice(padded, (3 - dx, 3 - dy, 3 - w), (G, G, W))
        b = jax.lax.dynamic_slice(padded, (3 - dx, 3 - dy, 2 - w), (G, G, W))
        sh = (a << k) | jnp.where(k == 0, jnp.uint32(0), b >> (32 - k))
        return acc | sh

    return jax.lax.fori_loop(0, offs.shape[0], body, jnp.zeros_like(vol))


@functools.partial(jax.jit, static_argnames=("bits", "r2_sel", "r2_det"))
def covered_radius(res_pts, queries, bits: int, r2_sel: int = 1, r2_det: int = 9):
    """res_pts: (R, 3) int32 resampled cloud (PAD_COORD padded);
    queries: (N, 3) int32.  Returns (covered_sel (N,), covered_det (N,))
    bools: query within sqrt(r2) of any resampled point."""
    G = 1 << bits
    W = G // 32 if G >= 32 else 1
    valid = res_pts[:, 0] != PAD_COORD
    x = jnp.clip(res_pts[:, 0], 0, G - 1)
    y = jnp.clip(res_pts[:, 1], 0, G - 1)
    z = jnp.clip(res_pts[:, 2], 0, G - 1)
    word = z >> 5
    bit = z & 31
    # scatter-OR via dedup: unique voxel keys ensure each (x,y,word) cell
    # receives DISTINCT bits, so scatter-add == bitwise OR
    key = jnp.where(valid, (x << (2 * bits)) | (y << bits) | z, jnp.int32(0x7FFFFFFF))
    order = jnp.argsort(key)
    ks = key[order]
    new = jnp.concatenate([jnp.ones((1,), bool), ks[1:] != ks[:-1]]) & (
        ks != 0x7FFFFFFF
    )
    flat = (x[order] * G + y[order]) * W + word[order]
    flat = jnp.where(new, flat, G * G * W)  # dump row for dups/pads
    vol = jnp.zeros((G * G * W + 1,), jnp.uint32)
    vol = vol.at[flat].add(jnp.uint32(1) << bit[order].astype(jnp.uint32))
    vol = vol[:-1].reshape(G, G, W)

    det = _dilate(vol, r2_det, G, W)
    sel = det if r2_sel == r2_det else _dilate(vol, r2_sel, G, W)

    qx = jnp.clip(queries[:, 0], 0, G - 1)
    qy = jnp.clip(queries[:, 1], 0, G - 1)
    qz = jnp.clip(queries[:, 2], 0, G - 1)
    qflat = (qx * G + qy) * W + (qz >> 5)
    qbit = (qz & 31).astype(jnp.uint32)
    qvalid = queries[:, 0] != PAD_COORD

    def test(v):
        w = v.reshape(-1)[qflat]
        return (((w >> qbit) & 1) != 0) & qvalid

    return test(sel), test(det)
