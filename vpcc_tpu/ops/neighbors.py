"""Voxel-grid nearest-neighbor search (the KD-tree replacement).

The reference uses nanoflann KD-trees for every KNN query (normals,
segmentation adjacency, recolor, smoothing, metrics — reference:
source/lib/PccLibCommon/include/PCCKdTree.h:85, dependencies/nanoflann).
Pointer-chasing trees are hostile to TPUs, so this module implements the
TPU-native equivalent: points are binned into a dense voxel-cell table (one
sort + one scatter), and each query gathers a bounded number of candidates
from its 3x3x3 neighboring cells, then reduces with top-k.  All shapes are
static; overflowing cells are truncated (bounded-bucket approximation).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

MAX_DIST2 = jnp.int32(0x7FFFFFF0)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class NeighborGrid:
    """Dense cell table over a voxel grid.

    order:  (N,) int32 — point indices sorted by cell id.
    starts: (G^3 + 1,) int32 — exclusive prefix offsets into `order` per cell.
    counts: (G^3 + 1,) int32 — points per cell (last slot collects invalid).
    """

    order: jax.Array
    starts: jax.Array
    counts: jax.Array
    grid_bits: int = dataclasses.field(metadata=dict(static=True))
    cell_bits: int = dataclasses.field(metadata=dict(static=True))

    @property
    def cells_per_axis(self) -> int:
        return 1 << (self.grid_bits - self.cell_bits)


def _cell_ids(positions: jax.Array, grid_bits: int, cell_bits: int) -> jax.Array:
    """Linear cell id per point; out-of-grid (padded) points -> G^3."""
    g = 1 << (grid_bits - cell_bits)
    c = positions >> cell_bits
    in_grid = jnp.all((positions >= 0) & (positions < (1 << grid_bits)), axis=-1)
    cid = (c[..., 0] * g + c[..., 1]) * g + c[..., 2]
    return jnp.where(in_grid, cid, g * g * g)


def build_grid(positions: jax.Array, grid_bits: int, cell_bits: int = 2) -> NeighborGrid:
    n_cells = (1 << (grid_bits - cell_bits)) ** 3 + 1
    cid = _cell_ids(positions, grid_bits, cell_bits)
    order = jnp.argsort(cid).astype(jnp.int32)
    counts = jnp.zeros((n_cells,), jnp.int32).at[cid].add(1)
    starts = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1].astype(jnp.int32)])
    return NeighborGrid(order=order, starts=starts, counts=counts,
                        grid_bits=grid_bits, cell_bits=cell_bits)


_OFFSETS27 = np.array(
    [[dx, dy, dz] for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)],
    np.int32,
)  # (27, 3)


def _gather_candidates(
    grid: NeighborGrid,
    positions: jax.Array,  # (N, 3) points the grid was built over
    q: jax.Array,          # (M, 3) query positions
    bucket: int,
) -> Tuple[jax.Array, jax.Array]:
    """Return (cand_idx (M, 27*bucket) int32, cand_dist2 (M, 27*bucket) int32).

    The 27 neighbor-cell visits are a broadcast data axis (not an unrolled
    Python loop): the emitted HLO stays small, so compiles are fast, and XLA
    fuses the whole gather+distance pass.  Invalid candidates get
    dist2 == MAX_DIST2 and idx == 0.
    """
    g = grid.cells_per_axis
    qc = q >> grid.cell_bits  # (M, 3)
    slots = jnp.arange(bucket, dtype=jnp.int32)

    nc = qc[:, None, :] + jnp.asarray(_OFFSETS27)[None, :, :]  # (M, 27, 3)
    ok = jnp.all((nc >= 0) & (nc < g), axis=-1)  # (M, 27)
    ncid = (nc[..., 0] * g + nc[..., 1]) * g + nc[..., 2]
    ncid = jnp.where(ok, ncid, g * g * g)  # overflow slot never matches
    start = grid.starts[ncid]  # (M, 27)
    cnt = jnp.where(ok, jnp.minimum(grid.counts[ncid], bucket), 0)
    slot = start[..., None] + slots[None, None, :]  # (M, 27, bucket)
    valid = slots[None, None, :] < cnt[..., None]
    slot = jnp.where(valid, slot, 0)
    cidx = grid.order[slot]  # (M, 27, bucket)
    d = positions[cidx] - q[:, None, None, :]  # (M, 27, bucket, 3)
    d2 = jnp.where(valid, jnp.sum(d * d, axis=-1), MAX_DIST2)
    m = q.shape[0]
    return cidx.reshape(m, 27 * bucket), d2.reshape(m, 27 * bucket)


@functools.partial(jax.jit, static_argnames=("k", "bucket"))
def _knn_chunk(grid: NeighborGrid, positions, qc, k: int, bucket: int):
    cidx, cd2 = _gather_candidates(grid, positions, qc, bucket)
    if k == 1:
        # argmin compiles an order of magnitude faster than top_k
        best = jnp.argmin(cd2, axis=1)
        return (
            jnp.take_along_axis(cidx, best[:, None], axis=1),
            jnp.take_along_axis(cd2, best[:, None], axis=1),
        )
    topv, topi = jax.lax.top_k(-cd2, k)
    idx = jnp.take_along_axis(cidx, topi, axis=1)
    return idx, -topv


def knn(
    grid: NeighborGrid,
    positions: jax.Array,
    queries: jax.Array,
    k: int,
    bucket: int = 16,
    chunk: int = 1 << 18,
) -> Tuple[jax.Array, jax.Array]:
    """k nearest neighbors (including an identical point / self).

    Returns (idx (M, k) int32, dist2 (M, k) int32); missing neighbors have
    dist2 == MAX_DIST2 and idx == 0.

    Queries run in fixed-size chunks to bound the candidate-buffer memory.
    The chunk loop lives in PYTHON dispatching one jitted chunk program:
    the platform's remote compiler unrolls lax.scan bodies, so a scan over
    chunks compiled in O(minutes); one chunk program compiles once and is
    reused (and under an outer trace the loop unrolls, which is fine for
    the small chunk counts involved).
    """
    m = queries.shape[0]
    if m <= chunk:
        idx, d2 = _knn_chunk(grid, positions, queries, k, bucket)
        return idx, d2
    pad_m = ((m + chunk - 1) // chunk) * chunk
    qp = jnp.pad(queries, ((0, pad_m - m), (0, 0)), constant_values=-(1 << 20))
    outs = [
        _knn_chunk(grid, positions, jax.lax.dynamic_slice_in_dim(qp, i * chunk, chunk), k, bucket)
        for i in range(pad_m // chunk)
    ]
    idx = jnp.concatenate([o[0] for o in outs], axis=0)
    d2 = jnp.concatenate([o[1] for o in outs], axis=0)
    return idx[:m], d2[:m]


def nearest(
    grid: NeighborGrid,
    positions: jax.Array,
    queries: jax.Array,
    bucket: int = 16,
    chunk: int = 1 << 18,
) -> Tuple[jax.Array, jax.Array]:
    """Nearest single neighbor: returns (idx (M,), dist2 (M,))."""
    idx, d2 = knn(grid, positions, queries, k=1, bucket=bucket, chunk=chunk)
    return idx[:, 0], d2[:, 0]
