"""Color transfer from source cloud to reconstructed geometry.

Behavioral reference: `PCCPointSet3::transferColors` /
`transferColors16bitBP` (source/lib/PccLibCommon/include/PCCPointSet.h:
295-320, implemented in PCCPointSet.cpp): a forward pass (each target takes a
distance-weighted average of its k nearest source colors, with an
identical-point shortcut) merged with a backward splat (each source point
contributes to its nearest target).  Device version: two batched grid-KNN
sweeps + a segment-mean scatter; no KD-trees.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from vpcc_tpu.ops import neighbors


@functools.partial(jax.jit, static_argnames=("k", "grid_bits"))
def transfer_colors(
    src_pos: jax.Array,   # (Ns, 3) int32 padded
    src_col: jax.Array,   # (Ns, 3) int32 RGB
    src_count: jax.Array,
    tgt_pos: jax.Array,   # (Nt, 3) int32 padded
    tgt_count: jax.Array,
    grid_bits: int = 10,
    k: int = 8,
) -> jax.Array:
    """Returns (Nt, 3) int32 colors for the target cloud."""
    grid_s = neighbors.build_grid(src_pos, grid_bits)
    idx, d2 = neighbors.knn(grid_s, src_pos, tgt_pos, k=k)
    valid = d2 < neighbors.MAX_DIST2

    d2f = d2.astype(jnp.float32)
    # identical-point shortcut: if an exact match exists, use only matches
    exact = (d2 == 0) & valid
    has_exact = jnp.any(exact, axis=1, keepdims=True)
    w = jnp.where(
        has_exact,
        exact.astype(jnp.float32),
        valid.astype(jnp.float32) / jnp.maximum(d2f, 1e-8),
    )
    wsum = jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-8)
    cols = src_col[idx].astype(jnp.float32)  # (Nt, k, 3)
    out = jnp.sum(cols * w[..., None], axis=1) / wsum

    # backward splat: every source point pushes its color to its nearest
    # target; blend 50/50 where forward and backward disagree strongly is
    # deferred — v0 averages backward contributions into the forward result.
    grid_t = neighbors.build_grid(tgt_pos, grid_bits)
    tidx, td2 = neighbors.nearest(grid_t, tgt_pos, src_pos)
    svalid = (td2 < neighbors.MAX_DIST2) & (
        jnp.arange(src_pos.shape[0]) < src_count
    )
    nt = tgt_pos.shape[0]
    acc = jnp.zeros((nt, 3), jnp.float32).at[tidx].add(
        src_col.astype(jnp.float32) * svalid[:, None]
    )
    cnt = jnp.zeros((nt,), jnp.float32).at[tidx].add(svalid.astype(jnp.float32))
    bwd = acc / jnp.maximum(cnt, 1.0)[:, None]
    has_bwd = cnt > 0
    blended = jnp.where(has_bwd[:, None], 0.5 * (out + bwd), out)
    return jnp.clip(jnp.round(blended), 0, 255).astype(jnp.int32)
