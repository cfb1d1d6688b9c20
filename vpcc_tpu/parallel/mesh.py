"""Device-mesh sharding of the V-PCC pipeline.

The reference is a single-node codec whose concurrency axes are TBB loops
(SURVEY.md §2.4); the TPU-native scale-out maps them onto a
`jax.sharding.Mesh`:

- frame axis  -> data parallelism over chips (all-intra GOFs are
  embarrassingly parallel; reference TBB frame loops
  PCCEncoder.cpp:344-350);
- point axis  -> intra-chip vectorization (vmap/Pallas grids);
- tile axis   -> atlas-tile parallelism (later phase);
- GOF axis    -> cross-host DCN boundary (natural checkpoint unit).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vpcc_tpu.ops import neighbors, normals as normals_mod
from vpcc_tpu.ops.segmentation import (
    ORIENTATIONS6,
    initial_segmentation,
    refine_segmentation,
)


def make_mesh(n_devices: Optional[int] = None, axis: str = "frames") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def segment_one_frame(
    positions: jax.Array,  # (N, 3) int32, padded
    grid_bits: int,
    k: int = 16,
    refine_iters: int = 10,
    lambda_: float = 3.0,
) -> jax.Array:
    """The per-frame device segmentation program (KNN -> normals ->
    initial -> refine). Fully static shapes; vmappable over frames."""
    grid = neighbors.build_grid(positions, grid_bits)
    nn_idx, nn_d2 = neighbors.knn(grid, positions, positions, k=k,
                                  chunk=min(positions.shape[0], 65536))
    valid = jnp.all(positions < (1 << grid_bits), axis=-1)
    nn_valid = (nn_d2 < neighbors.MAX_DIST2) & valid[:, None]
    nrm = normals_mod.compute_normals(positions, nn_idx, nn_valid, valid)
    orients = jnp.asarray(ORIENTATIONS6)
    part = initial_segmentation(nrm, orients, jnp.ones((6,), jnp.float32))
    part = refine_segmentation(nrm, part, nn_idx, nn_valid, orients, lambda_, refine_iters)
    return part


@functools.partial(jax.jit, static_argnames=("grid_bits", "k", "refine_iters", "mesh_holder"))
def _segment_batch_impl(positions_b, grid_bits, k, refine_iters, mesh_holder=None):
    fn = lambda p: segment_one_frame(p, grid_bits, k, refine_iters)
    return jax.vmap(fn)(positions_b)


def segment_frames_sharded(
    positions_b: jax.Array,  # (B, N, 3) int32 padded
    mesh: Mesh,
    grid_bits: int,
    k: int = 16,
    refine_iters: int = 10,
) -> jax.Array:
    """Frame-data-parallel segmentation over the mesh: each chip runs the
    full per-frame program for its shard of the batch."""
    sharding = NamedSharding(mesh, P("frames"))
    positions_b = jax.device_put(positions_b, sharding)
    fn = jax.jit(
        lambda pb: jax.vmap(
            lambda p: segment_one_frame(p, grid_bits, k, refine_iters)
        )(pb),
        in_shardings=sharding,
        out_shardings=sharding,
    )
    return fn(positions_b)
