"""Image padding / background fill for geometry & attribute videos.

Behavioral reference: the encoder's padding stack — sparse-linear dilation
(PCCEncoder.cpp:5772), push-pull mip-pyramid fill (PCCEncoder.cpp:6373,
6445, 6543) and harmonic background fill (:6135).  Unoccupied pixels are
filled with a smooth continuation of the occupied signal so the block
transform doesn't spend bits on artificial edges.

TPU-first: the push-pull pyramid is a logarithmic sequence of 2x2
average-pool (push) and broadcast-fill (pull) steps — pure reshapes and
elementwise ops that XLA fuses; no sequential raster scans.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=())
def push_pull_fill(image: jax.Array, occupancy: jax.Array) -> jax.Array:
    """Fill unoccupied pixels by push-pull interpolation.

    image: (H, W) float32/int; occupancy: (H, W) bool/uint8.
    Returns float32 (H, W) where occupied pixels keep their value and
    unoccupied pixels get a pyramid-interpolated fill.
    """
    img = image.astype(jnp.float32)
    occ = occupancy.astype(jnp.float32)
    h, w = img.shape

    # push: build coarser levels (value-sum and weight pyramids)
    vals = [img * occ]
    wts = [occ]
    lh, lw = h, w
    while lh > 1 and lw > 1 and lh % 2 == 0 and lw % 2 == 0:
        v = vals[-1].reshape(lh // 2, 2, lw // 2, 2).sum(axis=(1, 3))
        m = wts[-1].reshape(lh // 2, 2, lw // 2, 2).sum(axis=(1, 3))
        vals.append(v)
        wts.append(m)
        lh //= 2
        lw //= 2

    # pull: from coarsest down, fill holes with parent values
    fill = vals[-1] / jnp.maximum(wts[-1], 1.0)
    for lvl in range(len(vals) - 2, -1, -1):
        up = jnp.repeat(jnp.repeat(fill, 2, axis=0), 2, axis=1)
        have = wts[lvl] > 0
        avg = vals[lvl] / jnp.maximum(wts[lvl], 1.0)
        fill = jnp.where(have, avg, up)

    return jnp.where(occ > 0, img, fill)


@functools.partial(jax.jit, static_argnames=("iterations",))
def smooth_fill(image: jax.Array, occupancy: jax.Array, iterations: int = 4) -> jax.Array:
    """Jacobi relaxation of the filled background toward harmony with its
    neighbors (the cheap cousin of the reference's Gauss-Seidel multigrid
    harmonic fill, PCCEncoder.cpp:6135): occupied pixels are fixed boundary
    conditions."""
    occ = occupancy.astype(jnp.bool_)
    x = push_pull_fill(image, occupancy)

    def body(_, x):
        up = jnp.roll(x, 1, 0)
        dn = jnp.roll(x, -1, 0)
        lf = jnp.roll(x, 1, 1)
        rt = jnp.roll(x, -1, 1)
        avg = (up + dn + lf + rt) * 0.25
        return jnp.where(occ, x, avg)

    return jax.lax.fori_loop(0, iterations, body, x)
