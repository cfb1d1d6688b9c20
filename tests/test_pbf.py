"""PBF patch-border-filtering tests (reference PCCPatch.cpp:851-976)."""

import numpy as np
import jax.numpy as jnp

from vpcc_tpu.ops import pbf
from vpcc_tpu.ops.reconstruct import _canvas_to_patch_uv


def test_forward_inverse_orientations():
    rng = np.random.default_rng(0)
    for o in range(8):
        su, sv = 16, 24
        u = jnp.asarray(rng.integers(0, su, 64))
        v = jnp.asarray(rng.integers(0, sv, 64))
        oo = jnp.full(64, o)
        lx, ly = pbf._forward_uv_to_canvas(u, v, su, sv, oo)
        u2, v2 = _canvas_to_patch_uv(lx, ly, su, sv, oo)
        assert np.array_equal(np.asarray(u2), np.asarray(u)), o
        assert np.array_equal(np.asarray(v2), np.asarray(v)), o


def _step_scene():
    """Two patches forming a step: a z=10 roof for x in [8,22) that a
    precision-4 occupancy extends to x<24 (spurious pixels at x=22,23),
    and an x=22 wall whose border geometry overlaps those pixels.

    canvas 64x64, res 16.  Patch A (roof): proj along z (normal=2,
    tangent=0 x, bitangent=1 y), footprint u in [0,16) -> x in [8,24),
    v in [0,16) -> y in [8,24), at u0=0,v0=0.  Patch B (wall): proj along
    x (normal=0, tangent=2 z, bitangent=1 y), at u0=2 (x=32..).
    """
    h = w = 64
    res = 16
    occ = np.zeros((h, w), bool)
    geo = np.zeros((h, w), np.int32)
    btp = np.zeros((h // res, w // res), np.int32)
    # patch A occupies block (0,0): pixels [0,16)^2; all occupied
    # (precision-4 upsample made the whole block occupied), depth flat 0
    occ[0:16, 0:16] = True
    btp[0, 0] = 1
    # patch B occupies block rows 0, col 2: wall pixels, depth = z - d1
    occ[0:16, 32:48] = True
    btp[0, 2] = 2
    # patch table rows: u0 v0 su0 sv0 u1 v1 d1 na ta ba mode orient ax45 gb
    tbl = np.zeros((64, 14), np.int32)
    #            u0 v0 su sv  u1 v1 d1 na ta ba mo or a45 gb
    tbl[0] = [0, 0, 1, 1, 8, 8, 10, 2, 0, 1, 0, 0, 0, 10]
    tbl[1] = [2, 0, 1, 1, 10, 8, 22, 0, 2, 1, 0, 0, 0, 10]
    # roof true extent: x in [8,22) -> u in [0,14); pixels u=14,15 are
    # spurious (depth padded with the edge value 0 -> z=10)
    # wall: x=22, z in [10,26) -> patch B u (=z-10) in [0,16), depth 0
    return occ, geo, btp, tbl, res


def test_pbf_drops_unsupported_seam_pixels():
    occ, geo, btp, tbl, res = _step_scene()
    out = np.asarray(pbf.pbf_filter_occupancy(
        jnp.asarray(occ), jnp.asarray(geo), jnp.asarray(btp),
        jnp.asarray(tbl), res, passes=2, filter_size=4, threshold=4,
        bucket=1 << 12,
    ))
    # output is a subset of the input
    assert not (out & ~occ).any()
    # interior pixels (all 4 same-patch neighbors occupied, away from any
    # border) survive
    assert out[4:12, 4:12].all(), "interior of roof patch was eaten"
    assert out[4:12, 36:44].all(), "interior of wall patch was eaten"
    # the spurious roof column at u=15 (canvas x=15) duplicates the wall
    # surface: the wall's border points at z=10 project into the roof
    # plane at x=22 -> roof-local u=14; pixels at u=15 are farther from
    # that supported geometry than their eroded neighbors -> dropped
    assert not out[4:12, 15].all(), (
        "seam overlap pixels unsupported by neighbour geometry must drop"
    )


def test_pbf_no_neighbors_keeps_everything():
    """A single isolated patch has no neighbor border points: every
    boundary decision sees count==0 and keeps the pixel (PCCPatch.cpp:944
    dst[c] = count == 0 || ...)."""
    h = w = 64
    res = 16
    occ = np.zeros((h, w), bool)
    occ[0:16, 0:16] = True
    geo = np.zeros((h, w), np.int32)
    btp = np.zeros((4, 4), np.int32)
    btp[0, 0] = 1
    tbl = np.zeros((64, 14), np.int32)
    tbl[0] = [0, 0, 1, 1, 8, 8, 10, 2, 0, 1, 0, 0, 0, 10]
    out = np.asarray(pbf.pbf_filter_occupancy(
        jnp.asarray(occ), jnp.asarray(geo), jnp.asarray(btp),
        jnp.asarray(tbl), res, passes=2, filter_size=4, threshold=4,
        bucket=1 << 12,
    ))
    assert np.array_equal(out, occ)
