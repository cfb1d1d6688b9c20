"""PLR (point local reconstruction) end-to-end tests.

Reference behavior: single-map coding with per-block reconstruction modes
(PCCCodec.cpp:474-498 generatePoints PLR branch, PCCEncoder.cpp:5379
pointLocalReconstructionSearch).
"""

import numpy as np
import pytest

from vpcc_tpu.decoder import Decoder
from vpcc_tpu.encoder import Encoder
from vpcc_tpu.ops.metrics import compute_metrics
from vpcc_tpu.utils.config import VPCCConfig
from vpcc_tpu.utils.synthetic import make_sphere_cloud


def _cfg(**kw):
    cfg = VPCCConfig()
    cfg.geometry3dCoordinatesBitdepth = 8
    cfg.resolution = 255
    cfg.minimumImageWidth = 256
    cfg.minimumImageHeight = 256
    cfg.iterationCountRefineSegmentation = 4
    cfg.geometryQP = 28
    cfg.attributeQP = 36
    cfg.flagGeometrySmoothing = 0
    cfg.gridSmoothing = 0
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg


def _sorted_points(pc):
    a = np.concatenate([pc.positions.astype(np.int64), pc.colors.astype(np.int64)], 1)
    return a[np.lexsort(a.T[::-1])]


@pytest.fixture(scope="module")
def cloud():
    """A THICK spherical shell (2-3 voxel radial thickness): per-pixel
    D1 > D0, the regime PLR exists for (thin single-layer surfaces leave
    nothing for the second layer to recreate)."""
    from vpcc_tpu.utils.ply import PointCloudData

    rng = np.random.default_rng(5)
    n = 150000
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    r = 50.0 + rng.uniform(0.0, 2.3, (n, 1))
    pts = np.clip(np.round(128.0 + r * v), 0, 255).astype(np.int32)
    pts = np.unique(pts, axis=0)
    col = np.stack([
        (127 + 120 * (pts[:, 0] - 128) / 53.0).astype(np.uint8),
        (127 + 120 * (pts[:, 1] - 128) / 53.0).astype(np.uint8),
        np.full(len(pts), 90, np.uint8),
    ], axis=1)
    return PointCloudData(pts, col)


def test_plr_roundtrip_bit_exact(cloud):
    """Encoder reconstruction == decoder reconstruction with PLR on (the
    PLR delta/mode planes are computed from DECODED data on both sides)."""
    enc = Encoder(_cfg(pointLocalReconstruction=1))
    stream, recons = enc.encode_gof([cloud])
    # single-map: exactly one geometry and one attribute payload
    assert len(enc.last_encoded[0].geometry_payloads) == 1
    assert len(enc.last_encoded[0].attribute_payloads) == 1
    out = Decoder().decode(stream)
    a, b = _sorted_points(recons[0]), _sorted_points(out[0])
    np.testing.assert_array_equal(a, b)


def test_plr_improves_geometry_over_plain_single_map(cloud):
    """PLR must beat single-map coding WITHOUT the modes at equal video
    rate (that is what the tool is for), at a small atlas-bit cost."""
    enc_plr = Encoder(_cfg(pointLocalReconstruction=1))
    s_plr, r_plr = enc_plr.encode_gof([cloud])

    cfg0 = _cfg(pointLocalReconstruction=1, plrlNumberOfModes=1)
    # mode table row 0 = (no interpolate, no fill, minD1=0): generates no
    # extra points => plain single-map reconstruction through the same path
    enc_one = Encoder(cfg0)
    s_one, r_one = enc_one.encode_gof([cloud])

    src = cloud.positions.astype(np.int32)
    m_plr = compute_metrics(src, cloud.colors, r_plr[0].positions.astype(np.int32),
                            r_plr[0].colors, resolution=255)
    m_one = compute_metrics(src, cloud.colors, r_one[0].positions.astype(np.int32),
                            r_one[0].colors, resolution=255)
    # geometry D1 must improve measurably; stream growth stays tiny (mode bits)
    assert m_plr.c2c_psnr > m_one.c2c_psnr + 0.3, (m_plr.c2c_psnr, m_one.c2c_psnr)
    assert len(s_plr) < len(s_one) * 1.10, (len(s_plr), len(s_one))


def test_plr_saves_rate_vs_two_maps(cloud):
    """Single-map PLR drops the map-1 video payloads; the total stream must
    come out below the two-map encode even after paying for the mode bits
    (the saving is modest here because inter-layer prediction already makes
    map 1 cheap at this scale)."""
    s_plr, _ = Encoder(_cfg(pointLocalReconstruction=1)).encode_gof([cloud])
    s_two, _ = Encoder(_cfg()).encode_gof([cloud])
    # group dilation (round 4) zeroes map-1's background delta, so
    # two-map coding got cheaper and PLR's margin narrowed
    assert len(s_plr) < len(s_two) * 0.98, (len(s_plr), len(s_two))


def test_plr_syntax_roundtrip():
    """PLR data units survive the atlas substream: level and block modes."""
    from vpcc_tpu.bitstream import v3c

    p1 = v3c.PatchDataUnit(pos_x=1, pos_y=2, size_x_m1=1, size_y_m1=2,
                           projection_id=3, plr_level=1, plr_mode=4)
    blocks = np.array([0, 2, 0, 1, 5, 0], np.int32)
    p2 = v3c.PatchDataUnit(pos_x=4, size_x_m1=2, size_y_m1=1,
                           plr_level=0, plr_block_modes=blocks)
    asps = v3c.AtlasSequenceParameterSet(plr_enabled_flag=1, plr_num_modes=6)
    afps = v3c.AtlasFrameParameterSet()
    tile = v3c.AtlasTileLayer(patches=[p1, p2])
    payload = v3c.write_atlas_substream([tile], asps, afps)
    asps2, _, tiles, hash_ok, _seis = v3c.read_atlas_substream(payload)
    assert asps2.plr_enabled_flag == 1 and asps2.plr_num_modes == 6
    assert np.array_equal(asps2.plr_mode_table,
                          np.asarray(__import__("vpcc_tpu.ops.plr", fromlist=["MODE_TABLE"]).MODE_TABLE[:6]))
    q1, q2 = tiles[0].patches
    assert q1.plr_level == 1 and q1.plr_mode == 4
    assert q2.plr_level == 0 and np.array_equal(q2.plr_block_modes, blocks)
    assert all(hash_ok)


def test_interp_deltas_matches_reference_rule():
    """getDeltaNeighbors semantics on a hand-built plane: qualifying
    deltas are gLoc - gOrg in [1, 4], window max, then minus one."""
    from vpcc_tpu.ops import plr as plr_mod

    g = np.zeros((8, 8), np.int32)
    g[4, 4] = 10
    g[4, 5] = 13   # +3 vs center -> qualifies, raw 3 -> dint 2
    g[4, 6] = 20   # +10 -> disqualified (over threshold)
    g[3, 4] = 11   # +1 -> qualifies
    d1, d2 = plr_mod.interp_deltas(g)
    d1, d2 = np.asarray(d1), np.asarray(d2)
    assert d1[4, 4] == 2          # max(3, 1) - 1
    assert d2[4, 4] == 2          # the +10 neighbor never qualifies
    # a pixel whose only uphill neighbor is 2 away: seen by 5x5 only
    assert d1[4, 2] == 0 and d2[4, 2] == max(10 - 0 - 1, 0) * 0 + (
        0 if 10 - 0 > 4 else 10 - 1
    )
    # center's +13 neighbor at (4,5) from (4,3): distance 2 -> only d2; but
    # delta 13 > 4 disqualifies; the g[4,4]=10 delta 10 also disqualifies
    assert d2[4, 2] == 0
