"""V-PCC decoder pipeline (the PCCDecoder equivalent).

Behavioral reference: `PCCDecoder::decode`
(source/lib/PccLibDecoder/source/PCCDecoder.cpp:69-487): parse HLS ->
decode video substreams -> block-to-patch -> generatePointCloud ->
colorPointCloud -> post-process.
"""

from __future__ import annotations

from typing import List

import jax.numpy as jnp
import numpy as np

from vpcc_tpu.bitstream import v3c
from vpcc_tpu.bitstream.bitio import BitReader
from vpcc_tpu.core import atlas as atlas_mod
from vpcc_tpu.core.patch import INFINITE_DEPTH, Patch
from vpcc_tpu import pipeline
from vpcc_tpu.utils.config import VPCCConfig
from vpcc_tpu.utils.ply import PointCloudData
from vpcc_tpu.video import aux_video, codecs


def _pdu_to_patch(pdu: v3c.PatchDataUnit, index: int, vps: v3c.V3CParameterSet) -> Patch:
    from vpcc_tpu.ops.segmentation import VIEW_AXES

    axes = VIEW_AXES[pdu.projection_id]
    add_axis, na, ta, ba, mode = (int(a) for a in axes)
    size_d = 0 if pdu.range_d == 0 else pdu.range_d * vps.min_level - 1
    dummy = np.full((1, 1), INFINITE_DEPTH, np.int32)
    p = Patch(
        index=index,
        view_id=pdu.projection_id,
        normal_axis=na,
        tangent_axis=ta,
        bitangent_axis=ba,
        projection_mode=mode,
        u1=pdu.offset_u,
        v1=pdu.offset_v,
        d1=pdu.offset_d * vps.min_level,
        size_u=pdu.size_u,
        size_v=pdu.size_v,
        size_d=size_d,
        occupancy_resolution=vps.occupancy_resolution,
        depth0=dummy,
        depth1=dummy,
        u0=pdu.pos_x,
        v0=pdu.pos_y,
        orientation=pdu.orientation,
        size_u0=pdu.size_x_m1 + 1,
        size_v0=pdu.size_y_m1 + 1,
        axis_of_additional_plane=add_axis,
        geo_bits=vps.geometry_3d_bitdepth,
        plr_level=pdu.plr_level,
        plr_mode=pdu.plr_mode,
        plr_block_modes=pdu.plr_block_modes,
        lod_x=pdu.lod_x,
        lod_y=pdu.lod_y,
    )
    return p


class Decoder:
    def __init__(self, cfg: VPCCConfig | None = None):
        self.cfg = cfg or VPCCConfig()
        self.frame_info: List[dict] = []
        # PTL level-limit findings (vps.ptl vs the decoded frames); the
        # conformance app and tests read this
        self.level_violations: List[str] = []

    def decode(self, stream: bytes) -> List[PointCloudData]:
        units = v3c.read_sample_stream(stream)
        vps = None
        asps = None
        seis: dict = {}
        tiles: List[v3c.AtlasTileLayer] = []
        occ_sub = None
        eom_sub = None
        geo_subs = {}
        attr_subs = {}
        raw_geo_sub = None   # RAW aux geometry (map_index 15)
        raw_attr_sub = None  # RAW/EOM aux attribute
        refl_sub = None      # reflectance attribute (map_index 8)
        for utype, payload in units:
            br = BitReader(payload)
            if utype == v3c.V3C_VPS:
                vps = v3c.V3CParameterSet.read(br)
            elif utype == v3c.V3C_AD:
                # NAL-framed atlas substream: ASPS/AFPS/ATLs + hash SEIs;
                # the decoded-atlas-information-hash of every frame is
                # verified against the parsed patches (PCCDecoder.cpp:1214)
                asps, afps, tiles, hash_ok, seis = v3c.read_atlas_substream(payload)
                self.seis = seis
                self.atlas_hash_ok = hash_ok
                if not all(hash_ok):
                    raise ValueError(
                        "decoded-atlas-information-hash SEI mismatch "
                        f"(frames: {[i for i, ok in enumerate(hash_ok) if not ok]})"
                    )
            elif utype == v3c.V3C_OVD:
                s = v3c.VideoSubstream.read(br)
                if s.map_index == 0:
                    occ_sub = s
                else:
                    eom_sub = s
            elif utype == v3c.V3C_GVD:
                s = v3c.VideoSubstream.read(br)
                if s.map_index == aux_video.AUX_MAP_INDEX:
                    raw_geo_sub = s
                else:
                    geo_subs[s.map_index] = s
            elif utype == v3c.V3C_AVD:
                s = v3c.VideoSubstream.read(br)
                if s.map_index == aux_video.AUX_MAP_INDEX:
                    raw_attr_sub = s
                elif s.map_index == codecs.REFL_MAP_INDEX:
                    refl_sub = s
                else:
                    attr_subs[s.map_index] = s
        assert vps is not None and occ_sub is not None

        cfg = self.cfg
        cfg.occupancyResolution = vps.occupancy_resolution
        cfg.occupancyPrecision = vps.occupancy_precision
        cfg.geometryNominal2dBitdepth = vps.geometry_2d_bitdepth
        # post-processing parameters come from the prefix SEIs (reference
        # PCCDecoder::setPostProcessingSeiParameters, PCCDecoder.cpp:553-650);
        # absent SEI = tool off
        sei_gs = seis.get(v3c.SEI_GEOMETRY_SMOOTHING)
        cfg.flagGeometrySmoothing = cfg.gridSmoothing = int(sei_gs is not None)
        if sei_gs is not None:
            cfg.gridSize = sei_gs.grid_size
            cfg.thresholdSmoothing = float(sei_gs.threshold)
        sei_as = seis.get(v3c.SEI_ATTRIBUTE_SMOOTHING)
        cfg.flagColorSmoothing = int(sei_as is not None)
        if sei_as is not None:
            cfg.cgridSize = sei_as.grid_size
            cfg.thresholdColorSmoothing = float(sei_as.threshold)
            cfg.thresholdColorVariation = float(sei_as.threshold_variation)
            cfg.thresholdColorDifference = float(sei_as.threshold_difference)
        sei_os = seis.get(v3c.SEI_OCCUPANCY_SYNTHESIS)
        cfg.pbfEnableFlag = int(sei_os is not None and sei_os.method_type == 1)
        if cfg.pbfEnableFlag:
            cfg.pbfPassesCount = sei_os.passes_count
            cfg.pbfFilterSize = sei_os.filter_size
            cfg.pbfLog2Threshold = sei_os.log2_threshold
        cfg.enhancedOccupancyMapCode = 1 if vps.eom_bits else 0
        if vps.eom_bits:
            cfg.surfaceThickness = vps.eom_bits + 1

        out: List[PointCloudData] = []
        geo_decs = {m: codecs.GeometrySubstreamDecoder(cfg) for m in geo_subs}
        attr_decs = {m: codecs.AttributeSubstreamDecoder(cfg) for m in attr_subs}
        # coding-structure parents from the ATL ref deltas (hierarchical
        # GOPs reference a tree parent, not just frame-1); decoded map
        # banks are pruned once no later frame needs them
        parent = [
            fi - t.ref_frame_delta if t.tile_type == v3c.TILE_P else -1
            for fi, t in enumerate(tiles)
        ]
        geo_bank: dict = {}
        attr_bank: dict = {}
        for fi in range(vps.frame_count):
            patches = [
                _pdu_to_patch(pdu, i, vps) for i, pdu in enumerate(tiles[fi].patches)
            ]
            occ_video = codecs.decode_occupancy(occ_sub.frames[fi], cfg)
            occ = atlas_mod.upsample_occupancy(occ_video, vps.occupancy_precision)
            height, width = occ.shape
            eom = None
            if eom_sub is not None and eom_sub.frames[fi]:
                eom = codecs.decode_eom_plane(eom_sub.frames[fi])
            geo = []
            for m in sorted(geo_subs):
                layer_ref = (
                    (np.asarray(geo[0]).astype(np.uint16) if isinstance(geo[0], np.ndarray) else geo[0])
                    if geo else None
                )
                kw = {}
                if not geo:
                    kw["temporal_ref"] = (
                        geo_bank.get(parent[fi]) if parent[fi] >= 0 else None
                    )
                geo.append(geo_decs[m].decode(
                    geo_subs[m].frames[fi], layer_ref=layer_ref, **kw
                ))
            attr = []
            for m in sorted(attr_subs):
                layer_ref = attr[0] if attr else None
                kw = {}
                if not attr:
                    kw["temporal_ref"] = (
                        attr_bank.get(parent[fi]) if parent[fi] >= 0 else None
                    )
                attr.append(attr_decs[m].decode(
                    attr_subs[m].frames[fi], layer_ref=layer_ref, **kw
                ))
            needed = set(parent[fi + 1 :])
            if fi in needed:
                geo_bank[fi] = geo_decs[0].ref
                attr_bank[fi] = attr_decs[0].refs
            for bank in (geo_bank, attr_bank):
                for k in [k for k in bank if k not in needed]:
                    del bank[k]
            btp = atlas_mod.derive_block_to_patch(
                occ, patches, width, height, vps.occupancy_resolution
            )
            cfg.occupancyResolution = vps.occupancy_resolution
            cfg.geometry3dCoordinatesBitdepth = vps.geometry_3d_bitdepth
            plr_modes = plr_table = None
            if asps is not None and asps.plr_enabled_flag:
                from vpcc_tpu.ops import plr as plr_mod

                plr_modes = plr_mod.block_modes_from_patches(
                    patches, btp, *btp.shape
                )
                plr_table = asps.plr_mode_table
            occ_in = occ
            if cfg.pbfEnableFlag:
                occ_in = pipeline.apply_pbf_occupancy(
                    occ, geo[0], btp, patches, cfg
                )
            recon = pipeline.reconstruct_frame_device(
                occ_in, geo, btp, patches, cfg, eom=eom,
                plr_modes=plr_modes, plr_table=plr_table,
            )
            a0 = jnp.asarray(attr[0])
            a1 = jnp.asarray(attr[1]) if len(attr) > 1 else a0
            col_d = pipeline.gather_decoded_colors(recon.pix, recon.layer, a0, a1)
            aux_raw_pos = aux_raw_cols = aux_eom_cols = None
            if raw_geo_sub is not None:
                aux_raw_pos = aux_video.unpack_raw_geometry(
                    raw_geo_sub.frames[fi]
                )
            if raw_attr_sub is not None:
                aux_raw_cols, aux_eom_cols = aux_video.unpack_aux_attribute(
                    raw_attr_sub.frames[fi]
                )
            if aux_eom_cols is not None:
                col_d = pipeline.inject_eom_colors(
                    recon.layer, recon.valid, col_d, jnp.asarray(aux_eom_cols)
                )
            col_d = pipeline.apply_color_smoothing_device(recon, col_d, cfg)
            refl = None
            if refl_sub is not None and refl_sub.frames[fi]:
                r0d, r1d = codecs.decode_reflectance(refl_sub.frames[fi])
                refl_d = pipeline.gather_decoded_scalar(
                    recon.pix, recon.layer, r0d, r1d
                )
                refl = np.asarray(refl_d)[: recon.count].astype(np.uint16)
            pos, col = pipeline.download_recon(
                recon, col_d, vps.geometry_3d_bitdepth
            )
            tile = tiles[fi]
            raw_pos = (
                aux_raw_pos if aux_raw_pos is not None else tile.raw_positions
            )
            if raw_pos is not None:
                pos = np.concatenate([pos, raw_pos], 0)
                raw_cols = aux_raw_cols
                if raw_cols is None:
                    raw_cols = tile.raw_colors
                if raw_cols is None:
                    raw_cols = np.zeros_like(raw_pos, np.uint8)
                col = np.concatenate([col.astype(np.uint8), raw_cols], 0)
                if refl is not None:
                    refl = np.concatenate(
                        [refl, np.zeros(len(raw_pos), np.uint16)], 0
                    )
            pc = PointCloudData(pos, col.astype(np.uint8), reflectances=refl)
            if cfg.removeDuplicatePoints:
                pc = pc.remove_duplicates()
            self.frame_info.append(
                dict(patch_count=len(patches), width=width, height=height)
            )
            # level-limit conformance against the signalled PTL (reference
            # PCCConformance::checkLevelLimits, PCCConformance.cpp:210-307)
            from vpcc_tpu import conformance as conf_mod

            self.level_violations.extend(
                f"frame {fi}: {e}"
                for e in conf_mod.check_level_limits(
                    vps.ptl.level_idc, pc.point_count, len(patches),
                    width, height,
                )
            )
            out.append(pc)
        return out
