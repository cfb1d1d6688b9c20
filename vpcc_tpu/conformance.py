"""Decoder conformance logging + checking (the PccLibConformance equivalent).

Behavioral reference: `PCCConformance::check`
(source/lib/PccLibConformance/source/PCCConformance.cpp:49-307): encoder and
decoder both emit canonical per-frame key/value log files
(atlas / tile / pcframe / picture, see PCCLogger.h:43-86); the checker diffs
them key-by-key (compareLogFiles, :158) and validates V3C level limits
(checkLevelLimits, :210).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Tuple

from vpcc_tpu.utils.checksum import point_cloud_checksum
from vpcc_tpu.utils.ply import PointCloudData

# V3C level limits: (max points per frame, max patches, max atlas size)
# (reference: checkLevelLimits tables, PCCConformance.cpp:210-307)
LEVEL_LIMITS = {
    30: (1_100_000, 512, 2048 * 2048),
    45: (2_200_000, 1024, 4096 * 4096),
    60: (4_400_000, 2048, 8192 * 8192),
}


def frame_log_entries(
    frame_index: int,
    pc: PointCloudData,
    patch_count: int,
    atlas_width: int,
    atlas_height: int,
) -> Dict[str, str]:
    """Canonical per-frame conformance record."""
    return {
        "FrameIdx": str(frame_index),
        "PointCount": str(pc.point_count),
        "PatchCount": str(patch_count),
        "AtlasWidth": str(atlas_width),
        "AtlasHeight": str(atlas_height),
        "Md5Geometry": point_cloud_checksum(PointCloudData(pc.positions)),
        "Md5Full": point_cloud_checksum(pc),
    }


def write_log(path: str | Path, frames: List[Dict[str, str]]) -> None:
    with open(path, "w") as f:
        for rec in frames:
            for k, v in rec.items():
                f.write(f"{k} = {v}\n")
            f.write("\n")


def read_log(path: str | Path) -> List[Dict[str, str]]:
    frames: List[Dict[str, str]] = []
    cur: Dict[str, str] = {}
    for line in Path(path).read_text().splitlines():
        line = line.strip()
        if not line:
            if cur:
                frames.append(cur)
                cur = {}
            continue
        if "=" in line:
            k, v = line.split("=", 1)
            cur[k.strip()] = v.strip()
    if cur:
        frames.append(cur)
    return frames


def compare_logs(
    enc_log: List[Dict[str, str]], dec_log: List[Dict[str, str]]
) -> Tuple[bool, List[str]]:
    """Key-by-key MATCH/DIFF comparison (reference: compareLogFiles,
    PCCConformance.cpp:158-209)."""
    diffs: List[str] = []
    if len(enc_log) != len(dec_log):
        diffs.append(f"frame count differs: {len(enc_log)} vs {len(dec_log)}")
    for i, (a, b) in enumerate(zip(enc_log, dec_log)):
        for k in sorted(set(a) | set(b)):
            va, vb = a.get(k), b.get(k)
            if va != vb:
                diffs.append(f"frame {i}: {k}: {va} != {vb}")
    return (not diffs), diffs


def check_level_limits(
    level: int, point_count: int, patch_count: int, atlas_w: int, atlas_h: int
) -> List[str]:
    max_pts, max_patches, max_atlas = LEVEL_LIMITS.get(level, LEVEL_LIMITS[60])
    errs = []
    if point_count > max_pts:
        errs.append(f"point count {point_count} exceeds level {level} limit {max_pts}")
    if patch_count > max_patches:
        errs.append(f"patch count {patch_count} exceeds level {level} limit {max_patches}")
    if atlas_w * atlas_h > max_atlas:
        errs.append(f"atlas {atlas_w}x{atlas_h} exceeds level {level} limit")
    return errs
