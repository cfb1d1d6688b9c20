"""Point-cloud checksums (the PCCChecksum equivalent).

Behavioral reference: `PCCChecksum`
(source/lib/PccLibMetrics/source/PCCChecksum.cpp:51-148): MD5 over the
points (positions + attributes) of source / reconstructed / decoded clouds,
written to a sidecar `.checksum` file and compared between encoder and
decoder runs; `PCCPointSet3::computeChecksum` (PCCPointSet.h:499) sorts
points first so the digest is order-invariant.
"""

from __future__ import annotations

import hashlib
from pathlib import Path
from typing import List, Optional

import numpy as np

from vpcc_tpu.utils.ply import PointCloudData


def point_cloud_checksum(pc: PointCloudData) -> str:
    """Order-invariant MD5 of positions (+ colors if present)."""
    pos = np.asarray(pc.positions, np.int64)
    order = np.lexsort((pos[:, 2], pos[:, 1], pos[:, 0]))
    h = hashlib.md5()
    h.update(pos[order].astype("<i4").tobytes())
    if pc.colors is not None:
        h.update(np.asarray(pc.colors)[order].astype(np.uint8).tobytes())
    return h.hexdigest()


class ChecksumFile:
    """Sidecar checksum list, one hex digest per frame per role."""

    def __init__(self):
        self.entries: List[str] = []

    def add(self, pc: PointCloudData) -> str:
        d = point_cloud_checksum(pc)
        self.entries.append(d)
        return d

    def write(self, path: str | Path) -> None:
        Path(path).write_text("\n".join(self.entries) + "\n")

    @classmethod
    def read(cls, path: str | Path) -> "ChecksumFile":
        c = cls()
        c.entries = [l.strip() for l in Path(path).read_text().splitlines() if l.strip()]
        return c

    def compare(self, other: "ChecksumFile") -> bool:
        return self.entries == other.entries
