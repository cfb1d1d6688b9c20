"""Connected components over the same-partition KNN graph.

Reference behavior: BFS flood fill over KNN adjacency restricted to equal
partition labels, discarding components below minPointCountPerCC
(reference: source/lib/PccLibEncoder/source/PCCPatchSegmenter.cpp:804-841).

Host-side: CC labeling is an O(N) pointer-chasing step that does not map to
the TPU's compute model; like the reference (single-threaded BFS) we run it on
the host, but as a single sparse-matrix pass (union-find in compiled code) on
the full edge set — there is no per-point Python looping.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np
from scipy.sparse import coo_matrix
from scipy.sparse.csgraph import connected_components as _scipy_cc


class SegmentGraph:
    """Same-partition KNN edge list, built once per frame and re-filtered
    cheaply per patch round (the reference rebuilds its BFS bookkeeping every
    round; the edge set itself never changes)."""

    def __init__(self, nn_idx: np.ndarray, nn_valid: np.ndarray, partition: np.ndarray):
        n = partition.shape[0]
        src = np.repeat(np.arange(n, dtype=np.int64), nn_idx.shape[1])
        dst = nn_idx.astype(np.int64).ravel()
        ok = nn_valid.ravel() & (partition[src] == partition[dst])
        self.n = n
        self.src = src[ok]
        self.dst = dst[ok]


def connected_components(
    nn_idx,                  # (N, K) int32 or a prebuilt SegmentGraph
    nn_valid: np.ndarray,    # (N, K) bool (ignored with a SegmentGraph)
    partition: np.ndarray,   # (N,) int32
    active: np.ndarray,      # (N,) bool — points eligible for labeling
    seeds: np.ndarray,       # (N,) bool — points allowed to start a component
    min_size: int,
) -> List[np.ndarray]:
    """Return the list of components (arrays of point indices), each of size
    >= min_size, containing at least one seed, sorted descending by size."""
    if isinstance(nn_idx, SegmentGraph):
        graph = nn_idx
    else:
        graph = SegmentGraph(nn_idx, nn_valid, partition)
    n = graph.n
    ok = active[graph.src] & active[graph.dst]
    src, dst = graph.src[ok], graph.dst[ok]
    g = coo_matrix((np.ones(len(src), np.int8), (src, dst)), shape=(n, n))
    ncc, labels = _scipy_cc(g, directed=False)
    labels = labels.astype(np.int64)
    labels[~active] = -1

    # component sizes + seed presence
    sizes = np.bincount(labels[active], minlength=ncc)
    has_seed = np.zeros(ncc, bool)
    np.logical_or.at(has_seed, labels[active & seeds], True)
    keep = np.nonzero((sizes >= min_size) & has_seed)[0]
    order = keep[np.argsort(-sizes[keep], kind="stable")]

    comp_of = np.full(ncc, -1, np.int64)
    comp_of[order] = np.arange(len(order))
    pt_comp = np.where(labels >= 0, comp_of[np.maximum(labels, 0)], -1)
    idx_sorted = np.argsort(pt_comp, kind="stable")
    pt_comp_sorted = pt_comp[idx_sorted]
    start = np.searchsorted(pt_comp_sorted, np.arange(len(order)))
    end = np.searchsorted(pt_comp_sorted, np.arange(len(order)) + 1)
    return [idx_sorted[s:e] for s, e in zip(start, end)]
