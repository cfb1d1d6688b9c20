"""Kernel-level golden tests: KNN vs brute force, normals, segmentation."""

import jax.numpy as jnp
import numpy as np
import pytest

from vpcc_tpu.core.pointcloud import from_host
from vpcc_tpu.ops import neighbors
from vpcc_tpu.ops.normals import compute_normals, pca_normals
from vpcc_tpu.ops.segmentation import (
    ORIENTATIONS6,
    get_orientations,
    initial_segmentation,
    refine_segmentation,
)
from vpcc_tpu.utils.ply import PointCloudData
from vpcc_tpu.utils.synthetic import make_sphere_cloud


def brute_force_knn(positions, queries, k):
    d = queries[:, None, :].astype(np.int64) - positions[None, :, :].astype(np.int64)
    d2 = (d * d).sum(-1)
    idx = np.argsort(d2, axis=1, kind="stable")[:, :k]
    return idx, np.take_along_axis(d2, idx, axis=1)


def test_knn_matches_brute_force_dense_region():
    rng = np.random.default_rng(0)
    # points concentrated so 3x3x3 cells always contain the true neighbors
    pts = rng.integers(0, 64, size=(2000, 3)).astype(np.int32)
    pts = np.unique(pts, axis=0)
    pc = from_host(PointCloudData(pts), bucket=1024)
    grid = neighbors.build_grid(pc.positions, grid_bits=6, cell_bits=2)
    idx, d2 = neighbors.knn(grid, pc.positions, pc.positions, k=4, bucket=32, chunk=1024)
    idx, d2 = np.asarray(idx)[: len(pts)], np.asarray(d2)[: len(pts)]
    bf_idx, bf_d2 = brute_force_knn(pts, pts, 4)
    # distances must match exactly (indices may differ on ties)
    frac_equal = (np.sort(d2, 1) == np.sort(bf_d2, 1)).mean()
    assert frac_equal > 0.97  # bounded-bucket truncation tolerance


def test_knn_surface_cloud_self_nearest():
    pc_h = make_sphere_cloud(bits=7, n_samples=20000)
    pc = from_host(pc_h)
    grid = neighbors.build_grid(pc.positions, grid_bits=7)
    idx, d2 = neighbors.knn(grid, pc.positions, pc.positions, k=8)
    n = pc_h.point_count
    idx, d2 = np.asarray(idx)[:n], np.asarray(d2)[:n]
    # nearest neighbor of each point is itself at distance 0
    assert (d2[:, 0] == 0).all()
    assert (idx[:, 0] == np.arange(n)).all()
    # valid points have 8 true neighbors on a dense surface
    assert (d2[:, 7] < neighbors.MAX_DIST2).mean() > 0.99


def test_normals_on_sphere_point_radially():
    pc_h = make_sphere_cloud(bits=7, n_samples=40000)
    pc = from_host(pc_h)
    grid = neighbors.build_grid(pc.positions, grid_bits=7)
    idx, d2 = neighbors.knn(grid, pc.positions, pc.positions, k=16)
    valid = pc.valid_mask()
    nn_valid = (d2 < neighbors.MAX_DIST2) & valid[:, None]
    nrm = compute_normals(pc.positions, idx, nn_valid, valid)
    n = pc_h.point_count
    nrm = np.asarray(nrm)[:n]
    center = 64.0
    radial = pc_h.positions.astype(np.float64) - center
    radial /= np.maximum(np.linalg.norm(radial, axis=1, keepdims=True), 1e-9)
    dots = (nrm * radial).sum(1)
    # normals aligned (outward) with the radial direction for most points
    assert (np.abs(dots) > 0.8).mean() > 0.95
    assert (dots > 0).mean() > 0.95  # consensus orientation = outward


def test_initial_segmentation_axis_normals():
    normals = jnp.asarray(
        np.array(
            [[1, 0, 0], [0, 1, 0], [0, 0, 1], [-1, 0, 0], [0, -1, 0], [0, 0, -1]],
            np.float32,
        )
    )
    orients = jnp.asarray(ORIENTATIONS6)
    w = jnp.ones(6)
    part = np.asarray(initial_segmentation(normals, orients, w))
    np.testing.assert_array_equal(part, np.arange(6))


def test_refine_segmentation_smooths_outliers():
    # a plane of +Z normals with a few flipped points: refinement flips back
    n = 256
    rng = np.random.default_rng(1)
    pts = np.stack(
        [rng.integers(0, 16, n), rng.integers(0, 16, n), np.full(n, 8)], 1
    ).astype(np.int32)
    normals = np.tile(np.array([[0, 0, 1.0]], np.float32), (n, 1))
    flip = rng.choice(n, 20, replace=False)
    normals[flip] *= -1
    part0 = np.full(n, 2, np.int32)
    part0[flip] = 5
    nn_idx, _ = brute_force_knn(pts, pts, 16)
    nn_valid = np.ones_like(nn_idx, bool)
    part = refine_segmentation(
        jnp.asarray(normals), jnp.asarray(part0), jnp.asarray(nn_idx),
        jnp.asarray(nn_valid), jnp.asarray(ORIENTATIONS6), 3.0, 10,
    )
    part = np.asarray(part)
    assert (part == 2).mean() > 0.95


def test_device_cc_matches_host_cc():
    """cc_labels_device groups points identically to the host scipy CC
    (same component sets; labels differ by representative choice)."""
    import numpy as np
    import jax.numpy as jnp
    from vpcc_tpu.ops import cc as cc_mod
    from vpcc_tpu.ops import neighbors
    from vpcc_tpu.core.pointcloud import from_host
    from vpcc_tpu.utils.synthetic import make_sphere_cloud

    pc_h = make_sphere_cloud(bits=6, n_samples=3000, seed=3)
    pc = from_host(pc_h, capacity=4096)
    n = pc_h.point_count
    grid = neighbors.build_grid(pc.positions, 6)
    nn_idx, nn_d2 = neighbors.knn(grid, pc.positions, pc.positions, k=8, bucket=16)
    valid_rows = pc.valid_mask()
    nn_valid = (nn_d2 < neighbors.MAX_DIST2) & valid_rows[:, None]
    rng = np.random.RandomState(0)
    part_h = rng.randint(0, 3, size=pc.positions.shape[0]).astype(np.int32)
    active_h = rng.rand(pc.positions.shape[0]) < 0.9
    active_h[n:] = False

    labels = np.asarray(
        cc_mod.cc_labels_device(nn_idx, nn_valid, jnp.asarray(part_h), jnp.asarray(active_h))
    )[:n]
    seeds = np.ones(n, bool)
    comps_dev = cc_mod.components_from_labels(labels, seeds, 5)

    comps_host = cc_mod.connected_components(
        np.asarray(nn_idx)[:n], np.asarray(nn_valid)[:n], part_h[:n],
        active_h[:n], seeds, 5,
    )
    assert len(comps_dev) == len(comps_host)
    set_dev = {frozenset(c.tolist()) for c in comps_dev}
    set_host = {frozenset(c.tolist()) for c in comps_host}
    assert set_dev == set_host


def test_coverage_volume_exact_vs_bruteforce():
    """ops/coverage.py: thresholded coverage via bit-volume ball dilation
    must match brute-force distance thresholds exactly."""
    import numpy as np
    import jax.numpy as jnp

    from vpcc_tpu.core.pointcloud import PAD_COORD
    from vpcc_tpu.ops import coverage

    rng = np.random.default_rng(0)
    bits, R, N = 7, 500, 2000
    res = rng.integers(0, 128, (512, 3)).astype(np.int32)
    res[R:] = PAD_COORD
    q = rng.integers(0, 128, (2048, 3)).astype(np.int32)
    q[N:] = PAD_COORD
    sel, det = coverage.covered_radius(jnp.asarray(res), jnp.asarray(q), bits)
    sel, det = np.asarray(sel), np.asarray(det)
    d2 = (
        (q[:N, None, :].astype(np.int64) - res[None, :R, :].astype(np.int64))
        ** 2
    ).sum(-1).min(1)
    np.testing.assert_array_equal(sel[:N], d2 <= 1)
    np.testing.assert_array_equal(det[:N], d2 <= 9)
    assert not sel[N:].any() and not det[N:].any()


def test_color_presmoothing_matches_reference_semantics():
    """presmooth_colors vs a direct NumPy transcription of
    presmoothPointCloudColor (PCCEncoder.cpp:6593-6656): boundary points
    with a deviant color in a low-entropy neighborhood snap to the integer
    centroid; everything else is untouched."""
    import jax.numpy as jnp

    from vpcc_tpu.core.pointcloud import shape_bucket
    from vpcc_tpu.ops.smoothing import presmooth_colors

    rng = np.random.default_rng(11)
    n = 4000
    pos = np.unique(rng.integers(0, 64, (n, 3), dtype=np.int32), axis=0)
    n = len(pos)
    col = np.full((n, 3), 100, np.int32)          # uniform -> entropy 0
    out_i = rng.integers(0, n, 40)                 # outlier colors
    col[out_i] = 250
    bnd = np.zeros(n, bool)
    bnd[: n // 2] = True                           # half are boundary

    cap = shape_bucket(n)
    posp = np.full((cap, 3), -(1 << 20), np.int32); posp[:n] = pos
    colp = np.zeros((cap, 3), np.int32); colp[:n] = col
    bndp = np.zeros(cap, bool); bndp[:n] = bnd

    k, radius2, thr_dist, thr_ent = 16, 64.0, 10.0, 4.5
    sm = np.asarray(presmooth_colors(
        jnp.asarray(posp), jnp.asarray(colp), jnp.asarray(n),
        jnp.asarray(bndp), 6, k, radius2, thr_dist, thr_ent,
    ))[:n]

    # NumPy reference on the same (windowed-KNN) neighbor sets
    from vpcc_tpu.ops import neighbors as nb
    grid = nb.build_grid(jnp.asarray(posp), 6)
    nidx, nd2 = nb.knn(grid, jnp.asarray(posp), jnp.asarray(pos), k=k, bucket=6)
    nidx, nd2 = np.asarray(nidx), np.asarray(nd2)
    exp = col.copy()
    for i in range(n):
        if not bnd[i]:
            continue
        sel = (nd2[i] < int(nb.MAX_DIST2)) & (nd2[i] <= radius2)
        if not sel.any():
            continue
        nc = col[nidx[i][sel]]
        m = sel.sum()
        centroid = (nc.sum(0) + m // 2) // m
        y = (0.2126 * nc[:, 0] + 0.7152 * nc[:, 1] + 0.0722 * nc[:, 2]).astype(np.uint8)
        _, cnts = np.unique(y, return_counts=True)
        p = cnts / m
        H = float(-(p * np.log2(p)).sum())
        if np.abs(centroid - col[i]).sum() >= thr_dist and H < thr_ent:
            exp[i] = centroid
    np.testing.assert_array_equal(sm, exp)
    # sanity: at least one boundary outlier was actually smoothed
    assert (sm != col).any()


def test_padding_modes_and_group_dilation():
    """attributeBGFill modes (0 dilate / 1 push-pull / 2 harmonic) keep
    occupied pixels verbatim; harmonic fill is (near-)Laplace-flat in the
    background; group dilation equalizes both maps' backgrounds with the
    reference's (d0+d1+1)>>1 rounding."""
    import jax.numpy as jnp

    from vpcc_tpu.ops import padding

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (64, 64)).astype(np.float32)
    occ = rng.random((64, 64)) < 0.3
    laps = {}
    for mode in (0, 1, 2):
        out = np.asarray(padding.fill_plane(jnp.asarray(img), jnp.asarray(occ), mode))
        assert np.array_equal(out[occ], img[occ]), mode
        lap = np.abs(4 * out[1:-1, 1:-1] - out[:-2, 1:-1] - out[2:, 1:-1]
                     - out[1:-1, :-2] - out[1:-1, 2:])
        laps[mode] = lap[~occ[1:-1, 1:-1]].mean()
    assert laps[2] < laps[1] * 0.2  # harmonic is much flatter

    a = rng.integers(0, 256, (32, 32, 3))
    b = rng.integers(0, 256, (32, 32, 3))
    occ2 = rng.random((32, 32)) < 0.5
    ga, gb = padding.group_dilate(jnp.asarray(a), jnp.asarray(b), jnp.asarray(occ2))
    ga, gb = np.asarray(ga), np.asarray(gb)
    assert np.array_equal(ga[occ2], a[occ2]) and np.array_equal(gb[occ2], b[occ2])
    assert np.array_equal(ga[~occ2], gb[~occ2])
    assert np.array_equal(ga[~occ2], (a[~occ2] + b[~occ2] + 1) >> 1)


def test_normals_orientation_modes():
    """Orientation mode parity (reference PCCNormalsGenerator.cpp:186-300):
    view-point mode flips every normal toward the viewpoint exactly;
    spanning-tree flood orients a corrugated open sheet consistently with
    the analytic surface orientation (radial-init consensus can stabilize
    flipped regions on such sheets); on a sphere the flood agrees with the
    outward ground truth."""
    import jax.numpy as jnp

    from vpcc_tpu.ops import neighbors, normals as nm

    # corrugated open sheet z = 12 sin(x/8) over a 96x96 grid
    xs, ys = np.mgrid[0:96, 0:96]
    zs = np.round(40 + 12 * np.sin(xs / 8.0)).astype(np.int32)
    pos = np.stack([xs.ravel(), ys.ravel(), zs.ravel()], 1).astype(np.int32)
    n = len(pos)
    pad = np.full((1 << (n - 1).bit_length(), 3), -(1 << 20), np.int32)
    pad[:n] = pos
    posd = jnp.asarray(pad)
    grid = neighbors.build_grid(posd, 7)
    nn_idx, nn_d2 = neighbors.knn(grid, posd, posd, k=10, bucket=8)
    valid = posd[:, 0] != -(1 << 20)
    nn_valid = (nn_d2 < neighbors.MAX_DIST2) & valid[:, None]

    # analytic upward-consistent surface normal: (-dz/dx, 0, 1) normalized
    dzdx = (12 / 8.0) * np.cos(xs / 8.0)
    ana = np.stack([-dzdx.ravel(), np.zeros(n), np.ones(n)], 1)
    ana /= np.linalg.norm(ana, axis=1, keepdims=True)

    st = np.asarray(nm.compute_normals(posd, nn_idx, nn_valid, valid, mode=4))[:n]
    agree = (st * ana).sum(1)
    sign = np.sign(np.median(agree))
    frac = np.mean(sign * agree > 0)
    assert frac > 0.99, frac

    # view-point: every normal points toward the viewpoint
    vp = (48.0, 48.0, 500.0)
    v = np.asarray(nm.compute_normals(
        posd, nn_idx, nn_valid, valid, mode=2, viewpoint=vp))[:n]
    tovp = np.asarray(vp)[None] - pos
    assert (np.einsum("nc,nc->n", v, tovp) >= 0).all()


def test_reflectance_psnr_metric():
    """Reflectance PSNR (reference PCCMetrics.cpp:218-227): symmetric NN
    transfer of the 16-bit reflectance, exact on identical clouds and
    finite/ordered under noise."""
    from vpcc_tpu.ops.metrics import compute_metrics

    rng = np.random.default_rng(4)
    pos = np.unique(rng.integers(0, 128, (5000, 3), dtype=np.int32), axis=0)
    refl = rng.integers(0, 65536, len(pos)).astype(np.uint16)

    m_same = compute_metrics(
        pos, None, pos, None, resolution=127, grid_bits=7,
        src_refl=refl, rec_refl=refl,
    )
    assert m_same.reflectance_psnr == float("inf")

    noisy = (refl.astype(np.int32) + rng.integers(-300, 301, len(pos))).clip(0, 65535).astype(np.uint16)
    noisier = (refl.astype(np.int32) + rng.integers(-3000, 3001, len(pos))).clip(0, 65535).astype(np.uint16)
    m1 = compute_metrics(pos, None, pos, None, resolution=127, grid_bits=7,
                         src_refl=refl, rec_refl=noisy)
    m2 = compute_metrics(pos, None, pos, None, resolution=127, grid_bits=7,
                         src_refl=refl, rec_refl=noisier)
    assert m1.reflectance_psnr > m2.reflectance_psnr > 0
