"""TPU-native HEVC-class video codec (wavefront intra + zero-MV inter).

Replaces the reference's external HM encode/decode path for the geometry and
attribute substreams (reference: PCCVideoEncoder::compress,
source/lib/PccLibEncoder/source/PCCVideoEncoder.cpp:282-440 shelling out to
the patched HM of dependencies/cmake/hm.cmake — SURVEY.md §3.1 marks that
subprocess as the hottest stage of TMC2).

TPU-first architecture (not an HM port):

* The raster-scan intra dependency becomes a **wavefront lax.scan** over
  16x16 CU diagonals d = 2*by + bx (WPP order).  Every step processes one
  diagonal: all CUs on it are independent, so the whole diagonal is one
  batched program — gather reference samples, predict ALL 36 modes at once
  (35 HEVC intra modes + zero-MV inter), transform, quantize, RD-select,
  reconstruct, scatter into the frame buffer.  No per-block Python, no
  per-block dispatch: one compiled scan per plane shape.
* **Two-level CU quadtree**: each 16x16 CU is evaluated as one 16x16
  prediction+transform AND as four 8x8 blocks (coded in z-order inside the
  step, so later sub-blocks predict from earlier ones), and the cheaper
  branch wins — the variable-block-size machinery that gives HEVC its
  low-rate efficiency on smooth content.
* All 35 intra predictions are **2-tap static gathers** over the (4N+1)
  reference vector (tables in hevc_tables.py), so mode evaluation is a
  single gather + multiply-add over a (blocks, 35, N, N) tensor.
* RD optimization runs in the transform domain (orthonormal forward DCT in
  f32; distortion = sum (c - level*qstep)^2, which equals pixel SSE by
  Parseval) — only the chosen mode pays an inverse transform.
* Distortion is weighted per block by the fraction of pixels that generate
  3D points (the decoded occupancy): background-fill distortion is nearly
  free, so rate flows to the pixels V-PCC reconstruction actually reads.
* The reconstruction path (dequant + integer inverse transform + prediction
  add + clip) is **pure int32**, bit-exact and platform-independent:
  encoder-side recon == decoder recon on TPU or CPU, which the V-PCC
  pipeline relies on for encoder/decoder parity.
* Entropy coding is a host-side context-adaptive binary arithmetic coder
  (native/entropy.cpp: split flags, MPM mode coding, last-position +
  significance + greater1/greater2 coefficient syntax), mirroring HM's
  CABAC role per the SURVEY.md §7.5 wavefront split.

A deblocking filter (HEVC-style normal filter with spec beta/tc thresholds)
runs identically on both sides after reconstruction.
"""

from __future__ import annotations

import functools
import struct
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vpcc_tpu.ops import padding
from vpcc_tpu.video import entropy
from vpcc_tpu.video import hevc_tables as tab

CU = 16                      # top CU size
SUB = 8                      # split block size
SUB_OFF = ((0, 0), (0, 8), (8, 0), (8, 8))  # z-order

_MODE_BITS = np.full(tab.N_MODES, 5.0, np.float32)
_MODE_BITS[0] = _MODE_BITS[1] = 3.0   # planar/DC: usually MPM-coded
_MODE_BITS[tab.MODE_INTER] = 2.0      # inter flag


class _SizeConsts:
    """Per-block-size device constants (prediction taps, transforms)."""

    def __init__(self, n: int, WB: int):
        self.n = n
        idx0, idx1, w0, w1 = tab.angular_taps(n)
        self.idx0, self.idx1 = jnp.asarray(idx0), jnp.asarray(idx1)
        self.w0, self.w1 = jnp.asarray(w0), jnp.asarray(w1)
        pl_left, pl_top, pl_tr, pl_bl = tab.planar_taps(n)
        self.pl_left, self.pl_top = jnp.asarray(pl_left), jnp.asarray(pl_top)
        self.pl_tr, self.pl_bl = pl_tr, pl_bl
        self.dc_shift = n.bit_length()          # log2(n) + 1
        self.T = jnp.asarray(tab.dct_int(n))
        self.Tt = jnp.asarray(tab.dct_int(n).T)
        self.Cf = jnp.asarray(tab.dct_orthonormal(n).astype(np.float32))
        # inverse-transform downshifts: total 18 + log2(n)
        total = 18 + (n.bit_length() - 1)
        self.s1 = 11
        self.s2 = total - self.s1
        self.zz = jnp.asarray(tab.zigzag(n))
        self.ref_offs = jnp.asarray(
            np.concatenate(
                [[-WB - 1], np.arange(2 * n) - WB, np.arange(2 * n) * WB - 1]
            ).astype(np.int32)
        )
        self.blk_offs = jnp.asarray(
            (np.arange(n)[:, None] * WB + np.arange(n)[None, :])
            .reshape(-1)
            .astype(np.int32)
        )


def _predict_all(refs, ref_blocks, C: _SizeConsts):
    """refs: (P, B, 4n+1) int32; ref_blocks: (P, B, n*n) int32 (co-located
    inter prediction).  Returns (P, B, 36, n*n) int32 predictions."""
    n = C.n
    ang = (C.w0 * refs[:, :, C.idx0] + C.w1 * refs[:, :, C.idx1] + 16) >> 5
    dcsum = refs[:, :, 1 : n + 1].sum(-1) + refs[:, :, 2 * n + 1 : 3 * n + 1].sum(-1)
    dc = (dcsum + n) >> C.dc_shift
    dc = jnp.broadcast_to(dc[:, :, None, None, None], ang.shape[:2] + (1, n, n))
    xs = jnp.arange(n, dtype=jnp.int32)
    left_y = refs[:, :, C.pl_left]
    top_x = refs[:, :, C.pl_top]
    tr = refs[:, :, C.pl_tr]
    bl = refs[:, :, C.pl_bl]
    planar = (
        (n - 1 - xs)[None, None, None, :] * left_y[:, :, :, None]
        + (xs + 1)[None, None, None, :] * tr[:, :, None, None]
        + (n - 1 - xs)[None, None, :, None] * top_x[:, :, None, :]
        + (xs + 1)[None, None, :, None] * bl[:, :, None, None]
        + n
    ) >> C.dc_shift
    intra = jnp.concatenate([planar[:, :, None], dc, ang], axis=2)
    inter = ref_blocks.reshape(ref_blocks.shape[:2] + (1, n, n))
    allp = jnp.concatenate([intra, inter], axis=2)
    return allp.reshape(allp.shape[:2] + (tab.N_MODES, n * n))


def _int_recon(levels, pred, dq, maxvals, C: _SizeConsts):
    """Bit-exact int32 reconstruction: dequant -> integer inverse transform
    -> add prediction -> clip.  levels/pred: (P, B, n*n); dq/maxvals: (P,)."""
    n = C.n
    d = levels.reshape(levels.shape[:2] + (n, n)) * dq[:, None, None, None]
    d = jnp.clip(d, -(1 << 19), (1 << 19) - 1)
    e = (jnp.einsum("ij,pbjk->pbik", C.Tt, d) + (1 << (C.s1 - 1))) >> C.s1
    r = (jnp.einsum("pbik,kj->pbij", e, C.T) + (1 << (C.s2 - 1))) >> C.s2
    rec = pred + r.reshape(levels.shape[:2] + (n * n,))
    return jnp.clip(rec, 0, maxvals[:, None, None])


def _rd_choose(src_v, allp, wblk, qstep, inv_q, lam, inter_pen, mode_bits, C):
    """Transform-domain RDO over all 36 modes.  Returns (mode (P,B),
    levels (P,B,n2) of the chosen mode, pred (P,B,n2), cost (P,B))."""
    n = C.n
    resid = (src_v[:, :, None, :] - allp).astype(jnp.float32)
    rs = resid.reshape(resid.shape[:2] + (tab.N_MODES, n, n))
    c = jnp.einsum("ij,pbmjk,lk->pbmil", C.Cf, rs, C.Cf)
    ca = jnp.abs(c)
    lv = jnp.floor(ca * inv_q[:, None, None, None, None] + 0.33)
    lv = jnp.minimum(lv, 32767.0)
    dist = jnp.sum((ca - lv * qstep[:, None, None, None, None]) ** 2, (-2, -1))
    bits = jnp.sum(
        jnp.where(lv > 0, 3.0 + 2.0 * jnp.log2(1.0 + lv), 0.0), (-2, -1)
    )
    cost = wblk[:, :, None] * dist + lam[:, None, None] * (
        bits + mode_bits[None, None, :]
    )
    cost = cost.at[:, :, tab.MODE_INTER].add(inter_pen)
    mode = jnp.argmin(cost, axis=2)
    levels = (jnp.sign(c) * lv).astype(jnp.int32)
    levels = levels.reshape(levels.shape[:2] + (tab.N_MODES, n * n))
    msel = mode[:, :, None, None]
    lev_c = jnp.take_along_axis(levels, msel, axis=2)[:, :, 0]
    pred_c = jnp.take_along_axis(allp, msel, axis=2)[:, :, 0]
    cost_c = jnp.take_along_axis(cost, mode[:, :, None], axis=2)[:, :, 0]
    return mode, lev_c, pred_c, cost_c


def _deblock(rec, qps, maxvals):
    """HEVC-style normal deblocking filter on all 8-aligned block edges
    (boundary strength 2: everything here is intra / freshly coded).
    Integer-exact; applied identically by encoder and decoder."""
    P, H, W = rec.shape
    tc8 = jnp.asarray(tab.TC_TAB)[jnp.clip(qps + 2, 0, 53)]
    scale = (maxvals + 1) // 256
    tc = (tc8 * jnp.maximum(scale, 1))[:, None, None]

    def filter_axis(v):
        _, h, w = v.shape
        a = v.reshape(P, h, w // SUB, SUB)
        p1 = a[:, :, :-1, SUB - 2]
        p0 = a[:, :, :-1, SUB - 1]
        q0 = a[:, :, 1:, 0]
        q1 = a[:, :, 1:, 1]
        dlt = (9 * (q0 - p0) - 3 * (q1 - p1) + 8) >> 4
        on = jnp.abs(dlt) < 10 * tc
        d = jnp.clip(dlt, -tc, tc)
        mv = maxvals[:, None, None]
        p0n = jnp.where(on, jnp.clip(p0 + d, 0, mv), p0)
        q0n = jnp.where(on, jnp.clip(q0 - d, 0, mv), q0)
        a = a.at[:, :, :-1, SUB - 1].set(p0n)
        a = a.at[:, :, 1:, 0].set(q0n)
        return a.reshape(P, h, w)

    rec = filter_axis(rec)
    rec = filter_axis(rec.transpose(0, 2, 1)).transpose(0, 2, 1)
    return rec


def _pad_flat(x, HB, WB, extra):
    """(P, H, W) -> flat (P, HB*WB + extra) in the padded buffer layout
    with origin (1, 1)."""
    P, H, W = x.shape
    buf = jnp.zeros((P, HB, WB), jnp.int32)
    buf = buf.at[:, 1 : 1 + H, 1 : 1 + W].set(x.astype(jnp.int32))
    return jnp.concatenate(
        [buf.reshape(P, HB * WB), jnp.zeros((P, extra), jnp.int32)], axis=1
    )


@functools.lru_cache(maxsize=32)
def _build_encode(P: int, H: int, W: int, deblock: bool):
    nby, nbx = H // CU, W // CU
    nb = nby * nbx
    HB, WB = H + 2 * CU + 2, W + 2 * CU + 2
    SZ = HB * WB
    by_tab, bx_tab, valid_tab = tab.wavefront_schedule(nby, nbx)
    C16 = _SizeConsts(CU, WB)
    C8 = _SizeConsts(SUB, WB)
    dq_tab = jnp.asarray(tab.DQ64)
    lam_tab = jnp.asarray(tab.LAMBDA)
    mode_bits = jnp.asarray(_MODE_BITS)

    def run(planes, qps, refs, has_ref, maxvals, weights):
        src = _pad_flat(planes, HB, WB, CU * CU)
        reff = _pad_flat(refs, HB, WB, CU * CU)
        wmap = _pad_flat(weights, HB, WB, CU * CU)
        init = ((maxvals + 1) // 2)[:, None]
        buf = jnp.broadcast_to(init, (P, SZ + CU * CU)).astype(jnp.int32)
        dq = dq_tab[jnp.clip(qps, 0, 51)]
        qstep = dq.astype(jnp.float32) / 64.0
        inv_q = 1.0 / qstep
        lam = lam_tab[jnp.clip(qps, 0, 51)]
        inter_pen = jnp.where(has_ref, 0.0, jnp.float32(1e30))

        split_out = jnp.zeros((P, nb + 1), jnp.int32)
        m16_out = jnp.zeros((P, nb + 1), jnp.int32)
        c16_out = jnp.zeros((P, nb + 1, CU * CU), jnp.int32)
        m8_out = jnp.zeros((P, nb + 1, 4), jnp.int32)
        c8_out = jnp.zeros((P, nb + 1, 4, SUB * SUB), jnp.int32)

        def gather_w(idx):
            return jnp.maximum(
                jnp.take(wmap, idx, axis=1).astype(jnp.float32).mean(-1), 0.04
            )

        def body(carry, xs):
            buf, split_out, m16_out, c16_out, m8_out, c8_out = carry
            by, bx, vld = xs
            base16 = (by * CU + 1) * WB + (bx * CU + 1)
            base16 = jnp.where(vld, base16, SZ)
            bidx = jnp.where(vld, by * nbx + bx, nb)
            blk16 = base16[:, None] + C16.blk_offs[None, :]

            # ---- 16x16 candidate (refs gathered BEFORE any sub write)
            refs16 = jnp.take(buf, base16[:, None] + C16.ref_offs[None, :], axis=1)
            src16 = jnp.take(src, blk16, axis=1)
            allp16 = _predict_all(refs16, jnp.take(reff, blk16, axis=1), C16)
            m16, lev16, pred16, cost16 = _rd_choose(
                src16, allp16, gather_w(blk16), qstep, inv_q, lam,
                inter_pen, mode_bits, C16,
            )

            # ---- four 8x8 sub-blocks in z-order (later ones predict from
            # earlier ones' reconstruction, matching raster causality)
            cost_split = jnp.broadcast_to(lam[:, None], cost16.shape) * 1.0  # split flag
            m8s, c8s = [], []
            for s, (dy, dx) in enumerate(SUB_OFF):
                base8 = jnp.where(vld, base16 + dy * WB + dx, SZ)
                blk8 = base8[:, None] + C8.blk_offs[None, :]
                refs8 = jnp.take(buf, base8[:, None] + C8.ref_offs[None, :], axis=1)
                src8 = jnp.take(src, blk8, axis=1)
                allp8 = _predict_all(refs8, jnp.take(reff, blk8, axis=1), C8)
                m8, lev8, pred8, cost8 = _rd_choose(
                    src8, allp8, gather_w(blk8), qstep, inv_q, lam,
                    inter_pen, mode_bits, C8,
                )
                rec8 = _int_recon(lev8, pred8, dq, maxvals, C8)
                buf = buf.at[:, blk8].set(rec8)
                cost_split = cost_split + cost8
                m8s.append(m8)
                c8s.append(lev8[:, :, C8.zz])

            # ---- decision: keep the z-order 8x8 recon or overwrite with 16
            split = cost_split < cost16                      # (P, B)
            rec16 = _int_recon(lev16, pred16, dq, maxvals, C16)
            cur = jnp.take(buf, blk16, axis=1)               # 8x8 recons
            merged = jnp.where(split[:, :, None], cur, rec16)
            buf = buf.at[:, blk16].set(merged)

            split_out = split_out.at[:, bidx].set(split.astype(jnp.int32))
            m16_out = m16_out.at[:, bidx].set(m16)
            c16_out = c16_out.at[:, bidx].set(lev16[:, :, C16.zz])
            m8_out = m8_out.at[:, bidx].set(jnp.stack(m8s, -1))
            c8_out = c8_out.at[:, bidx].set(jnp.stack(c8s, 2))
            return (buf, split_out, m16_out, c16_out, m8_out, c8_out), None

        xs = (jnp.asarray(by_tab), jnp.asarray(bx_tab), jnp.asarray(valid_tab))
        carry = (buf, split_out, m16_out, c16_out, m8_out, c8_out)
        (buf, split_out, m16_out, c16_out, m8_out, c8_out), _ = jax.lax.scan(
            body, carry, xs
        )
        rec = buf[:, :SZ].reshape(P, HB, WB)[:, 1 : 1 + H, 1 : 1 + W]
        if deblock:
            rec = _deblock(rec, qps, maxvals)
        return (
            split_out[:, :nb], m16_out[:, :nb], c16_out[:, :nb],
            m8_out[:, :nb], c8_out[:, :nb], rec,
        )

    return jax.jit(run)


@functools.lru_cache(maxsize=32)
def _build_decode(P: int, H: int, W: int, deblock: bool):
    nby, nbx = H // CU, W // CU
    nb = nby * nbx
    HB, WB = H + 2 * CU + 2, W + 2 * CU + 2
    SZ = HB * WB
    by_tab, bx_tab, valid_tab = tab.wavefront_schedule(nby, nbx)
    C16 = _SizeConsts(CU, WB)
    C8 = _SizeConsts(SUB, WB)
    inv_zz16 = jnp.asarray(np.argsort(tab.zigzag(CU)).astype(np.int32))
    inv_zz8 = jnp.asarray(np.argsort(tab.zigzag(SUB)).astype(np.int32))
    dq_tab = jnp.asarray(tab.DQ64)

    def run(split, m16, c16, m8, c8, qps, refs, maxvals):
        reff = _pad_flat(refs, HB, WB, CU * CU)
        init = ((maxvals + 1) // 2)[:, None]
        buf = jnp.broadcast_to(init, (P, SZ + CU * CU)).astype(jnp.int32)
        dq = dq_tab[jnp.clip(qps, 0, 51)]
        pad1 = lambda a: jnp.concatenate(
            [a, jnp.zeros((P, 1) + a.shape[2:], a.dtype)], axis=1
        )
        split_p, m16_p, m8_p = pad1(split), pad1(m16), pad1(m8)
        c16_p = pad1(c16[:, :, inv_zz16])
        c8_p = pad1(c8[:, :, :, inv_zz8])

        def body(buf, xs):
            by, bx, vld = xs
            base16 = (by * CU + 1) * WB + (bx * CU + 1)
            base16 = jnp.where(vld, base16, SZ)
            bidx = jnp.where(vld, by * nbx + bx, nb)
            blk16 = base16[:, None] + C16.blk_offs[None, :]
            spl = jnp.take(split_p, bidx, axis=1)            # (P, B)

            refs16 = jnp.take(buf, base16[:, None] + C16.ref_offs[None, :], axis=1)
            allp16 = _predict_all(refs16, jnp.take(reff, blk16, axis=1), C16)
            mode16 = jnp.take(m16_p, bidx, axis=1)
            lev16 = jnp.take(c16_p, bidx, axis=1)
            pred16 = jnp.take_along_axis(
                allp16, mode16[:, :, None, None], axis=2
            )[:, :, 0]
            rec16 = _int_recon(lev16, pred16, dq, maxvals, C16)

            for s, (dy, dx) in enumerate(SUB_OFF):
                base8 = jnp.where(vld, base16 + dy * WB + dx, SZ)
                blk8 = base8[:, None] + C8.blk_offs[None, :]
                refs8 = jnp.take(buf, base8[:, None] + C8.ref_offs[None, :], axis=1)
                allp8 = _predict_all(refs8, jnp.take(reff, blk8, axis=1), C8)
                mode8 = jnp.take(m8_p[:, :, s], bidx, axis=1)
                lev8 = jnp.take(c8_p[:, :, s], bidx, axis=1)
                pred8 = jnp.take_along_axis(
                    allp8, mode8[:, :, None, None], axis=2
                )[:, :, 0]
                rec8 = _int_recon(lev8, pred8, dq, maxvals, C8)
                buf = buf.at[:, blk8].set(rec8)

            cur = jnp.take(buf, blk16, axis=1)
            merged = jnp.where(spl[:, :, None] != 0, cur, rec16)
            buf = buf.at[:, blk16].set(merged)
            return buf, None

        xs = (jnp.asarray(by_tab), jnp.asarray(bx_tab), jnp.asarray(valid_tab))
        buf, _ = jax.lax.scan(body, buf, xs)
        rec = buf[:, :SZ].reshape(P, HB, WB)[:, 1 : 1 + H, 1 : 1 + W]
        if deblock:
            rec = _deblock(rec, qps, maxvals)
        return rec

    return jax.jit(run)


# ---------------------------------------------------------------------------
# plane API (encode batches of same-shape planes together; the wavefront is
# vectorized over the plane axis)

FLAG_INTER = 1
FLAG_DEBLOCK = 2


def _round_int_plane(plane, occ):
    """Occupancy-aware background fill + integer rounding, on device."""
    x = jnp.asarray(plane).astype(jnp.float32)
    if occ is not None:
        x = padding.push_pull_fill(x, jnp.asarray(occ))
    return jnp.round(x).astype(jnp.int32)


def _pad_to_cu(x, mode="edge"):
    """Pad (P, H, W) up to CU multiples by edge replication."""
    P, H, W = x.shape
    Hp = -(-H // CU) * CU
    Wp = -(-W // CU) * CU
    if (Hp, Wp) == (H, W):
        return x
    return jnp.pad(x, ((0, 0), (0, Hp - H), (0, Wp - W)), mode=mode)


def encode_planes(
    planes,
    qps,
    maxvals,
    refs=None,
    occ=None,
    deblock: bool = True,
    weight=None,
) -> Tuple[bytes, jax.Array]:
    """Encode a (P, H, W) stack of integer planes sharing one shape.

    qps/maxvals: per-plane int lists.  refs: optional (P, H, W) int32
    previous reconstructions (enables the zero-MV inter mode).  occ:
    optional (H, W) occupancy for background fill.  weight: optional
    (H, W) 0/1 distortion-relevance mask (pixels that generate points —
    normally the DECODED occupancy); background blocks get ~free
    distortion in the RD mode decision.  Returns
    (payload bytes, (P, H, W) int32 reconstruction ON DEVICE)."""
    if isinstance(planes, (list, tuple)):
        planes = jnp.stack([jnp.asarray(p) for p in planes])
    else:
        planes = jnp.asarray(planes)
        if planes.ndim == 2:
            planes = planes[None]
    P, H, W = planes.shape
    assert H % SUB == 0 and W % SUB == 0, (H, W)
    if occ is not None:
        planes = jax.vmap(lambda p: _round_int_plane(p, occ))(planes)
    else:
        planes = planes.astype(jnp.int32)
    has_ref = refs is not None
    refs_a = (
        jnp.asarray(refs).astype(jnp.int32)
        if has_ref
        else jnp.zeros((P, H, W), jnp.int32)
    )
    if weight is None:
        w_a = jnp.ones((P, H, W), jnp.int32)
    else:
        w_a = jnp.asarray(weight)
        if w_a.ndim == 2:
            w_a = jnp.broadcast_to(w_a[None] != 0, (P, H, W))
        w_a = w_a.astype(jnp.int32)
    planes_p = _pad_to_cu(planes)
    refs_p = _pad_to_cu(refs_a)
    w_p = _pad_to_cu(w_a, mode="constant")
    _, Hp, Wp = planes_p.shape
    qps_a = jnp.asarray(np.asarray(qps, np.int32))
    mv_a = jnp.asarray(np.asarray(maxvals, np.int32))
    fn = _build_encode(P, Hp, Wp, deblock)
    split, m16, c16, m8, c8, rec = fn(
        planes_p, qps_a, refs_p, jnp.asarray(bool(has_ref)), mv_a, w_p
    )
    for a in (split, m16, c16, m8, c8):
        a.copy_to_host_async()
    split_h, m16_h, c16_h = np.asarray(split), np.asarray(m16), np.asarray(c16)
    m8_h, c8_h = np.asarray(m8), np.asarray(c8)
    nby, nbx = Hp // CU, Wp // CU
    flags = (FLAG_INTER if has_ref else 0) | (FLAG_DEBLOCK if deblock else 0)
    out = bytearray()
    out += struct.pack("<HHBB", H, W, P, flags)
    for p in range(P):
        blob = entropy.encode_hevc_plane(
            nby, nbx, split_h[p], m16_h[p], c16_h[p], m8_h[p], c8_h[p]
        )
        out += struct.pack("<BHI", int(qps[p]), int(maxvals[p]), len(blob))
        out += blob
    return bytes(out), rec[:, :H, :W]


def decode_planes(payload: bytes, refs=None) -> jax.Array:
    """Inverse of encode_planes: payload -> (P, H, W) int32 recon ON DEVICE."""
    H, W, P, flags = struct.unpack("<HHBB", payload[:6])
    pos = 6
    Hp = -(-H // CU) * CU
    Wp = -(-W // CU) * CU
    nby, nbx = Hp // CU, Wp // CU
    nb = nby * nbx
    qps = np.zeros(P, np.int32)
    maxvals = np.zeros(P, np.int32)
    split = np.zeros((P, nb), np.int32)
    m16 = np.zeros((P, nb), np.int32)
    c16 = np.zeros((P, nb, CU * CU), np.int32)
    m8 = np.zeros((P, nb, 4), np.int32)
    c8 = np.zeros((P, nb, 4, SUB * SUB), np.int32)
    for p in range(P):
        qps[p], maxvals[p], ln = struct.unpack("<BHI", payload[pos : pos + 7])
        pos += 7
        s_, a_, b_, c_, d_ = entropy.decode_hevc_plane(
            payload[pos : pos + ln], nby, nbx
        )
        pos += ln
        split[p], m16[p], c16[p], m8[p], c8[p] = s_, a_, b_, c_, d_
    if flags & FLAG_INTER:
        refs_a = _pad_to_cu(jnp.asarray(refs).astype(jnp.int32))
    else:
        refs_a = jnp.zeros((P, Hp, Wp), jnp.int32)
    fn = _build_decode(P, Hp, Wp, bool(flags & FLAG_DEBLOCK))
    rec = fn(
        jnp.asarray(split), jnp.asarray(m16), jnp.asarray(c16),
        jnp.asarray(m8), jnp.asarray(c8), jnp.asarray(qps),
        refs_a, jnp.asarray(maxvals),
    )
    return rec[:, :H, :W]


# ---------------------------------------------------------------------------
# RGB 4:2:0 layer

def _downsample_420_int(plane):
    """Integer-exact 2x2 mean (rounded): chroma subsampling both sides."""
    h, w = plane.shape
    a = plane.reshape(h // 2, 2, w // 2, 2).astype(jnp.int32)
    return (a.sum((1, 3)) + 2) >> 2


@jax.jit
def _rgb_to_int_planes(attr, occ):
    from vpcc_tpu.video import color

    ycc = color.rgb_to_ycbcr(jnp.asarray(attr))
    y, cb, cr = ycc[..., 0], ycc[..., 1], ycc[..., 2]
    if occ is not None:
        y = padding.push_pull_fill(y, occ)
        cb = padding.push_pull_fill(cb, occ)
        cr = padding.push_pull_fill(cr, occ)
    y = jnp.clip(jnp.round(y), 0, 255).astype(jnp.int32)
    cb = _downsample_420_int(jnp.clip(jnp.round(cb), 0, 255).astype(jnp.int32))
    cr = _downsample_420_int(jnp.clip(jnp.round(cr), 0, 255).astype(jnp.int32))
    return y, cb, cr


@jax.jit
def _int_planes_to_rgb(y, cb, cr):
    from vpcc_tpu.video import color

    up = lambda p: jnp.repeat(jnp.repeat(p, 2, 0), 2, 1)
    ycc = jnp.stack(
        [y.astype(jnp.float32),
         up(cb).astype(jnp.float32),
         up(cr).astype(jnp.float32)],
        axis=-1,
    )
    return color.ycbcr_to_rgb(ycc)


def rgb_refs(rgb):
    """Deterministic RGB -> ((1,H,W) luma, (2,H/2,W/2) chroma) int planes,
    used to derive inter-layer prediction references from a decoded RGB
    frame identically on encoder and decoder."""
    y, cb, cr = _rgb_to_int_planes(jnp.asarray(rgb), None)
    return y[None], jnp.stack([cb, cr])


def encode_rgb(attr, qp: int, occ=None, refs=None, deblock: bool = True,
               weight=None):
    """(H, W, 3) RGB -> (payload, decoded RGB uint8 ON DEVICE, refs).
    refs = (y_recon (1,H,W), c_recon (2,H/2,W/2)) from the previous frame
    enables the zero-MV inter mode.  weight: (H, W) relevance mask for
    occupancy-weighted RDO (see encode_planes)."""
    occ_d = None if occ is None else jnp.asarray(occ)
    y, cb, cr = _rgb_to_int_planes(jnp.asarray(attr), occ_d)
    cqp = min(qp + 3, 51)
    ry = rc = None
    if refs is not None and refs[0].shape[1:] == y.shape:
        ry, rc = refs
    wy = wc = None
    if weight is not None:
        wy = jnp.asarray(weight).astype(jnp.int32)
        h, w = wy.shape
        wc = wy.reshape(h // 2, 2, w // 2, 2).max((1, 3))
    py, recy = encode_planes(y[None], [qp], [255], refs=ry, deblock=deblock,
                             weight=wy)
    pc, recc = encode_planes(
        jnp.stack([cb, cr]), [cqp, cqp], [255, 255], refs=rc, deblock=deblock,
        weight=wc,
    )
    payload = struct.pack("<II", len(py), len(pc)) + py + pc
    rgb = _int_planes_to_rgb(recy[0], recc[0], recc[1])
    return payload, rgb, (recy, recc)


def decode_rgb(payload: bytes, refs=None):
    ly, lc = struct.unpack("<II", payload[:8])
    py = payload[8 : 8 + ly]
    pc = payload[8 + ly : 8 + ly + lc]
    ry = rc = None
    if refs is not None:
        ry, rc = refs
    recy = decode_planes(py, refs=ry)
    recc = decode_planes(pc, refs=rc)
    rgb = _int_planes_to_rgb(recy[0], recc[0], recc[1])
    return rgb, (recy, recc)
