"""TPU-native HEVC-class video codec (wavefront intra + zero-MV inter).

Replaces the reference's external HM encode/decode path for the geometry and
attribute substreams (reference: PCCVideoEncoder::compress,
source/lib/PccLibEncoder/source/PCCVideoEncoder.cpp:282-440 shelling out to
the patched HM of dependencies/cmake/hm.cmake — SURVEY.md §3.1 marks that
subprocess as the hottest stage of TMC2).

TPU-first architecture (not an HM port):

* The raster-scan intra dependency becomes a **wavefront lax.scan** over
  diagonals d = 2*by + bx (WPP order).  Every step processes one diagonal:
  all blocks on it are independent, so the whole diagonal is one batched
  program — gather reference samples, predict ALL 36 modes at once (35
  HEVC intra modes + zero-MV inter), transform, quantize, RD-select, and
  reconstruct, then scatter into the frame buffer.  No per-block Python,
  no per-block dispatch: one compiled scan per plane shape.
* All 35 intra predictions are **2-tap static gathers** over the (4N+1)
  reference vector (tables in hevc_tables.py), so mode evaluation is a
  single gather + multiply-add over a (blocks, 35, N, N) tensor.
* RD optimization runs in the transform domain (orthonormal forward DCT in
  f32 on the MXU; distortion = sum (c - level*qstep)^2, which equals pixel
  SSE by Parseval) — only the chosen mode pays an inverse transform.
* The reconstruction path (dequant + inverse transform + prediction add +
  clip) is **pure int32**, bit-exact and platform-independent: encoder-side
  recon == decoder recon on TPU or CPU, which the V-PCC pipeline relies on
  for encoder/decoder parity.
* Entropy coding is a host-side context-adaptive binary arithmetic coder
  (native/entropy.cpp: MPM mode coding, last-position + significance +
  greater1/greater2 coefficient syntax), mirroring HM's CABAC role per the
  SURVEY.md §7.5 wavefront split.

A deblocking filter (HEVC-style single-pixel normal filter with spec
beta/tc thresholds) runs identically on both sides after reconstruction.
"""

from __future__ import annotations

import functools
import struct
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vpcc_tpu.ops import padding
from vpcc_tpu.video import entropy
from vpcc_tpu.video import hevc_tables as tab

N = 8
N2 = N * N
NREF = 4 * N + 1
S1, S2 = 11, 10  # inverse-transform downshifts (total 21 = 18 + log2(8))

_MODE_BITS = np.full(tab.N_MODES, 5.0, np.float32)
_MODE_BITS[0] = _MODE_BITS[1] = 3.0   # planar/DC: usually MPM-coded
_MODE_BITS[tab.MODE_INTER] = 2.0      # inter flag


# ---------------------------------------------------------------------------
# device core


def _predict_all(refs, ref_blocks, consts):
    """refs: (P, B, 4N+1) int32; ref_blocks: (P, B, N2) int32 (co-located
    inter prediction).  Returns (P, B, 36, N2) int32 predictions."""
    idx0, idx1, w0, w1, pl_left, pl_top, pl_tr, pl_bl = consts
    ang = (w0 * refs[:, :, idx0] + w1 * refs[:, :, idx1] + 16) >> 5
    # DC: mean of the N top + N left references
    dcsum = refs[:, :, 1 : N + 1].sum(-1) + refs[:, :, 2 * N + 1 : 3 * N + 1].sum(-1)
    dc = (dcsum + N) >> 4  # log2(N)+1
    dc = jnp.broadcast_to(dc[:, :, None, None, None], ang.shape[:2] + (1, N, N))
    # planar
    xs = jnp.arange(N, dtype=jnp.int32)
    left_y = refs[:, :, pl_left]   # (P, B, N) = L[y]
    top_x = refs[:, :, pl_top]     # (P, B, N) = T[x]
    tr = refs[:, :, pl_tr]         # (P, B)
    bl = refs[:, :, pl_bl]
    planar = (
        (N - 1 - xs)[None, None, None, :] * left_y[:, :, :, None]
        + (xs + 1)[None, None, None, :] * tr[:, :, None, None]
        + (N - 1 - xs)[None, None, :, None] * top_x[:, :, None, :]
        + (xs + 1)[None, None, :, None] * bl[:, :, None, None]
        + N
    ) >> 4
    intra = jnp.concatenate(
        [planar[:, :, None], dc, ang], axis=2
    )  # (P, B, 35, N, N)
    inter = ref_blocks.reshape(ref_blocks.shape[:2] + (1, N, N))
    allp = jnp.concatenate([intra, inter], axis=2)
    return allp.reshape(allp.shape[:2] + (tab.N_MODES, N2))


def _int_recon(levels, pred, dq, maxval, T_int):
    """Bit-exact int32 reconstruction: dequant -> integer inverse transform
    -> add prediction -> clip.  levels/pred: (P, B, N2); dq/maxval: (P,)."""
    d = levels.reshape(levels.shape[:2] + (N, N)) * dq[:, None, None, None]
    d = jnp.clip(d, -(1 << 19), (1 << 19) - 1)
    tt = jnp.asarray(T_int.T)
    t = jnp.asarray(T_int)
    e = (jnp.einsum("ij,pbjk->pbik", tt, d) + (1 << (S1 - 1))) >> S1
    r = (jnp.einsum("pbik,kj->pbij", e, t) + (1 << (S2 - 1))) >> S2
    rec = pred + r.reshape(levels.shape[:2] + (N2,))
    return jnp.clip(rec, 0, maxval[:, None, None])


def _deblock(rec, qps, maxvals):
    """HEVC-style normal deblocking filter on all N-aligned block edges
    (boundary strength 2: everything here is intra / freshly coded).
    Integer-exact; applied identically by encoder and decoder."""
    P, H, W = rec.shape
    tc8 = jnp.asarray(tab.TC_TAB)[jnp.clip(qps + 2, 0, 53)]
    scale = (maxvals + 1) // 256
    tc = (tc8 * jnp.maximum(scale, 1))[:, None, None]

    def filter_axis(v):
        # vertical edges of (P, h, w): between col k*N-1 and k*N
        _, h, w = v.shape
        a = v.reshape(P, h, w // N, N)
        p1 = a[:, :, :-1, N - 2]
        p0 = a[:, :, :-1, N - 1]
        q0 = a[:, :, 1:, 0]
        q1 = a[:, :, 1:, 1]
        dlt = (9 * (q0 - p0) - 3 * (q1 - p1) + 8) >> 4
        on = jnp.abs(dlt) < 10 * tc
        d = jnp.clip(dlt, -tc, tc)
        mv = maxvals[:, None, None]
        p0n = jnp.where(on, jnp.clip(p0 + d, 0, mv), p0)
        q0n = jnp.where(on, jnp.clip(q0 - d, 0, mv), q0)
        a = a.at[:, :, :-1, N - 1].set(p0n)
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
    nby, nbx = H // N, W // N
    nb = nby * nbx
    HB, WB = H + N + 2, W + N + 2
    SZ = HB * WB
    by_tab, bx_tab, valid_tab = tab.wavefront_schedule(nby, nbx)
    idx0, idx1, w0, w1 = tab.angular_taps(N)
    pl_left, pl_top, pl_tr, pl_bl = tab.planar_taps(N)
    consts = (
        jnp.asarray(idx0), jnp.asarray(idx1), jnp.asarray(w0), jnp.asarray(w1),
        jnp.asarray(pl_left), jnp.asarray(pl_top), pl_tr, pl_bl,
    )
    ref_offs = np.concatenate(
        [[-WB - 1], np.arange(2 * N) - WB, np.arange(2 * N) * WB - 1]
    ).astype(np.int32)
    blk_offs = (np.arange(N)[:, None] * WB + np.arange(N)[None, :]).reshape(-1)
    T_int = tab.dct_int(N)
    Cf = tab.dct_orthonormal(N).astype(np.float32)
    zz = jnp.asarray(tab.zigzag(N))
    dq_tab = jnp.asarray(tab.DQ64)
    lam_tab = jnp.asarray(tab.LAMBDA)
    mode_bits = jnp.asarray(_MODE_BITS)

    def run(planes, qps, refs, has_ref, maxvals, weights):
        src = _pad_flat(planes, HB, WB, N2)
        reff = _pad_flat(refs, HB, WB, N2)
        wmap = _pad_flat(weights, HB, WB, N2)
        init = ((maxvals + 1) // 2)[:, None]
        buf = jnp.broadcast_to(init, (P, SZ + N2)).astype(jnp.int32)
        dq = dq_tab[jnp.clip(qps, 0, 51)]
        qstep = dq.astype(jnp.float32) / 64.0
        inv_q = 1.0 / qstep
        lam = lam_tab[jnp.clip(qps, 0, 51)]
        inter_pen = jnp.where(has_ref, 0.0, jnp.float32(1e30))
        cf = jnp.asarray(Cf)

        modes_out = jnp.zeros((P, nb + 1), jnp.int32)
        coeffs_out = jnp.zeros((P, nb + 1, N2), jnp.int32)

        def body(carry, xs):
            buf, modes_out, coeffs_out = carry
            by, bx, vld = xs
            base = (by * N + 1) * WB + (bx * N + 1)
            base = jnp.where(vld, base, SZ)
            ref_idx = base[:, None] + jnp.asarray(ref_offs)[None, :]
            blk_idx = base[:, None] + jnp.asarray(blk_offs)[None, :]
            refs_v = jnp.take(buf, ref_idx, axis=1)          # (P, B, 4N+1)
            src_v = jnp.take(src, blk_idx, axis=1)           # (P, B, N2)
            refblk = jnp.take(reff, blk_idx, axis=1)
            # per-block distortion weight: fraction of pixels that will
            # actually generate 3D points (decoded-occupancy mask) — V-PCC
            # specific RDO: background fill distortion is nearly free
            wblk = jnp.maximum(
                jnp.take(wmap, blk_idx, axis=1).astype(jnp.float32).mean(-1),
                0.04,
            )
            allp = _predict_all(refs_v, refblk, consts)       # (P, B, 36, N2)

            resid = (src_v[:, :, None, :] - allp).astype(jnp.float32)
            rs = resid.reshape(resid.shape[:2] + (tab.N_MODES, N, N))
            c = jnp.einsum("ij,pbmjk,lk->pbmil", cf, rs, cf)
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
            mode = jnp.argmin(cost, axis=2)                   # (P, B)

            levels = (jnp.sign(c) * lv).astype(jnp.int32)
            levels = levels.reshape(levels.shape[:2] + (tab.N_MODES, N2))
            msel = mode[:, :, None, None]
            lev_c = jnp.take_along_axis(levels, msel, axis=2)[:, :, 0]
            pred_c = jnp.take_along_axis(allp, msel, axis=2)[:, :, 0]
            rec = _int_recon(lev_c, pred_c, dq, maxvals, T_int)

            buf = buf.at[:, blk_idx].set(rec)
            bidx = jnp.where(vld, by * nbx + bx, nb)
            modes_out = modes_out.at[:, bidx].set(mode)
            coeffs_out = coeffs_out.at[:, bidx].set(lev_c[:, :, zz])
            return (buf, modes_out, coeffs_out), None

        xs = (jnp.asarray(by_tab), jnp.asarray(bx_tab), jnp.asarray(valid_tab))
        (buf, modes_out, coeffs_out), _ = jax.lax.scan(
            body, (buf, modes_out, coeffs_out), xs
        )
        rec = buf[:, :SZ].reshape(P, HB, WB)[:, 1 : 1 + H, 1 : 1 + W]
        if deblock:
            rec = _deblock(rec, qps, maxvals)
        return modes_out[:, :nb], coeffs_out[:, :nb], rec

    return jax.jit(run)


@functools.lru_cache(maxsize=32)
def _build_decode(P: int, H: int, W: int, deblock: bool):
    nby, nbx = H // N, W // N
    nb = nby * nbx
    HB, WB = H + N + 2, W + N + 2
    SZ = HB * WB
    by_tab, bx_tab, valid_tab = tab.wavefront_schedule(nby, nbx)
    idx0, idx1, w0, w1 = tab.angular_taps(N)
    pl_left, pl_top, pl_tr, pl_bl = tab.planar_taps(N)
    consts = (
        jnp.asarray(idx0), jnp.asarray(idx1), jnp.asarray(w0), jnp.asarray(w1),
        jnp.asarray(pl_left), jnp.asarray(pl_top), pl_tr, pl_bl,
    )
    ref_offs = np.concatenate(
        [[-WB - 1], np.arange(2 * N) - WB, np.arange(2 * N) * WB - 1]
    ).astype(np.int32)
    blk_offs = (np.arange(N)[:, None] * WB + np.arange(N)[None, :]).reshape(-1)
    T_int = tab.dct_int(N)
    inv_zz = jnp.asarray(np.argsort(tab.zigzag(N)).astype(np.int32))
    dq_tab = jnp.asarray(tab.DQ64)

    def run(modes, coeffs_zz, qps, refs, maxvals):
        reff = _pad_flat(refs, HB, WB, N2)
        init = ((maxvals + 1) // 2)[:, None]
        buf = jnp.broadcast_to(init, (P, SZ + N2)).astype(jnp.int32)
        dq = dq_tab[jnp.clip(qps, 0, 51)]
        levels_all = coeffs_zz[:, :, inv_zz]                  # (P, nb, N2)
        # pad one dump row so invalid slots index harmlessly
        modes_p = jnp.concatenate([modes, jnp.zeros((P, 1), jnp.int32)], 1)
        levels_p = jnp.concatenate(
            [levels_all, jnp.zeros((P, 1, N2), jnp.int32)], 1
        )

        def body(buf, xs):
            by, bx, vld = xs
            base = (by * N + 1) * WB + (bx * N + 1)
            base = jnp.where(vld, base, SZ)
            bidx = jnp.where(vld, by * nbx + bx, nb)
            ref_idx = base[:, None] + jnp.asarray(ref_offs)[None, :]
            blk_idx = base[:, None] + jnp.asarray(blk_offs)[None, :]
            refs_v = jnp.take(buf, ref_idx, axis=1)
            refblk = jnp.take(reff, blk_idx, axis=1)
            allp = _predict_all(refs_v, refblk, consts)
            mode = jnp.take(modes_p, bidx, axis=1)            # (P, B)
            lev = jnp.take(levels_p, bidx, axis=1)            # (P, B, N2)
            pred = jnp.take_along_axis(allp, mode[:, :, None, None], axis=2)[:, :, 0]
            rec = _int_recon(lev, pred, dq, maxvals, T_int)
            buf = buf.at[:, blk_idx].set(rec)
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
    assert H % N == 0 and W % N == 0, (H, W)
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
    qps_a = jnp.asarray(np.asarray(qps, np.int32))
    mv_a = jnp.asarray(np.asarray(maxvals, np.int32))
    if weight is None:
        w_a = jnp.ones((P, H, W), jnp.int32)
    else:
        w_a = jnp.asarray(weight)
        if w_a.ndim == 2:
            w_a = jnp.broadcast_to(w_a[None] != 0, (P, H, W))
        w_a = w_a.astype(jnp.int32)
    fn = _build_encode(P, H, W, deblock)
    modes, coeffs, rec = fn(
        planes, qps_a, refs_a, jnp.asarray(bool(has_ref)), mv_a, w_a
    )
    modes.copy_to_host_async()
    coeffs.copy_to_host_async()
    modes_h = np.asarray(modes)
    coeffs_h = np.asarray(coeffs)
    nby, nbx = H // N, W // N
    flags = (FLAG_INTER if has_ref else 0) | (FLAG_DEBLOCK if deblock else 0)
    out = bytearray()
    out += struct.pack("<HHBB", H, W, P, flags)
    for p in range(P):
        blob = entropy.encode_hevc_plane(
            modes_h[p].reshape(nby, nbx), coeffs_h[p]
        )
        out += struct.pack("<BHI", int(qps[p]), int(maxvals[p]), len(blob))
        out += blob
    return bytes(out), rec


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


def decode_planes(payload: bytes, refs=None) -> jax.Array:
    """Inverse of encode_planes: payload -> (P, H, W) int32 recon ON DEVICE."""
    H, W, P, flags = struct.unpack("<HHBB", payload[:6])
    pos = 6
    nby, nbx = H // N, W // N
    nb = nby * nbx
    qps = np.zeros(P, np.int32)
    maxvals = np.zeros(P, np.int32)
    modes = np.zeros((P, nb), np.int32)
    coeffs = np.zeros((P, nb, N2), np.int32)
    for p in range(P):
        qps[p], maxvals[p], ln = struct.unpack("<BHI", payload[pos : pos + 7])
        pos += 7
        m, c = entropy.decode_hevc_plane(payload[pos : pos + ln], nby, nbx)
        pos += ln
        modes[p] = m.reshape(-1)
        coeffs[p] = c
    if flags & FLAG_INTER:
        refs_a = jnp.asarray(refs).astype(jnp.int32)
    else:
        refs_a = jnp.zeros((P, H, W), jnp.int32)
    fn = _build_decode(P, H, W, bool(flags & FLAG_DEBLOCK))
    return fn(
        jnp.asarray(modes), jnp.asarray(coeffs), jnp.asarray(qps),
        refs_a, jnp.asarray(maxvals),
    )
