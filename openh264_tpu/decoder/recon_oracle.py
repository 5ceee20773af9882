"""Numpy sequential reconstruction oracle (bit-exact truth).

Consumes FrameSymbols and produces decoded planes, following the spec
sample-by-sample. This is the correctness anchor for the batched JAX
wavefront recon in ops/ — same role the reference's C fallbacks play for
its SIMD (SURVEY.md §1). Parity: rec_mb.cpp RecI16x16Mb:179 /
RecI4x4Mb:117 / RecChroma:1057 and decode_slice.cpp:334
WelsTargetMbConstruction.
"""

from __future__ import annotations

import numpy as np

from ..oracle import intra as oi
from ..oracle.transform import idct4x4_add
from .framedata import (FrameSymbols, MB_I4x4, MB_I16x16, MB_IPCM, MB_I8x8,
                        ZSCAN_TO_RASTER, INTRA_CLASSES)


class ReconState:
    """Decoded picture planes + per-block decode bookkeeping."""

    def __init__(self, fs: FrameSymbols):
        self.fs = fs
        self.w = fs.mb_w * 16
        self.h = fs.mb_h * 16
        self.y = np.zeros((self.h, self.w), dtype=np.uint8)
        self.u = np.zeros((self.h // 2, self.w // 2), dtype=np.uint8)
        self.v = np.zeros((self.h // 2, self.w // 2), dtype=np.uint8)


def _intra_avail(fs: FrameSymbols, cur_idx: int, mbx: int, mby: int,
                 constrained: bool) -> bool:
    """Is MB (mbx,mby) available for intra prediction from MB cur_idx?"""
    if mbx < 0 or mby < 0 or mbx >= fs.mb_w or mby >= fs.mb_h:
        return False
    idx = mby * fs.mb_w + mbx
    if fs.slice_id[idx] != fs.slice_id[cur_idx]:
        return False
    if constrained and fs.mb_type[idx] not in INTRA_CLASSES:
        return False
    return True


def recon_intra_frame(fs: FrameSymbols, constrained: bool = False) -> ReconState:
    return recon_frame(fs, {}, constrained)


def recon_frame(fs: FrameSymbols, ref_pics: dict, constrained: bool = False) -> ReconState:
    """Full-frame reconstruction. ref_pics: pic_id -> Picture (planes)."""
    st = ReconState(fs)
    correct = getattr(fs, "mb_correct", None)
    for mby in range(fs.mb_h):
        for mbx in range(fs.mb_w):
            idx = mby * fs.mb_w + mbx
            if correct is not None and not correct[idx]:
                continue  # un-decoded/aborted MB: EC fills it later
            t = fs.mb_type[idx]
            if t in INTRA_CLASSES:
                recon_intra_mb(st, idx, constrained)
            elif t >= 0:
                recon_inter_mb(st, idx, ref_pics)
    return st


def _apply_biweight(wp, y0p, u0p, v0p, y1p, u1p, v1p, r0, r1):
    """BiWeightPrediction (rec_mb.cpp:366): explicit (idc==1) takes
    per-list weights+offsets; implicit (idc==2) takes the POC table."""
    from ..oracle.mc import biweight_pred
    from .wpred import WP_B_EXPLICIT, implicit_weights

    if wp.mode == WP_B_EXPLICIT:
        lw0, lo0 = wp.luma_w(0, r0)
        lw1, lo1 = wp.luma_w(1, r1)
        py = biweight_pred(y0p, y1p, lw0, lw1, lo0, lo1, wp.luma_denom)
        cw00, co00 = wp.chroma_w(0, r0, 0)
        cw01, co01 = wp.chroma_w(1, r1, 0)
        pu = biweight_pred(u0p, u1p, cw00, cw01, co00, co01, wp.chroma_denom)
        cw10, co10 = wp.chroma_w(0, r0, 1)
        cw11, co11 = wp.chroma_w(1, r1, 1)
        pv = biweight_pred(v0p, v1p, cw10, cw11, co10, co11, wp.chroma_denom)
    else:
        w0, w1 = implicit_weights(wp, r0, r1)
        py = biweight_pred(y0p, y1p, w0, w1, 0, 0, 5)
        pu = biweight_pred(u0p, u1p, w0, w1, 0, 0, 5)
        pv = biweight_pred(v0p, v1p, w0, w1, 0, 0, 5)
    return py, pu, pv


def recon_inter_mb(st: ReconState, idx: int, ref_pics: dict) -> None:
    """Inter prediction + residual for one MB, per 4x4 block.

    Per-4x4 MC is bit-identical to per-partition MC (the 6-tap/bilinear
    filters are position-local), mirroring rec_mb.cpp GetInterPred:462.
    """
    from ..oracle.mc import bi_avg, mc_chroma, mc_luma, weight_pred
    from .wpred import WP_B_EXPLICIT, WP_B_IMPLICIT, WP_P_EXPLICIT

    fs = st.fs
    mbx, mby = idx % fs.mb_w, idx // fs.mb_w
    x0, y0 = mbx * 16, mby * 16
    cx0, cy0 = mbx * 8, mby * 8
    from .framedata import MB_B16x8, MB_B8x16
    mt = int(fs.mb_type[idx])
    wp = None
    if fs.wp_by_slice is not None:
        sid = int(fs.slice_id[idx])
        if 0 <= sid < len(fs.wp_by_slice):
            w = fs.wp_by_slice[sid]
            wp = w if w.mode else None
    pred_y = np.zeros((16, 16), np.uint8)
    for blk in range(16):
        bx, by = blk % 4, blk // 4
        q = (by // 2) * 2 + (bx // 2)
        pm = int(fs.pred_mode[idx, q])
        # Reference-compat: openh264's GetInterBPred never truly averages
        # BI partitions of B 16x8/8x16 MBs (rec_mb.cpp:739-831): for the
        # first partition the L1 MC overwrites the L0 prediction in place
        # before a self-average, and for the second partition a doubled
        # destination offset sends the average outside the partition
        # (later overwritten). Net effect: part0 BI -> L1-only (still
        # passed twice through BiWeightPrediction when weighting is on),
        # part1 BI -> plain unweighted L0. The conformance goldens and
        # the reference's own SHA-1 table embody this, so we replicate
        # it for bit-exactness.
        quirk = None  # None | "self-bi" | "plain-l0"
        if pm == 2 and mt in (MB_B16x8, MB_B8x16):
            second = (by >= 2) if mt == MB_B16x8 else (bx >= 2)
            quirk = "plain-l0" if second else "self-bi"
            pm = 0 if second else 1
        preds_y = []
        preds_u = []
        preds_v = []
        for lx in ((0,) if pm == 0 else (1,) if pm == 1 else (0, 1)):
            pid = int(fs.ref_pic[idx, lx, q])
            ref = ref_pics[pid]
            mvx, mvy = int(fs.mv[idx, lx, blk, 0]), int(fs.mv[idx, lx, blk, 1])
            preds_y.append(mc_luma(ref.y, mvx, mvy, x0 + bx * 4, y0 + by * 4, 4, 4))
            preds_u.append(mc_chroma(ref.u, mvx, mvy, cx0 + bx * 2, cy0 + by * 2, 2, 2))
            preds_v.append(mc_chroma(ref.v, mvx, mvy, cx0 + bx * 2, cy0 + by * 2, 2, 2))
        if len(preds_y) == 1:
            py, pu, pv = preds_y[0], preds_u[0], preds_v[0]
            if wp is not None and quirk == "self-bi" and \
                    wp.mode in (WP_B_EXPLICIT, WP_B_IMPLICIT):
                # BiWeightPrediction applied with both inputs = the L1 MC
                r0 = int(fs.refidx[idx, 0, q])
                r1 = int(fs.refidx[idx, 1, q])
                py, pu, pv = _apply_biweight(wp, py, pu, pv, py, pu, pv,
                                             r0, r1)
            elif wp is not None and quirk is None and \
                    wp.mode in (WP_P_EXPLICIT, WP_B_EXPLICIT):
                r = int(fs.refidx[idx, pm, q])
                d, dc = wp.luma_denom, wp.chroma_denom
                lw, lo = wp.luma_w(pm, r)
                py = weight_pred(py, lw, lo, d)
                cw0, co0 = wp.chroma_w(pm, r, 0)
                pu = weight_pred(pu, cw0, co0, dc)
                cw1, co1 = wp.chroma_w(pm, r, 1)
                pv = weight_pred(pv, cw1, co1, dc)
        else:
            if wp is not None and wp.mode in (WP_B_EXPLICIT, WP_B_IMPLICIT):
                r0 = int(fs.refidx[idx, 0, q])
                r1 = int(fs.refidx[idx, 1, q])
                py, pu, pv = _apply_biweight(
                    wp, preds_y[0], preds_u[0], preds_v[0],
                    preds_y[1], preds_u[1], preds_v[1], r0, r1)
            else:
                py = bi_avg(preds_y[0], preds_y[1])
                pu = bi_avg(preds_u[0], preds_u[1])
                pv = bi_avg(preds_v[0], preds_v[1])
        pred_y[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4] = py
        # accumulate the 8x8 chroma prediction; residual is added per
        # chroma 4x4 block after the loop (IDCT operates on 4x4)
        st._cpred_u = getattr(st, "_cpred_u", np.zeros((8, 8), np.uint8))
        st._cpred_v = getattr(st, "_cpred_v", np.zeros((8, 8), np.uint8))
        st._cpred_u[by * 2:by * 2 + 2, bx * 2:bx * 2 + 2] = pu
        st._cpred_v[by * 2:by * 2 + 2, bx * 2:bx * 2 + 2] = pv
    # luma residual add: 4x4 or 8x8 transform
    if fs.transform8[idx]:
        from ..oracle.intra8 import idct8x8_add
        fs.ensure_coeffs8()
        for blk8 in range(4):
            b8x, b8y = (blk8 % 2) * 8, (blk8 // 2) * 8
            p8 = pred_y[b8y:b8y + 8, b8x:b8x + 8]
            coef = fs.coeffs8[idx, blk8]
            out = idct8x8_add(p8, coef) if np.any(coef) else p8
            st.y[y0 + b8y:y0 + b8y + 8, x0 + b8x:x0 + b8x + 8] = out
    else:
        # all 16 luma blocks in one batched IDCT call
        coefs = fs.coeffs_l[idx].reshape(4, 4, 4, 4)
        pb = pred_y.reshape(4, 4, 4, 4).transpose(0, 2, 1, 3)
        st.y[y0:y0 + 16, x0:x0 + 16] = idct4x4_add(pb, coefs).transpose(
            0, 2, 1, 3).reshape(16, 16)
    # chroma residual add: both components' 4 blocks in one batch
    for comp, plane, cpred in ((0, st.u, st._cpred_u), (1, st.v, st._cpred_v)):
        coefs = fs.coeffs_c[idx, comp].reshape(2, 2, 4, 4)
        pb = cpred.reshape(2, 4, 2, 4).transpose(0, 2, 1, 3)
        plane[cy0:cy0 + 8, cx0:cx0 + 8] = idct4x4_add(pb, coefs).transpose(
            0, 2, 1, 3).reshape(8, 8)


def recon_intra_mb(st: ReconState, idx: int, constrained: bool) -> None:
    fs = st.fs
    mbx, mby = idx % fs.mb_w, idx // fs.mb_w
    x0, y0 = mbx * 16, mby * 16
    t = fs.mb_type[idx]
    if t == MB_IPCM:
        y, u, v = fs.ipcm[idx]
        st.y[y0:y0 + 16, x0:x0 + 16] = y
        st.u[y0 // 2:y0 // 2 + 8, x0 // 2:x0 // 2 + 8] = u
        st.v[y0 // 2:y0 // 2 + 8, x0 // 2:x0 // 2 + 8] = v
        return

    al = _intra_avail(fs, idx, mbx - 1, mby, constrained)
    at = _intra_avail(fs, idx, mbx, mby - 1, constrained)
    atl = _intra_avail(fs, idx, mbx - 1, mby - 1, constrained)
    atr = _intra_avail(fs, idx, mbx + 1, mby - 1, constrained)

    if t == MB_I16x16:
        top = st.y[y0 - 1, x0:x0 + 16].astype(np.int32) if at else np.zeros(16, np.int32)
        left = st.y[y0:y0 + 16, x0 - 1].astype(np.int32) if al else np.zeros(16, np.int32)
        tl = int(st.y[y0 - 1, x0 - 1]) if atl else 0
        pred = oi.predict_16x16(int(fs.i16_mode[idx]), top, left, tl, at, al)
        # add residual: all 16 blocks in ONE batched IDCT call
        coefs = fs.coeffs_l[idx].reshape(4, 4, 4, 4)         # [by,bx,4,4]
        pb = pred.reshape(4, 4, 4, 4).transpose(0, 2, 1, 3)  # [by,bx,4,4]
        rec = idct4x4_add(pb, coefs)
        st.y[y0:y0 + 16, x0:x0 + 16] = \
            rec.transpose(0, 2, 1, 3).reshape(16, 16)
    elif t == MB_I8x8:
        from ..oracle.intra8 import idct8x8_add, predict_8x8
        fs.ensure_coeffs8()
        for blk8 in range(4):
            b8x, b8y = blk8 % 2, blk8 // 2
            gx, gy = x0 + b8x * 8, y0 + b8y * 8
            b_at = (b8y > 0) or at
            b_al = (b8x > 0) or al
            if blk8 == 0:
                b_atl, b_atr = atl, at
            elif blk8 == 1:
                b_atl, b_atr = at, atr
            elif blk8 == 2:
                b_atl, b_atr = al, True
            else:
                b_atl, b_atr = True, False
            top = np.zeros(16, np.int32)
            if b_at:
                end = min(gx + 16, st.w)
                seg = st.y[gy - 1, gx:end].astype(np.int32)
                top[:len(seg)] = seg
                if len(seg) < 16:
                    top[len(seg):] = seg[-1]
            left = st.y[gy:gy + 8, gx - 1].astype(np.int32) if b_al else np.zeros(8, np.int32)
            tl = int(st.y[gy - 1, gx - 1]) if b_atl else 0
            mode = int(fs.i4_modes[idx, (b8y * 2) * 4 + b8x * 2])
            pred = predict_8x8(mode, top, left, tl, b_at, b_al, b_atl, b_atr)
            coef = fs.coeffs8[idx, blk8]
            if np.any(coef):
                st.y[gy:gy + 8, gx:gx + 8] = idct8x8_add(pred, coef)
            else:
                st.y[gy:gy + 8, gx:gx + 8] = pred
    elif t == MB_I4x4:
        for k in range(16):
            raster = int(ZSCAN_TO_RASTER[k])
            bx, by = raster % 4, raster // 4
            gx, gy = x0 + bx * 4, y0 + by * 4
            # per-block availability
            b_al = (bx > 0) or al
            b_at = (by > 0) or at
            b_atl = (bx > 0 and by > 0) or (bx > 0 and at) or (by > 0 and al) or atl
            # top-right: available if the block above-right is decoded
            # earlier in decode order and its MB is available
            b_atr = _block_tr_avail(fs, idx, mbx, mby, bx, by, k, at, atr,
                                    constrained)
            top = st.y[gy - 1, gx:gx + 8].astype(np.int32) if b_at else np.zeros(8, np.int32)
            if b_at and gx + 8 > st.w:
                top = np.concatenate([st.y[gy - 1, gx:st.w].astype(np.int32),
                                      np.full(gx + 8 - st.w, st.y[gy - 1, st.w - 1], np.int32)])
            left = st.y[gy:gy + 4, gx - 1].astype(np.int32) if b_al else np.zeros(4, np.int32)
            tl = int(st.y[gy - 1, gx - 1]) if b_atl else 0
            mode = int(fs.i4_modes[idx, raster])
            pred = oi.predict_4x4(mode, top, left, tl, b_at, b_al, b_atl, b_atr)
            coef = fs.coeffs_l[idx, raster].reshape(4, 4)
            st.y[gy:gy + 4, gx:gx + 4] = idct4x4_add(pred, coef)

    # chroma
    cx0, cy0 = x0 // 2, y0 // 2
    ctop = st.u[cy0 - 1, cx0:cx0 + 8].astype(np.int32) if at else np.zeros(8, np.int32)
    cleft = st.u[cy0:cy0 + 8, cx0 - 1].astype(np.int32) if al else np.zeros(8, np.int32)
    for comp, plane in ((0, st.u), (1, st.v)):
        top = plane[cy0 - 1, cx0:cx0 + 8].astype(np.int32) if at else np.zeros(8, np.int32)
        left = plane[cy0:cy0 + 8, cx0 - 1].astype(np.int32) if al else np.zeros(8, np.int32)
        tl = int(plane[cy0 - 1, cx0 - 1]) if atl else 0
        pred = oi.predict_chroma(int(fs.chroma_mode[idx]), top, left, tl, at, al)
        for blk in range(4):
            bx, by = blk % 2, blk // 2
            p = pred[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4]
            coef = fs.coeffs_c[idx, comp, blk].reshape(4, 4)
            plane[cy0 + by * 4:cy0 + by * 4 + 4, cx0 + bx * 4:cx0 + bx * 4 + 4] = \
                idct4x4_add(p, coef)


def _block_tr_avail(fs, idx, mbx, mby, bx, by, zscan_k, at, atr, constrained):
    """Top-right availability for 4x4 block (bx,by) in MB (mbx,mby),
    decoded as the zscan_k-th block (§6.4.11.4 via decode order)."""
    gx, gy = mbx * 4 + bx, mby * 4 + by
    tx, ty = gx + 1, gy - 1
    if ty < 0 or tx >= fs.mb_w * 4:
        return False
    if by == 0:
        # neighbor is in the MB row above: top MB (same column) if bx<3,
        # else the top-right MB
        return at if bx < 3 else atr
    # same MB: the block at (bx+1, by-1) must come earlier in zscan order
    if bx == 3:
        return False  # would be in MB to the right (not yet decoded)
    from .framedata import RASTER_TO_ZSCAN
    neighbor_raster = (by - 1) * 4 + (bx + 1)
    return int(RASTER_TO_ZSCAN[neighbor_raster]) < zscan_k
