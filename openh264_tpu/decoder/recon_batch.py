"""Batched (vectorized) frame reconstruction.

Bit-exact reimplementation of recon_oracle's inter path operating on all
inter 4x4 blocks of a frame at once: gather-based MC (6-tap luma
quarter-pel, bilinear chroma eighth-pel), weighted/bi prediction, and
batched IDCT residual add. Intra MBs (sequential neighbor deps) still go
through the per-MB oracle in raster order — inter pixels are final
before any intra MB reads them, which matches raster decode order since
intra prediction only reads up/left neighbors.

This is the host-side (numpy) formulation of the device recon layout;
ops/recon_jax.py jits the same stages for TPU. Parity anchors:
rec_mb.cpp GetInterPred:462 / GetInterBPred:666, WeightPrediction:298,
BiWeightPrediction:366, decode_slice.cpp:334 WelsTargetMbConstruction.
"""

from __future__ import annotations

import numpy as np

from .framedata import (FrameSymbols, INTRA_CLASSES, MB_B16x8, MB_B8x16)
from .recon_oracle import ReconState, recon_intra_mb
from .wpred import WP_B_EXPLICIT, WP_B_IMPLICIT, WP_P_EXPLICIT

# combine kinds
K_SINGLE = 0          # plain single-list
K_SINGLE_W = 1        # WeightPrediction single-list
K_BI = 2              # plain average
K_BI_W = 3            # BiWeightPrediction


def _gather_fullpel(plane: np.ndarray, yi: np.ndarray, xi: np.ndarray,
                    bh: int, bw: int) -> np.ndarray:
    """Clamped-border gather of [N,bh,bw] windows (border replication ==
    the reference's expanded picture, expand_pic.cpp:388)."""
    H, W = plane.shape
    ys = np.clip(yi[:, None] + np.arange(bh)[None, :], 0, H - 1)
    xs = np.clip(xi[:, None] + np.arange(bw)[None, :], 0, W - 1)
    return plane[ys[:, :, None], xs[:, None, :]].astype(np.int32)


def _mc_luma_batch(plane: np.ndarray, x0: np.ndarray, y0: np.ndarray,
                   mvx: np.ndarray, mvy: np.ndarray) -> np.ndarray:
    """Batched 4x4 luma quarter-pel MC on one reference plane.
    Bit-exact with oracle.mc.mc_luma."""
    xi = x0 + (mvx >> 2)
    yi = y0 + (mvy >> 2)
    xf = mvx & 3
    yf = mvy & 3
    out = np.empty((len(x0), 4, 4), np.uint8)
    full = (xf == 0) & (yf == 0)
    if full.any():
        out[full] = _gather_fullpel(plane, yi[full], xi[full], 4, 4
                                    ).astype(np.uint8)
    sub = ~full
    if not sub.any():
        return out
    W = _gather_fullpel(plane, yi[sub] - 2, xi[sub] - 2, 10, 10)
    sxf, syf = xf[sub], yf[sub]
    bw = bh = 4

    def clip8(a):
        return np.clip(a, 0, 255)

    # horizontal 6-tap (unnormalized): all 10 rows, cols 0..bw
    b1 = (W[:, :, 0:bw + 1] - 5 * W[:, :, 1:bw + 2] + 20 * W[:, :, 2:bw + 3]
          + 20 * W[:, :, 3:bw + 4] - 5 * W[:, :, 4:bw + 5] + W[:, :, 5:bw + 6])
    b_full = clip8((b1[:, 2:bh + 3, :] + 16) >> 5)            # [n,5,5]
    h1 = (W[:, 0:bh + 1] - 5 * W[:, 1:bh + 2] + 20 * W[:, 2:bh + 3]
          + 20 * W[:, 3:bh + 4] - 5 * W[:, 4:bh + 5] + W[:, 5:bh + 6])
    h_full = clip8((h1[:, :, 2:bw + 3] + 16) >> 5)            # [n,5,5]
    j1 = (b1[:, 0:bh + 1] - 5 * b1[:, 1:bh + 2] + 20 * b1[:, 2:bh + 3]
          + 20 * b1[:, 3:bh + 4] - 5 * b1[:, 4:bh + 5] + b1[:, 5:bh + 6])
    j_full = clip8((j1 + 512) >> 10)                          # [n,5,5]

    G = W[:, 2:2 + bh + 1, 2:2 + bw + 1]
    g0 = G[:, :bh, :bw]
    H_ = G[:, :bh, 1:bw + 1]
    M_ = G[:, 1:bh + 1, :bw]
    b = b_full[:, :bh, :bw]
    s = b_full[:, 1:bh + 1, :bw]
    h = h_full[:, :bh, :bw]
    m = h_full[:, :bh, 1:bw + 1]
    j = j_full[:, :bh, :bw]

    exprs = {
        (0, 1): lambda: (g0 + b + 1) >> 1,
        (0, 2): lambda: b,
        (0, 3): lambda: (H_ + b + 1) >> 1,
        (1, 0): lambda: (g0 + h + 1) >> 1,
        (1, 1): lambda: (b + h + 1) >> 1,
        (1, 2): lambda: (b + j + 1) >> 1,
        (1, 3): lambda: (b + m + 1) >> 1,
        (2, 0): lambda: h,
        (2, 1): lambda: (h + j + 1) >> 1,
        (2, 2): lambda: j,
        (2, 3): lambda: (j + m + 1) >> 1,
        (3, 0): lambda: (M_ + h + 1) >> 1,
        (3, 1): lambda: (h + s + 1) >> 1,
        (3, 2): lambda: (j + s + 1) >> 1,
        (3, 3): lambda: (m + s + 1) >> 1,
    }
    res = np.empty((len(sxf), 4, 4), np.uint8)
    for (vyf, vxf), fn in exprs.items():
        msk = (syf == vyf) & (sxf == vxf)
        if msk.any():
            res[msk] = fn()[msk].astype(np.uint8)
    out[sub] = res
    return out


def _mc_chroma_batch(plane: np.ndarray, x0: np.ndarray, y0: np.ndarray,
                     mvx: np.ndarray, mvy: np.ndarray) -> np.ndarray:
    """Batched 2x2 chroma eighth-pel bilinear MC (oracle.mc.mc_chroma)."""
    xi = x0 + (mvx >> 3)
    yi = y0 + (mvy >> 3)
    xf = (mvx & 7)[:, None, None]
    yf = (mvy & 7)[:, None, None]
    W = _gather_fullpel(plane, yi, xi, 3, 3)
    A = W[:, :2, :2]
    B = W[:, :2, 1:3]
    C = W[:, 1:3, :2]
    D = W[:, 1:3, 1:3]
    out = ((8 - xf) * (8 - yf) * A + xf * (8 - yf) * B
           + (8 - xf) * yf * C + xf * yf * D + 32) >> 6
    return out.astype(np.uint8)


def _combine(kind, pa, pb, w0, o0, w1, o1, d):
    """Vectorized WeightPrediction / BiWeightPrediction / average.
    All params are per-block arrays; pa/pb are [N,h,w] uint8."""
    pa32 = pa.astype(np.int32)
    out = pa32.copy()
    kind_ = kind[:, None, None]
    w0_ = w0[:, None, None]
    o0_ = o0[:, None, None]
    w1_ = w1[:, None, None]
    o1_ = o1[:, None, None]
    d_ = d[:, None, None]
    m = kind == K_SINGLE_W
    if m.any():
        p = pa32[m]
        dd, ww, oo = d_[m], w0_[m], o0_[m]
        r = np.where(dd >= 1,
                     ((p * ww + (1 << np.maximum(dd - 1, 0))) >> np.maximum(dd, 1)) + oo,
                     p * ww + oo)
        out[m] = np.clip(r, 0, 255)
    m = kind == K_BI
    if m.any():
        out[m] = (pa32[m] + pb[m].astype(np.int32) + 1) >> 1
    m = kind == K_BI_W
    if m.any():
        p0 = pa32[m]
        p1 = pb[m].astype(np.int32)
        dd = d_[m]
        r = ((p0 * w0_[m] + p1 * w1_[m] + (1 << dd)) >> (dd + 1)) + \
            ((o0_[m] + o1_[m] + 1) >> 1)
        out[m] = np.clip(r, 0, 255)
    return out.astype(np.uint8)


class _WPLuts:
    """Per-slice weighted-prediction lookup tables for vector indexing."""

    def __init__(self, fs: FrameSymbols, max_ref: int = 33):
        wps = fs.wp_by_slice or []
        ns = max(1, len(wps))
        self.mode = np.zeros(ns, np.int32)
        self.ldenom = np.zeros(ns, np.int32)
        self.cdenom = np.zeros(ns, np.int32)
        self.lw = np.ones((ns, 2, max_ref), np.int32)
        self.lo = np.zeros((ns, 2, max_ref), np.int32)
        self.cw = np.ones((ns, 2, max_ref, 2), np.int32)
        self.co = np.zeros((ns, 2, max_ref, 2), np.int32)
        self.impl = [None] * ns
        for si, wp in enumerate(wps):
            if wp is None or wp.mode == 0:
                continue
            self.mode[si] = wp.mode
            self.ldenom[si] = wp.luma_denom
            self.cdenom[si] = wp.chroma_denom
            if wp.mode == WP_B_IMPLICIT:
                self.impl[si] = wp.implicit_w0
                continue
            self.lw[si] = 1 << wp.luma_denom
            self.cw[si] = 1 << wp.chroma_denom
            for (lx, ri), w in wp.weights.items():
                if ri < max_ref:
                    self.lw[si, lx, ri] = w["luma_weight"]
                    self.lo[si, lx, ri] = w["luma_offset"]
                    self.cw[si, lx, ri] = w["chroma_weight"][0]
                    self.co[si, lx, ri] = w["chroma_offset"][0]
                    self.cw[si, lx, ri, 1] = w["chroma_weight"][1]
                    self.co[si, lx, ri, 1] = w["chroma_offset"][1]

    def implicit_w0(self, sid, r0, r1):
        """Vector lookup of implicit weights per block."""
        w0 = np.full(len(sid), 32, np.int32)
        for si in np.unique(sid):
            t = self.impl[si] if 0 <= si < len(self.impl) else None
            if t is None:
                continue
            m = sid == si
            rr0 = np.clip(r0[m], 0, t.shape[0] - 1)
            rr1 = np.clip(r1[m], 0, t.shape[1] - 1)
            ok = (r0[m] >= 0) & (r0[m] < t.shape[0]) & \
                 (r1[m] >= 0) & (r1[m] < t.shape[1])
            v = t[rr0, rr1]
            w0[m] = np.where(ok, v, 32)
        return w0


def recon_frame_batch(fs: FrameSymbols, ref_pics: dict,
                      constrained: bool = False,
                      device: bool = False) -> ReconState:
    """Drop-in replacement for recon_oracle.recon_frame."""
    st = ReconState(fs)
    n = fs.n_mb
    mb_ok = fs.mb_correct
    inter = (fs.mb_type >= 4) & mb_ok  # INTRA_CLASSES are 0..3
    inter_idx = np.nonzero(inter)[0].astype(np.int32)
    if len(inter_idx):
        _recon_inter_batch(st, fs, ref_pics, inter_idx, device=device)
    # intra MBs in raster order (wavefront deps on recon pixels)
    intra_list = np.nonzero(np.isin(fs.mb_type, INTRA_CLASSES) & mb_ok)[0]
    if len(intra_list):
        from ..native import recon_intra_mbs_native
        if not recon_intra_mbs_native(st, fs, intra_list, constrained):
            for idx in intra_list:
                recon_intra_mb(st, int(idx), constrained)
    return st


def _recon_inter_batch(st: ReconState, fs: FrameSymbols,
                       ref_pics: dict, mbs: np.ndarray,
                       device: bool = False) -> None:
    nmb = len(mbs)
    mb_w = fs.mb_w
    mbx = mbs % mb_w
    mby = mbs // mb_w
    # per-(mb, blk) flattened units
    B = nmb * 16
    mb_u = np.repeat(mbs, 16)
    blk = np.tile(np.arange(16, dtype=np.int32), nmb)
    bx = blk % 4
    by = blk // 4
    q = (by // 2) * 2 + (bx // 2)
    gx4 = np.repeat(mbx, 16) * 4 + bx       # global 4x4 col
    gy4 = np.repeat(mby, 16) * 4 + by
    x0 = gx4 * 4                            # pixel coords
    y0 = gy4 * 4

    pm = fs.pred_mode[mb_u, q].astype(np.int32)
    mt = fs.mb_type[mb_u]
    sid = fs.slice_id[mb_u]
    r0 = fs.refidx[mb_u, 0, q].astype(np.int32)
    r1 = fs.refidx[mb_u, 1, q].astype(np.int32)
    pid0 = fs.ref_pic[mb_u, 0, q]
    pid1 = fs.ref_pic[mb_u, 1, q]
    mv0 = fs.mv[mb_u, 0, blk]               # [B,2]
    mv1 = fs.mv[mb_u, 1, blk]

    luts = _WPLuts(fs)
    wmode = luts.mode[np.clip(sid, 0, len(luts.mode) - 1)]
    wmode = np.where((sid >= 0) & (sid < len(luts.mode)), wmode, 0)

    # B 16x8/8x16 BI quirk (see recon_oracle.recon_inter_mb)
    second = np.where(mt == MB_B16x8, by >= 2, bx >= 2)
    quirk_bi = (pm == 2) & ((mt == MB_B16x8) | (mt == MB_B8x16))
    quirk_l0 = quirk_bi & second       # plain L0, never weighted
    quirk_l1 = quirk_bi & ~second      # L1 MC through BiWeight twice

    # resolve the A (primary) prediction source per block
    use_l1_a = (pm == 1) | quirk_l1
    use_l1_a = use_l1_a & ~quirk_l0
    pidA = np.where(use_l1_a, pid1, pid0)
    mvA = np.where(use_l1_a[:, None], mv1, mv0)
    is_bi = (pm == 2) & ~quirk_bi
    # combine kind + weight params (luma, cb, cr)
    kind = np.zeros(B, np.int32)
    w0 = np.ones(B, np.int32)
    o0 = np.zeros(B, np.int32)
    w1 = np.ones(B, np.int32)
    o1 = np.zeros(B, np.int32)
    dl = np.zeros(B, np.int32)
    cw0 = [np.ones(B, np.int32), np.ones(B, np.int32)]
    cw1 = [np.ones(B, np.int32), np.ones(B, np.int32)]
    co0 = [np.zeros(B, np.int32), np.zeros(B, np.int32)]
    co1 = [np.zeros(B, np.int32), np.zeros(B, np.int32)]
    dc = np.zeros(B, np.int32)

    sidc = np.clip(sid, 0, len(luts.mode) - 1)
    r0c = np.clip(r0, 0, luts.lw.shape[2] - 1)
    r1c = np.clip(r1, 0, luts.lw.shape[2] - 1)

    single_w = (~is_bi & ~quirk_l1 & ~quirk_l0 &
                (((wmode == WP_P_EXPLICIT) & (pm == 0)) |
                 ((wmode == WP_B_EXPLICIT) & (pm <= 1))))
    if single_w.any():
        kind[single_w] = K_SINGLE_W
        lxs = np.clip(pm, 0, 1)
        rs = np.where(pm == 0, r0c, r1c)
        w0[single_w] = luts.lw[sidc, lxs, rs][single_w]
        o0[single_w] = luts.lo[sidc, lxs, rs][single_w]
        dl[single_w] = luts.ldenom[sidc][single_w]
        for comp in range(2):
            cw0[comp][single_w] = luts.cw[sidc, lxs, rs, comp][single_w]
            co0[comp][single_w] = luts.co[sidc, lxs, rs, comp][single_w]
        dc[single_w] = luts.cdenom[sidc][single_w]

    bi_w = (is_bi | quirk_l1) & ((wmode == WP_B_EXPLICIT) |
                                 (wmode == WP_B_IMPLICIT))
    bi_plain = is_bi & ~bi_w
    kind[bi_plain] = K_BI
    if bi_w.any():
        kind[bi_w] = K_BI_W
        expl = bi_w & (wmode == WP_B_EXPLICIT)
        if expl.any():
            w0[expl] = luts.lw[sidc, 0, r0c][expl]
            o0[expl] = luts.lo[sidc, 0, r0c][expl]
            w1[expl] = luts.lw[sidc, 1, r1c][expl]
            o1[expl] = luts.lo[sidc, 1, r1c][expl]
            dl[expl] = luts.ldenom[sidc][expl]
            for comp in range(2):
                cw0[comp][expl] = luts.cw[sidc, 0, r0c, comp][expl]
                co0[comp][expl] = luts.co[sidc, 0, r0c, comp][expl]
                cw1[comp][expl] = luts.cw[sidc, 1, r1c, comp][expl]
                co1[comp][expl] = luts.co[sidc, 1, r1c, comp][expl]
            dc[expl] = luts.cdenom[sidc][expl]
        impl = bi_w & (wmode == WP_B_IMPLICIT)
        if impl.any():
            iw0 = luts.implicit_w0(sid[impl], r0[impl], r1[impl])
            w0[impl] = iw0
            w1[impl] = 64 - iw0
            o0[impl] = o1[impl] = 0
            dl[impl] = 5
            for comp in range(2):
                cw0[comp][impl] = iw0
                cw1[comp][impl] = 64 - iw0
            dc[impl] = 5

    needB = is_bi | quirk_l1  # second source (quirk_l1: same as A)
    pidB = np.where(quirk_l1, pidA, pid1)
    mvB = np.where(quirk_l1[:, None], mvA, mv1)

    # ---- run MC per reference picture ----
    predA_y = np.zeros((B, 4, 4), np.uint8)
    predA_u = np.zeros((B, 2, 2), np.uint8)
    predA_v = np.zeros((B, 2, 2), np.uint8)
    predB_y = np.zeros((B, 4, 4), np.uint8)
    predB_u = np.zeros((B, 2, 2), np.uint8)
    predB_v = np.zeros((B, 2, 2), np.uint8)

    if device:
        from ..ops.recon_jax import (mc_luma_batch_jax, mc_chroma_batch_jax,
                                     _plane_i32)
        mc_luma, mc_chroma = mc_luma_batch_jax, mc_chroma_batch_jax

        def planes_of(ref):
            return (_plane_i32(ref, 'y'), _plane_i32(ref, 'u'),
                    _plane_i32(ref, 'v'))
    else:
        mc_luma, mc_chroma = _mc_luma_batch, _mc_chroma_batch

        def planes_of(ref):
            return ref.y, ref.u, ref.v

    for dst_y, dst_u, dst_v, pids, mvs, sel in (
            (predA_y, predA_u, predA_v, pidA, mvA, np.ones(B, bool)),
            (predB_y, predB_u, predB_v, pidB, mvB, needB)):
        for pid in np.unique(pids[sel]):
            if pid < 0:
                continue
            ref = ref_pics[int(pid)]
            py, pu, pv = planes_of(ref)
            m = sel & (pids == pid)
            dst_y[m] = mc_luma(py, x0[m], y0[m], mvs[m, 0], mvs[m, 1])
            cx = (x0[m] >> 1)
            cy = (y0[m] >> 1)
            dst_u[m] = mc_chroma(pu, cx, cy, mvs[m, 0], mvs[m, 1])
            dst_v[m] = mc_chroma(pv, cx, cy, mvs[m, 0], mvs[m, 1])

    out_y = _combine(kind, predA_y, predB_y, w0, o0, w1, o1, dl)
    out_u = _combine(kind, predA_u, predB_u, cw0[0], co0[0], cw1[0], co1[0], dc)
    out_v = _combine(kind, predA_v, predB_v, cw0[1], co0[1], cw1[1], co1[1], dc)

    # ---- scatter predictions into the planes ----
    H, W = st.y.shape
    yv = st.y.reshape(H // 4, 4, W // 4, 4)
    yv[gy4, :, gx4, :] = out_y
    cH, cW = st.u.shape
    uv = st.u.reshape(cH // 2, 2, cW // 2, 2)
    vv = st.v.reshape(cH // 2, 2, cW // 2, 2)
    cgy = gy4  # chroma 2x2 block index == luma 4x4 block index
    cgx = gx4
    uv[cgy, :, cgx, :] = out_u
    vv[cgy, :, cgx, :] = out_v

    # ---- residual add ----
    from ..oracle.transform import idct4x4_add
    t8 = fs.transform8[mb_u[::16]]  # per-MB
    mb_n8 = mbs[~t8]
    if len(mb_n8):
        bx4 = np.tile(np.arange(4), 4)
        by4 = np.repeat(np.arange(4), 4)
        g_y = (mb_n8 // mb_w * 4)[:, None] + by4[None, :]
        g_x = (mb_n8 % mb_w * 4)[:, None] + bx4[None, :]
        coefs = fs.coeffs_l[mb_n8].reshape(len(mb_n8), 16, 4, 4)
        pred = yv[g_y, :, g_x, :]  # [n,16,4,4]
        yv[g_y, :, g_x, :] = idct4x4_add(pred, coefs)
    mb_t8 = mbs[t8]
    if len(mb_t8):
        from ..oracle.intra8 import idct8x8_add
        fs.ensure_coeffs8()
        for idx in mb_t8:
            mx, my = int(idx % mb_w) * 16, int(idx // mb_w) * 16
            for blk8 in range(4):
                b8x, b8y = (blk8 % 2) * 8, (blk8 // 2) * 8
                coef = fs.coeffs8[idx, blk8]
                if np.any(coef):
                    p8 = st.y[my + b8y:my + b8y + 8, mx + b8x:mx + b8x + 8]
                    st.y[my + b8y:my + b8y + 8, mx + b8x:mx + b8x + 8] = \
                        idct8x8_add(p8, coef)
    # chroma residual: 4 4x4 chroma blocks per MB per component
    cbx = np.tile(np.arange(2), 2)
    cby = np.repeat(np.arange(2), 2)
    cg_y = (mbs // mb_w * 2)[:, None] + cby[None, :]
    cg_x = (mbs % mb_w * 2)[:, None] + cbx[None, :]
    uv4 = st.u.reshape(cH // 4, 4, cW // 4, 4)
    vv4 = st.v.reshape(cH // 4, 4, cW // 4, 4)
    cu = fs.coeffs_c[mbs, 0].reshape(len(mbs), 4, 4, 4)
    cv = fs.coeffs_c[mbs, 1].reshape(len(mbs), 4, 4, 4)
    uv4[cg_y, :, cg_x, :] = idct4x4_add(uv4[cg_y, :, cg_x, :], cu)
    vv4[cg_y, :, cg_x, :] = idct4x4_add(vv4[cg_y, :, cg_x, :], cv)
