"""Numpy oracle for the in-loop deblocking filter (H.264 §8.7).

Parity anchors: codec/common/src/deblocking_common.cpp DeblockLumaLt4_c
/ DeblockLumaEq4_c / DeblockChroma*_c (edge filters) and
codec/decoder/core/src/deblocking.cpp (bS derivation, edge iteration).

Vectorized along each edge (16 luma / 8 chroma sample lines at once);
MB iteration is raster with vertical edges filtered before horizontal,
as the spec requires.
"""

from __future__ import annotations

import numpy as np

from ..tables import ALPHA_TABLE, BETA_TABLE, CHROMA_QP_TABLE, TC0_TABLE


def _clip3(lo, hi, x):
    return np.clip(x, lo, hi)


def filter_edge_luma(p: np.ndarray, q: np.ndarray, bs: np.ndarray,
                     index_a: int, index_b: int):
    """p: [4, n] rows p3..p0 (p[3] is p0, adjacent to edge);
    q: [4, n] rows q0..q3 (q[0] is q0). bs: [n] per-line boundary strength
    (same value per 4-line group in practice). Returns filtered (p, q).
    """
    alpha = int(ALPHA_TABLE[index_a])
    beta = int(BETA_TABLE[index_b])
    if alpha == 0 or beta == 0:
        return p, q
    p = p.astype(np.int32)
    q = q.astype(np.int32)
    p3, p2, p1, p0 = p[0], p[1], p[2], p[3]
    q0, q1, q2, q3 = q[0], q[1], q[2], q[3]
    filt = (bs > 0) & (np.abs(p0 - q0) < alpha) & \
           (np.abs(p1 - p0) < beta) & (np.abs(q1 - q0) < beta)
    ap = np.abs(p2 - p0) < beta
    aq = np.abs(q2 - q0) < beta

    # normal filter (bS < 4)
    tc0 = TC0_TABLE[index_a][np.clip(bs, 1, 3) - 1]
    tc = tc0 + ap.astype(np.int32) + aq.astype(np.int32)
    delta = _clip3(-tc, tc, ((q0 - p0) * 4 + (p1 - q1) + 4) >> 3)
    np0 = np.clip(p0 + delta, 0, 255)
    nq0 = np.clip(q0 - delta, 0, 255)
    np1 = p1 + _clip3(-tc0, tc0, (p2 + ((p0 + q0 + 1) >> 1) - 2 * p1) >> 1)
    nq1 = q1 + _clip3(-tc0, tc0, (q2 + ((p0 + q0 + 1) >> 1) - 2 * q1) >> 1)
    np1 = np.where(ap, np1, p1)
    nq1 = np.where(aq, nq1, q1)

    # strong filter (bS == 4)
    strong_p = ap & (np.abs(p0 - q0) < ((alpha >> 2) + 2))
    sp0 = np.where(strong_p, (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3,
                   (2 * p1 + p0 + q1 + 2) >> 2)
    sp1 = np.where(strong_p, (p2 + p1 + p0 + q0 + 2) >> 2, p1)
    sp2 = np.where(strong_p, (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3, p2)
    strong_q = aq & (np.abs(p0 - q0) < ((alpha >> 2) + 2))
    sq0 = np.where(strong_q, (q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3,
                   (2 * q1 + q0 + p1 + 2) >> 2)
    sq1 = np.where(strong_q, (q2 + q1 + q0 + p0 + 2) >> 2, q1)
    sq2 = np.where(strong_q, (2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3, q2)

    is4 = bs == 4
    out_p = p.copy()
    out_q = q.copy()
    out_p[3] = np.where(filt, np.where(is4, sp0, np0), p0)
    out_p[2] = np.where(filt, np.where(is4, sp1, np1), p1)
    out_p[1] = np.where(filt & is4, sp2, p2)
    out_q[0] = np.where(filt, np.where(is4, sq0, nq0), q0)
    out_q[1] = np.where(filt, np.where(is4, sq1, nq1), q1)
    out_q[2] = np.where(filt & is4, sq2, q2)
    return out_p.astype(np.uint8), out_q.astype(np.uint8)


def filter_edge_chroma(p: np.ndarray, q: np.ndarray, bs: np.ndarray,
                       index_a: int, index_b: int):
    """p: [2, n] rows p1,p0; q: [2, n] rows q0,q1."""
    alpha = int(ALPHA_TABLE[index_a])
    beta = int(BETA_TABLE[index_b])
    if alpha == 0 or beta == 0:
        return p, q
    p = p.astype(np.int32)
    q = q.astype(np.int32)
    p1, p0 = p[0], p[1]
    q0, q1 = q[0], q[1]
    filt = (bs > 0) & (np.abs(p0 - q0) < alpha) & \
           (np.abs(p1 - p0) < beta) & (np.abs(q1 - q0) < beta)
    tc = TC0_TABLE[index_a][np.clip(bs, 1, 3) - 1] + 1
    delta = _clip3(-tc, tc, ((q0 - p0) * 4 + (p1 - q1) + 4) >> 3)
    np0 = np.clip(p0 + delta, 0, 255)
    nq0 = np.clip(q0 - delta, 0, 255)
    sp0 = (2 * p1 + p0 + q1 + 2) >> 2
    sq0 = (2 * q1 + q0 + p1 + 2) >> 2
    is4 = bs == 4
    out_p = p.copy()
    out_q = q.copy()
    out_p[1] = np.where(filt, np.where(is4, sp0, np0), p0)
    out_q[0] = np.where(filt, np.where(is4, sq0, nq0), q0)
    return out_p.astype(np.uint8), out_q.astype(np.uint8)


def compute_bs_edge(fs, mb_idx, edge, vertical: bool) -> np.ndarray:
    """bS[4] for the 4 4x4-block segments of one luma edge of MB mb_idx.

    edge: 0..3 (edge 0 = MB boundary). Uses intra flags, nzc, mv/ref.
    """
    mbx, mby = mb_idx % fs.mb_w, mb_idx // fs.mb_w
    bs = np.zeros(4, dtype=np.int32)
    cur_intra = fs.mb_type[mb_idx] in (0, 1, 2, 3)
    if edge == 0:
        nbx, nby = (mbx - 1, mby) if vertical else (mbx, mby - 1)
        nb_idx = nby * fs.mb_w + nbx
        nb_intra = fs.mb_type[nb_idx] in (0, 1, 2, 3)
        if cur_intra or nb_intra:
            bs[:] = 4
            return bs
    else:
        if cur_intra:
            bs[:] = 3
            return bs
    # inter-inter: nzc / mv based, per 4x4 segment
    for seg in range(4):
        if vertical:
            bqx, bqy = mbx * 4 + edge, mby * 4 + seg
            bpx, bpy = bqx - 1, bqy
        else:
            bqx, bqy = mbx * 4 + seg, mby * 4 + edge
            bpx, bpy = bqx, bqy - 1
        if fs.nzc_l[bqy, bqx] > 0 or fs.nzc_l[bpy, bpx] > 0:
            bs[seg] = 2
            continue
        bs[seg] = _bs_mv(fs, bpx, bpy, bqx, bqy)
    return bs


def _mv_far(a, b) -> bool:
    return abs(int(a[0]) - int(b[0])) >= 4 or abs(int(a[1]) - int(b[1])) >= 4


def _bs_mv(fs, bpx, bpy, bqx, bqy) -> int:
    """bS 0/1 from motion difference between 4x4 blocks p and q
    (§8.7.2.1, both lists; handles bipred with same/different refs)."""
    mbp = (bpy // 4) * fs.mb_w + (bpx // 4)
    mbq = (bqy // 4) * fs.mb_w + (bqx // 4)
    bp = (bpy % 4) * 4 + (bpx % 4)
    bq = (bqy % 4) * 4 + (bqx % 4)
    pp8 = (bp // 8) * 2 + ((bp % 4) // 2)
    qp8 = (bq // 8) * 2 + ((bq % 4) // 2)
    # (refpic, mv) pairs actually used by each side
    P = [(int(fs.ref_pic[mbp, lx, pp8]), fs.mv[mbp, lx, bp])
         for lx in (0, 1) if fs.refidx[mbp, lx, pp8] >= 0]
    Q = [(int(fs.ref_pic[mbq, lx, qp8]), fs.mv[mbq, lx, bq])
         for lx in (0, 1) if fs.refidx[mbq, lx, qp8] >= 0]
    if len(P) != len(Q):
        return 1
    if sorted(r for r, _ in P) != sorted(r for r, _ in Q):
        return 1
    if len(P) == 1:
        return 1 if _mv_far(P[0][1], Q[0][1]) else 0
    if len(P) == 2:
        rp0, rp1 = P[0][0], P[1][0]
        if rp0 != rp1:
            # match by reference picture
            qmap = {r: mv for r, mv in Q}
            for r, mv in P:
                if _mv_far(mv, qmap[r]):
                    return 1
            return 0
        # same picture in both lists: either pairing may satisfy
        a = not _mv_far(P[0][1], Q[0][1]) and not _mv_far(P[1][1], Q[1][1])
        b = not _mv_far(P[0][1], Q[1][1]) and not _mv_far(P[1][1], Q[0][1])
        return 0 if (a or b) else 1
    return 0


def deblock_frame(st, fs) -> None:
    """In-place deblock of decoded planes. st: ReconState, fs: FrameSymbols."""
    from .deblock_bs import precompute_bs
    BSV, BSH = precompute_bs(fs)
    offs = getattr(fs, "chroma_qp_offsets", (0, 0))
    from ..native import deblock_frame_native
    if deblock_frame_native(st, fs, BSV, BSH, offs):
        return
    y, u, v = st.y, st.u, st.v
    for mby in range(fs.mb_h):
        for mbx in range(fs.mb_w):
            idx = mby * fs.mb_w + mbx
            if fs.mb_type[idx] < 0:
                continue
            correct = getattr(fs, "mb_correct", None)
            if correct is not None and not correct[idx]:
                continue  # EC'd MB: not deblocked (filled after deblock)
            if fs.disable_deblock[idx] == 1:
                continue
            qp_cur = int(fs.qp[idx])
            a_off = int(fs.alpha_offset[idx])
            b_off = int(fs.beta_offset[idx])
            x0, y0 = mbx * 16, mby * 16
            cx0, cy0 = mbx * 8, mby * 8
            same_slice_left = mbx > 0 and (
                fs.disable_deblock[idx] != 2 or
                fs.slice_id[idx - 1] == fs.slice_id[idx])
            same_slice_top = mby > 0 and (
                fs.disable_deblock[idx] != 2 or
                fs.slice_id[idx - fs.mb_w] == fs.slice_id[idx])
            if correct is not None:
                same_slice_left = same_slice_left and correct[idx - 1]
                same_slice_top = same_slice_top and correct[idx - fs.mb_w]

            for vertical in (True, False):
                for edge in range(4):
                    # 8x8 transform MBs: interior 4-pel luma edges absent
                    if edge in (1, 3) and fs.transform8[idx]:
                        continue
                    if edge == 0:
                        if vertical and not same_slice_left:
                            continue
                        if not vertical and not same_slice_top:
                            continue
                        nb = idx - 1 if vertical else idx - fs.mb_w
                        qp_nb = int(fs.qp[nb])
                    else:
                        # interior edges skipped entirely for P_Skip-like
                        # MBs with no coeffs is an optimization; bS calc
                        # handles it naturally.
                        qp_nb = qp_cur
                    if vertical:
                        bs4 = BSV[mby * 4:mby * 4 + 4, mbx * 4 + edge]
                    else:
                        bs4 = BSH[mby * 4 + edge, mbx * 4:mbx * 4 + 4]
                    if not bs4.any():
                        continue
                    qpav = (qp_cur + qp_nb + 1) >> 1
                    ia = int(np.clip(qpav + a_off, 0, 51))
                    ib = int(np.clip(qpav + b_off, 0, 51))
                    bs16 = np.repeat(bs4, 4)
                    if vertical:
                        xe = x0 + edge * 4
                        pcols = y[y0:y0 + 16, xe - 4:xe].T  # [4,16] p3..p0
                        qcols = y[y0:y0 + 16, xe:xe + 4].T  # [4,16] q0..q3
                        np_, nq_ = filter_edge_luma(pcols, qcols, bs16, ia, ib)
                        y[y0:y0 + 16, xe - 4:xe] = np_.T
                        y[y0:y0 + 16, xe:xe + 4] = nq_.T
                    else:
                        ye = y0 + edge * 4
                        prow = y[ye - 4:ye, x0:x0 + 16]
                        qrow = y[ye:ye + 4, x0:x0 + 16]
                        np_, nq_ = filter_edge_luma(prow, qrow, bs16, ia, ib)
                        y[ye - 4:ye, x0:x0 + 16] = np_
                        y[ye:ye + 4, x0:x0 + 16] = nq_
                    # chroma edges at luma edges 0 and 2
                    if edge in (0, 2):
                        # per-plane chroma QP offset (PPS primary/secondary)
                        offs = getattr(fs, "chroma_qp_offsets", (0, 0))
                        bs8 = np.repeat(bs4, 2)
                        for plane, coff in ((u, offs[0]), (v, offs[1])):
                            qpc_cur = int(CHROMA_QP_TABLE[np.clip(qp_cur + coff, 0, 51)])
                            qpc_nb = int(CHROMA_QP_TABLE[np.clip(qp_nb + coff, 0, 51)])
                            cqpav = (qpc_cur + qpc_nb + 1) >> 1
                            cia = int(np.clip(cqpav + a_off, 0, 51))
                            cib = int(np.clip(cqpav + b_off, 0, 51))
                            if vertical:
                                xe = cx0 + (edge // 2) * 4
                                pc = plane[cy0:cy0 + 8, xe - 2:xe].T
                                qc = plane[cy0:cy0 + 8, xe:xe + 2].T
                                np_, nq_ = filter_edge_chroma(pc, qc, bs8, cia, cib)
                                plane[cy0:cy0 + 8, xe - 2:xe] = np_.T
                                plane[cy0:cy0 + 8, xe:xe + 2] = nq_.T
                            else:
                                ye = cy0 + (edge // 2) * 4
                                pc = plane[ye - 2:ye, cx0:cx0 + 8]
                                qc = plane[ye:ye + 2, cx0:cx0 + 8]
                                np_, nq_ = filter_edge_chroma(pc, qc, bs8, cia, cib)
                                plane[ye - 2:ye, cx0:cx0 + 8] = np_
                                plane[ye:ye + 2, cx0:cx0 + 8] = nq_
