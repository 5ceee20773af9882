/* Native host kernels for the serial/bit-level stages of the codec.
 *
 * The TPU-side compute (ME, transforms, MC) lives in JAX; these are the
 * host pieces that are intrinsically sequential at bit or MB raster
 * granularity — the same split the reference makes between its SIMD
 * kernels and its C runtime (SURVEY.md §7 "two-phase entropy",
 * "bitstream finalize becomes a compact C++ host extension").
 *
 * Exact-semantics ports of:
 *  - token bit packing (cavlc_vec.pack_tokens)
 *  - in-loop deblocking pixel filtering (oracle/deblock.py, itself a
 *    parity port of deblocking_common.cpp DeblockLuma{Lt4,Eq4}_c /
 *    DeblockChroma*_c with raster MB order per spec 8.7)
 */

#include <stdint.h>
#include <stddef.h>
#include <string.h>

/* ---------------- bit packing ---------------- */

/* Append n (val,len) tokens MSB-first into out (must be zeroed),
 * starting at start_bit. Returns the new bit position. */
size_t bitpack(const uint32_t *vals, const uint8_t *lens, size_t n,
               uint8_t *out, size_t start_bit) {
    size_t bytepos = start_bit >> 3;
    int accbits = (int)(start_bit & 7);
    uint64_t acc = accbits ? (out[bytepos] >> (8 - accbits)) : 0;
    for (size_t i = 0; i < n; i++) {
        int len = lens[i];
        if (!len) continue;
        acc = (acc << len) | (vals[i] & ((len >= 32) ? 0xFFFFFFFFu
                                                     : ((1u << len) - 1)));
        accbits += len;
        while (accbits >= 8) {
            accbits -= 8;
            out[bytepos++] = (uint8_t)(acc >> accbits);
        }
    }
    if (accbits)
        out[bytepos] = (uint8_t)(acc << (8 - accbits));
    return (bytepos << 3) + (size_t)accbits;
}

/* ---------------- deblocking ---------------- */

static inline int iclip(int lo, int hi, int x) {
    return x < lo ? lo : (x > hi ? hi : x);
}
static inline int iclip255(int x) { return x < 0 ? 0 : (x > 255 ? 255 : x); }

/* one 4-sample-deep luma edge line; pp points at p3 with stride st
 * toward q3 (so pp[3*st] = p0, pp[4*st] = q0). */
static void luma_line(uint8_t *pp, int st, int bs, int alpha, int beta,
                      const int8_t *tc0tab) {
    int p3 = pp[0], p2 = pp[st], p1 = pp[2 * st], p0 = pp[3 * st];
    int q0 = pp[4 * st], q1 = pp[5 * st], q2 = pp[6 * st], q3 = pp[7 * st];
    int d0 = p0 - q0;
    if (!(bs > 0)) return;
    if (!((d0 < 0 ? -d0 : d0) < alpha)) return;
    int dp = p1 - p0, dq = q1 - q0;
    if (!((dp < 0 ? -dp : dp) < beta) || !((dq < 0 ? -dq : dq) < beta))
        return;
    int ap = ((p2 - p0 < 0) ? p0 - p2 : p2 - p0) < beta;
    int aq = ((q2 - q0 < 0) ? q0 - q2 : q2 - q0) < beta;
    if (bs == 4) {
        int strong = ((d0 < 0 ? -d0 : d0) < ((alpha >> 2) + 2));
        int sp = ap && strong, sq = aq && strong;
        int np0 = sp ? (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3
                     : (2 * p1 + p0 + q1 + 2) >> 2;
        int np1 = sp ? (p2 + p1 + p0 + q0 + 2) >> 2 : p1;
        int np2 = sp ? (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3 : p2;
        int nq0 = sq ? (q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3
                     : (2 * q1 + q0 + p1 + 2) >> 2;
        int nq1 = sq ? (q2 + q1 + q0 + p0 + 2) >> 2 : q1;
        int nq2 = sq ? (2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3 : q2;
        pp[3 * st] = (uint8_t)np0;
        pp[2 * st] = (uint8_t)np1;
        pp[st] = (uint8_t)np2;
        pp[4 * st] = (uint8_t)nq0;
        pp[5 * st] = (uint8_t)nq1;
        pp[6 * st] = (uint8_t)nq2;
    } else {
        int tc0 = tc0tab[bs - 1];
        int tc = tc0 + ap + aq;
        int delta = iclip(-tc, tc, ((q0 - p0) * 4 + (p1 - q1) + 4) >> 3);
        int np0 = iclip255(p0 + delta);
        int nq0 = iclip255(q0 - delta);
        if (ap)
            pp[2 * st] = (uint8_t)(p1 + iclip(-tc0, tc0,
                (p2 + ((p0 + q0 + 1) >> 1) - 2 * p1) >> 1));
        if (aq)
            pp[5 * st] = (uint8_t)(q1 + iclip(-tc0, tc0,
                (q2 + ((p0 + q0 + 1) >> 1) - 2 * q1) >> 1));
        pp[3 * st] = (uint8_t)np0;
        pp[4 * st] = (uint8_t)nq0;
    }
}

static void chroma_line(uint8_t *pp, int st, int bs, int alpha, int beta,
                        const int8_t *tc0tab) {
    int p1 = pp[0], p0 = pp[st], q0 = pp[2 * st], q1 = pp[3 * st];
    if (!(bs > 0)) return;
    int d0 = p0 - q0;
    if (!((d0 < 0 ? -d0 : d0) < alpha)) return;
    int dp = p1 - p0, dq = q1 - q0;
    if (!((dp < 0 ? -dp : dp) < beta) || !((dq < 0 ? -dq : dq) < beta))
        return;
    if (bs == 4) {
        pp[st] = (uint8_t)((2 * p1 + p0 + q1 + 2) >> 2);
        pp[2 * st] = (uint8_t)((2 * q1 + q0 + p1 + 2) >> 2);
    } else {
        int tc = tc0tab[bs - 1] + 1;
        int delta = iclip(-tc, tc, ((q0 - p0) * 4 + (p1 - q1) + 4) >> 3);
        pp[st] = (uint8_t)iclip255(p0 + delta);
        pp[2 * st] = (uint8_t)iclip255(q0 - delta);
    }
}

/* Full-frame deblock in spec order (raster MBs, vertical then
 * horizontal edges per MB). Mirrors oracle/deblock.deblock_frame.
 *
 * y/u/v:    planes (uint8, strides W / W/2)
 * BSV/BSH:  [H4*W4] int32 per-edge boundary strengths (deblock_bs.py)
 * qp, disable, a_off, b_off, slice_id, t8, correct: per-MB int32/uint8
 * alpha/beta: [52] int32; tc0: [52*3] int8; chroma_qp: [52] int32
 * coff0/coff1: chroma qp offsets (PPS)
 */
void deblock_frame_c(uint8_t *y, uint8_t *u, uint8_t *v,
                     int mb_w, int mb_h,
                     const int32_t *BSV, const int32_t *BSH,
                     const int32_t *qp, const int32_t *disable,
                     const int32_t *a_off, const int32_t *b_off,
                     const int32_t *slice_id, const uint8_t *t8,
                     const uint8_t *correct,
                     const int32_t *alpha_t, const int32_t *beta_t,
                     const int8_t *tc0_t, const int32_t *chroma_qp_t,
                     int coff0, int coff1) {
    int W = mb_w * 16, H4 = mb_h * 4, W4 = mb_w * 4;
    int CW = mb_w * 8;
    (void)H4;
    for (int mby = 0; mby < mb_h; mby++)
    for (int mbx = 0; mbx < mb_w; mbx++) {
        int idx = mby * mb_w + mbx;
        if (correct && !correct[idx]) continue;
        if (disable[idx] == 1) continue;
        int qp_cur = qp[idx];
        int ao = a_off[idx], bo = b_off[idx];
        int x0 = mbx * 16, y0 = mby * 16;
        int cx0 = mbx * 8, cy0 = mby * 8;
        int left_ok = mbx > 0 &&
            (disable[idx] != 2 || slice_id[idx - 1] == slice_id[idx]) &&
            (!correct || correct[idx - 1]);
        int top_ok = mby > 0 &&
            (disable[idx] != 2 || slice_id[idx - mb_w] == slice_id[idx]) &&
            (!correct || correct[idx - mb_w]);
        for (int vert = 1; vert >= 0; vert--)
        for (int edge = 0; edge < 4; edge++) {
            if ((edge == 1 || edge == 3) && t8[idx]) continue;
            int qp_nb = qp_cur;
            if (edge == 0) {
                if (vert) { if (!left_ok) continue; qp_nb = qp[idx - 1]; }
                else      { if (!top_ok) continue;  qp_nb = qp[idx - mb_w]; }
            }
            const int32_t *bs4;
            int32_t bstmp[4];
            if (vert) {
                int bx = mbx * 4 + edge;
                for (int s = 0; s < 4; s++)
                    bstmp[s] = BSV[(mby * 4 + s) * W4 + bx];
            } else {
                int by = mby * 4 + edge;
                for (int s = 0; s < 4; s++)
                    bstmp[s] = BSH[by * W4 + mbx * 4 + s];
            }
            bs4 = bstmp;
            if (!(bs4[0] | bs4[1] | bs4[2] | bs4[3])) continue;
            int qpav = (qp_cur + qp_nb + 1) >> 1;
            int ia = iclip(0, 51, qpav + ao);
            int ib = iclip(0, 51, qpav + bo);
            int alpha = alpha_t[ia], beta = beta_t[ib];
            if (alpha && beta) {
                const int8_t *tct = tc0_t + ia * 3;
                if (vert) {
                    int xe = x0 + edge * 4;
                    for (int r = 0; r < 16; r++) {
                        int bs = bs4[r >> 2];
                        if (bs)
                            luma_line(y + (y0 + r) * W + xe - 4, 1, bs,
                                      alpha, beta, tct);
                    }
                } else {
                    int ye = y0 + edge * 4;
                    for (int c = 0; c < 16; c++) {
                        int bs = bs4[c >> 2];
                        if (bs)
                            luma_line(y + (ye - 4) * W + x0 + c, W, bs,
                                      alpha, beta, tct);
                    }
                }
            }
            if (edge == 0 || edge == 2) {
                uint8_t *planes[2] = {u, v};
                int coffs[2] = {coff0, coff1};
                for (int pi = 0; pi < 2; pi++) {
                    int qc = chroma_qp_t[iclip(0, 51, qp_cur + coffs[pi])];
                    int qn = chroma_qp_t[iclip(0, 51, qp_nb + coffs[pi])];
                    int cav = (qc + qn + 1) >> 1;
                    int cia = iclip(0, 51, cav + ao);
                    int cib = iclip(0, 51, cav + bo);
                    int calpha = alpha_t[cia], cbeta = beta_t[cib];
                    if (!calpha || !cbeta) continue;
                    const int8_t *tct = tc0_t + cia * 3;
                    if (vert) {
                        int xe = cx0 + (edge / 2) * 4;
                        for (int r = 0; r < 8; r++) {
                            int bs = bs4[r >> 1];
                            if (bs)
                                chroma_line(planes[pi] + (cy0 + r) * CW
                                            + xe - 2, 1, bs, calpha, cbeta,
                                            tct);
                        }
                    } else {
                        int ye = cy0 + (edge / 2) * 4;
                        for (int c = 0; c < 8; c++) {
                            int bs = bs4[c >> 1];
                            if (bs)
                                chroma_line(planes[pi] + (ye - 2) * CW
                                            + cx0 + c, CW, bs, calpha,
                                            cbeta, tct);
                        }
                    }
                }
            }
        }
    }
}
