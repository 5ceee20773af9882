"""On-device in-loop deblocking for the encoder session (JAX).

Keeps the DPB feedback loop (recon -> deblock -> next frame's
reference) entirely on the TPU: with the ~25 ms/transfer tunnel to the
host, any per-frame host deblock would double the frame's transfer
budget. Bit-exact with oracle/deblock.py (itself the parity twin of
deblocking_common.cpp DeblockLuma{Lt4,Eq4}_c / DeblockChroma*_c and the
per-MB walk of encoder deblocking.cpp PerformDeblockingFilter:744).

Scheduling: H.264 deblock order is raster per MB (vertical edges then
horizontal). MB (x, y) reads pixels last written by MBs (x-1, y),
(x, y-1) and — via the left-neighbor columns that the next MB's
vertical pass touches — (x+1, y-1). All three precede (x, y) on the
knight wavefront d = x + 2y, and two MBs on the same diagonal write
disjoint pixels, so each diagonal batches on the vector unit and the
whole frame filters in mb_w + 2*mb_h - 2 sequential steps (168 at
720p) instead of mb_w*mb_h (3600).

The per-MB work is one 20x20 (luma) + two 10x10 (chroma) region
gather/scatter plus statically-sliced edge filters, so the wavefront
body compiles to fixed-shape vector code with no per-edge control flow.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..tables import ALPHA_TABLE, BETA_TABLE, TC0_TABLE


# ---------------------------------------------------------------------------
# Boundary strengths (encoder frames: I16x16 / P16x16 / PSKIP, single ref)
# ---------------------------------------------------------------------------
def encoder_bs(nz_blk, intra, mv, mb_w: int, mb_h: int):
    """BSV/BSH grids [mb_h*4, mb_w*4] for an encoder-produced frame.

    nz_blk: [n_mb, 16] bool — per-4x4-block (raster in MB) nonzero flag;
    intra:  [n_mb] bool; mv: [n_mb, 2] int (quarter-pel, ref 0).
    Rules: spec 8.7.2.1 specialized to single-list ref-0 P16x16 frames
    (parity: encoder deblocking.cpp DeblockingBSCalcEnc).
    """
    H4, W4 = mb_h * 4, mb_w * 4
    nz = jnp.asarray(nz_blk, bool).reshape(mb_h, mb_w, 4, 4).transpose(
        0, 2, 1, 3).reshape(H4, W4)
    ig = jnp.repeat(jnp.repeat(jnp.asarray(intra, bool).reshape(mb_h, mb_w),
                               4, 0), 4, 1)
    mvg = jnp.repeat(jnp.repeat(
        jnp.asarray(mv, jnp.int32).reshape(mb_h, mb_w, 2), 4, 0), 4, 1)

    def far(a, b):
        return (jnp.abs(a[..., 0] - b[..., 0]) >= 4) | \
               (jnp.abs(a[..., 1] - b[..., 1]) >= 4)

    def edges(ip, iq, mbb):
        bs = far(mvg[ip], mvg[iq]).astype(jnp.int32)
        bs = jnp.where(nz[ip] | nz[iq], 2, bs)
        bs = jnp.where(mbb & (ig[ip] | ig[iq]), 4, bs)
        bs = jnp.where(~mbb & ig[iq], 3, bs)
        return bs

    mbb_v = jnp.broadcast_to((jnp.arange(1, W4) % 4 == 0)[None, :],
                             (H4, W4 - 1))
    mbb_h = jnp.broadcast_to((jnp.arange(1, H4) % 4 == 0)[:, None],
                             (H4 - 1, W4))
    BSV = jnp.zeros((H4, W4), jnp.int32).at[:, 1:].set(
        edges(np.s_[:, :-1], np.s_[:, 1:], mbb_v))
    BSH = jnp.zeros((H4, W4), jnp.int32).at[1:, :].set(
        edges(np.s_[:-1, :], np.s_[1:, :], mbb_h))
    return BSV, BSH


# ---------------------------------------------------------------------------
# Edge filters (vectorized, int32; parity: deblocking_common.cpp)
# ---------------------------------------------------------------------------
def _luma_edge(sub, bs, alpha, beta, tc0):
    """sub: [..., 8] int32 (p3..q3 across the edge); bs/tc0: [...];
    alpha/beta broadcastable. Returns new [..., 6] (p2..q2)."""
    p3, p2, p1, p0, q0, q1, q2, q3 = [sub[..., i] for i in range(8)]
    d0 = p0 - q0
    act = (bs > 0) & (jnp.abs(d0) < alpha) & \
        (jnp.abs(p1 - p0) < beta) & (jnp.abs(q1 - q0) < beta)
    ap = jnp.abs(p2 - p0) < beta
    aq = jnp.abs(q2 - q0) < beta
    is4 = bs == 4
    strong = jnp.abs(d0) < ((alpha >> 2) + 2)
    sp = ap & strong
    sq = aq & strong
    np0_4 = jnp.where(sp, (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3,
                      (2 * p1 + p0 + q1 + 2) >> 2)
    np1_4 = jnp.where(sp, (p2 + p1 + p0 + q0 + 2) >> 2, p1)
    np2_4 = jnp.where(sp, (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3, p2)
    nq0_4 = jnp.where(sq, (q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3,
                      (2 * q1 + q0 + p1 + 2) >> 2)
    nq1_4 = jnp.where(sq, (q2 + q1 + q0 + p0 + 2) >> 2, q1)
    nq2_4 = jnp.where(sq, (2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3, q2)
    tc = tc0 + ap + aq
    delta = jnp.clip(((q0 - p0) * 4 + (p1 - q1) + 4) >> 3, -tc, tc)
    np0_n = jnp.clip(p0 + delta, 0, 255)
    nq0_n = jnp.clip(q0 - delta, 0, 255)
    dp1 = jnp.clip((p2 + ((p0 + q0 + 1) >> 1) - 2 * p1) >> 1, -tc0, tc0)
    dq1 = jnp.clip((q2 + ((p0 + q0 + 1) >> 1) - 2 * q1) >> 1, -tc0, tc0)
    np1_n = jnp.where(ap, p1 + dp1, p1)
    nq1_n = jnp.where(aq, q1 + dq1, q1)
    np2 = jnp.where(act & is4, np2_4, p2)
    np1 = jnp.where(act, jnp.where(is4, np1_4, np1_n), p1)
    np0 = jnp.where(act, jnp.where(is4, np0_4, np0_n), p0)
    nq0 = jnp.where(act, jnp.where(is4, nq0_4, nq0_n), q0)
    nq1 = jnp.where(act, jnp.where(is4, nq1_4, nq1_n), q1)
    nq2 = jnp.where(act & is4, nq2_4, q2)
    return jnp.stack([np2, np1, np0, nq0, nq1, nq2], -1)


def _chroma_edge(sub, bs, alpha, beta, tc0):
    """sub: [..., 4] (p1 p0 q0 q1). Returns new [..., 2] (p0 q0)."""
    p1, p0, q0, q1 = [sub[..., i] for i in range(4)]
    act = (bs > 0) & (jnp.abs(p0 - q0) < alpha) & \
        (jnp.abs(p1 - p0) < beta) & (jnp.abs(q1 - q0) < beta)
    is4 = bs == 4
    np0_4 = (2 * p1 + p0 + q1 + 2) >> 2
    nq0_4 = (2 * q1 + q0 + p1 + 2) >> 2
    tc = tc0 + 1
    delta = jnp.clip(((q0 - p0) * 4 + (p1 - q1) + 4) >> 3, -tc, tc)
    np0_n = jnp.clip(p0 + delta, 0, 255)
    nq0_n = jnp.clip(q0 - delta, 0, 255)
    np0 = jnp.where(act, jnp.where(is4, np0_4, np0_n), p0)
    nq0 = jnp.where(act, jnp.where(is4, nq0_4, nq0_n), q0)
    return jnp.stack([np0, nq0], -1)


def _use_pallas() -> bool:
    import os
    return bool(os.environ.get("OPENH264_TPU_PALLAS_DEBLOCK"))


def deblock_frame_auto(y, u, v, BSV, BSH, qp_mb, cqp_mb,
                       mb_w: int, mb_h: int):
    """Product-path dispatch. The XLA sheared fori_loop is the default
    (~34 ms/frame at 720p on the shared v5e, dominated by the ~170
    serialized diagonal steps). The Pallas twin (deblock_pallas.py,
    bit-exact in interpreter mode) is opt-in via
    OPENH264_TPU_PALLAS_DEBLOCK: the current Mosaic release cannot
    lower the wavefront's halo interleave (value-level DUS/scatter are
    unimplemented and DMA slices must respect (8,128) tile
    boundaries), so the compiled path stays off by default."""
    if _use_pallas():
        from .deblock_pallas import deblock_frame_pallas
        return deblock_frame_pallas(y, u, v, BSV, BSH, qp_mb, cqp_mb,
                                    mb_w, mb_h)
    return deblock_frame_device(y, u, v, BSV, BSH, qp_mb, cqp_mb,
                                mb_w, mb_h)


def deblock_frame_device(y, u, v, BSV, BSH, qp_mb, cqp_mb,
                         mb_w: int, mb_h: int, unroll: int = 1):
    """Filter one frame in place (functionally); returns (y, u, v).

    y/u/v: uint8 planes (MB-aligned); BSV/BSH: [4*mb_h, 4*mb_w] int32;
    qp_mb / cqp_mb: [n_mb] int32 luma / chroma QP per MB.
    Single-slice semantics (left/top availability = picture border),
    alpha/beta offsets 0 — the fast-path session's configuration.

    Layout trick: the planes are SHEARED per MB-row band (band j shifts
    right by 32j luma / 16j chroma pixels), which maps every knight
    diagonal d = x + 2y onto ONE contiguous column band: all lanes'
    windows (including the top-halo rows owned by the band above) are
    plain dynamic slices, and write-back is one dynamic_update_slice —
    no gather/scatter at all in the sequential loop (an XLA gather
    formulation of the same schedule measured 88 ms at 720p; this one
    is pure vector copies).
    """
    H, W = y.shape
    Hc, Wc = u.shape
    alpha_t = jnp.asarray(ALPHA_TABLE, jnp.int32)
    beta_t = jnp.asarray(BETA_TABLE, jnp.int32)
    tc0_t = jnp.asarray(TC0_TABLE, jnp.int32)                # [52, 3]
    qp_g = jnp.asarray(qp_mb, jnp.int32).reshape(mb_h, mb_w)
    cqp_g = jnp.asarray(cqp_mb, jnp.int32).reshape(mb_h, mb_w)

    nd = mb_w + 2 * (mb_h - 1)
    # `unroll` diagonals run per loop iteration on one register-held
    # window (the loop body's per-op dispatch overhead dominated the
    # original 1-diagonal formulation: 168 x ~200 us at 720p); padded
    # trailing diagonals are no-ops (their lanes' bS masks to 0)
    ng = -(-nd // max(1, unroll))
    nd_pad = ng * max(1, unroll)
    OFF, OFFC = 36, 18
    WS = 16 * (nd_pad - 1) + 56 + 8
    WSC = 8 * (nd_pad - 1) + 28 + 8

    def shear(plane, size, off, ws):
        S = jnp.zeros((plane.shape[0], ws), jnp.int32)
        w = plane.shape[1]
        for j in range(mb_h):
            S = jax.lax.dynamic_update_slice(
                S, plane[j * size:(j + 1) * size].astype(jnp.int32),
                (j * size, off + 2 * size * j))
        return S

    def unshear(S, size, off, w):
        rows = []
        for j in range(mb_h):
            rows.append(jax.lax.dynamic_slice(
                S, (j * size, off + 2 * size * j), (size, w)))
        return jnp.concatenate(rows, 0)

    S = shear(y, 16, OFF, WS)
    # U and V stack along rows into ONE sheared array so every chroma
    # edge filter runs once over 2*J lanes instead of twice over J
    SUV = jnp.concatenate([shear(u, 8, OFFC, WSC),
                           shear(v, 8, OFFC, WSC)], 0)

    # per-lane (band) static aids
    jj = jnp.arange(mb_h, dtype=jnp.int32)                   # band index
    qp_top = jnp.concatenate([qp_g[:1], qp_g[:-1]], 0)       # [J, mbw]
    cqp_top = jnp.concatenate([cqp_g[:1], cqp_g[:-1]], 0)
    qp_gp = jnp.pad(qp_g, ((0, 0), (1, 1)), mode="edge")
    cqp_gp = jnp.pad(cqp_g, ((0, 0), (1, 1)), mode="edge")
    qp_topp = jnp.pad(qp_top, ((0, 0), (1, 1)), mode="edge")
    cqp_topp = jnp.pad(cqp_top, ((0, 0), (1, 1)), mode="edge")
    # BS reorganized per band: [J, 4, mbw*4] with x-padding of one MB
    BSVb = jnp.pad(BSV.reshape(mb_h, 4, mb_w * 4), ((0, 0), (0, 0), (4, 4)))
    BSHb = jnp.pad(BSH.reshape(mb_h, 4, mb_w * 4), ((0, 0), (0, 0), (4, 4)))

    def ab_tc(qa, qb, bs):
        qav = (qa + qb + 1) >> 1
        ia = jnp.clip(qav, 0, 51)
        return (alpha_t[ia][:, None], beta_t[ia][:, None],
                tc0_t[ia[:, None], jnp.clip(bs - 1, 0, 2)])

    def one_diag(C, CUV, d):
        """Filter one knight diagonal; C: [H,56], CUV: [2Hc,28] window
        values; returns the updated pair."""
        x = d - 2 * jj                                       # [J] MB x
        valid = (x >= 0) & (x < mb_w)
        xc = jnp.clip(x, 0, mb_w - 1)
        left_ok = valid & (x > 0)
        top_ok = valid & (jj > 0)

        Cb = C.reshape(mb_h, 16, 56)
        own = Cb[:, :, 32:52]                                # [J,16,20]
        halo = jnp.concatenate(
            [jnp.zeros((1, 4, 20), jnp.int32), Cb[:-1, 12:16, 0:20]], 0)
        R = jnp.concatenate([halo, own], 1)                  # [J,20,20]

        CUVb = CUV.reshape(2, mb_h, 8, 28)
        halo_c = jnp.concatenate(
            [jnp.zeros((2, 1, 2, 10), jnp.int32),
             CUVb[:, :-1, 6:8, 0:10]], 1)
        RUV = jnp.concatenate([halo_c, CUVb[:, :, :, 16:26]],
                              2).reshape(2 * mb_h, 10, 10)   # [2J,10,10]

        qc = jnp.take_along_axis(qp_gp, xc[:, None] + 1, 1)[:, 0]
        ql = jnp.take_along_axis(qp_gp, xc[:, None], 1)[:, 0]
        qt = jnp.take_along_axis(qp_topp, xc[:, None] + 1, 1)[:, 0]
        cqc = jnp.take_along_axis(cqp_gp, xc[:, None] + 1, 1)[:, 0]
        cql = jnp.take_along_axis(cqp_gp, xc[:, None], 1)[:, 0]
        cqt = jnp.take_along_axis(cqp_topp, xc[:, None] + 1, 1)[:, 0]

        for e in range(4):
            bsv4 = BSVb[jj[:, None], jnp.arange(4)[None, :],
                        (xc * 4 + 4 + e)[:, None]]           # [J,4]
            bs16 = jnp.repeat(bsv4, 4, axis=1)
            ok = left_ok if e == 0 else valid
            bs16 = bs16 * ok[:, None]
            qnb = ql if e == 0 else qc
            alpha, beta, tc0 = ab_tc(qc, qnb, bs16)
            sub = R[:, 4:20, 4 * e:4 * e + 8]
            new = _luma_edge(sub, bs16, alpha, beta, tc0)
            R = R.at[:, 4:20, 4 * e + 1:4 * e + 7].set(new)
            if e in (0, 2):
                ce = e // 2
                bs8 = jnp.repeat(bsv4, 2, axis=1)
                bs8 = bs8 * ok[:, None]
                cnb = cql if e == 0 else cqc
                ca, cb, ct = ab_tc(cqc, cnb, bs8)
                bs8s = jnp.tile(bs8, (2, 1))
                subc = RUV[:, 2:10, 4 * ce:4 * ce + 4]
                RUV = RUV.at[:, 2:10, 4 * ce + 1:4 * ce + 3].set(
                    _chroma_edge(subc, bs8s, jnp.tile(ca, (2, 1)),
                                 jnp.tile(cb, (2, 1)), jnp.tile(ct, (2, 1))))

        for e in range(4):
            bsh4 = BSHb[jj[:, None], e,
                        (xc[:, None]) * 4 + 4 + jnp.arange(4)[None, :]]
            bs16 = jnp.repeat(bsh4, 4, axis=1)
            ok = top_ok if e == 0 else valid
            bs16 = bs16 * ok[:, None]
            qnb = qt if e == 0 else qc
            alpha, beta, tc0 = ab_tc(qc, qnb, bs16)
            sub = R[:, 4 * e:4 * e + 8, 4:20].transpose(0, 2, 1)
            new = _luma_edge(sub, bs16, alpha, beta, tc0)
            R = R.at[:, 4 * e + 1:4 * e + 7, 4:20].set(
                new.transpose(0, 2, 1))
            if e in (0, 2):
                ce = e // 2
                bs8 = jnp.repeat(bsh4, 2, axis=1)
                bs8 = bs8 * ok[:, None]
                cnb = cqt if e == 0 else cqc
                ca, cb, ct = ab_tc(cqc, cnb, bs8)
                bs8s = jnp.tile(bs8, (2, 1))
                subc = RUV[:, 4 * ce:4 * ce + 4, 2:10].transpose(0, 2, 1)
                RUV = RUV.at[:, 4 * ce + 1:4 * ce + 3, 2:10].set(
                    _chroma_edge(subc, bs8s, jnp.tile(ca, (2, 1)),
                                 jnp.tile(cb, (2, 1)),
                                 jnp.tile(ct, (2, 1))).transpose(0, 2, 1))

        Cb2 = Cb.at[:, :, 32:52].set(R[:, 4:20, :])
        Cb2 = Cb2.at[:-1, 12:16, 0:20].set(R[1:, 0:4, :])
        RUVb = RUV.reshape(2, mb_h, 10, 10)
        CUVb2 = CUVb.at[:, :, :, 16:26].set(RUVb[:, :, 2:10, :])
        CUVb2 = CUVb2.at[:, :-1, 6:8, 0:10].set(RUVb[:, 1:, 0:2, :])
        return Cb2.reshape(H, 56), CUVb2.reshape(2 * Hc, 28)

    U = max(1, unroll)
    WL, WC = 16 * (U - 1) + 56, 8 * (U - 1) + 28

    def body(g, st):
        S, SUV = st
        Wv = jax.lax.dynamic_slice(S, (0, 16 * U * g), (H, WL))
        Wc = jax.lax.dynamic_slice(SUV, (0, 8 * U * g), (2 * Hc, WC))
        for u_ in range(U):
            d = U * g + u_
            C = jax.lax.slice(Wv, (0, 16 * u_), (H, 16 * u_ + 56))
            CUV = jax.lax.slice(Wc, (0, 8 * u_), (2 * Hc, 8 * u_ + 28))
            C2, CUV2 = one_diag(C, CUV, d)
            Wv = jax.lax.dynamic_update_slice(Wv, C2, (0, 16 * u_))
            Wc = jax.lax.dynamic_update_slice(Wc, CUV2, (0, 8 * u_))
        S = jax.lax.dynamic_update_slice(S, Wv, (0, 16 * U * g))
        SUV = jax.lax.dynamic_update_slice(SUV, Wc, (0, 8 * U * g))
        return S, SUV

    S, SUV = jax.lax.fori_loop(0, ng, body, (S, SUV))
    return (unshear(S, 16, OFF, W).astype(jnp.uint8),
            unshear(SUV[:Hc], 8, OFFC, Wc).astype(jnp.uint8),
            unshear(SUV[Hc:], 8, OFFC, Wc).astype(jnp.uint8))
