"""Device-side CAVLC entropy: whole-slice tokenization + bit packing in JAX.

This moves the encoder's two-phase entropy (SURVEY.md §7) fully onto the
TPU: the jitted core's symbol tensors are turned into (value, length)
token grids by batched table lookups (a jnp port of cavlc_vec.py, which
tests hold bit-exact to the scalar writer), and the tokens are packed
into the final RBSP byte stream on device with a cumulative-offset
scatter — so the only per-frame device->host transfer is the packed
bitstream itself (~tens of KB), not megabytes of symbol tensors.

Parity anchors: WelsSpatialWriteMbSyn (svc_set_mb_syn_cavlc.cpp:260) for
the syntax order, WelsEncodeNal (nal_encap.cpp:120) for the final
byte-level framing (done on host after download).

The bit packer: token bit offsets are an exclusive cumsum of lengths;
live tokens are compacted by a mask-scatter; each token (<=28 bits,
arbitrary alignment) spans <=5 output bytes, contributed via 5
scatter-adds (contributions of different tokens to one byte occupy
disjoint bit ranges, so integer add == bitwise or).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..tables import ZIGZAG_4x4
from ..tables.cavlc import (CBP_INTER_INV, COEFF_TOKEN, RUN_BEFORE,
                            TOTAL_ZEROS, TOTAL_ZEROS_CHROMA_DC)
from ..decoder.framedata import ZSCAN_TO_RASTER

RES_SLOTS = 35
# per-MB slot layout of a P slice (matches cavlc_vec.write_p_slice_tokens):
# 6 header + 1 I16-DC block + 16 luma + 2 chroma-DC + 8 chroma-AC
P_SLOTS = 6 + RES_SLOTS * (1 + 16 + 2 + 8)
# I slice: 3 header (mb_type, chroma_mode, dqp) + same residual groups
I_SLOTS = 3 + RES_SLOTS * (1 + 16 + 2 + 8)


def _ue_bits(v):
    """Exp-Golomb ue(v) for int32 v >= 0 (exact for v < 2**24)."""
    v = jnp.asarray(v, jnp.int32)
    vp1 = v + 1
    nbits = jnp.zeros_like(vp1)
    for i in range(1, 25):
        nbits = nbits + (vp1 >= (1 << i)).astype(jnp.int32)
    return vp1.astype(jnp.uint32), (2 * nbits + 1).astype(jnp.uint8)


def _se_bits(v):
    v = jnp.asarray(v, jnp.int32)
    code = jnp.where(v > 0, 2 * v - 1, -2 * v)
    return _ue_bits(code)


def residual_tokens(coeffs, nc, max_coeff: int):
    """coeffs: [B, mc] int32 levels in scan order; nc: [B] int32 (-1 for
    chroma DC). Returns (vals [B,35] u32, lens [B,35] u8, total [B])."""
    B, mc = coeffs.shape
    assert mc == max_coeff
    c = coeffs.astype(jnp.int32)
    m = c != 0
    total = m.sum(1).astype(jnp.int32)

    order = jnp.argsort(jnp.logical_not(m), axis=1, stable=True)
    jj = jnp.arange(mc, dtype=jnp.int32)[None, :]
    pos = jnp.where(jj < total[:, None], order, 0)
    vnz = jnp.take_along_axis(c, order, 1)
    vnz = jnp.where(jj < total[:, None], vnz, 0)

    def at(j):
        jc = jnp.clip(j, 0, mc - 1)
        return jnp.take_along_axis(vnz, jc[:, None], 1)[:, 0]

    t_idx = total - 1
    c1 = (total >= 1) & (jnp.abs(at(t_idx)) == 1)
    c2 = c1 & (total >= 2) & (jnp.abs(at(t_idx - 1)) == 1)
    c3 = c2 & (total >= 3) & (jnp.abs(at(t_idx - 2)) == 1)
    t1 = c1.astype(jnp.int32) + c2 + c3

    cls = jnp.where(nc < 0, 4,
                    jnp.where(nc < 2, 0,
                              jnp.where(nc < 4, 1, jnp.where(nc < 8, 2, 3))))
    ct = jnp.asarray(COEFF_TOKEN, jnp.int32)       # [5, 17, 4, 2]
    tok = ct[cls, total, t1]
    vals_cols = [tok[:, 0].astype(jnp.uint32)]
    lens_cols = [tok[:, 1].astype(jnp.uint8)]

    for k in range(3):
        sel = t1 > k
        vals_cols.append(jnp.where(sel, (at(t_idx - k) < 0), 0)
                         .astype(jnp.uint32))
        lens_cols.append(sel.astype(jnp.uint8))

    sl = ((total > 10) & (t1 < 3)).astype(jnp.int32)
    n_lev = total - t1
    for k in range(mc):
        j = n_lev - 1 - k
        act = j >= 0
        level = at(j)
        absl = jnp.abs(level)
        lc = ((absl - 1) << 1) | (level < 0)
        lc = jnp.where(act & (k == 0) & (t1 < 3), lc - 2, lc)
        lcu = lc.astype(jnp.uint32)
        v0 = jnp.where(lc < 14, jnp.uint32(1),
                       jnp.where(lc < 30,
                                 jnp.uint32(1 << 4) | ((lcu - 14) & 0xF),
                                 jnp.uint32(1 << 12) | ((lcu - 30) & 0xFFF)))
        l0 = jnp.where(lc < 14, lc + 1, jnp.where(lc < 30, 19, 28))
        sl1 = jnp.maximum(sl, 1)
        pre = lc >> sl1
        mask = (1 << sl1) - 1
        vs = jnp.where(pre < 15,
                       ((jnp.uint32(1) << sl.astype(jnp.uint32))
                        | (lcu & mask.astype(jnp.uint32))),
                       jnp.uint32(1 << 12)
                       | ((lcu - (jnp.uint32(15) << sl1.astype(jnp.uint32)))
                          & 0xFFF))
        ls = jnp.where(pre < 15, pre + 1 + sl, 28)
        use0 = sl == 0
        val_k = jnp.where(use0, v0, vs)
        len_k = jnp.where(use0, l0, ls)
        vals_cols.append(jnp.where(act, val_k, 0).astype(jnp.uint32))
        lens_cols.append(jnp.where(act, len_k, 0).astype(jnp.uint8))
        sl = jnp.where(act & (sl == 0), 1, sl)
        sl = jnp.where(act & (absl > (3 << jnp.maximum(sl - 1, 0))) & (sl < 6),
                       sl + 1, sl)
    for _ in range(mc, 16):     # fixed 16 level slots (layout parity)
        vals_cols.append(jnp.zeros(B, jnp.uint32))
        lens_cols.append(jnp.zeros(B, jnp.uint8))

    last_pos = jnp.take_along_axis(
        pos, jnp.clip(total - 1, 0, mc - 1)[:, None], 1)[:, 0]
    zeros = last_pos + 1 - total
    tz_act = (total > 0) & (total < mc)
    tz_tab = jnp.asarray(
        TOTAL_ZEROS_CHROMA_DC if mc == 4 else TOTAL_ZEROS, jnp.int32)
    tz = tz_tab[jnp.clip(total, 0, tz_tab.shape[0] - 1),
                jnp.clip(zeros, 0, tz_tab.shape[1] - 1)]
    vals_cols.append(jnp.where(tz_act, tz[:, 0], 0).astype(jnp.uint32))
    lens_cols.append(jnp.where(tz_act, tz[:, 1], 0).astype(jnp.uint8))

    rb_tab = jnp.asarray(RUN_BEFORE, jnp.int32)
    zl = jnp.where(tz_act, zeros, 0)
    # at most 14 run_before tokens can be live (total=16 has no zeros)
    for k in range(min(mc - 1, 14)):
        j = total - 1 - k
        act = (j >= 1) & (zl > 0)
        jp = jnp.clip(j, 1, mc - 1)
        pj = jnp.take_along_axis(pos, jp[:, None], 1)[:, 0]
        pj1 = jnp.take_along_axis(pos, (jp - 1)[:, None], 1)[:, 0]
        run = pj - pj1 - 1
        rb = rb_tab[jnp.clip(zl, 0, 7),
                    jnp.clip(run, 0, rb_tab.shape[1] - 1)]
        vals_cols.append(jnp.where(act, rb[:, 0], 0).astype(jnp.uint32))
        lens_cols.append(jnp.where(act, rb[:, 1], 0).astype(jnp.uint8))
        zl = jnp.where(act, zl - run, zl)
    for _ in range(min(mc - 1, 14), 14):
        vals_cols.append(jnp.zeros(B, jnp.uint32))
        lens_cols.append(jnp.zeros(B, jnp.uint8))

    vals = jnp.stack(vals_cols, 1)
    lens = jnp.stack(lens_cols, 1)
    return vals, lens, total


def _mvp_p16x16(mv, mb_w: int, mb_h: int, intra):
    """Vectorized median MVP + skip-MV (port of cavlc_vec._mvp_p16x16)."""
    mv = jnp.where(intra[..., None], 0, mv)
    z = jnp.zeros_like(mv)
    f = jnp.zeros((mb_h, mb_w), bool)
    availA = f.at[:, 1:].set(True)
    availB = f.at[1:, :].set(True)
    availC = f.at[1:, :-1].set(True)
    availD = f.at[1:, 1:].set(True)
    mvA = z.at[:, 1:].set(mv[:, :-1])
    mvB = z.at[1:, :].set(mv[:-1, :])
    mvC = z.at[1:, :-1].set(mv[:-1, 1:])
    mvD = z.at[1:, 1:].set(mv[:-1, :-1])
    fb = jnp.zeros((mb_h, mb_w), bool)
    inA = fb.at[:, 1:].set(intra[:, :-1])
    inB = fb.at[1:, :].set(intra[:-1, :])
    inC = fb.at[1:, :-1].set(intra[:-1, 1:])
    inD = fb.at[1:, 1:].set(intra[:-1, :-1])
    useC = availC
    mvc = jnp.where(useC[..., None], mvC, mvD)
    availc = availC | availD
    intrac = jnp.where(useC, inC, inD)
    matchA = availA & ~inA
    matchB = availB & ~inB
    matchC = availc & ~intrac
    n_match = matchA.astype(jnp.int32) + matchB + matchC
    a = jnp.where(availA[..., None], mvA, 0)
    b = jnp.where(availB[..., None], mvB, 0)
    cc = jnp.where(availc[..., None], mvc, 0)
    med = a + b + cc - jnp.minimum(jnp.minimum(a, b), cc) \
        - jnp.maximum(jnp.maximum(a, b), cc)
    one = jnp.where(matchA[..., None], mvA,
                    jnp.where(matchB[..., None], mvB, mvc))
    only_a = (~availB) & (~availc) & availA
    mvp = jnp.where((n_match == 1)[..., None], one,
                    jnp.where(only_a[..., None], mvA, med))
    a_zero = availA & ~inA & (mvA[..., 0] == 0) & (mvA[..., 1] == 0)
    b_zero = availB & ~inB & (mvB[..., 0] == 0) & (mvB[..., 1] == 0)
    skip_zero = (~availA) | (~availB) | a_zero | b_zero
    skip_mv = jnp.where(skip_zero[..., None], 0, mvp)
    return mvp, skip_mv


def _nc_from(nzc):
    h, w = nzc.shape
    na = jnp.full((h, w), -1, jnp.int32).at[:, 1:].set(nzc[:, :-1])
    nb = jnp.full((h, w), -1, jnp.int32).at[1:, :].set(nzc[:-1, :])
    both = (na >= 0) & (nb >= 0)
    nc = jnp.where(both, (na + nb + 1) >> 1, jnp.maximum(na, nb))
    return jnp.maximum(nc, 0)


_B8MAP = ((np.arange(16) // 8) * 2 + (np.arange(16) % 4) // 2)


def p_slice_tokens(out: dict, mb_w: int, mb_h: int, slice_qp):
    """Token grids for a whole P16x16 CAVLC slice body (device arrays).

    out: dict with mv [N,2], luma_ac [N,16,16], chroma_dc [N,2,4],
    chroma_ac [N,2,4,16], optional intra_mask/i16_mode/chroma_mode/
    luma_dc/mb_qp. Returns (vals [N,P_SLOTS+1] u32, lens u8): the final
    row's extra slot carries the trailing skip-run token.
    """
    n_mb = mb_w * mb_h
    mv = jnp.asarray(out["mv"], jnp.int32).reshape(mb_h, mb_w, 2)
    luma = jnp.asarray(out["luma_ac"], jnp.int32)
    cdc = jnp.asarray(out["chroma_dc"], jnp.int32)
    cac = jnp.asarray(out["chroma_ac"], jnp.int32)
    im = out.get("intra_mask")
    intra = (jnp.asarray(im, bool).reshape(n_mb) if im is not None
             else jnp.zeros(n_mb, bool))
    zz = jnp.asarray(ZIGZAG_4x4)
    zsr = jnp.asarray(ZSCAN_TO_RASTER)
    b8map = jnp.asarray(_B8MAP, jnp.int32)

    nz_blk = luma.any(2)
    cbp_luma = jnp.zeros(n_mb, jnp.int32)
    for b8 in range(4):
        sel = np.nonzero(_B8MAP == b8)[0]
        cbp_luma |= nz_blk[:, sel].any(1).astype(jnp.int32) << b8
    cbp_luma = jnp.where(intra, jnp.where(nz_blk.any(1), 15, 0), cbp_luma)
    cbp_chroma = jnp.where(cac.reshape(n_mb, -1).any(1), 2,
                           jnp.where(cdc.reshape(n_mb, -1).any(1), 1, 0))
    cbp = cbp_luma | (cbp_chroma << 4)

    mvp, skip_mv = _mvp_p16x16(mv, mb_w, mb_h, intra.reshape(mb_h, mb_w))
    mvf = mv.reshape(n_mb, 2)
    is_skip = (cbp == 0) & (mvf == skip_mv.reshape(n_mb, 2)).all(1) & ~intra
    coded = ~is_skip
    ar = jnp.arange(n_mb, dtype=jnp.int32)
    lastc = jax.lax.cummax(jnp.where(coded, ar, -1))
    prevc = jnp.concatenate([jnp.full(1, -1, jnp.int32), lastc[:-1]])
    skiprun = ar - prevc - 1                      # valid where coded
    trailing = n_mb - 1 - lastc[-1]
    none_coded = lastc[-1] < 0

    hv = [jnp.zeros(n_mb, jnp.uint32) for _ in range(6)]
    hl = [jnp.zeros(n_mb, jnp.uint8) for _ in range(6)]
    sv, sl_ = _ue_bits(jnp.maximum(skiprun, 0))
    hv[0] = jnp.where(coded, sv, 0)
    hl[0] = jnp.where(coded, sl_, 0)

    mb_qp = out.get("mb_qp")
    if mb_qp is not None:
        mb_qp = jnp.asarray(mb_qp, jnp.int32).reshape(n_mb)
        res_mb = coded & ((cbp != 0) | intra)
        lastr = jax.lax.cummax(jnp.where(res_mb, ar, -1))
        prev_res = jnp.concatenate([jnp.full(1, -1, jnp.int32), lastr[:-1]])
        prev_qp = jnp.where(prev_res >= 0,
                            mb_qp[jnp.clip(prev_res, 0, None)],
                            jnp.asarray(slice_qp, jnp.int32))
        dqp = mb_qp - prev_qp
    else:
        dqp = jnp.zeros(n_mb, jnp.int32)

    mvd = mvf - mvp.reshape(n_mb, 2)
    inter_coded = coded & ~intra
    v, l = _ue_bits(jnp.zeros(n_mb, jnp.int32))   # mb_type P_L0_16x16
    hv[1] = jnp.where(inter_coded, v, 0)
    hl[1] = jnp.where(inter_coded, l, 0)
    v, l = _se_bits(mvd[:, 0])
    hv[2] = jnp.where(inter_coded, v, 0)
    hl[2] = jnp.where(inter_coded, l, 0)
    v, l = _se_bits(mvd[:, 1])
    hv[3] = jnp.where(inter_coded, v, 0)
    hl[3] = jnp.where(inter_coded, l, 0)
    cbp_inv = jnp.asarray(CBP_INTER_INV, jnp.int32)
    v, l = _ue_bits(cbp_inv[cbp])
    hv[4] = jnp.where(inter_coded, v, 0)
    hl[4] = jnp.where(inter_coded, l, 0)
    v, l = _se_bits(dqp)
    has_res = inter_coded & (cbp != 0)
    hv[5] = jnp.where(has_res, v, 0)
    hl[5] = jnp.where(has_res, l, 0)

    if im is not None:
        i16m = jnp.asarray(out["i16_mode"], jnp.int32).reshape(-1)[:n_mb]
        cmode = jnp.asarray(out["chroma_mode"], jnp.int32).reshape(-1)[:n_mb]
        raw = 1 + i16m + 4 * cbp_chroma + 12 * (cbp_luma != 0)
        v, l = _ue_bits(5 + raw)
        hv[1] = jnp.where(intra, v, hv[1])
        hl[1] = jnp.where(intra, l, hl[1])
        v, l = _ue_bits(cmode)
        hv[2] = jnp.where(intra, v, hv[2])
        hl[2] = jnp.where(intra, l, hl[2])
        v, l = _se_bits(dqp)
        hv[3] = jnp.where(intra, v, hv[3])
        hl[3] = jnp.where(intra, l, hl[3])
        hv[4] = jnp.where(intra, 0, hv[4])
        hl[4] = jnp.where(intra, 0, hl[4])
        hv[5] = jnp.where(intra, 0, hv[5])
        hl[5] = jnp.where(intra, 0, hl[5])

    # ---- nzc grids for nC ----
    zz_all = luma[:, :, zz]
    tc_blk = jnp.count_nonzero(zz_all, axis=2)
    tc_blk_i16 = jnp.count_nonzero(zz_all[:, :, 1:], axis=2)
    tc_blk = jnp.where(intra[:, None], tc_blk_i16, tc_blk)
    blk_coded = (cbp_luma[:, None] >> b8map[None, :]) & 1
    tc_blk = tc_blk * blk_coded * coded[:, None]
    nzc_l = tc_blk.reshape(mb_h, mb_w, 4, 4).transpose(0, 2, 1, 3).reshape(
        mb_h * 4, mb_w * 4)
    cac_z = cac[:, :, :, zz]
    tc_c = jnp.count_nonzero(cac_z[..., 1:], axis=3)
    tc_c = tc_c * (cbp_chroma == 2)[:, None, None]
    nzc_c = tc_c.reshape(mb_h, mb_w, 2, 2, 2).transpose(
        2, 0, 3, 1, 4).reshape(2, mb_h * 2, mb_w * 2)

    nc_l = _nc_from(nzc_l)
    nc_u = _nc_from(nzc_c[0])
    nc_v = _nc_from(nzc_c[1])

    # ---- luma residual ----
    zz_z = zz_all[:, zsr, :]
    bx = (zsr % 4)[None, :] + (ar % mb_w)[:, None] * 4
    by = (zsr // 4)[None, :] + (ar // mb_w)[:, None] * 4
    nc_lb = nc_l[by, bx]
    lv, ll, _ = residual_tokens(zz_z.reshape(-1, 16), nc_lb.reshape(-1), 16)
    lv = lv.reshape(n_mb, 16, RES_SLOTS)
    ll = ll.reshape(n_mb, 16, RES_SLOTS)
    wmask = (blk_coded[:, zsr] * coded[:, None]).astype(bool)
    if im is not None:
        # I16 blocks: 15-coefficient AC tokens replace the 16-coeff ones
        av15, al15, _ = residual_tokens(
            zz_z[:, :, 1:].reshape(-1, 15), nc_lb.reshape(-1), 15)
        av15 = av15.reshape(n_mb, 16, RES_SLOTS)
        al15 = al15.reshape(n_mb, 16, RES_SLOTS)
        lv = jnp.where(intra[:, None, None], av15, lv)
        ll = jnp.where(intra[:, None, None], al15, ll)
    ll = ll * wmask[:, :, None]

    dvv = jnp.zeros((n_mb, RES_SLOTS), jnp.uint32)
    dll = jnp.zeros((n_mb, RES_SLOTS), jnp.uint8)
    if im is not None:
        ldc = jnp.asarray(out["luma_dc"], jnp.int32).reshape(-1, 16)[:n_mb]
        dc_scan = ldc[:, zz]
        gx0 = (ar % mb_w) * 4
        gy0 = (ar // mb_w) * 4
        vv, lld, _ = residual_tokens(dc_scan, nc_l[gy0, gx0], 16)
        dvv = jnp.where(intra[:, None], vv, 0)
        dll = (lld * intra[:, None]).astype(jnp.uint8)

    # ---- chroma ----
    dcv, dcl, _ = residual_tokens(cdc.reshape(-1, 4),
                                  jnp.full(n_mb * 2, -1, jnp.int32), 4)
    dcv = dcv.reshape(n_mb, 2, RES_SLOTS)
    dcl = dcl.reshape(n_mb, 2, RES_SLOTS)
    dcl = dcl * ((cbp_chroma > 0) & coded)[:, None, None]

    cx = (ar % mb_w)[:, None] * 2 + jnp.arange(4)[None, :] % 2
    cy = (ar // mb_w)[:, None] * 2 + jnp.arange(4)[None, :] // 2
    nc_ub = nc_u[cy, cx]
    nc_vb = nc_v[cy, cx]
    acv, acl, _ = residual_tokens(
        cac_z[:, :, :, 1:].reshape(-1, 15),
        jnp.stack([nc_ub, nc_vb], 1).reshape(-1), 15)
    acv = acv.reshape(n_mb, 2, 4, RES_SLOTS)
    acl = acl.reshape(n_mb, 2, 4, RES_SLOTS)
    acl = acl * ((cbp_chroma == 2) & coded)[:, None, None, None]

    av = jnp.concatenate([
        jnp.stack(hv, 1), dvv, lv.reshape(n_mb, -1),
        dcv.reshape(n_mb, -1), acv.reshape(n_mb, -1)], 1)
    al = jnp.concatenate([
        jnp.stack(hl, 1), dll, ll.reshape(n_mb, -1),
        dcl.reshape(n_mb, -1), acl.reshape(n_mb, -1)], 1)

    # trailing skip-run token in an extra final slot
    tv, tl = _ue_bits(jnp.maximum(trailing, 0))
    want_tail = (trailing > 0) | none_coded
    tail_v = jnp.zeros((n_mb, 1), jnp.uint32).at[n_mb - 1, 0].set(
        jnp.where(want_tail, tv, 0))
    tail_l = jnp.zeros((n_mb, 1), jnp.uint8).at[n_mb - 1, 0].set(
        jnp.where(want_tail, tl, 0).astype(jnp.uint8))
    return jnp.concatenate([av, tail_v], 1), jnp.concatenate([al, tail_l], 1)


def i_slice_tokens(out: dict, mb_w: int, mb_h: int):
    """Token grids for an all-I16x16 CAVLC slice body."""
    n_mb = mb_w * mb_h
    luma = jnp.asarray(out["luma_ac"], jnp.int32)
    cdc = jnp.asarray(out["chroma_dc"], jnp.int32)
    cac = jnp.asarray(out["chroma_ac"], jnp.int32)
    zz = jnp.asarray(ZIGZAG_4x4)
    zsr = jnp.asarray(ZSCAN_TO_RASTER)
    ar = jnp.arange(n_mb, dtype=jnp.int32)

    cbp_luma = jnp.where(luma.reshape(n_mb, -1).any(1), 15, 0)
    cbp_chroma = jnp.where(cac.reshape(n_mb, -1).any(1), 2,
                           jnp.where(cdc.reshape(n_mb, -1).any(1), 1, 0))
    i16m = jnp.asarray(out["i16_mode"], jnp.int32).reshape(-1)[:n_mb]
    cmode = jnp.asarray(out["chroma_mode"], jnp.int32).reshape(-1)[:n_mb]
    mb_type = 1 + i16m + 4 * cbp_chroma + 12 * (cbp_luma != 0)

    hv = []
    hl = []
    v, l = _ue_bits(mb_type)
    hv.append(v); hl.append(l)
    v, l = _ue_bits(cmode)
    hv.append(v); hl.append(l)
    v, l = _se_bits(jnp.zeros(n_mb, jnp.int32))
    hv.append(v); hl.append(l)

    zz_all = luma[:, :, zz]
    tc_blk = jnp.count_nonzero(zz_all[:, :, 1:], axis=2)
    tc_blk = tc_blk * (cbp_luma != 0)[:, None]
    nzc_l = tc_blk.reshape(mb_h, mb_w, 4, 4).transpose(0, 2, 1, 3).reshape(
        mb_h * 4, mb_w * 4)
    cac_z = cac[:, :, :, zz]
    tc_c = jnp.count_nonzero(cac_z[..., 1:], axis=3)
    tc_c = tc_c * (cbp_chroma == 2)[:, None, None]
    nzc_c = tc_c.reshape(mb_h, mb_w, 2, 2, 2).transpose(
        2, 0, 3, 1, 4).reshape(2, mb_h * 2, mb_w * 2)
    nc_l = _nc_from(nzc_l)
    nc_u = _nc_from(nzc_c[0])
    nc_v = _nc_from(nzc_c[1])

    ldc = jnp.asarray(out["luma_dc"], jnp.int32).reshape(-1, 16)[:n_mb]
    gx0 = (ar % mb_w) * 4
    gy0 = (ar // mb_w) * 4
    dvv, dll, _ = residual_tokens(ldc[:, zz], nc_l[gy0, gx0], 16)

    zz_z = zz_all[:, zsr, :]
    bx = (zsr % 4)[None, :] + (ar % mb_w)[:, None] * 4
    by = (zsr // 4)[None, :] + (ar // mb_w)[:, None] * 4
    nc_lb = nc_l[by, bx]
    lv, ll, _ = residual_tokens(
        zz_z[:, :, 1:].reshape(-1, 15), nc_lb.reshape(-1), 15)
    lv = lv.reshape(n_mb, 16, RES_SLOTS)
    ll = ll.reshape(n_mb, 16, RES_SLOTS)
    ll = ll * (cbp_luma != 0)[:, None, None]

    dcv, dcl, _ = residual_tokens(cdc.reshape(-1, 4),
                                  jnp.full(n_mb * 2, -1, jnp.int32), 4)
    dcv = dcv.reshape(n_mb, 2, RES_SLOTS)
    dcl = dcl.reshape(n_mb, 2, RES_SLOTS)
    dcl = dcl * (cbp_chroma > 0)[:, None, None]

    cx = (ar % mb_w)[:, None] * 2 + jnp.arange(4)[None, :] % 2
    cy = (ar // mb_w)[:, None] * 2 + jnp.arange(4)[None, :] // 2
    acv, acl, _ = residual_tokens(
        cac_z[:, :, :, 1:].reshape(-1, 15),
        jnp.stack([nc_u[cy, cx], nc_v[cy, cx]], 1).reshape(-1), 15)
    acv = acv.reshape(n_mb, 2, 4, RES_SLOTS)
    acl = acl.reshape(n_mb, 2, 4, RES_SLOTS)
    acl = acl * (cbp_chroma == 2)[:, None, None, None]

    av = jnp.concatenate([
        jnp.stack(hv, 1), dvv, lv.reshape(n_mb, -1),
        dcv.reshape(n_mb, -1), acv.reshape(n_mb, -1)], 1)
    al = jnp.concatenate([
        jnp.stack(hl, 1), dll, ll.reshape(n_mb, -1),
        dcl.reshape(n_mb, -1), acl.reshape(n_mb, -1)], 1)
    return av, al


def pack_tokens_device(vals, lens, start_bit, max_tokens: int,
                       max_bytes: int):
    """Pack (val,len) tokens MSB-first into a byte buffer on device.

    vals/lens: arbitrary-shape token grids, flattened row-major (the
    stream order). start_bit: bit offset of the first token (the slice
    header's length mod 8, so the host can append the body directly
    after the header bytes). A final rbsp stop bit is appended.

    Returns (bytes u8 [max_bytes], n_bits i32, overflow bool).
    """
    v = vals.reshape(-1).astype(jnp.uint32)
    ln = lens.reshape(-1).astype(jnp.int32)
    start = jnp.asarray(start_bit, jnp.int32)
    off = start + jnp.cumsum(ln) - ln
    total_bits = off[-1] + ln[-1]

    live = ln > 0
    cpos = jnp.cumsum(live) - 1
    n_live = cpos[-1] + 1
    tgt = jnp.where(live, cpos, max_tokens)
    cv = jnp.zeros(max_tokens + 1, jnp.uint32).at[tgt].set(v, mode="drop")
    cl = jnp.zeros(max_tokens + 1, jnp.int32).at[tgt].set(ln, mode="drop")
    co = jnp.zeros(max_tokens + 1, jnp.int32).at[tgt].set(off, mode="drop")
    # append the rbsp stop bit as one more token
    cv = cv.at[jnp.minimum(n_live, max_tokens)].set(1)
    cl = cl.at[jnp.minimum(n_live, max_tokens)].set(1)
    co = co.at[jnp.minimum(n_live, max_tokens)].set(total_bits)
    total_bits = total_bits + 1

    shift = co & 7
    bpos = co >> 3
    outw = jnp.zeros(max_bytes, jnp.uint32)
    for i in range(5):
        s = cl + shift - 8 * (i + 1)
        byte = jnp.where(s >= 0,
                         cv >> jnp.minimum(jnp.maximum(s, 0), 31),
                         cv << jnp.minimum(jnp.maximum(-s, 0), 31)) & 0xFF
        byte = jnp.where(cl > 0, byte, 0).astype(jnp.uint32)
        outw = outw.at[bpos + i].add(byte, mode="drop")
    overflow = (n_live > max_tokens) | (total_bits > 8 * max_bytes - 40)
    return outw.astype(jnp.uint8), total_bits, overflow
