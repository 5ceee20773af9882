"""Device-side CAVLC entropy: whole-slice tokenization + bit packing in JAX.

This moves the encoder's two-phase entropy (SURVEY.md §7) fully onto the
TPU: the jitted core's symbol tensors are turned into (value, length)
token grids by batched table lookups, and the tokens are packed into
the final RBSP byte stream on device — so the only per-frame
device->host transfer is the packed bitstream itself (~tens of KB),
not megabytes of symbol tensors.

TPU-shaped design decisions (each replaces a scalar-gather/sort
formulation that measured 10-50x slower on v5e):

- residual_tokens walks the 16 coefficient positions in REVERSE as a
  static loop with vector state (running t1/suffix-length/run
  counters), instead of argsort + take_along_axis. Token slots are
  keyed by scan position; CAVLC's emission order (trailing-one signs,
  then levels, then runs, each from the highest frequency down) is
  exactly descending scan position, so slot order == stream order and
  no compaction inside the block is needed.
- zigzag / z-scan reorders are constant one-hot matmuls (MXU), not
  gathers.
- the packer compacts live tokens with ONE scatter of a fused
  (len << 16 | val) word (every CAVLC/header token value fits 16 bits;
  a token's length can exceed 16 while its VALUE stays small because
  long codes are unary-prefixed), then derives bit offsets by cumsum
  over the compacted lengths only.

Parity anchors: WelsSpatialWriteMbSyn (svc_set_mb_syn_cavlc.cpp:260)
for the syntax order, WelsEncodeNal (nal_encap.cpp:120) for the final
byte-level framing (done on host after download).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..tables import ZIGZAG_4x4
from ..tables.cavlc import (CBP_INTER_INV, COEFF_TOKEN, RUN_BEFORE,
                            TOTAL_ZEROS, TOTAL_ZEROS_CHROMA_DC)
from ..decoder.framedata import ZSCAN_TO_RASTER

# per-residual-block slot layout: 1 coeff_token + 16 sign-or-level
# (descending scan position; a position holds a t1 sign xor a level)
# + 1 total_zeros + 16 run_before (descending current position)
RES_SLOTS = 34
P_SLOTS = 6 + RES_SLOTS * (1 + 16 + 2 + 8)
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


def _perm_last(x, perm):
    """out[..., i] = x[..., perm[i]] as a one-hot matmul (values must be
    integers with |x| < 2**23 for exact f32 accumulation)."""
    m = len(perm)
    P = jnp.asarray(np.eye(x.shape[-1], dtype=np.float32)[np.asarray(perm)].T)
    r = jnp.einsum("...c,ci->...i", x.astype(jnp.float32), P[:, :m])
    return r.astype(jnp.int32)


def _perm_mid(x, perm):
    """out[:, i, :] = x[:, perm[i], :] (one-hot matmul on the middle axis)."""
    P = jnp.asarray(np.eye(x.shape[1], dtype=np.float32)[np.asarray(perm)])
    r = jnp.einsum("nbc,ib->nic", x.astype(jnp.float32), P)
    return r.astype(jnp.int32)


def _lut(table_np, idx):
    """Constant-table lookup as a one-hot f32 matmul (values < 2**24).

    XLA lowers jnp gathers to scalar loads on TPU (~150 M elem/s); a
    compare + small matmul stays on the vector/matrix units.
    table_np: [n, m] numpy constant; idx: [B] int32 in [0, n).
    Returns [B, m] int32.
    """
    n = table_np.shape[0]
    T = jnp.asarray(table_np, jnp.float32)
    oh = (idx[:, None] == jnp.arange(n, dtype=jnp.int32)[None, :]
          ).astype(jnp.float32)
    return (oh @ T).astype(jnp.int32)


def residual_tokens(coeffs, nc, max_coeff: int):
    """coeffs: [B, mc] int32 levels in scan order; nc: [B] int32 (-1 for
    chroma DC). Returns (vals [B,34] u32, lens [B,34] u8, total [B]).

    Slot order within a block equals CAVLC stream order (see module
    docstring); slot INDICES differ from the emission index, which is
    fine because the packer only keeps nonzero-length slots in order.
    """
    B, mc = coeffs.shape
    assert mc == max_coeff
    c = coeffs.astype(jnp.int32)
    nzm = c != 0
    total = nzm.sum(1).astype(jnp.int32)
    pos = jnp.arange(mc, dtype=jnp.int32)
    lastnz = jnp.max(jnp.where(nzm, pos[None, :], -1), axis=1)
    zeros_total = lastnz + 1 - total

    zero_u = jnp.zeros(B, jnp.uint32)
    zero_b = jnp.zeros(B, jnp.uint8)
    sign_v = [zero_u] * 16
    sign_l = [zero_b] * 16
    run_v = [zero_u] * 16
    run_l = [zero_b] * 16

    i32 = jnp.int32
    cnt = jnp.zeros(B, i32)
    t1cnt = jnp.zeros(B, i32)
    t1open = jnp.ones(B, bool)
    lev_started = jnp.zeros(B, bool)
    sl = jnp.zeros(B, i32)
    prevpos = jnp.zeros(B, i32)
    zl = jnp.where((total > 0) & (total < mc), zeros_total, 0)
    rb_np = np.asarray(RUN_BEFORE).reshape(-1, 2)   # [(zl,run) -> v,l]
    rb_runs = np.asarray(RUN_BEFORE).shape[1]

    for step in range(mc):
        p = mc - 1 - step
        v = c[:, p]
        nz = v != 0
        absl = jnp.abs(v)
        take_t1 = nz & t1open & (absl == 1) & (t1cnt < 3)
        sign_v[step] = jnp.where(take_t1, (v < 0), 0).astype(jnp.uint32)
        is_level = nz & ~take_t1
        t1cnt = t1cnt + take_t1
        t1open = t1open & ~is_level

        first_level = is_level & ~lev_started
        sl = jnp.where(first_level,
                       ((total > 10) & (t1cnt < 3)).astype(i32), sl)
        lc = ((absl - 1) << 1) | (v < 0)
        lc = jnp.where(first_level & (t1cnt < 3), lc - 2, lc)
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
        lv_val = jnp.where(use0, v0, vs)
        lv_len = jnp.where(use0, l0, ls)
        # sign xor level share the position slot
        sign_v[step] = jnp.where(is_level, lv_val, sign_v[step])
        sign_l[step] = jnp.where(take_t1, 1,
                                 jnp.where(is_level, lv_len, 0)
                                 ).astype(jnp.uint8)
        sl = jnp.where(is_level & (sl == 0), 1, sl)
        sl = jnp.where(is_level & (absl > (3 << jnp.maximum(sl - 1, 0)))
                       & (sl < 6), sl + 1, sl)
        lev_started = lev_started | is_level

        emit_run = nz & (cnt >= 1) & (zl > 0)
        run = prevpos - p - 1
        rb_idx = jnp.clip(zl, 0, 7) * rb_runs + jnp.clip(run, 0, rb_runs - 1)
        rb = _lut(rb_np, jnp.where(emit_run, rb_idx, 0))
        run_v[step] = jnp.where(emit_run, rb[:, 0], 0).astype(jnp.uint32)
        run_l[step] = jnp.where(emit_run, rb[:, 1], 0).astype(jnp.uint8)
        zl = jnp.where(emit_run, zl - run, zl)
        prevpos = jnp.where(nz, p, prevpos)
        cnt = cnt + nz

    cls = jnp.where(nc < 0, 4,
                    jnp.where(nc < 2, 0,
                              jnp.where(nc < 4, 1, jnp.where(nc < 8, 2, 3))))
    ct_np = np.asarray(COEFF_TOKEN)
    tok = _lut(ct_np.reshape(-1, 2),
               (cls * ct_np.shape[1] + total) * ct_np.shape[2] + t1cnt)
    tz_act = (total > 0) & (total < mc)
    tz_np = np.asarray(TOTAL_ZEROS_CHROMA_DC if mc == 4 else TOTAL_ZEROS)
    tz_idx = (jnp.clip(total, 0, tz_np.shape[0] - 1) * tz_np.shape[1]
              + jnp.clip(zeros_total, 0, tz_np.shape[1] - 1))
    tz = _lut(tz_np.reshape(-1, 2), tz_idx)

    vals = jnp.stack([tok[:, 0].astype(jnp.uint32)] + sign_v
                     + [jnp.where(tz_act, tz[:, 0], 0).astype(jnp.uint32)]
                     + run_v, 1)
    lens = jnp.stack([tok[:, 1].astype(jnp.uint8)] + sign_l
                     + [jnp.where(tz_act, tz[:, 1], 0).astype(jnp.uint8)]
                     + run_l, 1)
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


def _nc_mb(tc_mb, mb_w: int, mb_h: int):
    """nC per luma 4x4 block from per-block counts, in MB layout.

    tc_mb: [n_mb, 16] counts (raster blocks). Returns [n_mb, 16] int32.
    Pure shifts/concats — no grid gathers.
    """
    g = tc_mb.reshape(mb_h, mb_w, 4, 4)
    neg = jnp.full((mb_h, mb_w, 4, 1), -1, jnp.int32)
    left_mb = jnp.concatenate(
        [neg[:, :1], g[:, :-1, :, 3:4]], axis=1)          # [mh,mw,4,1]
    na = jnp.concatenate([left_mb, g[:, :, :, :3]], axis=3)
    negt = jnp.full((mb_h, mb_w, 1, 4), -1, jnp.int32)
    top_mb = jnp.concatenate(
        [negt[:1], g[:-1, :, 3:4, :]], axis=0)
    nb = jnp.concatenate([top_mb, g[:, :, :3, :]], axis=2)
    both = (na >= 0) & (nb >= 0)
    nc = jnp.where(both, (na + nb + 1) >> 1, jnp.maximum(na, nb))
    return jnp.maximum(nc, 0).reshape(-1, 16)


def _nc_chroma(tc_c, mb_w: int, mb_h: int):
    """nC per chroma 4x4 block. tc_c: [n_mb, 2, 4] counts (comp, raster
    2x2 block). Returns [n_mb, 2, 4]."""
    g = tc_c.reshape(mb_h, mb_w, 2, 2, 2).transpose(2, 0, 1, 3, 4)
    neg = jnp.full((2, mb_h, mb_w, 2, 1), -1, jnp.int32)
    left_mb = jnp.concatenate([neg[:, :, :1], g[:, :, :-1, :, 1:2]], axis=2)
    na = jnp.concatenate([left_mb, g[..., :1]], axis=4)
    negt = jnp.full((2, mb_h, mb_w, 1, 2), -1, jnp.int32)
    top_mb = jnp.concatenate([negt[:, :1], g[:, :-1, :, 1:2, :]], axis=1)
    nb = jnp.concatenate([top_mb, g[:, :, :, :1, :]], axis=3)
    both = (na >= 0) & (nb >= 0)
    nc = jnp.where(both, (na + nb + 1) >> 1, jnp.maximum(na, nb))
    nc = jnp.maximum(nc, 0)
    return nc.transpose(1, 2, 0, 3, 4).reshape(-1, 2, 4)


_B8MAP = ((np.arange(16) // 8) * 2 + (np.arange(16) % 4) // 2)


def p_slice_tokens(out: dict, mb_w: int, mb_h: int, slice_qp,
                   n_valid=None):
    """Token grids for a whole P16x16 CAVLC slice body (device arrays).

    out: dict with mv [N,2], luma_ac [N,16,16], chroma_dc [N,2,4],
    chroma_ac [N,2,4,16], optional intra_mask/i16_mode/chroma_mode/
    luma_dc/mb_qp. Returns (vals [N,P_SLOTS+1] u32, lens u8): the final
    row's extra slot carries the trailing skip-run token.

    n_valid (traced, optional): only MBs [0, n_valid) are real; the
    rest are padding that must emit NO tokens and not count toward the
    trailing skip run — used to tokenize unequal slice bands as one
    batched (vmapped) call on padded equal-size grids.
    """
    n_mb = mb_w * mb_h
    mv = jnp.asarray(out["mv"], jnp.int32).reshape(mb_h, mb_w, 2)
    luma = jnp.asarray(out["luma_ac"], jnp.int32)
    cdc = jnp.asarray(out["chroma_dc"], jnp.int32)
    cac = jnp.asarray(out["chroma_ac"], jnp.int32)
    im = out.get("intra_mask")
    intra = (jnp.asarray(im, bool).reshape(n_mb) if im is not None
             else jnp.zeros(n_mb, bool))
    zz = np.asarray(ZIGZAG_4x4)
    zsr = np.asarray(ZSCAN_TO_RASTER)
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
    if n_valid is not None:
        nv = jnp.asarray(n_valid, jnp.int32)
        valid = ar < nv
        is_skip = is_skip & valid
        coded = coded & valid
        intra = intra & valid
    else:
        nv = n_mb
    lastc = jax.lax.cummax(jnp.where(coded, ar, -1))
    prevc = jnp.concatenate([jnp.full(1, -1, jnp.int32), lastc[:-1]])
    skiprun = ar - prevc - 1                      # valid where coded
    trailing = nv - 1 - lastc[-1]
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

    # ---- per-block coefficient counts + nC contexts (MB layout) ----
    zz_all = _perm_last(luma, zz)                            # [N,16,16] scan
    tc_full = jnp.count_nonzero(zz_all, axis=2)
    tc_i16 = jnp.count_nonzero(zz_all[:, :, 1:], axis=2)
    tc_blk = jnp.where(intra[:, None], tc_i16, tc_full)
    blk_coded = (cbp_luma[:, None] >> b8map[None, :]) & 1
    tc_blk = tc_blk * blk_coded * coded[:, None]
    nc_l = _nc_mb(tc_blk, mb_w, mb_h)                        # [N,16] raster
    cac_z = _perm_last(cac, zz)
    tc_c = jnp.count_nonzero(cac_z[..., 1:], axis=3)
    tc_c = tc_c * ((cbp_chroma == 2) & coded)[:, None, None]
    nc_c = _nc_chroma(tc_c, mb_w, mb_h)                      # [N,2,4]

    # ---- luma residual (z-scan block order) ----
    zz_z = _perm_mid(zz_all, zsr)                            # [N,16z,16]
    nc_lb = _perm_last(nc_l, zsr)                            # [N,16z]
    lv, ll, _ = residual_tokens(zz_z.reshape(-1, 16), nc_lb.reshape(-1), 16)
    lv = lv.reshape(n_mb, 16, RES_SLOTS)
    ll = ll.reshape(n_mb, 16, RES_SLOTS)
    wmask = (_perm_last(blk_coded, zsr) * coded[:, None]).astype(bool)
    dvv = jnp.zeros((n_mb, RES_SLOTS), jnp.uint32)
    dll = jnp.zeros((n_mb, RES_SLOTS), jnp.uint8)
    if im is not None:
        # the I16 token variants (15-coeff AC + luma DC) only run when
        # the frame actually contains intra MBs
        def intra_tokens(_):
            av15, al15, _t = residual_tokens(
                zz_z[:, :, 1:].reshape(-1, 15), nc_lb.reshape(-1), 15)
            av15 = av15.reshape(n_mb, 16, RES_SLOTS)
            al15 = al15.reshape(n_mb, 16, RES_SLOTS)
            lvi = jnp.where(intra[:, None, None], av15, lv)
            lli = jnp.where(intra[:, None, None], al15, ll)
            ldc = jnp.asarray(out["luma_dc"],
                              jnp.int32).reshape(-1, 16)[:n_mb]
            vv, lld, _t = residual_tokens(_perm_last(ldc, zz),
                                          nc_l[:, 0], 16)
            return (lvi, lli, jnp.where(intra[:, None], vv, 0),
                    (lld * intra[:, None]).astype(jnp.uint8))

        lv, ll, dvv, dll = jax.lax.cond(
            intra.any(), intra_tokens,
            lambda _: (lv, ll, dvv, dll), None)
    ll = ll * wmask[:, :, None]

    dcv, dcl, _ = residual_tokens(cdc.reshape(-1, 4),
                                  jnp.full(n_mb * 2, -1, jnp.int32), 4)
    dcv = dcv.reshape(n_mb, 2, RES_SLOTS)
    dcl = dcl.reshape(n_mb, 2, RES_SLOTS)
    dcl = dcl * ((cbp_chroma > 0) & coded)[:, None, None]

    acv, acl, _ = residual_tokens(
        cac_z[:, :, :, 1:].reshape(-1, 15), nc_c.reshape(-1), 15)
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
    zz = np.asarray(ZIGZAG_4x4)
    zsr = np.asarray(ZSCAN_TO_RASTER)

    cbp_luma = jnp.where(luma.reshape(n_mb, -1).any(1), 15, 0)
    cbp_chroma = jnp.where(cac.reshape(n_mb, -1).any(1), 2,
                           jnp.where(cdc.reshape(n_mb, -1).any(1), 1, 0))
    i16m = jnp.asarray(out["i16_mode"], jnp.int32).reshape(-1)[:n_mb]
    cmode = jnp.asarray(out["chroma_mode"], jnp.int32).reshape(-1)[:n_mb]
    mb_type = 1 + i16m + 4 * cbp_chroma + 12 * (cbp_luma != 0)

    hv = []
    hl = []
    v, l = _ue_bits(mb_type)
    hv.append(v)
    hl.append(l)
    v, l = _ue_bits(cmode)
    hv.append(v)
    hl.append(l)
    v, l = _se_bits(jnp.zeros(n_mb, jnp.int32))
    hv.append(v)
    hl.append(l)

    zz_all = _perm_last(luma, zz)
    tc_blk = jnp.count_nonzero(zz_all[:, :, 1:], axis=2)
    tc_blk = tc_blk * (cbp_luma != 0)[:, None]
    nc_l = _nc_mb(tc_blk, mb_w, mb_h)
    cac_z = _perm_last(cac, zz)
    tc_c = jnp.count_nonzero(cac_z[..., 1:], axis=3)
    tc_c = tc_c * (cbp_chroma == 2)[:, None, None]
    nc_c = _nc_chroma(tc_c, mb_w, mb_h)

    ldc = jnp.asarray(out["luma_dc"], jnp.int32).reshape(-1, 16)[:n_mb]
    dvv, dll, _ = residual_tokens(_perm_last(ldc, zz), nc_l[:, 0], 16)

    zz_z = _perm_mid(zz_all, zsr)
    nc_lb = _perm_last(nc_l, zsr)
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

    acv, acl, _ = residual_tokens(
        cac_z[:, :, :, 1:].reshape(-1, 15), nc_c.reshape(-1), 15)
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


def _compact_rows(combo, live, S: int):
    """Left-compact live tokens within each row by bit-plane shifts.

    Every live element's leftward move distance d = col - rank is
    non-decreasing along the row with steps <= 1, which makes moving by
    one distance bit per round collision-free (moved-from slots are
    cleared, moved-into slots only ever held dead data or a token that
    moved out in the same round). ~10 rounds of pure selects replace a
    3.3M-element scatter that measured 21 ms at 720p.
    """
    d = (jnp.arange(S, dtype=jnp.int32)[None, :]
         - (jnp.cumsum(live, 1).astype(jnp.int32) - 1))
    d = jnp.where(live, d, 0)
    combo = jnp.where(live, combo, 0)
    b = 0
    while (1 << b) < S:
        sh = 1 << b
        inc = jnp.pad(combo[:, sh:], ((0, 0), (0, sh)))
        incd = jnp.pad(d[:, sh:], ((0, 0), (0, sh)))
        move_in = (incd & sh) > 0
        moved_away = (d & sh) > 0
        combo = jnp.where(move_in, inc,
                          jnp.where(moved_away, 0, combo))
        d = jnp.where(move_in, incd - sh, jnp.where(moved_away, 0, d))
        b += 1
    return combo


def pack_tokens_device(vals, lens, start_bit, max_bytes: int,
                       max_tok: int = 1 << 18):
    """Pack (val,len) tokens MSB-first into a byte buffer on device.

    vals/lens: token grids whose row-major slot order is the stream
    order. start_bit: bit offset of the first token (the slice header's
    length mod 8, so the host can append the body directly after the
    header bytes). The rbsp stop bit is added by the host (it owns the
    final byte anyway).

    Tokens are fused into one word (len << 16 | val — every emitted
    value fits 16 bits because long codes are unary-prefixed), live
    tokens are left-compacted with bit-plane shifts (4.8 ms for a 3.3M
    slot grid vs 21 ms for the equivalent XLA scatter), and each token
    contributes <= 5 bytes via scatter-add (contributions of different
    tokens to one byte occupy disjoint bit ranges, so add == or).

    Returns (bytes u8 [max_bytes], end_bit i32 (absolute), overflow).
    """
    N = int(np.prod(lens.shape))
    max_tok = min(max_tok, N)
    ln = lens.reshape(1, -1).astype(jnp.uint32)
    combo = (ln << 16) | vals.reshape(1, -1).astype(jnp.uint32)
    live = ln > 0
    n_live = live.sum()
    cw = _compact_rows(combo, live, N)[0, :max_tok]
    cl = (cw >> 16).astype(jnp.int32)
    cv = cw & 0xFFFF

    start = jnp.asarray(start_bit, jnp.int32)
    off = start + jnp.cumsum(cl) - cl
    end_bit = start + ln.astype(jnp.int32).sum()

    shift = off & 7
    bpos = off >> 3
    outw = jnp.zeros(max_bytes, jnp.uint32)
    for i in range(5):
        s = cl + shift - 8 * (i + 1)
        byte = jnp.where(s >= 0,
                         cv >> jnp.minimum(jnp.maximum(s, 0), 31),
                         cv << jnp.minimum(jnp.maximum(-s, 0), 31)) & 0xFF
        byte = jnp.where(cl > 0, byte, 0).astype(jnp.uint32)
        outw = outw.at[bpos + i].add(byte, mode="drop")
    overflow = (n_live > max_tok) | (end_bit > 8 * max_bytes - 40)
    return outw.astype(jnp.uint8), end_bit, overflow
