"""JAX/TPU encoder core: batched mode decision + transforms + recon.

TPU-first design (SURVEY.md §7): per-MB work runs over the whole MB
grid as tensor ops; the intra dependency chain runs as a wavefront over
MB anti-diagonals (lax.fori_loop with batched gathers/scatters inside);
motion search is a lax.scan over the candidate offset grid with
box-summed SAD maps; sub-pel refinement gathers from precomputed
half-pel planes (6-tap separable, computed once per reference frame).

Outputs are integer symbol tensors consumed by the host entropy stage;
reconstruction is bit-exact with the decoder's oracle (tests enforce).

Replaces the per-MB loops of the reference encoder
(svc_encode_slice.cpp:555-595, svc_base_layer_md.cpp,
svc_motion_estimate.cpp) with batched equivalents.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.transform import (dct4x4, dequant4x4, hadamard4x4, idct4x4_add,
                             luma_dc_dequant_ihadamard,
                             chroma_dc_dequant_ihadamard, quant4x4, quant_dc,
                             ihadamard4x4, wrap_i16)

I16_DC, I16_V, I16_H, I16_P = 2, 0, 1, 3


def _mb_blocks(x16):
    """[.., 16, 16] -> [.., 16, 4, 4] raster 4x4 blocks."""
    s = x16.shape[:-2]
    return x16.reshape(*s, 4, 4, 4, 4).transpose(*range(len(s)), -4, -2, -3, -1).reshape(*s, 16, 4, 4)


def _blocks_mb(blk):
    """[.., 16, 4, 4] -> [.., 16, 16]."""
    s = blk.shape[:-3]
    return blk.reshape(*s, 4, 4, 4, 4).transpose(*range(len(s)), -4, -2, -3, -1).reshape(*s, 16, 16)


def _chroma_blocks(x8):
    s = x8.shape[:-2]
    return x8.reshape(*s, 2, 4, 2, 4).transpose(*range(len(s)), -4, -2, -3, -1).reshape(*s, 4, 4, 4)


def _chroma_mb(blk):
    s = blk.shape[:-3]
    return blk.reshape(*s, 2, 2, 4, 4).transpose(*range(len(s)), -4, -2, -3, -1).reshape(*s, 8, 8)


# ---------------------------------------------------------------------------
# Intra 16x16 wavefront
# ---------------------------------------------------------------------------
def _predict_i16_batch(top, left, tl, has_top, has_left):
    """top: [D,16] left: [D,16] tl: [D]; returns preds [D,4,16,16] for
    modes (V,H,DC,Plane) and a validity mask [D,4]."""
    D = top.shape[0]
    i32 = jnp.int32
    top = top.astype(i32)
    left = left.astype(i32)
    v = jnp.broadcast_to(top[:, None, :], (D, 16, 16))
    h = jnp.broadcast_to(left[:, :, None], (D, 16, 16))
    both = has_top & has_left
    dc_val = jnp.where(
        both, (top.sum(-1) + left.sum(-1) + 16) >> 5,
        jnp.where(has_left, (left.sum(-1) + 8) >> 4,
                  jnp.where(has_top, (top.sum(-1) + 8) >> 4, 128)))
    dc = jnp.broadcast_to(dc_val[:, None, None], (D, 16, 16))
    # plane
    xs = jnp.arange(8, dtype=i32)
    tdiffs = top[:, 8 + xs]
    tneg = jnp.where(6 - xs[None, :] >= 0, top[:, jnp.clip(6 - xs, 0, 15)],
                     tl[:, None].astype(i32))
    hgrad = ((xs + 1)[None, :] * (tdiffs - tneg)).sum(-1)
    ldiffs = left[:, 8 + xs]
    lneg = jnp.where(6 - xs[None, :] >= 0, left[:, jnp.clip(6 - xs, 0, 15)],
                     tl[:, None].astype(i32))
    vgrad = ((xs + 1)[None, :] * (ldiffs - lneg)).sum(-1)
    a = 16 * (left[:, 15] + top[:, 15])
    b = (5 * hgrad + 32) >> 6
    c = (5 * vgrad + 32) >> 6
    xx = jnp.arange(16, dtype=i32)
    plane = (a[:, None, None] + b[:, None, None] * (xx[None, None, :] - 7)
             + c[:, None, None] * (xx[None, :, None] - 7) + 16) >> 5
    plane = jnp.clip(plane, 0, 255)
    preds = jnp.stack([v, h, dc, plane], axis=1)
    valid = jnp.stack([has_top, has_left,
                       jnp.ones_like(has_top), both], axis=1)
    return preds, valid


def _predict_chroma_batch(top, left, tl, has_top, has_left):
    """top/left: [D,8]; returns preds [D,4,8,8] (DC,H,V,Plane), valid [D,4]."""
    D = top.shape[0]
    i32 = jnp.int32
    top = top.astype(i32)
    left = left.astype(i32)
    both = has_top & has_left
    # DC per 4x4 quadrant (spec 8.3.4.1)
    tsum = top.reshape(D, 2, 4).sum(-1)   # [D,2] halves
    lsum = left.reshape(D, 2, 4).sum(-1)
    def qdc(qx, qy):
        corner = qx == qy
        if corner:
            return jnp.where(both, (tsum[:, qx] + lsum[:, qy] + 4) >> 3,
                             jnp.where(has_top, (tsum[:, qx] + 2) >> 2,
                                       jnp.where(has_left, (lsum[:, qy] + 2) >> 2, 128)))
        if qx == 1:
            return jnp.where(has_top, (tsum[:, 1] + 2) >> 2,
                             jnp.where(has_left, (lsum[:, 0] + 2) >> 2, 128))
        return jnp.where(has_left, (lsum[:, 1] + 2) >> 2,
                         jnp.where(has_top, (tsum[:, 0] + 2) >> 2, 128))
    dc = jnp.zeros((D, 8, 8), i32)
    for qy in range(2):
        for qx in range(2):
            val = qdc(qx, qy)
            dc = dc.at[:, qy * 4:qy * 4 + 4, qx * 4:qx * 4 + 4].set(
                jnp.broadcast_to(val[:, None, None], (D, 4, 4)))
    h = jnp.broadcast_to(left[:, :, None], (D, 8, 8))
    v = jnp.broadcast_to(top[:, None, :], (D, 8, 8))
    xs = jnp.arange(4, dtype=i32)
    tneg = jnp.where(2 - xs[None, :] >= 0, top[:, jnp.clip(2 - xs, 0, 7)],
                     tl[:, None].astype(i32))
    hgrad = ((xs + 1)[None, :] * (top[:, 4 + xs] - tneg)).sum(-1)
    lneg = jnp.where(2 - xs[None, :] >= 0, left[:, jnp.clip(2 - xs, 0, 7)],
                     tl[:, None].astype(i32))
    vgrad = ((xs + 1)[None, :] * (left[:, 4 + xs] - lneg)).sum(-1)
    a = 16 * (left[:, 7] + top[:, 7])
    b = (17 * hgrad + 16) >> 5
    c = (17 * vgrad + 16) >> 5
    xx = jnp.arange(8, dtype=i32)
    plane = (a[:, None, None] + b[:, None, None] * (xx[None, None, :] - 3)
             + c[:, None, None] * (xx[None, :, None] - 3) + 16) >> 5
    plane = jnp.clip(plane, 0, 255)
    preds = jnp.stack([dc, h, v, plane], axis=1)
    valid = jnp.stack([jnp.ones_like(both), has_left, has_top, both], axis=1)
    return preds, valid


def _transform_i16(src, pred, qp):
    """src/pred: [D,16,16]; returns (dc_lev [D,4,4], ac_lev [D,16,16]
    raster-blk/raster-coef, recon [D,16,16])."""
    res = src.astype(jnp.int32) - pred.astype(jnp.int32)
    blocks = _mb_blocks(res)
    coef = dct4x4(blocks)                       # [D,16,4,4]
    dcs = coef[..., 0, 0].reshape(-1, 4, 4)
    dc_lev = quant_dc(hadamard4x4(dcs), qp, True)
    ac_lev = quant4x4(coef, qp, True)
    ac_lev = ac_lev.at[..., 0, 0].set(0)
    rec_dc = luma_dc_dequant_ihadamard(dc_lev, qp)
    deq = dequant4x4(ac_lev, qp)
    deq = deq.at[..., 0, 0].set(rec_dc.reshape(-1, 16))
    rec = idct4x4_add(_mb_blocks(pred), deq)
    return dc_lev, ac_lev.reshape(-1, 16, 16), _blocks_mb(rec)


def _transform_chroma(src, pred, qp_c):
    """src/pred: [D,8,8]; returns (dc_lev [D,4], ac_lev [D,4,16], rec)."""
    res = src.astype(jnp.int32) - pred.astype(jnp.int32)
    blocks = _chroma_blocks(res)
    coef = dct4x4(blocks)
    dcs = coef[..., 0, 0].reshape(-1, 2, 2)
    dc_lev = quant_dc(_had2x2(dcs), qp_c, True)
    ac_lev = quant4x4(coef, qp_c, True)
    ac_lev = ac_lev.at[..., 0, 0].set(0)
    rec_dc = chroma_dc_dequant_ihadamard(dc_lev, qp_c)
    deq = dequant4x4(ac_lev, qp_c)
    deq = deq.at[..., 0, 0].set(rec_dc.reshape(-1, 4))
    rec = idct4x4_add(_chroma_blocks(pred), deq)
    return dc_lev.reshape(-1, 4), ac_lev.reshape(-1, 4, 16), _chroma_mb(rec)


def _had2x2(x):
    h = jnp.array([[1, 1], [1, -1]], jnp.int32)
    return h @ x.astype(jnp.int32) @ h.T


def _diag_indices(mb_w, mb_h):
    """Static wavefront tables: for each diagonal d, the MB coords.

    Invalid lanes point at DISTINCT dummy MBs in a padding row below the
    frame (never at real MBs): `.at[idx].set` with duplicate indices has
    unspecified winner order, so aliasing a real MB could revert it.
    """
    D = min(mb_w, mb_h)
    nd = mb_w + mb_h - 1
    mbx = np.zeros((nd, D), np.int32)
    mby = np.zeros((nd, D), np.int32)
    valid = np.zeros((nd, D), bool)
    for d in range(nd):
        j = 0
        for y in range(mb_h):
            x = d - y
            if 0 <= x < mb_w:
                mbx[d, j], mby[d, j], valid[d, j] = x, y, True
                j += 1
        for k in range(j, D):  # dummy row, one dummy MB per lane
            mbx[d, k], mby[d, k] = k, mb_h
    return mbx, mby, valid


@functools.partial(jax.jit, static_argnames=("mb_w", "mb_h"))
def encode_i_frame(y, u, v, qp, qp_c, mb_w: int, mb_h: int,
                   intra_mask=None, init_recon=None):
    """Wavefront I16x16 encode of a full frame (or of the masked MBs).

    y: [H,W] uint8 (MB aligned). intra_mask: [mb_h*mb_w] bool — MBs to
    encode as intra (None = all); init_recon: starting recon planes
    (for P frames: inter recon; intra MBs overwrite their area).
    Returns dict of symbol tensors + recon planes.
    """
    n_mb = mb_w * mb_h
    n_pad = (mb_h + 1) * mb_w  # extra dummy MB row absorbs invalid lanes
    if intra_mask is None:
        intra_mask = jnp.ones(n_mb, bool)
    if init_recon is None:
        rec_y = jnp.zeros_like(y)
        rec_u = jnp.zeros_like(u)
        rec_v = jnp.zeros_like(v)
    else:
        rec_y, rec_u, rec_v = init_recon
    # pad one MB row below the frame for dummy-lane scatters
    rec_y = jnp.pad(rec_y, ((0, 16), (0, 0)))
    rec_u = jnp.pad(rec_u, ((0, 8), (0, 0)))
    rec_v = jnp.pad(rec_v, ((0, 8), (0, 0)))

    mbx_t, mby_t, valid_t = _diag_indices(mb_w, mb_h)
    nd, D = mbx_t.shape
    mbx_t = jnp.asarray(mbx_t)
    mby_t = jnp.asarray(mby_t)
    valid_t = jnp.asarray(valid_t)

    out = {
        "i16_mode": jnp.zeros(n_pad, jnp.int32),
        "chroma_mode": jnp.zeros(n_pad, jnp.int32),
        "luma_dc": jnp.zeros((n_pad, 4, 4), jnp.int32),
        "luma_ac": jnp.zeros((n_pad, 16, 16), jnp.int32),
        "chroma_dc": jnp.zeros((n_pad, 2, 4), jnp.int32),
        "chroma_ac": jnp.zeros((n_pad, 2, 4, 16), jnp.int32),
    }

    ys16 = jnp.arange(16)
    xs16 = jnp.arange(16)

    def gather_mb(plane, px, py, size):
        idx_y = py[:, None] * size + jnp.arange(size)[None, :]
        idx_x = px[:, None] * size + jnp.arange(size)[None, :]
        return plane[idx_y[:, :, None], idx_x[:, None, :]]

    def scatter_mb(plane, px, py, vals, mask, size):
        idx_y = py[:, None] * size + jnp.arange(size)[None, :]
        idx_x = px[:, None] * size + jnp.arange(size)[None, :]
        cur = plane[idx_y[:, :, None], idx_x[:, None, :]]
        vals = jnp.where(mask[:, None, None], vals, cur)
        return plane.at[idx_y[:, :, None], idx_x[:, None, :]].set(vals)

    def body(d, carry):
        rec_y, rec_u, rec_v, out = carry
        px = mbx_t[d]
        py = mby_t[d]
        mb_idx = py * mb_w + px
        act = valid_t[d] & intra_mask[mb_idx]

        # ---- luma ----
        src = gather_mb(y, px, py, 16)
        has_top = py > 0
        has_left = px > 0
        ty = jnp.maximum(py * 16 - 1, 0)
        top = rec_y[ty[:, None], px[:, None] * 16 + xs16[None, :]]
        left = rec_y[py[:, None] * 16 + ys16[None, :],
                     jnp.maximum(px * 16 - 1, 0)[:, None]]
        tl = rec_y[ty, jnp.maximum(px * 16 - 1, 0)]
        preds, pvalid = _predict_i16_batch(top, left, tl, has_top, has_left)
        sads = jnp.abs(src[:, None].astype(jnp.int32)
                       - preds.astype(jnp.int32)).sum((-1, -2))
        sads = jnp.where(pvalid, sads, 1 << 30)
        mode = jnp.argmin(sads, axis=1).astype(jnp.int32)
        pred = jnp.take_along_axis(preds, mode[:, None, None, None],
                                   axis=1)[:, 0]
        dc_lev, ac_lev, rec = _transform_i16(src, pred, qp)
        rec_y = scatter_mb(rec_y, px, py, rec.astype(jnp.uint8), act, 16)

        # ---- chroma ----
        xs8 = jnp.arange(8)
        cty = jnp.maximum(py * 8 - 1, 0)
        ctop_u = rec_u[cty[:, None], px[:, None] * 8 + xs8[None, :]]
        cleft_u = rec_u[py[:, None] * 8 + xs8[None, :],
                        jnp.maximum(px * 8 - 1, 0)[:, None]]
        ctl_u = rec_u[cty, jnp.maximum(px * 8 - 1, 0)]
        ctop_v = rec_v[cty[:, None], px[:, None] * 8 + xs8[None, :]]
        cleft_v = rec_v[py[:, None] * 8 + xs8[None, :],
                        jnp.maximum(px * 8 - 1, 0)[:, None]]
        ctl_v = rec_v[cty, jnp.maximum(px * 8 - 1, 0)]
        src_u = gather_mb(u, px, py, 8)
        src_v = gather_mb(v, px, py, 8)
        pu, cvalid = _predict_chroma_batch(ctop_u, cleft_u, ctl_u, has_top, has_left)
        pv, _ = _predict_chroma_batch(ctop_v, cleft_v, ctl_v, has_top, has_left)
        csads = (jnp.abs(src_u[:, None].astype(jnp.int32) - pu).sum((-1, -2))
                 + jnp.abs(src_v[:, None].astype(jnp.int32) - pv).sum((-1, -2)))
        csads = jnp.where(cvalid, csads, 1 << 30)
        cmode = jnp.argmin(csads, axis=1).astype(jnp.int32)
        pred_u = jnp.take_along_axis(pu, cmode[:, None, None, None], axis=1)[:, 0]
        pred_v = jnp.take_along_axis(pv, cmode[:, None, None, None], axis=1)[:, 0]
        dcu, acu, rec_u_mb = _transform_chroma(src_u, pred_u, qp_c)
        dcv, acv, rec_v_mb = _transform_chroma(src_v, pred_v, qp_c)
        rec_u = scatter_mb(rec_u, px, py, rec_u_mb.astype(jnp.uint8), act, 8)
        rec_v = scatter_mb(rec_v, px, py, rec_v_mb.astype(jnp.uint8), act, 8)

        def upd(arr, vals):
            cur = arr[mb_idx]
            return arr.at[mb_idx].set(jnp.where(
                act.reshape((-1,) + (1,) * (vals.ndim - 1)), vals, cur))

        out = dict(out)
        out["i16_mode"] = upd(out["i16_mode"], mode)
        out["chroma_mode"] = upd(out["chroma_mode"], cmode)
        out["luma_dc"] = upd(out["luma_dc"], dc_lev)
        out["luma_ac"] = upd(out["luma_ac"], ac_lev)
        out["chroma_dc"] = upd(out["chroma_dc"], jnp.stack([dcu, dcv], 1))
        out["chroma_ac"] = upd(out["chroma_ac"], jnp.stack([acu, acv], 1))
        return rec_y, rec_u, rec_v, out

    rec_y, rec_u, rec_v, out = jax.lax.fori_loop(
        0, nd, body, (rec_y, rec_u, rec_v, out))
    out = {k: a[:n_mb] for k, a in out.items()}
    out["recon_y"] = rec_y[:-16]
    out["recon_u"] = rec_u[:-8]
    out["recon_v"] = rec_v[:-8]
    return out


# ---------------------------------------------------------------------------
# Motion estimation + P frame
# ---------------------------------------------------------------------------
def _halfpel_planes(ref):
    """6-tap half-pel planes for a full padded plane.

    ref: [H, W] uint8 (already border-padded by PAD).
    Returns (b, h, j) uint8 planes of the same size (b: half-x,
    h: half-y, j: center), spec §8.4.2.2.1 semantics per pixel.
    """
    r = ref.astype(jnp.int32)
    W = r.shape[-1]
    H = r.shape[-2]

    def shift_x(a, k):
        return jnp.roll(a, -k, axis=-1)

    def shift_y(a, k):
        return jnp.roll(a, -k, axis=-2)

    # b1[x] = r[x-2] -5r[x-1] +20r[x] +20r[x+1] -5r[x+2] + r[x+3]
    b1 = (shift_x(r, -2) - 5 * shift_x(r, -1) + 20 * r + 20 * shift_x(r, 1)
          - 5 * shift_x(r, 2) + shift_x(r, 3))
    b = jnp.clip((b1 + 16) >> 5, 0, 255)
    h1 = (shift_y(r, -2) - 5 * shift_y(r, -1) + 20 * r + 20 * shift_y(r, 1)
          - 5 * shift_y(r, 2) + shift_y(r, 3))
    h = jnp.clip((h1 + 16) >> 5, 0, 255)
    j1 = (shift_y(b1, -2) - 5 * shift_y(b1, -1) + 20 * b1 + 20 * shift_y(b1, 1)
          - 5 * shift_y(b1, 2) + shift_y(b1, 3))
    j = jnp.clip((j1 + 512) >> 10, 0, 255)
    return b.astype(jnp.uint8), h.astype(jnp.uint8), j.astype(jnp.uint8)


PAD = 24  # reference border padding (>= search range + filter taps)


def pad_ref(plane):
    """Replicate-pad a plane by PAD (like ExpandReferencingPicture)."""
    return jnp.pad(plane, PAD, mode="edge")


def _subpel_gather(G, B, Hh, J, px, py, fx, fy, size):
    """Gather a size x size prediction block for each MB.

    px/py: [N] integer top-left positions in PADDED coords;
    fx/fy: [N] quarter-pel fractions 0..3. Uses the quarter-pel
    averaging rules (Table 8-12) built from the 4 plane bank.
    """
    n = px.shape[0]
    off = jnp.arange(size)

    def gat(plane, ox, oy):
        iy = (py + oy)[:, None] + off[None, :]
        ix = (px + ox)[:, None] + off[None, :]
        return plane[iy[:, :, None], ix[:, None, :]].astype(jnp.int32)

    # component planes at integer offsets
    g00 = gat(G, 0, 0)
    g10 = gat(G, 1, 0)
    g01 = gat(G, 0, 1)
    b00 = gat(B, 0, 0)
    b01 = gat(B, 0, 1)
    h00 = gat(Hh, 0, 0)
    h10 = gat(Hh, 1, 0)
    j00 = gat(J, 0, 0)

    def avg(a, b):
        return (a + b + 1) >> 1

    # build all 16 fractional predictions then select (cheap: reuse terms)
    # yf rows of Table 8-12
    row0 = jnp.stack([g00, avg(g00, b00), b00, avg(g10, b00)], 0)
    row1 = jnp.stack([avg(g00, h00), avg(b00, h00), avg(b00, j00),
                      avg(b00, h10)], 0)
    row2 = jnp.stack([h00, avg(h00, j00), j00, avg(j00, h10)], 0)
    row3 = jnp.stack([avg(g01, h00), avg(h00, b01), avg(j00, b01),
                      avg(h10, b01)], 0)
    allp = jnp.stack([row0, row1, row2, row3], 0)  # [yf, xf, N, s, s]
    sel = allp[fy, fx, jnp.arange(n)]
    return sel


def _mc_chroma_batch(refc, px, py, fx, fy, size):
    """Bilinear chroma MC: px/py integer in padded chroma coords,
    fx/fy 0..7."""
    off = jnp.arange(size + 1)
    iy = py[:, None] + off[None, :]
    ix = px[:, None] + off[None, :]
    W = refc[iy[:, :, None], ix[:, None, :]].astype(jnp.int32)
    A = W[:, :size, :size]
    B = W[:, :size, 1:]
    C = W[:, 1:, :size]
    D = W[:, 1:, 1:]
    fx = fx[:, None, None]
    fy = fy[:, None, None]
    return ((8 - fx) * (8 - fy) * A + fx * (8 - fy) * B
            + (8 - fx) * fy * C + fx * fy * D + 32) >> 6


@functools.partial(jax.jit, static_argnames=("mb_w", "mb_h", "sr"))
def encode_p_frame(y, u, v, ref_y, ref_u, ref_v, qp, qp_c,
                   mb_w: int, mb_h: int, sr: int = 8, row_off=0):
    """Batched P-frame encode: full-pel scan ME + half/quarter refine,
    P16x16-only partitions, intra fallback handled by the caller via the
    returned SAD costs. Returns symbol tensors + inter recon planes.

    Band mode (slice-parallel): y/u/v may be a horizontal band of the
    frame while ref_* are FULL reference planes; `row_off` (may be
    traced, e.g. from lax.axis_index) is the band's top luma row. MC may
    then reach outside the band, matching H.264 slice semantics (inter
    prediction crosses slice boundaries; intra/entropy do not).
    """
    n_mb = mb_w * mb_h
    H, W = y.shape
    ry = pad_ref(ref_y)
    B, Hh, J = _halfpel_planes(ry)
    ru = pad_ref(ref_u)
    rv = pad_ref(ref_v)
    row_off = jnp.asarray(row_off, jnp.int32)

    src32 = y.astype(jnp.int32)

    # ---- integer full search over (2sr+1)^2 offsets ----
    offsets = jnp.stack(jnp.meshgrid(jnp.arange(-sr, sr + 1),
                                     jnp.arange(-sr, sr + 1),
                                     indexing="ij"), -1).reshape(-1, 2)

    def scan_body(carry, off):
        best_cost, best_mv = carry
        dy, dx = off[0], off[1]
        shifted = jax.lax.dynamic_slice(ry, (PAD + row_off + dy, PAD + dx),
                                        (H, W))
        sad = jnp.abs(src32 - shifted.astype(jnp.int32))
        mb_sad = sad.reshape(mb_h, 16, mb_w, 16).sum((1, 3)).reshape(-1)
        better = mb_sad < best_cost
        best_cost = jnp.where(better, mb_sad, best_cost)
        best_mv = jnp.where(better[:, None],
                            jnp.stack([dx, dy])[None, :], best_mv)
        return (best_cost, best_mv), None

    init = (jnp.full(n_mb, 1 << 30, jnp.int32), jnp.zeros((n_mb, 2), jnp.int32))
    (int_cost, int_mv), _ = jax.lax.scan(scan_body, init, offsets)

    # ---- sub-pel refinement: evaluate the 9 half then 9 quarter candidates
    mb_ids = jnp.arange(n_mb)
    mb_px = (mb_ids % mb_w) * 16
    mb_py = (mb_ids // mb_w) * 16 + row_off
    src_mb = y.reshape(mb_h, 16, mb_w, 16).transpose(0, 2, 1, 3).reshape(n_mb, 16, 16).astype(jnp.int32)

    def eval_qpel(mvq):
        """mvq: [N,2] quarter-pel MV; returns SAD [N]."""
        fx = (mvq[:, 0] % 4).astype(jnp.int32)
        fy = (mvq[:, 1] % 4).astype(jnp.int32)
        ix = PAD + mb_px + (mvq[:, 0] >> 2)
        iy = PAD + mb_py + (mvq[:, 1] >> 2)
        pred = _subpel_gather(ry, B, Hh, J, ix, iy, fx, fy, 16)
        return jnp.abs(src_mb - pred).sum((-1, -2))

    best_mv = int_mv * 4
    best_cost = int_cost
    for step in (2, 1):
        cands = []
        for dy in (-step, 0, step):
            for dx in (-step, 0, step):
                if dx == 0 and dy == 0:
                    continue
                cands.append(jnp.array([dx, dy], jnp.int32))
        for c in cands:
            mvq = best_mv + c[None, :]
            # clamp so padded access stays in range
            mvq = jnp.clip(mvq, -4 * (sr + 2), 4 * (sr + 2))
            cost = eval_qpel(mvq)
            better = cost < best_cost
            best_cost = jnp.where(better, cost, best_cost)
            best_mv = jnp.where(better[:, None], mvq, best_mv)

    # ---- final prediction + transform ----
    fx = (best_mv[:, 0] % 4).astype(jnp.int32)
    fy = (best_mv[:, 1] % 4).astype(jnp.int32)
    ix = PAD + mb_px + (best_mv[:, 0] >> 2)
    iy = PAD + mb_py + (best_mv[:, 1] >> 2)
    pred_y = _subpel_gather(ry, B, Hh, J, ix, iy, fx, fy, 16)

    res = src_mb - pred_y
    blocks = _mb_blocks(res)
    coef = dct4x4(blocks)
    lev = quant4x4(coef, qp, False)
    deq = dequant4x4(lev, qp)
    rec_blocks = idct4x4_add(_mb_blocks(pred_y), deq)
    rec_y_mb = _blocks_mb(rec_blocks)

    # chroma MC + transform
    cpx = (mb_ids % mb_w) * 8
    cpy = (mb_ids // mb_w) * 8 + (row_off >> 1)
    cfx = (best_mv[:, 0] % 8).astype(jnp.int32)
    cfy = (best_mv[:, 1] % 8).astype(jnp.int32)
    cix = PAD + cpx + (best_mv[:, 0] >> 3)
    ciy = PAD + cpy + (best_mv[:, 1] >> 3)
    src_u = u.reshape(mb_h, 8, mb_w, 8).transpose(0, 2, 1, 3).reshape(n_mb, 8, 8).astype(jnp.int32)
    src_v = v.reshape(mb_h, 8, mb_w, 8).transpose(0, 2, 1, 3).reshape(n_mb, 8, 8).astype(jnp.int32)
    pred_u = _mc_chroma_batch(ru, cix, ciy, cfx, cfy, 8)
    pred_v = _mc_chroma_batch(rv, cix, ciy, cfx, cfy, 8)

    def chroma_tx(src_c, pred_c):
        resc = src_c - pred_c
        cb = _chroma_blocks(resc)
        cf = dct4x4(cb)
        dcs = cf[..., 0, 0].reshape(-1, 2, 2)
        dc_lev = quant_dc(_had2x2(dcs), qp_c, False)
        ac_lev = quant4x4(cf, qp_c, False)
        ac_lev = ac_lev.at[..., 0, 0].set(0)
        rec_dc = chroma_dc_dequant_ihadamard(dc_lev, qp_c)
        dq = dequant4x4(ac_lev, qp_c)
        dq = dq.at[..., 0, 0].set(rec_dc.reshape(-1, 4))
        rec = idct4x4_add(_chroma_blocks(pred_c), dq)
        return dc_lev.reshape(-1, 4), ac_lev.reshape(-1, 4, 16), _chroma_mb(rec)

    dcu, acu, rec_u_mb = chroma_tx(src_u, pred_u)
    dcv, acv, rec_v_mb = chroma_tx(src_v, pred_v)

    # assemble recon planes from per-MB tiles
    def tiles_to_plane(tiles, size, ph, pw):
        return tiles.reshape(mb_h, mb_w, size, size).transpose(0, 2, 1, 3).reshape(ph, pw)

    rec_y_plane = tiles_to_plane(rec_y_mb.astype(jnp.uint8), 16, H, W)
    rec_u_plane = tiles_to_plane(rec_u_mb.astype(jnp.uint8), 8, H // 2, W // 2)
    rec_v_plane = tiles_to_plane(rec_v_mb.astype(jnp.uint8), 8, H // 2, W // 2)

    # intra-vs-inter cost: simple DC-pred intra SAD proxy
    mb_mean = src_mb.mean((-1, -2)).astype(jnp.int32)
    intra_sad = jnp.abs(src_mb - mb_mean[:, None, None]).sum((-1, -2))

    return {
        "mv": best_mv,
        "inter_cost": best_cost,
        "intra_cost_proxy": intra_sad,
        "luma_ac": lev.reshape(n_mb, 16, 16),
        "chroma_dc": jnp.stack([dcu, dcv], 1),
        "chroma_ac": jnp.stack([acu, acv], 1),
        "recon_y": rec_y_plane,
        "recon_u": rec_u_plane,
        "recon_v": rec_v_plane,
    }
