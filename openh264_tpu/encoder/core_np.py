"""Numpy encoder core (correctness oracle for the JAX/TPU core).

Per-frame mode decision + transform/quant + reconstruction producing
the symbol tensors the entropy stage consumes. v1 toolset: I16x16 intra
(V/H/DC/Plane), chroma intra (DC/H/V/Plane), P16x16 full+sub-pel ME,
P_Skip; CAVLC; deblocking off. Mirrors the decision structure of
svc_base_layer_md.cpp (WelsMdI16x16:365, WelsMdP16x16:978) at reduced
mode count — the JAX core (core_jax.py) must produce identical outputs.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..oracle import intra as oi
from ..oracle.mc import mc_chroma, mc_luma
from ..oracle.transform import (dct4x4, dequant4x4, hadamard2x2, hadamard4x4,
                                idct4x4_add, luma_dc_dequant_ihadamard,
                                chroma_dc_dequant_ihadamard, quant4x4,
                                quant_dc)
from ..tables import CHROMA_QP_TABLE


@dataclass
class MbEncOut:
    """Per-frame encoder symbol tensors (inputs to the entropy stage)."""
    mb_w: int
    mb_h: int
    is_intra_frame: bool
    # per MB
    intra_flag: np.ndarray = None       # bool: intra MB (in P frames)
    i16_mode: np.ndarray = None
    chroma_mode: np.ndarray = None
    mv: np.ndarray = None               # [nMB, 2] quarter-pel
    luma_dc_levels: np.ndarray = None   # [nMB, 16] zigzag scan order
    luma_ac_levels: np.ndarray = None   # [nMB, 16, 16] raster blk, raster coeff
    chroma_dc_levels: np.ndarray = None  # [nMB, 2, 4]
    chroma_ac_levels: np.ndarray = None  # [nMB, 2, 4, 16]
    cbp_luma: np.ndarray = None
    cbp_chroma: np.ndarray = None
    recon_y: np.ndarray = None
    recon_u: np.ndarray = None
    recon_v: np.ndarray = None


def pad_to_mb(plane: np.ndarray, mb_size: int = 16) -> np.ndarray:
    h, w = plane.shape
    H = (h + mb_size - 1) // mb_size * mb_size
    W = (w + mb_size - 1) // mb_size * mb_size
    if H == h and W == w:
        return plane
    out = np.empty((H, W), plane.dtype)
    out[:h, :w] = plane
    out[h:, :w] = plane[h - 1:h, :]
    out[:h, w:] = plane[:, w - 1:w]
    out[h:, w:] = plane[h - 1, w - 1]
    return out


def _sad(a, b):
    return int(np.abs(a.astype(np.int32) - b.astype(np.int32)).sum())


def encode_i16_mb(y, u, v, recon_y, recon_u, recon_v, mbx, mby, qp, qp_c,
                  out: MbEncOut, idx: int) -> None:
    """Encode one MB as I16x16 + chroma intra, writing levels + recon."""
    x0, y0 = mbx * 16, mby * 16
    cx0, cy0 = mbx * 8, mby * 8
    at = mby > 0
    al = mbx > 0
    src = y[y0:y0 + 16, x0:x0 + 16]

    top = recon_y[y0 - 1, x0:x0 + 16].astype(np.int32) if at else None
    left = recon_y[y0:y0 + 16, x0 - 1].astype(np.int32) if al else None
    tl = int(recon_y[y0 - 1, x0 - 1]) if (at and al) else 0
    modes = [2]  # DC always available
    if at:
        modes.append(0)
    if al:
        modes.append(1)
    if at and al:
        modes.append(3)
    best_mode, best_cost, best_pred = -1, 1 << 30, None
    for m in modes:
        pred = oi.predict_16x16(m, top, left, tl, at, al)
        c = _sad(src, pred)
        if c < best_cost:
            best_mode, best_cost, best_pred = m, c, pred
    out.i16_mode[idx] = best_mode

    # transform: 16 4x4 DCTs; DC -> hadamard+quant; AC quant
    res = src.astype(np.int32) - best_pred.astype(np.int32)
    blocks = res.reshape(4, 4, 4, 4).transpose(0, 2, 1, 3).reshape(16, 4, 4)
    coef = dct4x4(blocks)                       # [16,4,4] raster blocks
    dcs = coef[:, 0, 0].reshape(4, 4)
    dc_lev = quant_dc(hadamard4x4(dcs), qp, True)  # [4,4]
    ac_lev = quant4x4(coef, qp, True)
    ac_lev[:, 0, 0] = 0
    out.luma_dc_levels[idx] = dc_lev.reshape(-1)[_Z16]
    out.luma_ac_levels[idx] = ac_lev.reshape(16, 16)
    out.cbp_luma[idx] = 15 if np.any(ac_lev) else 0

    # recon luma
    rec_dc = luma_dc_dequant_ihadamard(dc_lev, qp)
    deq = dequant4x4(ac_lev, qp)
    deq[:, 0, 0] = rec_dc.reshape(-1)
    pred_blocks = best_pred.reshape(4, 4, 4, 4).transpose(0, 2, 1, 3).reshape(16, 4, 4)
    rec_blocks = idct4x4_add(pred_blocks, deq)
    rec = rec_blocks.reshape(4, 4, 4, 4).transpose(0, 2, 1, 3).reshape(16, 16)
    recon_y[y0:y0 + 16, x0:x0 + 16] = rec

    # chroma
    encode_chroma_intra(u, v, recon_u, recon_v, mbx, mby, qp_c, out, idx)


def encode_chroma_intra(u, v, recon_u, recon_v, mbx, mby, qp_c,
                        out: MbEncOut, idx: int) -> None:
    cx0, cy0 = mbx * 8, mby * 8
    at, al = mby > 0, mbx > 0
    srcs = (u[cy0:cy0 + 8, cx0:cx0 + 8], v[cy0:cy0 + 8, cx0:cx0 + 8])
    recs = (recon_u, recon_v)
    modes = [0]
    if al:
        modes.append(1)
    if at:
        modes.append(2)
    if at and al:
        modes.append(3)
    best_mode, best_cost = 0, 1 << 30
    preds_by_mode = {}
    for m in modes:
        c = 0
        preds = []
        for comp in range(2):
            rec = recs[comp]
            top = rec[cy0 - 1, cx0:cx0 + 8].astype(np.int32) if at else None
            left = rec[cy0:cy0 + 8, cx0 - 1].astype(np.int32) if al else None
            tl = int(rec[cy0 - 1, cx0 - 1]) if (at and al) else 0
            p = oi.predict_chroma(m, top, left, tl, at, al)
            preds.append(p)
            c += _sad(srcs[comp], p)
        preds_by_mode[m] = preds
        if c < best_cost:
            best_mode, best_cost = m, c
    out.chroma_mode[idx] = best_mode
    _chroma_transform_recon(srcs, preds_by_mode[best_mode], recs, cx0, cy0,
                            qp_c, out, idx)


def _chroma_transform_recon(srcs, preds, recs, cx0, cy0, qp_c, out, idx):
    any_dc = False
    any_ac = False
    for comp in range(2):
        res = srcs[comp].astype(np.int32) - preds[comp].astype(np.int32)
        blocks = res.reshape(2, 4, 2, 4).transpose(0, 2, 1, 3).reshape(4, 4, 4)
        coef = dct4x4(blocks)
        dcs = coef[:, 0, 0].reshape(2, 2)
        dc_lev = quant_dc(hadamard2x2(dcs), qp_c, True)
        ac_lev = quant4x4(coef, qp_c, True)
        ac_lev[:, 0, 0] = 0
        out.chroma_dc_levels[idx, comp] = dc_lev.reshape(-1)
        out.chroma_ac_levels[idx, comp] = ac_lev.reshape(4, 16)
        any_dc |= bool(np.any(dc_lev))
        any_ac |= bool(np.any(ac_lev))
        # recon
        rec_dc = chroma_dc_dequant_ihadamard(dc_lev, qp_c)
        deq = dequant4x4(ac_lev, qp_c)
        deq[:, 0, 0] = rec_dc.reshape(-1)
        pred_blocks = preds[comp].reshape(2, 4, 2, 4).transpose(0, 2, 1, 3).reshape(4, 4, 4)
        rec_blocks = idct4x4_add(pred_blocks, deq)
        rec = rec_blocks.reshape(2, 2, 4, 4).transpose(0, 2, 1, 3).reshape(8, 8)
        recs[comp][cy0:cy0 + 8, cx0:cx0 + 8] = rec
    out.cbp_chroma[idx] = 2 if any_ac else (1 if any_dc else 0)


_Z16 = None  # zigzag for DC 4x4 set below


def _init_scans():
    global _Z16
    from ..tables import ZIGZAG_4x4
    _Z16 = ZIGZAG_4x4


_init_scans()


def me_full_search(src_mb, ref_y, x0, y0, search_range, W, H):
    """Integer-pel full search around (0,0) + predictor; returns best
    integer MV (in pels)."""
    best = (1 << 30, 0, 0)
    for dy in range(-search_range, search_range + 1):
        yy = y0 + dy
        for dx in range(-search_range, search_range + 1):
            xx = x0 + dx
            if xx < -16 or yy < -16 or xx > W or yy > H:
                continue
            blk = mc_luma(ref_y, dx * 4, dy * 4, x0, y0, 16, 16)
            c = _sad(src_mb, blk)
            if c < best[0]:
                best = (c, dx, dy)
    return best


def encode_p_frame(y, u, v, ref, qp, qp_c, search_range=16) -> MbEncOut:
    """Reference-model P-frame encode (slow, exhaustive-ish). The JAX
    core implements the same decisions batched; tests compare them."""
    raise NotImplementedError("use core_jax for P frames; numpy oracle "
                              "is exercised via unit tests on single MBs")
