"""Numpy oracles for the H.264 4x4 integer transforms and (de)quant.

Semantics anchors in the reference (bit-exactness contracts):
- forward DCT:      encoder encode_mb_aux.cpp:313 WelsDctT4_c
- forward DC Hadamard: encode_mb_aux.cpp:280 WelsHadamardT4Dc_c
- quant:            encode_mb_aux.cpp:164 WelsQuant4x4_c
- dequant (AC):     decoder parse_mb_syn_cavlc.cpp:968 level*dequant[j&7]
- IDCT + add pred:  decoder decode_mb_aux.cpp:42 IdctResAddPred_c
                    (note: int16 intermediate after the horizontal pass)
- luma DC inverse:  decoder decode_slice.cpp:246 WelsLumaDcDequantIdct
- chroma DC inverse: decoder decode_slice.cpp:359 WelsChromaDcIdct + >>1 scale

All functions are batched: leading axes are arbitrary; the last two axes
are the 4x4 (or 2x2) block.
"""

from __future__ import annotations

import numpy as np

from ..tables import DEQUANT_4x4, QUANT_MF_4x4

# Forward 4x4 core matrix (H.264 integer DCT).
_CF = np.array([[1, 1, 1, 1],
                [2, 1, -1, -2],
                [1, -1, -1, 1],
                [1, -2, 2, -1]], dtype=np.int32)


def wrap_i16(x: np.ndarray) -> np.ndarray:
    """Wrap int32 values to int16 two's-complement (models C int16_t store)."""
    return ((x.astype(np.int64) + 0x8000) % 0x10000 - 0x8000).astype(np.int32)


def dct4x4(res: np.ndarray) -> np.ndarray:
    """Forward 4x4 integer DCT of residual blocks [..., 4, 4] -> int32.

    Pure butterflies without intermediate truncation; equal to CF @ X @ CF^T.
    """
    x = res.astype(np.int32)
    return _CF @ x @ _CF.T


def hadamard4x4(x: np.ndarray) -> np.ndarray:
    """Forward 4x4 Hadamard of I16x16 luma DC coeffs with (v+1)>>1 scaling."""
    h = np.array([[1, 1, 1, 1],
                  [1, 1, -1, -1],
                  [1, -1, -1, 1],
                  [1, -1, 1, -1]], dtype=np.int32)
    t = h @ x.astype(np.int32) @ h.T
    return (t + 1) >> 1


def hadamard2x2(x: np.ndarray) -> np.ndarray:
    """2x2 Hadamard (self-inverse up to scale) for chroma DC, no rounding."""
    h = np.array([[1, 1], [1, -1]], dtype=np.int32)
    return h @ x.astype(np.int32) @ h.T


def quant4x4(coef: np.ndarray, qp: int, intra: bool) -> np.ndarray:
    """Deadzone quant: sign(c) * ((|c| * MF + f) >> qbits).

    f = (1<<qbits)/3 for intra, /6 for inter (classic JM deadzone; the
    encoder is free to choose any quantizer — the bitstream only carries
    levels).
    """
    qbits = 15 + qp // 6
    f = ((1 << qbits) // 3) if intra else ((1 << qbits) // 6)
    mf = QUANT_MF_4x4[qp].reshape(4, 4)
    c = coef.astype(np.int64)
    lev = (np.abs(c) * mf + f) >> qbits
    return (np.sign(c) * lev).astype(np.int32)


def quant_dc(coef: np.ndarray, qp: int, intra: bool) -> np.ndarray:
    """Quant for DC-transformed blocks: uses position-0 MF with doubled
    shift range (luma DC quantized at qp with qbits+1 per the standard's
    /2 on the Hadamard side already applied in hadamard4x4)."""
    qbits = 15 + qp // 6
    f = 2 * ((1 << qbits) // 3) if intra else 2 * ((1 << qbits) // 6)
    mf = int(QUANT_MF_4x4[qp][0])
    c = coef.astype(np.int64)
    lev = (np.abs(c) * mf + f) >> (qbits + 1)
    return (np.sign(c) * lev).astype(np.int32)


def dequant4x4(level: np.ndarray, qp: int) -> np.ndarray:
    """AC dequant (flat scaling list): level * DEQUANT_4x4[qp][pos]."""
    d = DEQUANT_4x4[qp].reshape(4, 4)
    return level.astype(np.int32) * d


def idct4x4_add(pred: np.ndarray, coef: np.ndarray) -> np.ndarray:
    """Inverse 4x4 transform + add to prediction, clip to [0,255].

    Bit-exact with the decoder reference: the horizontal pass result is
    stored in int16 (wraps), the vertical pass accumulates in int32 with
    (x+32)>>6 rounding.  pred: [...,4,4] uint8, coef: [...,4,4] int (already
    dequantized).  Returns uint8.
    """
    c = coef.astype(np.int32)
    # Horizontal (row) pass over last axis.
    c0, c1, c2, c3 = c[..., 0], c[..., 1], c[..., 2], c[..., 3]
    t0 = c0 + c2
    t1 = c0 - c2
    t2 = (c1 >> 1) - c3
    t3 = c1 + (c3 >> 1)
    h = np.stack([t0 + t3, t1 + t2, t1 - t2, t0 - t3], axis=-1)
    h = wrap_i16(h)  # reference stores int16_t iSrc[16]
    # Vertical (column) pass over second-to-last axis.
    h0, h1, h2, h3 = h[..., 0, :], h[..., 1, :], h[..., 2, :], h[..., 3, :]
    t0 = h0 + h2
    t1 = h0 - h2
    t2 = (h1 >> 1) - h3
    t3 = h1 + (h3 >> 1)
    r = np.stack([t0 + t3, t1 + t2, t1 - t2, t0 - t3], axis=-2)
    out = pred.astype(np.int32) + ((r + 32) >> 6)
    return np.clip(out, 0, 255).astype(np.uint8)


def ihadamard4x4(x: np.ndarray) -> np.ndarray:
    """Inverse 4x4 Hadamard butterfly (no scaling)."""
    h = np.array([[1, 1, 1, 1],
                  [1, 1, -1, -1],
                  [1, -1, -1, 1],
                  [1, -1, 1, -1]], dtype=np.int32)
    return h @ x.astype(np.int32) @ h.T


def luma_dc_dequant_ihadamard(dc: np.ndarray, qp: int,
                              qmul: int | None = None) -> np.ndarray:
    """I16x16 luma DC inverse: IHadamard then (v * qmul + 32)>>6 with
    qmul = dequant[qp][0]<<4 (flat) or the scaling-list multiplier.

    Result is the per-4x4-block DC value of the scaled coefficients,
    stored int16 in the reference.
    """
    if qmul is None:
        qmul = int(DEQUANT_4x4[qp][0]) << 4
    t = ihadamard4x4(dc)
    return wrap_i16((t * qmul + 32) >> 6)


def chroma_dc_dequant_ihadamard(dc: np.ndarray, qp: int) -> np.ndarray:
    """Chroma DC inverse: 2x2 Hadamard then (v * dequant[qp][0]) >> 1."""
    qmul = int(DEQUANT_4x4[qp][0])
    t = hadamard2x2(dc)
    return wrap_i16((t * qmul) >> 1)
