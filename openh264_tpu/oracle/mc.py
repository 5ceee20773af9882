"""Numpy oracle for H.264 motion-compensated prediction (§8.4.2.2).

Luma quarter-pel via 6-tap [1,-5,20,20,-5,1] half-pel + averaging,
chroma eighth-pel bilinear. Unrestricted MVs handled by clamped
indexing (equivalent to the reference's expanded picture borders,
expand_pic.cpp:388; kernels mc.cpp:215-369 McHorVer*/McChroma_c).

All functions are vectorized over the whole block.
"""

from __future__ import annotations

import numpy as np


def _clamped_window(plane: np.ndarray, y0: int, x0: int, h: int, w: int) -> np.ndarray:
    """plane[y0:y0+h, x0:x0+w] with border replication for out-of-range."""
    H, W = plane.shape
    ys = np.clip(np.arange(y0, y0 + h), 0, H - 1)
    xs = np.clip(np.arange(x0, x0 + w), 0, W - 1)
    return plane[np.ix_(ys, xs)].astype(np.int32)


def mc_luma(ref: np.ndarray, mv_x: int, mv_y: int, x0: int, y0: int,
            bw: int, bh: int) -> np.ndarray:
    """Predict a luma block of size (bh, bw) at position (x0, y0) with
    quarter-pel motion vector (mv_x, mv_y). Returns uint8 [bh, bw]."""
    xi = x0 + (mv_x >> 2)
    yi = y0 + (mv_y >> 2)
    xf = mv_x & 3
    yf = mv_y & 3
    if xf == 0 and yf == 0:
        return _clamped_window(ref, yi, xi, bh, bw).astype(np.uint8)

    # window with 2 left/top and 3 right/bottom margin, +1 for the
    # next-row/col samples used by quarter positions
    W = _clamped_window(ref, yi - 2, xi - 2, bh + 6, bw + 6)

    def clip8(a):
        return np.clip(a, 0, 255)

    # horizontal 6-tap (unnormalized), all rows, cols 0..bw
    b1 = (W[:, 0:bw + 1] - 5 * W[:, 1:bw + 2] + 20 * W[:, 2:bw + 3]
          + 20 * W[:, 3:bw + 4] - 5 * W[:, 4:bw + 5] + W[:, 5:bw + 6])
    b_full = clip8((b1[2:bh + 3, :] + 16) >> 5)          # (bh+1, bw+1)
    # vertical 6-tap (unnormalized), rows 0..bh, all cols
    h1 = (W[0:bh + 1] - 5 * W[1:bh + 2] + 20 * W[2:bh + 3]
          + 20 * W[3:bh + 4] - 5 * W[4:bh + 5] + W[5:bh + 6])
    h_full = clip8((h1[:, 2:bw + 3] + 16) >> 5)          # (bh+1, bw+1)
    # center half-pel j from unnormalized horizontal intermediates
    j1 = (b1[0:bh + 1] - 5 * b1[1:bh + 2] + 20 * b1[2:bh + 3]
          + 20 * b1[3:bh + 4] - 5 * b1[4:bh + 5] + b1[5:bh + 6])
    j_full = clip8((j1 + 512) >> 10)                     # (bh+1, bw+1)

    G = W[2:2 + bh + 1, 2:2 + bw + 1]                    # integer, +1 row/col

    g0 = G[:bh, :bw]
    H_ = G[:bh, 1:bw + 1]
    M_ = G[1:bh + 1, :bw]
    b = b_full[:bh, :bw]
    s = b_full[1:bh + 1, :bw]
    h = h_full[:bh, :bw]
    m = h_full[:bh, 1:bw + 1]
    j = j_full[:bh, :bw]

    if yf == 0:
        out = {1: (g0 + b + 1) >> 1, 2: b, 3: (H_ + b + 1) >> 1}[xf]
    elif yf == 1:
        out = {0: (g0 + h + 1) >> 1, 1: (b + h + 1) >> 1,
               2: (b + j + 1) >> 1, 3: (b + m + 1) >> 1}[xf]
    elif yf == 2:
        out = {0: h, 1: (h + j + 1) >> 1, 2: j, 3: (j + m + 1) >> 1}[xf]
    else:  # yf == 3
        out = {0: (M_ + h + 1) >> 1, 1: (h + s + 1) >> 1,
               2: (j + s + 1) >> 1, 3: (m + s + 1) >> 1}[xf]
    return out.astype(np.uint8)


def mc_chroma(ref: np.ndarray, mv_x: int, mv_y: int, x0: int, y0: int,
              bw: int, bh: int) -> np.ndarray:
    """Chroma eighth-pel bilinear MC. mv is the LUMA quarter-pel vector;
    chroma fraction = mv & 7 over the half-res plane."""
    xi = x0 + (mv_x >> 3)
    yi = y0 + (mv_y >> 3)
    xf = mv_x & 7
    yf = mv_y & 7
    W = _clamped_window(ref, yi, xi, bh + 1, bw + 1)
    A = W[:bh, :bw]
    B = W[:bh, 1:bw + 1]
    C = W[1:bh + 1, :bw]
    D = W[1:bh + 1, 1:bw + 1]
    out = ((8 - xf) * (8 - yf) * A + xf * (8 - yf) * B
           + (8 - xf) * yf * C + xf * yf * D + 32) >> 6
    return out.astype(np.uint8)


def weight_pred(p: np.ndarray, w: int, o: int, log_wd: int) -> np.ndarray:
    """Explicit weighted prediction, single list (§8.4.2.3.2)."""
    p = p.astype(np.int32)
    if log_wd >= 1:
        r = ((p * w + (1 << (log_wd - 1))) >> log_wd) + o
    else:
        r = p * w + o
    return np.clip(r, 0, 255).astype(np.uint8)


def biweight_pred(p0: np.ndarray, p1: np.ndarray, w0: int, w1: int,
                  o0: int, o1: int, log_wd: int) -> np.ndarray:
    """Bi-predictive weighted combination (§8.4.2.3.2)."""
    p0 = p0.astype(np.int32)
    p1 = p1.astype(np.int32)
    r = ((p0 * w0 + p1 * w1 + (1 << log_wd)) >> (log_wd + 1)) + ((o0 + o1 + 1) >> 1)
    return np.clip(r, 0, 255).astype(np.uint8)


def bi_avg(p0: np.ndarray, p1: np.ndarray) -> np.ndarray:
    """Default biprediction: rounded average."""
    return ((p0.astype(np.int32) + p1.astype(np.int32) + 1) >> 1).astype(np.uint8)
