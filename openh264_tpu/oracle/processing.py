"""Numpy oracles for the VP filters — direct scalar ports of the C
semantics (vaacalcfuncs.cpp VAACalcSadSsdBgd_c:338,
downsamplefuncs.cpp DyadicBilinearDownsampler_c:47 /
GeneralBilinearAccurateDownsampler_c:187). Used only by tests as the
bit-exact truth for the JAX implementations.
"""

from __future__ import annotations

import numpy as np


def vaa_calc_ref(cur: np.ndarray, ref: np.ndarray):
    h, w = cur.shape
    mh, mw = h // 16, w // 16
    sad8 = np.zeros((mh, mw, 4), np.int32)
    sd8 = np.zeros((mh, mw, 4), np.int32)
    mad8 = np.zeros((mh, mw, 4), np.int32)
    s16 = np.zeros((mh, mw), np.int32)
    sq16 = np.zeros((mh, mw), np.int32)
    sqd16 = np.zeros((mh, mw), np.int32)
    c = cur.astype(np.int32)
    r = ref.astype(np.int32)
    for j in range(mh):
        for i in range(mw):
            for q, (oy, ox) in enumerate([(0, 0), (0, 8), (8, 0), (8, 8)]):
                cb = c[j * 16 + oy:j * 16 + oy + 8, i * 16 + ox:i * 16 + ox + 8]
                rb = r[j * 16 + oy:j * 16 + oy + 8, i * 16 + ox:i * 16 + ox + 8]
                d = cb - rb
                sad8[j, i, q] = np.abs(d).sum()
                sd8[j, i, q] = d.sum()
                mad8[j, i, q] = np.abs(d).max()
                s16[j, i] += cb.sum()
                sq16[j, i] += (cb * cb).sum()
                sqd16[j, i] += (np.abs(d) ** 2).sum()
    return {"sad8x8": sad8, "sd8x8": sd8, "mad8x8": mad8,
            "sum16x16": s16, "sqsum16x16": sq16, "sqdiff16x16": sqd16,
            "frame_sad": sad8.sum()}


def dyadic_downsample_ref(src: np.ndarray, ratio_log2: int = 1):
    s = 1 << ratio_log2
    h, w = src.shape[0] // s, src.shape[1] // s
    dst = np.zeros((h, w), np.uint8)
    x = src.astype(np.int32)
    for j in range(h):
        for i in range(w):
            sy, sx = j * s, i * s
            r1 = (x[sy, sx] + x[sy, sx + 1] + 1) >> 1
            r2 = (x[sy + 1, sx] + x[sy + 1, sx + 1] + 1) >> 1
            dst[j, i] = (r1 + r2 + 1) >> 1
    return dst


def general_bilinear_downsample_ref(src: np.ndarray, dst_h: int, dst_w: int):
    kbit = 15
    kscale = 1 << kbit
    sh, sw = src.shape
    step_x = int(round(sw / dst_w * kscale))
    step_y = int(round(sh / dst_h * kscale))
    dst = np.zeros((dst_h, dst_w), np.uint8)
    x = src.astype(np.int64)
    yinv = 1 << (kbit - 1)
    for j in range(dst_h - 1):
        yy = yinv >> kbit
        fv = yinv & (kscale - 1)
        xinv = 1 << (kbit - 1)
        for i in range(dst_w - 1):
            xx = xinv >> kbit
            fu = xinv & (kscale - 1)
            a, b = x[yy, xx], x[yy, xx + 1]
            c, d = x[yy + 1, xx], x[yy + 1, xx + 1]
            v = ((kscale - 1 - fu) * (kscale - 1 - fv) * a
                 + fu * (kscale - 1 - fv) * b
                 + (kscale - 1 - fu) * fv * c
                 + fu * fv * d + (1 << (2 * kbit - 1))) >> (2 * kbit)
            dst[j, i] = min(max(int(v), 0), 255)
            xinv += step_x
        dst[j, dst_w - 1] = x[yy, xinv >> kbit]
        yinv += step_y
    yy = yinv >> kbit
    xinv = 1 << (kbit - 1)
    for i in range(dst_w):
        dst[dst_h - 1, i] = x[min(yy, sh - 1), xinv >> kbit]
        xinv += step_x
    return dst
