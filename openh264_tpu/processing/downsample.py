"""Spatial-layer downsamplers.

Behavior parity: processing downsamplefuncs.cpp
DyadicBilinearDownsampler_c:47 (and the quarter/eighth variants),
GeneralBilinearAccurateDownsampler_c:187 (15-bit fixed-point bilinear
with the reference's exact rounding and last-row/col nearest
sampling). The dyadic path handles the power-of-two layer ratios of
SVC/simulcast; the general path handles arbitrary ratios.

TPU-native shape: the dyadic filter is a reshape-average; the general
filter is a precomputed-index gather + integer blend over the whole
output grid (indices are static per (src,dst) shape pair, so the jit
cache is per resolution pair, matching the encoder's per-layer
compile).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("ratio_log2",))
def dyadic_downsample(src, ratio_log2: int = 1):
    """Halve width/height `ratio_log2` times.

    Parity: DyadicBilinearDownsampler_c — dst = ((a+b+1)>>1 + (c+d+1)>>1
    + 1) >> 1 over each 2x2; the quarter/eighth C variants subsample the
    same 2x2 average at strides 4/8 (top-left 2x2 of each cell), which
    iterating the half filter does NOT reproduce, so we gather the
    top-left 2x2 per cell directly.
    """
    s = 1 << ratio_log2
    h, w = src.shape
    x = src.astype(jnp.int32)
    # top-left 2x2 of each sxs cell (for s=2 that's the whole cell)
    a = x[0::s, 0::s][: h // s, : w // s]
    b = x[0::s, 1::s][: h // s, : w // s]
    c = x[1::s, 0::s][: h // s, : w // s]
    d = x[1::s, 1::s][: h // s, : w // s]
    r1 = (a + b + 1) >> 1
    r2 = (c + d + 1) >> 1
    return ((r1 + r2 + 1) >> 1).astype(jnp.uint8)


def _gb_indices(src_w: int, dst_w: int, scale_bit: int):
    """Fixed-point x positions/fractions per dst column (host precompute)."""
    scale = 1 << scale_bit
    step = int(round(src_w / dst_w * scale))
    xinv = (1 << (scale_bit - 1)) + step * np.arange(dst_w, dtype=np.int64)
    return (xinv >> scale_bit).astype(np.int32), (xinv & (scale - 1)).astype(np.int32)


@partial(jax.jit, static_argnames=("dst_h", "dst_w"))
def general_bilinear_downsample(src, dst_h: int, dst_w: int):
    """Arbitrary-ratio accurate bilinear downsample (15-bit fixed point).

    Parity: GeneralBilinearAccurateDownsampler_c:187 including the
    nearest-sample last row and column.
    """
    kbit = 15
    kscale = 1 << kbit
    src_h, src_w = src.shape
    xi, fu = _gb_indices(src_w, dst_w, kbit)
    yi, fv = _gb_indices(src_h, dst_h, kbit)
    xi = jnp.asarray(xi)
    fu = jnp.asarray(fu)
    yi = jnp.asarray(yi)
    fv = jnp.asarray(fv)
    x = src.astype(jnp.int32)
    # clamp gathers so the +1 neighbors stay in bounds; interior dst
    # pixels never touch the clamp (fixed-point positions < src-1)
    xi0 = jnp.clip(xi, 0, src_w - 1)
    xi1 = jnp.clip(xi + 1, 0, src_w - 1)
    yi0 = jnp.clip(yi, 0, src_h - 1)
    yi1 = jnp.clip(yi + 1, 0, src_h - 1)
    a = x[yi0][:, xi0]
    b = x[yi0][:, xi1]
    c = x[yi1][:, xi0]
    d = x[yi1][:, xi1]
    wu1 = fu[None, :]
    wu0 = (kscale - 1) - wu1
    wv1 = fv[:, None]
    wv0 = (kscale - 1) - wv1
    # The C accumulates in int64; without x64 we stage the 30-bit
    # shift exactly in int32: t fits 24 bits, split t into
    # (t>>9, t&511) so each product stays < 2^31, and use
    # ((hi<<9 + lo + 2^29) >> 30) == ((hi + ((lo + 2^29) >> 9)) >> 21.
    t0 = wu0 * a + wu1 * b
    t1 = wu0 * c + wu1 * d
    hi = wv0 * (t0 >> 9) + wv1 * (t1 >> 9)
    lo = wv0 * (t0 & 511) + wv1 * (t1 & 511)
    acc = (hi + ((lo + (1 << (2 * kbit - 1))) >> 9)) >> (2 * kbit - 9)
    acc = jnp.clip(acc, 0, 255).astype(jnp.uint8)
    # last column / last row use nearest sampling in the reference
    near = x[yi0][:, xi0].astype(jnp.uint8)
    acc = acc.at[:, dst_w - 1].set(near[:, dst_w - 1])
    acc = acc.at[dst_h - 1, :].set(near[dst_h - 1, :])
    return acc
