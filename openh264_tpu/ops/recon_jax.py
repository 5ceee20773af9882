"""Device-side (JAX/XLA) batched reconstruction kernels.

Jitted formulations of decoder/recon_batch.py's MC stages: clamped
gather windows + 6-tap quarter-pel luma / bilinear eighth-pel chroma,
computed for all blocks of a frame in one traced program. Integer-only
arithmetic, bit-exact with the numpy batch path (and therefore with the
reference C fallbacks, mc.cpp:215-369).

Shapes are bucketed (next power of two) so each (resolution, bucket)
pair compiles once; padding blocks point at (0,0) with zero MV.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _bucket(n: int) -> int:
    return max(256, 1 << (int(n) - 1).bit_length())


@jax.jit
def _mc_luma_jit(plane, x0, y0, mvx, mvy):
    """plane: int32 [H,W]; others int32 [B]. Returns uint8 [B,4,4]."""
    H, W = plane.shape
    xi = x0 + (mvx >> 2)
    yi = y0 + (mvy >> 2)
    xf = mvx & 3
    yf = mvy & 3
    # clamped 10x10 windows with 2-sample top/left margin
    ys = jnp.clip(yi[:, None] - 2 + jnp.arange(10)[None, :], 0, H - 1)
    xs = jnp.clip(xi[:, None] - 2 + jnp.arange(10)[None, :], 0, W - 1)
    Wnd = plane[ys[:, :, None], xs[:, None, :]]          # [B,10,10]
    bw = bh = 4

    def clip8(a):
        return jnp.clip(a, 0, 255)

    b1 = (Wnd[:, :, 0:bw + 1] - 5 * Wnd[:, :, 1:bw + 2]
          + 20 * Wnd[:, :, 2:bw + 3] + 20 * Wnd[:, :, 3:bw + 4]
          - 5 * Wnd[:, :, 4:bw + 5] + Wnd[:, :, 5:bw + 6])
    b_full = clip8((b1[:, 2:bh + 3, :] + 16) >> 5)
    h1 = (Wnd[:, 0:bh + 1] - 5 * Wnd[:, 1:bh + 2] + 20 * Wnd[:, 2:bh + 3]
          + 20 * Wnd[:, 3:bh + 4] - 5 * Wnd[:, 4:bh + 5] + Wnd[:, 5:bh + 6])
    h_full = clip8((h1[:, :, 2:bw + 3] + 16) >> 5)
    j1 = (b1[:, 0:bh + 1] - 5 * b1[:, 1:bh + 2] + 20 * b1[:, 2:bh + 3]
          + 20 * b1[:, 3:bh + 4] - 5 * b1[:, 4:bh + 5] + b1[:, 5:bh + 6])
    j_full = clip8((j1 + 512) >> 10)

    G = Wnd[:, 2:2 + bh + 1, 2:2 + bw + 1]
    g0 = G[:, :bh, :bw]
    H_ = G[:, :bh, 1:bw + 1]
    M_ = G[:, 1:bh + 1, :bw]
    b = b_full[:, :bh, :bw]
    s = b_full[:, 1:bh + 1, :bw]
    h = h_full[:, :bh, :bw]
    m = h_full[:, :bh, 1:bw + 1]
    j = j_full[:, :bh, :bw]

    cand = jnp.stack([
        g0, (g0 + b + 1) >> 1, b, (H_ + b + 1) >> 1,
        (g0 + h + 1) >> 1, (b + h + 1) >> 1, (b + j + 1) >> 1,
        (b + m + 1) >> 1,
        h, (h + j + 1) >> 1, j, (j + m + 1) >> 1,
        (M_ + h + 1) >> 1, (h + s + 1) >> 1, (j + s + 1) >> 1,
        (m + s + 1) >> 1,
    ])                                                     # [16,B,4,4]
    k = (yf * 4 + xf)[None, :, None, None]
    out = jnp.take_along_axis(cand, k, axis=0)[0]
    return out.astype(jnp.uint8)


@jax.jit
def _mc_chroma_jit(plane, x0, y0, mvx, mvy):
    H, W = plane.shape
    xi = x0 + (mvx >> 3)
    yi = y0 + (mvy >> 3)
    xf = (mvx & 7)[:, None, None]
    yf = (mvy & 7)[:, None, None]
    ys = jnp.clip(yi[:, None] + jnp.arange(3)[None, :], 0, H - 1)
    xs = jnp.clip(xi[:, None] + jnp.arange(3)[None, :], 0, W - 1)
    Wnd = plane[ys[:, :, None], xs[:, None, :]]
    A = Wnd[:, :2, :2]
    B = Wnd[:, :2, 1:3]
    C = Wnd[:, 1:3, :2]
    D = Wnd[:, 1:3, 1:3]
    out = ((8 - xf) * (8 - yf) * A + xf * (8 - yf) * B
           + (8 - xf) * yf * C + xf * yf * D + 32) >> 6
    return out.astype(jnp.uint8)


def _plane_i32(ref, attr):
    """Per-Picture cached device copy of a plane as int32."""
    cache = getattr(ref, "_dev_planes", None)
    if cache is None:
        cache = {}
        ref._dev_planes = cache
    a = cache.get(attr)
    if a is None:
        a = jnp.asarray(getattr(ref, attr), dtype=jnp.int32)
        cache[attr] = a
    return a


def mc_luma_batch_jax(plane_or_ref, x0, y0, mvx, mvy):
    """numpy-in/numpy-out wrapper with shape bucketing."""
    n = len(x0)
    pad = _bucket(n) - n

    def p(a):
        return jnp.asarray(np.pad(a.astype(np.int32), (0, pad)))

    plane = plane_or_ref if isinstance(plane_or_ref, jnp.ndarray) \
        else jnp.asarray(plane_or_ref, dtype=jnp.int32)
    out = _mc_luma_jit(plane, p(x0), p(y0), p(mvx), p(mvy))
    return np.asarray(out)[:n]


def mc_chroma_batch_jax(plane_or_ref, x0, y0, mvx, mvy):
    n = len(x0)
    pad = _bucket(n) - n

    def p(a):
        return jnp.asarray(np.pad(a.astype(np.int32), (0, pad)))

    plane = plane_or_ref if isinstance(plane_or_ref, jnp.ndarray) \
        else jnp.asarray(plane_or_ref, dtype=jnp.int32)
    out = _mc_chroma_jit(plane, p(x0), p(y0), p(mvx), p(mvy))
    return np.asarray(out)[:n]
