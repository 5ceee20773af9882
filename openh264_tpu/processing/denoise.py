"""Denoise filters (METHOD_DENOISE).

Behavior parity: processing denoise_filter.cpp BilateralLumaFilter8_c
(3x3 bilateral, weight (32-|d|)^2>>5 within gray radius 32),
WaverageChromaFilter8_c (5x5 weighted average, kernel
[[1,1,2,1,1],[1,2,4,2,1],[2,4,20,4,2],...] >> 6), Gauss3x3Filter on
the tail columns, driven by denoise.cpp BilateralDenoiseLuma:92 /
WaverageDenoiseChroma:107 over the plane interior.

Deliberate deviation: the reference filters in place, so each 3x3/5x5
window reads already-denoised pixels above/left — a raster-scan serial
dependence that is an artifact of the C loop, not of the filter
definition. The TPU version is functional (all windows read the
original frame), which vectorizes over the whole plane; outputs differ
slightly from the reference but the filter response is the same.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_CHROMA_K = ((1, 1, 2, 1, 1),
             (1, 2, 4, 2, 1),
             (2, 4, 20, 4, 2),
             (1, 2, 4, 2, 1),
             (1, 1, 2, 1, 1))


@jax.jit
def bilateral_luma(y):
    """3x3 bilateral: w = ((32-|p-c|)^2)>>5 when |p-c| <= 32 else 0;
    out = (sum(p*w) + c*(256-sum(w))) >> 8."""
    x = y.astype(jnp.int32)
    c = x
    nsum = jnp.zeros_like(x)
    wsum = jnp.zeros_like(x)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            p = jnp.roll(x, (-dy, -dx), (0, 1))
            d = jnp.abs(p - c)
            w = jnp.where(d <= 32, ((32 - d) * (32 - d)) >> 5, 0)
            nsum += p * w
            wsum += w
    out = (nsum + c * (256 - wsum)) >> 8
    # interior only (radius 1); borders keep the source
    h, wd = y.shape
    ii = jnp.zeros((h, wd), bool).at[1:h - 1, 1:wd - 1].set(True)
    return jnp.where(ii, out, x).astype(jnp.uint8)


@jax.jit
def waverage_chroma(c):
    """5x5 weighted average (kernel above, >>6) over the interior."""
    x = c.astype(jnp.int32)
    acc = jnp.zeros_like(x)
    for dy in range(-2, 3):
        for dx in range(-2, 3):
            kw = _CHROMA_K[dy + 2][dx + 2]
            acc += kw * jnp.roll(x, (-dy, -dx), (0, 1))
    out = acc >> 6
    h, wd = c.shape
    ii = jnp.zeros((h, wd), bool).at[2:h - 2, 2:wd - 2].set(True)
    return jnp.where(ii, out, x).astype(jnp.uint8)


def denoise_frame(y, u, v, components: int = 7):
    """Denoise a YUV frame. components: bit0=Y, bit1=U, bit2=V
    (DENOISE_ALL_COMPONENT in the reference)."""
    if components & 1:
        y = bilateral_luma(y)
    if components & 2:
        u = waverage_chroma(u)
    if components & 4:
        v = waverage_chroma(v)
    return y, u, v
