"""VAA (visual analysis array) statistics.

Behavior parity: processing vaacalcfuncs.cpp VAACalcSadSsdBgd_c:338
(and its Sad/SadVar/SadSsd/SadBgd siblings — this one computes the
superset). Per 8x8 block of the luma plane: SAD, signed sum-of-diff
(SD), max abs diff (MAD) vs the previous frame; per 16x16 MB: sum,
sum-of-squares of the current frame and SSD (sum of squared diffs).

TPU-native shape: one reshape-reduce over the whole frame instead of a
per-MB quadrant loop; all outputs are [mbH, mbW(, 4)] int32 tensors
(quadrant order TL,TR,BL,BR like the reference's mb_index*4+q layout).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _blocks8(x):
    """[H,W] -> [mbH, mbW, 4, 64] grouping 8x8 quadrants per MB."""
    h, w = x.shape
    mh, mw = h // 16, w // 16
    # [mh, 2, 8, mw, 2, 8] -> [mh, mw, 2(qy), 2(qx), 8, 8]
    b = x.reshape(mh, 2, 8, mw, 2, 8).transpose(0, 3, 1, 4, 2, 5)
    return b.reshape(mh, mw, 4, 64)


@partial(jax.jit, static_argnames=())
def vaa_calc(cur, ref):
    """Full VAA stats between current and reference luma planes.

    Args: cur, ref: [H, W] uint8, H/W multiples of 16 (the reference
    operates on the 16-aligned padded picture).
    Returns dict of int32 tensors:
      frame_sad [], sad8x8 [mh,mw,4], sd8x8 [mh,mw,4], mad8x8 [mh,mw,4],
      sum16x16 [mh,mw], sqsum16x16 [mh,mw], sqdiff16x16 [mh,mw]
    """
    c = _blocks8(cur.astype(jnp.int32))
    r = _blocks8(ref.astype(jnp.int32))
    d = c - r
    ad = jnp.abs(d)
    sad8 = ad.sum(-1)
    out = {
        "sad8x8": sad8,
        "sd8x8": d.sum(-1),
        "mad8x8": ad.max(-1),
        "sum16x16": c.sum((-1, -2)),
        "sqsum16x16": (c * c).sum((-1, -2)),
        "sqdiff16x16": (ad * ad).sum((-1, -2)),
        "frame_sad": sad8.sum(),
    }
    return out


@jax.jit
def vaa_sad_only(cur, ref):
    """VAACalcSad_c: frame SAD + per-8x8 SAD only (cheapest mode)."""
    c = _blocks8(cur.astype(jnp.int32))
    r = _blocks8(ref.astype(jnp.int32))
    sad8 = jnp.abs(c - r).sum(-1)
    return {"sad8x8": sad8, "frame_sad": sad8.sum()}
