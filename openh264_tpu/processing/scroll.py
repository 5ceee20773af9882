"""Scroll detection for screen content (METHOD_SCROLL_DETECTION).

Behavior parity: processing ScrollDetectionFuncs.cpp
ScrollDetectionCore:110 — pick a high-variance test row of the current
frame, search the reference frame within +-MAX_SCROLL_MV_Y rows for an
exact row match, confirm with a window of neighboring rows, output
(bScrollDetectFlag, iScrollMvY). The reference searches a single
region (or 3 sub-regions via ScrollDetectionWithMask).

TPU-native shape: instead of a serial early-exit line scan, compare
the test row against ALL candidate rows at once (one [nCand, W] equal-
reduce) and confirm the whole check window batched; argmin of |offset|
over exact matches reproduces the reference's nearest-first search
order.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

MAX_SCROLL_MV_Y = 255
CHECK_OFFSET = 4


def _row_variance_pick(cur: np.ndarray) -> int:
    """Pick a test row: the reference's SelectTestLine wants a row with
    enough detail to be discriminative; we choose the max-variance row
    in the middle half of the picture (equivalent selection intent)."""
    h = cur.shape[0]
    lo, hi = h // 4, max(h // 4 + 1, 3 * h // 4)
    rows = cur[lo:hi].astype(np.int64)
    var = (rows * rows).mean(1) - rows.mean(1) ** 2
    return int(lo + var.argmax())


@jax.jit
def _match_rows(cur_win, ref_rows):
    """cur_win [K, W] vs ref_rows [nCand, K, W] -> [nCand] all-equal."""
    return (ref_rows == cur_win[None]).all((1, 2))


def detect_scroll(cur, ref, max_mv: int = MAX_SCROLL_MV_Y):
    """Returns (flag, mv_y). cur/ref: [H, W] uint8 luma planes."""
    cur = np.asarray(cur)
    ref = np.asarray(ref)
    h, w = cur.shape
    test = _row_variance_pick(cur)
    k = CHECK_OFFSET * 2 + 1
    half = CHECK_OFFSET
    if test - half < 0 or test + half >= h:
        return False, 0
    cur_win = cur[test - half:test + half + 1]
    offs = [o for o in range(-max_mv, max_mv + 1)
            if 0 <= test + o - half and test + o + half < h]
    if not offs:
        return False, 0
    cand = np.stack([ref[test + o - half:test + o + half + 1] for o in offs])
    eq = np.asarray(_match_rows(jnp.asarray(cur_win), jnp.asarray(cand)))
    if not eq.any():
        return False, 0
    # a flat window matches everywhere — not evidence of scrolling
    if cur_win.std() < 1.0:
        return False, 0
    offs = np.asarray(offs)
    hits = offs[eq]
    mv = int(hits[np.abs(hits).argmin()])
    return True, mv
