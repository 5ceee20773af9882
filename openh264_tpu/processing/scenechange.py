"""Scene change detection (METHOD_SCENE_CHANGE_DETECTION_VIDEO/_SCREEN).

Behavior parity: processing SceneChangeDetection.h — per non-overlapping
8x8 block of the (unpadded) picture, SAD vs the previous frame; a block
with SAD > 320 is a "high motion" block. The frame is LARGE_CHANGED
when motion blocks >= 0.85 (video) / 0.80 (screen) of all blocks,
MEDIUM_CHANGED at >= 0.50 (thresholds SceneChangeDetection.h:53-55,
decision Process():~230).

The screen variant also classifies blocks as COLLOCATED_STATIC
(SAD==0) or SCROLLED_STATIC (SAD at the detected scroll vector == 0)
and accumulates frame complexity over the rest.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

SIMILAR = 0
SCENE_CHANGED_MEDIUM = 1
SCENE_CHANGED_LARGE = 2

HIGH_MOTION_BLOCK_THRESHOLD = 320
RATIO_LARGE_VIDEO = 0.85
RATIO_LARGE_SCREEN = 0.80
RATIO_MEDIUM = 0.50

NO_STATIC = 0
COLLOCATED_STATIC = 1
SCROLLED_STATIC = 2


def _sad8_grid(cur, ref):
    h, w = cur.shape
    bh, bw = h >> 3, w >> 3
    c = cur[:bh * 8, :bw * 8].astype(jnp.int32)
    r = ref[:bh * 8, :bw * 8].astype(jnp.int32)
    d = jnp.abs(c - r).reshape(bh, 8, bw, 8)
    return d.sum((1, 3))


@jax.jit
def _motion_blocks(cur, ref):
    sad = _sad8_grid(cur, ref)
    return (sad > HIGH_MOTION_BLOCK_THRESHOLD).sum(), sad


def detect_scene_change(cur, ref, screen: bool = False,
                        scroll_mv: tuple[int, int] | None = None):
    """Returns (idc, result_dict). cur/ref: [H, W] uint8 luma."""
    n_motion, sad = _motion_blocks(cur, ref)
    n_motion = int(n_motion)
    nblk = sad.shape[0] * sad.shape[1]
    large = RATIO_LARGE_SCREEN if screen else RATIO_LARGE_VIDEO
    thd_large = int(large * nblk + 0.5 + 1e-6)
    thd_medium = int(RATIO_MEDIUM * nblk + 0.5 + 1e-6)
    idc = SIMILAR
    if n_motion >= thd_large:
        idc = SCENE_CHANGED_LARGE
    elif n_motion >= thd_medium:
        idc = SCENE_CHANGED_MEDIUM
    res = {"motion_blocks": n_motion, "sad8x8": sad,
           "frame_complexity": int(sad.sum())}
    if screen:
        static_idc = jnp.where(sad == 0, COLLOCATED_STATIC, NO_STATIC)
        if scroll_mv is not None and (scroll_mv[0] or scroll_mv[1]):
            sad_scroll = _scrolled_sad(cur, ref, scroll_mv)
            static_idc = jnp.where((static_idc == NO_STATIC)
                                   & (sad_scroll == 0),
                                   SCROLLED_STATIC, static_idc)
        res["static_block_idc"] = static_idc
    return idc, res


@partial(jax.jit, static_argnames=("mv",))
def _scrolled_sad(cur, ref, mv: tuple[int, int]):
    """8x8 SAD grid against the scroll-shifted reference; out-of-range
    blocks get a large sentinel so they never classify as static."""
    dx, dy = int(mv[0]), int(mv[1])
    shifted = jnp.roll(ref, (-dy, -dx), (0, 1))
    sad = _sad8_grid(cur, shifted)
    bh, bw = sad.shape
    by = jnp.arange(bh)[:, None] * 8
    bx = jnp.arange(bw)[None, :] * 8
    h, w = cur.shape
    ok = ((bx + dx >= 0) & (bx + dx <= w - 8)
          & (by + dy >= 0) & (by + dy <= h - 8))
    return jnp.where(ok, sad, 1 << 20)
