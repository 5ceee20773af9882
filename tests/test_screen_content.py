"""Screen-content path: scroll detection feeds a global whole-MB
candidate into the P core (svc_mode_decision.cpp JudgeScrollSkip /
MotionEstimateFeatureFullSearch intent at MB granularity).

A vertical scroll larger than the local search range must collapse the
P frame to near-zero residual with the scroll vector, and the stream
must stay closed-loop / bit-exact on the reference decoder.
"""

import os
import subprocess

import numpy as np

from openh264_tpu.encoder.encoder import EncoderConfig, H264Encoder
from openh264_tpu.decoder import H264Decoder

W, H = 96, 160   # tall frame, vertical scroll


def _screen_frames(rng, shifts):
    base = np.kron(rng.integers(0, 256, (H // 4 + 32, W // 4), np.uint8),
                   np.ones((4, 4), np.uint8))
    u = np.full((H // 2, W // 2), 90, np.uint8)
    v = np.full((H // 2, W // 2), 150, np.uint8)
    return [(base[s:s + H, :W].copy(), u, v) for s in shifts]


def test_scroll_candidate_shrinks_bits(rng):
    f0, f1 = _screen_frames(rng, (0, 48))  # 48-px scroll >> search range
    scr = H264Encoder(EncoderConfig(width=W, height=H, qp=28,
                                    usage_type=1, enable_intra_in_p=False))
    bs_scr = scr.encode_frame(*f0) + scr.encode_frame(*f1)
    cam = H264Encoder(EncoderConfig(width=W, height=H, qp=28,
                                    enable_intra_in_p=False))
    bs_cam = cam.encode_frame(*f0) + cam.encode_frame(*f1)
    # the scrolled P frame must get dramatically cheaper
    assert len(bs_scr) < 0.7 * len(bs_cam), (len(bs_scr), len(bs_cam))

    frames = H264Decoder().decode_annexb(bs_scr)
    assert len(frames) == 2
    assert np.array_equal(frames[-1].y, scr.dpb[-1].planes[0])
    dec = os.path.join(os.path.dirname(__file__), "..", ".ref_build",
                       "src", "h264dec")
    if os.path.exists(dec):
        open("/tmp/_scr_t.264", "wb").write(bs_scr)
        subprocess.run([dec, "/tmp/_scr_t.264", "/tmp/_scr_t.yuv"],
                       capture_output=True, timeout=60)
        ref = open("/tmp/_scr_t.yuv", "rb").read()
        got = b"".join(f.y.tobytes() + f.u.tobytes() + f.v.tobytes()
                       for f in frames)
        assert ref == got
