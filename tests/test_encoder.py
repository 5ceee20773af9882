"""Encoder round-trip tests.

Model: reference test/encoder/* (EncodeDecodeTestAPI) — encode real YUV,
then require (a) our own bit-exact decoder reproduces the encoder's
internal reconstruction exactly (closed loop), and (b) the reference
decoder, when built, agrees byte-for-byte, and (c) PSNR vs the source is
sane for the QP.
"""

import os
import subprocess

import numpy as np
import pytest

from openh264_tpu.decoder import H264Decoder
from openh264_tpu.encoder.encoder import EncoderConfig, H264Encoder

YUV = "/root/reference/res/CiscoVT2people_160x96_6fps.yuv"
DECBIN = os.path.join(os.path.dirname(__file__), "..", ".ref_build", "src", "h264dec")
W, H = 160, 96


def _frames(n):
    fsz = W * H * 3 // 2
    raw = open(YUV, "rb").read()[: n * fsz]
    out = []
    for i in range(len(raw) // fsz):
        buf = np.frombuffer(raw[i * fsz:(i + 1) * fsz], np.uint8)
        y = buf[:W * H].reshape(H, W)
        u = buf[W * H:W * H + W * H // 4].reshape(H // 2, W // 2)
        v = buf[W * H + W * H // 4:].reshape(H // 2, W // 2)
        out.append((y, u, v))
    return out


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(255.0 ** 2 / mse)


@pytest.mark.skipif(not os.path.exists(YUV), reason="reference res/ absent")
@pytest.mark.parametrize("qp,nframes,idr_int,cabac", [(26, 3, 0, False),
                                                      (32, 3, 2, False),
                                                      (28, 3, 0, True)])
def test_roundtrip_ipp(qp, nframes, idr_int, cabac):
    frames = _frames(nframes)
    cfg = EncoderConfig(width=W, height=H, qp=qp, idr_interval=idr_int,
                        entropy_cabac=cabac)
    enc = H264Encoder(cfg)
    bs = b""
    recons = []
    for (y, u, v) in frames:
        bs += enc.encode_frame(y, u, v)
        recons.append(tuple(np.asarray(p) for p in enc.dpb[-1].planes))

    dec = H264Decoder().decode_annexb(bs)
    assert len(dec) == len(frames)
    for i, fr in enumerate(dec):
        for p, r in zip(fr.planes(), recons[i]):
            np.testing.assert_array_equal(p, r, err_msg=f"frame {i}")

    src = np.concatenate([np.concatenate([y.ravel(), u.ravel(), v.ravel()])
                          for (y, u, v) in frames])
    out = np.concatenate([np.concatenate([p.ravel() for p in fr.planes()])
                          for fr in dec])
    assert _psnr(src, out) > 30.0

    if os.path.exists(DECBIN):
        open("/tmp/_enc_rt_test.264", "wb").write(bs)
        subprocess.run([DECBIN, "/tmp/_enc_rt_test.264", "/tmp/_enc_rt_test.yuv"],
                       check=True, capture_output=True)
        ref = np.frombuffer(open("/tmp/_enc_rt_test.yuv", "rb").read(), np.uint8)
        np.testing.assert_array_equal(ref, out.astype(np.uint8))


def test_roundtrip_synthetic_sizes():
    """Odd (non-MB-multiple) sizes exercise cropping."""
    rng = np.random.default_rng(7)
    w, h = 44, 36
    cfg = EncoderConfig(width=w, height=h, qp=30)
    enc = H264Encoder(cfg)
    base = rng.integers(0, 255, (h, w), np.uint8)
    bs = b""
    recons = []
    for t in range(2):
        y = np.roll(base, t, axis=1)
        u = rng.integers(0, 255, (h // 2, w // 2), np.uint8)
        v = rng.integers(0, 255, (h // 2, w // 2), np.uint8)
        bs += enc.encode_frame(y, u, v)
        recons.append(tuple(np.asarray(p) for p in enc.dpb[-1].planes))
    dec = H264Decoder().decode_annexb(bs)
    assert len(dec) == 2
    for i, fr in enumerate(dec):
        for p, r in zip(fr.planes(), recons[i]):
            # enc.ref is MB-padded; the decoder crops to the SPS window
            np.testing.assert_array_equal(p, r[:p.shape[0], :p.shape[1]])
