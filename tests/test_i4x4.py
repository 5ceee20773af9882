"""I4x4 intra mode decision (native C wavefront, enc_intra.c).

Parity anchors: WelsMdI4x4 (svc_base_layer_md.cpp:418) cost structure;
spec 7.3.5 / 7.4.5.1 syntax. The stream must decode bit-exact on our
conformance-proven decoder and close the loop against the encoder's
own reconstruction (the same pred4 C routine reconstructs on both
sides).
"""

import numpy as np
import pytest

from openh264_tpu.encoder.encoder import EncoderConfig, H264Encoder
from openh264_tpu.decoder import H264Decoder
from openh264_tpu.native import available

W, H = 96, 80

pytestmark = pytest.mark.skipif(not available(),
                                reason="no C toolchain for enc_intra")


def _frames(n, rng):
    # structured content (gradients + texture) so I4x4 actually wins
    yy, xx = np.mgrid[0:H, 0:W]
    out = []
    for i in range(n):
        y = ((xx * 2 + yy + 8 * i) % 256).astype(np.uint8)
        y[20:60, 30:70] = rng.integers(0, 256, (40, 40), np.uint8)
        u = ((xx[:H // 2, :W // 2] + i) % 256).astype(np.uint8)
        v = ((yy[:H // 2, :W // 2] * 2) % 256).astype(np.uint8)
        out.append((y, u, v))
    return out


def test_i4x4_roundtrip_and_gain(rng):
    fr = _frames(3, rng)
    e4 = H264Encoder(EncoderConfig(width=W, height=H, qp=28,
                                   enable_i4x4=True))
    bs4 = b"".join(e4.encode_frame(*f) for f in fr)
    frames = H264Decoder().decode_annexb(bs4)
    assert len(frames) == 3
    # closed loop: decoder recon == encoder DPB recon
    assert np.array_equal(frames[-1].y, e4.dpb[-1].planes[0])
    assert np.array_equal(frames[-1].u, e4.dpb[-1].planes[1])
    assert np.array_equal(frames[-1].v, e4.dpb[-1].planes[2])
    # some MBs actually chose I4x4 on this content
    from openh264_tpu.native import enc_intra_frame_native
    from openh264_tpu.encoder.core_jax import QP_COST_TABLE
    out = enc_intra_frame_native(*fr[0], 28, 28, int(QP_COST_TABLE[28]))
    assert (out["kind"] == 0).any(), "no MB picked I4x4"


def test_i4x4_bits_gain_real_content():
    """On real camera content the per-MB I16/I4 choice must shrink the
    stream (measured ~13% on the I frame of the VT clip at QP 28)."""
    yuv = '/root/reference/res/CiscoVT2people_160x96_6fps.yuv'
    raw = open(yuv, 'rb').read()
    w, h = 160, 96
    fsz = w * h * 3 // 2
    f = raw[:fsz]
    y = np.frombuffer(f[:w * h], np.uint8).reshape(h, w)
    u = np.frombuffer(f[w * h:w * h * 5 // 4], np.uint8).reshape(h // 2,
                                                                 w // 2)
    v = np.frombuffer(f[w * h * 5 // 4:], np.uint8).reshape(h // 2, w // 2)
    e4 = H264Encoder(EncoderConfig(width=w, height=h, qp=28,
                                   enable_i4x4=True))
    b4 = e4.encode_frame(y, u, v)
    e16 = H264Encoder(EncoderConfig(width=w, height=h, qp=28))
    b16 = e16.encode_frame(y, u, v)
    assert len(b4) < len(b16), (len(b4), len(b16))
    frames = H264Decoder().decode_annexb(b4)
    assert np.array_equal(frames[0].y, e4.dpb[-1].planes[0])


def test_i4x4_idr_interval(rng):
    """Multiple IDRs re-run the native intra MD with fresh contexts."""
    fr = _frames(5, rng)
    enc = H264Encoder(EncoderConfig(width=W, height=H, qp=30,
                                    enable_i4x4=True, idr_interval=2))
    bs = b"".join(enc.encode_frame(*f) for f in fr)
    assert len(H264Decoder().decode_annexb(bs)) == 5
