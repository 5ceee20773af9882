"""Sharded slice-parallel encoding: mesh compute == single-device
compute, and the multi-slice stream is a real decodable bitstream.

Replaces the reference's threaded-vs-single-thread hash equality tests
(BaseThreadDecoderTest/EncUT_EncoderTaskManagement) with
sharded-vs-single equality (SURVEY §4 carry-over)."""

import os
import subprocess

import numpy as np
import pytest

from openh264_tpu.encoder.encoder import EncoderConfig, H264Encoder
from openh264_tpu.decoder import H264Decoder


def _clip(n_frames=3, W=160, H=96):
    raw = open('/root/reference/res/CiscoVT2people_160x96_6fps.yuv',
               'rb').read()
    fsz = W * H * 3 // 2
    out = []
    for i in range(n_frames):
        f = raw[i * fsz:(i + 1) * fsz]
        out.append((
            np.frombuffer(f[:W * H], np.uint8).reshape(H, W),
            np.frombuffer(f[W * H:W * H * 5 // 4],
                          np.uint8).reshape(H // 2, W // 2),
            np.frombuffer(f[W * H * 5 // 4:],
                          np.uint8).reshape(H // 2, W // 2)))
    return out


def test_sharded_equals_single_device():
    """The mesh-sharded multi-slice encoder must produce the exact
    bytes of the single-device num_slices encoder."""
    import jax
    from openh264_tpu.parallel import make_mesh
    from openh264_tpu.parallel.slice_parallel import SliceParallelEncoder
    if len(jax.devices()) < 2:
        pytest.skip("needs >=2 devices (conftest provides 8 CPU devices)")
    n_slices = 3
    cfg = EncoderConfig(width=160, height=96, qp=28, num_slices=n_slices)
    single = H264Encoder(cfg)
    mesh = make_mesh(n_slices)
    sharded = SliceParallelEncoder(cfg, mesh)
    for (y, u, v) in _clip(3):
        a = single.encode_frame(y, u, v)
        b = sharded.encode_frame(y, u, v)
        assert a == b, "sharded bitstream != single-device bitstream"


def test_multislice_stream_decodes():
    """num_slices>1 produces a standard multi-NAL Annex-B stream that
    both our decoder and the reference decoder reproduce bit-exactly."""
    cfg = EncoderConfig(width=160, height=96, qp=30, num_slices=2)
    enc = H264Encoder(cfg)
    bs = b"".join(enc.encode_frame(y, u, v) for (y, u, v) in _clip(3))
    frames = H264Decoder().decode_annexb(bs)
    assert len(frames) == 3
    mine = b"".join(p.tobytes() for fr in frames for p in fr.planes())
    decb = os.path.join(os.path.dirname(__file__), "..",
                        ".ref_build", "src", "h264dec")
    if os.path.exists(decb):
        import tempfile
        with tempfile.NamedTemporaryFile(suffix=".264") as f, \
                tempfile.NamedTemporaryFile(suffix=".yuv") as g:
            f.write(bs)
            f.flush()
            subprocess.run([decb, f.name, g.name], check=True,
                           capture_output=True)
            ref = open(g.name, "rb").read()
        assert mine == ref
