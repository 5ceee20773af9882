"""GOP-level data parallelism: byte-identical to serial closed-GOP
encode, stitched in input order (BASELINE config #5 sharding axis)."""

import numpy as np
import jax

from openh264_tpu.encoder.encoder import EncoderConfig
from openh264_tpu.encoder.session_device import DeviceSessionEncoder
from openh264_tpu.parallel.gop_parallel import GopParallelEncoder
from openh264_tpu.decoder import H264Decoder

W, H = 96, 80


def test_gop_parallel_matches_serial(rng):
    fr = []
    base = rng.integers(0, 256, (H, W), np.uint8)
    u = rng.integers(0, 256, (H // 2, W // 2), np.uint8)
    v = rng.integers(0, 256, (H // 2, W // 2), np.uint8)
    for i in range(12):
        fr.append(((np.roll(base, 2 * i, 1).astype(np.int16)
                    + rng.integers(-2, 3, base.shape)).clip(0, 255)
                   .astype(np.uint8), u, v))
    cfg = EncoderConfig(width=W, height=H, qp=30, idr_interval=4)
    par = GopParallelEncoder(cfg, devices=jax.devices())
    assert len(par.devices) >= 2, "conftest provides 8 virtual devices"
    got = par.encode_stream(iter(fr))
    ser = DeviceSessionEncoder(
        EncoderConfig(width=W, height=H, qp=30,
                      idr_interval=4)).encode_stream(iter(fr))
    assert b"".join(got) == b"".join(ser)
    assert len(H264Decoder().decode_annexb(b"".join(got))) == 12


def test_simulcast_device_parallel_matches_serial(rng):
    """Simulcast layers across devices (one session per device) must be
    byte-identical to the serial layer loop."""
    from openh264_tpu.parallel.simulcast import SimulcastEncoder
    w, h = 128, 96
    ser = SimulcastEncoder(EncoderConfig(width=w, height=h, qp=30), 2)
    par = SimulcastEncoder(EncoderConfig(width=w, height=h, qp=30), 2,
                           devices=jax.devices())
    bs_a = bs_b = b""
    for _ in range(2):
        y = rng.integers(0, 256, (h, w), np.uint8)
        u = rng.integers(0, 256, (h // 2, w // 2), np.uint8)
        v = rng.integers(0, 256, (h // 2, w // 2), np.uint8)
        bs_a += ser.encode_frame(y, u, v)[0]
        bs_b += par.encode_frame(y, u, v)[0]
    assert bs_a == bs_b
