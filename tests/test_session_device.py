"""Device fast-path session: feature matrix + overflow recovery.

The DeviceSessionEncoder is the flagship path; these tests pin it
against the host H264Encoder (byte-identical where the paths share
semantics) and against our conformance-tested decoder (decodability +
recon self-consistency where they legitimately differ, e.g. the
multi-slice device path runs ONE full-frame core instead of per-band
cores).
"""

import numpy as np
import pytest

from openh264_tpu.encoder.encoder import EncoderConfig, H264Encoder
from openh264_tpu.encoder.session_device import DeviceSessionEncoder
from openh264_tpu.decoder import H264Decoder

W, H = 96, 80


def _frames(n, rng, w=W, h=H):
    fr = []
    base_y = rng.integers(0, 256, (h, w), np.uint8)
    base_u = rng.integers(0, 256, (h // 2, w // 2), np.uint8)
    base_v = rng.integers(0, 256, (h // 2, w // 2), np.uint8)
    for i in range(n):
        dy = np.roll(base_y, i * 2, axis=1)
        du = np.roll(base_u, i, axis=1)
        dv = np.roll(base_v, i, axis=1)
        noise = rng.integers(-3, 4, dy.shape).astype(np.int16)
        fr.append(((dy.astype(np.int16) + noise).clip(0, 255).astype(np.uint8),
                   du, dv))
    return fr


def _decode_ok(bs, n_expect):
    frames = H264Decoder().decode_annexb(bs)
    assert len(frames) == n_expect, f"decoded {len(frames)} != {n_expect}"
    return frames


def test_single_slice_matches_host(rng):
    fr = _frames(5, rng)
    cfg = EncoderConfig(width=W, height=H, qp=30)
    dev = DeviceSessionEncoder(cfg)
    got = b"".join(dev.encode_stream(iter(fr)))
    host = H264Encoder(EncoderConfig(width=W, height=H, qp=30))
    want = b"".join(host.encode_frame(*f) for f in fr)
    assert got == want


def test_temporal_layers_matches_host(rng):
    fr = _frames(9, rng)
    cfg = EncoderConfig(width=W, height=H, qp=30, temporal_layers=3)
    dev = DeviceSessionEncoder(cfg)
    got = b"".join(dev.encode_stream(iter(fr)))
    host = H264Encoder(EncoderConfig(width=W, height=H, qp=30,
                                     temporal_layers=3))
    want = b"".join(host.encode_frame(*f) for f in fr)
    assert got == want
    _decode_ok(got, 9)


@pytest.mark.parametrize("deblock_idc", [0, 2])
def test_multislice_decodes(rng, deblock_idc):
    fr = _frames(4, rng)
    cfg = EncoderConfig(width=W, height=H, qp=30, num_slices=3,
                        deblock_idc=deblock_idc)
    dev = DeviceSessionEncoder(cfg)
    bs = b"".join(dev.encode_stream(iter(fr)))
    frames = _decode_ok(bs, 4)
    # the decoder's recon of the last frame must equal the session's
    # device-resident reference plane (closed loop)
    assert np.array_equal(frames[-1].y, np.asarray(dev.dpb[-1].planes[0]))
    assert np.array_equal(frames[-1].u, np.asarray(dev.dpb[-1].planes[1]))


def test_rc_bitrate_window(rng):
    fr = _frames(12, rng)
    target = 600_000
    cfg = EncoderConfig(width=W, height=H, qp=32, rc_mode=1,
                        target_bitrate=target, max_frame_rate=12.0,
                        enable_frame_skip=False)
    dev = DeviceSessionEncoder(cfg)
    outs = dev.encode_stream(iter(fr))
    bs = b"".join(outs)
    _decode_ok(bs, sum(1 for o in outs if o))
    bps = 8 * len(bs) / (len(fr) / 12.0)
    assert 0.4 * target < bps < 2.5 * target, f"{bps} vs {target}"


def test_rc_multislice_temporal_combo(rng):
    """The VERDICT headline config: rc + slices + temporal layers all on
    the device path at once."""
    fr = _frames(10, rng)
    cfg = EncoderConfig(width=W, height=H, qp=32, rc_mode=1,
                        target_bitrate=800_000, max_frame_rate=10.0,
                        num_slices=2, temporal_layers=2,
                        enable_frame_skip=False)
    dev = DeviceSessionEncoder(cfg)
    outs = dev.encode_stream(iter(fr))
    _decode_ok(b"".join(outs), sum(1 for o in outs if o))


def test_overflow_repacks_not_raises(rng):
    """Entropy-dense noise + a deliberately tiny body buffer: the
    session must repack on device (TRY_REENCODING analog), never raise,
    and the output must equal the large-buffer encode bit for bit."""
    fr = [(rng.integers(0, 256, (H, W), np.uint8),
           rng.integers(0, 256, (H // 2, W // 2), np.uint8),
           rng.integers(0, 256, (H // 2, W // 2), np.uint8))
          for _ in range(2)]
    cfg = EncoderConfig(width=W, height=H, qp=18)
    tiny = DeviceSessionEncoder(cfg, max_body_bytes=1 << 10)
    got = b"".join(tiny.encode_frame(*f) for f in fr)
    big = DeviceSessionEncoder(EncoderConfig(width=W, height=H, qp=18))
    want = b"".join(big.encode_frame(*f) for f in fr)
    assert got == want
    _decode_ok(got, 2)


def test_rc_frame_skip(rng):
    """A starved bucket must produce skipped (empty) frames, not
    overshoot (RcVBufferCalculationSkipPic analog)."""
    fr = _frames(16, rng)
    cfg = EncoderConfig(width=W, height=H, qp=30, rc_mode=1,
                        target_bitrate=30_000, max_frame_rate=30.0,
                        enable_frame_skip=True)
    dev = DeviceSessionEncoder(cfg)
    outs = dev.encode_stream(iter(fr))
    assert any(o == b"" for o in outs[1:]), "expected at least one skip"
    _decode_ok(b"".join(outs), sum(1 for o in outs if o))
