"""Bit I/O + NAL framing tests (model: reference test/encoder/EncUT_ExpGolomb.cpp)."""

import numpy as np
import pytest

from openh264_tpu.bitstream import (
    BitReader,
    BitWriter,
    split_annexb,
    unescape_rbsp,
    escape_rbsp,
    make_annexb_nal,
)


def test_u_roundtrip(rng):
    w = BitWriter()
    vals = []
    for _ in range(1000):
        n = int(rng.integers(1, 25))
        v = int(rng.integers(0, 1 << n))
        vals.append((n, v))
        w.u(n, v)
    w.rbsp_trailing_bits()
    r = BitReader(w.get_bytes())
    for n, v in vals:
        assert r.u(n) == v


def test_ue_se_roundtrip(rng):
    w = BitWriter()
    ues = [int(rng.integers(0, 100000)) for _ in range(500)] + [0, 1, 2, 2**16 - 2]
    ses = [int(rng.integers(-5000, 5000)) for _ in range(500)] + [0, 1, -1, 2047, -2048]
    for v in ues:
        w.ue(v)
    for v in ses:
        w.se(v)
    w.rbsp_trailing_bits()
    r = BitReader(w.get_bytes())
    for v in ues:
        assert r.ue() == v
    for v in ses:
        assert r.se() == v


def test_ue_known_codes():
    # ue(0)='1', ue(1)='010', ue(2)='011', ue(3)='00100'
    w = BitWriter()
    for v in (0, 1, 2, 3):
        w.ue(v)
    w.align_zero()
    assert w.get_bytes() == bytes([0b10100110, 0b01000000])


def test_more_rbsp_data():
    w = BitWriter()
    w.ue(5)
    w.rbsp_trailing_bits()
    r = BitReader(w.get_bytes())
    assert r.more_rbsp_data()
    r.ue()
    assert not r.more_rbsp_data()


def test_escape_unescape_roundtrip(rng):
    for _ in range(50):
        raw = bytes(rng.integers(0, 4, size=rng.integers(1, 200), dtype=np.uint8))
        esc = escape_rbsp(raw)
        # escaped stream must not contain 00 00 0x with x<=2 (00 00 03 is
        # the emulation-prevention pattern itself and is legal)
        b = np.frombuffer(esc, dtype=np.uint8)
        if len(b) >= 3:
            bad = (b[:-2] == 0) & (b[1:-1] == 0) & (b[2:] <= 2)
            assert not bad.any()
        assert unescape_rbsp(esc) == raw


def test_split_annexb():
    n1 = make_annexb_nal(3, 7, b"\x42\x00\x0a\x00\x00\x00\x01\x99")
    n2 = make_annexb_nal(3, 8, b"\xde\xad", long_start_code=False)
    nals = split_annexb(n1 + n2)
    assert len(nals) == 2
    assert nals[0].nal_unit_type == 7
    assert nals[0].rbsp == b"\x42\x00\x0a\x00\x00\x00\x01\x99"
    assert nals[1].nal_unit_type == 8
    assert nals[1].rbsp == b"\xde\xad"


def test_split_annexb_real_stream():
    with open("/root/reference/res/test_qcif_cabac.264", "rb") as f:
        data = f.read()
    nals = split_annexb(data)
    assert len(nals) > 2
    types = [n.nal_unit_type for n in nals]
    assert 7 in types and 8 in types  # SPS + PPS present
    assert types.count(7) >= 1
