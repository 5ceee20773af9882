"""Fast temporal-direct regression gate.

The four VID_*_temporal_direct conformance streams take ~10 min each at
full length, so the always-on gate decodes only the first few access
units of the 720p CAVLC stream (cut at NAL boundaries at test time) and
compares bit-exact against the reference decoder's golden for the same
prefix. Guards the B temporal-direct MV derivation (decoder/direct.py,
ComputeColocatedTemporalScaling parity) and the direct/skip interior
deblock-bS modes (ibs_mode, WelsDeblockingMb deblocking.cpp:1184).
"""

import os
import re
import subprocess

import numpy as np
import pytest

RES = "/root/reference/res"
DECBIN = os.path.join(os.path.dirname(__file__), "..",
                      ".ref_build", "src", "h264dec")
STREAM = "VID_1280x720_cavlc_temporal_direct.264"
N_VCL = 8   # IDR + 7 following pictures (includes B temporal-direct)


@pytest.mark.skipif(not os.path.exists(DECBIN),
                    reason="reference h264dec not built")
def test_temporal_direct_prefix_bit_exact(tmp_path):
    src = open(os.path.join(RES, STREAM), "rb").read()
    starts = [m.start() for m in re.finditer(b"\x00\x00\x00\x01", src)]
    vcl = [p for p in starts if src[p + 4] & 0x1F in (1, 5)]
    trimmed = src[:vcl[N_VCL]] if len(vcl) > N_VCL else src
    cut = tmp_path / "td.264"
    cut.write_bytes(trimmed)
    gold = tmp_path / "td_ref.yuv"
    r = subprocess.run([DECBIN, str(cut), str(gold)],
                       capture_output=True, timeout=120)
    assert r.returncode == 0

    from openh264_tpu.decoder import H264Decoder
    from openh264_tpu.decoder.decoder import write_yuv
    ours = tmp_path / "td_ours.yuv"
    write_yuv(H264Decoder().decode_annexb(trimmed), str(ours))
    a = np.fromfile(str(ours), np.uint8)
    b = np.fromfile(str(gold), np.uint8)
    assert a.shape == b.shape
    assert np.array_equal(a, b)
