"""Decoder conformance vs reference-decoder golden YUV output.

Model: reference test/api/decoder_test.cpp SHA-1 golden table — here we
compare decoded planes byte-exactly against `h264dec` output produced
into .ref_build/golden (see .claude/skills/verify/SKILL.md). Skips when
goldens are absent (fresh clone without the reference build).
"""

import os
import subprocess

import numpy as np
import pytest

from openh264_tpu.decoder import H264Decoder

RES = "/root/reference/res"
GOLD = os.path.join(os.path.dirname(__file__), "..", ".ref_build", "golden")
DECBIN = os.path.join(os.path.dirname(__file__), "..", ".ref_build", "src", "h264dec")

# streams fully supported by the current decoder (grow this list as
# features land; the goal is the full res/ table)
STREAMS_I_CAVLC = [
    "BA1_Sony_D.jsv",
    "NL1_Sony_D.jsv",
    "SVA_BA1_B.264",
    "SVA_NL1_B.264",
    "BAMQ1_JVC_C.264",
    "CVPCMNL1_SVA_C.264",
    "BASQP1_Sony_C.jsv",
]

# I+P CAVLC streams (MC, MVP, skip, DPB, MMCO, multi-paramset...).
# The longest ones run in the slow nightly-style sweep, not here.
STREAMS_P_CAVLC = [
    "SVA_Base_B.264",
    "test_vd_1d.264",
    "test_vd_rc.264",
    "SVA_BA2_D.264",
    "SVA_NL2_E.264",
    "SarVui.264",
    "Static.264",
    "NLMQ2_JVC_C.264",
]


def _golden(stream: str) -> bytes:
    path = os.path.join(GOLD, stream + ".yuv")
    if not os.path.exists(path):
        if not os.path.exists(DECBIN):
            pytest.skip("reference decoder not built (.ref_build missing)")
        os.makedirs(GOLD, exist_ok=True)
        subprocess.run([DECBIN, os.path.join(RES, stream), path],
                       check=True, capture_output=True)
    with open(path, "rb") as f:
        return f.read()


@pytest.mark.parametrize("stream", STREAMS_I_CAVLC + STREAMS_P_CAVLC)
def test_bit_exact_decode(stream):
    if not os.path.exists(RES):
        pytest.skip("reference res/ not available")
    gold = _golden(stream)
    with open(os.path.join(RES, stream), "rb") as f:
        data = f.read()
    frames = H264Decoder().decode_annexb(data)
    out = b"".join(p.tobytes() for fr in frames for p in fr.planes())
    assert len(out) == len(gold), f"frame count/size mismatch for {stream}"
    assert out == gold, f"decode not bit-exact for {stream}"


def test_decoder_robustness():
    assert H264Decoder().decode_annexb(b"") == []
    rng = np.random.default_rng(1)
    garbage = bytes(rng.integers(0, 256, 4096, dtype=np.uint8))
    assert H264Decoder().decode_annexb(garbage) == []
