"""SDK-surface tests: ISVCEncoder/ISVCDecoder wrappers, rate control,
temporal scalability, force-IDR, CLI apps.

Model: reference test/api/encode_options_test.cpp (option sweeps),
encoder_test.cpp, ltr_test.cpp temporal patterns.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from openh264_tpu.api import (SEncParamExt, WelsCreateSVCEncoder,
                              WelsCreateDecoder, ENCODER_OPTION,
                              DECODING_STATE, RC_BITRATE_MODE)
from openh264_tpu.bitstream import split_annexb, NAL_SLICE, NAL_IDR
from openh264_tpu.decoder import H264Decoder

YUV = "/root/reference/res/CiscoVT2people_160x96_6fps.yuv"
DECBIN = os.path.join(os.path.dirname(__file__), "..", ".ref_build", "src",
                      "h264dec")
W, H = 160, 96


def _frames(n):
    fsz = W * H * 3 // 2
    raw = open(YUV, "rb").read()
    out = []
    for i in range(n):
        j = i % (len(raw) // fsz)
        buf = np.frombuffer(raw[j * fsz:(j + 1) * fsz], np.uint8)
        out.append((buf[:W * H].reshape(H, W),
                    buf[W * H:W * H * 5 // 4].reshape(H // 2, W // 2),
                    buf[W * H * 5 // 4:].reshape(H // 2, W // 2)))
    return out


pytestmark = pytest.mark.skipif(not os.path.exists(YUV),
                                reason="reference res/ absent")


def test_encoder_api_stats_and_force_idr():
    enc = WelsCreateSVCEncoder()
    assert enc.InitializeExt(SEncParamExt(iPicWidth=W, iPicHeight=H,
                                          iRCMode=-1, iInitialQp=30)) == 0
    bs = b""
    for i, (y, u, v) in enumerate(_frames(5)):
        if i == 3:
            enc.ForceIntraFrame(True)
        bs += enc.EncodeFrame(y, u, v)
    st = enc.GetOption(ENCODER_OPTION.GET_STATISTICS)
    assert st.uiInputFrameCount == 5
    assert st.uiIDRReqNum == 1
    assert st.iTotalEncodedBytes == len(bs)
    idr_count = sum(1 for n in split_annexb(bs) if n.nal_unit_type == NAL_IDR)
    assert idr_count == 2  # frame 0 + forced at frame 3
    # headers-only entry point
    hdrs = enc.EncodeParameterSets()
    assert len(split_annexb(hdrs)) == 2


def test_decoder_api_roundtrip():
    enc = WelsCreateSVCEncoder()
    enc.InitializeExt(SEncParamExt(iPicWidth=W, iPicHeight=H, iRCMode=-1,
                                   iInitialQp=28))
    bs = b"".join(enc.EncodeFrame(*f) for f in _frames(4))
    dec = WelsCreateDecoder()
    dec.Initialize()
    # fragmented feeding: odd-sized chunks, then EOS flush (the
    # reference's DecodeFrame2(NULL) end-of-stream call)
    frames = []
    for i in range(0, len(bs), 777):
        state, fr = dec.DecodeFrameNoDelay(bs[i:i + 777])
        assert state == DECODING_STATE.dsErrorFree
        frames += fr
    state, fr = dec.FlushFrame()
    assert state == DECODING_STATE.dsErrorFree
    frames += fr
    assert len(frames) == 4
    st = dec.GetOption(12)  # DECODER_OPTION.GET_STATISTICS
    assert st.uiDecodedFrameCount == 4
    assert (st.uiWidth, st.uiHeight) == (W, H)


def test_rate_control_bitrate_mode():
    """RC must land within a sane band of the target and adapt QP."""
    target = 120_000  # bits/s at 6 fps on 160x96 — reachable
    enc = WelsCreateSVCEncoder()
    enc.InitializeExt(SEncParamExt(iPicWidth=W, iPicHeight=H,
                                   iRCMode=RC_BITRATE_MODE,
                                   iTargetBitrate=target,
                                   fMaxFrameRate=6.0,
                                   bEnableFrameSkip=False))
    n = 12
    bs = b"".join(enc.EncodeFrame(*f) for f in _frames(n))
    bps = 8 * len(bs) * 6.0 / n
    assert 0.4 * target < bps < 2.0 * target, f"achieved {bps:.0f} bps"
    # stream must still decode bit-exactly vs the reference decoder
    frames = H264Decoder().decode_annexb(bs)
    assert len(frames) == n
    if os.path.exists(DECBIN):
        open("/tmp/_rc_test.264", "wb").write(bs)
        subprocess.run([DECBIN, "/tmp/_rc_test.264", "/tmp/_rc_test.yuv"],
                       check=True, capture_output=True)
        ref = np.frombuffer(open("/tmp/_rc_test.yuv", "rb").read(), np.uint8)
        ours = np.concatenate([np.concatenate([p.ravel() for p in f.planes()])
                               for f in frames])
        np.testing.assert_array_equal(ref, ours)


def test_frame_skip_under_tiny_budget():
    enc = WelsCreateSVCEncoder()
    enc.InitializeExt(SEncParamExt(iPicWidth=W, iPicHeight=H,
                                   iRCMode=RC_BITRATE_MODE,
                                   iTargetBitrate=5_000,  # starvation
                                   fMaxFrameRate=6.0,
                                   bEnableFrameSkip=True))
    for f in _frames(10):
        enc.EncodeFrame(*f)
    st = enc.GetOption(ENCODER_OPTION.GET_STATISTICS)
    assert st.uiSkippedFrameCount > 0


@pytest.mark.parametrize("layers", [2, 3])
def test_temporal_layers_droppable(layers):
    """Dyadic temporal scalability: the top layer is non-ref; dropping it
    must leave a valid stream whose frames decode bit-identically."""
    enc = WelsCreateSVCEncoder()
    enc.InitializeExt(SEncParamExt(iPicWidth=W, iPicHeight=H, iRCMode=-1,
                                   iInitialQp=30,
                                   iTemporalLayerNum=layers))
    n = 9
    per_frame = [enc.EncodeFrame(*f) for f in _frames(n)]
    bs = b"".join(per_frame)

    full = H264Decoder().decode_annexb(bs)
    assert len(full) == n
    if os.path.exists(DECBIN):
        open("/tmp/_tl_test.264", "wb").write(bs)
        subprocess.run([DECBIN, "/tmp/_tl_test.264", "/tmp/_tl_test.yuv"],
                       check=True, capture_output=True)
        ref = np.frombuffer(open("/tmp/_tl_test.yuv", "rb").read(), np.uint8)
        ours = np.concatenate([np.concatenate([p.ravel() for p in f.planes()])
                               for f in full])
        np.testing.assert_array_equal(ref, ours)

    # drop every non-reference NAL (top temporal layer)
    kept = []
    dropped = 0
    for chunk in per_frame:
        nals = split_annexb(chunk)
        if any(x.nal_unit_type == NAL_SLICE and x.nal_ref_idc == 0
               for x in nals):
            dropped += 1
            continue
        kept.append(chunk)
    assert dropped == n // 2 if layers == 2 else dropped > 0
    sub = H264Decoder().decode_annexb(b"".join(kept))
    assert len(sub) == n - dropped
    # each base-layer frame identical with and without the top layer
    kept_ids = [i for i, chunk in enumerate(per_frame)
                if chunk in kept]
    for fsub, i in zip(sub, kept_ids):
        for p, q in zip(fsub.planes(), full[i].planes()):
            np.testing.assert_array_equal(p, q)


def test_cli_roundtrip(tmp_path):
    out264 = tmp_path / "out.264"
    outyuv = tmp_path / "out.yuv"
    r = subprocess.run([sys.executable, "-m", "openh264_tpu.cli.h264enc",
                        "-org", YUV, "-sw", str(W), "-sh", str(H),
                        "-frms", "3", "-rc", "-1", "-qp", "28",
                        "-bf", str(out264)],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    assert "FPS:" in r.stdout
    r = subprocess.run([sys.executable, "-m", "openh264_tpu.cli.h264dec",
                        str(out264), str(outyuv)],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    assert outyuv.stat().st_size == 3 * (W * H * 3 // 2)


def test_simulcast_layers_decode():
    """Spatial simulcast (BASELINE config #5): per-layer streams with
    distinct parameter-set ids, each independently decodable."""
    import numpy as np
    from openh264_tpu.encoder.encoder import EncoderConfig
    from openh264_tpu.parallel.simulcast import SimulcastEncoder
    from openh264_tpu.decoder import H264Decoder
    rng = np.random.RandomState(3)
    W, H = 96, 64
    enc = SimulcastEncoder(EncoderConfig(width=W, height=H, qp=32),
                           n_layers=2)
    y = rng.randint(0, 255, (H, W), np.uint8)
    u = rng.randint(0, 255, (H // 2, W // 2), np.uint8)
    v = u.copy()
    outs = []
    for _ in range(2):
        _, layers = enc.encode_frame(y, u, v)
        outs.append(layers)
        y = (y.astype(int) + rng.randint(-6, 6, (H, W))).clip(0, 255).astype(np.uint8)
    for k, (w, h) in enumerate(((W, H), (W // 2, H // 2))):
        frames = H264Decoder().decode_annexb(b"".join(o[k] for o in outs))
        assert len(frames) == 2
        assert frames[0].y.shape == (h, w)


def test_vui_roundtrip():
    """SPS VUI (timing + bitstream restriction, au_set.cpp:197
    WelsWriteVUI) must parse on our decoder and not perturb decode."""
    import numpy as np
    from openh264_tpu.encoder.encoder import EncoderConfig, H264Encoder
    from openh264_tpu.decoder import H264Decoder
    rng = np.random.default_rng(5)
    W, H = 64, 48
    enc = H264Encoder(EncoderConfig(width=W, height=H, qp=30,
                                    enable_vui=True, max_frame_rate=25.0))
    fr = [(rng.integers(0, 256, (H, W), np.uint8),
           rng.integers(0, 256, (H // 2, W // 2), np.uint8),
           rng.integers(0, 256, (H // 2, W // 2), np.uint8))
          for _ in range(2)]
    bs = b"".join(enc.encode_frame(*f) for f in fr)
    frames = H264Decoder().decode_annexb(bs)
    assert len(frames) == 2
    assert np.array_equal(frames[-1].y, enc.dpb[-1].planes[0])


def test_dynamic_resolution_change():
    """Mid-stream resolution change via SetOption(SVC_ENCODE_PARAM_EXT)
    re-init (welsEncoderExt.cpp SetOption dispatch): the decoder must
    follow the new SPS."""
    import numpy as np
    from openh264_tpu.api.encoder_api import WelsCreateSVCEncoder
    from openh264_tpu.api.params import SEncParamExt
    from openh264_tpu.api.options import ENCODER_OPTION
    from openh264_tpu.decoder import H264Decoder
    rng = np.random.default_rng(6)

    def frames(w, h, n):
        return [(rng.integers(0, 256, (h, w), np.uint8),
                 rng.integers(0, 256, (h // 2, w // 2), np.uint8),
                 rng.integers(0, 256, (h // 2, w // 2), np.uint8))
                for _ in range(n)]

    api = WelsCreateSVCEncoder()
    assert api.InitializeExt(SEncParamExt(iPicWidth=64, iPicHeight=48,
                                          iRCMode=-1)) == 0
    bs = b"".join(api.EncodeFrame(*f) for f in frames(64, 48, 2))
    assert api.SetOption(ENCODER_OPTION.SVC_ENCODE_PARAM_EXT,
                         SEncParamExt(iPicWidth=96, iPicHeight=80,
                                      iRCMode=-1)) == 0
    bs += b"".join(api.EncodeFrame(*f) for f in frames(96, 80, 2))
    out = H264Decoder().decode_annexb(bs)
    assert len(out) == 4
    assert out[0].y.shape == (48, 64)
    assert out[-1].y.shape == (80, 96)


def test_encoder_psnr_stats():
    """GET_STATISTICS must report per-sequence recon PSNR
    (encoder_ext.cpp:3918-3940 / WelsCalcPsnr)."""
    enc = WelsCreateSVCEncoder()
    enc.InitializeExt(SEncParamExt(iPicWidth=W, iPicHeight=H, iRCMode=-1,
                                   iInitialQp=26))
    for f in _frames(3):
        enc.EncodeFrame(*f)
    st = enc.GetOption(28)  # ENCODER_OPTION.GET_STATISTICS
    assert 25.0 < st.fAveragePsnrY < 99.0
    assert 25.0 < st.fAveragePsnrU < 99.0


def test_max_bitrate_window():
    """iMaxBitrate caps the 1 s sliding window (ratectl.cpp max-br
    checks): with a loose target but a tight ceiling, the produced
    window bitrate must respect the ceiling via QP pressure + skips."""
    enc = WelsCreateSVCEncoder()
    enc.InitializeExt(SEncParamExt(iPicWidth=W, iPicHeight=H,
                                   iRCMode=RC_BITRATE_MODE,
                                   iTargetBitrate=400_000,
                                   iMaxBitrate=120_000,
                                   fMaxFrameRate=6.0,
                                   bEnableFrameSkip=True))
    n = 18
    chunks = [enc.EncodeFrame(*f) for f in _frames(n)]
    # steady-state 1s windows (6 frames) after warmup
    for s in range(6, n - 6):
        win = sum(8 * len(c) for c in chunks[s:s + 6])
        assert win < 2.0 * 120_000, f"window {s}: {win} bits"
    assert any(c == b"" for c in chunks), "ceiling should force skips"
