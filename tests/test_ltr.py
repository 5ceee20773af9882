"""Long-term reference: periodic MMCO marking + loss recovery.

Reference protocol: ref_list_mgr_svc.cpp (WelsMarkPic / marking
feedback / recovery request), codec_app_def.h:239-263; test modeled on
the reference's ltr_test.cpp loss-recovery scenario.
"""

import numpy as np

from openh264_tpu.encoder.encoder import EncoderConfig, H264Encoder
from openh264_tpu.decoder import H264Decoder
from openh264_tpu.api.encoder_api import WelsCreateSVCEncoder, cmResultSuccess
from openh264_tpu.api.options import ENCODER_OPTION

W, H = 96, 80


def _frames(n, rng):
    base_y = rng.integers(0, 256, (H, W), np.uint8)
    base_u = rng.integers(0, 256, (H // 2, W // 2), np.uint8)
    base_v = rng.integers(0, 256, (H // 2, W // 2), np.uint8)
    out = []
    for i in range(n):
        dy = np.roll(base_y, 2 * i, axis=1)
        noise = rng.integers(-3, 4, dy.shape).astype(np.int16)
        out.append(((dy.astype(np.int16) + noise).clip(0, 255)
                    .astype(np.uint8), base_u, base_v))
    return out


def test_ltr_stream_decodes(rng):
    """MMCO-marked stream must be decodable and drift-free end to end."""
    fr = _frames(8, rng)
    enc = H264Encoder(EncoderConfig(width=W, height=H, qp=30,
                                    enable_ltr=True, ltr_mark_period=3))
    bs = b"".join(enc.encode_frame(*f) for f in fr)
    frames = H264Decoder().decode_annexb(bs)
    assert len(frames) == 8
    # closed loop: decoder recon of the last frame == encoder DPB recon
    assert np.array_equal(frames[-1].y, enc.dpb[-1].planes[0])
    # marking happened: an LTR entry besides the IDR exists
    assert any(e.is_ltr and e.coding_idx > 0 for e in enc.dpb)


def test_ltr_loss_recovery(rng):
    """Drop two frames after an LTR mark, issue a recovery request: the
    next frame re-anchors on the LTR and decoding continues drift-free
    (no IDR needed)."""
    fr = _frames(9, rng)
    enc = H264Encoder(EncoderConfig(width=W, height=H, qp=30,
                                    enable_ltr=True, ltr_mark_period=3))
    chunks = [enc.encode_frame(*f) for f in fr[:6]]
    # receiver reports loss of frames 4-5; frame coded at idx 3 was
    # marked LTR and acked
    enc.ltr_marking_feedback({"uiFeedbackType": 1, "iLTRFrameNum": 3})
    enc.ltr_recovery_request()
    chunks += [enc.encode_frame(*f) for f in fr[6:]]

    full = H264Decoder().decode_annexb(b"".join(chunks))
    assert len(full) == 9
    lossy = b"".join(chunks[:4] + chunks[6:])      # frames 4,5 lost
    got = H264Decoder().decode_annexb(lossy)
    assert len(got) == 7
    # recovery point and everything after must match the lossless decode
    for k in (-3, -2, -1):
        assert np.array_equal(got[k].y, full[k].y)
        assert np.array_equal(got[k].u, full[k].u)
        assert np.array_equal(got[k].v, full[k].v)


def test_ltr_api_options(rng):
    """SetOption wiring: LTR enable + marking period + recovery via the
    ISVCEncoder surface; unsupported ids error instead of lying."""
    from openh264_tpu.api.params import SEncParamBase
    api = WelsCreateSVCEncoder()
    assert api.Initialize(SEncParamBase(iPicWidth=W, iPicHeight=H,
                                        iRCMode=-1)) == cmResultSuccess
    assert api.SetOption(ENCODER_OPTION.LTR, 1) == cmResultSuccess
    assert api.SetOption(ENCODER_OPTION.LTR_MARKING_PERIOD, 2) == \
        cmResultSuccess
    fr = _frames(5, rng)
    bs = b"".join(api.EncodeFrame(*f) for f in fr)
    assert api.SetOption(ENCODER_OPTION.LTR_RECOVERY_REQUEST,
                         None) == cmResultSuccess
    bs += api.EncodeFrame(*fr[0])
    assert len(H264Decoder().decode_annexb(bs)) == 6
    # honesty: unimplemented option ids must NOT report success
    assert api.SetOption(ENCODER_OPTION.ENABLE_SSEI, 1) != cmResultSuccess
