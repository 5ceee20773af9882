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


def test_intra_in_p_roundtrip():
    """Scene-change content triggers I16x16 MBs inside P frames
    (svc_base_layer_md.cpp WelsMdIntraMb/WelsMdInterMb analog); the
    stream must round-trip bit-exactly through both our decoder and the
    reference decoder, and the vectorized CAVLC writer must match the
    scalar one byte-for-byte."""
    import subprocess
    import types
    from openh264_tpu.encoder.encoder import EncoderConfig, H264Encoder
    from openh264_tpu.decoder import H264Decoder

    rng = np.random.default_rng(7)
    W, H = 160, 96
    y0 = np.kron(rng.integers(80, 120, (H // 8, W // 8), np.uint8),
                 np.ones((8, 8), np.uint8))
    y1 = y0.copy()
    y1[:, W // 2:] = np.kron(
        rng.integers(150, 250, (H // 8, W // 16), np.uint8),
        np.ones((8, 8), np.uint8))
    u = np.full((H // 2, W // 2), 100, np.uint8)
    v = np.full((H // 2, W // 2), 140, np.uint8)

    enc = H264Encoder(EncoderConfig(width=W, height=H, qp=28))
    n_intra = []
    orig_vec = enc._write_p_slice
    orig_scalar = enc._write_p_slice_scalar

    def both(self, out, is_ref=True, reorder_abs_diff=None,
             mmco_ops=None, reorder_lt=None):
        a = orig_scalar(out, is_ref, reorder_abs_diff)
        b = orig_vec(out, is_ref, reorder_abs_diff,
                     mmco_ops=mmco_ops, reorder_lt=reorder_lt)
        assert a == b, "scalar vs vectorized CAVLC writer mismatch"
        n_intra.append(int(out["intra_mask"].sum()))
        return b

    enc._write_p_slice = types.MethodType(both, enc)
    bs = enc.encode_frame(y0, u, v) + enc.encode_frame(y1, u, v)
    assert n_intra and n_intra[0] > 0, "no intra MBs chosen in P frame"

    ours = H264Decoder().decode_annexb(bs)
    mine = b"".join(p.tobytes() for fr in ours for p in fr.planes())
    decbin = os.path.join(os.path.dirname(__file__), "..",
                          ".ref_build", "src", "h264dec")
    if os.path.exists(decbin):
        import tempfile
        with tempfile.NamedTemporaryFile(suffix=".264") as f, \
                tempfile.NamedTemporaryFile(suffix=".yuv") as g:
            f.write(bs)
            f.flush()
            subprocess.run([decbin, f.name, g.name], check=True,
                           capture_output=True)
            ref = open(g.name, "rb").read()
        assert mine == ref, "intra-in-P stream not bit-exact on h264dec"


def test_psnr_vs_welsenc():
    """Fixed-QP quality parity vs the reference encoder on
    CiscoVT2people (BASELINE protocol #2): PSNR within 0.5 dB and
    bitstream within 1.4x at QP 24/28/32."""
    import tempfile
    import shutil
    import re
    encb = os.path.join(os.path.dirname(__file__), "..",
                        ".ref_build", "src", "h264enc")
    decb = os.path.join(os.path.dirname(__file__), "..",
                        ".ref_build", "src", "h264dec")
    if not (os.path.exists(encb) and os.path.exists(decb)):
        pytest.skip("reference binaries not built")
    W, H, N = 160, 96, 5
    raw = open('/root/reference/res/CiscoVT2people_160x96_6fps.yuv',
               'rb').read()
    fsz = W * H * 3 // 2

    def psnr_y(a, b):
        d = a.astype(np.float64) - b.astype(np.float64)
        mse = (d * d).mean()
        return 99.0 if mse == 0 else 10 * np.log10(255 * 255 / mse)

    def luma_frames(buf):
        return [np.frombuffer(buf[i * fsz:(i + 1) * fsz][:W * H], np.uint8)
                for i in range(len(buf) // fsz)]

    src = luma_frames(raw[:N * fsz])
    for qp in (24, 28, 32):
        enc = H264Encoder(EncoderConfig(width=W, height=H, qp=qp))
        bs = bytearray()
        for i in range(N):
            f = raw[i * fsz:(i + 1) * fsz]
            y = np.frombuffer(f[:W * H], np.uint8).reshape(H, W)
            u = np.frombuffer(f[W * H:W * H * 5 // 4],
                              np.uint8).reshape(H // 2, W // 2)
            v = np.frombuffer(f[W * H * 5 // 4:],
                              np.uint8).reshape(H // 2, W // 2)
            bs += enc.encode_frame(y, u, v)
        tmp = tempfile.mkdtemp()
        try:
            ours264 = os.path.join(tmp, 'ours.264')
            open(ours264, 'wb').write(bytes(bs))
            subprocess.run([decb, ours264, os.path.join(tmp, 'ours.yuv')],
                           check=True, capture_output=True)
            dec = open(os.path.join(tmp, 'ours.yuv'), 'rb').read()
            ps = np.mean([psnr_y(a, b) for a, b in zip(luma_frames(dec), src)])
            for cfg in ('welsenc.cfg', 'layer2.cfg'):
                shutil.copy(f'/root/reference/testbin/{cfg}', tmp)

            def patch(fn, subs):
                pth = os.path.join(tmp, fn)
                s2 = open(pth).read()
                for pat, rep in subs:
                    s2 = re.sub(pat, rep, s2, flags=re.M)
                open(pth, 'w').write(s2)
            patch('welsenc.cfg', [
                (r'^SourceWidth.*', 'SourceWidth 160'),
                (r'^SourceHeight.*', 'SourceHeight 96'),
                (r'^TemporalLayerNum.*', 'TemporalLayerNum 1'),
                (r'^RCMode.*', 'RCMode -1'),
                (r'^EnableDenoise.*', 'EnableDenoise 0'),
                (r'^EnableBackgroundDetection.*',
                 'EnableBackgroundDetection 0'),
                (r'^EnableAdaptiveQuantization.*',
                 'EnableAdaptiveQuantization 0'),
                (r'^EnableSceneChangeDetect.*', 'EnableSceneChangeDetect 0')])
            patch('layer2.cfg', [(r'^FrameWidth.*', 'FrameWidth 160'),
                                 (r'^FrameHeight.*', 'FrameHeight 96'),
                                 (r'^InitialQP.*', f'InitialQP {qp}')])
            subprocess.run(
                [encb, 'welsenc.cfg', '-org',
                 '/root/reference/res/CiscoVT2people_160x96_6fps.yuv',
                 '-frms', str(N), '-bf', os.path.join(tmp, 'w.264')],
                cwd=tmp, check=True, capture_output=True)
            subprocess.run([decb, os.path.join(tmp, 'w.264'),
                            os.path.join(tmp, 'w.yuv')],
                           check=True, capture_output=True)
            wdec = open(os.path.join(tmp, 'w.yuv'), 'rb').read()
            wps = np.mean([psnr_y(a, b)
                           for a, b in zip(luma_frames(wdec), src)])
            wsize = os.path.getsize(os.path.join(tmp, 'w.264'))
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
        assert ps >= wps - 0.5, f"QP{qp}: {ps:.2f} vs welsenc {wps:.2f} dB"
        assert len(bs) <= wsize * 1.4, \
            f"QP{qp}: {len(bs)}B vs welsenc {wsize}B"


def test_rc_aq_bitrate_window():
    """Rate control with adaptive quant + GOM offsets holds the target
    within +-15% on the 320x192 clip (ratectl.cpp family; VERDICT r2
    item 7 acceptance) and per-MB QP actually varies in the stream."""
    W, H = 320, 192
    raw = open('/root/reference/res/CiscoVT2people_320x192_12fps.yuv',
               'rb').read()
    fsz = W * H * 3 // 2
    n = len(raw) // fsz
    target = 300_000
    enc = H264Encoder(EncoderConfig(
        width=W, height=H, qp=30, rc_mode=1, target_bitrate=target,
        max_frame_rate=12.0, enable_adaptive_quant=True,
        enable_gom_rc=True))
    qps_seen = set()
    bs = bytearray()
    for i in range(n):
        f = raw[i * fsz:(i + 1) * fsz]
        y = np.frombuffer(f[:W * H], np.uint8).reshape(H, W)
        u = np.frombuffer(f[W * H:W * H * 5 // 4],
                          np.uint8).reshape(H // 2, W // 2)
        v = np.frombuffer(f[W * H * 5 // 4:], np.uint8).reshape(H // 2, W // 2)
        bs += enc.encode_frame(y, u, v)
    rate = len(bs) * 8 / (n / 12.0)
    assert 0.8 * target <= rate <= 1.15 * target, f"{rate/target:.2f}x target"
    # decode and check the per-MB QP varies (AQ visible in the stream)
    frames = H264Decoder().decode_annexb(bytes(bs))
    assert len(frames) == n
    # re-parse per-MB qp via the decoder internals of the last P frame
    import openh264_tpu.decoder.decoder as D
    qp_sets = []
    orig = D.recon_frame
    def spy(fs, rp, c, device=False):
        qp_sets.append(set(int(q) for q in fs.qp))
        return orig(fs, rp, c, device=device)
    D.recon_frame = spy
    try:
        H264Decoder().decode_annexb(bytes(bs))
    finally:
        D.recon_frame = orig
    assert any(len(qs) > 1 for qs in qp_sets[1:]), \
        "adaptive quant produced no per-MB QP variation"


def test_sizelimited_slicing():
    """SM_SIZELIMITED (svc_encode_slice.cpp dynamic slicing): slices
    close around the byte constraint, the stream stays closed-loop and
    decodes bit-exact on the reference decoder when present."""
    import os
    import subprocess
    from openh264_tpu.encoder.encoder import EncoderConfig, H264Encoder
    from openh264_tpu.decoder import H264Decoder
    from openh264_tpu.bitstream import split_annexb
    yuv = '/root/reference/res/CiscoVT2people_160x96_6fps.yuv'
    W, H = 160, 96
    raw = open(yuv, 'rb').read()
    fsz = W * H * 3 // 2
    fr = []
    for i in range(3):
        f = raw[i * fsz:(i + 1) * fsz]
        fr.append((np.frombuffer(f[:W * H], np.uint8).reshape(H, W),
                   np.frombuffer(f[W * H:W * H * 5 // 4],
                                 np.uint8).reshape(H // 2, W // 2),
                   np.frombuffer(f[W * H * 5 // 4:],
                                 np.uint8).reshape(H // 2, W // 2)))
    enc = H264Encoder(EncoderConfig(width=W, height=H, qp=28,
                                    slice_size_constraint=600))
    bs = b"".join(enc.encode_frame(*f) for f in fr)
    sizes = [len(x.rbsp) for x in split_annexb(bs)
             if x.nal_unit_type in (1, 5)]
    assert len(sizes) > 3, "constraint should force multiple slices"
    # P slices overshoot by at most one MB; IDR bands by probe drift
    assert max(sizes) < 4 * 600, sizes
    ours = H264Decoder().decode_annexb(bs)
    assert len(ours) == 3
    assert np.array_equal(ours[-1].y, enc.dpb[-1].planes[0])
    dec = os.path.join(os.path.dirname(__file__), '..', '.ref_build',
                       'src', 'h264dec')
    if os.path.exists(dec):
        open('/tmp/_szl_t.264', 'wb').write(bs)
        subprocess.run([dec, '/tmp/_szl_t.264', '/tmp/_szl_t.yuv'],
                       capture_output=True, timeout=60)
        ref = open('/tmp/_szl_t.yuv', 'rb').read()
        got = b"".join(f.y.tobytes() + f.u.tobytes() + f.v.tobytes()
                       for f in ours)
        assert ref == got
