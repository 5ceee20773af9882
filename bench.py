"""Benchmark: END-TO-END 720p encode throughput vs the reference
encoder measured live on the same host.

Protocol (BASELINE.md #3 adapted): synthesize a 720p clip by 4x
upsampling res/CiscoVT2people_320x192_12fps.yuv, then
  1. run the reference `h264enc` (no-asm build in .ref_build/src) on it
     single-layer IPPP CAVLC and record its fps (live baseline on THIS
     host — the historical 36.8 fps constant was a different machine);
  2. run our encoder end-to-end (jitted TPU core + vectorized CAVLC +
     native deblock/bitpack) on the same frames, excluding one warmup
     frame (compile), and record fps.
Prints ONE JSON line. vs_baseline = ours / live reference fps (falls
back to the stored REF_FPS_720P when the reference binary is absent).
"""

import json
import os
import re
import shutil
import subprocess
import sys
import tempfile
import time

import numpy as np

REF_FPS_720P_STORED = 36.8  # no-asm h264enc, round-1 build host
W, H = 1280, 720
N_FRAMES = 9


def synth_720p(path):
    src = open('/root/reference/res/CiscoVT2people_320x192_12fps.yuv',
               'rb').read()
    fsz = 320 * 192 * 3 // 2
    n = min(len(src) // fsz, N_FRAMES)
    with open(path, 'wb') as out:
        for i in range(n):
            f = src[i * fsz:(i + 1) * fsz]
            y = np.frombuffer(f[:320 * 192], np.uint8).reshape(192, 320)
            u = np.frombuffer(f[320 * 192:320 * 192 * 5 // 4],
                              np.uint8).reshape(96, 160)
            v = np.frombuffer(f[320 * 192 * 5 // 4:], np.uint8).reshape(96, 160)
            out.write(np.kron(y, np.ones((4, 4), np.uint8))[:H, :W].tobytes())
            out.write(np.kron(u, np.ones((4, 4), np.uint8))[:H // 2, :W // 2].tobytes())
            out.write(np.kron(v, np.ones((4, 4), np.uint8))[:H // 2, :W // 2].tobytes())
    return n


def ref_fps_live(yuv, nframes):
    enc = os.path.join(os.path.dirname(__file__), '.ref_build/src/h264enc')
    if not os.path.exists(enc):
        return None
    tmp = tempfile.mkdtemp()
    try:
        for cfg in ('welsenc.cfg', 'layer2.cfg'):
            shutil.copy(f'/root/reference/testbin/{cfg}', tmp)
        def patch(fn, subs):
            p = os.path.join(tmp, fn)
            s = open(p).read()
            for pat, rep in subs:
                s = re.sub(pat, rep, s, flags=re.M)
            open(p, 'w').write(s)
        patch('welsenc.cfg', [(r'^SourceWidth.*', 'SourceWidth 1280'),
                              (r'^SourceHeight.*', 'SourceHeight 720'),
                              (r'^TemporalLayerNum.*', 'TemporalLayerNum 1')])
        patch('layer2.cfg', [(r'^FrameWidth.*', 'FrameWidth 1280'),
                             (r'^FrameHeight.*', 'FrameHeight 720')])
        r = subprocess.run(
            [enc, 'welsenc.cfg', '-org', yuv, '-frms', str(nframes),
             '-bf', os.path.join(tmp, 'out.264')],
            cwd=tmp, capture_output=True, timeout=600, text=True)
        m = re.search(r'FPS:\s*([0-9.]+)', r.stderr + r.stdout)
        return float(m.group(1)) if m else None
    except Exception:
        return None
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _load_frames(yuv, nframes):
    fsz = W * H * 3 // 2
    raw = open(yuv, 'rb').read()
    frames = []
    for i in range(nframes):
        f = raw[i * fsz:(i + 1) * fsz]
        frames.append((
            np.frombuffer(f[:W * H], np.uint8).reshape(H, W),
            np.frombuffer(f[W * H:W * H * 5 // 4], np.uint8).reshape(H // 2, W // 2),
            np.frombuffer(f[W * H * 5 // 4:], np.uint8).reshape(H // 2, W // 2)))
    return frames


def _session_fps(frames, nframes, cfg_kwargs, tag):
    from openh264_tpu.encoder.encoder import EncoderConfig
    from openh264_tpu.encoder.session_device import DeviceSessionEncoder
    seq = [frames[0]] + [frames[i % nframes] for i in range(1, 33)]
    # warmup: one full fetch batch + remainder so every executable
    # (steps, flush stacks, upload slicing) compiles before timing
    warm = DeviceSessionEncoder(EncoderConfig(width=W, height=H, **cfg_kwargs))
    warm.encode_stream(iter(seq[:warm.fetch_batch + 1]))
    enc = DeviceSessionEncoder(EncoderConfig(width=W, height=H, **cfg_kwargs))
    enc._fetch_window = warm._fetch_window
    t0 = time.perf_counter()
    outs = enc.encode_stream(iter(seq))
    dt = time.perf_counter() - t0
    st = dict(enc.last_stats)
    st["total_s"] = round(dt, 3)
    st["bytes"] = sum(len(o) for o in outs)
    print(f"stage timers [{tag}]:", json.dumps(st), file=sys.stderr)
    return len(seq) / dt, b"".join(outs)


def our_fps(yuv, nframes):
    """Headline: constant-QP single-slice IPPP CAVLC e2e (incl. input
    upload from host numpy and Annex-B assembly on host). Returns
    (fps, annexb_stream)."""
    return _session_fps(_load_frames(yuv, nframes), nframes, dict(qp=26),
                        "constqp")


def our_fps_featured(yuv, nframes):
    """The full-feature config the VERDICT asked to keep fast: rate
    control + 4 slices/frame + 2 temporal layers on the device path."""
    return _session_fps(
        _load_frames(yuv, nframes), nframes,
        dict(qp=26, rc_mode=1, target_bitrate=6_000_000,
             max_frame_rate=30.0, num_slices=4, temporal_layers=2,
             enable_frame_skip=False), "rc4slice2tid")[0]


def our_decode_720p_fps(bs):
    """Decode the 33-frame 720p IPPP CAVLC stream the encode leg just
    produced (native parse + batched recon host path)."""
    from openh264_tpu.decoder import H264Decoder
    from openh264_tpu.decoder.nalbuf import split_complete
    warm, _tail = split_complete(bs[:len(bs) // 8])  # whole NALs only
    H264Decoder().decode_annexb(warm)                # warm compiles
    t0 = time.perf_counter()
    frames = H264Decoder().decode_annexb(bs)
    return len(frames) / (time.perf_counter() - t0)


def our_decode_fps():
    """BASELINE protocol #1 analog: decode a conformance CAVLC stream
    (the host parse + batched recon path)."""
    from openh264_tpu.decoder import H264Decoder
    bs = open('/root/reference/res/SVA_Base_B.264', 'rb').read()
    d = H264Decoder()
    d.decode_annexb(bs)          # warm compiles
    t0 = time.perf_counter()
    frames = H264Decoder().decode_annexb(bs)
    return len(frames) / (time.perf_counter() - t0)


def main():
    yuv = '/tmp/bench_in720.yuv'
    n = synth_720p(yuv)
    ref = ref_fps_live(yuv, n)
    if ref is None:
        ref = REF_FPS_720P_STORED
    ours, bs = our_fps(yuv, n)
    feat = our_fps_featured(yuv, n)
    dec = our_decode_fps()
    dec720 = our_decode_720p_fps(bs)
    print(json.dumps({
        "metric": "encode_720p_e2e_fps",
        "value": round(ours, 3),
        "unit": "frames/s/chip",
        "vs_baseline": round(ours / ref, 4),
        "extras": {
            "encode_720p_rc_4slice_2tid_fps": round(feat, 3),
            "decode_qcif_cavlc_fps": round(dec, 3),
            "decode_720p_cavlc_fps": round(dec720, 3),
            "ref_encode_fps_live": round(ref, 3),
        },
    }))


if __name__ == "__main__":
    main()
