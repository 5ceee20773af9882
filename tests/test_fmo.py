"""FMO (slice groups): map construction + group-order decode.

No conformance stream in res/ actually uses num_slice_groups > 1 (the
"FM1" streams declare one group), so the end-to-end case constructs a
2-group type-0 stream (alternating MB rows) with the encoder's row-band
I core — each row band has no top availability, which is exactly the
slice-group availability of interleaved rows — and cross-checks our
decode against the reference h264dec when its build is present.
Map parity anchors: fmo.cpp FmoGenerateMbAllocMap* / FmoNextMb.
"""

import os
import subprocess
import types

import numpy as np
import pytest

from openh264_tpu.decoder.fmo import build_mb_to_slice_group, next_mb_lut


class _PPS:
    def __init__(self, num, t, m):
        self.num_slice_groups = num
        self.slice_group_map_type = t
        self.slice_group_map = m


class _SPS:
    def __init__(self, w, h):
        self.mb_width, self.mb_height = w, h


def test_map_type0_interleaved():
    g = build_mb_to_slice_group(
        _PPS(2, 0, {"run_length": [3, 3]}), _SPS(3, 4))
    assert g.tolist() == [0, 0, 0, 1, 1, 1, 0, 0, 0, 1, 1, 1]


def test_map_type1_dispersed():
    g = build_mb_to_slice_group(_PPS(2, 1, {}), _SPS(4, 2))
    # row 0: (x + 0) % 2 ; row 1: (x + 1) % 2
    assert g.tolist() == [0, 1, 0, 1, 1, 0, 1, 0]


def test_map_type2_foreground():
    g = build_mb_to_slice_group(
        _PPS(2, 2, {"top_left": [5], "bottom_right": [10]}), _SPS(4, 4))
    exp = np.ones(16, np.int32)
    exp[[5, 6, 9, 10]] = 0          # box (1,1)-(2,2)
    assert g.tolist() == exp.tolist()


def test_map_type4_raster():
    g = build_mb_to_slice_group(
        _PPS(2, 4, {"change_rate": 3, "change_direction": 0}),
        _SPS(4, 2), change_cycle=2)
    assert g.tolist() == [0, 0, 0, 0, 0, 0, 1, 1]


def test_map_type3_boxout_counts():
    p = _PPS(2, 3, {"change_rate": 4, "change_direction": 0})
    for cyc in range(0, 5):
        g = build_mb_to_slice_group(p, _SPS(4, 4), change_cycle=cyc)
        assert int((g == 0).sum()) == min(cyc * 4, 16)


def test_next_mb_lut():
    g = np.array([0, 1, 0, 1], np.int32)
    assert next_mb_lut(g).tolist() == [2, 3, 4, 4]


def _build_fmo_stream(y, u, v, qp):
    """2-group type-0 (alternating MB rows) IDR picture."""
    from openh264_tpu.bitstream import (BitWriter, make_annexb_nal,
                                        NAL_SPS, NAL_PPS, NAL_IDR)
    from openh264_tpu.encoder.headers import write_sps, write_slice_header
    from openh264_tpu.encoder.encoder import (EncoderConfig, H264Encoder,
                                              _NcTracker)
    from openh264_tpu.encoder import core_jax
    from openh264_tpu.tables import CHROMA_QP_TABLE
    H, W = y.shape
    cfg = EncoderConfig(width=W, height=H, qp=qp)
    enc = H264Encoder(cfg)
    mb_w, mb_h = cfg.mb_width, cfg.mb_height
    # PPS with num_slice_groups=2, map type 0, one MB row per run
    w = BitWriter()
    w.ue(0)                     # pps_id
    w.ue(0)                     # sps_id
    w.flag(False)               # entropy_coding_mode (CAVLC)
    w.flag(False)               # pic_order_present
    w.ue(1)                     # num_slice_groups_minus1
    w.ue(0)                     # slice_group_map_type 0
    w.ue(mb_w - 1)              # run_length_minus1 group 0
    w.ue(mb_w - 1)              # run_length_minus1 group 1
    w.ue(0)                     # num_ref_idx_l0_active_minus1
    w.ue(0)
    w.flag(False)               # weighted_pred
    w.u(2, 0)
    w.se(cfg.pic_init_qp - 26)
    w.se(0)
    w.se(0)                     # chroma_qp_offset
    w.flag(True)                # deblocking_filter_control_present
    w.flag(False)
    w.flag(False)
    w.rbsp_trailing_bits()
    pps = w.get_bytes()
    bs = (make_annexb_nal(3, NAL_SPS, write_sps(cfg)) +
          make_annexb_nal(3, NAL_PPS, pps))
    # encode each MB row as an independent band (no top availability ==
    # interleaved slice-group availability)
    rows = []
    for r in range(mb_h):
        out = core_jax.encode_i_frame(
            y[r * 16:(r + 1) * 16], u[r * 8:(r + 1) * 8],
            v[r * 8:(r + 1) * 8], qp,
            int(CHROMA_QP_TABLE[qp]), mb_w=mb_w, mb_h=1)
        rows.append({k: np.asarray(a) for k, a in out.items()})
    for grp in (0, 1):
        w = BitWriter()
        write_slice_header(w, cfg, 2, 0, grp * mb_w, qp, True, 0,
                           disable_deblock=1)
        for r in range(grp, mb_h, 2):
            nc = _NcTracker(mb_w, 1)
            for i in range(mb_w):
                enc._write_i16_mb(w, rows[r], i, nc, p_slice=False)
        w.rbsp_trailing_bits()
        bs += make_annexb_nal(3, NAL_IDR, w.get_bytes())
    # expected recon = per-row band recons stacked
    ry = np.concatenate([r["recon_y"] for r in rows], 0)
    ru = np.concatenate([r["recon_u"] for r in rows], 0)
    rv = np.concatenate([r["recon_v"] for r in rows], 0)
    return bs, (ry, ru, rv)


def test_fmo_decode_end_to_end(rng):
    from openh264_tpu.decoder import H264Decoder
    W, H = 64, 64
    y = rng.integers(0, 256, (H, W), np.uint8)
    u = rng.integers(0, 256, (H // 2, W // 2), np.uint8)
    v = rng.integers(0, 256, (H // 2, W // 2), np.uint8)
    bs, (ry, ru, rv) = _build_fmo_stream(y, u, v, 28)
    frames = H264Decoder().decode_annexb(bs)
    assert len(frames) == 1
    assert np.array_equal(frames[0].y, ry)
    assert np.array_equal(frames[0].u, ru)
    assert np.array_equal(frames[0].v, rv)
    # cross-check with the reference decoder when available
    dec = os.path.join(os.path.dirname(__file__), "..",
                       ".ref_build", "src", "h264dec")
    if os.path.exists(dec):
        open("/tmp/fmo_t.264", "wb").write(bs)
        subprocess.run([dec, "/tmp/fmo_t.264", "/tmp/fmo_ref.yuv"],
                       capture_output=True, timeout=60)
        ref = open("/tmp/fmo_ref.yuv", "rb").read()
        ours = (frames[0].y.tobytes() + frames[0].u.tobytes()
                + frames[0].v.tobytes())
        assert ref == ours, "h264dec disagrees on the FMO stream"
