"""H.264 encoder session: TPU core + host entropy assembly.

Flow per frame (SURVEY.md §7 "two-phase entropy"): the jitted JAX core
(core_jax) produces per-MB symbol tensors + recon on device; the host
walks MBs once to emit CAVLC bits (reusing the decoder's MV-prediction
machinery so MVP/skip semantics are exact by construction).

v1 toolset: IPPP GOP, single slice, CAVLC, constant QP, I16x16 intra,
P16x16 inter + P_Skip, deblocking off. (RC, multi-slice, CABAC, finer
partitions land in later milestones — see encoder/README in docs.)
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..bitstream import BitWriter, make_annexb_nal, NAL_SPS, NAL_PPS, NAL_IDR, NAL_SLICE
from ..decoder.framedata import (FrameSymbols, MB_I16x16, MB_P16x16, MB_PSKIP)
from ..decoder.mvpred import MvContext, ensure_motion_grids
from ..oracle.deblock import deblock_frame
from ..tables import CHROMA_QP_TABLE, ZIGZAG_4x4
from ..tables.cavlc import CBP_INTER_INV
from .cabac_enc import CabacSliceWriter
from .cavlc_enc import write_residual_block
from .headers import write_pps, write_slice_header, write_sps
from .ratectl import RateControl


@dataclass
class EncoderConfig:
    width: int = 0
    height: int = 0
    qp: int = 26
    idr_interval: int = 0        # 0 = only first frame is IDR
    profile_idc: int = 66
    level_idc: int = 31
    log2_max_frame_num: int = 8
    num_ref_frames: int = 1
    entropy_cabac: bool = False
    pic_init_qp: int = 26
    chroma_qp_offset: int = 0
    search_range: int = 8
    enable_intra_in_p: bool = True
    # EUsageType: 0 camera, 1 screen content (codec_app_def.h:286).
    # Screen sessions run scroll detection and feed the global scroll
    # vector to the P core as an extra whole-MB candidate
    # (svc_mode_decision.cpp JudgeScrollSkip intent)
    usage_type: int = 0
    # per-MB I16x16-vs-I4x4 mode decision on I frames (native C
    # sequential wavefront, enc_intra.c; CAVLC single-slice host path)
    enable_i4x4: bool = False
    # write VUI parameters into the SPS (timing + bitstream
    # restriction; au_set.cpp:197 WelsWriteVUI)
    enable_vui: bool = False
    num_slices: int = 1  # SM_FIXEDSLCNUM analog: N slices/frame
    # SM_SIZELIMITED analog (codec_app_def.h:342): when > 0, each slice
    # closes once its payload reaches this many bytes (dynamic,
    # data-dependent slicing — host scalar writer path)
    slice_size_constraint: int = 0
    enable_adaptive_quant: bool = False   # VAA-driven per-MB delta QP
    enable_scene_change_detect: bool = False  # SCD -> IDR decision
    enable_gom_rc: bool = False           # per-MB-row (GOM) QP offsets
    use_jax: bool = True
    # rate control (codec_app_def.h RC_MODES; -1 = off / constant QP)
    rc_mode: int = -1
    target_bitrate: int = 5_000_000   # bits/s
    max_bitrate: int = 0              # iMaxBitrate 1s-window cap (0 = off)
    max_frame_rate: float = 30.0
    max_qp: int = 51
    min_qp: int = 0
    enable_frame_skip: bool = True
    # in-loop filter (0 on, 1 off, 2 on-except-slice-boundaries)
    deblock_idc: int = 0
    # dyadic temporal scalability (1..4 layers, param_svc.h:498)
    temporal_layers: int = 1
    # long-term reference (SLTRConfig, codec_app_def.h:556): periodic
    # MMCO marking + loss recovery re-anchoring (ref_list_mgr_svc.cpp)
    enable_ltr: bool = False
    ltr_ref_num: int = 1
    ltr_mark_period: int = 30
    # parameter-set ids (simulcast layers use distinct ids; the
    # reference's CONSTANT_ID strategy analog, paraset_strategy.cpp)
    sps_id: int = 0
    pps_id: int = 0
    # keep the user's cfg.qp as the RC starting point instead of the
    # bpp-derived RcInitialQp pick
    rc_honor_init_qp: bool = False

    @property
    def mb_width(self):
        return (self.width + 15) // 16

    @property
    def mb_height(self):
        return (self.height + 15) // 16


@dataclass
class _RefEntry:
    """Encoder-side DPB record (mirrors SPicture essentials)."""
    frame_num: int
    coding_idx: int
    temporal_id: int
    planes: tuple  # (y, u, v) deblocked recon, padded to MB grid
    # early-skip state (pMbSkipSad analog, WelsMdPSkipEnc): per-MB skip
    # flags + skip-prediction SAD of this picture when it was coded
    skip_map: object = None
    skip_sad: object = None
    # long-term reference state (WelsMarkPic, ref_list_mgr_svc.h:75)
    is_ltr: bool = False
    ltr_idx: int = -1


@dataclass
class _Planes:
    y: np.ndarray
    u: np.ndarray
    v: np.ndarray


class _NcTracker:
    """nzc bookkeeping for CAVLC nC contexts (single slice)."""

    def __init__(self, mb_w, mb_h):
        self.mb_w, self.mb_h = mb_w, mb_h
        self.nzc_l = np.full((mb_h * 4, mb_w * 4), -1, np.int32)
        self.nzc_c = np.full((2, mb_h * 2, mb_w * 2), -1, np.int32)

    def nc_luma(self, gx, gy):
        na = self.nzc_l[gy, gx - 1] if gx > 0 else -1
        nb = self.nzc_l[gy - 1, gx] if gy > 0 else -1
        return self._comb(na, nb)

    def nc_chroma(self, comp, cx, cy):
        na = self.nzc_c[comp, cy, cx - 1] if cx > 0 else -1
        nb = self.nzc_c[comp, cy - 1, cx] if cy > 0 else -1
        return self._comb(na, nb)

    @staticmethod
    def _comb(na, nb):
        if na >= 0 and nb >= 0:
            return (na + nb + 1) >> 1
        if na >= 0:
            return int(na)
        if nb >= 0:
            return int(nb)
        return 0


class H264Encoder:
    def __init__(self, cfg: EncoderConfig):
        self.cfg = cfg
        if cfg.entropy_cabac and cfg.profile_idc == 66:
            # CABAC is prohibited in Baseline (Annex A.2.1); auto-bump to
            # Main like the reference (encoder_ext.cpp:655-662).
            cfg.profile_idc = 77
        if cfg.slice_size_constraint > 0 and cfg.entropy_cabac:
            raise ValueError("SM_SIZELIMITED slicing is CAVLC-only here")
        if cfg.slice_size_constraint > 0 and cfg.num_slices > 1:
            raise ValueError("slice_size_constraint and num_slices are "
                             "mutually exclusive slice modes")
        if cfg.temporal_layers > 1:
            # DPB depth so each dyadic layer's anchor survives until the
            # next lower-layer frame arrives (see SURVEY §5.7)
            cfg.num_ref_frames = max(cfg.num_ref_frames,
                                     1 << max(0, cfg.temporal_layers - 2))
        self.frame_num = 0           # next frame_num to write
        self.idr_pic_id = 0
        self.dpb: list[_RefEntry] = []
        self.frame_count = 0         # input frames seen
        self.coding_idx = 0          # coded frames since last IDR (GOP pos)
        self.qp = cfg.qp
        self.qp_c = int(CHROMA_QP_TABLE[np.clip(self.qp + cfg.chroma_qp_offset, 0, 51)])
        self._force_idr = False
        # LTR state (ref_list_mgr_svc.cpp marking/recovery protocol)
        self._ltr_capacity_added = 0
        self._ltr_next_idx = 0
        self._ltr_acked: set[int] = set()   # acked (idx) via feedback
        self._ltr_pending: dict[int, int] = {}  # ltr_idx -> frame_num
        self._need_ltr_recovery = False
        self.setup_ltr()
        self.reconfigure_rc()

    # ------------------------------------------------------------------
    # Long-term reference protocol (codec_app_def.h:239-263,
    # ref_list_mgr_svc.cpp WelsMarkPic / recovery strategies)
    def setup_ltr(self):
        """Reserve DPB capacity for the LTR slots (the SPS
        max_num_ref_frames covers short-term + long-term)."""
        cfg = self.cfg
        if cfg.enable_ltr:
            want = max(1, cfg.ltr_ref_num)
            cfg.num_ref_frames += want - self._ltr_capacity_added
            self._ltr_capacity_added = want
            if self.frame_count > 0:
                # mid-stream enable changes the SPS DPB size: start a
                # fresh coded video sequence so the decoder re-sizes
                self._force_idr = True

    @property
    def _st_capacity(self) -> int:
        """Sliding-window budget for short-term refs."""
        return max(1, self.cfg.num_ref_frames - self._ltr_capacity_added)

    def ltr_recovery_request(self, req=None) -> None:
        """SLTRRecoverRequest: the receiver lost the prediction chain;
        the next P frame re-anchors on an LTR (acked if any feedback
        arrived, else the newest marked LTR). If no LTR exists, the
        next frame is forced IDR — same last resort as the reference."""
        if not self.cfg.enable_ltr or not any(e.is_ltr for e in self.dpb):
            self._force_idr = True
            return
        self._need_ltr_recovery = True

    def ltr_marking_feedback(self, fb) -> None:
        """SLTRMarkingFeedback: receiver confirms (or denies) that the
        frame we marked arrived. fb may be the struct (uiFeedbackType,
        iLTRFrameNum) or a plain frame_num int."""
        ok = True
        frame_num = fb
        if hasattr(fb, "uiFeedbackType"):
            ok = int(fb.uiFeedbackType) != 2   # 2 = LTR_MARKING_FAILED
            frame_num = int(fb.iLTRFrameNum)
        elif isinstance(fb, dict):
            ok = int(fb.get("uiFeedbackType", 1)) != 2
            frame_num = int(fb.get("iLTRFrameNum", -1))
        for idx, fn in list(self._ltr_pending.items()):
            if fn == int(frame_num):
                del self._ltr_pending[idx]
                if ok:
                    self._ltr_acked.add(idx)
                else:
                    self._ltr_acked.discard(idx)

    def _ltr_mark_ops(self, tid: int, is_ref: bool):
        """MMCO ops marking the CURRENT frame as the next LTR slot
        (op 4 caps max_long_term_frame_idx, op 6 marks current)."""
        cfg = self.cfg
        if not (cfg.enable_ltr and is_ref and tid == 0
                and cfg.ltr_mark_period > 0
                and self.coding_idx > 0
                and self.coding_idx % cfg.ltr_mark_period == 0):
            return None, -1
        idx = self._ltr_next_idx
        self._ltr_next_idx = (idx + 1) % max(1, cfg.ltr_ref_num)
        return [(4, max(1, cfg.ltr_ref_num)), (6, idx)], idx

    def _pick_ltr_recovery_ref(self) -> _RefEntry:
        ltrs = [e for e in self.dpb if e.is_ltr]
        acked = [e for e in ltrs if e.ltr_idx in self._ltr_acked]
        pool = acked or ltrs
        return max(pool, key=lambda e: e.coding_idx)

    def reconfigure_rc(self):
        cfg = self.cfg
        self.rc = RateControl(cfg.rc_mode, cfg.target_bitrate,
                              cfg.max_frame_rate, self.qp,
                              cfg.min_qp, cfg.max_qp, cfg.enable_frame_skip,
                              n_pixels=cfg.width * cfg.height,
                              honor_init_qp=cfg.rc_honor_init_qp,
                              max_bitrate=cfg.max_bitrate)

    def force_idr(self):
        self._force_idr = True

    # ------------------------------------------------------------------
    def headers_annexb(self) -> bytes:
        return (make_annexb_nal(3, NAL_SPS, write_sps(self.cfg)) +
                make_annexb_nal(3, NAL_PPS, write_pps(self.cfg)))

    def _temporal_id(self) -> int:
        t = self.cfg.temporal_layers
        if t <= 1:
            return 0
        gop = 1 << (t - 1)
        i = self.coding_idx % gop
        if i == 0:
            return 0
        return t - 1 - (i & -i).bit_length() + 1

    def _pick_ref(self, tid: int) -> _RefEntry:
        """Dyadic reference: newest DPB entry of a strictly lower layer
        (layer 0 chains to the previous layer-0 frame)."""
        cands = [e for e in self.dpb if e.temporal_id < max(1, tid)]
        return max(cands, key=lambda e: e.coding_idx)

    def encode_frame(self, y: np.ndarray, u: np.ndarray, v: np.ndarray) -> bytes:
        """Encode one frame; returns Annex-B bytes (headers on IDR,
        b"" when rate control skips the frame)."""
        cfg = self.cfg
        from .core_np import pad_to_mb
        is_idr = self.frame_count == 0 or self._force_idr or (
            cfg.idr_interval > 0 and self.frame_count % cfg.idr_interval == 0)
        if (not is_idr and cfg.enable_scene_change_detect
                and getattr(self, "_prev_input", None) is not None):
            from ..processing.scenechange import detect_scene_change
            from .core_np import pad_to_mb as _p2m
            if bool(detect_scene_change(_p2m(y), self._prev_input)):
                is_idr = True
        from .core_np import pad_to_mb as _p2m2
        self._scroll_prev = getattr(self, "_prev_input", None)
        self._prev_input = _p2m2(y)
        self.frame_count += 1
        if not is_idr and self.rc.should_skip():
            self.rc.skipped()
            return b""
        self._force_idr = False

        yp = pad_to_mb(y)
        up = pad_to_mb(u, 8)
        vp = pad_to_mb(v, 8)
        tid = 0 if is_idr else self._temporal_id()
        self.qp = self.rc.frame_qp(is_idr, tid)
        self.qp_c = int(CHROMA_QP_TABLE[np.clip(
            self.qp + cfg.chroma_qp_offset, 0, 51)])
        is_ref = is_idr or cfg.temporal_layers <= 1 or \
            tid < cfg.temporal_layers - 1

        if cfg.slice_size_constraint > 0:
            return self._encode_frame_sizelimited(yp, up, vp, is_idr, tid,
                                                  is_ref)
        if cfg.num_slices > 1:
            return self._encode_frame_multislice(yp, up, vp, is_idr, tid,
                                                 is_ref)
        is_ltr, ltr_idx = False, -1
        if is_idr:
            self.frame_num = 0
            self.coding_idx = 0
            self.dpb.clear()
            self._ltr_pending.clear()
            self._ltr_acked.clear()
            self._need_ltr_recovery = False
            out, rbsp = self._encode_i(yp, up, vp)
            nal = make_annexb_nal(3, NAL_IDR, rbsp)
            prefix = self.headers_annexb()
            self.idr_pic_id = (self.idr_pic_id + 1) % 16
            fs = self._frame_symbols_i(out)
            if cfg.enable_ltr:
                # long_term_reference_flag marks the IDR as LTR idx 0
                is_ltr, ltr_idx = True, 0
                self._ltr_next_idx = 1 % max(1, cfg.ltr_ref_num)
        else:
            mmco_ops, ltr_idx = self._ltr_mark_ops(tid, is_ref)
            is_ltr = mmco_ops is not None
            if self._need_ltr_recovery:
                ref = self._pick_ltr_recovery_ref()
                self._need_ltr_recovery = False
            else:
                ref = self._pick_ref(tid)
            out, rbsp = self._encode_p(yp, up, vp, ref, is_ref,
                                       mmco_ops=mmco_ops)
            nal = make_annexb_nal(2 if is_ref else 0, NAL_SLICE, rbsp)
            prefix = b""
            fs = self._frame_symbols_p(out)

        recon = _Planes(np.array(out["recon_y"]), np.array(out["recon_u"]),
                        np.array(out["recon_v"]))
        if cfg.deblock_idc != 1:
            deblock_frame(recon, fs)
        if is_ref:
            if is_ltr:
                # marking replaces any existing LTR with the same index
                # (MMCO 6 semantics)
                self.dpb = [e for e in self.dpb
                            if not (e.is_ltr and e.ltr_idx == ltr_idx)]
                self._ltr_pending[ltr_idx] = self.frame_num
            self.dpb.append(_RefEntry(
                self.frame_num, self.coding_idx, tid,
                (recon.y, recon.u, recon.v),
                skip_map=out.get("skip_mask"),
                skip_sad=out.get("skip_sad"),
                is_ltr=is_ltr, ltr_idx=ltr_idx))
            self._slide_window()
            self.frame_num = (self.frame_num + 1) % (1 << cfg.log2_max_frame_num)
        self.coding_idx += 1
        bs = prefix + nal
        self.rc.update(8 * len(bs), self.qp, is_idr)
        return bs

    # ------------------------------------------------------------------
    def _band_rows(self):
        """MB-row ranges of the frame's slices (SM_FIXEDSLCNUM split:
        as even as possible, like AssignMbMapMultipleSlices,
        svc_enc_slice_segment.cpp:70 for row-aligned maps)."""
        cfg = self.cfg
        n = min(cfg.num_slices, cfg.mb_height)
        base = cfg.mb_height // n
        extra = cfg.mb_height % n
        rows = []
        r0 = 0
        for sidx in range(n):
            r1 = r0 + base + (1 if sidx < extra else 0)
            rows.append((r0, r1))
            r0 = r1
        return rows

    def _encode_frame_multislice(self, yp, up, vp, is_idr, tid, is_ref):
        """N-slices-per-frame encode: each horizontal MB-row band is an
        independent H.264 slice (own NAL, own entropy state); inter
        prediction still reaches the whole reference frame (row_off
        band mode of the core). Mirrors the reference's
        SM_FIXEDSLCNUM_SLICE output structure
        (slice_multi_threading.cpp AppendSliceToFrameBs:429)."""
        cfg = self.cfg
        from . import core_jax
        bands = self._band_rows()
        nals = []
        outs = []
        if is_idr:
            self.frame_num = 0
            self.coding_idx = 0
            self.dpb.clear()
            prefix = self.headers_annexb()
            self.idr_pic_id = (self.idr_pic_id + 1) % 16
        else:
            prefix = b""
            ref = self._pick_ref(tid)
            reorder, _reorder_lt = self._reorder_for(ref)
            ry, ru, rv = ref.planes
        for (r0, r1) in bands:
            bh = r1 - r0
            yb = yp[r0 * 16:r1 * 16]
            ub = up[r0 * 8:r1 * 8]
            vb = vp[r0 * 8:r1 * 8]
            if is_idr:
                out = core_jax.encode_i_frame(yb, ub, vb, self.qp, self.qp_c,
                                              mb_w=cfg.mb_width, mb_h=bh)
                out = {k: np.asarray(a) for k, a in out.items()}
                rbsp = self._write_i_slice(out, mb_h=bh,
                                           first_mb=r0 * cfg.mb_width)
                nals.append(make_annexb_nal(3, NAL_IDR, rbsp))
            else:
                out = core_jax.encode_p_frame(
                    yb, ub, vb, ry, ru, rv, self.qp, self.qp_c,
                    mb_w=cfg.mb_width, mb_h=bh, sr=cfg.search_range,
                    row_off=r0 * 16)
                out = {k: np.asarray(a) for k, a in out.items()}
                out["intra_mask"] = np.zeros(cfg.mb_width * bh, bool)
                rbsp = self._write_p_slice(out, is_ref, reorder, mb_h=bh,
                                           first_mb=r0 * cfg.mb_width)
                nals.append(make_annexb_nal(2 if is_ref else 0, NAL_SLICE,
                                            rbsp))
            outs.append(out)
        # merge per-band symbols for deblock + recon
        per_mb = [k for k in outs[0]
                  if k not in ("recon_y", "recon_u", "recon_v")]
        out_m = {k: np.concatenate([o[k] for o in outs]) for k in per_mb}
        out_m["recon_y"] = np.concatenate([o["recon_y"] for o in outs])
        out_m["recon_u"] = np.concatenate([o["recon_u"] for o in outs])
        out_m["recon_v"] = np.concatenate([o["recon_v"] for o in outs])
        fs = (self._frame_symbols_i(out_m) if is_idr
              else self._frame_symbols_p(out_m))
        for sidx, (r0, r1) in enumerate(bands):
            fs.slice_id[r0 * cfg.mb_width:r1 * cfg.mb_width] = sidx
        recon = _Planes(out_m["recon_y"], out_m["recon_u"],
                        out_m["recon_v"])
        if cfg.deblock_idc != 1:
            deblock_frame(recon, fs)
        if is_ref:
            # multi-slice frames are never MMCO-marked, but an IDR with
            # LTR enabled is implicitly LTR idx 0 (long_term_ref_flag)
            self.dpb.append(_RefEntry(self.frame_num, self.coding_idx, tid,
                                      (recon.y, recon.u, recon.v),
                                      is_ltr=is_idr and cfg.enable_ltr,
                                      ltr_idx=0 if cfg.enable_ltr else -1))
            self._slide_window()
            self.frame_num = (self.frame_num + 1) % (1 << cfg.log2_max_frame_num)
        self.coding_idx += 1
        bs = prefix + b"".join(nals)
        self.rc.update(8 * len(bs), self.qp, is_idr)
        return bs

    # ------------------------------------------------------------------
    def _encode_frame_sizelimited(self, yp, up, vp, is_idr, tid, is_ref):
        """SM_SIZELIMITED dynamic slicing (WelsCodeOnePicPartition,
        encoder_ext.cpp:4534): a slice closes as soon as its written
        payload reaches cfg.slice_size_constraint bytes. Deviation from
        the reference, kept deliberate: the boundary check runs AFTER a
        macroblock is written (bounded one-MB overshoot) instead of the
        step-back re-encode of DynSlcJudgeSliceBoundaryStepBack:1741.
        Intra-in-P is disabled (slice boundaries are data-dependent, so
        intra availability cannot be pre-baked into the batched core)."""
        cfg = self.cfg
        from . import core_jax
        from ..decoder.framedata import ZSCAN_TO_RASTER
        from ..tables.cavlc import CBP_INTER_INV
        mb_w, mb_h = cfg.mb_width, cfg.mb_height
        n_mb = mb_w * mb_h
        limit_bits = cfg.slice_size_constraint * 8
        reorder = reorder_lt = None
        idr_bands = None
        if is_idr:
            self.frame_num = 0
            self.coding_idx = 0
            self.dpb.clear()
            # Intra availability must equal the decoder's slice-local
            # view, but the boundaries are data-dependent. Two passes:
            # a probe pass over a frame-wide core finds row-aligned
            # boundaries by size, then each slice re-encodes as its own
            # band (top of a band unavailable == slice boundary) so
            # symbols, recon and decode agree exactly. Slice sizes may
            # drift slightly from the probe (same trade the reference
            # makes in the other direction with its re-encode loop).
            probe = core_jax.encode_i_frame(yp, up, vp, self.qp,
                                            self.qp_c, mb_w=mb_w,
                                            mb_h=mb_h)
            probe = {k: np.asarray(v) for k, v in probe.items()}
            idr_bands = []
            r0 = 0
            w = BitWriter()
            nc = _NcTracker(mb_w, mb_h)
            for r in range(mb_h):
                for i in range(mb_w):
                    self._write_i16_mb(w, probe, r * mb_w + i, nc,
                                       p_slice=False)
                if w.bit_length() >= limit_bits and r + 1 < mb_h:
                    idr_bands.append((r0, r + 1))
                    r0 = r + 1
                    w = BitWriter()
                    nc = _NcTracker(mb_w, mb_h)
            idr_bands.append((r0, mb_h))
            outs = []
            for (r0, r1) in idr_bands:
                o = core_jax.encode_i_frame(
                    yp[r0 * 16:r1 * 16], up[r0 * 8:r1 * 8],
                    vp[r0 * 8:r1 * 8], self.qp, self.qp_c,
                    mb_w=mb_w, mb_h=r1 - r0)
                outs.append({k: np.asarray(a) for k, a in o.items()})
            out = {k: np.concatenate([o[k] for o in outs])
                   for k in outs[0]}
            prefix = self.headers_annexb()
        else:
            ref = self._pick_ref(tid)
            reorder, reorder_lt = self._reorder_for(ref)
            ry, ru, rv = ref.planes
            out = core_jax.encode_p_frame(
                yp, up, vp, ry, ru, rv, self.qp, self.qp_c,
                mb_w=mb_w, mb_h=mb_h, sr=cfg.search_range)
            prefix = b""
        out = {k: np.asarray(v) for k, v in out.items()}
        if not is_idr:
            out["intra_mask"] = np.zeros(n_mb, bool)

        idr_cuts = (set(r1 * mb_w for _r0, r1 in idr_bands[:-1])
                    if idr_bands else set())
        wfs = FrameSymbols(mb_w, mb_h)
        wfs.slice_id[:] = -1
        nals = []
        mb = 0
        sidx = 0
        while mb < n_mb:
            w = BitWriter()
            write_slice_header(
                w, cfg, 2 if is_idr else 0, self.frame_num, mb, self.qp,
                is_idr, self.idr_pic_id, disable_deblock=cfg.deblock_idc,
                is_ref=is_ref, reorder_abs_diff=reorder,
                reorder_long_term=reorder_lt)
            nc = _NcTracker(mb_w, mb_h)   # fresh: prior slices unavailable
            mvc = MvContext(wfs, sidx)
            skip_run = 0
            while mb < n_mb:
                wfs.slice_id[mb] = sidx
                mbx, mby = mb % mb_w, mb // mb_w
                gx, gy = mbx * 4, mby * 4
                if is_idr:
                    self._write_i16_mb(w, out, mb, nc, p_slice=False)
                else:
                    wfs.gwritten[gy:gy + 4, gx:gx + 4] = False
                    mv = out["mv"][mb].astype(np.int32)
                    luma_ac = out["luma_ac"][mb]
                    cbp_luma = 0
                    for b8 in range(4):
                        blocks = [(b8 // 2) * 8 + (b8 % 2) * 2
                                  + (i // 2) * 4 + (i % 2) for i in range(4)]
                        if luma_ac[blocks].any():
                            cbp_luma |= 1 << b8
                    cac = out["chroma_ac"][mb]
                    cdc = out["chroma_dc"][mb]
                    cbp_chroma = 2 if cac.any() else (1 if cdc.any() else 0)
                    cbp = cbp_luma | (cbp_chroma << 4)
                    skip_mv = mvc.pred_skip_mv(gx, gy, mb)
                    if cbp == 0 and mv[0] == skip_mv[0] and \
                            mv[1] == skip_mv[1]:
                        skip_run += 1
                        mvc.set_partition(gx, gy, 4, 4, 0, 0, mv)
                        nc.nzc_l[gy:gy + 4, gx:gx + 4] = 0
                        nc.nzc_c[:, mby * 2:mby * 2 + 2,
                                 mbx * 2:mbx * 2 + 2] = 0
                        mb += 1
                        continue
                    w.ue(skip_run)
                    skip_run = 0
                    w.ue(0)                     # P_L0_16x16
                    mvp = mvc.pred_mv(gx, gy, 4, 4, 0, 0, mb)
                    w.se(int(mv[0] - mvp[0]))
                    w.se(int(mv[1] - mvp[1]))
                    mvc.set_partition(gx, gy, 4, 4, 0, 0, mv)
                    w.ue(int(CBP_INTER_INV[cbp]))
                    if cbp:
                        w.se(0)                 # mb_qp_delta
                    for k in range(16):
                        r = int(ZSCAN_TO_RASTER[k])
                        bx, by = r % 4, r // 4
                        b8 = (by >> 1) * 2 + (bx >> 1)
                        if cbp_luma & (1 << b8):
                            tc = write_residual_block(
                                w, luma_ac[r][ZIGZAG_4x4],
                                nc.nc_luma(gx + bx, gy + by), 16)
                        else:
                            tc = 0
                        nc.nzc_l[gy + by, gx + bx] = tc
                    self._write_chroma_residual(w, out, mb, nc, cbp_chroma)
                mb += 1
                if is_idr:
                    if mb in idr_cuts:
                        break
                elif w.bit_length() >= limit_bits and mb < n_mb:
                    break
            if not is_idr and skip_run:
                w.ue(skip_run)
            w.rbsp_trailing_bits()
            nals.append(make_annexb_nal(
                3 if is_idr else (2 if is_ref else 0),
                NAL_IDR if is_idr else NAL_SLICE, w.get_bytes()))
            sidx += 1
        if is_idr:
            self.idr_pic_id = (self.idr_pic_id + 1) % 16

        fs = (self._frame_symbols_i(out) if is_idr
              else self._frame_symbols_p(out))
        fs.slice_id[:] = wfs.slice_id
        recon = _Planes(np.array(out["recon_y"]), np.array(out["recon_u"]),
                        np.array(out["recon_v"]))
        if cfg.deblock_idc != 1:
            deblock_frame(recon, fs)
        if is_ref:
            self.dpb.append(_RefEntry(self.frame_num, self.coding_idx, tid,
                                      (recon.y, recon.u, recon.v)))
            self._slide_window()
            self.frame_num = (self.frame_num + 1) % \
                (1 << cfg.log2_max_frame_num)
        self.coding_idx += 1
        bs = prefix + b"".join(nals)
        self.rc.update(8 * len(bs), self.qp, is_idr)
        return bs

    def _frame_symbols_i(self, out) -> FrameSymbols:
        from ..decoder.framedata import MB_I4x4
        cfg = self.cfg
        fs = FrameSymbols(cfg.mb_width, cfg.mb_height)
        fs.mb_type[:] = MB_I16x16
        kind = out.get("kind")
        if kind is not None:
            fs.mb_type[np.asarray(kind) == 0] = MB_I4x4
        fs.slice_id[:] = 0
        fs.qp[:] = self.qp
        fs.disable_deblock[:] = 0 if cfg.deblock_idc != 1 else 1
        return fs

    def _frame_symbols_p(self, out) -> FrameSymbols:
        cfg = self.cfg
        fs = FrameSymbols(cfg.mb_width, cfg.mb_height)
        n = fs.n_mb
        nz = out["luma_ac"].reshape(n, 16, 16) != 0
        # P16x16 vs PSKIP is irrelevant for bS (both inter, same mv/nzc)
        fs.mb_type[:] = MB_P16x16
        fs.slice_id[:] = 0
        mb_qp = out.get("mb_qp")
        if mb_qp is None:
            fs.qp[:] = self.qp
        else:
            # decoder-visible qp: mb_qp_delta is only signaled on MBs
            # with coded residual; others keep the running value
            nzmb = (out["luma_ac"].reshape(n, -1) != 0).any(1) | \
                   (out["chroma_dc"].reshape(n, -1) != 0).any(1) | \
                   (out["chroma_ac"].reshape(n, -1) != 0).any(1)
            lastr = np.maximum.accumulate(
                np.where(nzmb, np.arange(n), -1))
            fs.qp[:] = np.where(lastr >= 0,
                                mb_qp[np.clip(lastr, 0, None)], self.qp)
        fs.disable_deblock[:] = 0 if cfg.deblock_idc != 1 else 1
        fs.mv[:, 0, :, :] = out["mv"][:, None, :].astype(np.int32)
        fs.refidx[:, 0, :] = 0
        fs.ref_pic[:, 0, :] = 0
        im = out.get("intra_mask")
        if im is not None and im.any():
            fs.mb_type[im] = MB_I16x16
            fs.mv[im] = 0
            fs.refidx[im] = -1
            fs.ref_pic[im] = -1
        # per-4x4 coeff counts in raster grid layout
        cnt = nz.sum(-1).reshape(cfg.mb_height, cfg.mb_width, 4, 4)
        fs.nzc_l[:] = cnt.transpose(0, 2, 1, 3).reshape(cfg.mb_height * 4,
                                                        cfg.mb_width * 4)
        return fs

    # ------------------------------------------------------------------
    def _encode_i(self, yp, up, vp):
        cfg = self.cfg
        from . import core_jax
        if cfg.enable_i4x4 and not cfg.entropy_cabac:
            from ..native import enc_intra_frame_native
            out = enc_intra_frame_native(
                yp, up, vp, self.qp, self.qp_c,
                int(core_jax.QP_COST_TABLE[np.clip(self.qp, 0, 51)]))
            if out is not None:
                rbsp = self._write_i_slice(out)
                return out, rbsp
        out = core_jax.encode_i_frame(yp, up, vp, self.qp, self.qp_c,
                                      mb_w=cfg.mb_width, mb_h=cfg.mb_height)
        out = {k: np.asarray(v) for k, v in out.items()}
        rbsp = self._write_i_slice(out)
        return out, rbsp

    def _write_i_slice(self, out, mb_h: int | None = None,
                       first_mb: int = 0) -> bytes:
        cfg = self.cfg
        mb_h = cfg.mb_height if mb_h is None else mb_h
        w = BitWriter()
        write_slice_header(w, cfg, 2, self.frame_num, first_mb, self.qp,
                           True, self.idr_pic_id,
                           disable_deblock=cfg.deblock_idc,
                           long_term_ref_flag=cfg.enable_ltr)
        if cfg.entropy_cabac:
            self._write_i_slice_cabac(w, out, mb_h)
            return w.get_bytes()
        nc = _NcTracker(cfg.mb_width, mb_h)
        kind = out.get("kind")
        for idx in range(cfg.mb_width * mb_h):
            if kind is not None and kind[idx] == 0:
                self._write_i4_mb(w, out, idx, nc, p_slice=False)
            else:
                self._write_i16_mb(w, out, idx, nc, p_slice=False)
        w.rbsp_trailing_bits()
        return w.get_bytes()

    # --- CABAC paths ---------------------------------------------------
    def _mb_coeff_views(self, out, idx):
        """CBP + scan-order coefficient views for one MB."""
        luma_ac = out["luma_ac"][idx]
        cdc = out["chroma_dc"][idx]
        cac = out["chroma_ac"][idx]
        cbp_chroma = 2 if cac.any() else (1 if cdc.any() else 0)
        return luma_ac, cdc, cac, cbp_chroma

    def _cabac_luma_ac(self, sw: CabacSliceWriter, out, idx, cbp_luma,
                       is_i16: bool):
        """Luma 4x4 AC/residual blocks in zscan order with per-block cbf."""
        from ..decoder.framedata import ZSCAN_TO_RASTER
        from ..decoder.cabac import I16_AC, LUMA_4x4
        cfg = self.cfg
        mbx, mby = idx % cfg.mb_width, idx // cfg.mb_width
        gx, gy = mbx * 4, mby * 4
        luma_ac = out["luma_ac"][idx]
        prop = I16_AC if is_i16 else LUMA_4x4
        for k in range(16):
            r = int(ZSCAN_TO_RASTER[k])
            bx, by = r % 4, r // 4
            b8 = (by >> 1) * 2 + (bx >> 1)
            if not (cbp_luma & (1 << b8)):
                sw.nzc_l[gy + by, gx + bx] = 0
                continue
            coeffs = luma_ac[r][ZIGZAG_4x4]
            if is_i16:
                coeffs = coeffs[1:]
            nz = int(np.count_nonzero(coeffs))
            sw.cbf(idx, prop, 1 if nz else 0, gx + bx, gy + by)
            if nz:
                sw.residual_levels(prop, coeffs)
            sw.nzc_l[gy + by, gx + bx] = nz

    def _cabac_chroma(self, sw: CabacSliceWriter, out, idx, cbp_chroma):
        from ..decoder.cabac import CHROMA_DC, CHROMA_AC
        cfg = self.cfg
        mbx, mby = idx % cfg.mb_width, idx // cfg.mb_width
        cx, cy = mbx * 2, mby * 2
        if cbp_chroma:
            for comp in range(2):
                dc = out["chroma_dc"][idx, comp]
                nz = dc.any()
                sw.cbf(idx, CHROMA_DC, 1 if nz else 0, comp=comp,
                       dc_bit=1 + comp)
                if nz:
                    sw.residual_levels(CHROMA_DC, dc)
        if cbp_chroma == 2:
            for comp in range(2):
                for k in range(4):
                    bx, by = k % 2, k // 2
                    coeffs = out["chroma_ac"][idx, comp, k][ZIGZAG_4x4][1:]
                    nz = int(np.count_nonzero(coeffs))
                    sw.cbf(idx, CHROMA_AC, 1 if nz else 0, cx + bx, cy + by,
                           comp=comp)
                    if nz:
                        sw.residual_levels(CHROMA_AC, coeffs)
                    sw.nzc_c[comp, cy + by, cx + bx] = nz
        else:
            sw.nzc_c[:, cy:cy + 2, cx:cx + 2] = 0

    def _write_i16_mb_cabac(self, sw: CabacSliceWriter, out, idx,
                            p_slice: bool):
        from ..decoder.cabac import I16_DC
        cfg = self.cfg
        mbx, mby = idx % cfg.mb_width, idx // cfg.mb_width
        luma_ac, cdc, cac, cbp_chroma = self._mb_coeff_views(out, idx)
        cbp_luma = 15 if luma_ac.any() else 0
        sw.mb_type_i16(idx, int(out["i16_mode"][idx]), bool(cbp_luma),
                       cbp_chroma, p_slice)
        sw.intra_chroma_pred_mode(idx, int(out["chroma_mode"][idx]))
        sw.record_cbp(idx, cbp_luma | (cbp_chroma << 4))
        sw.delta_qp(0)
        dc = out["luma_dc"][idx].reshape(-1)[ZIGZAG_4x4]
        nz_dc = dc.any()
        sw.cbf(idx, I16_DC, 1 if nz_dc else 0, dc_bit=0)
        if nz_dc:
            sw.residual_levels(I16_DC, dc)
        self._cabac_luma_ac(sw, out, idx, cbp_luma, is_i16=True)
        self._cabac_chroma(sw, out, idx, cbp_chroma)
        gx, gy = mbx * 4, mby * 4
        sw.mvd[gy:gy + 4, gx:gx + 4] = 0
        sw.mb_coded[idx] = True

    def _write_i_slice_cabac(self, w: BitWriter, out, mb_h: int | None = None):
        cfg = self.cfg
        mb_h = cfg.mb_height if mb_h is None else mb_h
        n_mb = cfg.mb_width * mb_h
        w.byte_align(1)   # cabac_alignment_one_bit
        sw = CabacSliceWriter(cfg.mb_width, mb_h, self.qp,
                              is_i=True)
        for idx in range(n_mb):
            self._write_i16_mb_cabac(sw, out, idx, p_slice=False)
            sw.end_of_slice(idx == n_mb - 1)
        sw.eng.write_to(w)

    def _write_p_slice_cabac(self, w: BitWriter, out, mb_h: int | None = None):
        cfg = self.cfg
        mb_w = cfg.mb_width
        mb_h = cfg.mb_height if mb_h is None else mb_h
        n_mb = mb_w * mb_h
        w.byte_align(1)
        sw = CabacSliceWriter(mb_w, mb_h, self.qp, is_i=False)
        fs = FrameSymbols(mb_w, mb_h)
        fs.slice_id[:] = 0
        mvc = MvContext(fs, 0)
        mb_qp_arr = out.get("mb_qp")
        run_qp = self.qp
        intra_mask = out.get("intra_mask")
        for idx in range(n_mb):
            mbx, mby = idx % mb_w, idx // mb_w
            gx, gy = mbx * 4, mby * 4
            fs.gwritten[gy:gy + 4, gx:gx + 4] = False
            if intra_mask is not None and intra_mask[idx]:
                sw.skip_flag(idx, 0)
                self._write_i16_mb_cabac(sw, out, idx, p_slice=True)
                fs.gmv[:, gy:gy + 4, gx:gx + 4] = 0
                fs.gref[:, gy:gy + 4, gx:gx + 4] = -1
                fs.gwritten[gy:gy + 4, gx:gx + 4] = True
                fs.mb_type[idx] = MB_I16x16
                sw.end_of_slice(idx == n_mb - 1)
                continue
            mv = out["mv"][idx].astype(np.int32)
            luma_ac, cdc, cac, cbp_chroma = self._mb_coeff_views(out, idx)
            cbp_luma = 0
            for b8 in range(4):
                blocks = [(b8 // 2) * 8 + (b8 % 2) * 2 + (i // 2) * 4 + (i % 2)
                          for i in range(4)]
                if luma_ac[blocks].any():
                    cbp_luma |= 1 << b8
            cbp = cbp_luma | (cbp_chroma << 4)
            skip_mv = mvc.pred_skip_mv(gx, gy, idx)
            if cbp == 0 and mv[0] == skip_mv[0] and mv[1] == skip_mv[1]:
                sw.skip_flag(idx, 1)
                mvc.set_partition(gx, gy, 4, 4, 0, 0, mv)
                sw.mvd[gy:gy + 4, gx:gx + 4] = 0
                sw.nzc_l[gy:gy + 4, gx:gx + 4] = 0
                sw.nzc_c[:, mby * 2:mby * 2 + 2, mbx * 2:mbx * 2 + 2] = 0
                sw.record_cbp(idx, 0)
                sw.mb_skip[idx] = True
                sw.mb_coded[idx] = True
                sw.last_dqp = 0
                sw.end_of_slice(idx == n_mb - 1)
                continue
            sw.skip_flag(idx, 0)
            sw.mb_type_p16x16()
            mvp = mvc.pred_mv(gx, gy, 4, 4, 0, 0, idx)
            mvd = (int(mv[0] - mvp[0]), int(mv[1] - mvp[1]))
            sw.mvd_comp(idx, 0, gx, gy, mvd[0])
            sw.mvd_comp(idx, 1, gx, gy, mvd[1])
            sw.mvd[gy:gy + 4, gx:gx + 4] = mvd
            mvc.set_partition(gx, gy, 4, 4, 0, 0, mv)
            sw.write_cbp(idx, cbp)
            if cbp:
                want = int(mb_qp_arr[idx]) if mb_qp_arr is not None else self.qp
                sw.delta_qp(want - run_qp)
                run_qp = want
                self._cabac_luma_ac(sw, out, idx, cbp_luma, is_i16=False)
                self._cabac_chroma(sw, out, idx, cbp_chroma)
            else:
                sw.last_dqp = 0
                sw.nzc_l[gy:gy + 4, gx:gx + 4] = 0
                sw.nzc_c[:, mby * 2:mby * 2 + 2, mbx * 2:mbx * 2 + 2] = 0
            sw.mb_coded[idx] = True
            sw.end_of_slice(idx == n_mb - 1)
        sw.eng.write_to(w)

    def _write_i4_mb(self, w, out, idx, nc: _NcTracker, p_slice: bool):
        """I_4x4 macroblock syntax (mb_type 0; spec 7.3.5 +
        7.4.5.1 Intra4x4PredMode signalling; parity:
        WelsSpatialWriteMbSyn intra4x4 branch,
        svc_set_mb_syn_cavlc.cpp:260)."""
        from ..decoder.framedata import ZSCAN_TO_RASTER
        from ..tables.cavlc import CBP_INTRA_INV
        cfg = self.cfg
        mbx, mby = idx % cfg.mb_width, idx // cfg.mb_width
        luma_ac = out["luma_ac"][idx]          # [16 raster][16] full
        cbp_luma = 0
        for b8 in range(4):
            blocks = [(b8 // 2) * 8 + (b8 % 2) * 2 + (i // 2) * 4 + (i % 2)
                      for i in range(4)]
            if luma_ac[blocks].any():
                cbp_luma |= 1 << b8
        cac = out["chroma_ac"][idx]
        cdc = out["chroma_dc"][idx]
        cbp_chroma = 2 if cac.any() else (1 if cdc.any() else 0)
        cbp = cbp_luma | (cbp_chroma << 4)
        w.ue(5 if p_slice else 0)              # mb_type I_4x4
        prev = out["i4_prev"][idx]
        rem = out["i4_rem"][idx]
        for kz in range(16):
            w.flag(bool(prev[kz]))
            if not prev[kz]:
                w.u(3, int(rem[kz]))
        w.ue(int(out["chroma_mode"][idx]))
        w.ue(int(CBP_INTRA_INV[cbp]))
        if cbp:
            w.se(0)                            # mb_qp_delta
        gx, gy = mbx * 4, mby * 4
        for k in range(16):
            r = int(ZSCAN_TO_RASTER[k])
            bx, by = r % 4, r // 4
            b8 = (by >> 1) * 2 + (bx >> 1)
            if cbp_luma & (1 << b8):
                coeffs = luma_ac[r][ZIGZAG_4x4]
                tc = write_residual_block(
                    w, coeffs, nc.nc_luma(gx + bx, gy + by), 16)
            else:
                tc = 0
            nc.nzc_l[gy + by, gx + bx] = tc
        self._write_chroma_residual(w, out, idx, nc, cbp_chroma)

    def _write_i16_mb(self, w, out, idx, nc: _NcTracker, p_slice: bool):
        cfg = self.cfg
        mbx, mby = idx % cfg.mb_width, idx // cfg.mb_width
        luma_ac = out["luma_ac"][idx]          # [16,16] raster blk/coef
        cbp_luma = 15 if luma_ac.any() else 0
        cdc = out["chroma_dc"][idx]
        cac = out["chroma_ac"][idx]
        cbp_chroma = 2 if cac.any() else (1 if cdc.any() else 0)
        mb_type = 1 + int(out["i16_mode"][idx]) + 4 * cbp_chroma + \
            12 * (1 if cbp_luma else 0)
        if p_slice:
            mb_type += 5
        w.ue(mb_type)
        w.ue(int(out["chroma_mode"][idx]))
        w.se(0)  # mb_qp_delta (I16 always codes it)
        # luma DC: scan order over Hadamard block
        dc = out["luma_dc"][idx].reshape(-1)[ZIGZAG_4x4]
        gx, gy = mbx * 4, mby * 4
        write_residual_block(w, dc, nc.nc_luma(gx, gy), 16)
        # luma AC blocks in zscan order
        from ..decoder.framedata import ZSCAN_TO_RASTER
        for k in range(16):
            r = int(ZSCAN_TO_RASTER[k])
            bx, by = r % 4, r // 4
            if cbp_luma:
                coeffs = luma_ac[r][ZIGZAG_4x4][1:]
                tc = write_residual_block(w, coeffs, nc.nc_luma(gx + bx, gy + by), 15)
            else:
                tc = 0
            nc.nzc_l[gy + by, gx + bx] = tc
        self._write_chroma_residual(w, out, idx, nc, cbp_chroma)

    def _write_chroma_residual(self, w, out, idx, nc, cbp_chroma):
        cfg = self.cfg
        mbx, mby = idx % cfg.mb_width, idx // cfg.mb_width
        cx, cy = mbx * 2, mby * 2
        if cbp_chroma:
            for comp in range(2):
                write_residual_block(w, out["chroma_dc"][idx, comp], -1, 4)
        if cbp_chroma == 2:
            for comp in range(2):
                for k in range(4):
                    bx, by = k % 2, k // 2
                    coeffs = out["chroma_ac"][idx, comp, k][ZIGZAG_4x4][1:]
                    tc = write_residual_block(
                        w, coeffs, nc.nc_chroma(comp, cx + bx, cy + by), 15)
                    nc.nzc_c[comp, cy + by, cx + bx] = tc
        else:
            nc.nzc_c[:, cy:cy + 2, cx:cx + 2] = 0

    # ------------------------------------------------------------------
    def _slide_window(self):
        """Sliding window over SHORT-TERM refs only; LTR entries live
        until replaced by a same-index marking (§8.2.5.3 +
        ref_list_mgr_svc.cpp WelsUpdateRefList)."""
        st = [e for e in self.dpb if not e.is_ltr]
        while len(st) > self._st_capacity:
            victim = st.pop(0)
            self.dpb.remove(victim)

    def _reorder_cmd(self, ref: _RefEntry) -> int | None:
        """abs_diff_pic_num_minus1 when `ref` isn't already first in the
        default P list (§8.2.4.2.1 descending-PicNum order). LTR refs
        are handled by _reorder_for (idc-2 modification)."""
        mx = 1 << self.cfg.log2_max_frame_num
        cur = self.frame_num

        def picnum(fn):
            return fn if fn <= cur else fn - mx
        default = sorted((e.frame_num for e in self.dpb if not e.is_ltr),
                         key=picnum, reverse=True)
        if default and default[0] == ref.frame_num:
            return None
        return (cur - ref.frame_num + mx) % mx - 1

    def _reorder_for(self, ref: _RefEntry):
        """(reorder_abs_diff, reorder_long_term) pinning `ref` first in
        L0. An LTR target always gets an explicit idc-2 command; a
        short-term target only needs one when it isn't already the
        default head."""
        if ref.is_ltr:
            return None, ref.ltr_idx
        return self._reorder_cmd(ref), None

    def _encode_p(self, yp, up, vp, ref: _RefEntry, is_ref: bool,
                  mmco_ops=None):
        cfg = self.cfg
        from . import core_jax
        ry, ru, rv = ref.planes
        mb_qp = None
        if cfg.enable_adaptive_quant or cfg.enable_gom_rc:
            from ..processing.vaa import vaa_calc
            vaa = {k: np.asarray(a) for k, a in vaa_calc(yp, ry).items()}
            dqp = np.zeros((cfg.mb_height, cfg.mb_width), np.int32)
            if cfg.enable_adaptive_quant:
                from ..processing.adaptivequant import adaptive_quant_map
                dqp += adaptive_quant_map(vaa).astype(np.int32)
            if cfg.enable_gom_rc:
                # per-MB-row (GOM) offset from relative complexity
                # (WelsRcMbInitGom analog at GOM granularity)
                sad = vaa["sad8x8"].sum(-1).astype(np.int64)  # [mh,mw]
                gom = sad.sum(-1)                              # [mh]
                avg = max(1, int(gom.mean()))
                off = np.where(gom > 2 * avg, 1,
                               np.where(4 * gom < avg, -1, 0)).astype(np.int32)
                dqp += off[:, None]
            from .ratectl import RC_OFF_MODE as _RC_OFF
            if cfg.rc_mode != _RC_OFF:
                # keep AQ zero-mean under rate control so the frame-level
                # budget model stays calibrated
                dqp = dqp - int(round(float(dqp.mean())))
            mb_qp = np.clip(self.qp + dqp.reshape(-1),
                            cfg.min_qp, cfg.max_qp).astype(np.int32)
            mb_qp_c = CHROMA_QP_TABLE[np.clip(
                mb_qp + cfg.chroma_qp_offset, 0, 51)].astype(np.int32)
        n_mb = cfg.mb_width * cfg.mb_height
        prev_sad = (ref.skip_sad if ref.skip_sad is not None
                    else np.zeros(n_mb, np.int32))
        prev_skip = (ref.skip_map if ref.skip_map is not None
                     else np.zeros(n_mb, bool))
        extra_mv = None
        if cfg.usage_type == 1 and \
                getattr(self, "_scroll_prev", None) is not None:
            # screen content: a detected global scroll becomes a
            # whole-MB candidate for every MB (its magnitude usually
            # exceeds the local search range). Like the reference's
            # preprocessing, detection compares INPUT frames (the
            # recon's quantization noise breaks exact row matches).
            from ..processing.scroll import detect_scroll
            flag, mv_y = detect_scroll(yp, self._scroll_prev)
            if flag and mv_y != 0:
                extra_mv = np.array([0, 4 * mv_y], np.int32)
        out = core_jax.encode_p_frame(
            yp, up, vp, ry, ru, rv,
            self.qp if mb_qp is None else mb_qp,
            self.qp_c if mb_qp is None else mb_qp_c,
            mb_w=cfg.mb_width, mb_h=cfg.mb_height,
            sr=cfg.search_range,
            prev_skip_sad=np.asarray(prev_sad, np.int32),
            prev_skip=np.asarray(prev_skip, bool),
            extra_mv=extra_mv)
        out = {k: np.asarray(v) for k, v in out.items()}
        if mb_qp is not None:
            out["mb_qp"] = mb_qp
        # intra-in-P mode decision (parity: WelsMdIntraMb vs WelsMdInterMb
        # cost comparison, svc_base_layer_md.cpp:956/1858): both costs
        # are SATD-scaled; the intra proxy underestimates bit cost, so
        # bias it by ~lambda like the reference's intra lambda term.
        intra_mask = np.zeros(cfg.mb_width * cfg.mb_height, bool)
        if cfg.enable_intra_in_p and mb_qp is None:
            lam = max(self.qp - 12, 1)
            intra_mask = (out["intra_cost_proxy"].astype(np.int64) + 8 * lam
                          < out["inter_cost"].astype(np.int64))
            intra_mask &= ~out["skip_mask"]   # promoted skips stay inter
            # same chain-free demotion as the device fast path (see
            # core_jax.chainfree_intra_mask) so both paths pick
            # identical modes and stay byte-identical
            intra_mask = np.asarray(core_jax.chainfree_intra_mask(
                intra_mask, cfg.mb_width, cfg.mb_height))
        out["intra_mask"] = intra_mask
        if intra_mask.any():
            iout = core_jax.encode_i_frame(
                yp, up, vp, self.qp, self.qp_c,
                mb_w=cfg.mb_width, mb_h=cfg.mb_height,
                intra_mask=intra_mask,
                init_recon=(out["recon_y"], out["recon_u"], out["recon_v"]))
            iout = {k: np.asarray(v) for k, v in iout.items()}
            m = intra_mask
            out["recon_y"], out["recon_u"], out["recon_v"] = \
                iout["recon_y"], iout["recon_u"], iout["recon_v"]
            out["i16_mode"] = iout["i16_mode"]
            out["chroma_mode"] = iout["chroma_mode"]
            out["luma_dc"] = iout["luma_dc"]
            out["luma_ac"] = out["luma_ac"].copy()
            out["luma_ac"][m] = iout["luma_ac"][m]
            out["chroma_dc"] = out["chroma_dc"].copy()
            out["chroma_dc"][m] = iout["chroma_dc"][m]
            out["chroma_ac"] = out["chroma_ac"].copy()
            out["chroma_ac"][m] = iout["chroma_ac"][m]
        reorder, reorder_lt = self._reorder_for(ref)
        rbsp = self._write_p_slice(out, is_ref, reorder,
                                   mmco_ops=mmco_ops, reorder_lt=reorder_lt)
        return out, rbsp

    def _write_p_slice(self, out, is_ref: bool = True,
                       reorder_abs_diff: int | None = None,
                       mb_h: int | None = None, first_mb: int = 0,
                       mmco_ops=None, reorder_lt=None) -> bytes:
        cfg = self.cfg
        mb_w = cfg.mb_width
        mb_h = cfg.mb_height if mb_h is None else mb_h
        w = BitWriter()
        write_slice_header(w, cfg, 0, self.frame_num, first_mb, self.qp,
                           False, 0, disable_deblock=cfg.deblock_idc,
                           is_ref=is_ref, reorder_abs_diff=reorder_abs_diff,
                           reorder_long_term=reorder_lt, mmco_ops=mmco_ops)
        if cfg.entropy_cabac:
            self._write_p_slice_cabac(w, out, mb_h)
            return w.get_bytes()
        # vectorized whole-frame CAVLC writer (cavlc_vec.py)
        from .cavlc_vec import write_p_slice_tokens, assemble_rbsp
        out = dict(out)
        out["slice_qp"] = self.qp
        hdr_bits = w.bit_array()
        av, al, tv, tl = write_p_slice_tokens(out, mb_w, mb_h)
        groups = [(av, al)]
        if tv is not None:
            groups.append((tv, tl))
        return assemble_rbsp(hdr_bits, groups)

    def _write_p_slice_scalar(self, out, is_ref: bool = True,
                              reorder_abs_diff: int | None = None) -> bytes:
        """Per-MB reference implementation (oracle for cavlc_vec)."""
        cfg = self.cfg
        mb_w, mb_h = cfg.mb_width, cfg.mb_height
        n_mb = mb_w * mb_h
        w = BitWriter()
        write_slice_header(w, cfg, 0, self.frame_num, 0, self.qp, False,
                           0, disable_deblock=cfg.deblock_idc,
                           is_ref=is_ref, reorder_abs_diff=reorder_abs_diff)
        if cfg.entropy_cabac:
            self._write_p_slice_cabac(w, out)
            return w.get_bytes()
        nc = _NcTracker(mb_w, mb_h)
        # MVP state via the decoder's machinery (exact by construction)
        fs = FrameSymbols(mb_w, mb_h)
        fs.slice_id[:] = 0
        mvc = MvContext(fs, 0)
        skip_run = 0
        mb_qp_arr = out.get("mb_qp")
        run_qp = self.qp
        from ..decoder.framedata import ZSCAN_TO_RASTER
        intra_mask = out.get("intra_mask")
        for idx in range(n_mb):
            mbx, mby = idx % mb_w, idx // mb_w
            gx, gy = mbx * 4, mby * 4
            fs.gwritten[gy:gy + 4, gx:gx + 4] = False
            if intra_mask is not None and intra_mask[idx]:
                w.ue(skip_run)
                skip_run = 0
                self._write_i16_mb(w, out, idx, nc, p_slice=True)
                # intra MBs enter MV prediction as unavailable (ref -1)
                fs.gmv[:, gy:gy + 4, gx:gx + 4] = 0
                fs.gref[:, gy:gy + 4, gx:gx + 4] = -1
                fs.gwritten[gy:gy + 4, gx:gx + 4] = True
                continue
            mv = out["mv"][idx].astype(np.int32)
            luma_ac = out["luma_ac"][idx]
            cdc = out["chroma_dc"][idx]
            cac = out["chroma_ac"][idx]
            cbp_luma = 0
            for b8 in range(4):
                blocks = [(b8 // 2) * 8 + (b8 % 2) * 2 + (i // 2) * 4 + (i % 2)
                          for i in range(4)]
                if luma_ac[blocks].any():
                    cbp_luma |= 1 << b8
            cbp_chroma = 2 if cac.any() else (1 if cdc.any() else 0)
            cbp = cbp_luma | (cbp_chroma << 4)
            skip_mv = mvc.pred_skip_mv(gx, gy, idx)
            if cbp == 0 and mv[0] == skip_mv[0] and mv[1] == skip_mv[1]:
                skip_run += 1
                mvc.set_partition(gx, gy, 4, 4, 0, 0, mv)
                nc.nzc_l[gy:gy + 4, gx:gx + 4] = 0
                nc.nzc_c[:, mby * 2:mby * 2 + 2, mbx * 2:mbx * 2 + 2] = 0
                continue
            w.ue(skip_run)
            skip_run = 0
            w.ue(0)  # mb_type P_L0_16x16
            mvp = mvc.pred_mv(gx, gy, 4, 4, 0, 0, idx)
            w.se(int(mv[0] - mvp[0]))
            w.se(int(mv[1] - mvp[1]))
            mvc.set_partition(gx, gy, 4, 4, 0, 0, mv)
            w.ue(int(CBP_INTER_INV[cbp]))
            if cbp:
                want = int(mb_qp_arr[idx]) if mb_qp_arr is not None else self.qp
                w.se(want - run_qp)
                run_qp = want
            # luma residual (only coded 8x8s)
            for k in range(16):
                r = int(ZSCAN_TO_RASTER[k])
                bx, by = r % 4, r // 4
                b8 = (by >> 1) * 2 + (bx >> 1)
                if cbp_luma & (1 << b8):
                    coeffs = luma_ac[r][ZIGZAG_4x4]
                    tc = write_residual_block(w, coeffs,
                                              nc.nc_luma(gx + bx, gy + by), 16)
                else:
                    tc = 0
                nc.nzc_l[gy + by, gx + bx] = tc
            self._write_chroma_residual(w, out, idx, nc, cbp_chroma)
        if skip_run:
            w.ue(skip_run)
        w.rbsp_trailing_bits()
        return w.get_bytes()


def encode_yuv_file(cfg: EncoderConfig, yuv_path: str, n_frames: int,
                    out_path: str | None = None) -> bytes:
    """Encode a raw YUV420 file; returns the Annex-B stream."""
    w, h = cfg.width, cfg.height
    fsz = w * h * 3 // 2
    enc = H264Encoder(cfg)
    chunks = []
    with open(yuv_path, "rb") as f:
        for _ in range(n_frames):
            raw = f.read(fsz)
            if len(raw) < fsz:
                break
            y = np.frombuffer(raw[:w * h], np.uint8).reshape(h, w)
            u = np.frombuffer(raw[w * h:w * h + w * h // 4], np.uint8).reshape(h // 2, w // 2)
            v = np.frombuffer(raw[w * h + w * h // 4:], np.uint8).reshape(h // 2, w // 2)
            chunks.append(enc.encode_frame(y, u, v))
    stream = b"".join(chunks)
    if out_path:
        with open(out_path, "wb") as f:
            f.write(stream)
    return stream
