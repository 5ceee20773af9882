"""Top-level H.264 decoder session.

Mirrors the reference's decode entry flow (welsDecoderExt.cpp
DecodeFrameNoDelay → WelsDecodeBs → ConstructAccessUnit,
SURVEY.md §3.3): Annex-B in, YUV420 frames out. The entropy/parse phase
is host-serial; reconstruction runs through the (oracle or JAX batched)
recon pipeline.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..bitstream import (BitReader, split_annexb, NAL_SPS, NAL_PPS, NAL_IDR,
                         NAL_SLICE, NAL_SLICE_EXT, NAL_SUBSET_SPS, NAL_SEI)
from .dpb import DPB, Picture, PocContext
from .framedata import FrameSymbols
from .params import parse_pps, parse_sps
from .recon_batch import recon_frame_batch as recon_frame
from .slice_dec import SliceDecodeContext, decode_slice_data_cavlc
from .slicehdr import parse_slice_header, I_SLICE, P_SLICE, B_SLICE
from ..oracle.deblock import deblock_frame


@dataclass
class DecodedFrame:
    y: np.ndarray
    u: np.ndarray
    v: np.ndarray
    poc: int = 0
    frame_num: int = 0
    is_idr: bool = False
    cvs: int = 0  # coded-video-sequence counter (for output ordering)

    def planes(self):
        return self.y, self.u, self.v


class H264Decoder:
    """Session-style decoder: feed Annex-B bytes, collect frames.

    ec_mode: ERROR_CON_IDC analog (decoder/ec.py). The default matches
    the reference console's `h264dec in out` invocation
    (ERROR_CON_SLICE_COPY, h264dec.cpp:564), which is what the
    conformance goldens were produced with. Incomplete (EC'd) pictures
    are concealed and kept as references but NOT emitted: in the
    reference's no-delay flow their output lands in the data call of a
    DecodeFrame2 pair and the follow-up flush call memsets it away
    (welsDecoderExt.cpp DecodeFrameNoDelay:695-733).
    """

    def __init__(self, use_jax_recon: bool = False, ec_mode: int | None = None):
        from .ec import ERROR_CON_SLICE_COPY
        self.sps_map: dict[int, object] = {}
        self.subset_sps_map: dict[int, object] = {}
        self.pps_map: dict[int, object] = {}
        self.use_jax_recon = use_jax_recon
        self.ec_mode = ERROR_CON_SLICE_COPY if ec_mode is None else ec_mode
        self.dpb: DPB | None = None
        self.poc_ctx: PocContext | None = None
        self.active_sps = None
        # incremental-mode state (feed_annexb/flush)
        self._in_buf = b""
        self._pending: list[tuple] = []
        self._reorder_q: list[DecodedFrame] = []

    @staticmethod
    def _is_au_boundary(prev_sh, sh) -> bool:
        """CheckAccessUnitBoundary (au_parser.cpp:495) for frame coding,
        plus the universal first_mb_in_slice==0 new-picture rule."""
        if sh.first_mb_in_slice == 0:
            return True
        if prev_sh is None:
            return False
        if prev_sh.sps is not sh.sps:
            return True
        if prev_sh.frame_num != sh.frame_num:
            return True
        if prev_sh.pps_id != sh.pps_id:
            return True
        if (prev_sh.nal.nal_ref_idc != 0) != (sh.nal.nal_ref_idc != 0):
            return True
        if prev_sh.is_idr != sh.is_idr:
            return True
        if sh.is_idr and prev_sh.idr_pic_id != sh.idr_pic_id:
            return True
        if sh.sps.pic_order_cnt_type == 0:
            if prev_sh.pic_order_cnt_lsb != sh.pic_order_cnt_lsb:
                return True
        elif sh.sps.pic_order_cnt_type == 1:
            if prev_sh.delta_pic_order_cnt != sh.delta_pic_order_cnt:
                return True
        if prev_sh.redundant_pic_cnt > sh.redundant_pic_cnt:
            return True
        return False

    def _handle_nal(self, nal) -> DecodedFrame | None:
        """Process one NAL unit; returns the decoded picture when this
        NAL begins a new access unit (completing the pending one)."""
        from .ec import ERROR_CON_DISABLE
        if nal.nal_unit_type == NAL_SPS:
            sps = parse_sps(nal.rbsp)
            self.sps_map[sps.sps_id] = sps
        elif nal.nal_unit_type == NAL_SUBSET_SPS:
            sps = parse_sps(nal.rbsp, is_subset=True)
            self.subset_sps_map[sps.sps_id] = sps
        elif nal.nal_unit_type == NAL_PPS:
            pps = parse_pps(nal.rbsp, self.sps_map)
            self.pps_map[pps.pps_id] = pps
        elif nal.nal_unit_type in (NAL_SLICE, NAL_IDR, NAL_SLICE_EXT):
            br = BitReader(nal.rbsp)
            try:
                sh = parse_slice_header(br, nal, self.sps_map, self.pps_map,
                                        self.subset_sps_map)
            except ValueError as e:
                if nal.nal_unit_type == NAL_SLICE_EXT:
                    # unsupported SVC enhancement slice: skip it and keep
                    # decoding the AVC base layer (parity: the reference
                    # decodes the base layer of multi-layer streams)
                    return None
                if self.ec_mode != ERROR_CON_DISABLE:
                    from ..utils import wels_log, WELS_LOG_WARNING
                    wels_log(WELS_LOG_WARNING,
                             f"dropping slice NAL with bad header: {e}")
                    return None
                raise
            done = None
            prev_sh = self._pending[-1][1] if self._pending else None
            if self._pending and self._is_au_boundary(prev_sh, sh):
                done = self._decode_picture(self._pending)
                self._pending = []
            self._pending.append((nal, sh, br))
            return done
        # SEI, AUD, filler etc. skipped
        return None

    def decode_annexb(self, data: bytes) -> list[DecodedFrame]:
        """Decode a whole Annex-B stream (batch mode)."""
        frames: list[DecodedFrame] = []
        for nal in split_annexb(data):
            frames.append(self._handle_nal(nal))
        if self._pending:
            # trailing AU: the reference decodes it at EOS flush; if it
            # is incomplete there is no later boundary to trigger EC, so
            # it is decoded but never output either way
            frames.append(self._decode_picture(self._pending))
            self._pending = []
        frames = [f for f in frames if f is not None]
        # Output (display) order mirrors the reference's reorder policy
        # (welsDecoderExt.cpp:992-1137 Buffering/ReleaseBufferedReadyPicture):
        # baseline profile and B-free streams release in decode order
        # (ReleaseBufferedReadyPictureNoReorder); only streams that carry
        # B-slices reorder by POC within each coded video sequence.
        if getattr(self, "_has_b_slices", False):
            frames.sort(key=lambda f: (f.cvs, f.poc))
        return frames

    # ------------------------------------------------------------------
    # Incremental input (fragmented-NAL feeding, welsDecoderExt.cpp
    # DecodeFrame2's per-call buffering): callers may deliver partial
    # NALs; complete NALs decode as soon as the NEXT start code proves
    # them complete, and access units spanning calls stay pending.
    def feed_annexb(self, data: bytes) -> list[DecodedFrame]:
        from .nalbuf import split_complete
        self._in_buf += bytes(data)
        complete, self._in_buf = split_complete(self._in_buf)
        out = []
        if complete:
            for nal in split_annexb(complete):
                f = self._handle_nal(nal)
                if f is not None:
                    self._reorder_q.append(f)
            out = self._release(eos=False)
        return out

    def flush(self) -> list[DecodedFrame]:
        """End of stream: decode everything still buffered and release
        the reorder queue (ISVCDecoder FlushFrame semantics)."""
        for nal in split_annexb(self._in_buf):
            f = self._handle_nal(nal)
            if f is not None:
                self._reorder_q.append(f)
        self._in_buf = b""
        if self._pending:
            f = self._decode_picture(self._pending)
            self._pending = []
            if f is not None:
                self._reorder_q.append(f)
        return self._release(eos=True)

    def _release(self, eos: bool) -> list[DecodedFrame]:
        """Bounded-latency reorder release (the reference's
        ReleaseBufferedReadyPictureReorder holds at most the DPB depth
        before emitting the smallest-POC buffered picture)."""
        q = self._reorder_q
        if not getattr(self, "_has_b_slices", False):
            self._reorder_q = []
            return q
        q.sort(key=lambda f: (f.cvs, f.poc))
        if eos:
            self._reorder_q = []
            return q
        depth = 1 + (self.active_sps.max_num_ref_frames
                     if self.active_sps is not None else 1)
        max_cvs = max((f.cvs for f in q), default=0)
        out = []
        while q and (len(q) > depth or q[0].cvs < max_cvs):
            out.append(q.pop(0))
        return out

    def _activate_sps(self, sps) -> None:
        # a re-transmitted identical SPS is NOT a new coded video
        # sequence and must not flush the DPB (the reference keeps
        # decoding; only content change triggers new-seq handling,
        # decoder_core.cpp DecodeFrameConstruction new-seq path)
        if self.active_sps is not None and (
                self.active_sps is sps
                or getattr(self.active_sps, "raw", None) == getattr(sps, "raw", 1)):
            self.active_sps = sps
            return
        self.active_sps = sps
        self.dpb = DPB(sps.max_num_ref_frames, 1 << sps.log2_max_frame_num)
        self.poc_ctx = PocContext(sps)

    def _decode_picture(self, slices) -> DecodedFrame:
        _, sh0, _ = slices[0]
        sps = sh0.sps
        self._activate_sps(sps)
        poc = self.poc_ctx.compute(sh0, sh0.nal.nal_ref_idc)
        fs = FrameSymbols(sps.mb_width, sps.mb_height)
        fs.mb_correct[:] = False
        if any(sh.slice_type == B_SLICE for _, sh, _ in slices):
            self._has_b_slices = True
        if sh0.slice_type in (P_SLICE, B_SLICE) and \
                not any(p.is_ref for p in self.dpb.pics):
            self._recover_lost_ref(sps, sh0)
        ref_pics: dict[int, Picture] = {}
        fs.wp_by_slice = []
        last_l0 = None      # last slice's L0 for EC MV-copy modes
        fmo_next = None
        if sh0.pps.num_slice_groups > 1:
            # FMO: MBs iterate within their slice group (fmo.cpp
            # FmoNextMb); the map may depend on the per-picture
            # slice_group_change_cycle (map types 3-5)
            from .fmo import build_mb_to_slice_group, next_mb_lut
            gmap = build_mb_to_slice_group(
                sh0.pps, sps, getattr(sh0, "slice_group_change_cycle", 0))
            fmo_next = next_mb_lut(gmap)
        for si, (nal, sh, br) in enumerate(slices):
            l0 = l1 = []
            i0 = i1 = []
            if sh.slice_type in (P_SLICE, B_SLICE):
                if sh.slice_type == P_SLICE:
                    i0 = self.dpb.build_list_p(sh.frame_num)
                    l0 = self.dpb.reorder_list(i0, sh.ref_pic_list_modification[0],
                                               sh.frame_num, sh.num_ref_idx_l0_active)
                else:
                    i0, i1 = self.dpb.build_lists_b(poc, sh.frame_num)
                    l0 = self.dpb.reorder_list(i0, sh.ref_pic_list_modification[0],
                                               sh.frame_num, sh.num_ref_idx_l0_active)
                    l1 = self.dpb.reorder_list(i1, sh.ref_pic_list_modification[1],
                                               sh.frame_num, sh.num_ref_idx_l1_active)
                for p in l0 + l1:
                    if p is not None:
                        ref_pics[p.pic_id] = p
                last_l0 = l0
            from .wpred import build_slice_wp
            fs.wp_by_slice.append(build_slice_wp(sh, i0, i1, cur_poc=poc))
            ctx = SliceDecodeContext(fs, sh, si, ref_list0=l0, ref_list1=l1,
                                     poc=poc, fmo_next=fmo_next)
            try:
                if sh.pps.entropy_coding_mode:
                    from .slice_dec_cabac import decode_slice_data_cabac
                    decode_slice_data_cabac(nal.rbsp, sh.header_bits, ctx)
                else:
                    decode_slice_data_cavlc(br, ctx)
            except Exception as e:
                from .ec import ERROR_CON_DISABLE
                if self.ec_mode == ERROR_CON_DISABLE:
                    raise
                from ..utils import wels_log, WELS_LOG_WARNING
                wels_log(WELS_LOG_WARNING,
                         f"slice {si} (first_mb {sh.first_mb_in_slice}) parse "
                         f"error, concealing rest: {type(e).__name__}: {e}")
        complete = bool(fs.mb_correct.all())
        st = recon_frame(fs, ref_pics, sh0.pps.constrained_intra_pred,
                         device=self.use_jax_recon)
        deblock_frame(st, fs)
        if not complete:
            from .ec import implement_error_con
            prev = getattr(self, "prev_decoded", None)
            implement_error_con(self.ec_mode, st, fs, fs.mb_correct, prev,
                                sh0.is_idr, ref_list0=last_l0, cur_poc=poc)
        # store into DPB (full uncropped planes; refs must keep MB grid)
        pic = Picture(0, st.y, st.u, st.v, frame_num=sh0.frame_num, poc=poc,
                      is_ref=sh0.nal.nal_ref_idc != 0, is_idr=sh0.is_idr)
        self._attach_col_motion(pic, fs)
        self.dpb.store_picture(pic, sh0)
        self.prev_decoded = pic
        if sh0.is_idr:
            self._cvs_counter = getattr(self, "_cvs_counter", -1) + 1
        if not complete:
            # EC'd pictures stay in the DPB as refs but are not emitted
            # (see class docstring for the reference-flow reason)
            return None
        y, u, v = self._crop(sps, st)
        return DecodedFrame(y, u, v, poc=poc, frame_num=sh0.frame_num,
                            is_idr=sh0.is_idr,
                            cvs=getattr(self, "_cvs_counter", 0))

    def _recover_lost_ref(self, sps, sh0) -> None:
        """P/B slice with an empty DPB (lost IDR): synthesize a ref so
        decoding can continue (manage_dec_ref.cpp:151
        WelsCheckAndRecoverForFutureDecoding). With a cross-IDR EC mode
        and a previous decoded picture of the same size, copy it;
        otherwise mid-gray."""
        H, W = sps.mb_height * 16, sps.mb_width * 16
        prev = getattr(self, "prev_decoded", None)
        if prev is not None and prev.y.shape == (H, W):
            y, u, v = prev.y.copy(), prev.u.copy(), prev.v.copy()
        else:
            y = np.full((H, W), 128, np.uint8)
            u = np.full((H // 2, W // 2), 128, np.uint8)
            v = np.full((H // 2, W // 2), 128, np.uint8)
        from ..utils import wels_log, WELS_LOG_WARNING
        prev_fn = (sh0.frame_num - 1) % (1 << sps.log2_max_frame_num)
        wels_log(WELS_LOG_WARNING,
                 "P/B slice with empty DPB: synthesizing lost reference "
                 f"(frame_num={prev_fn}) for error concealment")
        pic = Picture(0, y, u, v, frame_num=prev_fn, poc=0, is_ref=True)
        h4, w4 = sps.mb_height * 4, sps.mb_width * 4
        pic.col_mv0 = np.zeros((h4, w4, 2), np.int32)
        pic.col_mv1 = np.zeros((h4, w4, 2), np.int32)
        pic.col_ref0 = np.full((h4, w4), -1, np.int32)
        pic.col_ref1 = np.full((h4, w4), -1, np.int32)
        pic.col_refpic0 = np.full((h4, w4), -1, np.int32)
        pic.col_refpic1 = np.full((h4, w4), -1, np.int32)
        pic.col_intra = np.ones((h4, w4), bool)
        pic.pic_id = self.dpb._next_id
        self.dpb._next_id += 1
        self.dpb.pics.append(pic)

    @staticmethod
    def _attach_col_motion(pic: Picture, fs: FrameSymbols) -> None:
        """Save the picture's motion field for temporal/spatial direct."""
        from .mvpred import ensure_motion_grids
        from .framedata import INTRA_CLASSES
        ensure_motion_grids(fs)
        pic.col_mv0 = fs.gmv[0].copy()
        pic.col_mv1 = fs.gmv[1].copy()
        pic.col_ref0 = fs.gref[0].copy()
        pic.col_ref1 = fs.gref[1].copy()
        # expand per-quadrant resolved DPB pic ids to the 4x4 grid
        rp = fs.ref_pic.reshape(fs.mb_h, fs.mb_w, 2, 2, 2)
        grids = []
        for lx in range(2):
            g = rp[:, :, lx]  # [mby][mbx][qy][qx]
            g = g.transpose(0, 2, 1, 3).reshape(fs.mb_h * 2, fs.mb_w * 2)
            grids.append(np.repeat(np.repeat(g, 2, axis=0), 2, axis=1))
        pic.col_refpic0, pic.col_refpic1 = grids
        intra_mb = np.isin(fs.mb_type.reshape(fs.mb_h, fs.mb_w),
                           INTRA_CLASSES)
        pic.col_intra = np.repeat(np.repeat(intra_mb, 4, axis=0), 4, axis=1)
        # per-MB 16x16-class for GetColocatedMb's IS_INTER_16x16 test
        # (mv_pred.cpp:341): the stored type is 16x16-class for explicit
        # P/B 16x16 and skip MBs (P_SKIP gains MB_TYPE_16x16 at :334),
        # for intra, and for whole-direct MBs whose promotion fs.mb16
        # recorded during decode.
        # (B_SKIP/B_DIRECT keep their recorded promotion in fs.mb16 —
        # their stored type is only 16x16-class when the promotion was)
        from .framedata import MB_P16x16, MB_PSKIP, MB_B16x16
        explicit16 = np.isin(fs.mb_type, (MB_P16x16, MB_PSKIP, MB_B16x16))
        pic.col_mb16 = fs.mb16 | explicit16 | intra_mb.reshape(-1)

    @staticmethod
    def _crop(sps, st):
        w, h = sps.width, sps.height
        cl, ct = 2 * sps.crop_left, 2 * sps.crop_top
        y = st.y[ct:ct + h, cl:cl + w]
        u = st.u[ct // 2:ct // 2 + h // 2, cl // 2:cl // 2 + w // 2]
        v = st.v[ct // 2:ct // 2 + h // 2, cl // 2:cl // 2 + w // 2]
        return y, u, v


def write_yuv(frames, path):
    with open(path, "wb") as f:
        for fr in frames:
            f.write(fr.y.tobytes())
            f.write(fr.u.tobytes())
            f.write(fr.v.tobytes())
