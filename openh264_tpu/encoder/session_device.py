"""Device-resident encoder session: the TPU fast path.

The tunnel to the TPU costs ~25 ms per transfer and ~30 MB/s, so the
per-frame host round trips of the classic session (symbols down, refs
up) cap 720p at well under 1 fps regardless of core speed. This
session keeps EVERYTHING on device between frames:

  input frame (one packed upload) -> P/I core -> CAVLC tokenize ->
  bit pack -> deblock -> reference planes stay device-resident

and the only per-frame download is the packed slice body (fetched in
batches of several frames as one transfer). The host contributes the
slice headers (a few dozen bits, written before the step so the device
packs the body at the right bit offset), NAL framing, and emulation
prevention — the same split the reference makes between its MB engine
and WelsEncodeNal (nal_encap.cpp:120).

Fast-path feature matrix (reference WelsEncoderEncodeExt feature
dispatch, encoder_ext.cpp:3441):
  - CAVLC entropy (CABAC falls back to the host H264Encoder)
  - constant QP or frame-level rate control (modes 0/1/2). RC bits
    feedback arrives with the batched body download, so the R-QP model
    runs up to `fetch_batch` frames behind real time — the TPU-native
    trade for not synchronizing the pipeline every frame.
  - dyadic temporal layers 1..4 with a device-resident mini-DPB
    (ref planes never leave the chip; ref_pic_list reorder commands
    are written by the host, ref_list_mgr_svc.cpp WelsBuildRefList).
  - multi-slice (SM_FIXEDSLCNUM row bands): ONE full-frame core pass,
    then per-band tokenize+pack (entropy/MVP/skip contexts band-local,
    matching slice semantics), then one frame-wide deblock.
  - deblock idc 0/1/2 (2 = skip filtering across slice boundaries).
  - packed-slice overflow never raises: the token grids stay resident
    until the body is fetched, and an overflowing slice is repacked
    on device into a doubled buffer (reference analog: the CAVLC
    buffer-overflow re-encode, svc_encode_slice.cpp:564-576
    TRY_REENCODING — ours is cheaper: only the pack re-runs).
"""

from __future__ import annotations

import functools
import queue
import threading
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..bitstream import BitWriter, make_annexb_nal, NAL_SPS, NAL_PPS, \
    NAL_IDR, NAL_SLICE
from ..tables import CHROMA_QP_TABLE
from .headers import write_pps, write_slice_header, write_sps
from .ratectl import RateControl, RC_OFF_MODE
from . import core_jax, entropy_jax, deblock_jax

MAX_BYTES = 1 << 17          # 128 KB packed body per slice (default)
MAX_TOK = 1 << 18


def _p_symbols(y, u, v, ry, ru, rv, prev_skip_sad, prev_skip, qp, qp_c,
               mb_w, mb_h, sr, intra_in_p, intra_allowed=None):
    """P core + intra-in-P fold: shared by the fused single-slice step
    and the multi-slice core. Returns (sym, rec_y, rec_u, rec_v,
    skip_sad, skip_mask); recon is pre-deblock."""
    n_mb = mb_w * mb_h
    out = core_jax.encode_p_frame(y, u, v, ry, ru, rv, qp, qp_c,
                                  mb_w=mb_w, mb_h=mb_h, sr=sr,
                                  prev_skip_sad=prev_skip_sad,
                                  prev_skip=prev_skip)
    if intra_in_p:
        lam = jnp.maximum(qp - 12, 1).astype(jnp.int32)
        raw = (out["intra_cost_proxy"] + 8 * lam) < out["inter_cost"]
        raw = raw & ~out["skip_mask"]     # promoted skips stay inter
        if intra_allowed is not None:
            raw = raw & intra_allowed
        intra_mask = core_jax.chainfree_intra_mask(raw, mb_w, mb_h)
        # chain-free mask -> the masked intra pass is one batched shot
        # (a lax.cond into the wavefront I-core costs ~50 ms even when
        # the branch is not taken; this constant pass is ~2 ms)
        iout = core_jax.encode_i16_flat(
            y, u, v, qp, qp_c, mb_w=mb_w, mb_h=mb_h,
            intra_mask=intra_mask,
            init_recon=(out["recon_y"], out["recon_u"], out["recon_v"]))
        m = intra_mask
        rec_y, rec_u, rec_v = (iout["recon_y"], iout["recon_u"],
                               iout["recon_v"])
        luma_ac = jnp.where(m[:, None, None], iout["luma_ac"],
                            out["luma_ac"])
        chroma_dc = jnp.where(m[:, None, None], iout["chroma_dc"],
                              out["chroma_dc"])
        chroma_ac = jnp.where(m[:, None, None, None], iout["chroma_ac"],
                              out["chroma_ac"])
        i16_mode, chroma_mode, luma_dc = (iout["i16_mode"],
                                          iout["chroma_mode"],
                                          iout["luma_dc"])
    else:
        intra_mask = jnp.zeros(n_mb, bool)
        rec_y, rec_u, rec_v = (out["recon_y"], out["recon_u"],
                               out["recon_v"])
        luma_ac, chroma_dc, chroma_ac = (out["luma_ac"], out["chroma_dc"],
                                         out["chroma_ac"])
        i16_mode = chroma_mode = jnp.zeros(n_mb, jnp.int32)
        luma_dc = jnp.zeros((n_mb, 4, 4), jnp.int32)

    sym = {"mv": out["mv"], "luma_ac": luma_ac, "chroma_dc": chroma_dc,
           "chroma_ac": chroma_ac, "intra_mask": intra_mask,
           "i16_mode": i16_mode, "chroma_mode": chroma_mode,
           "luma_dc": luma_dc}
    return sym, rec_y, rec_u, rec_v, out["skip_sad"], out["skip_mask"]


@functools.partial(jax.jit, static_argnames=("mb_w", "mb_h", "do_deblock",
                                             "max_bytes"))
def _step_i(y, u, v, qp, qp_c, start_bit, mb_w, mb_h, do_deblock,
            max_bytes=MAX_BYTES):
    n_mb = mb_w * mb_h
    out = core_jax.encode_i_frame(y, u, v, qp, qp_c, mb_w=mb_w, mb_h=mb_h)
    av, al = entropy_jax.i_slice_tokens(out, mb_w, mb_h)
    packed, nbits, ovf = entropy_jax.pack_tokens_device(
        av, al, start_bit, max_bytes)
    ry, ru, rv = out["recon_y"], out["recon_u"], out["recon_v"]
    if do_deblock:
        nz = out["luma_ac"].reshape(n_mb, 16, 16).any(2)
        BSV, BSH = deblock_jax.encoder_bs(
            nz, jnp.ones(n_mb, bool), jnp.zeros((n_mb, 2), jnp.int32),
            mb_w, mb_h)
        qp_mb = jnp.full(n_mb, qp, jnp.int32)
        cqp_mb = jnp.full(n_mb, qp_c, jnp.int32)
        ry, ru, rv = deblock_jax.deblock_frame_auto(
            ry, ru, rv, BSV, BSH, qp_mb, cqp_mb, mb_w, mb_h)
    return packed, nbits, ovf, ry, ru, rv, av, al


@functools.partial(jax.jit, static_argnames=("mb_w", "mb_h", "sr",
                                             "do_deblock", "intra_in_p",
                                             "max_bytes"))
def _step_p(y, u, v, ry, ru, rv, prev_skip_sad, prev_skip,
            qp, qp_c, start_bit, mb_w, mb_h, sr, do_deblock, intra_in_p,
            max_bytes=MAX_BYTES):
    n_mb = mb_w * mb_h
    sym, rec_y, rec_u, rec_v, skip_sad, skip_mask = _p_symbols(
        y, u, v, ry, ru, rv, prev_skip_sad, prev_skip, qp, qp_c,
        mb_w, mb_h, sr, intra_in_p)
    av, al = entropy_jax.p_slice_tokens(sym, mb_w, mb_h, qp)
    packed, nbits, ovf = entropy_jax.pack_tokens_device(
        av, al, start_bit, max_bytes)
    if do_deblock:
        nz = sym["luma_ac"].reshape(n_mb, 16, 16).any(2)
        BSV, BSH = deblock_jax.encoder_bs(nz, sym["intra_mask"], sym["mv"],
                                          mb_w, mb_h)
        qp_mb = jnp.full(n_mb, qp, jnp.int32)
        cqp_mb = jnp.full(n_mb, qp_c, jnp.int32)
        rec_y, rec_u, rec_v = deblock_jax.deblock_frame_auto(
            rec_y, rec_u, rec_v, BSV, BSH, qp_mb, cqp_mb, mb_w, mb_h)
    return (packed, nbits, ovf, rec_y, rec_u, rec_v,
            skip_sad, skip_mask, av, al)


@functools.partial(jax.jit, static_argnames=("max_bytes", "max_tok"))
def _repack(av, al, start_bit, max_bytes, max_tok):
    """Overflow recovery: re-pack resident token grids into a bigger
    buffer (only the packer re-runs, not the core)."""
    return entropy_jax.pack_tokens_device(av, al, start_bit, max_bytes,
                                          max_tok)


# ---------------------------------------------------------------------------
# Multi-slice steps: one full-frame core, per-band entropy, frame deblock
# ---------------------------------------------------------------------------
@functools.partial(jax.jit, static_argnames=("mb_w", "mb_h", "sr",
                                             "intra_in_p"))
def _core_p_ms(y, u, v, ry, ru, rv, prev_skip_sad, prev_skip, qp, qp_c,
               intra_allowed, mb_w, mb_h, sr, intra_in_p):
    sym, rec_y, rec_u, rec_v, skip_sad, skip_mask = _p_symbols(
        y, u, v, ry, ru, rv, prev_skip_sad, prev_skip, qp, qp_c,
        mb_w, mb_h, sr, intra_in_p, intra_allowed=intra_allowed)
    return sym, rec_y, rec_u, rec_v, skip_sad, skip_mask


@functools.partial(jax.jit, static_argnames=(
    "mb_w", "mb_h", "sr", "intra_in_p", "B", "n_bands", "max_bytes",
    "do_deblock", "zero_bsh_rows"))
def _step_p_ms(y, u, v, ry, ru, rv, prev_skip_sad, prev_skip, qp, qp_c,
               intra_allowed, idx, n_valid, start_bits,
               mb_w, mb_h, sr, intra_in_p, B, n_bands, max_bytes,
               do_deblock, zero_bsh_rows):
    """Fused multi-slice P step: full-frame core + batched per-band
    entropy + frame-wide deblock in ONE dispatch (three chained jits
    measured ~40% slower end-to-end on the tunnel)."""
    n_mb = mb_w * mb_h
    sym, rec_y, rec_u, rec_v, skip_sad, skip_mask = _p_symbols(
        y, u, v, ry, ru, rv, prev_skip_sad, prev_skip, qp, qp_c,
        mb_w, mb_h, sr, intra_in_p, intra_allowed=intra_allowed)
    packed, nbits, ovf, av, al = _tok_p_bands.__wrapped__(
        sym, idx, n_valid, qp, start_bits, mb_w, B, n_bands, max_bytes)
    if do_deblock:
        nz = sym["luma_ac"].reshape(n_mb, 16, 16).any(2)
        rec_y, rec_u, rec_v = _deblock_ms.__wrapped__(
            rec_y, rec_u, rec_v, nz, sym["intra_mask"], sym["mv"],
            qp, qp_c, mb_w, mb_h, zero_bsh_rows)
    return (packed, nbits, ovf, av, al, rec_y, rec_u, rec_v,
            skip_sad, skip_mask)


@functools.partial(jax.jit, static_argnames=("mb_w", "B", "n_bands",
                                             "max_bytes"))
def _tok_p_bands(sym, idx, n_valid, qp, start_bits, mb_w, B, n_bands,
                 max_bytes):
    """Tokenize + pack ALL slice bands of a P frame in one vmapped
    call. Entropy contexts (nC, MVP, skip runs) are band-local by
    construction — each band grid has no rows above its own top, which
    is exactly H.264 slice availability. Unequal band heights are
    padded to B rows; `n_valid` masks the padding out of the token
    stream (p_slice_tokens n_valid)."""
    bsym = {k: jnp.take(a, idx.reshape(-1), axis=0).reshape(
        (n_bands, B * mb_w) + a.shape[1:]) for k, a in sym.items()}

    def one(band, nv, sb):
        av, al = entropy_jax.p_slice_tokens(band, mb_w, B, qp,
                                            n_valid=nv)
        packed, nbits, ovf = entropy_jax.pack_tokens_device(
            av, al, sb, max_bytes)
        return packed, nbits, ovf, av, al

    return jax.vmap(one)(bsym, n_valid, start_bits)


@functools.partial(jax.jit, static_argnames=("mb_w", "band_h", "max_bytes"))
def _step_i_band(y, u, v, qp, qp_c, start_bit, r0, mb_w, band_h, max_bytes):
    """One IDR slice band: band-local intra core (slice availability)
    + tokenize + pack. Returns band recon (pre-deblock) + nz for bS."""
    yb = jax.lax.dynamic_slice_in_dim(y, r0 * 16, band_h * 16, 0)
    ub = jax.lax.dynamic_slice_in_dim(u, r0 * 8, band_h * 8, 0)
    vb = jax.lax.dynamic_slice_in_dim(v, r0 * 8, band_h * 8, 0)
    out = core_jax.encode_i_frame(yb, ub, vb, qp, qp_c,
                                  mb_w=mb_w, mb_h=band_h)
    av, al = entropy_jax.i_slice_tokens(out, mb_w, band_h)
    packed, nbits, ovf = entropy_jax.pack_tokens_device(
        av, al, start_bit, max_bytes)
    nz = out["luma_ac"].reshape(band_h * mb_w, 16, 16).any(2)
    return (packed, nbits, ovf, out["recon_y"], out["recon_u"],
            out["recon_v"], nz, av, al)


@functools.partial(jax.jit, static_argnames=("mb_w", "mb_h",
                                             "zero_bsh_rows"))
def _deblock_ms(rec_y, rec_u, rec_v, nz, intra_mask, mv, qp, qp_c,
                mb_w, mb_h, zero_bsh_rows=()):
    """Frame-wide in-loop filter after a multi-slice encode.
    zero_bsh_rows: band-top MB rows whose horizontal MB edge must NOT
    be filtered (deblock idc 2 = on except slice boundaries,
    SliceHeader disable_deblocking_filter_idc semantics)."""
    n_mb = mb_w * mb_h
    BSV, BSH = deblock_jax.encoder_bs(nz, intra_mask, mv, mb_w, mb_h)
    for r in zero_bsh_rows:
        BSH = BSH.at[4 * r, :].set(0)
    qp_mb = jnp.full(n_mb, qp, jnp.int32)
    cqp_mb = jnp.full(n_mb, qp_c, jnp.int32)
    return deblock_jax.deblock_frame_auto(
        rec_y, rec_u, rec_v, BSV, BSH, qp_mb, cqp_mb, mb_w, mb_h)


@functools.partial(jax.jit, static_argnames=("h", "w"))
def _split_frame(buf, h, w):
    """One packed uploaded buffer -> (y, u, v) planes."""
    y = buf[:h * w].reshape(h, w)
    cs = (h // 2) * (w // 2)
    u = buf[h * w:h * w + cs].reshape(h // 2, w // 2)
    v = buf[h * w + cs:h * w + 2 * cs].reshape(h // 2, w // 2)
    return y, u, v


@dataclass
class _DevRef:
    """Device-resident DPB record (SPicture analog; planes never leave
    the chip)."""
    frame_num: int
    coding_idx: int
    temporal_id: int
    planes: tuple          # (y, u, v) deblocked recon, device arrays
    skip_sad: object
    skip_map: object


class DeviceSessionEncoder:
    """CAVLC encoder with the whole per-frame pipeline device-resident.

    Use `encode_stream(frames)` for pipelined throughput (uploads run in
    a background thread, packed bodies are fetched in batches), or
    `encode_frame` for the one-frame-in / bytes-out contract (slower:
    two synchronous transfers per frame).
    """

    def __init__(self, cfg, fetch_batch: int = 8,
                 max_body_bytes: int = MAX_BYTES):
        self.cfg = cfg
        if cfg.entropy_cabac:
            raise ValueError("DeviceSessionEncoder: CAVLC only "
                             "(CABAC runs on the host H264Encoder)")
        if not (1 <= cfg.temporal_layers <= 4):
            raise ValueError("temporal_layers must be 1..4")
        if cfg.temporal_layers > 1:
            cfg.num_ref_frames = max(cfg.num_ref_frames,
                                     1 << max(0, cfg.temporal_layers - 2))
        # frame-level RC only: with a lagged feedback loop the model is
        # per-frame; AQ/GOM per-MB QP stays on the host path
        self.rc = None
        if cfg.rc_mode != RC_OFF_MODE:
            self.rc = RateControl(cfg.rc_mode, cfg.target_bitrate,
                                  cfg.max_frame_rate, cfg.qp,
                                  cfg.min_qp, cfg.max_qp,
                                  cfg.enable_frame_skip,
                                  n_pixels=cfg.width * cfg.height,
                                  honor_init_qp=cfg.rc_honor_init_qp,
                                  max_bitrate=cfg.max_bitrate)
        self.fetch_batch = fetch_batch
        self.max_body_bytes = max_body_bytes
        # adaptive download window: bodies are usually a few KB while
        # the packed buffer is max_body_bytes — fetching the whole
        # buffer wastes most of the ~30 MB/s tunnel. Grows to 2x the
        # largest body seen; frames that overrun it re-fetch in full.
        self._fetch_window = min(1 << 14, max_body_bytes)
        self.frame_num = 0
        self.idr_pic_id = 0
        self.frame_count = 0
        self.coding_idx = 0
        self.qp = cfg.qp
        self.dpb: list[_DevRef] = []
        self._bands = self._band_rows()
        # padded band->global MB index map for the batched tokenizer
        if len(self._bands) > 1:
            B = max(r1 - r0 for r0, r1 in self._bands)
            mbw = cfg.mb_width
            idx = np.zeros((len(self._bands), B * mbw), np.int32)
            nv = np.zeros(len(self._bands), np.int32)
            for i, (r0, r1) in enumerate(self._bands):
                h = r1 - r0
                rows = np.arange(B * mbw) + r0 * mbw
                idx[i] = np.clip(rows, 0, cfg.mb_width * cfg.mb_height - 1)
                nv[i] = h * mbw
            self._band_B = B
            self._band_idx = jnp.asarray(idx)
            self._band_nvalid = jnp.asarray(nv)
        self.last_stats = {}

    # ------------------------------------------------------------------
    def _band_rows(self):
        cfg = self.cfg
        n = min(max(1, cfg.num_slices), cfg.mb_height)
        base, extra = divmod(cfg.mb_height, n)
        rows, r0 = [], 0
        for s in range(n):
            r1 = r0 + base + (1 if s < extra else 0)
            rows.append((r0, r1))
            r0 = r1
        return rows

    def headers_annexb(self) -> bytes:
        return (make_annexb_nal(3, NAL_SPS, write_sps(self.cfg)) +
                make_annexb_nal(3, NAL_PPS, write_pps(self.cfg)))

    def _slice_header(self, is_idr: bool, qp: int, first_mb: int = 0,
                      is_ref: bool = True, reorder=None):
        cfg = self.cfg
        w = BitWriter()
        write_slice_header(w, cfg, 2 if is_idr else 0, self.frame_num,
                           first_mb, qp, is_idr, self.idr_pic_id,
                           disable_deblock=cfg.deblock_idc,
                           is_ref=is_ref, reorder_abs_diff=reorder)
        bits = w.bit_array()
        return np.packbits(bits), len(bits)

    def _temporal_id(self) -> int:
        t = self.cfg.temporal_layers
        if t <= 1:
            return 0
        gop = 1 << (t - 1)
        i = self.coding_idx % gop
        if i == 0:
            return 0
        return t - 1 - (i & -i).bit_length() + 1

    def _pick_ref(self, tid: int) -> _DevRef:
        cands = [e for e in self.dpb if e.temporal_id < max(1, tid)]
        return max(cands, key=lambda e: e.coding_idx)

    def _reorder_cmd(self, ref: _DevRef):
        """abs_diff_pic_num_minus1 when `ref` isn't already first in the
        default P list (§8.2.4.2.1 descending-PicNum order)."""
        mx = 1 << self.cfg.log2_max_frame_num
        cur = self.frame_num

        def picnum(fn):
            return fn if fn <= cur else fn - mx
        default = sorted((e.frame_num for e in self.dpb),
                         key=picnum, reverse=True)
        if default and default[0] == ref.frame_num:
            return None
        return (cur - ref.frame_num + mx) % mx - 1

    # ------------------------------------------------------------------
    def _launch(self, ybuf):
        """Dispatch the device step(s) for one frame without any
        synchronization; returns a pending record, or None when rate
        control skips the frame."""
        cfg = self.cfg
        is_idr = self.frame_count == 0 or (
            cfg.idr_interval > 0 and
            self.frame_count % cfg.idr_interval == 0)
        self.frame_count += 1
        if self.rc is not None and not is_idr and self.rc.should_skip():
            self.rc.skipped()
            return None
        tid = 0 if is_idr else self._temporal_id()
        qp = (self.rc.frame_qp(is_idr, tid) if self.rc is not None
              else cfg.qp)
        self.qp = qp
        qp_c = int(CHROMA_QP_TABLE[np.clip(qp + cfg.chroma_qp_offset,
                                           0, 51)])
        is_ref = is_idr or cfg.temporal_layers <= 1 or \
            tid < cfg.temporal_layers - 1
        y, u, v = _split_frame(ybuf, cfg.mb_height * 16, cfg.mb_width * 16)
        if is_idr:
            self.frame_num = 0
            self.coding_idx = 0
            self.dpb.clear()
        if len(self._bands) == 1:
            rec = self._launch_single(y, u, v, is_idr, is_ref, tid, qp,
                                      qp_c)
        else:
            rec = self._launch_multislice(y, u, v, is_idr, is_ref, tid,
                                          qp, qp_c)
        if is_idr:
            self.idr_pic_id = (self.idr_pic_id + 1) % 16
        if is_ref:
            if len(self.dpb) >= cfg.num_ref_frames:
                self.dpb.pop(0)   # sliding window: oldest out
            self.dpb.append(self._pending_ref)
            self.frame_num = (self.frame_num + 1) % \
                (1 << cfg.log2_max_frame_num)
        self.coding_idx += 1
        rec.update({"is_idr": is_idr, "is_ref": is_ref, "qp": qp})
        return rec

    def _launch_single(self, y, u, v, is_idr, is_ref, tid, qp, qp_c):
        cfg = self.cfg
        do_deblock = cfg.deblock_idc != 1
        n_mb = cfg.mb_width * cfg.mb_height
        mb = self.max_body_bytes
        if is_idr:
            hdr, hdr_len = self._slice_header(True, qp)
            packed, nbits, ovf, ry, ru, rv, av, al = _step_i(
                y, u, v, jnp.int32(qp), jnp.int32(qp_c),
                jnp.int32(hdr_len % 8), cfg.mb_width, cfg.mb_height,
                do_deblock, mb)
            sk_sad = jnp.zeros(n_mb, jnp.int32)
            sk_map = jnp.zeros(n_mb, bool)
        else:
            ref = self._pick_ref(tid)
            hdr, hdr_len = self._slice_header(
                False, qp, is_ref=is_ref, reorder=self._reorder_cmd(ref))
            ry0, ru0, rv0 = ref.planes
            psad = (ref.skip_sad if ref.skip_sad is not None
                    else jnp.zeros(n_mb, jnp.int32))
            pskip = (ref.skip_map if ref.skip_map is not None
                     else jnp.zeros(n_mb, bool))
            packed, nbits, ovf, ry, ru, rv, sk_sad, sk_map, av, al = \
                _step_p(y, u, v, ry0, ru0, rv0, psad, pskip,
                        jnp.int32(qp), jnp.int32(qp_c),
                        jnp.int32(hdr_len % 8), cfg.mb_width,
                        cfg.mb_height, cfg.search_range, do_deblock,
                        cfg.enable_intra_in_p, mb)
        self._pending_ref = _DevRef(self.frame_num, self.coding_idx, tid,
                                    (ry, ru, rv), sk_sad, sk_map)
        return {"slices": [{"hdr": hdr, "hdr_len": hdr_len,
                            "packed": packed, "nbits": nbits, "ovf": ovf,
                            "av": av, "al": al,
                            "start_bit": hdr_len % 8}]}

    def _launch_multislice(self, y, u, v, is_idr, is_ref, tid, qp, qp_c):
        cfg = self.cfg
        mb_w, mb_h = cfg.mb_width, cfg.mb_height
        n_mb = mb_w * mb_h
        mb = self.max_body_bytes
        bands = self._bands
        slices = []
        if is_idr:
            recs_y, recs_u, recs_v, nzs = [], [], [], []
            for (r0, r1) in bands:
                hdr, hdr_len = self._slice_header(True, qp,
                                                  first_mb=r0 * mb_w)
                packed, nbits, ovf, by, bu, bv, nz, av, al = _step_i_band(
                    y, u, v, jnp.int32(qp), jnp.int32(qp_c),
                    jnp.int32(hdr_len % 8), jnp.int32(r0), mb_w, r1 - r0,
                    mb)
                slices.append({"hdr": hdr, "hdr_len": hdr_len,
                               "packed": packed, "nbits": nbits,
                               "ovf": ovf, "av": av, "al": al,
                               "start_bit": hdr_len % 8})
                recs_y.append(by)
                recs_u.append(bu)
                recs_v.append(bv)
                nzs.append(nz)
            rec_y = jnp.concatenate(recs_y, 0)
            rec_u = jnp.concatenate(recs_u, 0)
            rec_v = jnp.concatenate(recs_v, 0)
            nz = jnp.concatenate(nzs, 0)
            intra_mask = jnp.ones(n_mb, bool)
            mv = jnp.zeros((n_mb, 2), jnp.int32)
            sk_sad = jnp.zeros(n_mb, jnp.int32)
            sk_map = jnp.zeros(n_mb, bool)
        else:
            ref = self._pick_ref(tid)
            reorder = self._reorder_cmd(ref)
            ry0, ru0, rv0 = ref.planes
            psad = (ref.skip_sad if ref.skip_sad is not None
                    else jnp.zeros(n_mb, jnp.int32))
            pskip = (ref.skip_map if ref.skip_map is not None
                     else jnp.zeros(n_mb, bool))
            # intra-in-P must not predict across a slice boundary: ban
            # intra on every band-top row except the picture top
            allowed = np.ones(n_mb, bool)
            for (r0, _r1) in bands[1:]:
                allowed[r0 * mb_w:(r0 + 1) * mb_w] = False
            hdrs = []
            for (r0, r1) in bands:
                hdrs.append(self._slice_header(
                    False, qp, first_mb=r0 * mb_w, is_ref=is_ref,
                    reorder=reorder))
            sbs = jnp.asarray([hl % 8 for _h, hl in hdrs], jnp.int32)
            zero_rows = (tuple(r0 for r0, _ in bands[1:])
                         if cfg.deblock_idc == 2 else ())
            (packed, nbits, ovf, av, al, rec_y, rec_u, rec_v,
             sk_sad, sk_map) = _step_p_ms(
                y, u, v, ry0, ru0, rv0, psad, pskip,
                jnp.int32(qp), jnp.int32(qp_c), jnp.asarray(allowed),
                self._band_idx, self._band_nvalid, sbs,
                mb_w, mb_h, cfg.search_range, cfg.enable_intra_in_p,
                self._band_B, len(bands), mb, cfg.deblock_idc != 1,
                zero_rows)
            for i, (hdr, hdr_len) in enumerate(hdrs):
                slices.append({"hdr": hdr, "hdr_len": hdr_len,
                               "packed": packed[i], "nbits": nbits[i],
                               "ovf": ovf[i], "av": av[i], "al": al[i],
                               "start_bit": hdr_len % 8})
            self._pending_ref = _DevRef(self.frame_num, self.coding_idx,
                                        tid, (rec_y, rec_u, rec_v),
                                        sk_sad, sk_map)
            return {"slices": slices}
        if cfg.deblock_idc != 1:
            zero_rows = (tuple(r0 for r0, _ in bands[1:])
                         if cfg.deblock_idc == 2 else ())
            rec_y, rec_u, rec_v = _deblock_ms(
                rec_y, rec_u, rec_v, nz, intra_mask, mv,
                jnp.int32(qp), jnp.int32(qp_c), mb_w, mb_h, zero_rows)
        self._pending_ref = _DevRef(self.frame_num, self.coding_idx, tid,
                                    (rec_y, rec_u, rec_v), sk_sad, sk_map)
        return {"slices": slices}

    # ------------------------------------------------------------------
    def _finalize_slice(self, sl, packed_np, nbits, ovf) -> bytes:
        mb, mt = self.max_body_bytes, MAX_TOK
        while ovf:
            # repack the resident token grid into a doubled buffer
            # (TRY_REENCODING analog, svc_encode_slice.cpp:564-576)
            mb, mt = mb * 2, mt * 2
            if mb > (1 << 24):
                raise RuntimeError("slice body exceeds 16 MB")
            packed_d, nbits_d, ovf_d = _repack(
                sl["av"], sl["al"], jnp.int32(sl["start_bit"]), mb, mt)
            packed_np = np.asarray(packed_d)
            nbits, ovf = int(nbits_d), bool(ovf_d)
        hdr, hdr_len = sl["hdr"], sl["hdr_len"]
        nbits = int(nbits)               # end bit, pre-stop-bit
        nbytes = (nbits + 1 + 7) // 8    # + rbsp stop bit
        body = bytearray(packed_np[:nbytes].tobytes())
        body[nbits // 8] |= 0x80 >> (nbits % 8)
        full = bytearray(hdr[:hdr_len // 8].tobytes())
        if hdr_len % 8:
            full.append(int(hdr[hdr_len // 8]) | body[0])
            full += body[1:]
        else:
            full += body
        return bytes(full)

    def _finalize(self, rec, bodies) -> bytes:
        """bodies: list of (packed_np, nbits, ovf) per slice."""
        is_idr, is_ref = rec["is_idr"], rec["is_ref"]
        nri = 3 if is_idr else (2 if is_ref else 0)
        ntype = NAL_IDR if is_idr else NAL_SLICE
        nals = [make_annexb_nal(nri, ntype,
                                self._finalize_slice(sl, *b))
                for sl, b in zip(rec["slices"], bodies)]
        prefix = self.headers_annexb() if is_idr else b""
        bs = prefix + b"".join(nals)
        if self.rc is not None:
            self.rc.update(8 * len(bs), rec["qp"], is_idr)
        return bs

    # ------------------------------------------------------------------
    def encode_frame(self, y, u, v) -> bytes:
        """Single-frame contract (2 synchronous transfers/frame).
        Returns b"" when rate control skips the frame."""
        buf = np.concatenate([np.asarray(y, np.uint8).ravel(),
                              np.asarray(u, np.uint8).ravel(),
                              np.asarray(v, np.uint8).ravel()])
        rec = self._launch(jax.device_put(buf))
        if rec is None:
            return b""
        bodies = [(np.asarray(sl["packed"]), int(sl["nbits"]),
                   bool(sl["ovf"])) for sl in rec["slices"]]
        return self._finalize(rec, bodies)

    def encode_stream(self, frames) -> list[bytes]:
        """Pipelined batch encode. `frames`: iterable of (y, u, v).

        Uploads run on a background thread while the device computes;
        packed bodies are downloaded in batches of `fetch_batch` frames
        as a single stacked transfer. Under rate control the bits
        feedback therefore lags by up to `fetch_batch` frames.
        """
        q: queue.Queue = queue.Queue(maxsize=8)

        def uploader():
            # frames ship in stacks of 4: one tunnel round trip instead
            # of four (the ~25 ms/transfer latency dominates small
            # uploads); per-frame rows are sliced back out on device
            batch = []

            def ship():
                if not batch:
                    return
                dev = jax.device_put(np.stack(batch))
                for i in range(len(batch)):
                    q.put(dev[i])
                batch.clear()

            for f in frames:
                y, u, v = f
                batch.append(np.concatenate(
                    [np.asarray(y, np.uint8).ravel(),
                     np.asarray(u, np.uint8).ravel(),
                     np.asarray(v, np.uint8).ravel()]))
                if len(batch) >= 4:
                    ship()
            ship()
            q.put(None)

        t = threading.Thread(target=uploader, daemon=True)
        t.start()
        out: list[bytes] = []
        pending: list = []      # (position, rec)
        stats = {"launch_s": 0.0, "fetch_s": 0.0, "finalize_s": 0.0,
                 "wait_input_s": 0.0, "frames": 0}
        import time as _time

        def flush():
            if not pending:
                return
            t0 = _time.perf_counter()
            fw = self._fetch_window
            sls = [sl for _pos, r in pending for sl in r["slices"]]
            stacked = jnp.stack([sl["packed"][:fw] for sl in sls])
            meta = jnp.stack([jnp.stack([sl["nbits"].astype(jnp.int32),
                                         sl["ovf"].astype(jnp.int32)])
                              for sl in sls])
            metah = np.asarray(meta)
            stackedh = np.asarray(stacked)
            need = [(int(m[0]) + 8) // 8 + 8 for m in metah]
            # power-of-two growth: a changed window size means a new
            # stacked-slice executable, so keep the set of sizes tiny
            want = max([self._fetch_window] + [2 * n for n in need])
            self._fetch_window = min(self.max_body_bytes,
                                     1 << (want - 1).bit_length())
            stats["fetch_s"] += _time.perf_counter() - t0
            t0 = _time.perf_counter()
            k = 0
            for pos, r in pending:
                bodies = []
                for sl in r["slices"]:
                    body = stackedh[k]
                    if need[k] > fw and not metah[k, 1]:
                        # body overran the fetch window: pull it whole
                        body = np.asarray(sl["packed"])
                    bodies.append((body, int(metah[k, 0]),
                                   bool(metah[k, 1])))
                    k += 1
                out[pos] = self._finalize(r, bodies)
            stats["finalize_s"] += _time.perf_counter() - t0
            pending.clear()

        while True:
            t0 = _time.perf_counter()
            buf = q.get()
            stats["wait_input_s"] += _time.perf_counter() - t0
            if buf is None:
                break
            t0 = _time.perf_counter()
            rec = self._launch(buf)
            stats["launch_s"] += _time.perf_counter() - t0
            stats["frames"] += 1
            if rec is None:
                out.append(b"")       # RC frame skip
                continue
            out.append(b"")           # placeholder, filled by flush
            pending.append((len(out) - 1, rec))
            # under rate control the first flushes are small so the
            # R-QP model gets bits feedback before the pipeline widens
            # to the steady-state batch
            batch = self.fetch_batch
            if self.rc is not None and stats["frames"] <= batch:
                batch = max(2, batch // 4)
            if len(pending) >= batch:
                flush()
        flush()
        t.join()
        self.last_stats = stats
        return out
