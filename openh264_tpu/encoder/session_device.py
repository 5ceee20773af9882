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

Constraints of the fast path (falls back to H264Encoder otherwise):
constant QP, CAVLC, single slice, IPPP with dyadic tid 0 only,
deblock idc 0 or 1. Intra-in-P is supported (lax.cond into the I core).
"""

from __future__ import annotations

import functools
import queue
import threading

import numpy as np
import jax
import jax.numpy as jnp

from ..bitstream import BitWriter, make_annexb_nal, NAL_SPS, NAL_PPS, \
    NAL_IDR, NAL_SLICE
from ..tables import CHROMA_QP_TABLE
from .headers import write_pps, write_slice_header, write_sps
from . import core_jax, entropy_jax, deblock_jax

MAX_BYTES = 1 << 17          # 128 KB packed body per frame


@functools.partial(jax.jit, static_argnames=("mb_w", "mb_h", "do_deblock"))
def _step_i(y, u, v, qp, qp_c, start_bit, mb_w, mb_h, do_deblock):
    n_mb = mb_w * mb_h
    out = core_jax.encode_i_frame(y, u, v, qp, qp_c, mb_w=mb_w, mb_h=mb_h)
    av, al = entropy_jax.i_slice_tokens(out, mb_w, mb_h)
    packed, nbits, ovf = entropy_jax.pack_tokens_device(
        av, al, start_bit, MAX_BYTES)
    ry, ru, rv = out["recon_y"], out["recon_u"], out["recon_v"]
    if do_deblock:
        nz = out["luma_ac"].reshape(n_mb, 16, 16).any(2)
        BSV, BSH = deblock_jax.encoder_bs(
            nz, jnp.ones(n_mb, bool), jnp.zeros((n_mb, 2), jnp.int32),
            mb_w, mb_h)
        qp_mb = jnp.full(n_mb, qp, jnp.int32)
        cqp_mb = jnp.full(n_mb, qp_c, jnp.int32)
        ry, ru, rv = deblock_jax.deblock_frame_device(
            ry, ru, rv, BSV, BSH, qp_mb, cqp_mb, mb_w, mb_h)
    return packed, nbits, ovf, ry, ru, rv


@functools.partial(jax.jit, static_argnames=("mb_w", "mb_h", "sr",
                                             "do_deblock", "intra_in_p"))
def _step_p(y, u, v, ry, ru, rv, prev_skip_sad, prev_skip,
            qp, qp_c, start_bit, mb_w, mb_h, sr, do_deblock, intra_in_p):
    n_mb = mb_w * mb_h
    out = core_jax.encode_p_frame(y, u, v, ry, ru, rv, qp, qp_c,
                                  mb_w=mb_w, mb_h=mb_h, sr=sr,
                                  prev_skip_sad=prev_skip_sad,
                                  prev_skip=prev_skip)
    if intra_in_p:
        lam = jnp.maximum(qp - 12, 1).astype(jnp.int32)
        raw = (out["intra_cost_proxy"] + 8 * lam) < out["inter_cost"]
        raw = raw & ~out["skip_mask"]     # promoted skips stay inter
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
    av, al = entropy_jax.p_slice_tokens(sym, mb_w, mb_h, qp)
    packed, nbits, ovf = entropy_jax.pack_tokens_device(
        av, al, start_bit, MAX_BYTES)
    if do_deblock:
        nz = luma_ac.reshape(n_mb, 16, 16).any(2)
        BSV, BSH = deblock_jax.encoder_bs(nz, intra_mask, out["mv"],
                                          mb_w, mb_h)
        qp_mb = jnp.full(n_mb, qp, jnp.int32)
        cqp_mb = jnp.full(n_mb, qp_c, jnp.int32)
        rec_y, rec_u, rec_v = deblock_jax.deblock_frame_device(
            rec_y, rec_u, rec_v, BSV, BSH, qp_mb, cqp_mb, mb_w, mb_h)
    return (packed, nbits, ovf, rec_y, rec_u, rec_v,
            out["skip_sad"], out["skip_mask"])


@functools.partial(jax.jit, static_argnames=("h", "w"))
def _split_frame(buf, h, w):
    """One packed uploaded buffer -> (y, u, v) planes."""
    y = buf[:h * w].reshape(h, w)
    cs = (h // 2) * (w // 2)
    u = buf[h * w:h * w + cs].reshape(h // 2, w // 2)
    v = buf[h * w + cs:h * w + 2 * cs].reshape(h // 2, w // 2)
    return y, u, v


class DeviceSessionEncoder:
    """Constant-QP IPPP CAVLC single-slice encoder, device-resident.

    Use `encode_stream(frames)` for pipelined throughput (uploads run in
    a background thread, packed bodies are fetched in batches), or
    `encode_frame` for the one-frame-in / bytes-out contract (slower:
    two synchronous transfers per frame).
    """

    def __init__(self, cfg, fetch_batch: int = 8):
        from .encoder import H264Encoder  # config validation semantics
        self.cfg = cfg
        if cfg.entropy_cabac or cfg.num_slices != 1 or \
                cfg.temporal_layers > 1 or cfg.rc_mode != -1:
            raise ValueError("DeviceSessionEncoder: fast path supports "
                             "constant-QP CAVLC single-slice IPPP only")
        self.fetch_batch = fetch_batch
        self.frame_num = 0
        self.idr_pic_id = 0
        self.frame_count = 0
        self.qp = cfg.qp
        self.qp_c = int(CHROMA_QP_TABLE[np.clip(
            cfg.qp + cfg.chroma_qp_offset, 0, 51)])
        self._ref = None

    # ------------------------------------------------------------------
    def headers_annexb(self) -> bytes:
        return (make_annexb_nal(3, NAL_SPS, write_sps(self.cfg)) +
                make_annexb_nal(3, NAL_PPS, write_pps(self.cfg)))

    def _slice_header(self, is_idr: bool):
        cfg = self.cfg
        w = BitWriter()
        write_slice_header(w, cfg, 2 if is_idr else 0, self.frame_num, 0,
                           self.qp, is_idr, self.idr_pic_id,
                           disable_deblock=cfg.deblock_idc)
        bits = w.bit_array()
        return np.packbits(bits), len(bits)

    def _launch(self, ybuf):
        """Dispatch the device step for one frame; returns
        (pending record) without any synchronization."""
        cfg = self.cfg
        is_idr = self.frame_count == 0 or (
            cfg.idr_interval > 0 and
            self.frame_count % cfg.idr_interval == 0)
        self.frame_count += 1
        if is_idr:
            self.frame_num = 0
        hdr_bytes, hdr_len = self._slice_header(is_idr)
        if is_idr:
            self.idr_pic_id = (self.idr_pic_id + 1) % 16
        y, u, v = _split_frame(ybuf, cfg.mb_height * 16, cfg.mb_width * 16)
        do_deblock = cfg.deblock_idc != 1
        n_mb = cfg.mb_width * cfg.mb_height
        if is_idr:
            packed, nbits, ovf, ry, ru, rv = _step_i(
                y, u, v, jnp.int32(self.qp), jnp.int32(self.qp_c),
                jnp.int32(hdr_len % 8), cfg.mb_width, cfg.mb_height,
                do_deblock)
            sk_sad = jnp.zeros(n_mb, jnp.int32)
            sk_map = jnp.zeros(n_mb, bool)
        else:
            ry, ru, rv, psad, pskip = self._ref
            packed, nbits, ovf, ry, ru, rv, sk_sad, sk_map = _step_p(
                y, u, v, ry, ru, rv, psad, pskip, jnp.int32(self.qp),
                jnp.int32(self.qp_c), jnp.int32(hdr_len % 8),
                cfg.mb_width, cfg.mb_height, cfg.search_range,
                do_deblock, cfg.enable_intra_in_p)
        self._ref = (ry, ru, rv, sk_sad, sk_map)
        self.frame_num = (self.frame_num + 1) % \
            (1 << self.cfg.log2_max_frame_num)
        return {"is_idr": is_idr, "hdr": hdr_bytes, "hdr_len": hdr_len,
                "packed": packed, "nbits": nbits, "ovf": ovf}

    def _finalize(self, rec, packed_np, nbits, ovf) -> bytes:
        if ovf:
            raise RuntimeError("packed-slice overflow (raise MAX_BYTES)")
        hdr, hdr_len = rec["hdr"], rec["hdr_len"]
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
        nal = make_annexb_nal(3 if rec["is_idr"] else 2,
                              NAL_IDR if rec["is_idr"] else NAL_SLICE,
                              bytes(full))
        prefix = self.headers_annexb() if rec["is_idr"] else b""
        return prefix + nal

    # ------------------------------------------------------------------
    def encode_frame(self, y, u, v) -> bytes:
        """Single-frame contract (2 synchronous transfers/frame)."""
        buf = np.concatenate([np.asarray(y, np.uint8).ravel(),
                              np.asarray(u, np.uint8).ravel(),
                              np.asarray(v, np.uint8).ravel()])
        rec = self._launch(jax.device_put(buf))
        packed = np.asarray(rec["packed"])
        return self._finalize(rec, packed, int(rec["nbits"]),
                              bool(rec["ovf"]))

    def encode_stream(self, frames) -> list[bytes]:
        """Pipelined batch encode. `frames`: iterable of (y, u, v).

        Uploads run on a background thread while the device computes;
        packed bodies are downloaded in batches of `fetch_batch` frames
        as a single stacked transfer.
        """
        q: queue.Queue = queue.Queue(maxsize=4)

        def uploader():
            for f in frames:
                y, u, v = f
                buf = np.concatenate([np.asarray(y, np.uint8).ravel(),
                                      np.asarray(u, np.uint8).ravel(),
                                      np.asarray(v, np.uint8).ravel()])
                q.put(jax.device_put(buf))
            q.put(None)

        t = threading.Thread(target=uploader, daemon=True)
        t.start()
        out: list[bytes] = []
        pending: list[dict] = []
        stats = {"launch_s": 0.0, "fetch_s": 0.0, "finalize_s": 0.0,
                 "wait_input_s": 0.0, "frames": 0}
        import time as _time

        def flush():
            if not pending:
                return
            t0 = _time.perf_counter()
            stacked = jnp.stack([r["packed"] for r in pending])
            meta = jnp.stack([jnp.stack([r["nbits"].astype(jnp.int32),
                                         r["ovf"].astype(jnp.int32)])
                              for r in pending])
            metah = np.asarray(meta)
            stackedh = np.asarray(stacked)
            stats["fetch_s"] += _time.perf_counter() - t0
            t0 = _time.perf_counter()
            for i, r in enumerate(pending):
                out.append(self._finalize(r, stackedh[i],
                                          int(metah[i, 0]),
                                          bool(metah[i, 1])))
            stats["finalize_s"] += _time.perf_counter() - t0
            pending.clear()

        while True:
            t0 = _time.perf_counter()
            buf = q.get()
            stats["wait_input_s"] += _time.perf_counter() - t0
            if buf is None:
                break
            t0 = _time.perf_counter()
            pending.append(self._launch(buf))
            stats["launch_s"] += _time.perf_counter() - t0
            stats["frames"] += 1
            if len(pending) >= self.fetch_batch:
                flush()
        flush()
        t.join()
        self.last_stats = stats
        return out
