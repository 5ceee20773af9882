"""Native host kernels (C, built on first import, ctypes-bound).

Python/numpy fallbacks are used automatically when no C compiler is
available; everything here has an exact-twin numpy implementation that
the tests compare against.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRCS = [os.path.join(_HERE, "codec_native.c"),
         os.path.join(_HERE, "parse_cavlc.c"),
         os.path.join(_HERE, "recon_intra.c"),
         os.path.join(_HERE, "enc_intra.c"),
         os.path.join(_HERE, "cabac_residual.c")]

_lib = None


def _build() -> str | None:
    so = os.path.join(_HERE, "codec_native.so")
    try:
        src_mtime = max(os.path.getmtime(s) for s in _SRCS)
        if not os.path.exists(so) or os.path.getmtime(so) < src_mtime:
            with tempfile.NamedTemporaryFile(
                    suffix=".so", dir=_HERE, delete=False) as tmp:
                tmppath = tmp.name
            r = subprocess.run(
                ["cc", "-O3", "-shared", "-fPIC", "-o", tmppath] + _SRCS,
                capture_output=True, timeout=120)
            if r.returncode != 0:
                os.unlink(tmppath)
                return None
            os.replace(tmppath, so)  # atomic wrt concurrent importers
        return so
    except (OSError, subprocess.SubprocessError):
        return None


def get_lib():
    global _lib
    if _lib is None:
        so = _build()
        if so is None:
            _lib = False
            return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            # stale/foreign-arch .so: fall back to the numpy twins
            _lib = False
            return None
        lib.bitpack.restype = ctypes.c_size_t
        lib.bitpack.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t,
            ctypes.c_void_p, ctypes.c_size_t]
        lib.deblock_frame_c.restype = None
        lib.deblock_frame_c.argtypes = [ctypes.c_void_p] * 3 + \
            [ctypes.c_int] * 2 + [ctypes.c_void_p] * 13 + [ctypes.c_int] * 2
        lib.parse_cavlc_slice.restype = ctypes.c_int
        lib.parse_cavlc_slice.argtypes = [ctypes.c_void_p] * 3
        lib.recon_intra_mbs.restype = None
        lib.recon_intra_mbs.argtypes = [ctypes.c_void_p] * 2
        lib.enc_intra_frame.restype = None
        lib.enc_intra_frame.argtypes = [ctypes.c_void_p] * 2
        lib.cabac_residual.restype = ctypes.c_int
        lib.cabac_residual.argtypes = [
            ctypes.c_void_p, ctypes.c_longlong] + [ctypes.c_void_p] * 7
        _lib = lib
    return _lib if _lib else None


def available() -> bool:
    return get_lib() is not None


def bitpack(vals: np.ndarray, lens: np.ndarray, out: np.ndarray,
            start_bit: int) -> int:
    """Append MSB-first tokens into `out` (zeroed uint8); returns the
    new bit position. Arrays must be C-contiguous."""
    lib = get_lib()
    v = np.ascontiguousarray(vals.reshape(-1), np.uint32)
    ln = np.ascontiguousarray(lens.reshape(-1), np.uint8)
    return lib.bitpack(v.ctypes.data, ln.ctypes.data, len(v),
                       out.ctypes.data, start_bit)


def deblock_frame_native(st, fs, BSV, BSH, coffs) -> bool:
    """C full-frame deblock; returns False if the library is missing."""
    lib = get_lib()
    if lib is None:
        return False
    from ..tables import ALPHA_TABLE, BETA_TABLE, TC0_TABLE, CHROMA_QP_TABLE
    y = np.ascontiguousarray(st.y)
    u = np.ascontiguousarray(st.u)
    v = np.ascontiguousarray(st.v)

    def i32(a):
        return np.ascontiguousarray(a, np.int32)

    qp = i32(fs.qp)
    dis = i32(fs.disable_deblock)
    ao = i32(fs.alpha_offset)
    bo = i32(fs.beta_offset)
    sid = i32(fs.slice_id)
    t8 = np.ascontiguousarray(fs.transform8, np.uint8)
    corr = np.ascontiguousarray(getattr(fs, "mb_correct"), np.uint8)
    alpha = i32(ALPHA_TABLE)
    beta = i32(BETA_TABLE)
    tc0 = np.ascontiguousarray(TC0_TABLE, np.int8)
    cqp = i32(CHROMA_QP_TABLE)
    bsv = i32(BSV)
    bsh = i32(BSH)
    lib.deblock_frame_c(
        y.ctypes.data, u.ctypes.data, v.ctypes.data,
        fs.mb_w, fs.mb_h,
        bsv.ctypes.data, bsh.ctypes.data,
        qp.ctypes.data, dis.ctypes.data, ao.ctypes.data, bo.ctypes.data,
        sid.ctypes.data, t8.ctypes.data, corr.ctypes.data,
        alpha.ctypes.data, beta.ctypes.data, tc0.ctypes.data,
        cqp.ctypes.data, int(coffs[0]), int(coffs[1]))
    if y is not st.y:
        st.y[:] = y
    if u is not st.u:
        st.u[:] = u
    if v is not st.v:
        st.v[:] = v
    return True


# ---------------------------------------------------------------------------
# Native CAVLC slice parser glue
# ---------------------------------------------------------------------------
_cavlc_tables = None


def _get_cavlc_tables():
    global _cavlc_tables
    if _cavlc_tables is None:
        from ..tables.cavlc import (COEFF_TOKEN_LUTS, TOTAL_ZEROS_LUTS,
                                    TOTAL_ZEROS_CDC_LUTS, RUN_BEFORE_LUTS,
                                    CBP_INTER, CBP_INTRA, CBP_I16x16)
        from ..tables import CHROMA_QP_TABLE, ZIGZAG_4x4
        _cavlc_tables = {
            "ct": np.ascontiguousarray(np.stack(COEFF_TOKEN_LUTS), np.uint32),
            "tz": np.ascontiguousarray(
                np.stack([TOTAL_ZEROS_LUTS[i] if i < len(TOTAL_ZEROS_LUTS)
                          and TOTAL_ZEROS_LUTS[i] is not None
                          else np.zeros(512, np.uint32)
                          for i in range(16)]), np.uint32),
            "tzc": np.ascontiguousarray(
                np.stack([TOTAL_ZEROS_CDC_LUTS[i]
                          if TOTAL_ZEROS_CDC_LUTS[i] is not None
                          else np.zeros(8, np.uint32)
                          for i in range(4)]), np.uint32),
            "rb": np.ascontiguousarray(
                np.stack([RUN_BEFORE_LUTS[i] if RUN_BEFORE_LUTS[i] is not None
                          else np.zeros(2048, np.uint32)
                          for i in range(8)]), np.uint32),
            "cbp_inter": np.ascontiguousarray(CBP_INTER, np.int32),
            "cbp_intra": np.ascontiguousarray(CBP_INTRA, np.int32),
            "cbp_i16": np.ascontiguousarray(CBP_I16x16, np.int32),
            "cqp": np.ascontiguousarray(CHROMA_QP_TABLE, np.int32),
            "zz": np.ascontiguousarray(ZIGZAG_4x4, np.int32),
        }
    return _cavlc_tables


def _dq_eff(dq):
    """Effective [6][52][16] int64 dequant table (see parse_cavlc.c):
    flat -> DEQUANT_4x4 << 4 for every property; scaling lists -> the
    per-property sl*deq products. (level*dq + 8) >> 4 then equals the
    flat multiply exactly."""
    from ..tables import DEQUANT_4x4
    if getattr(dq, "use", False):
        return np.ascontiguousarray(dq.dq4, np.int64)
    flat = (DEQUANT_4x4.astype(np.int64) << 4)
    return np.ascontiguousarray(
        np.broadcast_to(flat, (6, 52, 16)).copy(), np.int64)


def parse_cavlc_slice_native(br, ctx) -> int | None:
    """Run the C CAVLC slice parser; returns end mb index or None when
    the slice is out of native scope (caller falls back to Python)."""
    lib = get_lib()
    if lib is None:
        return None
    sh = ctx.sh
    from ..decoder.slicehdr import I_SLICE, P_SLICE
    if sh.slice_type not in (I_SLICE, P_SLICE):
        return None
    if sh.pps.transform_8x8_mode:
        return None
    if sh.pps.num_slice_groups > 1 or getattr(ctx, "fmo_next", None) \
            is not None:
        return None    # FMO group iteration stays on the Python path
    fs = ctx.fs
    from ..decoder.mvpred import ensure_motion_grids
    ensure_motion_grids(fs)
    t = _get_cavlc_tables()
    dq_eff = _dq_eff(ctx.dq)
    n_mb = fs.n_mb
    ipcm_buf = np.zeros((n_mb, 384), np.uint8)
    ipcm_flag = np.zeros(n_mb, np.uint8)
    l0_ids = np.array(
        [p.pic_id if p is not None else -1 for p in ctx.ref_list0],
        np.int32)
    if len(l0_ids) == 0:
        l0_ids = np.zeros(1, np.int32)
    rbsp = np.frombuffer(br.data, np.uint8)
    t8 = np.zeros(n_mb, np.uint8)
    arrs = [rbsp, t["ct"], t["tz"], t["tzc"], t["rb"], t["cbp_inter"],
            t["cbp_intra"], t["cbp_i16"], dq_eff, t["cqp"], t["zz"],
            fs.mb_type, fs.slice_id, fs.i4_grid, fs.i16_mode, fs.i4_modes,
            fs.chroma_mode, fs.cbp, fs.qp, fs.nzc_l, fs.nzc_c,
            fs.coeffs_l, fs.coeffs_c, fs.mv, fs.refidx, fs.ref_pic,
            fs.pred_mode, fs.gmv, fs.gref, fs.gwritten, fs.grefw,
            l0_ids, fs.disable_deblock, fs.alpha_offset, fs.beta_offset,
            fs.mb_correct, ipcm_buf, ipcm_flag, t8]
    for a in arrs:
        if not a.flags["C_CONTIGUOUS"]:
            return None
    ptrs = np.array([a.ctypes.data for a in arrs], np.uint64)
    params = np.array([
        br.nbits, br.pos, 0 if sh.slice_type == P_SLICE else 2,
        sh.first_mb_in_slice, fs.mb_w, fs.mb_h, ctx.slice_idx, ctx.qp,
        sh.num_ref_idx_l0_active, int(ctx.constrained_intra),
        sh.disable_deblocking_filter_idc, sh.slice_alpha_c0_offset,
        sh.slice_beta_offset, sh.pps.chroma_qp_index_offset,
        sh.pps.second_chroma_qp_index_offset, len(l0_ids)], np.int32)
    out = np.zeros(4, np.int32)
    lib.parse_cavlc_slice(ptrs.ctypes.data, params.ctypes.data,
                          out.ctypes.data)
    br.pos = int(out[1])
    if out[2] == 1:
        raise EOFError("bitstream overrun (native CAVLC parse)")
    if out[2] != 0:
        raise ValueError("invalid CAVLC bitstream (native parse)")
    fs.chroma_qp_offsets = (sh.pps.chroma_qp_index_offset,
                            sh.pps.second_chroma_qp_index_offset)
    if ipcm_flag.any():
        for idx in np.nonzero(ipcm_flag)[0]:
            raw = ipcm_buf[idx]
            fs.ipcm[int(idx)] = (raw[:256].reshape(16, 16).copy(),
                                 raw[256:320].reshape(8, 8).copy(),
                                 raw[320:].reshape(8, 8).copy())
    return int(out[0])


def recon_intra_mbs_native(st, fs, intra_list, constrained: bool) -> bool:
    """C intra recon for I4x4/I16x16/IPCM MB lists (raster order).
    Returns False when unavailable or the frame needs the Python path
    (I8x8 / 8x8 transform MBs present)."""
    lib = get_lib()
    if lib is None:
        return False
    types = fs.mb_type[intra_list]
    if (types == 3).any():          # MB_I8x8 -> Python
        return False
    n_mb = fs.n_mb
    ipcm_flag = np.zeros(n_mb, np.uint8)
    ipcm_buf = np.zeros((1, 384), np.uint8)
    if fs.ipcm:
        ipcm_buf = np.zeros((n_mb, 384), np.uint8)
        for idx, (y, u, v) in fs.ipcm.items():
            ipcm_flag[idx] = 1
            ipcm_buf[idx, :256] = np.asarray(y, np.uint8).reshape(-1)
            ipcm_buf[idx, 256:320] = np.asarray(u, np.uint8).reshape(-1)
            ipcm_buf[idx, 320:] = np.asarray(v, np.uint8).reshape(-1)
    mb_list = np.ascontiguousarray(intra_list, np.int32)
    arrs = [st.y, st.u, st.v, fs.mb_type, fs.slice_id, fs.i16_mode,
            fs.i4_modes, fs.chroma_mode, fs.coeffs_l, fs.coeffs_c,
            ipcm_buf, ipcm_flag, mb_list]
    for a in arrs:
        if not a.flags["C_CONTIGUOUS"]:
            return False
    ptrs = np.array([a.ctypes.data for a in arrs], np.uint64)
    params = np.array([fs.mb_w, fs.mb_h, len(mb_list),
                       int(constrained)], np.int32)
    lib.recon_intra_mbs(ptrs.ctypes.data, params.ctypes.data)
    return True


def enc_intra_frame_native(y, u, v, qp: int, qp_c: int, lam: int,
                           enable_i4: bool = True):
    """I-frame MD + encode in C (I16x16 vs I4x4 per MB, enc_intra.c).
    Returns the encoder's symbol dict, or None when the native library
    is unavailable (caller falls back to the I16-only device core)."""
    lib = get_lib()
    if lib is None:
        return None
    from ..tables import QUANT_MF_4x4, DEQUANT_4x4
    y = np.ascontiguousarray(y, np.uint8)
    u = np.ascontiguousarray(u, np.uint8)
    v = np.ascontiguousarray(v, np.uint8)
    mb_h, mb_w = y.shape[0] // 16, y.shape[1] // 16
    n = mb_w * mb_h
    qmf = np.ascontiguousarray(np.asarray(QUANT_MF_4x4).reshape(52, 16),
                               np.int32)
    dqt = np.ascontiguousarray(np.asarray(DEQUANT_4x4).reshape(52, 16),
                               np.int32)
    kind = np.zeros(n, np.int32)
    i16m = np.zeros(n, np.int32)
    i4m = np.zeros((n, 16), np.int32)
    i4prev = np.zeros((n, 16), np.int32)
    i4rem = np.zeros((n, 16), np.int32)
    cmode = np.zeros(n, np.int32)
    ldc = np.zeros((n, 16), np.int32)
    lac = np.zeros((n, 16, 16), np.int32)
    cdc = np.zeros((n, 2, 4), np.int32)
    cac = np.zeros((n, 2, 4, 16), np.int32)
    ry, ru, rv = y.copy(), u.copy(), v.copy()
    arrs = [y, u, v, qmf, dqt, kind, i16m, i4m, i4prev, i4rem, cmode,
            ldc, lac, cdc, cac, ry, ru, rv]
    ptrs = np.array([a.ctypes.data for a in arrs], np.uint64)
    params = np.array([mb_w, mb_h, qp, qp_c, lam, int(enable_i4)],
                      np.int32)
    lib.enc_intra_frame(ptrs.ctypes.data, params.ctypes.data)
    return {"kind": kind, "i16_mode": i16m, "i4_modes": i4m,
            "i4_prev": i4prev, "i4_rem": i4rem, "chroma_mode": cmode,
            "luma_dc": ldc.reshape(n, 4, 4), "luma_ac": lac,
            "chroma_dc": cdc, "chroma_ac": cac,
            "recon_y": ry, "recon_u": ru, "recon_v": rv}
