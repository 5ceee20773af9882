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
_SRC = os.path.join(_HERE, "codec_native.c")

_lib = None


def _build() -> str | None:
    so = os.path.join(_HERE, "codec_native.so")
    try:
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(_SRC)):
            with tempfile.NamedTemporaryFile(
                    suffix=".so", dir=_HERE, delete=False) as tmp:
                tmppath = tmp.name
            r = subprocess.run(
                ["cc", "-O3", "-shared", "-fPIC", "-o", tmppath, _SRC],
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
