"""Structure-of-arrays 4x4 transform kernels for the TPU hot path.

Layout: the 4x4 spatial coefficients are LEADING axes and the batch
(all MBs/blocks of a frame) is the TRAILING axis, so every arithmetic
op runs over [..., N] with N (thousands of MBs) filling the 128 vector
lanes. This is the transpose of ops/transform.py (the AoS oracle-shaped
path); both produce bit-identical integer results — tests enforce.

Butterflies are written out explicitly (adds/shifts, no 4x4 matmuls):
on TPU a 4x4 matmul wastes 124/128 lanes, while the SoA butterfly is
~10 full-width VPU passes. Semantics match the reference C kernels
(encode_mb_aux.cpp:313 WelsDctT4_c, :164 WelsQuant4x4_c,
decode_mb_aux.cpp:139/164 dequant+IDCT).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..tables import DEQUANT_4x4, QUANT_MF_4x4
from .transform import wrap_i16

# numpy (not jnp) module constants: closure-captured device
# arrays force a per-dispatch constant transfer on some
# platforms; XLA embeds numpy constants at compile time.
_DEQUANT_J = DEQUANT_4x4.reshape(52, 4, 4)
_QUANT_MF_J = QUANT_MF_4x4.reshape(52, 4, 4)


def _fwd_butterfly(x0, x1, x2, x3):
    t0 = x0 + x3
    t1 = x1 + x2
    t2 = x1 - x2
    t3 = x0 - x3
    return t0 + t1, 2 * t3 + t2, t0 - t1, t3 - 2 * t2


def dct4x4_soa(x):
    """x: [4, 4, ...] int32 residual; returns coef [4, 4, ...]."""
    x = x.astype(jnp.int32)
    v = _fwd_butterfly(x[0], x[1], x[2], x[3])
    v = jnp.stack(v, 0)                      # vertical pass
    h = _fwd_butterfly(v[:, 0], v[:, 1], v[:, 2], v[:, 3])
    return jnp.stack(h, 1)                   # horizontal pass


def hadamard4x4_soa(x):
    """(H @ x @ H.T + 1) >> 1 on [4, 4, ...]."""
    x = x.astype(jnp.int32)

    def bf(a0, a1, a2, a3):
        t0, t1, t2, t3 = a0 + a3, a1 + a2, a1 - a2, a0 - a3
        return t0 + t1, t3 + t2, t0 - t1, t3 - t2

    v = jnp.stack(bf(x[0], x[1], x[2], x[3]), 0)
    h = jnp.stack(bf(v[:, 0], v[:, 1], v[:, 2], v[:, 3]), 1)
    return (h + 1) >> 1


def ihadamard4x4_soa(x):
    x = x.astype(jnp.int32)

    def bf(a0, a1, a2, a3):
        t0, t1, t2, t3 = a0 + a2, a0 - a2, a1 - a3, a1 + a3
        return t0 + t3, t1 + t2, t1 - t2, t0 - t3

    v = jnp.stack(bf(x[0], x[1], x[2], x[3]), 0)
    return jnp.stack(bf(v[:, 0], v[:, 1], v[:, 2], v[:, 3]), 1)


def _qp_tables(qp, table, ndim):
    """table[qp] broadcastable against a [4, 4, ...] operand of rank
    `ndim`: qp scalar -> [4,4,1,..]; qp [N] (per-MB, trailing axis) ->
    [4,4,1,..,N]."""
    t = jnp.asarray(table)[jnp.asarray(qp, jnp.int32)]
    if t.ndim == 2:
        return t.reshape((4, 4) + (1,) * (ndim - 2))
    return jnp.moveaxis(t, 0, -1).reshape(
        (4, 4) + (1,) * (ndim - 3) + (-1,))


def quant4x4_soa(coef, qp, intra: bool):
    """coef: [4, 4, ...]; qp scalar or [N] matching the trailing axis."""
    qp = jnp.asarray(qp, jnp.int32)
    qbits = 15 + qp // 6
    f = ((1 << qbits) // (3 if intra else 6)).astype(jnp.int32)
    mf = _qp_tables(qp, _QUANT_MF_J, coef.ndim)
    if qp.ndim:
        bshape = (1, 1) + (1,) * (coef.ndim - 3) + (-1,)
        f = f.reshape(bshape)
        qbits = qbits.reshape(bshape)
    c = coef.astype(jnp.int32)
    lev = (jnp.abs(c) * mf + f) >> qbits
    return jnp.sign(c) * lev


def quant_dc_soa(coef, qp, intra: bool):
    """coef: [...] (DC grid, e.g. [4,4,N] luma or [2,2,N] chroma)."""
    qp = jnp.asarray(qp, jnp.int32)
    qbits = 15 + qp // 6
    f = (2 * ((1 << qbits) // (3 if intra else 6))).astype(jnp.int32)
    mf = jnp.asarray(_QUANT_MF_J)[qp, 0, 0]
    c = coef.astype(jnp.int32)
    lev = (jnp.abs(c) * mf + f) >> (qbits + 1)
    return jnp.sign(c) * lev


def dequant4x4_soa(level, qp):
    return level.astype(jnp.int32) * _qp_tables(
        jnp.asarray(qp, jnp.int32), _DEQUANT_J, level.ndim)


def hadamard2x2_soa(x):
    """H2 @ x @ H2.T on [2, 2, ...]."""
    d = x.astype(jnp.int32)
    v0, v1 = d[0] + d[1], d[0] - d[1]
    return jnp.stack([jnp.stack([v0[0] + v0[1], v0[0] - v0[1]], 0),
                      jnp.stack([v1[0] + v1[1], v1[0] - v1[1]], 0)], 0)


def idct4x4_add_soa(pred, coef):
    """pred: [4,4,...] int, coef: [4,4,...] int32 dequantized; returns
    uint8-range int32 recon [4,4,...]. Bit-exact with
    ops.transform.idct4x4_add (horizontal pass, i16 wrap, vertical)."""
    c = coef.astype(jnp.int32)

    def bf_i(a0, a1, a2, a3):
        t0 = a0 + a2
        t1 = a0 - a2
        t2 = (a1 >> 1) - a3
        t3 = a1 + (a3 >> 1)
        return t0 + t3, t1 + t2, t1 - t2, t0 - t3

    h = jnp.stack(bf_i(c[:, 0], c[:, 1], c[:, 2], c[:, 3]), 1)
    h = wrap_i16(h)
    r = jnp.stack(bf_i(h[0], h[1], h[2], h[3]), 0)
    out = pred.astype(jnp.int32) + ((r + 32) >> 6)
    return jnp.clip(out, 0, 255)


def luma_dc_dequant_ihadamard_soa(dc, qp):
    """dc: [4,4,...]."""
    qp = jnp.asarray(qp, jnp.int32)
    qmul = (jnp.asarray(_DEQUANT_J)[qp, 0, 0] << 4).astype(jnp.int32)
    t = ihadamard4x4_soa(dc)
    return wrap_i16((t * qmul + 32) >> 6)


def chroma_dc_dequant_ihadamard_soa(dc, qp):
    """dc: [2,2,...]."""
    qp = jnp.asarray(qp, jnp.int32)
    qmul = jnp.asarray(_DEQUANT_J)[qp, 0, 0]
    d = dc.astype(jnp.int32)
    v0, v1 = d[0] + d[1], d[0] - d[1]
    t = jnp.stack([jnp.stack([v0[0] + v0[1], v0[0] - v0[1]], 0),
                   jnp.stack([v1[0] + v1[1], v1[0] - v1[1]], 0)], 0)
    return wrap_i16((t * qmul) >> 1)
