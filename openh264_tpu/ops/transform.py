"""JAX/XLA batched 4x4 transform kernels (device compute path).

Bit-exact counterparts of oracle/transform.py (the numpy oracles define
the semantics; tests enforce equality). All functions are jittable and
batched over arbitrary leading axes — on TPU, a whole slice/frame of MB
blocks goes through in one call, with XLA fusing the butterflies into a
few VPU passes.

Integer notes for TPU:
- int32 arithmetic throughout; arithmetic right shift on negatives
  matches numpy/C semantics.
- int16 stores in the reference are modeled by an explicit two's-
  complement wrap (wrap_i16) rather than dtype casts, keeping everything
  in int32 lanes (TPU-friendly).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..tables import DEQUANT_4x4, QUANT_MF_4x4

_CF = np.array([[1, 1, 1, 1],
                [2, 1, -1, -2],
                [1, -1, -1, 1],
                [1, -2, 2, -1]], dtype=np.int32)
_H4 = np.array([[1, 1, 1, 1],
                [1, 1, -1, -1],
                [1, -1, -1, 1],
                [1, -1, 1, -1]], dtype=np.int32)
# numpy (not jnp) module constants: closure-captured device
# arrays force a per-dispatch constant transfer on some
# platforms; XLA embeds numpy constants at compile time.
_DEQUANT_4x4_J = DEQUANT_4x4.reshape(52, 4, 4)
_QUANT_MF_J = QUANT_MF_4x4.reshape(52, 4, 4)


def wrap_i16(x):
    return ((x + 0x8000) & 0xFFFF) - 0x8000


def dct4x4(res):
    x = res.astype(jnp.int32)
    return _CF @ x @ _CF.T


def hadamard4x4(x):
    t = _H4 @ x.astype(jnp.int32) @ _H4.T
    return (t + 1) >> 1


def ihadamard4x4(x):
    return _H4 @ x.astype(jnp.int32) @ _H4.T


def quant4x4(coef, qp, intra: bool):
    """qp may be a scalar or an array broadcastable over the leading axes
    (per-MB QP). intra is a static bool."""
    qp = jnp.asarray(qp, jnp.int32)
    qbits = 15 + qp // 6
    f = (1 << qbits) // (3 if intra else 6)
    mf = jnp.asarray(_QUANT_MF_J)[qp]
    c = coef.astype(jnp.int64)
    shift = qbits.astype(jnp.int64)
    if mf.ndim > 2:  # per-block qp: align [..., 4, 4]
        f = f[..., None, None]
        shift = shift[..., None, None]
    lev = (jnp.abs(c) * mf + f) >> shift
    return (jnp.sign(c) * lev).astype(jnp.int32)


def quant_dc(coef, qp, intra: bool):
    qp = jnp.asarray(qp, jnp.int32)
    qbits = 15 + qp // 6
    f = 2 * ((1 << qbits) // (3 if intra else 6))
    mf = jnp.asarray(_QUANT_MF_J)[qp][..., 0, 0]
    c = coef.astype(jnp.int64)
    shift = (qbits + 1).astype(jnp.int64)
    if mf.ndim > 0:
        f = f[..., None, None]
        shift = shift[..., None, None]
        mf = mf[..., None, None]
    lev = (jnp.abs(c) * mf + f) >> shift
    return (jnp.sign(c) * lev).astype(jnp.int32)


def dequant4x4(level, qp):
    d = jnp.asarray(_DEQUANT_4x4_J)[jnp.asarray(qp, jnp.int32)]
    return level.astype(jnp.int32) * d


def idct4x4_add(pred, coef):
    c = coef.astype(jnp.int32)
    c0, c1, c2, c3 = c[..., 0], c[..., 1], c[..., 2], c[..., 3]
    t0 = c0 + c2
    t1 = c0 - c2
    t2 = (c1 >> 1) - c3
    t3 = c1 + (c3 >> 1)
    h = jnp.stack([t0 + t3, t1 + t2, t1 - t2, t0 - t3], axis=-1)
    h = wrap_i16(h)
    h0, h1, h2, h3 = h[..., 0, :], h[..., 1, :], h[..., 2, :], h[..., 3, :]
    t0 = h0 + h2
    t1 = h0 - h2
    t2 = (h1 >> 1) - h3
    t3 = h1 + (h3 >> 1)
    r = jnp.stack([t0 + t3, t1 + t2, t1 - t2, t0 - t3], axis=-2)
    out = pred.astype(jnp.int32) + ((r + 32) >> 6)
    return jnp.clip(out, 0, 255).astype(jnp.uint8)


def luma_dc_dequant_ihadamard(dc, qp):
    qmul = (jnp.asarray(_DEQUANT_4x4_J)[jnp.asarray(qp, jnp.int32), 0, 0] << 4).astype(jnp.int32)
    t = ihadamard4x4(dc)
    if jnp.ndim(qmul) > 0:
        qmul = qmul[..., None, None]
    return wrap_i16((t * qmul + 32) >> 6)


def chroma_dc_dequant_ihadamard(dc, qp):
    h = jnp.asarray(np.array([[1, 1], [1, -1]], dtype=np.int32))
    qmul = jnp.asarray(_DEQUANT_4x4_J)[jnp.asarray(qp, jnp.int32), 0, 0]
    t = h @ dc.astype(jnp.int32) @ h.T
    if jnp.ndim(qmul) > 0:
        qmul = qmul[..., None, None]
    return wrap_i16((t * qmul) >> 1)
