"""Pallas TPU kernel for the in-loop deblocking wavefront.

The XLA formulation (deblock_jax.deblock_frame_device) runs the
mb_w + 2*mb_h - 2 knight-diagonal steps as a fori_loop of HBM-level
dynamic slices; at 720p that measured ~20 ms of the ~55 ms P step —
each step is only ~45 lanes of VPU work, so the loop is dominated by
per-iteration memory movement, not arithmetic.

This kernel keeps the WHOLE sheared frame (uint8, ~3 MB at 720p)
VMEM-resident for the entire wavefront: the grid dimension is the
diagonal index d (sequential on a TensorCore), the sheared planes are
input/output-aliased refs sliced in place per step, and all
per-diagonal control data (boundary strengths, alpha/beta/tc0 per
edge) is precomputed OUTSIDE the kernel as [nd, ...] tensors streamed
in per step via BlockSpec index maps — the kernel body is pure edge
filtering (spec 8.7.2.3-4; parity: deblocking_common.cpp
DeblockLuma{Lt4,Eq4}_c, encoder deblocking.cpp
PerformDeblockingFilter:744).

Bit-exact with deblock_jax.deblock_frame_device (test_deblock_pallas).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..tables import ALPHA_TABLE, BETA_TABLE, TC0_TABLE
from .deblock_jax import _luma_edge, _chroma_edge

OFF, OFFC = 36, 18


def _shear(plane, size, off, ws, mb_h):
    S = jnp.zeros((plane.shape[0], ws), jnp.uint8)
    for j in range(mb_h):
        S = jax.lax.dynamic_update_slice(
            S, plane[j * size:(j + 1) * size].astype(jnp.uint8),
            (j * size, off + 2 * size * j))
    return S


def _unshear(S, size, off, w, mb_h):
    rows = []
    for j in range(mb_h):
        rows.append(jax.lax.dynamic_slice(
            S, (j * size, off + 2 * size * j), (size, w)))
    return jnp.concatenate(rows, 0)


def _wavefront_params(BSV, BSH, qp_mb, cqp_mb, mb_w: int, mb_h: int):
    """Per-diagonal filter parameters for every (d, lane j, edge e).

    Returns int32 arrays:
      bs_v/bs_h      [nd, J, 4, 16]  per-sample luma BS (masked)
      a_v/b_v/a_h/b_h [nd, J, 4]     alpha/beta per edge
      t_v/t_h        [nd, J, 4, 16]  tc0 per sample
      bsc_v/bsc_h    [nd, J, 2, 8]   chroma BS per sample
      ac_*/bc_*      [nd, J, 2]      chroma alpha/beta
      tc_v/tc_h      [nd, J, 2, 8]   chroma tc0
    """
    J = mb_h
    nd = mb_w + 2 * (mb_h - 1)
    alpha_t = jnp.asarray(ALPHA_TABLE, jnp.int32)
    beta_t = jnp.asarray(BETA_TABLE, jnp.int32)
    tc0_t = jnp.asarray(TC0_TABLE, jnp.int32)
    qp_g = jnp.asarray(qp_mb, jnp.int32).reshape(mb_h, mb_w)
    cqp_g = jnp.asarray(cqp_mb, jnp.int32).reshape(mb_h, mb_w)
    qp_top = jnp.concatenate([qp_g[:1], qp_g[:-1]], 0)
    cqp_top = jnp.concatenate([cqp_g[:1], cqp_g[:-1]], 0)
    qp_gp = jnp.pad(qp_g, ((0, 0), (1, 1)), mode="edge")
    cqp_gp = jnp.pad(cqp_g, ((0, 0), (1, 1)), mode="edge")
    qp_topp = jnp.pad(qp_top, ((0, 0), (1, 1)), mode="edge")
    cqp_topp = jnp.pad(cqp_top, ((0, 0), (1, 1)), mode="edge")
    BSVb = jnp.pad(BSV.reshape(mb_h, 4, mb_w * 4), ((0, 0), (0, 0), (4, 4)))
    BSHb = jnp.pad(BSH.reshape(mb_h, 4, mb_w * 4), ((0, 0), (0, 0), (4, 4)))

    jj = jnp.arange(J, dtype=jnp.int32)
    dd = jnp.arange(nd, dtype=jnp.int32)
    x = dd[:, None] - 2 * jj[None, :]                     # [nd, J]
    valid = (x >= 0) & (x < mb_w)
    xc = jnp.clip(x, 0, mb_w - 1)
    left_ok = valid & (x > 0)
    top_ok = valid & (jj[None, :] > 0)

    def grab(g2, col):
        # g2: [J, W]; col: [nd, J] -> [nd, J]
        return g2[jj[None, :], col]

    qc = grab(qp_gp, xc + 1)
    ql = grab(qp_gp, xc)
    qt = grab(qp_topp, xc + 1)
    cqc = grab(cqp_gp, xc + 1)
    cql = grab(cqp_gp, xc)
    cqt = grab(cqp_topp, xc + 1)

    e4 = jnp.arange(4, dtype=jnp.int32)
    # bsv4[nd, J, e, sub] = BSVb[j, sub, xc*4+4+e]
    bsv4 = BSVb[jj[None, :, None, None], e4[None, None, None, :],
                (xc * 4 + 4)[:, :, None, None] + e4[None, None, :, None]]
    # bsh4[nd, J, e, sub] = BSHb[j, e, xc*4+4+sub]
    bsh4 = BSHb[jj[None, :, None, None], e4[None, None, :, None],
                (xc * 4 + 4)[:, :, None, None] + e4[None, None, None, :]]
    maskv = jnp.stack([left_ok, valid, valid, valid], 2)  # [nd, J, 4]
    maskh = jnp.stack([top_ok, valid, valid, valid], 2)
    bsv4 = bsv4 * maskv[..., None]
    bsh4 = bsh4 * maskh[..., None]

    def luma_pack(bs4, qcur, qnb0):
        # per-edge neighbour QP: e=0 crosses the MB edge
        qnb = jnp.stack([qnb0, qcur, qcur, qcur], 2)      # [nd, J, 4]
        ia = jnp.clip((qcur[:, :, None] + qnb + 1) >> 1, 0, 51)
        bs16 = jnp.repeat(bs4, 4, axis=3)                 # [nd, J, 4, 16]
        tc0 = tc0_t[ia[..., None], jnp.clip(bs16 - 1, 0, 2)]
        return bs16, alpha_t[ia], beta_t[ia], tc0

    def chroma_pack(bs4, qcur, qnb0):
        bs4c = bs4[:, :, ::2]                             # e in (0, 2)
        qnb = jnp.stack([qnb0, qcur], 2)
        ia = jnp.clip((qcur[:, :, None] + qnb + 1) >> 1, 0, 51)
        bs8 = jnp.repeat(bs4c, 2, axis=3)                 # [nd, J, 2, 8]
        tc0 = tc0_t[ia[..., None], jnp.clip(bs8 - 1, 0, 2)]
        return bs8, alpha_t[ia], beta_t[ia], tc0

    bs_v, a_v, b_v, t_v = luma_pack(bsv4, qc, ql)
    bs_h, a_h, b_h, t_h = luma_pack(bsh4, qc, qt)
    bsc_v, ac_v, bc_v, tc_v = chroma_pack(bsv4, cqc, cql)
    bsc_h, ac_h, bc_h, tc_h = chroma_pack(bsh4, cqc, cqt)
    return (bs_v, a_v, b_v, t_v, bs_h, a_h, b_h, t_h,
            bsc_v, ac_v, bc_v, tc_v, bsc_h, ac_h, bc_h, tc_h)


def _kernel(bs_v, a_v, b_v, t_v, bs_h, a_h, b_h, t_h,
            bsc_v, ac_v, bc_v, tc_v, bsc_h, ac_h, bc_h, tc_h,
            S_in, SUV_in, S_ref, SUV_ref, *, mb_h, Hc):
    del S_in, SUV_in  # aliased into S_ref / SUV_ref
    J = mb_h
    H = J * 16
    d = pl.program_id(0)
    # materialize this diagonal's parameter blocks ([1, ...] -> [...])
    bs_v, a_v, b_v, t_v = bs_v[0], a_v[0], b_v[0], t_v[0]
    bs_h, a_h, b_h, t_h = bs_h[0], a_h[0], b_h[0], t_h[0]
    bsc_v, ac_v, bc_v, tc_v = bsc_v[0], ac_v[0], bc_v[0], tc_v[0]
    bsc_h, ac_h, bc_h, tc_h = bsc_h[0], ac_h[0], bc_h[0], tc_h[0]

    C = S_ref[:, pl.ds(16 * d, 56)].astype(jnp.int32)     # [H, 56]
    Cb = C.reshape(J, 16, 56)
    own = Cb[:, :, 32:52]
    halo = jnp.concatenate(
        [jnp.zeros((1, 4, 20), jnp.int32), Cb[:-1, 12:16, 0:20]], 0)
    R = jnp.concatenate([halo, own], 1)                   # [J, 20, 20]

    CUV = SUV_ref[:, pl.ds(8 * d, 28)].astype(jnp.int32)  # [2Hc, 28]
    CUVb = CUV.reshape(2, J, 8, 28)
    halo_c = jnp.concatenate(
        [jnp.zeros((2, 1, 2, 10), jnp.int32), CUVb[:, :-1, 6:8, 0:10]], 1)
    RUV = jnp.concatenate([halo_c, CUVb[:, :, :, 16:26]],
                          2).reshape(2 * J, 10, 10)

    def tile2(a):
        return jnp.concatenate([a, a], 0)

    for e in range(4):
        sub = R[:, 4:20, 4 * e:4 * e + 8]
        new = _luma_edge(sub, bs_v[:, e], a_v[:, e, None],
                         b_v[:, e, None], t_v[:, e])
        R = R.at[:, 4:20, 4 * e + 1:4 * e + 7].set(new)
        if e in (0, 2):
            ce = e // 2
            subc = RUV[:, 2:10, 4 * ce:4 * ce + 4]
            newc = _chroma_edge(subc, tile2(bsc_v[:, ce]),
                                tile2(ac_v[:, ce, None]),
                                tile2(bc_v[:, ce, None]),
                                tile2(tc_v[:, ce]))
            RUV = RUV.at[:, 2:10, 4 * ce + 1:4 * ce + 3].set(newc)

    for e in range(4):
        sub = R[:, 4 * e:4 * e + 8, 4:20].transpose(0, 2, 1)
        new = _luma_edge(sub, bs_h[:, e], a_h[:, e, None],
                         b_h[:, e, None], t_h[:, e])
        R = R.at[:, 4 * e + 1:4 * e + 7, 4:20].set(new.transpose(0, 2, 1))
        if e in (0, 2):
            ce = e // 2
            subc = RUV[:, 4 * ce:4 * ce + 4, 2:10].transpose(0, 2, 1)
            newc = _chroma_edge(subc, tile2(bsc_h[:, ce]),
                                tile2(ac_h[:, ce, None]),
                                tile2(bc_h[:, ce, None]),
                                tile2(tc_h[:, ce]))
            RUV = RUV.at[:, 4 * ce + 1:4 * ce + 3, 2:10].set(
                newc.transpose(0, 2, 1))

    Cb2 = Cb.at[:, :, 32:52].set(R[:, 4:20, :])
    Cb2 = Cb2.at[:-1, 12:16, 0:20].set(R[1:, 0:4, :])
    S_ref[:, pl.ds(16 * d, 56)] = Cb2.reshape(H, 56).astype(jnp.uint8)
    RUVb = RUV.reshape(2, J, 10, 10)
    CUVb2 = CUVb.at[:, :, :, 16:26].set(RUVb[:, :, 2:10, :])
    CUVb2 = CUVb2.at[:, :-1, 6:8, 0:10].set(RUVb[:, 1:, 0:2, :])
    SUV_ref[:, pl.ds(8 * d, 28)] = CUVb2.reshape(2 * Hc, 28).astype(
        jnp.uint8)


@functools.partial(jax.jit,
                   static_argnames=("mb_w", "mb_h", "interpret"))
def deblock_frame_pallas(y, u, v, BSV, BSH, qp_mb, cqp_mb,
                         mb_w: int, mb_h: int, interpret: bool = False):
    """Drop-in twin of deblock_jax.deblock_frame_device running the
    wavefront as one VMEM-resident Pallas kernel."""
    H, W = y.shape
    Hc, Wc = u.shape
    J = mb_h
    nd = mb_w + 2 * (mb_h - 1)
    WS = 16 * (nd - 1) + 56 + 8
    WSC = 8 * (nd - 1) + 28 + 8

    S = _shear(y, 16, OFF, WS, mb_h)
    SUV = jnp.concatenate([_shear(u, 8, OFFC, WSC, mb_h),
                           _shear(v, 8, OFFC, WSC, mb_h)], 0)
    params = _wavefront_params(BSV, BSH, qp_mb, cqp_mb, mb_w, mb_h)

    def pspec(p):
        blk = (1,) + p.shape[1:]
        return pl.BlockSpec(blk, lambda d: (d,) + (0,) * (p.ndim - 1),
                            memory_space=pltpu.VMEM)

    in_specs = [pspec(p) for p in params] + [
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    kern = functools.partial(_kernel, mb_h=mb_h, Hc=Hc)
    S2, SUV2 = pl.pallas_call(
        kern,
        grid=(nd,),
        in_specs=in_specs,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct(S.shape, jnp.uint8),
                   jax.ShapeDtypeStruct(SUV.shape, jnp.uint8)),
        input_output_aliases={len(params): 0, len(params) + 1: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(*params, S, SUV)
    return (_unshear(S2, 16, OFF, W, mb_h),
            _unshear(SUV2[:Hc], 8, OFFC, Wc, mb_h),
            _unshear(SUV2[Hc:], 8, OFFC, Wc, mb_h))
