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



def _box_set(x, upd, starts, axis=0):
    """x[box] = upd for a static box, built from slices + concats
    (Mosaic lowers neither scatter nor value-level
    dynamic_update_slice; contiguous concatenation it handles well)."""
    if axis == len(starts):
        return upd
    st = starts[axis]
    u = upd.shape[axis]
    mid = _box_set(jax.lax.slice_in_dim(x, st, st + u, axis=axis),
                   upd, starts, axis + 1)
    parts = []
    if st > 0:
        parts.append(jax.lax.slice_in_dim(x, 0, st, axis=axis))
    parts.append(mid)
    if st + u < x.shape[axis]:
        parts.append(jax.lax.slice_in_dim(x, st + u, x.shape[axis],
                                          axis=axis))
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis)


def _kernel(bs_v, a_v, b_v, t_v, bs_h, a_h, b_h, t_h,
            bsc_v, ac_v, bc_v, tc_v, bsc_h, ac_h, bc_h, tc_h,
            S_in, SUV_in, S_ref, SUV_ref,
            wl_ref, wc_ref, R_ref, RUV_ref, sem_l, sem_c,
            *, mb_h, Hc):
    """One wavefront diagonal.

    The sheared planes live in HBM: their 16-px-stride moving window
    cannot satisfy the vector units' lane-alignment rules, and Mosaic
    has no relayout for the halo/own interleave — so ALL irregular
    data movement here is DMA (alignment-free): HBM window -> VMEM
    (wl/wc), own+halo gather into the per-band R tiles, filtered
    writeback, VMEM -> HBM. The filter math itself runs on statically
    sliced VMEM tiles (spec 8.7.2.3-4; parity: deblocking_common.cpp
    DeblockLuma{Lt4,Eq4}_c)."""
    del S_in, SUV_in  # aliased into S_ref / SUV_ref
    J = mb_h
    d = pl.program_id(0)
    bs_v, a_v, b_v, t_v = bs_v[0], a_v[0], b_v[0], t_v[0]
    bs_h, a_h, b_h, t_h = bs_h[0], a_h[0], b_h[0], t_h[0]
    bsc_v, ac_v, bc_v, tc_v = bsc_v[0], ac_v[0], bc_v[0], tc_v[0]
    bsc_h, ac_h, bc_h, tc_h = bsc_h[0], ac_h[0], bc_h[0], tc_h[0]

    def dma(src, dst, sem):
        cp = pltpu.make_async_copy(src, dst, sem)
        cp.start()
        cp.wait()

    # HBM window -> VMEM
    dma(S_ref.at[:, :, pl.ds(16 * d, 56)], wl_ref, sem_l)
    dma(SUV_ref.at[:, :, pl.ds(8 * d, 28)], wc_ref, sem_c)
    # assemble R tiles: 16 own rows (left-halo cols included) + 4 halo
    # rows from the band above (which the shear parks at cols 0:20)
    dma(wl_ref.at[:, :, 32:52], R_ref.at[:, 4:20, :], sem_l)
    dma(wl_ref.at[0:J - 1, 12:16, 0:20], R_ref.at[1:J, 0:4, :], sem_l)
    dma(wc_ref.at[:, :, 16:26], RUV_ref.at[:, 2:10, :], sem_c)
    dma(wc_ref.at[0:J - 1, 6:8, 0:10], RUV_ref.at[1:J, 0:2, :], sem_c)
    dma(wc_ref.at[J:2 * J - 1, 6:8, 0:10],
        RUV_ref.at[J + 1:2 * J, 0:2, :], sem_c)
    # (band 0's halo rows are stale scratch — harmless: top_ok masks
    # their boundary strengths to 0 and they are never written back)

    def tile2(a):
        return jnp.concatenate([a, a], 0)

    for e in range(4):
        sub = R_ref[:, 4:20, 4 * e:4 * e + 8].astype(jnp.int32)
        new = _luma_edge(sub, bs_v[:, e], a_v[:, e:e + 1],
                         b_v[:, e:e + 1], t_v[:, e])
        R_ref[:, 4:20, 4 * e + 1:4 * e + 7] = new.astype(R_ref.dtype)
        if e in (0, 2):
            ce = e // 2
            subc = RUV_ref[:, 2:10, 4 * ce:4 * ce + 4].astype(jnp.int32)
            newc = _chroma_edge(subc, tile2(bsc_v[:, ce]),
                                tile2(ac_v[:, ce:ce + 1]),
                                tile2(bc_v[:, ce:ce + 1]),
                                tile2(tc_v[:, ce]))
            RUV_ref[:, 2:10, 4 * ce + 1:4 * ce + 3] = newc.astype(
                RUV_ref.dtype)

    for e in range(4):
        sub = R_ref[:, 4 * e:4 * e + 8, 4:20].astype(
            jnp.int32).transpose(0, 2, 1)
        new = _luma_edge(sub, bs_h[:, e], a_h[:, e:e + 1],
                         b_h[:, e:e + 1], t_h[:, e])
        R_ref[:, 4 * e + 1:4 * e + 7, 4:20] = new.transpose(
            0, 2, 1).astype(R_ref.dtype)
        if e in (0, 2):
            ce = e // 2
            subc = RUV_ref[:, 4 * ce:4 * ce + 4, 2:10].astype(
                jnp.int32).transpose(0, 2, 1)
            newc = _chroma_edge(subc, tile2(bsc_h[:, ce]),
                                tile2(ac_h[:, ce:ce + 1]),
                                tile2(bc_h[:, ce:ce + 1]),
                                tile2(tc_h[:, ce]))
            RUV_ref[:, 4 * ce + 1:4 * ce + 3, 2:10] = newc.transpose(
                0, 2, 1).astype(RUV_ref.dtype)

    # scatter the filtered tiles back and push the window to HBM
    dma(R_ref.at[:, 4:20, :], wl_ref.at[:, :, 32:52], sem_l)
    dma(R_ref.at[1:J, 0:4, :], wl_ref.at[0:J - 1, 12:16, 0:20], sem_l)
    dma(RUV_ref.at[:, 2:10, :], wc_ref.at[:, :, 16:26], sem_c)
    dma(RUV_ref.at[1:J, 0:2, :], wc_ref.at[0:J - 1, 6:8, 0:10], sem_c)
    dma(RUV_ref.at[J + 1:2 * J, 0:2, :],
        wc_ref.at[J:2 * J - 1, 6:8, 0:10], sem_c)
    dma(wl_ref, S_ref.at[:, :, pl.ds(16 * d, 56)], sem_l)
    dma(wc_ref, SUV_ref.at[:, :, pl.ds(8 * d, 28)], sem_c)


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

    # banded shapes [J, 16, WS] / [2J, 8, WSC]: the kernel's window and
    # halo DMAs address (band, row, col) boxes directly
    S = _shear(y, 16, OFF, WS, mb_h).reshape(J, 16, WS)
    SUV = jnp.concatenate([_shear(u, 8, OFFC, WSC, mb_h),
                           _shear(v, 8, OFFC, WSC, mb_h)],
                          0).reshape(2 * J, 8, WSC)
    params = _wavefront_params(BSV, BSH, qp_mb, cqp_mb, mb_w, mb_h)

    def pspec(p):
        blk = (1,) + p.shape[1:]
        return pl.BlockSpec(blk, lambda d: (d,) + (0,) * (p.ndim - 1),
                            memory_space=pltpu.VMEM)

    in_specs = [pspec(p) for p in params] + [
        pl.BlockSpec(memory_space=pltpu.HBM),
        pl.BlockSpec(memory_space=pltpu.HBM),
    ]
    kern = functools.partial(_kernel, mb_h=mb_h, Hc=Hc)
    S2, SUV2 = pl.pallas_call(
        kern,
        grid=(nd,),
        in_specs=in_specs,
        out_specs=(pl.BlockSpec(memory_space=pltpu.HBM),
                   pl.BlockSpec(memory_space=pltpu.HBM)),
        out_shape=(jax.ShapeDtypeStruct(S.shape, jnp.uint8),
                   jax.ShapeDtypeStruct(SUV.shape, jnp.uint8)),
        input_output_aliases={len(params): 0, len(params) + 1: 1},
        scratch_shapes=[
            pltpu.VMEM((J, 16, 56), jnp.uint8),
            pltpu.VMEM((2 * J, 8, 28), jnp.uint8),
            pltpu.VMEM((J, 20, 20), jnp.uint8),
            pltpu.VMEM((2 * J, 10, 10), jnp.uint8),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(*params, S, SUV)
    return (_unshear(S2.reshape(J * 16, WS), 16, OFF, W, mb_h),
            _unshear(SUV2.reshape(2 * Hc, WSC)[:Hc], 8, OFFC, Wc, mb_h),
            _unshear(SUV2.reshape(2 * Hc, WSC)[Hc:], 8, OFFC, Wc, mb_h))
