"""Slice data parsing: per-MB syntax -> FrameSymbols tensors.

The serial entropy phase of the decoder. Mirrors the behavior of the
reference's WelsDecodeMbCavlc{I,P,B}Slice / WelsDecodeMbCabac* parse
(decode_slice.cpp:853-2610) but writes dense per-frame tensors instead
of reconstructing inline — reconstruction happens batched on device.
"""

from __future__ import annotations

import numpy as np

from ..bitstream import BitReader
from ..tables import CHROMA_QP_TABLE, DEQUANT_4x4, ZIGZAG_4x4
from ..tables.cavlc import (CBP_INTER, CBP_INTRA, CBP_I16x16)
from .cavlc import parse_residual_block
from .framedata import (FrameSymbols, MB_I4x4, MB_I16x16, MB_IPCM, MB_I8x8,
                        ZSCAN_TO_RASTER)
from .slicehdr import SliceHeader, I_SLICE, P_SLICE, B_SLICE

# chroma DC "zigzag": scan order of the 2x2 block (raster)
_CHROMA_DC_SCAN = np.array([0, 1, 2, 3], dtype=np.int32)
# luma DC scan: zigzag over the 4x4 DC array
_LUMA_DC_SCAN = ZIGZAG_4x4


class SliceDecodeContext:
    """Per-slice mutable parse state over a FrameSymbols target."""

    def __init__(self, fs: FrameSymbols, sh: SliceHeader, slice_idx: int):
        self.fs = fs
        self.sh = sh
        self.slice_idx = slice_idx
        self.mb_w = fs.mb_w
        self.mb_h = fs.mb_h
        self.qp = sh.qp  # running luma QP
        self.constrained_intra = sh.pps.constrained_intra_pred
        # global intra-4x4-mode grid for mode prediction: -1 unavail
        # (lazily shared across slices via fs)
        if not hasattr(fs, "i4_grid"):
            fs.i4_grid = np.full((fs.mb_h * 4, fs.mb_w * 4), -1, dtype=np.int32)

    # -- neighbor availability ----------------------------------------
    def mb_avail(self, mbx: int, mby: int) -> bool:
        if mbx < 0 or mby < 0 or mbx >= self.mb_w or mby >= self.mb_h:
            return False
        idx = mby * self.mb_w + mbx
        return self.fs.slice_id[idx] == self.slice_idx

    def mb_intra(self, mbx: int, mby: int) -> bool:
        idx = mby * self.mb_w + mbx
        return self.fs.mb_type[idx] in (MB_I4x4, MB_I16x16, MB_IPCM, MB_I8x8)

    # -- nC context (§9.2.1) ------------------------------------------
    def nc_luma(self, gx: int, gy: int) -> int:
        """gx, gy: global 4x4 luma block coords of current block."""
        na = self._nzc_at(gx - 1, gy, luma=True)
        nb = self._nzc_at(gx, gy - 1, luma=True)
        return self._combine_nc(na, nb)

    def nc_chroma(self, comp: int, cx: int, cy: int) -> int:
        na = self._nzc_at(cx - 1, cy, luma=False, comp=comp)
        nb = self._nzc_at(cx, cy - 1, luma=False, comp=comp)
        return self._combine_nc(na, nb)

    @staticmethod
    def _combine_nc(na, nb):
        if na >= 0 and nb >= 0:
            return (na + nb + 1) >> 1
        if na >= 0:
            return na
        if nb >= 0:
            return nb
        return 0

    def _nzc_at(self, bx: int, by: int, luma: bool, comp: int = 0) -> int:
        """Returns nzc or -1 if the block is unavailable."""
        scale = 4 if luma else 2
        if bx < 0 or by < 0:
            return -1
        mbx, mby = bx // scale, by // scale
        if not self.mb_avail(mbx, mby):
            return -1
        mb_idx = mby * self.mb_w + mbx
        if self.fs.mb_type[mb_idx] == MB_IPCM:
            return 16
        if luma:
            return int(self.fs.nzc_l[by, bx])
        return int(self.fs.nzc_c[comp, by, bx])

    # -- intra mode prediction (§8.3.1.1) ------------------------------
    def pred_intra4x4_mode(self, gx: int, gy: int) -> int:
        ma = self._i4_mode_at(gx - 1, gy)
        mb = self._i4_mode_at(gx, gy - 1)
        if ma < 0 or mb < 0:
            return 2
        return min(ma, mb)

    def _i4_mode_at(self, bx: int, by: int) -> int:
        if bx < 0 or by < 0:
            return -1
        mbx, mby = bx // 4, by // 4
        if not self.mb_avail(mbx, mby):
            return -1
        if not self.mb_intra(mbx, mby):
            return -1 if self.constrained_intra else 2
        m = int(self.fs.i4_grid[by, bx])
        return 2 if m < 0 else m


def decode_i_mb_cavlc(br: BitReader, ctx: SliceDecodeContext, mb_idx: int,
                      mb_type_raw: int) -> None:
    """Parse one intra MB (mb_type_raw: 0=I4x4, 1..24=I16x16, 25=IPCM)."""
    fs, sh = ctx.fs, ctx.sh
    mbx, mby = mb_idx % ctx.mb_w, mb_idx // ctx.mb_w
    fs.slice_id[mb_idx] = ctx.slice_idx
    fs.disable_deblock[mb_idx] = sh.disable_deblocking_filter_idc
    fs.alpha_offset[mb_idx] = sh.slice_alpha_c0_offset
    fs.beta_offset[mb_idx] = sh.slice_beta_offset
    fs.pred_mode[mb_idx, :] = -1

    if mb_type_raw == 25:  # IPCM
        fs.mb_type[mb_idx] = MB_IPCM
        while not br.byte_aligned():
            br.u(1)
        y = np.frombuffer(bytes(br.u(8) for _ in range(256)), np.uint8).reshape(16, 16)
        u = np.frombuffer(bytes(br.u(8) for _ in range(64)), np.uint8).reshape(8, 8)
        v = np.frombuffer(bytes(br.u(8) for _ in range(64)), np.uint8).reshape(8, 8)
        fs.ipcm[mb_idx] = (y, u, v)
        fs.qp[mb_idx] = ctx.qp
        # IPCM: nzc treated as 16 for deblock/nC purposes
        fs.nzc_l[mby * 4:mby * 4 + 4, mbx * 4:mbx * 4 + 4] = 16
        fs.nzc_c[:, mby * 2:mby * 2 + 2, mbx * 2:mbx * 2 + 2] = 16
        fs.i4_grid[mby * 4:mby * 4 + 4, mbx * 4:mbx * 4 + 4] = 2
        return

    if mb_type_raw == 0:  # I_4x4 (or I_8x8 with transform flag)
        t8 = False
        if sh.pps.transform_8x8_mode:
            t8 = br.flag()
        fs.mb_type[mb_idx] = MB_I8x8 if t8 else MB_I4x4
        fs.transform8[mb_idx] = t8
        n_units = 4 if t8 else 16
        modes = np.zeros(16, dtype=np.int32)
        for k in range(n_units):
            if t8:
                bx8, by8 = (k & 1) * 2, (k >> 1) * 2
                gx, gy = mbx * 4 + bx8, mby * 4 + by8
            else:
                bx, by = ZSCAN_TO_RASTER[k] % 4, ZSCAN_TO_RASTER[k] // 4
                gx, gy = mbx * 4 + bx, mby * 4 + by
            pred = ctx.pred_intra4x4_mode(gx, gy)
            if br.flag():  # prev_intra_pred_mode_flag
                mode = pred
            else:
                rem = br.u(3)
                mode = rem if rem < pred else rem + 1
            if t8:
                fs.i4_grid[gy:gy + 2, gx:gx + 2] = mode
                modes[[by8 * 4 + bx8, by8 * 4 + bx8 + 1,
                       (by8 + 1) * 4 + bx8, (by8 + 1) * 4 + bx8 + 1]] = mode
            else:
                fs.i4_grid[gy, gx] = mode
                modes[ZSCAN_TO_RASTER[k]] = mode
        fs.i4_modes[mb_idx] = modes
        fs.chroma_mode[mb_idx] = br.ue()
        cbp_code = br.ue()
        if cbp_code >= 48:
            raise ValueError("invalid cbp")
        cbp = int(CBP_INTRA[cbp_code])
    else:  # I16x16
        fs.mb_type[mb_idx] = MB_I16x16
        mt = mb_type_raw - 1
        fs.i16_mode[mb_idx] = mt & 3
        cbp = int(CBP_I16x16[mt >> 2])
        fs.i4_grid[mby * 4:mby * 4 + 4, mbx * 4:mbx * 4 + 4] = 2
        fs.chroma_mode[mb_idx] = br.ue()
    fs.cbp[mb_idx] = cbp

    parse_mb_residual_cavlc(br, ctx, mb_idx, cbp,
                            is_i16=(fs.mb_type[mb_idx] == MB_I16x16))


def parse_mb_residual_cavlc(br: BitReader, ctx: SliceDecodeContext,
                            mb_idx: int, cbp: int, is_i16: bool) -> None:
    """Residual parse + dequant into FrameSymbols (§7.3.5.3 / §9.2).

    Dequant mirrors the reference parse-time scaling
    (parse_mb_syn_cavlc.cpp:936-976): chroma DC gets the 2x2 inverse
    Hadamard + (v*dq[0])>>1, luma DC gets WelsLumaDcDequantIdct, AC
    coefficients are multiplied by the per-position dequant row.
    """
    from ..oracle.transform import (chroma_dc_dequant_ihadamard,
                                    luma_dc_dequant_ihadamard)

    fs, sh = ctx.fs, ctx.sh
    mbx, mby = mb_idx % ctx.mb_w, mb_idx // ctx.mb_w

    if is_i16 or cbp:
        delta = br.se()
        if delta:
            ctx.qp = (ctx.qp + delta + 52) % 52
    fs.qp[mb_idx] = ctx.qp
    qp = ctx.qp
    # per-plane chroma QP (Cb: primary offset, Cr: secondary offset)
    offs = (sh.pps.chroma_qp_index_offset, sh.pps.second_chroma_qp_index_offset)
    fs.chroma_qp_offsets = offs
    qp_c = [int(CHROMA_QP_TABLE[np.clip(qp + o, 0, 51)]) for o in offs]
    dq_l = DEQUANT_4x4[qp]
    dq_c = [DEQUANT_4x4[q] for q in qp_c]

    nzc_l = np.zeros(16, dtype=np.int32)  # raster block order

    if is_i16:
        # luma DC: nC from block (0,0) position context
        gx, gy = mbx * 4, mby * 4
        nc = ctx.nc_luma(gx, gy)
        dc_scan, _ = parse_residual_block(br, nc, 16)
        dc = np.zeros(16, dtype=np.int32)
        dc[_LUMA_DC_SCAN] = dc_scan
        rec_dc = luma_dc_dequant_ihadamard(dc.reshape(4, 4), qp)
        # write DC into coefficient slot 0 of each 4x4 block (raster)
        fs.coeffs_l[mb_idx, :, 0] = rec_dc.reshape(-1)

    # luma AC / 4x4 blocks in z-scan order
    for k in range(16):
        raster = int(ZSCAN_TO_RASTER[k])
        bx, by = raster % 4, raster // 4
        gx, gy = mbx * 4 + bx, mby * 4 + by
        blk8 = (by >> 1) * 2 + (bx >> 1)
        if not (cbp & (1 << blk8)):
            fs.nzc_l[gy, gx] = 0
            continue
        nc = ctx.nc_luma(gx, gy)
        if is_i16:
            coeffs_scan, tc = parse_residual_block(br, nc, 15)
            blkc = np.zeros(16, dtype=np.int32)
            blkc[ZIGZAG_4x4[1:]] = coeffs_scan
        else:
            coeffs_scan, tc = parse_residual_block(br, nc, 16)
            blkc = np.zeros(16, dtype=np.int32)
            blkc[ZIGZAG_4x4] = coeffs_scan
        deq = blkc * dq_l
        if is_i16:
            deq[0] = fs.coeffs_l[mb_idx, raster, 0]
        fs.coeffs_l[mb_idx, raster] = deq
        fs.nzc_l[gy, gx] = tc
        nzc_l[raster] = tc

    # chroma DC (cbp chroma bits: 0x30 mask; any nonzero -> DC present)
    if cbp & 0x30:
        for comp in range(2):
            dc_scan, _ = parse_residual_block(br, -1, 4)
            dc2 = dc_scan.reshape(2, 2)
            rec = chroma_dc_dequant_ihadamard(dc2, qp_c[comp])
            fs.coeffs_c[mb_idx, comp, :, 0] = rec.reshape(-1)
    # chroma AC
    if cbp & 0x20:
        for comp in range(2):
            for k in range(4):
                bx, by = k % 2, k // 2
                cx, cy = mbx * 2 + bx, mby * 2 + by
                nc = ctx.nc_chroma(comp, cx, cy)
                coeffs_scan, tc = parse_residual_block(br, nc, 15)
                blkc = np.zeros(16, dtype=np.int32)
                blkc[ZIGZAG_4x4[1:]] = coeffs_scan
                deq = blkc * dq_c[comp]
                deq[0] = fs.coeffs_c[mb_idx, comp, k, 0]
                fs.coeffs_c[mb_idx, comp, k] = deq
                fs.nzc_c[comp, cy, cx] = tc
    else:
        fs.nzc_c[:, mby * 2:mby * 2 + 2, mbx * 2:mbx * 2 + 2] = 0


def decode_slice_data_cavlc(br: BitReader, ctx: SliceDecodeContext) -> int:
    """Parse all MBs of a slice. Returns index one past the last MB."""
    sh = ctx.sh
    fs = ctx.fs
    mb_idx = sh.first_mb_in_slice
    n_mb = ctx.mb_w * ctx.mb_h
    if sh.slice_type == I_SLICE:
        while True:
            mb_type_raw = br.ue()
            decode_i_mb_cavlc(br, ctx, mb_idx, mb_type_raw)
            mb_idx += 1
            if mb_idx >= n_mb or not br.more_rbsp_data():
                break
        return mb_idx
    raise NotImplementedError(f"slice type {sh.slice_type} parse")
