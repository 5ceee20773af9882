"""Dequantization with optional scaling lists (High profile).

Parity: decode_slice.cpp:1486 WelsCalcDeqCoeffScalingList and the
per-property scaling in parse_mb_syn_cavlc/cabac residual paths:
- flat 4x4: level * DEQUANT_4x4[qp][pos]
- list 4x4: (level * sl4[prop][pos] * DEQUANT_4x4[qp][pos] + 8) >> 4
- flat 8x8: base = 16*V8; list 8x8: base = sl8[prop]*V8; then
  qp>=36 ? v<<(qp/6-6) : (v + (1<<(5-qp/6))) >> (6-qp/6)
Properties: 0..2 intra Y/Cb/Cr, 3..5 inter Y/Cb/Cr (4x4); 0 intra /
1 inter (8x8).
"""

from __future__ import annotations

import numpy as np

from ..tables import DEQUANT_4x4, DEQUANT_8x8


class DequantTables:
    def __init__(self, sps, pps):
        self.use = bool(sps.seq_scaling_matrix_present or
                        pps.pic_scaling_matrix_present)
        if not self.use:
            return
        if pps.pic_scaling_matrix_present:
            sl4, sl8 = pps.scaling_lists_4x4, pps.scaling_lists_8x8
        else:
            sl4, sl8 = sps.scaling_lists_4x4, sps.scaling_lists_8x8
        self.dq4 = np.zeros((6, 52, 16), dtype=np.int64)
        for p in range(6):
            for qp in range(52):
                self.dq4[p, qp] = sl4[p].astype(np.int64) * DEQUANT_4x4[qp]
        n8 = len(sl8) if sl8 is not None else 0
        self.dq8 = np.zeros((max(2, n8), 52, 64), dtype=np.int64)
        for p in range(n8):
            for qp in range(52):
                self.dq8[p, qp] = sl8[p].astype(np.int64) * DEQUANT_8x8[qp]

    # ---- 4x4 AC ----
    def luma_ac(self, levels16, qp: int, intra: bool):
        if not self.use:
            return levels16 * DEQUANT_4x4[qp]
        prop = 0 if intra else 3
        return ((levels16.astype(np.int64) * self.dq4[prop, qp] + 8) >> 4).astype(np.int32)

    def chroma_ac(self, levels16, qp_c: int, intra: bool, comp: int):
        if not self.use:
            return levels16 * DEQUANT_4x4[qp_c]
        prop = (1 + comp) if intra else (4 + comp)
        return ((levels16.astype(np.int64) * self.dq4[prop, qp_c] + 8) >> 4).astype(np.int32)

    # ---- DC multipliers ----
    def luma_dc_qmul(self, qp: int) -> int:
        if not self.use:
            return int(DEQUANT_4x4[qp][0]) << 4
        return int(self.dq4[0, qp, 0])

    def chroma_dc(self, had2x2, qp_c: int, intra: bool, comp: int):
        """Input: 2x2 after inverse Hadamard; returns scaled int32."""
        from ..oracle.transform import wrap_i16
        if not self.use:
            return wrap_i16((had2x2 * int(DEQUANT_4x4[qp_c][0])) >> 1)
        prop = (1 + comp) if intra else (4 + comp)
        return wrap_i16((had2x2.astype(np.int64) * int(self.dq4[prop, qp_c, 0])) >> 5)

    # ---- 8x8 ----
    def luma8x8(self, levels64, qp: int, intra: bool):
        if not self.use:
            base = levels64.astype(np.int64) * (DEQUANT_8x8[qp].astype(np.int64) * 16)
        else:
            prop = 0 if intra else 1
            base = levels64.astype(np.int64) * self.dq8[prop, qp]
        if qp >= 36:
            return (base << (qp // 6 - 6)).astype(np.int32)
        return ((base + (1 << (5 - qp // 6))) >> (6 - qp // 6)).astype(np.int32)


FLAT = None  # sentinel: callers construct DequantTables per picture
