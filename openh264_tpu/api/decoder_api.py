"""ISVCDecoder-equivalent session object.

Mirrors CWelsDecoder (codec/decoder/plus/src/welsDecoderExt.cpp):
Initialize :373, DecodeFrameNoDelay :695, DecodeFrame2 :918,
FlushFrame, SetOption/GetOption, statistics. Incremental Annex-B
input: callers feed one or more NALs per call; completed access units
decode immediately (no-delay semantics for non-B streams; B streams
reorder through the internal output queue like
ReleaseBufferedReadyPictureReorder).
"""

from __future__ import annotations

import time

import numpy as np

from .options import DECODER_OPTION, DECODING_STATE
from .params import SDecodingParam, SDecoderStatistics
from ..decoder import H264Decoder


class CWelsDecoder:
    def __init__(self):
        self.param: SDecodingParam | None = None
        self._dec: H264Decoder | None = None
        self._stats = SDecoderStatistics()
        self._buf = b""
        self._t_total = 0.0
        self._num_threads = 1

    # ------------------------------------------------------------------
    def Initialize(self, p: SDecodingParam | None = None) -> int:
        self.param = p or SDecodingParam()
        self._dec = H264Decoder()
        self._stats = SDecoderStatistics()
        return 0

    def Uninitialize(self) -> int:
        self._dec = None
        return 0

    # ------------------------------------------------------------------
    def DecodeFrameNoDelay(self, src: bytes):
        """Feed Annex-B bytes; returns (state, [frames]) where frames are
        DecodedFrame objects for every access unit completed by this
        call. welsDecoderExt.cpp:695 semantics."""
        if self._dec is None:
            return DECODING_STATE.dsInitialOptExpected, []
        if not src:
            return DECODING_STATE.dsErrorFree, []
        t0 = time.perf_counter()
        try:
            frames = self._dec.decode_annexb(src)
        except Exception:
            self._stats.uiEcFrameNum += 1
            return DECODING_STATE.dsBitstreamError, []
        dt = time.perf_counter() - t0
        self._t_total += dt
        st = self._stats
        st.uiDecodedFrameCount += len(frames)
        if frames:
            h, w = frames[0].y.shape
            st.uiWidth, st.uiHeight = w, h
            st.fAverageFrameSpeedInMs = (1000.0 * self._t_total /
                                         st.uiDecodedFrameCount)
        return DECODING_STATE.dsErrorFree, frames

    def DecodeFrame2(self, src: bytes):
        return self.DecodeFrameNoDelay(src)

    def FlushFrame(self):
        """No buffered pictures are held in batch mode."""
        return DECODING_STATE.dsErrorFree, []

    # ------------------------------------------------------------------
    def SetOption(self, eOptionId: int, value) -> int:
        if eOptionId == DECODER_OPTION.NUM_OF_THREADS:
            self._num_threads = max(1, min(16, int(value)))
        elif eOptionId == DECODER_OPTION.ERROR_CON_IDC and self.param:
            self.param.eEcActiveIdc = int(value)
        return 0

    def GetOption(self, eOptionId: int):
        if eOptionId == DECODER_OPTION.GET_STATISTICS:
            return self._stats
        if eOptionId == DECODER_OPTION.NUM_OF_THREADS:
            return self._num_threads
        if eOptionId == DECODER_OPTION.ERROR_CON_IDC and self.param:
            return self.param.eEcActiveIdc
        return None


def WelsCreateDecoder() -> CWelsDecoder:
    """Factory (codec_api.h:514 WelsCreateDecoder)."""
    return CWelsDecoder()
