"""Public SDK surface mirroring the reference codec API.

Python-native equivalents of the reference's `ISVCEncoder`/`ISVCDecoder`
COM-style interfaces (codec/api/wels/codec_api.h:272-467), their factory
functions (WelsCreateSVCEncoder / WelsCreateDecoder), the parameter
structs (codec_app_def.h:525-621), option ids (codec_app_def.h:106-172),
and statistics structs (codec_app_def.h:745-809).
"""

from .params import (SEncParamBase, SEncParamExt, SSpatialLayerConfig,
                     SDecodingParam, SEncoderStatistics, SDecoderStatistics,
                     SSliceArgument,
                     CAMERA_VIDEO_REAL_TIME, SCREEN_CONTENT_REAL_TIME,
                     RC_QUALITY_MODE, RC_BITRATE_MODE, RC_BUFFERBASED_MODE,
                     RC_TIMESTAMP_MODE, RC_OFF_MODE, RC_MODES,
                     SM_SINGLE_SLICE, SM_FIXEDSLCNUM_SLICE, SM_RASTER_SLICE,
                     SM_SIZELIMITED_SLICE,
                     VIDEO_BITSTREAM_AVC, VIDEO_BITSTREAM_SVC)
from .options import (ENCODER_OPTION, DECODER_OPTION, DECODING_STATE)
from .encoder_api import CWelsH264SVCEncoder, WelsCreateSVCEncoder
from .decoder_api import CWelsDecoder, WelsCreateDecoder

__all__ = [n for n in dir() if not n.startswith("_")]
