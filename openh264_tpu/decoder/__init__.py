from .decoder import H264Decoder
