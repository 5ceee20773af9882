from .encoder import H264Encoder, EncoderConfig
