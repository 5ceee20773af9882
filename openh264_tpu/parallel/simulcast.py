"""Spatial simulcast encoding (Simulcast AVC, BASELINE config #5).

The reference's multi-spatial-layer loop (encoder_ext.cpp:3533) encodes
each resolution as an independent AVC stream distinguished by parameter
-set ids (EParameterSetStrategy CONSTANT_ID per layer). Here each layer
is its own encoder session over a dyadically-downsampled input
(processing/downsample.py — the jitted twin of the reference's VP
downsample filter), producing one Annex-B stream per layer plus a
combined stream whose NALs carry distinct sps/pps ids like the
reference's SFrameBSInfo layer list.

Layer sessions are independent by construction, so on a multi-chip
mesh they map one-per-device (each chip owns a resolution) with no
cross-layer collectives — simulcast has none by definition. Pass
`devices=` to pin layer k to devices[k % len(devices)]; each layer's
frame then encodes concurrently via a host thread per layer feeding
its device's async queue (the same pattern as gop_parallel.py).
"""

from __future__ import annotations

import numpy as np


class SimulcastEncoder:
    """N-resolution simulcast: layer 0 = full size, layer k = 1/2^k."""

    def __init__(self, base_cfg, n_layers: int = 2, devices=None):
        self.devices = list(devices) if devices else None
        if self.devices:
            from concurrent.futures import ThreadPoolExecutor
            self._pool = ThreadPoolExecutor(max_workers=n_layers)
        self._init_layers(base_cfg, n_layers)

    def _init_layers(self, base_cfg, n_layers: int):
        from ..encoder.encoder import EncoderConfig, H264Encoder
        if not (1 <= n_layers <= 4):
            raise ValueError("1..4 spatial layers (codec_app_def.h MAX)")
        self.n_layers = n_layers
        self.encoders = []
        for k in range(n_layers):
            w = base_cfg.width >> k
            h = base_cfg.height >> k
            if w < 16 or h < 16:
                raise ValueError(f"layer {k} too small: {w}x{h}")
            cfg = EncoderConfig(
                width=w, height=h, qp=base_cfg.qp,
                idr_interval=base_cfg.idr_interval,
                entropy_cabac=base_cfg.entropy_cabac,
                pic_init_qp=base_cfg.pic_init_qp,
                search_range=base_cfg.search_range,
                deblock_idc=base_cfg.deblock_idc,
                temporal_layers=base_cfg.temporal_layers,
                rc_mode=base_cfg.rc_mode,
                target_bitrate=base_cfg.target_bitrate >> (2 * k),
                max_frame_rate=base_cfg.max_frame_rate,
                sps_id=k, pps_id=k)
            self.encoders.append(H264Encoder(cfg))

    def _encode_layer(self, k, y, u, v):
        from ..processing.downsample import dyadic_downsample
        import jax
        import jax.numpy as jnp
        enc = self.encoders[k]

        def run():
            if k == 0:
                yk, uk, vk = y, u, v
            else:
                yk = np.asarray(dyadic_downsample(jnp.asarray(y), k))
                uk = np.asarray(dyadic_downsample(jnp.asarray(u), k))
                vk = np.asarray(dyadic_downsample(jnp.asarray(v), k))
            h, w = enc.cfg.height, enc.cfg.width
            return enc.encode_frame(yk[:h, :w], uk[:h // 2, :w // 2],
                                    vk[:h // 2, :w // 2])

        if self.devices:
            dev = self.devices[k % len(self.devices)]
            with jax.default_device(dev):
                return run()
        return run()

    def encode_frame(self, y, u, v):
        """Returns (combined_annexb, [per_layer_annexb...]); layer 0
        first, matching SFrameBSInfo.sLayerInfo ordering. With
        `devices`, all layers encode concurrently (one thread each)."""
        if self.devices:
            futs = [self._pool.submit(self._encode_layer, k, y, u, v)
                    for k in range(self.n_layers)]
            layers = [f.result() for f in futs]
        else:
            layers = [self._encode_layer(k, y, u, v)
                      for k in range(self.n_layers)]
        return b"".join(layers), layers
