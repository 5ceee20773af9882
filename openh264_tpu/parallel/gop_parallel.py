"""GOP-level data parallelism across TPU devices.

Closed GOPs (each starting with an IDR) share no prediction state, so
they are the natural zero-communication sharding axis for offline /
multi-chip encoding (BASELINE.md config #5: "GOPs sharded across
hosts"; the reference has no analog — it is a single-process codec,
SURVEY.md §2.6). Each device runs its own DeviceSessionEncoder; JAX's
async dispatch keeps every device's queue busy concurrently, and the
host stitches the per-GOP Annex-B chunks back in input order.

Because a closed GOP encodes independently of its neighbors, the
output is byte-identical to a single-session encode with the same
idr_interval — which is exactly what the test asserts.
"""

from __future__ import annotations

import copy
from concurrent.futures import ThreadPoolExecutor

import jax


class GopParallelEncoder:
    """Encode closed GOPs round-robin across `devices`.

    cfg.idr_interval defines the GOP length (must be > 0). RC state is
    per-GOP (each session starts fresh), matching the closed-GOP
    semantics; constant-QP output is byte-identical to serial encode.
    """

    def __init__(self, cfg, devices=None):
        if cfg.idr_interval <= 0:
            raise ValueError("GOP parallelism needs idr_interval > 0 "
                             "(closed GOPs)")
        self.cfg = cfg
        self.devices = list(devices if devices is not None
                            else jax.devices())

    def encode_stream(self, frames) -> list[bytes]:
        from ..encoder.session_device import DeviceSessionEncoder
        frames = list(frames)
        g = self.cfg.idr_interval
        gops = [frames[i:i + g] for i in range(0, len(frames), g)]

        def run(args):
            gi, gop = args
            dev = self.devices[gi % len(self.devices)]
            with jax.default_device(dev):
                enc = DeviceSessionEncoder(copy.deepcopy(self.cfg))
                # match the serial session's idr_pic_id sequence so the
                # stitched stream is byte-identical to serial encode
                enc.idr_pic_id = gi % 16
                return enc.encode_stream(iter(gop))

        # one host thread per device keeps every device queue fed;
        # all device work runs concurrently via async dispatch
        with ThreadPoolExecutor(max_workers=len(self.devices)) as ex:
            per_gop = list(ex.map(run, enumerate(gops)))
        return [b for chunks in per_gop for b in chunks]
