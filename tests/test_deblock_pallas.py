"""Pallas deblock wavefront: bit-exact twin of the XLA formulation.

Runs the kernel in interpreter mode on CPU (the driver/bench exercise
the compiled path on real TPU); deblock_frame_device is itself pinned
against oracle/deblock which is conformance-tested, so equality here
extends the chain to the Pallas kernel.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from openh264_tpu.encoder.deblock_jax import deblock_frame_device
from openh264_tpu.encoder.deblock_pallas import deblock_frame_pallas


@pytest.mark.parametrize("mbw,mbh,seed", [(6, 5, 0), (4, 7, 1), (9, 3, 2)])
def test_pallas_matches_xla(mbw, mbh, seed):
    rng = np.random.default_rng(seed)
    H, W = mbh * 16, mbw * 16
    y = jnp.asarray(rng.integers(0, 256, (H, W), np.uint8))
    u = jnp.asarray(rng.integers(0, 256, (H // 2, W // 2), np.uint8))
    v = jnp.asarray(rng.integers(0, 256, (H // 2, W // 2), np.uint8))
    BSV = jnp.asarray(rng.integers(0, 5, (mbh * 4, mbw * 4), np.int32))
    BSH = jnp.asarray(rng.integers(0, 5, (mbh * 4, mbw * 4), np.int32))
    qp = jnp.asarray(rng.integers(18, 42, mbw * mbh, np.int32))
    cqp = jnp.asarray(rng.integers(18, 42, mbw * mbh, np.int32))

    want = deblock_frame_device(y, u, v, BSV, BSH, qp, cqp, mbw, mbh)
    got = deblock_frame_pallas(y, u, v, BSV, BSH, qp, cqp, mbw, mbh,
                               interpret=True)
    for g, w in zip(got, want):
        assert np.array_equal(np.asarray(g), np.asarray(w))
