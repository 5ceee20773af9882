"""Device-resident encoder pipeline: JAX entropy + deblock parity.

The device fast path moves CAVLC tokenization, bit packing and in-loop
deblocking onto the TPU; these tests pin each stage bit-exact against
the proven host implementations (cavlc_vec / oracle.deblock), which are
themselves conformance-tested against the reference decoder.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from openh264_tpu.encoder import core_jax, cavlc_vec, entropy_jax, deblock_jax
from openh264_tpu.encoder.encoder import EncoderConfig, H264Encoder, _Planes
from openh264_tpu.encoder.core_np import pad_to_mb
from openh264_tpu.oracle.deblock import deblock_frame
from openh264_tpu.oracle.deblock_bs import precompute_bs
from openh264_tpu.tables import CHROMA_QP_TABLE


def _p_frame_symbols(seed=1, mbw=6, mbh=5, qp=28, intra_mbs=(3, 7, 12)):
    rng = np.random.RandomState(seed)
    W, H = mbw * 16, mbh * 16
    n_mb = mbw * mbh
    y = rng.randint(0, 255, (H, W), np.uint8)
    u = rng.randint(0, 255, (H // 2, W // 2), np.uint8)
    v = rng.randint(0, 255, (H // 2, W // 2), np.uint8)
    ry = (y.astype(np.int32) + rng.randint(-6, 6, y.shape)).clip(0, 255).astype(np.uint8)
    ru = (u.astype(np.int32) + rng.randint(-4, 4, u.shape)).clip(0, 255).astype(np.uint8)
    out = core_jax.encode_p_frame(
        jnp.asarray(y), jnp.asarray(u), jnp.asarray(v),
        jnp.asarray(ry), jnp.asarray(ru), jnp.asarray(v),
        qp, qp, mb_w=mbw, mb_h=mbh, sr=8)
    out = {k: np.asarray(val) for k, val in out.items()}
    im = np.zeros(n_mb, bool)
    im[list(intra_mbs)] = True
    iout = core_jax.encode_i_frame(
        jnp.asarray(y), jnp.asarray(u), jnp.asarray(v), qp, qp,
        mb_w=mbw, mb_h=mbh, intra_mask=jnp.asarray(im),
        init_recon=(jnp.asarray(out["recon_y"]), jnp.asarray(out["recon_u"]),
                    jnp.asarray(out["recon_v"])))
    iout = {k: np.asarray(val) for k, val in iout.items()}
    out["intra_mask"] = im
    out["i16_mode"] = iout["i16_mode"]
    out["chroma_mode"] = iout["chroma_mode"]
    out["luma_dc"] = iout["luma_dc"]
    for k in ("luma_ac", "chroma_dc", "chroma_ac"):
        out[k] = out[k].copy()
        out[k][im] = iout[k][im]
    out["slice_qp"] = qp
    return out, mbw, mbh, qp


def test_p_slice_stream_matches_numpy():
    """Device token slots differ in layout from cavlc_vec (position-
    keyed vs emission-keyed), but the concatenation of live tokens must
    produce the identical bit stream."""
    for seed in (1, 2):
        out, mbw, mbh, qp = _p_frame_symbols(seed=seed)
        av, al, tv, tl = cavlc_vec.write_p_slice_tokens(out, mbw, mbh)
        hdr_bits = np.zeros(0, np.uint8)
        groups = [(av, al)] + ([(tv, tl)] if tv is not None else [])
        ref = cavlc_vec.assemble_rbsp(hdr_bits, groups)
        av2, al2 = entropy_jax.p_slice_tokens(out, mbw, mbh, qp)
        packed, nbits, ovf = entropy_jax.pack_tokens_device(
            av2, al2, 0, 1 << 13)
        assert not bool(ovf)
        nbits = int(nbits)
        got = bytearray(np.asarray(packed)[:(nbits + 8) // 8].tobytes())
        got[nbits // 8] |= 0x80 >> (nbits % 8)   # host-side stop bit
        assert bytes(got) == ref


def test_pack_tokens_device_matches_assemble_rbsp():
    out, mbw, mbh, qp = _p_frame_symbols(seed=4)
    av, al, tv, tl = cavlc_vec.write_p_slice_tokens(out, mbw, mbh)
    hdr_bits = np.random.RandomState(0).randint(0, 2, 29).astype(np.uint8)
    groups = [(av, al)] + ([(tv, tl)] if tv is not None else [])
    ref = cavlc_vec.assemble_rbsp(hdr_bits, groups)
    av2, al2 = entropy_jax.p_slice_tokens(out, mbw, mbh, qp)
    packed, nbits, ovf = entropy_jax.pack_tokens_device(
        av2, al2, len(hdr_bits) % 8, 1 << 13)
    assert not bool(ovf)
    packed = np.asarray(packed)
    nbits = int(nbits)
    hb = len(hdr_bits)
    body = bytearray(packed[:(nbits + 8) // 8].tobytes())
    body[nbits // 8] |= 0x80 >> (nbits % 8)
    full = bytearray(np.packbits(hdr_bits)[:hb // 8].tobytes())
    if hb % 8:
        full.append(int(np.packbits(hdr_bits)[hb // 8]) | body[0])
        full += body[1:]
    else:
        full += body
    assert bytes(full) == ref


def test_pack_overflow_flag():
    # byte-budget overflow
    vals = jnp.ones((64, 100), jnp.uint32)
    lens = jnp.full((64, 100), 20, jnp.uint8)
    _, _, ovf = entropy_jax.pack_tokens_device(vals, lens, 0, 1 << 6)
    assert bool(ovf)


@pytest.mark.parametrize("kind", ["i", "p"])
def test_device_deblock_matches_oracle(kind):
    rng = np.random.RandomState(5)
    W, H = 112, 80
    cfg = EncoderConfig(width=W, height=H, qp=30)
    enc = H264Encoder(cfg)
    n_mb = cfg.mb_width * cfg.mb_height
    u = rng.randint(0, 255, (H // 2, W // 2), np.uint8)
    v = rng.randint(0, 255, (H // 2, W // 2), np.uint8)
    y0 = rng.randint(0, 255, (H, W), np.uint8)
    if kind == "i":
        out, _ = enc._encode_i(pad_to_mb(y0), pad_to_mb(u, 8), pad_to_mb(v, 8))
        fs = enc._frame_symbols_i(out)
        intra = np.ones(n_mb, bool)
        mv = np.zeros((n_mb, 2), np.int32)
    else:
        enc.encode_frame(y0, u, v)
        ref = enc.dpb[-1]
        y1 = (y0.astype(np.int32)
              + rng.randint(-12, 12, (H, W))).clip(0, 255).astype(np.uint8)
        out, _ = enc._encode_p(pad_to_mb(y1), pad_to_mb(u, 8),
                               pad_to_mb(v, 8), ref, True)
        fs = enc._frame_symbols_p(out)
        intra = np.asarray(out["intra_mask"])
        mv = np.asarray(out["mv"])
    st = _Planes(np.array(out["recon_y"]), np.array(out["recon_u"]),
                 np.array(out["recon_v"]))
    y_in, u_in, v_in = st.y.copy(), st.u.copy(), st.v.copy()
    deblock_frame(st, fs)                       # host oracle / native C

    nz = (np.asarray(out["luma_ac"]).reshape(n_mb, 16, 16) != 0).any(2)
    BSV, BSH = deblock_jax.encoder_bs(
        jnp.asarray(nz), jnp.asarray(intra), jnp.asarray(mv),
        cfg.mb_width, cfg.mb_height)
    BSV0, BSH0 = precompute_bs(fs)
    assert np.array_equal(np.asarray(BSV), BSV0)
    assert np.array_equal(np.asarray(BSH), BSH0)
    qp_mb = np.full(n_mb, enc.qp, np.int32)
    cqp = CHROMA_QP_TABLE[np.clip(qp_mb, 0, 51)].astype(np.int32)
    ny, nu, nv = deblock_jax.deblock_frame_device(
        jnp.asarray(y_in), jnp.asarray(u_in), jnp.asarray(v_in),
        BSV, BSH, jnp.asarray(qp_mb), jnp.asarray(cqp),
        cfg.mb_width, cfg.mb_height)
    assert np.array_equal(np.asarray(ny), st.y)
    assert np.array_equal(np.asarray(nu), st.u)
    assert np.array_equal(np.asarray(nv), st.v)
