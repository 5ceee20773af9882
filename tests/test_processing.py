"""VP (preprocessing) library tests — oracle-vs-kernel in the style of
the reference's ProcessUT_* suites (test/processing/)."""

import numpy as np
import pytest

from openh264_tpu.oracle.processing import (vaa_calc_ref,
                                            dyadic_downsample_ref,
                                            general_bilinear_downsample_ref)
from openh264_tpu.processing import (vaa_calc, dyadic_downsample,
                                     general_bilinear_downsample,
                                     denoise_frame, detect_scene_change,
                                     background_division, adaptive_quant_map,
                                     frame_complexity, gom_complexity,
                                     rotate_image, detect_scroll)
from openh264_tpu.processing.scenechange import (SIMILAR,
                                                 SCENE_CHANGED_LARGE)


@pytest.fixture
def pair(rng):
    cur = rng.integers(0, 256, (96, 112), np.uint8)
    ref = np.clip(cur.astype(np.int32)
                  + rng.integers(-20, 21, cur.shape), 0, 255).astype(np.uint8)
    return cur, ref


def test_vaa_matches_oracle(pair):
    cur, ref = pair
    got = {k: np.asarray(v) for k, v in vaa_calc(cur, ref).items()}
    want = vaa_calc_ref(cur, ref)
    for k in want:
        np.testing.assert_array_equal(got[k], want[k], err_msg=k)


def test_dyadic_downsample_matches_oracle(rng):
    src = rng.integers(0, 256, (64, 80), np.uint8)
    for rl in (1, 2):
        np.testing.assert_array_equal(
            np.asarray(dyadic_downsample(src, rl)),
            dyadic_downsample_ref(src, rl), err_msg=f"ratio 1/{1 << rl}")


@pytest.mark.parametrize("dst", [(48, 64), (36, 52), (17, 23)])
def test_general_bilinear_matches_oracle(rng, dst):
    src = rng.integers(0, 256, (72, 96), np.uint8)
    got = np.asarray(general_bilinear_downsample(src, *dst))
    want = general_bilinear_downsample_ref(src, *dst)
    np.testing.assert_array_equal(got, want)


def test_denoise_basic(rng):
    flat = np.full((32, 48), 128, np.uint8)
    y, u, v = denoise_frame(flat, flat[:16, :24], flat[:16, :24])
    np.testing.assert_array_equal(np.asarray(y), flat)  # flat stays flat
    noisy = np.clip(flat.astype(np.int32)
                    + rng.integers(-10, 11, flat.shape), 0, 255).astype(np.uint8)
    dn, _, _ = denoise_frame(noisy, flat[:16, :24], flat[:16, :24])
    assert np.asarray(dn)[1:-1, 1:-1].std() < noisy[1:-1, 1:-1].std()


def test_scene_change_detect(rng):
    a = rng.integers(0, 256, (96, 128), np.uint8)
    idc, res = detect_scene_change(a, a)
    assert idc == SIMILAR and res["motion_blocks"] == 0
    b = rng.integers(0, 256, (96, 128), np.uint8)  # independent noise
    idc, res = detect_scene_change(b, a)
    assert idc == SCENE_CHANGED_LARGE


def test_background_division(rng):
    mh, mw = 6, 8
    cur = rng.integers(0, 256, (mh * 16, mw * 16), np.uint8)
    # static scene + one moving MB
    ref = cur.copy()
    ref[16:32, 16:32] = rng.integers(0, 256, (16, 16), np.uint8)
    out = background_division(vaa_calc(cur, ref))
    flag = np.asarray(out["flag"])
    assert flag.shape == (mh, mw)
    assert flag[1, 1] == 0          # the moving MB is foreground
    assert flag.sum() >= mh * mw - 4  # almost everything else background


def test_adaptive_quant_map(rng):
    cur = rng.integers(0, 256, (96, 128), np.uint8)
    ref = np.clip(cur.astype(np.int32)
                  + rng.integers(-5, 6, cur.shape), 0, 255).astype(np.uint8)
    dqp = adaptive_quant_map({k: np.asarray(v)
                              for k, v in vaa_calc(cur, ref).items()})
    assert dqp.shape == (6, 8) and dqp.dtype == np.int8
    assert np.all(dqp >= -12) and np.all(dqp <= 12)


def test_complexity(rng):
    cur = rng.integers(0, 256, (96, 128), np.uint8)
    ref = rng.integers(0, 256, (96, 128), np.uint8)
    vaa = {k: np.asarray(v) for k, v in vaa_calc(cur, ref).items()}
    fc = frame_complexity(vaa)
    assert fc == int(vaa["frame_sad"])
    gs, gf = gom_complexity(vaa, gom_size_mbs=8)
    assert gs.sum() == fc and gf.sum() == 48


def test_rotate(rng):
    x = rng.integers(0, 256, (6, 4), np.uint8)
    r90 = np.asarray(rotate_image(x, 90))
    assert r90.shape == (4, 6)
    # clockwise: dst[x][H-1-y] = src[y][x], so dst's last column = src row 0
    np.testing.assert_array_equal(r90[:, -1], x[0, :])
    np.testing.assert_array_equal(np.asarray(rotate_image(x, 180)),
                                  x[::-1, ::-1])
    np.testing.assert_array_equal(
        np.asarray(rotate_image(rotate_image(x, 90), 270)), x)


def test_scroll_detection(rng):
    ref = rng.integers(0, 256, (128, 64), np.uint8)
    cur = np.roll(ref, -5, axis=0)       # content scrolled up by 5
    flag, mv = detect_scroll(cur, ref)
    assert flag and mv == 5
    flag, _ = detect_scroll(rng.integers(0, 256, (128, 64), np.uint8), ref)
    assert not flag
