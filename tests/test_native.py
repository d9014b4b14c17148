"""Native C++ host runtime ≡ numpy fallback, bit-exactly (SURVEY.md C10)."""

import numpy as np
import pytest

from bnn_pynq_tpu import native
from bnn_pynq_tpu.ops import packing


@pytest.fixture(scope="module", autouse=True)
def built():
    ok = native.build()
    if not ok:
        pytest.skip("native toolchain unavailable")


def test_available():
    assert native.available()


def test_binarize_pack_matches_python(rng):
    imgs = rng.integers(0, 256, size=(17, 785)).astype(np.uint8)
    got = native.binarize_pack(imgs)
    bipolar = np.where(imgs >= 128, 1, -1).astype(np.int8)
    expected = packing.np_pack_bits(bipolar, axis=-1)
    np.testing.assert_array_equal(got, expected)


def test_center_int8(rng):
    imgs = rng.integers(0, 256, size=(3, 32, 32, 3)).astype(np.uint8)
    got = native.center_int8(imgs)
    np.testing.assert_array_equal(
        got, (imgs.astype(np.int32) - 128).astype(np.int8))


def test_pack_bits_matches(rng):
    vals = rng.choice([-1, 1], size=(9, 100)).astype(np.int8)
    np.testing.assert_array_equal(native.pack_bits(vals),
                                  packing.np_pack_bits(vals, axis=-1))


def test_pack_codes2_matches(rng):
    codes = rng.integers(0, 4, size=(9, 77)).astype(np.int8)
    np.testing.assert_array_equal(native.pack_codes2(codes),
                                  packing.np_pack_codes2(codes, axis=-1))


def test_argmax(rng):
    logits = rng.normal(size=(100, 43)).astype(np.float32)
    np.testing.assert_array_equal(native.argmax(logits), logits.argmax(-1))


def test_resize_nn(rng):
    imgs = rng.integers(0, 256, size=(2, 64, 48, 3)).astype(np.uint8)
    got = native.resize_nn(imgs, 32, 32)
    ys = np.minimum(63, np.arange(32) * 64 // 32)
    xs = np.minimum(47, np.arange(32) * 48 // 32)
    np.testing.assert_array_equal(got, imgs[:, ys][:, :, xs])
