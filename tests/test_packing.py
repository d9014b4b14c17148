"""Property tests for bit packing (SURVEY.md §7 step 1: pack∘unpack = id)."""

import numpy as np
import jax.numpy as jnp

from bnn_pynq_tpu.ops import packing


def test_pack_unpack_bits_roundtrip(rng):
    for n in [1, 31, 32, 33, 64, 100, 784, 1024]:
        vals = rng.choice([-1, 1], size=(5, n)).astype(np.int8)
        packed = packing.pack_bits(vals, axis=-1)
        assert packed.shape == (5, packing.packed_len(n, 1))
        assert packed.dtype == jnp.uint32
        out = packing.unpack_bits(packed, n, axis=-1)
        np.testing.assert_array_equal(np.asarray(out), vals)


def test_pack_bits_axis0(rng):
    vals = rng.choice([-1, 1], size=(100, 7)).astype(np.int8)
    packed = packing.pack_bits(vals, axis=0)
    assert packed.shape == (packing.packed_len(100, 1), 7)
    out = packing.unpack_bits(packed, 100, axis=0)
    np.testing.assert_array_equal(np.asarray(out), vals)


def test_pack_unpack_codes2_roundtrip(rng):
    for n in [1, 15, 16, 17, 50, 576]:
        codes = rng.integers(0, 4, size=(4, n)).astype(np.int8)
        packed = packing.pack_codes2(codes, axis=-1)
        assert packed.shape == (4, packing.packed_len(n, 2))
        out = packing.unpack_codes2(packed, n, axis=-1)
        np.testing.assert_array_equal(np.asarray(out), codes)


def test_codes_levels_bijection():
    codes = np.array([0, 1, 2, 3], dtype=np.int8)
    levels = packing.codes2_to_levels(codes)
    np.testing.assert_array_equal(np.asarray(levels), [-3, -1, 1, 3])
    back = packing.levels_to_codes2(levels)
    np.testing.assert_array_equal(np.asarray(back), codes)


def test_np_packers_match_jnp(rng):
    vals = rng.choice([-1, 1], size=(9, 77)).astype(np.int8)
    np.testing.assert_array_equal(
        packing.np_pack_bits(vals, axis=-1), np.asarray(packing.pack_bits(vals, axis=-1)))
    codes = rng.integers(0, 4, size=(9, 77)).astype(np.int8)
    np.testing.assert_array_equal(
        packing.np_pack_codes2(codes, axis=1), np.asarray(packing.pack_codes2(codes, axis=1)))


def test_pad_bits_are_zero(rng):
    vals = np.ones((1, 33), dtype=np.int8)  # 33 → 2 words, 31 pad bits
    packed = np.asarray(packing.pack_bits(vals, axis=-1))
    assert packed[0, 1] == 1  # only bit 0 of word 1 set
