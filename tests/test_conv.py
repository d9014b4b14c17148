"""Conv path vs golden reference (SURVEY.md C2/C3/C6 equivalents)."""

import numpy as np
import jax.numpy as jnp
import pytest

from bnn_pynq_tpu.ops import packing, ref
from bnn_pynq_tpu.ops.conv import (conv2d_packed, conv_weight_matrix,
                                   maxpool2d, maxpool2d_packed_or,
                                   sliding_window)
from bnn_pynq_tpu.ops.thresholds import multithreshold


def test_sliding_window_matches_conv(rng):
    # sliding_window ∘ matmul == conv_general_dilated for any int weights.
    x = rng.integers(-5, 5, size=(2, 8, 8, 3)).astype(np.int8)
    w = rng.integers(-2, 2, size=(3, 3, 3, 7)).astype(np.int8)
    golden = np.asarray(ref.conv2d_int_ref(x, w))
    patches = sliding_window(jnp.asarray(x), 3, 3, 1)
    b, oh, ow, k = patches.shape
    wmat = conv_weight_matrix(w)
    acc = np.asarray(ref.int_matmul_ref(
        np.asarray(patches).reshape(b * oh * ow, k), np.asarray(wmat)))
    np.testing.assert_array_equal(acc.reshape(b, oh, ow, 7), golden)


def test_sliding_window_stride2(rng):
    x = rng.integers(-5, 5, size=(1, 9, 9, 2)).astype(np.int8)
    w = rng.integers(-2, 2, size=(3, 3, 2, 4)).astype(np.int8)
    golden = np.asarray(ref.conv2d_int_ref(x, w, stride=2))
    patches = sliding_window(jnp.asarray(x), 3, 3, 2)
    b, oh, ow, k = patches.shape
    acc = np.asarray(ref.int_matmul_ref(
        np.asarray(patches).reshape(-1, k), np.asarray(conv_weight_matrix(w))))
    np.testing.assert_array_equal(acc.reshape(b, oh, ow, 4), golden)


@pytest.mark.parametrize("route", ["mxu", "mxu_rm", "vpu"])
def test_conv2d_packed_w1a1(rng, route):
    b, h, w_, cin, cout = 2, 10, 10, 32, 64
    codes = rng.integers(0, 2, size=(b, h, w_, cin)).astype(np.int8)
    wv = rng.choice([-1, 1], size=(3, 3, cin, cout)).astype(np.int8)
    x_lev = (2 * codes - 1).astype(np.int8)
    golden_acc = np.asarray(ref.conv2d_int_ref(x_lev, wv))
    wmat = np.asarray(conv_weight_matrix(wv))
    w_packed = packing.np_pack_bits(wmat, axis=0)
    out = conv2d_packed(jnp.asarray(codes), jnp.asarray(w_packed),
                        kernel=3, bits=1, route=route)
    np.testing.assert_array_equal(np.asarray(out), golden_acc)
    # fused thresholds
    thr = np.sort(rng.integers(-50, 50, size=(1, cout)), axis=0).astype(np.int32)
    golden_codes = np.asarray(multithreshold(golden_acc, thr))
    out_c = conv2d_packed(jnp.asarray(codes), jnp.asarray(w_packed),
                          jnp.asarray(thr), kernel=3, bits=1, route=route)
    np.testing.assert_array_equal(np.asarray(out_c), golden_codes)


def test_conv2d_packed_2bit(rng):
    b, h, w_, cin, cout = 1, 6, 6, 8, 16
    codes = rng.integers(0, 4, size=(b, h, w_, cin)).astype(np.int8)
    wcodes = rng.integers(0, 4, size=(3, 3, cin, cout)).astype(np.int8)
    x_lev = (2 * codes - 3).astype(np.int8)
    w_lev = (2 * wcodes - 3).astype(np.int8)
    golden = np.asarray(ref.conv2d_int_ref(x_lev, w_lev))
    wmat = np.asarray(conv_weight_matrix(wcodes))
    w_packed = packing.np_pack_codes2(wmat, axis=0)
    out = conv2d_packed(jnp.asarray(codes), jnp.asarray(w_packed),
                        kernel=3, bits=2, route="mxu")
    np.testing.assert_array_equal(np.asarray(out), golden)


def test_maxpool_codes_equals_or_on_packed(rng):
    codes = rng.integers(0, 2, size=(2, 8, 8, 64)).astype(np.int8)
    pooled = np.asarray(maxpool2d(jnp.asarray(codes), 2))
    packed = packing.pack_bits((2 * codes - 1), axis=-1)
    or_pooled = np.asarray(maxpool2d_packed_or(packed, 2))
    repacked = np.asarray(packing.pack_bits((2 * pooled - 1), axis=-1))
    np.testing.assert_array_equal(or_pooled, repacked)


def test_maxpool_monotone_commutes(rng):
    # pooling codes == pooling accumulators then thresholding (monotone).
    acc = rng.integers(-100, 100, size=(1, 4, 4, 8)).astype(np.int32)
    thr = np.sort(rng.integers(-50, 50, size=(3, 8)), axis=0).astype(np.int32)
    a = np.asarray(multithreshold(
        np.asarray(ref.maxpool2d_codes_ref(acc.astype(np.int32))), thr))
    b = np.asarray(maxpool2d(multithreshold(acc, thr), 2))
    np.testing.assert_array_equal(a, b)
