"""Direct (no-im2col) Pallas conv kernel vs golden reference."""

import numpy as np
import jax.numpy as jnp
import pytest

from bnn_pynq_tpu.ops import ref
from bnn_pynq_tpu.ops.conv import conv_weight_matrix
from bnn_pynq_tpu.ops.conv_direct import conv2d_direct
from bnn_pynq_tpu.ops.thresholds import multithreshold


@pytest.mark.parametrize("b,h,w,cin,cout,block_b", [
    (2, 10, 10, 32, 64, 2),
    (3, 8, 8, 64, 128, 2),   # block_b falls back to a divisor of 3
    (1, 6, 6, 128, 256, 4),
])
def test_direct_conv_w1a1(rng, b, h, w, cin, cout, block_b):
    codes = rng.integers(0, 2, size=(b, h, w, cin)).astype(np.int8)
    wv = rng.choice([-1, 1], size=(3, 3, cin, cout)).astype(np.int8)
    x_lev = (2 * codes - 1).astype(np.int8)
    golden = np.asarray(ref.conv2d_int_ref(x_lev, wv))
    wmat = np.asarray(conv_weight_matrix(wv))
    out = conv2d_direct(jnp.asarray(codes), jnp.asarray(wmat),
                        kernel=3, abits=1, block_b=block_b)
    np.testing.assert_array_equal(np.asarray(out), golden)


def test_direct_conv_thresholds(rng):
    b, h, w, cin, cout = 2, 9, 9, 32, 64
    codes = rng.integers(0, 4, size=(b, h, w, cin)).astype(np.int8)
    wv = rng.choice([-3, -1, 1, 3], size=(3, 3, cin, cout)).astype(np.int8)
    x_lev = (2 * codes - 3).astype(np.int8)
    golden_acc = np.asarray(ref.conv2d_int_ref(x_lev, wv))
    thr = np.sort(rng.integers(-200, 200, size=(3, cout)), axis=0).astype(np.int32)
    golden = np.asarray(multithreshold(golden_acc, thr))
    wmat = np.asarray(conv_weight_matrix(wv))
    out = conv2d_direct(jnp.asarray(codes), jnp.asarray(wmat),
                        jnp.asarray(thr), kernel=3, abits=2)
    np.testing.assert_array_equal(np.asarray(out), golden)


def test_direct_conv_5x5(rng):
    b, h, w, cin, cout = 1, 12, 12, 8, 16
    codes = rng.integers(0, 2, size=(b, h, w, cin)).astype(np.int8)
    wv = rng.choice([-1, 1], size=(5, 5, cin, cout)).astype(np.int8)
    golden = np.asarray(ref.conv2d_int_ref((2 * codes - 1).astype(np.int8), wv))
    wmat = np.asarray(conv_weight_matrix(wv))
    out = conv2d_direct(jnp.asarray(codes), jnp.asarray(wmat),
                        kernel=5, abits=1)
    np.testing.assert_array_equal(np.asarray(out), golden)
