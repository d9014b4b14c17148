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


@pytest.mark.parametrize("abits,cins", [(1, (32, 64, 64)), (2, (16, 32, 64))])
def test_conv_chain_two_layers(rng, abits, cins):
    from bnn_pynq_tpu.ops.conv_direct import conv_chain_direct
    b, h, w = 2, 12, 12
    c0, c1, c2 = cins
    hi = 2 ** abits
    codes = rng.integers(0, hi, size=(b, h, w, c0)).astype(np.int8)
    lev = (2 * codes - (1 if abits == 1 else 3)).astype(np.int8)
    levels_set = [-1, 1] if abits == 1 else [-3, -1, 1, 3]
    w1 = rng.choice(levels_set, size=(3, 3, c0, c1)).astype(np.int8)
    w2 = rng.choice(levels_set, size=(3, 3, c1, c2)).astype(np.int8)
    t1 = np.sort(rng.integers(-300, 300, size=(hi - 1, c1)), axis=0).astype(np.int32)
    t2 = np.sort(rng.integers(-300, 300, size=(hi - 1, c2)), axis=0).astype(np.int32)

    # golden: two sequential conv+threshold layers
    acc1 = np.asarray(ref.conv2d_int_ref(lev, w1))
    code1 = np.asarray(multithreshold(acc1, t1))
    lev1 = (2 * code1 - (1 if abits == 1 else 3)).astype(np.int8)
    acc2 = np.asarray(ref.conv2d_int_ref(lev1, w2))
    golden = np.asarray(multithreshold(acc2, t2))

    got = conv_chain_direct(
        jnp.asarray(codes),
        [jnp.asarray(conv_weight_matrix(w1)), jnp.asarray(conv_weight_matrix(w2))],
        [jnp.asarray(t1), jnp.asarray(t2)],
        kernel=3, abits=abits, block_b=2)
    np.testing.assert_array_equal(np.asarray(got), golden)


def test_conv_chain_input_levels(rng):
    # CNV first-conv style: raw int8 image levels in, chain of 2
    from bnn_pynq_tpu.ops.conv_direct import conv_chain_direct
    b, h, w, c0, c1, c2 = 1, 10, 10, 3, 16, 32
    x = rng.integers(-128, 128, size=(b, h, w, c0)).astype(np.int8)
    w1 = rng.choice([-1, 1], size=(3, 3, c0, c1)).astype(np.int8)
    w2 = rng.choice([-1, 1], size=(3, 3, c1, c2)).astype(np.int8)
    t1 = np.sort(rng.integers(-3000, 3000, size=(1, c1)), axis=0).astype(np.int32)
    t2 = np.sort(rng.integers(-100, 100, size=(1, c2)), axis=0).astype(np.int32)
    acc1 = np.asarray(ref.conv2d_int_ref(x, w1))
    code1 = np.asarray(multithreshold(acc1, t1))
    lev1 = (2 * code1 - 1).astype(np.int8)
    golden = np.asarray(multithreshold(
        np.asarray(ref.conv2d_int_ref(lev1, w2)), t2))
    got = conv_chain_direct(
        jnp.asarray(x),
        [jnp.asarray(conv_weight_matrix(w1)), jnp.asarray(conv_weight_matrix(w2))],
        [jnp.asarray(t1), jnp.asarray(t2)],
        kernel=3, abits=1, input_levels=True)
    np.testing.assert_array_equal(np.asarray(got), golden)


def test_direct_conv_5x5(rng):
    b, h, w, cin, cout = 1, 12, 12, 8, 16
    codes = rng.integers(0, 2, size=(b, h, w, cin)).astype(np.int8)
    wv = rng.choice([-1, 1], size=(5, 5, cin, cout)).astype(np.int8)
    golden = np.asarray(ref.conv2d_int_ref((2 * codes - 1).astype(np.int8), wv))
    wmat = np.asarray(conv_weight_matrix(wv))
    out = conv2d_direct(jnp.asarray(codes), jnp.asarray(wmat),
                        kernel=5, abits=1)
    np.testing.assert_array_equal(np.asarray(out), golden)
