"""Pallas packed matmul vs dense golden reference (SURVEY.md §4.1/§7 step 2).

Runs on CPU in interpret mode; the same code path compiles for TPU.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from bnn_pynq_tpu.ops import packing, ref
from bnn_pynq_tpu.ops.matmul import packed_matmul, packed_matmul_padded
from bnn_pynq_tpu.ops.thresholds import multithreshold, THR_NEVER


def _random_w1a1(rng, m, k, n):
    a = rng.choice([-1, 1], size=(m, k)).astype(np.int8)
    w = rng.choice([-1, 1], size=(k, n)).astype(np.int8)
    return a, w


def _random_codes(rng, m, k, n, w_binary):
    a_codes = rng.integers(0, 4, size=(m, k)).astype(np.int8)
    if w_binary:
        w_codes = rng.choice([1, 2], size=(k, n)).astype(np.int8)  # levels ±1
    else:
        w_codes = rng.integers(0, 4, size=(k, n)).astype(np.int8)
    return a_codes, w_codes


@pytest.mark.parametrize("route", ["mxu", "mxu_rm", "vpu"])
@pytest.mark.parametrize("m,k,n", [(128, 256, 128), (128, 100, 128),
                                   (256, 784, 256)])
def test_w1a1_acc_exact(rng, route, m, k, n):
    a, w = _random_w1a1(rng, m, k, n)
    golden = np.asarray(ref.binary_matmul_ref(a, w))
    a_p = packing.pack_bits(a, axis=-1)
    w_p = packing.pack_bits(w, axis=0)
    out = packed_matmul(a_p, w_p, k=k, bits=1, route=route)
    np.testing.assert_array_equal(np.asarray(out), golden)


@pytest.mark.parametrize("route", ["mxu", "mxu_rm", "vpu"])
def test_w1a1_threshold_fused(rng, route):
    m, k, n = 128, 200, 128
    a, w = _random_w1a1(rng, m, k, n)
    acc = np.asarray(ref.binary_matmul_ref(a, w))
    thr = np.sort(rng.integers(-k, k, size=(1, n)), axis=0).astype(np.int32)
    golden = np.asarray(multithreshold(acc, thr))
    a_p = packing.pack_bits(a, axis=-1)
    w_p = packing.pack_bits(w, axis=0)
    codes = packed_matmul(a_p, w_p, jnp.asarray(thr), k=k, bits=1, route=route)
    assert codes.dtype == jnp.int8
    np.testing.assert_array_equal(np.asarray(codes), golden)


@pytest.mark.parametrize("w_binary", [True, False])
def test_2bit_acc_exact(rng, w_binary):
    # W1A2 (binary weights stored as 2-bit codes) and W2A2.
    m, k, n = 128, 150, 128
    a_codes, w_codes = _random_codes(rng, m, k, n, w_binary)
    a_lev = packing.codes2_to_levels(a_codes)
    w_lev = packing.codes2_to_levels(w_codes)
    golden = np.asarray(ref.int_matmul_ref(a_lev, w_lev))
    a_p = packing.pack_codes2(a_codes, axis=-1)
    w_p = packing.pack_codes2(w_codes, axis=0)
    out = packed_matmul(a_p, w_p, k=k, bits=2, route="mxu")
    np.testing.assert_array_equal(np.asarray(out), golden)


def test_2bit_threshold_fused(rng):
    m, k, n = 128, 90, 128
    a_codes, w_codes = _random_codes(rng, m, k, n, w_binary=False)
    a_lev = packing.codes2_to_levels(a_codes)
    w_lev = packing.codes2_to_levels(w_codes)
    acc = np.asarray(ref.int_matmul_ref(a_lev, w_lev))
    thr = np.sort(rng.integers(-3 * k, 3 * k, size=(3, n)), axis=0).astype(np.int32)
    golden = np.asarray(multithreshold(acc, thr))
    a_p = packing.pack_codes2(a_codes, axis=-1)
    w_p = packing.pack_codes2(w_codes, axis=0)
    codes = packed_matmul(a_p, w_p, jnp.asarray(thr), k=k, bits=2, route="mxu")
    np.testing.assert_array_equal(np.asarray(codes), golden)


def test_padded_wrapper_arbitrary_m(rng):
    m, k, n = 37, 64, 128
    a, w = _random_w1a1(rng, m, k, n)
    golden = np.asarray(ref.binary_matmul_ref(a, w))
    a_p = packing.pack_bits(a, axis=-1)
    w_p = packing.pack_bits(w, axis=0)
    out = packed_matmul_padded(a_p, w_p, k=k, bits=1)
    assert out.shape == (m, n)
    np.testing.assert_array_equal(np.asarray(out), golden)


def test_padded_n_columns_with_sentinel_thresholds(rng):
    # Simulate artifact padding: N=10 classes padded to 128 columns.
    m, k, n_true, n_pad = 128, 64, 10, 128
    a, w = _random_w1a1(rng, m, k, n_true)
    w_full = np.zeros((k, n_pad), dtype=np.int8)
    w_full[:, :n_true] = w
    thr = np.full((1, n_pad), THR_NEVER, dtype=np.int32)
    thr[0, :n_true] = 0
    a_p = packing.pack_bits(a, axis=-1)
    w_p = packing.pack_bits(w_full, axis=0)
    codes = np.asarray(packed_matmul(a_p, w_p, jnp.asarray(thr), k=k, bits=1))
    assert (codes[:, n_true:] == 0).all()
    golden_acc = np.asarray(ref.binary_matmul_ref(a, w))
    np.testing.assert_array_equal(codes[:, :n_true], (golden_acc >= 0).astype(np.int8))
