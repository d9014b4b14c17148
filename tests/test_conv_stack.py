"""Property tests for ops/conv_stack.py (the v2 fused conv kernels) vs
the dense integer golden reference — same exactness contract as the
HW/SW-twin tests (SURVEY.md §4.1/§4.2)."""

import numpy as np
import jax.numpy as jnp
import pytest

from bnn_pynq_tpu.ops import ref
from bnn_pynq_tpu.ops.conv import sliding_window
from bnn_pynq_tpu.ops.conv_stack import conv_chain_vmem, dense_block
from bnn_pynq_tpu.ops.thresholds import multithreshold


def _codes_to_levels(codes, abits):
    return 2 * codes.astype(np.int32) - (1 if abits == 1 else 3)


def _ref_conv(act_levels, wmat, thr, k, abits):
    patches = sliding_window(jnp.asarray(act_levels), k, k, 1)
    b, oh, ow, kk = patches.shape
    acc = ref.int_matmul_ref(patches.reshape(b * oh * ow, kk),
                             jnp.asarray(wmat))
    acc = np.asarray(acc).reshape(b, oh, ow, wmat.shape[1])
    return np.asarray(multithreshold(jnp.asarray(acc), jnp.asarray(thr)))


def _rand_net(rng, chans, k, abits, wbits):
    weights, thrs = [], []
    wl = [-1, 1] if wbits == 1 else [-3, -1, 1, 3]
    nthr = 1 if abits == 1 else 3
    for cin, cout in zip(chans[:-1], chans[1:]):
        weights.append(rng.choice(wl, size=(k * k * cin, cout))
                       .astype(np.int8))
        scale = k * k * cin * (3 if wbits == 2 else 1)
        thrs.append(np.sort(rng.integers(-scale, scale,
                                         size=(nthr, cout)), axis=0)
                    .astype(np.int32))
    return weights, thrs


@pytest.mark.parametrize("abits,wbits", [(1, 1), (2, 2)])
@pytest.mark.parametrize("input_patches", [False, True])
def test_chain_vmem_matches_reference(abits, wbits, input_patches):
    rng = np.random.default_rng(42)
    b, h, w, k = 3, 12, 12, 3
    chans = [32, 64, 32]
    weights, thrs = _rand_net(rng, chans, k, abits, wbits)
    codes = rng.integers(0, 2 ** abits,
                         size=(b, h, w, chans[0])).astype(np.int8)
    levels = _codes_to_levels(codes, abits)

    # reference: two chained convs on levels
    ref1 = _ref_conv(levels, weights[0], thrs[0], k, abits)
    ref2 = _ref_conv(_codes_to_levels(ref1, abits), weights[1], thrs[1],
                     k, abits)

    if input_patches:
        x = np.asarray(sliding_window(jnp.asarray(codes), k, k, 1))
        out = conv_chain_vmem(jnp.asarray(x),
                              [jnp.asarray(wt) for wt in weights],
                              [jnp.asarray(t) for t in thrs],
                              kernel=k, abits=abits, input_patches=True,
                              input_levels=False, interpret=True)
        gh = h - (k - 1)
        shrink = k - 1          # one in-kernel layer
    else:
        out = conv_chain_vmem(jnp.asarray(codes),
                              [jnp.asarray(wt) for wt in weights],
                              [jnp.asarray(t) for t in thrs],
                              kernel=k, abits=abits, input_patches=False,
                              input_levels=False, interpret=True)
        gh = h
        shrink = 2 * (k - 1)    # two in-kernel layers
    got = np.asarray(out)[:, :gh - shrink, :gh - shrink, :]
    np.testing.assert_array_equal(got, ref2)


def test_chain_vmem_input_levels_int8():
    """First-conv-on-raw-images path (conv_int8): prebuilt patches of
    int8 levels, exact vs dense reference."""
    rng = np.random.default_rng(7)
    b, h, w, k = 2, 10, 10, 3
    x_img = rng.integers(-128, 128, size=(b, h, w, 3)).astype(np.int8)
    weights, thrs = _rand_net(rng, [3, 32], k, 1, 1)
    # reference
    want = _ref_conv(x_img.astype(np.int32), weights[0], thrs[0], k, 1)
    patches = np.asarray(sliding_window(jnp.asarray(x_img), k, k, 1))
    out = conv_chain_vmem(jnp.asarray(patches), [jnp.asarray(weights[0])],
                          [jnp.asarray(thrs[0])], kernel=k, abits=1,
                          input_patches=True, input_levels=True,
                          interpret=True)
    got = np.asarray(out)   # single prebuilt layer: no in-kernel shrink
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("abits", [1, 2])
def test_dense_block_matches_reference(abits):
    rng = np.random.default_rng(3)
    m, k0, n1, n2 = 37, 96, 64, 48
    codes = rng.integers(0, 2 ** abits, size=(m, k0)).astype(np.int8)
    weights, thrs = _rand_net(rng, [k0, n1, n2], 1, abits, abits)
    # note k=1 in _rand_net → weight rows = cin exactly
    lev = _codes_to_levels(codes, abits)
    acc1 = np.asarray(ref.int_matmul_ref(jnp.asarray(lev),
                                         jnp.asarray(weights[0])))
    c1 = np.asarray(multithreshold(jnp.asarray(acc1), jnp.asarray(thrs[0])))
    acc2 = np.asarray(ref.int_matmul_ref(
        jnp.asarray(_codes_to_levels(c1, abits)), jnp.asarray(weights[1])))
    want = np.asarray(multithreshold(jnp.asarray(acc2), jnp.asarray(thrs[1])))

    got = dense_block(jnp.asarray(codes),
                      [jnp.asarray(wt) for wt in weights],
                      [jnp.asarray(t) for t in thrs],
                      abits=abits, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), want)


@pytest.mark.parametrize("stride", [2, 3])
def test_conv2d_direct_strided(stride):
    """VERDICT r1 #8: stride generality matching «slidingwindow.h»."""
    from bnn_pynq_tpu.ops.conv_direct import conv2d_direct
    rng = np.random.default_rng(11)
    b, h, w, c, o, k = 2, 11, 11, 32, 64, 3
    codes = rng.integers(0, 2, size=(b, h, w, c)).astype(np.int8)
    wmat = rng.choice([-1, 1], size=(k * k * c, o)).astype(np.int8)
    thr = np.sort(rng.integers(-50, 50, size=(1, o)), axis=0).astype(np.int32)

    lev = 2 * codes.astype(np.int32) - 1
    want = _ref_conv_strided(lev, wmat, thr, k, stride)
    got = conv2d_direct(jnp.asarray(codes), jnp.asarray(wmat),
                        jnp.asarray(thr), kernel=k, abits=1, stride=stride,
                        interpret=True)
    np.testing.assert_array_equal(np.asarray(got), want)


def _ref_conv_strided(act_levels, wmat, thr, k, stride):
    patches = sliding_window(jnp.asarray(act_levels), k, k, stride)
    b, oh, ow, kk = patches.shape
    acc = ref.int_matmul_ref(patches.reshape(b * oh * ow, kk),
                             jnp.asarray(wmat))
    acc = np.asarray(acc).reshape(b, oh, ow, wmat.shape[1])
    return np.asarray(multithreshold(jnp.asarray(acc), jnp.asarray(thr)))


def test_chain_build_modes_agree():
    """'slab' (K shifted stores + K accumulated dots) and 'patch9'
    (K² stores + one dot) are different schedules of the same math —
    bit-identical outputs, including the garbage-region contract."""
    import numpy as np
    import jax.numpy as jnp
    from bnn_pynq_tpu.ops.conv_stack import conv_chain_vmem
    rng = np.random.default_rng(9)
    act = jnp.asarray(rng.integers(0, 2, size=(2, 12, 12, 32))
                      .astype(np.int8))
    w1 = jnp.asarray(rng.choice([-1, 1], size=(288, 32)).astype(np.int8))
    w2 = jnp.asarray(rng.choice([-1, 1], size=(288, 64)).astype(np.int8))
    t1 = jnp.asarray(np.sort(rng.integers(-32, 32, (1, 32)), 0)
                     .astype(np.int32))
    t2 = jnp.asarray(np.sort(rng.integers(-32, 32, (1, 64)), 0)
                     .astype(np.int32))
    outs = {}
    for mode in ("slab", "patch9"):
        out = conv_chain_vmem(act, [w1, w2], [t1, t2], kernel=3, abits=1,
                              build_mode=mode, interpret=True)
        outs[mode] = np.asarray(out)[:, :8, :8, :]   # valid region
    np.testing.assert_array_equal(outs["slab"], outs["patch9"])
