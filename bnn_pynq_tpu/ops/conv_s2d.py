"""Space-to-depth conv reformulation — the TPU-shape fix for CNV's convs.

Motivation (measured, perf_results/layerprof.jsonl + conv_probe.jsonl):
the chip's int8 dot rate is strongly shape-dependent. CNV's native
im2col shapes are terrible for the MXU — conv1 (K=27, N=64) runs at
~2.8 TOPS and conv2 (K=576, N=64) at ~48 TOPS while the late convs
(K≥1152, N=256) hit 192-242 TOPS. The reference hardware had the dual
problem (folding small matrices onto PE×SIMD arrays, SURVEY.md C1/C9);
its fix was per-layer folding configs, ours is per-layer reshaping.

Trick: block the image s×s (space-to-depth). A K×K stride-1 VALID conv
becomes a 2×2 conv over s²C channels producing s² output phases per
block — one dot with contraction 4s²C and width s²N instead of K²C × N:

    conv1 (s=4):  K 27   → 192,  N 64 → 1024   (measured ~19× faster)
    conv2 (s=2):  K 576  → 1024, N 64 → 256
    conv3/4 (s=2): K → 4C·4,     N 128 → 512

MAC overcompute is 4s²/K² (1.78× at s=2, K=3) but the rate gain is
3-10×, and two structural wins come free:
- a following 2×2 maxpool collapses to a max over the s=2 phase dims
  (pool windows coincide exactly with blocks) — zero relayout, and the
  binary OR-maxpool of the reference (SURVEY.md C6) becomes a 4-way
  VPU max;
- patch materialization shrinks (each input element is duplicated 4×
  instead of K²=9×).

Everything is integer-exact: the phase weight matrix is the original
kernel zero-padded into block-aligned slots, so accumulators see the
same products plus zeros. Bit-exactness vs the im2col route is tested
in tests/test_conv_s2d.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from bnn_pynq_tpu.ops.conv import sliding_window
from bnn_pynq_tpu.ops.thresholds import multithreshold


def s2d_weights(w_hwio, s: int):
    """Phase weight matrix: [K,K,C,N] → [4·s²·C, s²·N] (int8).

    Row layout matches `sliding_window` on the blocked input: patch
    lanes are (bi, bj, si, sj, c) for the 2×2 superkernel over s×s
    blocks; output columns are (pi, pj, n) phases. Entry rule: output
    phase (pi,pj) tap (ki,kj) reads input pixel (pi+ki, pj+kj) =
    block (bi,bj), slot (si,sj) with bi,si = divmod(pi+ki, s)."""
    k, k2, c, n = w_hwio.shape
    assert k == k2 and k <= s + 1, (k, s)
    wp = jnp.zeros((2, 2, s, s, c, s, s, n), dtype=w_hwio.dtype)
    for pi in range(s):
        for pj in range(s):
            for ki in range(k):
                for kj in range(k):
                    bi, si = divmod(pi + ki, s)
                    bj, sj = divmod(pj + kj, s)
                    wp = wp.at[bi, bj, si, sj, :, pi, pj, :].set(
                        w_hwio[ki, kj])
    return wp.reshape(2 * 2 * s * s * c, s * s * n)


def conv_s2d(vals, w_hwio, thr, *, s: int, fuse_pool: int = 0):
    """K×K stride-1 VALID conv on int8 levels via s×s space-to-depth.

    vals: int8 [B, H, W, C] integer levels.
    w_hwio: int8 [K, K, C, N] integer levels, K ≤ s+1.
    thr: int32 [nthr, N] thresholds, or None → raw int32 accumulators.
    fuse_pool: 2 → also apply the following 2×2 maxpool as a phase-max
      (requires s=2, thr given, and even output extents).

    Returns int8 codes [B, OH, OW, N] (or [B, OH/2, OW/2, N] when
    pooling is fused; or int32 acc [B, OH, OW, N] when thr is None).
    """
    b, h, w, c = vals.shape
    k, _, _, n = w_hwio.shape
    oh, ow = h - k + 1, w - k + 1
    nbh, nbw = -(-oh // s) + 1, -(-ow // s) + 1
    hp, wp_ = nbh * s, nbw * s
    if fuse_pool:
        if fuse_pool != 2 or s != 2 or thr is None or oh % 2 or ow % 2:
            raise ValueError("fuse_pool=2 needs s=2, thresholds, and even "
                             f"output extents, got s={s} oh={oh} ow={ow}")
    # zero-pad to whole blocks: padded pixels only feed output rows/cols
    # ≥ OH/OW (garbage phases), which are sliced off below.
    if hp != h or wp_ != w:
        vals = jnp.pad(vals, ((0, 0), (0, hp - h), (0, wp_ - w), (0, 0)))
    s2d = vals.reshape(b, nbh, s, nbw, s, c).transpose(
        0, 1, 3, 2, 4, 5).reshape(b, nbh, nbw, s * s * c)
    patches = sliding_window(s2d, 2, 2, 1)
    m = b * (nbh - 1) * (nbw - 1)
    acc = jax.lax.dot_general(
        patches.reshape(m, 4 * s * s * c), s2d_weights(w_hwio, s),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    if thr is None:
        acc = acc.reshape(b, nbh - 1, nbw - 1, s, s, n).transpose(
            0, 1, 3, 2, 4, 5).reshape(b, (nbh - 1) * s, (nbw - 1) * s, n)
        return acc[:, :oh, :ow]
    codes = multithreshold(acc, jnp.tile(thr, (1, s * s)))
    codes = codes.reshape(b, nbh - 1, nbw - 1, s, s, n)
    if fuse_pool:
        # 2×2 maxpool windows coincide exactly with the s=2 phase blocks:
        # pooled (r,q) = max over block (r,q)'s four phases. Codes are
        # monotone in accumulators, so code-max ≡ value-max (the binary
        # case is the reference's OR maxpool, SURVEY.md C6).
        return jnp.max(codes, axis=(3, 4))[:, :oh // 2, :ow // 2]
    codes = codes.transpose(0, 1, 3, 2, 4, 5).reshape(
        b, (nbh - 1) * s, (nbw - 1) * s, n)
    return codes[:, :oh, :ow]


def pick_s2d_block(c_in: int, n_out: int, oh: int, ow: int,
                   kernel: int, stride: int):
    """Per-layer policy: return the s2d block size, or 0 for im2col.

    Measured basis (perf_results/conv_probe.jsonl, v5e): dots with
    K ≥ ~512 AND N ≥ ~256 run near the big-matmul rate; narrower ones
    fall off a cliff. s2d multiplies K by 4s²/K² and N by s² at a
    4s²/K² MAC overhead, so it pays exactly when the native shape is
    narrow (early convs) and stops paying once N ≥ 256 (late convs,
    already ≥190 TOPS) or the grid is too small to amortize phases."""
    if stride != 1 or kernel > 3 or min(oh, ow) < 8 or n_out > 128:
        return 0
    if c_in < 32:
        return 4 if min(oh, ow) >= 24 else 2
    return 2
