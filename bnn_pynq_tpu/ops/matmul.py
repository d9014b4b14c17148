"""Pallas TPU kernels: bit-packed quantized matmul with fused MultiThreshold.

This is the TPU-native rebuild of the reference's Matrix-Vector-Threshold
Unit (SURVEY.md C1 `Matrix_Vector_Activate_Batch` «finn-hlslib/mvau.hpp»):
the core compute of every binary/2-bit FC and conv layer. Where the FPGA
uses a PE×SIMD array of XNOR+popcount units folded over WMEM words, the TPU
version tiles the packed operands over a (M-tiles × N-tiles) Pallas grid and
offers two compute routes:

- route='vpu' (W1A1 only): literal XNOR+popcount — for each packed word,
  ``acc += population_count(a_word XOR w_word)`` on int32 lanes; the true
  ±1 dot product is then ``K - 2*acc``. 3 VPU ops per 32 binary MACs.

- route='mxu': in-kernel decode of the packed words to int8 levels followed
  by an int8×int8→int32 `dot_general` on the MXU systolic array. Decoding
  uses *bit-plane ordering*: plane i of word w maps to contraction index
  ``i*Kw + w`` (NOT ``w*32 + i``). Both operands are decoded with the same
  permutation, and dot products are invariant under a shared permutation of
  the contraction axis, so the result is exact — and the decode is 32/bits
  static shift+mask ops per tile instead of an expensive lane-repeat.
  On v5e the MXU route is ~10× the VPU route's ceiling (394 TOPS int8 vs
  ~3 int32 VPU ops per packed word), so it is the default. 'mxu' uses the
  transposed-activation layout ([Kw, M], M on lanes) so decode runs on
  full 128-lane tiles; 'mxu_rm' keeps the row-major layout for
  comparison benchmarking.

The MultiThreshold activation (SURVEY.md C4) is fused into the epilogue:
``code = sum_t(acc_true >= thr[t])`` emitted as int8 codes, so no float and
no extra HBM round-trip ever materializes between matmul and activation.

Packing contract (see ops/packing.py): both operands are packed with the
same width `bits`:
- W1A1 layers: bits=1, values ±1, 32 per uint32 word.
- W1A2/W2A2 layers: bits=2, codes {0..3} = levels {-3,-1,1,3}, 16 per word
  (±1 weights of a W1A2 layer are stored as codes 1/2 so both operands
  share one packing and decode path).
Pad positions are zero bits in both operands; each contributes
``padval²`` (+1 for bits=1, +9 for bits=2) to the raw accumulator, and the
kernel subtracts the static pad contribution before thresholding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bnn_pynq_tpu.ops.packing import WORD_BITS, packed_len

_REAL_TPU_PLATFORMS = ("tpu", "axon")


def on_tpu() -> bool:
    try:
        return jax.default_backend() in _REAL_TPU_PLATFORMS
    except RuntimeError:
        return False


def _resolve_interpret(interpret):
    if interpret is None:
        return not on_tpu()
    return interpret


def _decode_planes(words, bits: int, axis: int):
    """Decode packed uint32 words to int8 levels in bit-plane order.

    words: uint32 [..] tile; returns int8 with `axis` expanded by the
    per-word capacity (32/bits). Plane i holds ``(w >> bits*i) & mask``
    mapped to levels (2b-1 for bits=1, 2c-3 for bits=2).
    """
    per_word = WORD_BITS // bits
    mask = jnp.uint32((1 << bits) - 1)
    planes = []
    for i in range(per_word):
        c = (words >> jnp.uint32(bits * i)) & mask
        # Arithmetic in int32 (Mosaic has no int8 vector mul), cast at end.
        c32 = c.astype(jnp.int32)
        lev = 2 * c32 - (1 if bits == 1 else 3)
        planes.append(lev.astype(jnp.int8))
    return jnp.concatenate(planes, axis=axis)


def _mxu_kernel(a_ref, w_ref, out_ref, *, bits, pad_contrib, thr_refs, nthr,
                out_codes):
    a_dec = _decode_planes(a_ref[:], bits, axis=1)        # [TM, Kdec] int8
    w_dec = _decode_planes(w_ref[:], bits, axis=0)        # [Kdec, TN] int8
    acc = jax.lax.dot_general(
        a_dec, w_dec,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    acc = acc - jnp.int32(pad_contrib)
    _emit(acc, out_ref, thr_refs, nthr, out_codes)


def _mxu_t_kernel(at_ref, w_ref, out_ref, *, bits, pad_contrib, thr_refs,
                  nthr, out_codes):
    """Transposed-activation MXU kernel: both operands arrive as
    [Kw, tile] so the bit-plane decode concatenates along the SUBLANE axis
    with full 128-lane tiles (the row-major variant decodes activation
    tiles with only Kw lanes live — Kw is ~18-144 for these nets, wasting
    most of the VPU). The MXU contracts dim 0 of both decoded operands."""
    a_dec = _decode_planes(at_ref[:], bits, axis=0)       # [Kdec, TM] int8
    w_dec = _decode_planes(w_ref[:], bits, axis=0)        # [Kdec, TN] int8
    acc = jax.lax.dot_general(
        a_dec, w_dec,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )                                                      # [TM, TN]
    acc = acc - jnp.int32(pad_contrib)
    _emit(acc, out_ref, thr_refs, nthr, out_codes)


def _vpu_kernel(a_ref, w_ref, out_ref, *, k_true, thr_refs, nthr, out_codes):
    kw = a_ref.shape[1]
    tm = a_ref.shape[0]
    tn = w_ref.shape[1]

    # Static unroll over the packed-word fold (the analogue of the MVTU's
    # WMEM fold loop). Dynamic column extraction a_ref[:, w] does not
    # legalize in Mosaic (strided <TM x 1> vector load), but static slices
    # do; Kw is small for these networks (<=150) so the unroll is cheap.
    popc = jnp.zeros((tm, tn), dtype=jnp.int32)
    for w in range(kw):
        a_col = a_ref[:, w:w + 1]                         # [TM,1] uint32
        w_row = w_ref[w:w + 1, :]                         # [1,TN] uint32
        x = jax.lax.bitwise_xor(a_col, w_row)             # [TM,TN]
        popc = popc + jax.lax.population_count(x).astype(jnp.int32)
    # true ±1 dot = K_true - 2*popcount(xor); pad bits agree so they only
    # shift the padded dot, which the K_true form already excludes.
    acc = jnp.int32(k_true) - 2 * popc
    _emit(acc, out_ref, thr_refs, nthr, out_codes)


def _emit(acc, out_ref, thr_refs, nthr, out_codes):
    if not out_codes:
        out_ref[:] = acc
        return
    thr_ref = thr_refs[0]
    code = jnp.zeros(acc.shape, dtype=jnp.int8)
    for t in range(nthr):
        code = code + (acc >= thr_ref[t, :][None, :]).astype(jnp.int8)
    out_ref[:] = code


def _check_divisible(name, value, by):
    if value % by != 0:
        raise ValueError(f"{name}={value} must be divisible by {by}; "
                         "use packed_matmul_padded for arbitrary shapes")


@functools.partial(
    jax.jit,
    static_argnames=("k", "bits", "route", "block_m", "block_n", "interpret"))
def packed_matmul(a_packed, w_packed, thr=None, *, k, bits=1, route="mxu",
                  block_m=128, block_n=128, interpret=None):
    """Quantized matmul on packed operands with optional fused thresholds.

    a_packed: uint32 [M, Kw]   (K packed along last axis, width `bits`)
    w_packed: uint32 [Kw, N]   (K packed along first axis)
    thr:      int32 [nthr, N] ascending per-channel thresholds, or None.
    k:        true (unpadded) contraction length.
    returns int8 codes [M, N] if thr is given, else int32 exact accumulator.

    M must be divisible by block_m and N by block_n (see
    `packed_matmul_padded` for the general wrapper).
    """
    interpret = _resolve_interpret(interpret)
    m, kw = a_packed.shape
    kw2, n = w_packed.shape
    if kw != kw2:
        raise ValueError(f"packed K mismatch: {kw} vs {kw2}")
    per_word = WORD_BITS // bits
    if packed_len(k, bits) != kw:
        raise ValueError(f"k={k} bits={bits} implies Kw={packed_len(k, bits)}"
                         f" but operands have Kw={kw}")
    _check_divisible("M", m, block_m)
    _check_divisible("N", n, block_n)
    if route == "vpu" and bits != 1:
        raise ValueError("route='vpu' (XNOR popcount) requires bits=1")
    if route not in ("mxu", "mxu_rm", "vpu"):
        raise ValueError(f"unknown route {route!r}")

    n_pad = kw * per_word - k
    padval = -1 if bits == 1 else -3
    pad_contrib = n_pad * padval * padval

    out_codes = thr is not None
    nthr = thr.shape[0] if out_codes else 0
    out_dtype = jnp.int8 if out_codes else jnp.int32

    grid = (m // block_m, n // block_n)
    if route == "mxu":
        # transposed-activation layout: [Kw, M] with M on lanes (the
        # transpose fuses into the caller's packing ops under jit)
        a_operand = jnp.transpose(a_packed)
        a_spec = pl.BlockSpec((kw, block_m), lambda i, j: (0, i),
                              memory_space=pltpu.VMEM)
    else:
        a_operand = a_packed
        a_spec = pl.BlockSpec((block_m, kw), lambda i, j: (i, 0),
                              memory_space=pltpu.VMEM)
    in_specs = [
        a_spec,
        pl.BlockSpec((kw, block_n), lambda i, j: (0, j),
                     memory_space=pltpu.VMEM),
    ]
    operands = [a_operand, w_packed]
    if out_codes:
        in_specs.append(
            pl.BlockSpec((nthr, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM))
        operands.append(thr)

    kdec = kw * per_word
    cost = pl.CostEstimate(
        flops=2 * m * n * kdec,
        bytes_accessed=(m * kw + kw * n) * 4 + m * n * (1 if out_codes else 4),
        transcendentals=0,
    )

    def kernel(*refs):
        if out_codes:
            a_ref, w_ref, thr_ref, out_ref = refs
            thr_refs = (thr_ref,)
        else:
            a_ref, w_ref, out_ref = refs
            thr_refs = ()
        if route == "mxu":
            _mxu_t_kernel(a_ref, w_ref, out_ref, bits=bits,
                          pad_contrib=pad_contrib, thr_refs=thr_refs,
                          nthr=nthr, out_codes=out_codes)
        elif route == "mxu_rm":
            _mxu_kernel(a_ref, w_ref, out_ref, bits=bits,
                        pad_contrib=pad_contrib, thr_refs=thr_refs,
                        nthr=nthr, out_codes=out_codes)
        else:
            _vpu_kernel(a_ref, w_ref, out_ref, k_true=k, thr_refs=thr_refs,
                        nthr=nthr, out_codes=out_codes)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        cost_estimate=cost,
        interpret=interpret,
    )(*operands)


def packed_matmul_padded(a_packed, w_packed, thr=None, *, k, bits=1,
                         route="mxu", block_m=128, block_n=128,
                         interpret=None):
    """`packed_matmul` for arbitrary M/N: pads M with zero rows; N is
    handled by shrinking block_n to N when N < block_n (Mosaic masks
    non-128 lane tiles internally — all SFC/LFC/CNV layer widths are either
    ≤ 128 or multiples of 128, so no channel padding is ever needed)."""
    m = a_packed.shape[0]
    n = w_packed.shape[1]
    if n < block_n:
        block_n = n
    elif n % block_n != 0:
        raise ValueError(
            f"N={n} is neither < block_n nor a multiple of block_n="
            f"{block_n}; choose a block_n that divides N")
    block_m_eff = min(block_m, _round_up(m, 8))
    m_pad = _round_up(m, block_m_eff) - m
    if m_pad:
        a_packed = jnp.pad(a_packed, ((0, m_pad), (0, 0)))
    out = packed_matmul(a_packed, w_packed, thr, k=k, bits=bits, route=route,
                        block_m=block_m_eff, block_n=block_n,
                        interpret=interpret)
    if m_pad:
        out = out[:m]
    return out


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m
