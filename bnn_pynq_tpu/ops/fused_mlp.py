"""Fused whole-MLP Pallas kernel — the TPU analogue of the reference's
`#pragma HLS DATAFLOW` full-network pipeline (SURVEY.md §2 "dataflow
pipeline parallelism" row, C9 `DoCompute`): every layer of an SFC/LFC-style
MLP runs inside ONE kernel with all weights resident in VMEM and
activations never leaving the chip between layers.

Layout: grid over batch tiles only; weight blocks use index (0,0) so
Pallas keeps them in VMEM across all grid steps (weight-stationary, like
the FPGA's on-chip BRAM weight memories, C5). Weights arrive pre-decoded
as int8 levels (decode once at engine load); the matmuls hit the MXU as
int8×int8→int32 and each MultiThreshold epilogue is three compares at
most. The final layer applies the folded per-class float scale/bias in
kernel, so the kernel's output is ready-to-argmax float logits.

Total VMEM for LFC-W1A1: ~2.9 MB weights + tile activations — well under
16 MB. CNV needs the spatial conv analogue (future work; the layer-wise
path handles it today).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bnn_pynq_tpu.ops.matmul import _resolve_interpret


def fused_mlp_forward(x_codes, weights, thresholds, out_scale, out_bias,
                      *, abits: int, block_b: int = 256, interpret=None):
    """Run a whole quantized MLP in one Pallas kernel.

    x_codes: int8 activation codes [B, K0] ({0,1} abits=1 / {0..3} abits=2).
    weights: list of int8 level matrices [K_i, N_i] (decoded).
    thresholds: list of int32 [nthr, N_i] for all but the last layer.
    out_scale/out_bias: float32 [ncls] folded final batch-norm.
    Returns float32 logits [B, ncls].
    """
    if len(weights) != len(thresholds) + 1:
        raise ValueError("need one threshold table per non-final layer")
    interpret = _resolve_interpret(interpret)
    b, k0 = x_codes.shape
    if b % block_b != 0:
        raise ValueError(f"B={b} must be divisible by block_b={block_b}; "
                         "use fused_mlp_forward_padded")
    ncls = weights[-1].shape[1]
    n_layers = len(weights)

    def kernel(*refs):
        x_ref = refs[0]
        w_refs = refs[1:1 + n_layers]
        t_refs = refs[1 + n_layers:n_layers + n_layers]
        scale_ref = refs[-3]
        bias_ref = refs[-2]
        out_ref = refs[-1]

        codes = x_ref[:].astype(jnp.int32)
        act = (2 * codes - (1 if abits == 1 else 3)).astype(jnp.int8)
        for li in range(n_layers):
            acc = jax.lax.dot_general(
                act, w_refs[li][:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            if li < n_layers - 1:
                thr = t_refs[li]
                code = jnp.zeros(acc.shape, dtype=jnp.int32)
                for t in range(thr.shape[0]):
                    code = code + (acc >= thr[t, :][None, :]).astype(jnp.int32)
                act = (2 * code - (1 if abits == 1 else 3)).astype(jnp.int8)
        out_ref[:] = acc.astype(jnp.float32) * scale_ref[0, :][None, :] \
            + bias_ref[0, :][None, :]

    in_specs = [pl.BlockSpec((block_b, k0), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    for w in weights:
        in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    for t in thresholds:
        in_specs.append(pl.BlockSpec(t.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    in_specs.append(pl.BlockSpec((1, ncls), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM))
    in_specs.append(pl.BlockSpec((1, ncls), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM))

    macs = sum(w.shape[0] * w.shape[1] for w in weights)
    cost = pl.CostEstimate(
        flops=2 * b * macs,
        bytes_accessed=b * k0 + sum(w.size for w in weights)
        + b * ncls * 4,
        transcendentals=0)

    return pl.pallas_call(
        kernel,
        grid=(b // block_b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_b, ncls), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, ncls), jnp.float32),
        cost_estimate=cost,
        interpret=interpret,
    )(x_codes, *weights, *thresholds,
      out_scale.reshape(1, -1), out_bias.reshape(1, -1))


def fused_mlp_forward_padded(x_codes, weights, thresholds, out_scale,
                             out_bias, *, abits: int, block_b: int = 256,
                             interpret=None):
    b = x_codes.shape[0]
    bb = min(block_b, _round_up(b, 8))
    pad = _round_up(b, bb) - b
    if pad:
        x_codes = jnp.pad(x_codes, ((0, pad), (0, 0)))
    out = fused_mlp_forward(x_codes, weights, thresholds, out_scale,
                            out_bias, abits=abits, block_b=bb,
                            interpret=interpret)
    return out[:b] if pad else out


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m
