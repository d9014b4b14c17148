"""Direct Pallas conv kernel — the true sliding-window-unit analogue
(SURVEY.md C2): no im2col materialization at all.

Formulation ("pitch trick"): flatten activations to x2d [B·H·W, C] with
row pitch W. A VALID KxK stride-1 conv is then K² shifted MXU matmuls:

    acc[r, o] += x2d[r + ki*W + kj, :] · w[ki, kj, :, o]

For every KEPT output row r = b·H·W + oh·W + ow (oh < OH, ow < OW) the
shifted read r + ki*W + kj = b·H·W + (oh+ki)·W + (ow+kj) stays inside
image b and inside the valid column range, so no wrap-around ever
pollutes a kept output; rows with oh ≥ OH or ow ≥ OW compute garbage that
the caller slices away. Each shift is a static contiguous sublane slice
of a VMEM-resident block, and each partial product is a well-shaped
[M, C]×[C, O] int8 MXU dot — exactly what the hardware wants.

Weights arrive as the standard (ki,kj,c)-ordered matrix [K²·C, O]
(decoded int8 levels); thresholds fuse into the epilogue as usual.

Cost vs im2col: reads x once (no K² duplication), does H·W/OH·OW ≈
1.1–1.4× extra MAC rows for CNV shapes — a large net win on HBM-bound
layers.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bnn_pynq_tpu.ops.matmul import _resolve_interpret

_SUBLANE = 32    # int8 sublane tile: DMA slices/offsets and block rows
                 # must be 32-aligned on dim 0 (Mosaic requirement)


def _round_up(x: int, mto: int) -> int:
    return -(-x // mto) * mto


def _pick_block_b(b: int, hw: int, target_rows: int = 8192):
    """Choose (block_b, b_padded): block rows m = block_b*hw must be
    _SUBLANE-aligned, block_b must divide the (possibly padded) batch, and
    m should sit near target_rows for good MXU utilization."""
    d0 = _SUBLANE // math.gcd(hw, _SUBLANE)
    block_b = max(d0, d0 * max(1, target_rows // (d0 * hw)))
    b_pad = _round_up(b, block_b)
    return block_b, b_pad


def conv2d_direct(x_codes, w_dec, thr=None, *, kernel: int, abits: int,
                  stride: int = 1, block_b: int = 4, interpret=None):
    """x_codes: int8 activation codes [B, H, W, C] ({0,1} abits=1,
    {0..3} abits=2); w_dec: int8 levels [K²·C, O] in (ki,kj,c) order;
    thr: int32 [nthr, O] or None. Returns [B, OH, OW, O] codes or int32.

    VALID padding. stride==1 runs the pitch-trick kernel below (no
    im2col anywhere); stride>1 — which the pitch trick cannot express
    (compacting strided rows is not Mosaic-legal, tools/mosaic_probes) —
    runs XLA-prebuilt patches through the single-layer VMEM chain
    kernel, matching «slidingwindow.h»'s stride templating (SURVEY C2)."""
    interpret = _resolve_interpret(interpret)
    if stride != 1:
        if thr is None:
            raise ValueError("strided conv2d_direct requires thresholds "
                             "(the accumulator path is stride-1 only)")
        from bnn_pynq_tpu.ops.conv import sliding_window
        from bnn_pynq_tpu.ops.conv_stack import conv_chain_vmem
        patches = sliding_window(x_codes, kernel, kernel, stride)
        return conv_chain_vmem(patches, [w_dec], [thr], kernel=kernel,
                               abits=abits, input_patches=True,
                               input_levels=False, interpret=interpret)
    b, h, w, c = x_codes.shape
    k = kernel
    oh, ow = h - k + 1, w - k + 1
    o = w_dec.shape[1]
    if w_dec.shape[0] != k * k * c:
        raise ValueError(f"weight rows {w_dec.shape[0]} != K²C {k * k * c}")
    nthr = thr.shape[0] if thr is not None else 0
    out_codes = thr is not None
    out_dtype = jnp.int8 if out_codes else jnp.int32

    block_b, b_pad = _pick_block_b(b, h * w)
    if b_pad != b:
        x_codes = jnp.pad(x_codes, ((0, b_pad - b), (0, 0), (0, 0), (0, 0)))
    b_eff = b_pad
    m = block_b * h * w                     # rows per grid step (32-aligned)
    maxoff = _round_up((k - 1) * w + (k - 1), _SUBLANE)

    x2d = x_codes.reshape(b_eff * h * w, c)
    x2d = jnp.pad(x2d, ((0, maxoff), (0, 0)))   # tail overlap for last block
    level_off = 1 if abits == 1 else 3

    # Pre-overlapped windows: manual HBM DMA slices require 128-aligned
    # lane counts in Mosaic, so instead each grid step's window (block +
    # maxoff overlap rows, ~1% duplication) is materialized as its own
    # leading-dim slot and fed through a standard blocked spec.
    nb = b_eff * h * w // m
    x_win = jnp.stack([jax.lax.dynamic_slice_in_dim(x2d, i * m,
                                                    m + maxoff, axis=0)
                       for i in range(nb)])

    def kern(*refs):
        # Weights arrive as k² separate [C, O] refs (in-kernel sublane
        # row-slicing of one big matrix does not legalize in Mosaic).
        x_ref = refs[0]
        w_krefs = refs[1:1 + k * k]
        if out_codes:
            thr_ref = refs[1 + k * k]
        out_ref = refs[-1]

        def body(levbuf):
            # decode codes → levels ONCE; the K² shifts then slice the
            # decoded buffer (9× less VPU decode work than per-shift)
            levbuf[:] = (2 * x_ref[0].astype(jnp.int32)
                         - level_off).astype(jnp.int8)
            acc = jnp.zeros((m, o), dtype=jnp.int32)
            for ki in range(k):
                for kj in range(k):
                    off = ki * w + kj
                    idx = ki * k + kj
                    acc = acc + jax.lax.dot_general(
                        levbuf[off:off + m, :], w_krefs[idx][:],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
            if out_codes:
                code = jnp.zeros(acc.shape, dtype=jnp.int8)
                for t in range(nthr):
                    code = code + (acc >= thr_ref[t, :][None, :]).astype(
                        jnp.int8)
                out_ref[:] = code
            else:
                out_ref[:] = acc

        pl.run_scoped(body, pltpu.VMEM((m + maxoff, c), jnp.int8))

    w_blocks = [w_dec[idx * c:(idx + 1) * c, :] for idx in range(k * k)]
    in_specs = [pl.BlockSpec((1, m + maxoff, c), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)]
    in_specs += [pl.BlockSpec((c, o), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)] * (k * k)
    operands = [x_win] + w_blocks
    if out_codes:
        in_specs.append(pl.BlockSpec((nthr, o), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(thr)

    cost = pl.CostEstimate(
        flops=2 * b * h * w * k * k * c * o,
        bytes_accessed=x2d.size + w_dec.size
        + b * h * w * o * (1 if out_codes else 4),
        transcendentals=0)

    full = pl.pallas_call(
        kern,
        grid=(b_eff // block_b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((m, o), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_eff * h * w, o), out_dtype),
        cost_estimate=cost,
        interpret=interpret,
    )(*operands)
    return full.reshape(b_eff, h, w, o)[:b, :oh, :ow, :]


def conv_chain_direct(x, weights, thresholds, *, kernel: int, abits: int,
                      input_levels: bool = False, block_b: int = 4,
                      interpret=None):
    """Run SEVERAL consecutive stride-1 VALID convs in ONE Pallas kernel —
    the conv half of the FPGA's whole-network dataflow pipeline (C9
    `DoCompute`): intermediate activations never leave VMEM.

    Works on the pitch trick at a FIXED pitch W: layer j's valid region is
    [H-j(K-1), W-j(K-1)] inside the same [H, W] grid; every kept output
    row of layer j reads only valid rows of layer j-1 (the read window
    shrinks strictly inside the previous valid region), so border garbage
    never propagates — no masking needed between layers.

    x: [B, H, W, C0] int8 — activation codes, or raw int8 levels if
       `input_levels` (CNV's 8-bit image input for the first conv).
    weights: list of int8 level matrices [K²·C_j, C_{j+1}] (ki,kj,c order).
    thresholds: list of int32 [nthr, C_{j+1}], same length (each layer in
       the chain quantizes; the chain never ends a network).
    Returns codes int8 [B, OH, OW, C_last] with OH = H - n(K-1).
    """
    interpret = _resolve_interpret(interpret)
    b, h, w, c0 = x.shape
    k = kernel
    n_layers = len(weights)
    if len(thresholds) != n_layers:
        raise ValueError("one threshold table per chained layer")
    chans = [c0] + [wt.shape[1] for wt in weights]
    for j, wt in enumerate(weights):
        if wt.shape[0] != k * k * chans[j]:
            raise ValueError(f"layer {j}: weight rows {wt.shape[0]} != "
                             f"K²C {k * k * chans[j]}")
    oh = h - n_layers * (k - 1)
    ow = w - n_layers * (k - 1)
    if oh <= 0 or ow <= 0:
        raise ValueError("chain erases the spatial extent")

    block_b, b_pad = _pick_block_b(b, h * w)
    if b_pad != b:
        x = jnp.pad(x, ((0, b_pad - b), (0, 0), (0, 0), (0, 0)))
    b_eff = b_pad
    m = block_b * h * w
    maxoff = _round_up((k - 1) * w + (k - 1), _SUBLANE)
    level_off = 1 if abits == 1 else 3

    x2d = x.reshape(b_eff * h * w, c0)
    x2d = jnp.pad(x2d, ((0, maxoff), (0, 0)))
    nb = b_eff * h * w // m
    x_win = jnp.stack([jax.lax.dynamic_slice_in_dim(x2d, i * m,
                                                    m + maxoff, axis=0)
                       for i in range(nb)])

    nthr = thresholds[0].shape[0]

    def kern(*refs):
        # per-layer weights arrive as k² separate [C_j, C_{j+1}] refs
        x_ref = refs[0]
        w_krefs = []
        pos = 1
        for j in range(n_layers):
            w_krefs.append(refs[pos:pos + k * k])
            pos += k * k
        t_refs = refs[pos:pos + n_layers]
        out_ref = refs[-1]

        def conv_step(lev_buf, wk_list):
            # lev_buf holds int8 LEVELS — decode happens once per layer
            # (into scratch), not once per shift
            acc = jnp.zeros((m, wk_list[0].shape[1]), dtype=jnp.int32)
            for ki in range(k):
                for kj in range(k):
                    off = ki * w + kj
                    idx = ki * k + kj
                    acc = acc + jax.lax.dot_general(
                        lev_buf[off:off + m, :], wk_list[idx][:],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
            return acc

        def body(*bufs):
            if input_levels:
                bufs[0][:] = x_ref[0]
            else:
                bufs[0][:] = (2 * x_ref[0].astype(jnp.int32)
                              - level_off).astype(jnp.int8)
            cur = bufs[0]
            for j in range(n_layers):
                acc = conv_step(cur, w_krefs[j])
                thr_ref = t_refs[j]
                code = jnp.zeros(acc.shape, dtype=jnp.int32)
                for t in range(nthr):
                    code = code + (acc >= thr_ref[t, :][None, :]).astype(
                        jnp.int32)
                if j < n_layers - 1:
                    # store LEVELS so the next layer needs no decode; the
                    # scratch tail rows are never read for kept outputs
                    # (see docstring) — no zeroing needed
                    bufs[j + 1][0:m, :] = (2 * code - level_off).astype(
                        jnp.int8)
                    cur = bufs[j + 1]
                else:
                    out_ref[:] = code.astype(jnp.int8)

        # scratch[0]: input levels; scratch[j+1]: layer j's output levels
        scratch = [pltpu.VMEM((m + maxoff, chans[0]), jnp.int8)]
        scratch += [pltpu.VMEM((m + maxoff, chans[j + 1]), jnp.int8)
                    for j in range(n_layers - 1)]
        pl.run_scoped(body, *scratch)

    in_specs = [pl.BlockSpec((1, m + maxoff, c0), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)]
    w_blocks = []
    for j, wt in enumerate(weights):
        cin = chans[j]
        for idx in range(k * k):
            w_blocks.append(wt[idx * cin:(idx + 1) * cin, :])
            in_specs.append(pl.BlockSpec((cin, wt.shape[1]),
                                         lambda i: (0, 0),
                                         memory_space=pltpu.VMEM))
    for tt in thresholds:
        in_specs.append(pl.BlockSpec(tt.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))

    o_last = chans[-1]
    macs = sum(h * w * k * k * chans[j] * chans[j + 1]
               for j in range(n_layers))
    cost = pl.CostEstimate(flops=2 * b * macs,
                           bytes_accessed=x2d.size
                           + sum(wt.size for wt in weights)
                           + b * h * w * o_last,
                           transcendentals=0)

    full = pl.pallas_call(
        kern,
        grid=(b_eff // block_b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((m, o_last), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_eff * h * w, o_last), jnp.int8),
        cost_estimate=cost,
        interpret=interpret,
    )(x_win, *w_blocks, *thresholds)
    return full.reshape(b_eff, h, w, o_last)[:b, :oh, :ow, :]
