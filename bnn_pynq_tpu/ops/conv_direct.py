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

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bnn_pynq_tpu.ops.matmul import _resolve_interpret


def conv2d_direct(x_codes, w_dec, thr=None, *, kernel: int, abits: int,
                  block_b: int = 4, interpret=None):
    """x_codes: int8 activation codes [B, H, W, C] ({0,1} abits=1,
    {0..3} abits=2); w_dec: int8 levels [K²·C, O] in (ki,kj,c) order;
    thr: int32 [nthr, O] or None. Returns [B, OH, OW, O] codes or int32.

    Stride-1 VALID only (all reference CNV convs)."""
    interpret = _resolve_interpret(interpret)
    b, h, w, c = x_codes.shape
    k = kernel
    oh, ow = h - k + 1, w - k + 1
    o = w_dec.shape[1]
    if w_dec.shape[0] != k * k * c:
        raise ValueError(f"weight rows {w_dec.shape[0]} != K²C {k * k * c}")
    nthr = thr.shape[0] if thr is not None else 0
    out_codes = thr is not None
    out_dtype = jnp.int8 if out_codes else jnp.int32

    block_b = min(block_b, b)
    while b % block_b:
        block_b -= 1
    m = block_b * h * w                     # rows per grid step
    maxoff = (k - 1) * w + (k - 1)

    x2d = x_codes.reshape(b * h * w, c)
    x2d = jnp.pad(x2d, ((0, maxoff), (0, 0)))   # tail overlap for last block
    level_off = 1 if abits == 1 else 3

    def kern(*refs):
        # x stays in HBM; blocks overlap by `maxoff` rows (the shifted
        # reads), which Pallas block-unit index maps can't express — so
        # the kernel DMAs its own overlapping window into VMEM scratch.
        if out_codes:
            x_hbm, w_ref, thr_ref, out_ref = refs
        else:
            x_hbm, w_ref, out_ref = refs
        i = pl.program_id(0)

        def body(xbuf, levbuf, sem):
            cp = pltpu.make_async_copy(
                x_hbm.at[pl.ds(i * m, m + maxoff), :], xbuf, sem)
            cp.start()
            cp.wait()
            # decode codes → levels ONCE; the K² shifts then slice the
            # decoded buffer (9× less VPU decode work than per-shift)
            levbuf[:] = (2 * xbuf[:].astype(jnp.int32)
                         - level_off).astype(jnp.int8)
            acc = jnp.zeros((m, o), dtype=jnp.int32)
            for ki in range(k):
                for kj in range(k):
                    off = ki * w + kj
                    idx = ki * k + kj
                    wk = w_ref[idx * c:(idx + 1) * c, :]
                    acc = acc + jax.lax.dot_general(
                        levbuf[off:off + m, :], wk,
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

        pl.run_scoped(
            body,
            xbuf=pltpu.VMEM((m + maxoff, c), jnp.int8),
            levbuf=pltpu.VMEM((m + maxoff, c), jnp.int8),
            sem=pltpu.SemaphoreType.DMA,
        )

    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec((k * k * c, o), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [x2d, w_dec]
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
        grid=(b // block_b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((m, o), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h * w, o), out_dtype),
        cost_estimate=cost,
        interpret=interpret,
    )(*operands)
    return full.reshape(b, h, w, o)[:, :oh, :ow, :]


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

    block_b = min(block_b, b)
    while b % block_b:
        block_b -= 1
    m = block_b * h * w
    maxoff = (k - 1) * w + (k - 1)
    level_off = 1 if abits == 1 else 3

    x2d = x.reshape(b * h * w, c0)
    x2d = jnp.pad(x2d, ((0, maxoff), (0, 0)))

    nthr = thresholds[0].shape[0]

    def kern(*refs):
        x_hbm = refs[0]
        w_refs = refs[1:1 + n_layers]
        t_refs = refs[1 + n_layers:1 + 2 * n_layers]
        out_ref = refs[-1]

        def conv_step(lev_buf, w_ref, cin):
            # lev_buf holds int8 LEVELS — decode happens once per layer
            # (into scratch), not once per shift
            acc = jnp.zeros((m, w_ref.shape[1]), dtype=jnp.int32)
            for ki in range(k):
                for kj in range(k):
                    off = ki * w + kj
                    idx = ki * k + kj
                    wk = w_ref[idx * cin:(idx + 1) * cin, :]
                    acc = acc + jax.lax.dot_general(
                        lev_buf[off:off + m, :], wk,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
            return acc

        i = pl.program_id(0)

        def body(xbuf, *bufs_and_sem):
            bufs, sem = bufs_and_sem[:-1], bufs_and_sem[-1]
            cp = pltpu.make_async_copy(
                x_hbm.at[pl.ds(i * m, m + maxoff), :], xbuf, sem)
            cp.start()
            cp.wait()
            if input_levels:
                cur = xbuf
            else:
                bufs[0][:] = (2 * xbuf[:].astype(jnp.int32)
                              - level_off).astype(jnp.int8)
                cur = bufs[0]
            for j in range(n_layers):
                acc = conv_step(cur, w_refs[j], chans[j])
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

        # scratch[0]: decoded input levels; scratch[j+1]: layer j's output
        # levels (scratch[0] is unused when input_levels but keeps the
        # buffer list uniform)
        scratch = [pltpu.VMEM((m + maxoff, chans[0]), jnp.int8)]
        scratch += [pltpu.VMEM((m + maxoff, chans[j + 1]), jnp.int8)
                    for j in range(n_layers - 1)]
        pl.run_scoped(
            body,
            pltpu.VMEM((m + maxoff, c0), jnp.int8),
            *scratch,
            pltpu.SemaphoreType.DMA,
        )

    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    for wt in weights:
        in_specs.append(pl.BlockSpec(wt.shape, lambda i: (0, 0),
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
        grid=(b // block_b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((m, o_last), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h * w, o_last), jnp.int8),
        cost_estimate=cost,
        interpret=interpret,
    )(x2d, *weights, *thresholds)
    return full.reshape(b, h, w, o_last)[:, :oh, :ow, :]
