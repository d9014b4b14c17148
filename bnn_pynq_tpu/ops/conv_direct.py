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

        def body(xbuf, sem):
            cp = pltpu.make_async_copy(
                x_hbm.at[pl.ds(i * m, m + maxoff), :], xbuf, sem)
            cp.start()
            cp.wait()
            acc = jnp.zeros((m, o), dtype=jnp.int32)
            for ki in range(k):
                for kj in range(k):
                    off = ki * w + kj
                    codes = xbuf[off:off + m, :].astype(jnp.int32)
                    lev = (2 * codes - level_off).astype(jnp.int8)
                    idx = ki * k + kj
                    wk = w_ref[idx * c:(idx + 1) * c, :]
                    acc = acc + jax.lax.dot_general(
                        lev, wk,
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
