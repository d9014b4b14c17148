"""Fused conv-stack Pallas kernels v2 — in-VMEM im2col + one MXU dot per
layer. This is the round-2 rebuild of the reference's dataflow conv
pipeline (SURVEY.md C2/C3/C9 `ConvolutionInputGenerator`+`ConvLayer_Batch`
chained under `#pragma HLS DATAFLOW` «bnn/src/network/<net>/hw/top.cpp»):
activations stay in VMEM across chained layers; each layer's K×K patch
matrix is BUILT IN VMEM scratch by k² lane-offset stores of shifted row
slices (a Mosaic-legal primitive — see tools/mosaic_probes.py), then hits
the MXU as a single int8×int8→int32 `dot_general` with contraction K²·C.

Why this beats r1's `conv_chain_direct` (k² separate small dots): one dot
of depth K²·C keeps the MXU pipeline full instead of restarting it 9×
with K=C, and the patch build is cheap VPU copies inside VMEM (~µs)
instead of extra MXU latency. Measured r2: CNV chain layers went from
~10 ms to ~1 ms at batch 1024.

Pitch trick (same as r1): activations live on the full [H, W] grid with
row pitch W; layer j's valid region shrinks by (K-1) per layer; kept
output rows only ever read valid rows of the previous layer, so border
garbage never corrupts a kept output and needs no masking. Scratch
buffers carry `maxoff` uninitialized slack rows so shifted reads stay in
bounds; the block's last image overruns into that slack, which only
feeds garbage rows.

Both kernels emit/consume int8 activation CODES ({0,1} abits=1 /
{0..3} abits=2); levels (2c-1 / 2c-3) are decoded once per layer into
scratch, not per shift.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bnn_pynq_tpu.ops.matmul import _resolve_interpret

_SUBLANE = 32     # int8 sublane tile: HBM block offsets must be 32-aligned


def _round_up(x: int, mto: int) -> int:
    return -(-x // mto) * mto


def _pick_block_b(hw_pad: int, target_rows: int, scratch_per_row: int,
                  vmem_budget: int = 9 << 20):
    """Images are row-padded to hw_pad (32-aligned), so any block_b
    yields aligned blocks; aim m = block_b*hw_pad near target_rows but
    shrink while the estimated per-block VMEM scratch exceeds budget."""
    block_b = max(1, target_rows // hw_pad)
    while block_b > 1 and block_b * hw_pad * scratch_per_row > vmem_budget:
        block_b -= 1
    return block_b


def _threshold_codes(acc, thr_ref, nthr):
    code = jnp.zeros(acc.shape, dtype=jnp.int32)
    for t in range(nthr):
        code = code + (acc >= thr_ref[t, :][None, :]).astype(jnp.int32)
    return code


def conv_chain_vmem(x, weights, thresholds, *, kernel: int, abits: int,
                    input_patches: bool = False, input_levels: bool = False,
                    block_b: int = 0, target_rows: int = 4096,
                    offset_mode: str = "exact", build_mode: str = "slab",
                    interpret=None):
    """Chained stride-1 VALID convs in one kernel, VMEM im2col per layer.

    x: int8 [B, H, W, C0] activation codes (or levels if `input_levels`),
       OR prebuilt first-layer patches [B, H, W, K²C_in] when
       `input_patches` (pitch = this grid's W; e.g. from ops.conv.
       sliding_window, which also absorbs a stride>1 first conv).
    weights: list of int8 level matrices [K²C_j, C_{j+1}], (ki,kj,c) order.
    thresholds: list of int32 [nthr, C_{j+1}] — every chained layer
       quantizes (a chain never ends a network).
    Returns int8 codes [B, H, W, C_last] on the full grid; the valid
    region is [:, :H-n(K-1), :W-n(K-1)] with n = len(weights) minus
    (1 if input_patches else 0) ... i.e. each NON-prebuilt conv shrinks
    the grid by K-1; the caller slices.

    build_mode:
    - 'slab' (default): per layer, build ONE [rows, K·C] buffer with the
      K lane-offset stores of kj-shifted levels, then K accumulated MXU
      dots of contraction K·C — slab `ki` reads rows [ki·W, ki·W+m).
      K× less VPU copy volume and ~3× less scratch than 'patch9', at the
      cost of K dot launches per layer (K-tile depth K·C keeps the MXU
      pipeline reasonably full).
    - 'patch9': the round-2 design — K² lane-offset stores building the
      full [m, K²C] patch matrix, one dot of contraction K²C per layer.
    """
    interpret = _resolve_interpret(interpret)
    b, h, w, cx = x.shape
    k = kernel
    n_layers = len(weights)
    if len(thresholds) != n_layers:
        raise ValueError("one threshold table per chained layer")
    chans = [weights[0].shape[0] // (k * k)] + [wt.shape[1] for wt in weights]
    for j, wt in enumerate(weights[1:], 1):
        if wt.shape[0] != k * k * chans[j]:
            raise ValueError(f"layer {j}: weight rows {wt.shape[0]} != "
                             f"K²C {k * k * chans[j]}")
    if input_patches and cx != k * k * chans[0]:
        raise ValueError(f"patch lanes {cx} != K²C_in {k * k * chans[0]}")
    if not input_patches and cx != chans[0]:
        raise ValueError(f"channels {cx} != weight C_in {chans[0]}")
    # In-kernel patch builds store at lane offsets idx*c — only Mosaic-
    # legal for 32-aligned channel counts (probed on v5e, see
    # tools/mosaic_probes.py). Interpret mode would silently accept any c
    # and then fail at Mosaic lowering on real hardware; reject at trace
    # time instead.
    start_j = 1 if input_patches else 0
    for j in range(start_j, n_layers):
        if chans[j] % 32 != 0:
            raise ValueError(
                f"in-kernel patch build for layer {j} needs a 32-aligned "
                f"channel count, got {chans[j]} (lane-offset stores are "
                "only Mosaic-legal at 32-multiples); prebuild this "
                "layer's patches in XLA instead")

    nthr = thresholds[0].shape[0]
    level_off = 1 if abits == 1 else 3
    o_last = chans[-1]

    hw = h * w
    hw_pad = _round_up(hw, _SUBLANE)     # per-image row padding → any
    # block_b gives 32-aligned HBM block offsets, decoupling the block
    # size from the image size (a 900-row image no longer forces 7200-row
    # blocks that blow the 16 MB VMEM limit)
    if not block_b:
        # per-row scratch estimate: build buffers per layer, int32
        # epilogue temps, and in/out pipeline double-buffers
        start = 1 if input_patches else 0
        if build_mode == "slab":
            per_row = sum(k * chans[j] for j in range(start, n_layers))
        else:
            per_row = sum(chans[j] + k * k * chans[j]
                          for j in range(start, n_layers))
        per_row += 8 * o_last + 3 * max(cx, 128) + 2 * o_last
        block_b = _pick_block_b(hw_pad, target_rows, per_row)
    b_pad = _round_up(b, block_b)
    if b_pad != b:
        x = jnp.pad(x, ((0, b_pad - b), (0, 0), (0, 0), (0, 0)))
    m = block_b * hw_pad
    maxoff = _round_up((k - 1) * w + (k - 1), _SUBLANE)

    x2d = x.reshape(b_pad, hw, cx)
    if hw_pad != hw:
        x2d = jnp.pad(x2d, ((0, 0), (0, hw_pad - hw), (0, 0)))
    x2d = x2d.reshape(b_pad * hw_pad, cx)

    def _diag(off):
        # TIMING DIAGNOSTICS ONLY (tools/chain_microbench): 'aligned32'
        # rounds shifts to sublane-tile multiples (wrong results, zero-
        # rotation copies), 'zero' removes the shift entirely — the
        # deltas isolate Mosaic's misaligned-access cost.
        if offset_mode == "aligned32":
            return (off // 32) * 32
        if offset_mode == "zero":
            return 0
        return off

    def kern(x_ref, *refs):
        w_refs = refs[:n_layers]
        t_refs = refs[n_layers:2 * n_layers]
        out_ref = refs[-1]

        def body(*bufs):
            # bufs layout (in visit order): patch9 — (lev_j, p_j) pairs
            # per in-kernel layer; slab — one D_j per in-kernel layer.
            pos = 0
            if input_patches:
                vals = x_ref[:] if input_levels else \
                    (2 * x_ref[:].astype(jnp.int32)
                     - level_off).astype(jnp.int8)
                acc = jax.lax.dot_general(
                    vals, w_refs[0][:],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                start = 1
                lev = None
            else:
                lev = x_ref[:] if input_levels else \
                    (2 * x_ref[:].astype(jnp.int32)
                     - level_off).astype(jnp.int8)
                acc = None
                start = 0

            for j in range(start, n_layers + 1):
                if j > 0:
                    # threshold layer j-1's accumulator into codes/levels
                    code = _threshold_codes(acc, t_refs[j - 1], nthr)
                    if j == n_layers:
                        out_ref[:] = code.astype(jnp.int8)
                        return
                    lev = (2 * code - level_off).astype(jnp.int8)
                c = chans[j]
                if build_mode == "slab":
                    # ONE K·C-wide slab buffer: K kj-shifted stores of the
                    # level values, then K accumulated dots whose slab ki
                    # reads rows [ki·W, ki·W+m) (garbage slack rows feed
                    # only garbage outputs — pitch trick, module docstring)
                    d_ref = bufs[pos]
                    pos += 1
                    for kj in range(k):
                        sh = _diag(kj)
                        d_ref[0:m - sh, kj * c:(kj + 1) * c] = lev[sh:m, :]
                    acc = None
                    for ki in range(k):
                        off = _diag(ki * w)
                        part = jax.lax.dot_general(
                            d_ref[off:off + m, :],
                            w_refs[j][ki * k * c:(ki + 1) * k * c, :],
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
                        acc = part if acc is None else acc + part
                else:
                    # patch9: lev scratch + K² shifted stores building the
                    # full [m, K²C] patch matrix, one big dot
                    lev_ref = bufs[pos]
                    pos += 1
                    lev_ref[0:m, :] = lev
                    p_ref = bufs[pos]
                    pos += 1
                    for ki in range(k):
                        for kj in range(k):
                            off = _diag(ki * w + kj)
                            idx = ki * k + kj
                            p_ref[:, idx * c:(idx + 1) * c] = \
                                lev_ref[off:off + m, :]
                    acc = jax.lax.dot_general(
                        p_ref[:], w_refs[j][:],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)

        scratches = []
        start = 1 if input_patches else 0
        for j in range(start, n_layers):
            if build_mode == "slab":
                scratches.append(
                    pltpu.VMEM((m + maxoff, k * chans[j]), jnp.int8))
            else:
                scratches.append(
                    pltpu.VMEM((m + maxoff, chans[j]), jnp.int8))
                scratches.append(
                    pltpu.VMEM((m, k * k * chans[j]), jnp.int8))
        pl.run_scoped(body, *scratches)

    in_specs = [pl.BlockSpec((m, cx), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    for wt in weights:
        in_specs.append(pl.BlockSpec(wt.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    for tt in thresholds:
        in_specs.append(pl.BlockSpec(tt.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))

    macs = sum(h * w * (k * k * chans[j]) * chans[j + 1]
               for j in range(n_layers))
    cost = pl.CostEstimate(
        flops=2 * b_pad * macs,
        bytes_accessed=x2d.size + sum(wt.size for wt in weights)
        + b_pad * h * w * o_last,
        transcendentals=0)

    full = pl.pallas_call(
        kern,
        grid=(b_pad * hw_pad // m,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((m, o_last), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad * hw_pad, o_last), jnp.int8),
        cost_estimate=cost,
        interpret=interpret,
    )(x2d, *weights, *thresholds)
    return full.reshape(b_pad, hw_pad, o_last)[:b, :hw].reshape(
        b, h, w, o_last)


def dense_block(x_codes, weights, thresholds, *, abits: int,
                input_levels: bool = False, block_m: int = 1024,
                interpret=None):
    """Chained dense layers on row-major inputs, ALL thresholded — the
    row-domain sibling of `conv_chain_vmem` (used for small-spatial convs
    after XLA im2col, e.g. CNV's 5×5→3×3 conv on [B·9, K²C] rows).
    fused_mlp.py is the final-stage variant (scale/bias epilogue).

    x_codes: int8 [M, K0] codes (or levels if input_levels).
    weights: list of int8 [K_i, N_i]; thresholds: list of int32 [nthr, N_i].
    Returns int8 codes [M, N_last].
    """
    interpret = _resolve_interpret(interpret)
    mm, k0 = x_codes.shape
    n_layers = len(weights)
    if len(thresholds) != n_layers:
        raise ValueError("one threshold table per layer")
    nthr = thresholds[0].shape[0]
    level_off = 1 if abits == 1 else 3
    bm = min(block_m, _round_up(mm, _SUBLANE))
    m_pad = _round_up(mm, bm) - mm
    if m_pad:
        x_codes = jnp.pad(x_codes, ((0, m_pad), (0, 0)))
    n_last = weights[-1].shape[1]

    def kern(x_ref, *refs):
        w_refs = refs[:n_layers]
        t_refs = refs[n_layers:2 * n_layers]
        out_ref = refs[-1]
        if input_levels:
            act = x_ref[:]
        else:
            act = (2 * x_ref[:].astype(jnp.int32)
                   - level_off).astype(jnp.int8)
        for j in range(n_layers):
            acc = jax.lax.dot_general(
                act, w_refs[j][:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            code = _threshold_codes(acc, t_refs[j], nthr)
            if j == n_layers - 1:
                out_ref[:] = code.astype(jnp.int8)
            else:
                act = (2 * code - level_off).astype(jnp.int8)

    in_specs = [pl.BlockSpec((bm, k0), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    for wt in weights:
        in_specs.append(pl.BlockSpec(wt.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    for tt in thresholds:
        in_specs.append(pl.BlockSpec(tt.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))

    macs = sum(wt.shape[0] * wt.shape[1] for wt in weights)
    cost = pl.CostEstimate(
        flops=2 * (mm + m_pad) * macs,
        bytes_accessed=(mm + m_pad) * (k0 + n_last)
        + sum(wt.size for wt in weights),
        transcendentals=0)

    out = pl.pallas_call(
        kern,
        grid=((mm + m_pad) // bm,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, n_last), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mm + m_pad, n_last), jnp.int8),
        cost_estimate=cost,
        interpret=interpret,
    )(x_codes, *weights, *thresholds)
    return out[:mm] if m_pad else out
