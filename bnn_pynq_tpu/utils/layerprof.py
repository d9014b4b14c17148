"""Per-layer timing breakdown — the rebuild's version of Vivado HLS's
per-block II/latency reports (SURVEY.md §5.1).

Method: time cumulative PREFIXES of the network, each jitted with a
scalar (checksum) output, and difference consecutive prefixes. Timing a
layer in isolation is impossible through the axon tunnel: fetching a
layer's multi-MB activation output dominates (hundreds of ms of tunnel
bandwidth vs single-digit ms of compute — measured r2), while a scalar
output costs nothing. The prefix method keeps every timed program's
output at 4 bytes. Differencing adds noise ~±(launch jitter), so layers
cheaper than ~0.1 ms at batch 1024 read as ~0.

    from bnn_pynq_tpu.utils.layerprof import profile_layers
    rows = profile_layers(compiled, batch=1024)
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from bnn_pynq_tpu.models.network import (decode_params, make_plan,
                                         _input_codes)
from bnn_pynq_tpu.ops import ref
from bnn_pynq_tpu.ops.conv import maxpool2d, sliding_window
from bnn_pynq_tpu.ops.thresholds import codes_to_values, multithreshold
from bnn_pynq_tpu.utils.profiling import steady_state_stats


def _layer_fns(config, plan, decoded):
    """One callable per layer (act -> act), decoded-integer route."""
    fns = []
    for lp, p in zip(plan, decoded):
        thr = None if lp.last else p.get("thr")
        if lp.kind == "pool":
            def pool_fn(a, lp=lp):
                return maxpool2d(a, lp.window)
            fns.append(pool_fn)
        elif lp.kind in ("conv", "conv_int8"):
            wmat = p["w_hwio"].reshape(lp.k, lp.n) if "w_hwio" in p \
                else p["w_int8"]

            def conv_fn(a, wmat=wmat, lp=lp, thr=thr):
                vals = a if lp.kind == "conv_int8" \
                    else codes_to_values(a, config.abits)
                patches = sliding_window(vals, lp.kernel, lp.kernel,
                                         lp.stride)
                b, oh, ow, k = patches.shape
                acc = ref.int_matmul_ref(
                    patches.reshape(b * oh * ow, k), wmat)
                acc = acc.reshape(b, oh, ow, lp.n)
                return acc if thr is None else multithreshold(acc, thr)
            fns.append(conv_fn)
        else:
            w_int8 = p["w_int8"]

            def dense_fn(a, w_int8=w_int8, thr=thr):
                if a.ndim > 2:
                    a = a.reshape(a.shape[0], -1)
                acc = ref.int_matmul_ref(codes_to_values(a, config.abits),
                                         w_int8)
                return acc if thr is None else multithreshold(acc, thr)
            fns.append(dense_fn)
    return fns


def profile_layers(compiled, batch: int = 1024, iters: int = 30) -> List[dict]:
    """Per-layer ms via prefix differencing on the decoded-integer route.
    Returns [{layer, kind, k, n, ms, macs, tops}]; `ms` of layer i =
    t(prefix_{i+1}) - t(prefix_i), clamped at 0."""
    config = compiled.config
    plan = make_plan(config)
    params = [{k: jnp.asarray(v) for k, v in layer.items()}
              for layer in compiled.layers]
    decoded = decode_params(config, params)
    rng = np.random.default_rng(0)

    if config.input_kind == "bipolar":
        x = jnp.asarray(rng.choice(
            [-1, 1], size=(batch, int(np.prod(config.input_shape))))
            .astype(np.int8))
        act0 = _input_codes(config, x)
    else:
        act0 = jnp.asarray(rng.integers(
            -128, 128, size=(batch,) + config.input_shape).astype(np.int8))

    fns = _layer_fns(config, plan, decoded)

    def make_prefix(n_layers):
        def prefix(a):
            for f in fns[:n_layers]:
                a = f(a)
            return jnp.sum(a.astype(jnp.int32))
        return jax.jit(prefix)

    times, halfranges = [0.0], [0.0]
    for i in range(1, len(fns) + 1):
        pf = make_prefix(i)
        med, hr = steady_state_stats(lambda pf=pf: pf(act0), iters=iters)
        times.append(med)
        halfranges.append(hr)

    # spatial extents for MAC accounting
    h, w, _ = config.input_shape
    rows = []
    for li, lp in enumerate(plan):
        if lp.kind == "pool":
            h //= lp.window
            w //= lp.window
            macs = 0
        elif lp.kind in ("conv", "conv_int8"):
            h = (h - lp.kernel) // lp.stride + 1
            w = (w - lp.kernel) // lp.stride + 1
            macs = batch * h * w * lp.k * lp.n
        else:
            macs = batch * lp.k * lp.n
        dt = max(0.0, times[li + 1] - times[li])
        noise = halfranges[li + 1] + halfranges[li]
        rows.append({
            "layer": li, "kind": lp.kind, "k": lp.k, "n": lp.n,
            "ms": dt * 1e3, "macs": macs,
            # uncertainty of the DIFFERENCE (sum of both prefixes' timing
            # half-ranges) — a 0.0 ms row for a real layer must read as
            # noise, not data (VERDICT r3 weak #5)
            "noise_ms": noise * 1e3,
            "suspect": bool(abs(times[li + 1] - times[li]) < noise),
            "tops": (2 * macs / dt) / 1e12 if macs and dt > 0 else 0.0,
        })
    return rows
