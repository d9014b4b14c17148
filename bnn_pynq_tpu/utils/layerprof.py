"""Per-layer timing breakdown — jit each layer of a compiled network
separately and time it at a given batch size, so perf work can see where
the milliseconds go (the rebuild's version of Vivado HLS's per-block
II/latency reports, SURVEY.md §5.1).

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
from bnn_pynq_tpu.utils.profiling import steady_state_time


def profile_layers(compiled, batch: int = 1024, iters: int = 10) -> List[dict]:
    """Time each layer of the decoded-integer route individually.
    Returns [{layer, kind, k, n, ms, macs, tops}]."""
    config = compiled.config
    plan = make_plan(config)
    params = [{k: jnp.asarray(v) for k, v in layer.items()}
              for layer in compiled.layers]
    decoded = decode_params(config, params)
    rng = np.random.default_rng(0)

    # synthesize layer inputs by running the graph once, recording shapes
    if config.input_kind == "bipolar":
        x = jnp.asarray(rng.choice(
            [-1, 1], size=(batch, int(np.prod(config.input_shape))))
            .astype(np.int8))
        act = _input_codes(config, x)
    else:
        act = jnp.asarray(rng.integers(
            -128, 128, size=(batch,) + config.input_shape).astype(np.int8))

    h, w, _ = config.input_shape
    rows = []
    for li, (lp, p) in enumerate(zip(plan, decoded)):
        thr = None if lp.last else p.get("thr")

        if lp.kind == "pool":
            fn = jax.jit(lambda a: maxpool2d(a, lp.window))
            macs = 0
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

            fn = jax.jit(conv_fn)
            oh = (act.shape[1] - lp.kernel) // lp.stride + 1
            ow = (act.shape[2] - lp.kernel) // lp.stride + 1
            macs = batch * oh * ow * lp.k * lp.n
        else:
            w_int8 = p["w_int8"]

            def dense_fn(a, w_int8=w_int8, thr=thr):
                if a.ndim > 2:
                    a = a.reshape(a.shape[0], -1)
                acc = ref.int_matmul_ref(codes_to_values(a, config.abits),
                                         w_int8)
                return acc if thr is None else multithreshold(acc, thr)

            fn = jax.jit(dense_fn)
            macs = batch * lp.k * lp.n

        dt = steady_state_time(lambda: fn(act), iters=iters)
        rows.append({
            "layer": li, "kind": lp.kind, "k": lp.k, "n": lp.n,
            "ms": dt * 1e3, "macs": macs,
            "tops": (2 * macs / dt) / 1e12 if macs else 0.0,
        })
        act = fn(act)
    return rows
