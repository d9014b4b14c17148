"""TPU performance suite — run after any kernel change (and the moment
the device tunnel is healthy) to compare all compute routes.

    python tools/tpu_perf_suite.py [--quick]

Emits JSON lines to stdout and appends to perf_results/perf.jsonl.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _engine(name, route, batch):
    from bnn_pynq_tpu.compiler.finnthesizer import CompiledNetwork
    from bnn_pynq_tpu.models import get_config
    from bnn_pynq_tpu.models.network import init_random_params
    from bnn_pynq_tpu.runtime.engine import InferenceEngine

    cfg = get_config(name)
    layers = init_random_params(cfg, seed=0)
    compiled = CompiledNetwork(
        config=cfg,
        layers=[{k: np.asarray(v) for k, v in l.items()} for l in layers],
        out_scale=np.ones(cfg.num_classes, np.float32),
        out_bias=np.zeros(cfg.num_classes, np.float32))
    return InferenceEngine(compiled, runtime="auto", route=route,
                           batch_buckets=(batch,)), cfg, compiled


def measure(engine, cfg, batch, iters):
    import jax
    rng = np.random.default_rng(0)
    if cfg.input_kind == "bipolar":
        x = rng.choice([-1, 1], size=(
            batch, int(np.prod(cfg.input_shape)))).astype(np.int8)
    else:
        x = rng.integers(-128, 128,
                         size=(batch,) + cfg.input_shape).astype(np.int8)
    xd = jax.device_put(x)
    t0 = time.perf_counter()
    np.asarray(engine._fn(engine.params, engine.out_scale, engine.out_bias,
                          xd))
    compile_s = time.perf_counter() - t0
    # The device→host fetch through the tunnel costs ~30 ms FIXED, so
    # steady-state timing needs enough chained launches to amortize it.
    outs = [engine._fn(engine.params, engine.out_scale, engine.out_bias, xd)
            for _ in range(10)]
    np.asarray(outs[-1])
    t0 = time.perf_counter()
    outs = [engine._fn(engine.params, engine.out_scale, engine.out_bias, xd)
            for _ in range(iters)]
    np.asarray(outs[-1])
    dt = (time.perf_counter() - t0) / iters
    return dt, compile_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--out", default="perf_results/perf.jsonl")
    args = ap.parse_args()
    iters = 5 if args.quick else args.iters

    from bnn_pynq_tpu.utils.metrics import (chip_specs, network_macs,
                                            mxu_roofline_images_per_sec)

    cases = [
        ("cnv-w1a1", "xla", 1024), ("cnv-w1a1", "direct", 1024),
        ("cnv-w1a1", "mega", 1024), ("cnv-w1a1", "mxu", 1024),
        ("cnv-w1a1", "vpu", 1024),
        ("cnv-w2a2", "xla", 1024), ("cnv-w2a2", "mega", 1024),
        ("lfc-w1a1", "xla", 4096), ("lfc-w1a1", "fused", 4096),
        ("lfc-w1a1", "mxu", 4096),
        ("sfc-w1a1", "fused", 8192), ("sfc-w1a1", "xla", 8192),
        # batch-1 latency points
        ("cnv-w1a1", "xla", 1), ("cnv-w1a1", "mega", 1),
        ("sfc-w1a1", "fused", 1), ("lfc-w1a1", "fused", 1),
    ]
    if args.quick:
        cases = cases[:6]

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    results = []
    for name, route, batch in cases:
        try:
            engine, cfg, _ = _engine(name, route, batch)
            dt, compile_s = measure(engine, cfg, batch, iters)
            sol = mxu_roofline_images_per_sec(cfg, chip_specs())
            row = {"network": name, "route": route, "batch": batch,
                   "ms": round(dt * 1e3, 3),
                   "images_per_sec": round(batch / dt, 1),
                   "usec_per_image": round(dt / batch * 1e6, 3),
                   "roofline_frac": round(batch / dt / sol, 4),
                   "compile_s": round(compile_s, 1)}
        except Exception as e:
            row = {"network": name, "route": route, "batch": batch,
                   "error": str(e)[:300]}
        results.append(row)
        line = json.dumps(row)
        print(line, flush=True)
        with open(args.out, "a") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
