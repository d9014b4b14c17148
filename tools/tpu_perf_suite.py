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


def _rand_input(cfg, batch, seed=0):
    rng = np.random.default_rng(seed)
    if cfg.input_kind == "bipolar":
        return rng.choice([-1, 1], size=(
            batch, int(np.prod(cfg.input_shape)))).astype(np.int8)
    return rng.integers(-128, 128,
                        size=(batch,) + cfg.input_shape).astype(np.int8)


def measure(engine, cfg, batch, iters, repeats=5):
    """Median-of-`repeats` steady-state seconds/launch + relative spread
    (max-min)/median — the VERDICT-r1 methodology fix: one number without
    a recorded spread is unfalsifiable."""
    import jax
    xd = jax.device_put(_rand_input(cfg, batch))
    t0 = time.perf_counter()
    np.asarray(engine._fn(engine.params, engine.out_scale, engine.out_bias,
                          xd))
    compile_s = time.perf_counter() - t0
    # The device→host fetch through the tunnel costs ~30 ms FIXED, so
    # steady-state timing needs enough chained launches to amortize it.
    outs = [engine._fn(engine.params, engine.out_scale, engine.out_bias, xd)
            for _ in range(10)]
    np.asarray(outs[-1])
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        outs = [engine._fn(engine.params, engine.out_scale,
                           engine.out_bias, xd) for _ in range(iters)]
        np.asarray(outs[-1])
        ts.append((time.perf_counter() - t0) / iters)
    ts.sort()
    med = ts[len(ts) // 2]
    spread = (ts[-1] - ts[0]) / med if med > 0 else 0.0
    return med, compile_s, spread


def verify(compiled, route, batch=16):
    """Compare this route's TPU-compiled logits against the dense golden
    twin (`runtime='ref'`) on the same device — the HW/SW
    interchangeability contract (SURVEY.md §4.1 RUNTIME_HW≡RUNTIME_SW),
    now enforced on real hardware, not only under CPU interpret.

    Returns (ok, max_abs_diff). Integer-exact routes must match the twin
    bit-for-bit in the integer accumulators; after the float scale/bias
    epilogue we allow 1e-3 absolute (mega applies scale/bias in-kernel,
    so float op order may differ) but require identical argmax."""
    from bnn_pynq_tpu.runtime.engine import InferenceEngine
    cfg = compiled.config
    x = _rand_input(cfg, batch, seed=7)
    eng = InferenceEngine(compiled, runtime="auto", route=route,
                          batch_buckets=(batch,))
    ref_eng = InferenceEngine(compiled, runtime="ref",
                              batch_buckets=(batch,))
    got = eng.logits(x, prepared=True)
    want = ref_eng.logits(x, prepared=True)
    diff = float(np.max(np.abs(got - want)))
    ok = bool(diff <= 1e-3 and
              (np.argmax(got, -1) == np.argmax(want, -1)).all())
    return ok, diff


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--verify", action="store_true",
                    help="also check route logits vs the ref twin on-device")
    ap.add_argument("--routes", default="",
                    help="comma list filter, e.g. xla,mega")
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
    if args.routes:
        keep = set(args.routes.split(","))
        cases = [c for c in cases if c[1] in keep]

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    results = []
    for name, route, batch in cases:
        try:
            engine, cfg, compiled = _engine(name, route, batch)
            dt, compile_s, spread = measure(engine, cfg, batch, iters,
                                            repeats=args.repeats)
            sol = mxu_roofline_images_per_sec(cfg, chip_specs())
            row = {"network": name, "route": route, "batch": batch,
                   "ms": round(dt * 1e3, 3),
                   "images_per_sec": round(batch / dt, 1),
                   "usec_per_image": round(dt / batch * 1e6, 3),
                   "roofline_frac": round(batch / dt / sol, 4),
                   "spread": round(spread, 3),
                   "compile_s": round(compile_s, 1)}
            if args.verify:
                ok, diff = verify(compiled, route)
                row["verify_ok"] = ok
                row["verify_max_abs_diff"] = diff
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
