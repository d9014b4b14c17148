"""Per-stage timing breakdown for the mega / xla / xlaconv routes.

The round-2 verdict's core gap: nobody measured WHERE the mega route's
time goes. This tool times each production stage of a route standalone
(device-resident inputs, chained launches, scalar-checksum outputs so the
axon tunnel's ~30 ms fetch cost never pollutes the numbers) and compares
the stage sum to the end-to-end time. Mega stage boundaries come from
`models.network.mega_stages`, i.e. the exact kernels the route runs
(a Pallas kernel boundary is a real dispatch boundary, so standalone
stage timing is representative; XLA-glue stages lose cross-stage fusion
and are upper bounds).

    python tools/stage_prof.py --net cnv-w1a1 --route mega --batch 1024

Appends JSON rows to perf_results/stageprof.jsonl.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def chain_time(launch, iters=50, repeats=5):
    """Median seconds/launch over `repeats` windows of `iters` chained
    launches with one trailing fetch."""
    out = launch()
    np.asarray(out)
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        outs = [launch() for _ in range(iters)]
        np.asarray(outs[-1])
        ts.append((time.perf_counter() - t0) / iters)
    ts.sort()
    return ts[len(ts) // 2], (ts[-1] - ts[0]) / ts[len(ts) // 2]


def build_stages(net, route, batch):
    """Returns (stage list [(name, jitted_fn, input_array)], x0, e2e_fn)."""
    import jax
    import jax.numpy as jnp
    from bnn_pynq_tpu.models import get_config
    from bnn_pynq_tpu.models.network import (decode_params,
                                             init_random_params,
                                             make_plan, mega_stages,
                                             prepare_input)

    cfg = get_config(net)
    params = [{k: jnp.asarray(v) for k, v in l.items()}
              for l in init_random_params(cfg, seed=0)]
    decoded = decode_params(cfg, params)
    out_scale = jnp.ones(cfg.num_classes, jnp.float32)
    out_bias = jnp.zeros(cfg.num_classes, jnp.float32)
    rng = np.random.default_rng(0)
    if cfg.input_kind == "bipolar":
        x = jnp.asarray(rng.choice([-1, 1], size=(
            batch, int(np.prod(cfg.input_shape)))).astype(np.int8))
    else:
        x = jnp.asarray(rng.integers(
            -128, 128, size=(batch,) + cfg.input_shape).astype(np.int8))

    if route == "mega":
        named = mega_stages(cfg, decoded, out_scale, out_bias)
    elif route in ("xla", "xlaconv"):
        # per-layer stages of the decoded-integer route
        from bnn_pynq_tpu.models.network import (_conv_bf16_exact,
                                                 _weight_matrix)
        from bnn_pynq_tpu.ops import ref
        from bnn_pynq_tpu.ops.conv import maxpool2d, sliding_window
        from bnn_pynq_tpu.ops.thresholds import (codes_to_values,
                                                 multithreshold)
        plan = make_plan(cfg)
        named = []
        for li, (lp, p) in enumerate(zip(plan, decoded)):
            thr = None if lp.last else p.get("thr")
            if lp.kind == "pool":
                named.append((f"pool{li}",
                              lambda a, win=lp.window: maxpool2d(a, win)))
                continue

            def layer_fn(a, lp=lp, p=p, thr=thr):
                if lp.kind == "conv_int8":
                    vals = a
                elif lp.kind == "dense":
                    if a.ndim > 2:
                        a = a.reshape(a.shape[0], -1)
                    vals = codes_to_values(a, cfg.abits)
                else:
                    vals = codes_to_values(a, cfg.abits)
                if lp.kind in ("conv", "conv_int8"):
                    if route == "xlaconv":
                        c = lp.k // (lp.kernel * lp.kernel)
                        w_hwio = p["w_hwio"] if "w_hwio" in p else \
                            p["w_int8"].reshape(lp.kernel, lp.kernel, c, lp.n)
                        acc = _conv_bf16_exact(vals, w_hwio, lp.stride)
                    else:
                        w = _weight_matrix(p, lp)
                        patches = sliding_window(vals, lp.kernel, lp.kernel,
                                                 lp.stride)
                        b, oh, ow, k = patches.shape
                        acc = ref.int_matmul_ref(
                            patches.reshape(b * oh * ow, k), w)
                        acc = acc.reshape(b, oh, ow, lp.n)
                else:
                    acc = ref.int_matmul_ref(vals, p["w_int8"])
                return acc if thr is None else multithreshold(acc, thr)
            named.append((f"L{li}_{lp.kind}_k{lp.k}n{lp.n}", layer_fn))
    else:
        raise ValueError(f"stage_prof supports mega/xla/xlaconv, not {route}")

    # materialize each stage's input by running the real pipeline once
    act = prepare_input(cfg, x)
    stages = []
    for name, fn in named:
        a_in = jax.device_put(act)

        def checksum_fn(a, fn=fn):
            return jnp.sum(fn(a).astype(jnp.float32))
        stages.append((name, jax.jit(checksum_fn), a_in))
        act = jax.jit(fn)(a_in)

    def e2e(xx, _prep=prepare_input, _named=named):
        a = _prep(cfg, xx)
        for _, fn in _named:
            a = fn(a)
        return jnp.sum(a.astype(jnp.float32))
    return cfg, stages, jax.device_put(x), jax.jit(e2e)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--net", default="cnv-w1a1")
    ap.add_argument("--route", default="mega")
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--out", default="perf_results/stageprof.jsonl")
    args = ap.parse_args()

    cfg, stages, x0, e2e = build_stages(args.net, args.route, args.batch)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)

    rows = []
    for name, fn, a_in in stages:
        t0 = time.time()
        try:
            med, spread = chain_time(lambda fn=fn, a=a_in: fn(a),
                                     iters=args.iters, repeats=args.repeats)
            row = {"net": args.net, "route": args.route, "batch": args.batch,
                   "stage": name, "ms": round(med * 1e3, 4),
                   "spread": round(spread, 3),
                   "compile_s": round(time.time() - t0, 1)}
        except Exception as e:  # noqa: BLE001 — record and continue
            row = {"net": args.net, "route": args.route, "batch": args.batch,
                   "stage": name, "error": repr(e)[:300]}
        rows.append(row)
        print(json.dumps(row), flush=True)

    med, spread = chain_time(lambda: e2e(x0), iters=args.iters,
                             repeats=args.repeats)
    stage_sum = sum(r.get("ms", 0.0) for r in rows)
    total = {"net": args.net, "route": args.route, "batch": args.batch,
             "stage": "__e2e__", "ms": round(med * 1e3, 4),
             "spread": round(spread, 3),
             "stage_sum_ms": round(stage_sum, 4),
             "images_per_sec": round(args.batch / med, 1)}
    rows.append(total)
    print(json.dumps(total), flush=True)
    with open(args.out, "a") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
