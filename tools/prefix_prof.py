"""Route-generic per-layer profile by CONFIG TRUNCATION — the committed
per-layer evidence VERDICT r2 ask #1 demands, for any route.

utils/layerprof.py builds prefixes from the decoded-xla ops only; this
tool instead truncates the NetworkConfig itself (layers[:i]) and runs
the production forward for the chosen route on each truncated network,
so routes with cross-layer structure (s2d phase chaining, mega) are
profiled as they actually execute. Prefix differencing with chained
launches and a scalar checksum — the axon-tunnel-safe methodology.

Truncated prefixes run with force_thresholds=True so a prefix ends in
int8 codes exactly as the full program does mid-network (without it, a
truncated s2d conv ends in an int32 phase de-interleave 4x the bytes of
anything the real network runs, corrupting the differencing).

Round-4 hygiene (VERDICT r3 next #8): every differenced row carries
`noise_ms` — the sum of the two prefixes' timing half-ranges, i.e. the
uncertainty OF THE DIFFERENCE — and a `suspect` flag when |ms| <
noise_ms. A 0.0 ms row for a real layer is now visibly noise, not data.
Also new: a `layer: "input"` row isolating the input-prep stage
(binarize→codes for bipolar nets), which prefix differencing over
layers[:i] cannot otherwise separate from layer 0.

    python tools/prefix_prof.py --net cnv-w1a1 --route s2d --batch 1024
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def chain_time(launch, iters, repeats=4):
    """(median, half-range) of seconds/launch over chained windows."""
    out = launch()
    np.asarray(out)
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        outs = [launch() for _ in range(iters)]
        np.asarray(outs[-1])
        ts.append((time.perf_counter() - t0) / iters)
    ts.sort()
    return ts[len(ts) // 2], (ts[-1] - ts[0]) / 2


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--net", default="cnv-w1a1")
    ap.add_argument("--route", default="s2d",
                    choices=["s2d", "xla", "patches"])
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--tag", default="")
    ap.add_argument("--out", default="perf_results/prefix_prof.jsonl")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from bnn_pynq_tpu.models import get_config
    from bnn_pynq_tpu.models.network import (_input_codes, decode_params,
                                             forward_xla, init_random_params,
                                             make_plan)

    cfg = get_config(args.net)
    params = [{k: jnp.asarray(v) for k, v in l.items()}
              for l in init_random_params(cfg, seed=0)]
    decoded = decode_params(cfg, params)
    rng = np.random.default_rng(0)
    if cfg.input_kind == "bipolar":
        x = jnp.asarray(rng.choice(
            [-1, 1], size=(args.batch, int(np.prod(cfg.input_shape))))
            .astype(np.int8))
    else:
        x = jnp.asarray(rng.integers(
            -128, 128, size=(args.batch,) + cfg.input_shape).astype(np.int8))
    conv_mode = {"s2d": "s2d", "xla": "patches",
                 "patches": "patches"}[args.route]

    plan = make_plan(cfg)
    t_start = time.time()

    # stage 0: input prep alone (binarize→codes for bipolar nets; an int8
    # pass-through checksum for image nets — its "time" is the launch
    # floor either way and the per-layer differencing starts from it)
    def input_stage(a):
        if cfg.input_kind == "bipolar":
            return jnp.sum(_input_codes(cfg, a).astype(jnp.int32))
        return jnp.sum(a.astype(jnp.int32))
    p0 = jax.jit(input_stage)
    t0_med, t0_hr = chain_time(lambda: p0(x), args.iters)

    meds, hrs = [t0_med], [t0_hr]
    for i in range(1, len(cfg.layers) + 1):
        sub = dataclasses.replace(cfg, layers=cfg.layers[:i])

        def fwd(a, sub=sub, i=i):
            out = forward_xla(sub, decoded[:i], a, conv_mode=conv_mode,
                              force_thresholds=(i < len(cfg.layers)))
            return jnp.sum(jnp.asarray(out).astype(jnp.int32))
        pf = jax.jit(fwd)
        med, hr = chain_time(lambda: pf(x), args.iters)
        meds.append(med)
        hrs.append(hr)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "a") as f:
        def emit(row):
            if args.tag:
                row["tag"] = args.tag
            line = json.dumps(row)
            print(line, flush=True)
            f.write(line + "\n")

        emit({"net": args.net, "route": args.route, "batch": args.batch,
              "layer": "input", "ms": round(meds[0] * 1e3, 3),
              "noise_ms": round(hrs[0] * 1e3, 3),
              "note": "includes the chained-launch dispatch floor"})
        for li, lp in enumerate(plan):
            dt = meds[li + 1] - meds[li]
            noise = hrs[li + 1] + hrs[li]
            emit({"net": args.net, "route": args.route, "batch": args.batch,
                  "layer": li, "kind": lp.kind, "k": lp.k, "n": lp.n,
                  "ms": round(dt * 1e3, 3),
                  "noise_ms": round(noise * 1e3, 3),
                  "suspect": bool(abs(dt) < noise)})
        total = meds[-1]
        emit({"net": args.net, "route": args.route, "batch": args.batch,
              "layer": "__total__", "ms": round(total * 1e3, 3),
              "noise_ms": round(hrs[-1] * 1e3, 3),
              "images_per_sec": round(args.batch / total, 1),
              "wall_s": round(time.time() - t_start, 1)})


if __name__ == "__main__":
    main()
