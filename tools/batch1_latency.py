"""Batch-1 latency isolation (VERDICT r2 ask #4): separate device
compute from tunnel dispatch/transfer in the CNV batch-1 number.

Three timings per route, iters sized for stability:
  chained   N async launches, one fetch — device-time lower bound
  sync_dev  per-iter block, device-resident input — +1 dispatch RTT
  sync_host per-iter block, host numpy input + logits fetch — the
            true per-request latency (the reference's usecPerImage
            contract measures around the accelerator call incl. DMA,
            SURVEY.md C10)
Also records the session's empty-launch floor so the rows can be read
against tunnel health.  Appends to perf_results/batch1.jsonl.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--net", default="cnv-w1a1")
    ap.add_argument("--routes", default="s2d,xla")
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--out", default="perf_results/batch1.jsonl")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from bnn_pynq_tpu.compiler.finnthesizer import CompiledNetwork
    from bnn_pynq_tpu.models import get_config
    from bnn_pynq_tpu.models.network import init_random_params
    from bnn_pynq_tpu.runtime.engine import InferenceEngine

    # session floor: chained + sync empty launches
    @jax.jit
    def empty(x):
        return x + 1.0
    z = jax.device_put(jnp.zeros((8, 128), jnp.float32))
    np.asarray(empty(z))
    t0 = time.perf_counter()
    outs = [empty(z) for _ in range(200)]
    np.asarray(outs[-1])
    floor_chained_us = (time.perf_counter() - t0) / 200 * 1e6
    t0 = time.perf_counter()
    for _ in range(50):
        np.asarray(empty(z))
    floor_sync_us = (time.perf_counter() - t0) / 50 * 1e6

    cfg = get_config(args.net)
    layers = init_random_params(cfg, seed=0)
    compiled = CompiledNetwork(
        config=cfg,
        layers=[{k: np.asarray(v) for k, v in l.items()} for l in layers],
        out_scale=np.ones(cfg.num_classes, np.float32),
        out_bias=np.zeros(cfg.num_classes, np.float32))

    rng = np.random.default_rng(0)
    if cfg.input_kind == "bipolar":
        x_np = rng.choice([-1, 1], size=(
            1, int(np.prod(cfg.input_shape)))).astype(np.int8)
    else:
        x_np = rng.integers(-128, 128,
                            size=(1,) + cfg.input_shape).astype(np.int8)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    for route in args.routes.split(","):
        eng = InferenceEngine(compiled, runtime="auto", route=route,
                              batch_buckets=(1,))
        xd = jax.device_put(x_np)
        fn = eng._fn
        np.asarray(fn(eng.params, eng.out_scale, eng.out_bias, xd))

        def med_us(launch, iters, sync):
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                if sync:
                    for _ in range(iters):
                        np.asarray(launch())
                else:
                    outs = [launch() for _ in range(iters)]
                    np.asarray(outs[-1])
                ts.append((time.perf_counter() - t0) / iters * 1e6)
            ts.sort()
            return round(ts[len(ts) // 2], 1)

        row = {
            "net": args.net, "route": route,
            "chained_us": med_us(
                lambda: fn(eng.params, eng.out_scale, eng.out_bias, xd),
                args.iters, False),
            "sync_dev_us": med_us(
                lambda: fn(eng.params, eng.out_scale, eng.out_bias, xd),
                max(20, args.iters // 4), True),
            "sync_host_us": med_us(
                lambda: fn(eng.params, eng.out_scale, eng.out_bias,
                           jnp.asarray(x_np)),
                max(20, args.iters // 4), True),
            "floor_chained_us": round(floor_chained_us, 1),
            "floor_sync_us": round(floor_sync_us, 1),
        }
        line = json.dumps(row)
        print(line, flush=True)
        with open(args.out, "a") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
