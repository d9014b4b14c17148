"""Driver for utils/layerprof.profile_layers: the committed per-layer
table VERDICT r2 ask #1 demands (prefix-differencing on the real chip,
decoded-integer xla route). Appends to perf_results/layerprof.jsonl.

    python tools/layer_table.py --net cnv-w1a1 --batch 1024
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
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--out", default="perf_results/layerprof.jsonl")
    args = ap.parse_args()

    from bnn_pynq_tpu.compiler.finnthesizer import CompiledNetwork
    from bnn_pynq_tpu.models import get_config
    from bnn_pynq_tpu.models.network import init_random_params
    from bnn_pynq_tpu.utils.layerprof import profile_layers

    cfg = get_config(args.net)
    layers = init_random_params(cfg, seed=0)
    compiled = CompiledNetwork(
        config=cfg,
        layers=[{k: np.asarray(v) for k, v in l.items()} for l in layers],
        out_scale=np.ones(cfg.num_classes, np.float32),
        out_bias=np.zeros(cfg.num_classes, np.float32))

    t0 = time.time()
    rows = profile_layers(compiled, batch=args.batch, iters=args.iters)
    total_ms = sum(r["ms"] for r in rows)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "a") as f:
        for r in rows:
            rec = dict(net=args.net, batch=args.batch, **r)
            line = json.dumps(rec)
            print(line, flush=True)
            f.write(line + "\n")
        summ = {"net": args.net, "batch": args.batch, "layer": "__total__",
                "ms": round(total_ms, 3),
                "images_per_sec": round(args.batch / total_ms * 1e3, 1),
                "wall_s": round(time.time() - t0, 1)}
        line = json.dumps(summ)
        print(line, flush=True)
        f.write(line + "\n")


if __name__ == "__main__":
    main()
