"""A/B the packed-word input transport vs the int8-code path on the
production MLP routes (VERDICT r3 missing #4: the reference feeds the
accelerator bit-packed words — «foldedmv-offload» binarizeAndPack — and
until round 4 our 32×-smaller host→device path only fed retired routes).

    python tools/packed_transport.py [--nets sfc-w1a1,lfc-w1a1]
                                     [--batches 1,1024,8192]

Measures the full synchronous request path from uint8 images to host
logits (that is where transfer size can matter), per arm:
  int8 : prepare() binarize to ±1 int8 [B, 784]  (784 B/img on the wire)
  words: native.binarize_pack → uint32 [B, 25]   (100 B/img on the wire)
Plus a chained-launch device-side arm for each (transfer excluded) so
the delta can be attributed to transport vs compute. Appends rows to
perf_results/packed_transport.jsonl. Sync rows through the axon tunnel
carry the usual large fixed cost (docs/session_variance.md) — compare
arms within one run only.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _median_spread(fn, repeats):
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    med = ts[len(ts) // 2]
    spread = (ts[-1] - ts[0]) / med if med > 0 else 0.0
    return med, spread


def run_case(name, batch, route, repeats, out_path, tag):
    import jax
    from bnn_pynq_tpu import native
    from bnn_pynq_tpu.ops import packing
    from tools.tpu_perf_suite import _engine

    engine, cfg, compiled = _engine(name, route, batch)
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, size=(batch,) + cfg.input_shape,
                        ).astype(np.uint8)

    # warm both jitted programs (and check bit-exactness while at it)
    a = engine.logits(imgs)
    b = engine.logits_words(imgs)
    exact = bool(np.array_equal(a, b))

    med_i8, sp_i8 = _median_spread(lambda: engine.logits(imgs), repeats)
    med_w, sp_w = _median_spread(lambda: engine.logits_words(imgs), repeats)

    # device-only chained arms: transfer once, launch many
    x_i8 = jax.device_put(engine.prepare(imgs))
    words = jax.device_put(native.binarize_pack(
        imgs.reshape(batch, -1)))
    iters = 50

    def chain_i8():
        outs = [engine._fn(engine.params, engine.out_scale, engine.out_bias,
                           x_i8) for _ in range(iters)]
        np.asarray(outs[-1])

    def chain_w():
        outs = [engine._fn_words(engine.params, engine.out_scale,
                                 engine.out_bias, words)
                for _ in range(iters)]
        np.asarray(outs[-1])

    dev_i8, dsp_i8 = _median_spread(chain_i8, 3)
    dev_w, dsp_w = _median_spread(chain_w, 3)

    n_in = int(np.prod(cfg.input_shape))
    row = {
        "network": name, "route": route, "batch": batch,
        "bytes_per_img_int8": n_in,
        "bytes_per_img_words": packing.packed_len(n_in, 1) * 4,
        "sync_ms_int8": round(med_i8 * 1e3, 3),
        "sync_ms_words": round(med_w * 1e3, 3),
        "sync_spread_int8": round(sp_i8, 3),
        "sync_spread_words": round(sp_w, 3),
        "dev_ms_int8": round(dev_i8 / iters * 1e3, 4),
        "dev_ms_words": round(dev_w / iters * 1e3, 4),
        "dev_spread_int8": round(dsp_i8, 3),
        "dev_spread_words": round(dsp_w, 3),
        "sync_win_words": round(med_i8 / med_w, 3),
        "dev_win_words": round(dev_i8 / dev_w, 3),
        "bit_exact": exact,
    }
    if tag:
        row["tag"] = tag
    line = json.dumps(row)
    print(line, flush=True)
    with open(out_path, "a") as f:
        f.write(line + "\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nets", default="sfc-w1a1,lfc-w1a1")
    ap.add_argument("--batches", default="1,1024,8192")
    ap.add_argument("--route", default="xla")
    ap.add_argument("--repeats", type=int, default=7)
    ap.add_argument("--tag", default="r4")
    ap.add_argument("--out", default="perf_results/packed_transport.jsonl")
    args = ap.parse_args()
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    for name in args.nets.split(","):
        for b in (int(x) for x in args.batches.split(",")):
            try:
                run_case(name, b, args.route, args.repeats, args.out,
                         args.tag)
            except Exception as e:
                print(json.dumps({"network": name, "batch": b,
                                  "error": str(e)[:300]}), flush=True)


if __name__ == "__main__":
    main()
