"""Dot-rate surface probe (round 3, VERDICT asks #1/#3/#4): the
measurements behind docs/dot_rate_model.md and the s2d conv route.

Times int8 dot_general with a production-like epilogue (threshold
compare → int8; dot_probe.py's jnp.sum epilogue added hundreds of MB of
int32 HBM traffic on small-N cases) across the shapes that matter:

- the empirical RATE MODEL grid: rate collapses with K and the time is
  ≈ M·N/91e9 · ceil(K/512) on this backend — output-element drain
  bound, not MAC bound;
- CNV's native im2col shapes vs their s2d reformulations;
- dtype variants (int4 cast, bf16) at the key shapes.

CAUTION: M ≥ ~500k cases compile for minutes on the remote compile
service and have wedged it (r3 session note) — the default case list
keeps M ≤ 262144 plus one im2col reference case.

Appends to perf_results/conv_probe.jsonl.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def chain_time(launch, iters=40, repeats=4):
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


# (tag, M, K, N) — tags group the rows for the docs table
CASES = [
    # rate-model grid: M·N ≈ const, K varies
    ("model_k27",   921600, 27, 64),
    ("model_k48",   262144, 48, 256),
    ("model_k192",  65536, 192, 1024),
    ("model_k1024", 200704, 1024, 256),
    ("model_k2048", 25600, 2048, 512),
    # big-matmul ceiling references
    ("peak_2k",     16384, 2048, 2048),
    ("peak_4k",     16384, 4096, 2048),
    # CNV layer shapes: im2col native vs s2d
    ("cnv_conv3_im2col", 147456, 576, 128),
    ("cnv_conv3_s2d",    36864, 1024, 512),
    ("cnv_conv4_im2col", 102400, 1152, 128),
    ("cnv_conv4_s2d",    25600, 2048, 512),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtypes", default="int8",
                    help="comma list: int8,int4,bf16")
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--out", default="perf_results/conv_probe.jsonl")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    rng = np.random.default_rng(0)
    for tag, m, k, n in CASES:
        a8 = jnp.asarray(rng.choice([-1, 1], size=(m, k)).astype(np.int8))
        w8 = jnp.asarray(rng.choice([-1, 1], size=(k, n)).astype(np.int8))
        t = jnp.asarray(np.sort(rng.integers(-64, 64, size=(1, n)), 0)
                        .astype(np.int32))
        for dt in args.dtypes.split(","):
            def f(a, dt=dt, w=w8, t=t):
                if dt == "int4":
                    a, w = a.astype(jnp.int4), w.astype(jnp.int4)
                    pref = jnp.int32
                elif dt == "bf16":
                    a, w = a.astype(jnp.bfloat16), w.astype(jnp.bfloat16)
                    pref = jnp.float32
                else:
                    pref = jnp.int32
                acc = jax.lax.dot_general(
                    a, w, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=pref)
                if dt == "bf16":
                    acc = acc.astype(jnp.int32)
                return jnp.sum((acc >= t).astype(jnp.int32))
            try:
                t0 = time.time()
                jf = jax.jit(f)
                med, spread = chain_time(lambda: jf(a8), args.iters)
                row = {"case": tag, "m": m, "k": k, "n": n, "dtype": dt,
                       "ms": round(med * 1e3, 3),
                       "tera_macs_per_s": round(m * k * n / med / 1e12, 1),
                       "mn_gelems_per_s": round(
                           m * n / med / 1e9 / -(-k // 512), 1),
                       "spread": round(spread, 3),
                       "compile_s": round(time.time() - t0, 1)}
            except Exception as e:  # noqa: BLE001
                row = {"case": tag, "dtype": dt, "error": repr(e)[:200]}
            line = json.dumps(row)
            print(line, flush=True)
            with open(args.out, "a") as fo:
                fo.write(line + "\n")


if __name__ == "__main__":
    main()
