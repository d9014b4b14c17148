"""Raw MXU dot-rate probe: does this backend execute int8×int8→int32
dot_general at the int8 MXU rate (v5e: 394 TOPS ⇒ 197e12 MAC/s), at the
bf16 rate (98.5e12 MAC/s), or worse? The answer sets the honest roofline
denominator for every route (VERDICT r2 ask #3) — if int8 dots are
secretly upcast, "11% of int8 roofline" is really 22% of the achievable
ceiling.

Also probes K-width sensitivity at the CNV layer shapes (N=64 vs 128,
K=27..2304) to quantify small-matrix MXU efficiency.

Appends JSON rows to perf_results/dot_probe.jsonl.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def chain_time(launch, iters=30, repeats=5):
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


def main():
    import jax
    import jax.numpy as jnp
    out_path = "perf_results/dot_probe.jsonl"
    os.makedirs("perf_results", exist_ok=True)
    rng = np.random.default_rng(0)

    cases = [
        # (name, M, K, N, dtype)
        ("big_int8", 16384, 2048, 2048, "int8"),
        ("big_bf16", 16384, 2048, 2048, "bf16"),
        ("big_int4k", 16384, 4096, 2048, "int8"),
        # CNV layer shapes (batch-1024 row counts)
        ("conv2_int8", 802816, 576, 64, "int8"),
        ("conv2_bf16", 802816, 576, 64, "bf16"),
        ("conv2_n128", 802816, 576, 128, "int8"),
        ("conv1_int8", 921600, 27, 64, "int8"),
        ("conv4_int8", 102400, 1152, 128, "int8"),
    ]
    for name, m, k, n, dt in cases:
        if dt == "int8":
            a = jnp.asarray(rng.integers(-3, 4, size=(m, k)).astype(np.int8))
            w = jnp.asarray(rng.integers(-3, 4, size=(k, n)).astype(np.int8))
            pref = jnp.int32
        else:
            a = jnp.asarray(rng.integers(-3, 4, size=(m, k))
                            .astype(np.float32)).astype(jnp.bfloat16)
            w = jnp.asarray(rng.integers(-3, 4, size=(k, n))
                            .astype(np.float32)).astype(jnp.bfloat16)
            pref = jnp.float32

        @jax.jit
        def dot(a, w, pref=pref):
            return jnp.sum(jax.lax.dot_general(
                a, w, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=pref).astype(jnp.float32))

        try:
            t0 = time.time()
            med, spread = chain_time(lambda: dot(a, w))
            macs = m * k * n
            row = {"case": name, "m": m, "k": k, "n": n, "dtype": dt,
                   "ms": round(med * 1e3, 3),
                   "tera_macs_per_s": round(macs / med / 1e12, 1),
                   "spread": round(spread, 3),
                   "compile_s": round(time.time() - t0, 1)}
        except Exception as e:  # noqa: BLE001
            row = {"case": name, "error": repr(e)[:250]}
        line = json.dumps(row)
        print(line, flush=True)
        with open(out_path, "a") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
