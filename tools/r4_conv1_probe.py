"""Round-4 conv1/drain-floor probes (VERDICT r3 next #1): the two untried
formulations plus the element-vs-byte drain question.

    for c in acc_i32_k48 acc_i16_k48 acc_i8_k48 acc_i32_k192 acc_i16_k192 \
             acc_i32_k1024 acc_i16_k1024 conv1_native_bf16 conv1_dot_i32; do
        timeout 900 python tools/r4_conv1_probe.py --case $c
    done

Each case is a standalone process (the conv emitter has wedged this
backend's remote compiler before — r3 suite note — so it must not take
the other probes down with it). Appends perf_results/r4_conv1.jsonl.

Hypotheses under test (docs/dot_rate_model.md §1/§3):
- H1 (byte-bound drain): the ~91 G output-elements/s drain limit is
  really a BYTE limit at the MXU accumulator drain; int16 accumulation
  (exact for every CNV layer: max |acc| ≤ 3·3·2304 + image layer
  27·128 = 3456 < 32767) would halve every conv's floor.
  Test: same (M,K,N) dot with preferred_element_type int32/int16/int8.
- H2 (conv-emitter drain path): lax.conv_general_dilated's output path
  may not share the dot emitter's drain limit. Test: conv1's exact
  workload (1024×32×32×3 ⊛ 3×3×3→64, bf16-exact) vs its dot
  formulations (model_k27 im2col / k192 s2d rows in conv_probe.jsonl).
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


# drain probes: (M, K, N) at the shapes the floor model was fit to
DOT_SHAPES = {
    "k48": (262144, 48, 256),      # drain regime (model: 0.74 ms @ i32)
    "k192": (65536, 192, 1024),    # conv1's s2d dot shape (0.71 ms @ i32)
    "k1024": (200704, 1024, 256),  # conv2's s2d dot shape (1.05 ms @ i32)
}
ACCS = {"i32": "int32", "i16": "int16", "i8": "int8"}


def dot_case(m, k, n, acc_name, out_path, case):
    import jax
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    a8 = jnp.asarray(rng.choice([-1, 1], size=(m, k)).astype(np.int8))
    w8 = jnp.asarray(rng.choice([-1, 1], size=(k, n)).astype(np.int8))
    acc_dt = {"i32": jnp.int32, "i16": jnp.int16, "i8": jnp.int8}[acc_name]
    # thresholds in the accumulator dtype so the epilogue stays fused
    t = jnp.asarray(np.sort(rng.integers(-16, 16, size=(1, n)), 0)).astype(
        acc_dt)

    def f(a):
        acc = jax.lax.dot_general(
            a, w8, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=acc_dt)
        return jnp.sum((acc >= t).astype(jnp.int32))

    t0 = time.time()
    jf = jax.jit(f)
    med, spread = chain_time(lambda: jf(a8))
    return {"case": case, "m": m, "k": k, "n": n, "acc": acc_name,
            "ms": round(med * 1e3, 3),
            "mn_gelems_per_s": round(m * n / med / 1e9, 1),
            "spread": round(spread, 3),
            "compile_s": round(time.time() - t0, 1)}


def conv1_native(dtype, out_path, case, batch=1024):
    """conv1's exact workload through the native conv emitter."""
    import jax
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-128, 128, size=(batch, 32, 32, 3))
                    .astype(np.int8))
    w = jnp.asarray(rng.choice([-1, 1], size=(3, 3, 3, 64)).astype(np.int8))
    thr = jnp.asarray(np.sort(rng.integers(-64, 64, size=(1, 64)), 0)
                      .astype(np.int32))

    def f(x):
        if dtype == "bf16":
            acc = jax.lax.conv_general_dilated(
                x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                window_strides=(1, 1), padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32).astype(jnp.int32)
        else:  # im2col-free dot via patches for the control arm
            from bnn_pynq_tpu.ops.conv import sliding_window
            p = sliding_window(x, 3, 3, 1)
            b, oh, ow, kk = p.shape
            acc = jax.lax.dot_general(
                p.reshape(b * oh * ow, kk), w.reshape(27, 64),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32).reshape(b, oh, ow, 64)
        return jnp.sum((acc >= thr).astype(jnp.int32))

    t0 = time.time()
    jf = jax.jit(f)
    med, spread = chain_time(lambda: jf(x))
    return {"case": case, "batch": batch, "dtype": dtype,
            "ms": round(med * 1e3, 3),
            "out_gelems_per_s": round(batch * 900 * 64 / med / 1e9, 1),
            "spread": round(spread, 3),
            "compile_s": round(time.time() - t0, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", required=True)
    ap.add_argument("--out", default="perf_results/r4_conv1.jsonl")
    args = ap.parse_args()
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    c = args.case
    try:
        if c.startswith("acc_"):
            _, acc, shape = c.split("_")
            m, k, n = DOT_SHAPES[shape]
            row = dot_case(m, k, n, acc, args.out, c)
        elif c == "conv1_native_bf16":
            row = conv1_native("bf16", args.out, c)
        elif c == "conv1_dot_i32":
            row = conv1_native("dot", args.out, c)
        else:
            raise ValueError(f"unknown case {c}")
    except Exception as e:  # noqa: BLE001
        row = {"case": c, "error": repr(e)[:300]}
    line = json.dumps(row)
    print(line, flush=True)
    with open(args.out, "a") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
