"""Chain-kernel cost localization (round 3: VERDICT asks #1/#3).

Stage profiling showed conv_chain_vmem ~3-4x over its MXU-bound
estimate. This tool times controlled variants of the conv2-class
workload (CNV's dominant layer: 1024x30x30x64 grid, K=576, N=64) so the
overhead decomposes into dot / epilogue / patch-build / misalignment:

  dense   dense_block on PREBUILT patches (pure dot+threshold kernel)
  chain1  conv_chain_vmem, 1 layer, in-kernel patch build (exact)
  al32    same but shifts rounded to 32 multiples (WRONG MATH, timing:
          zero sublane rotation in the 9 copies)
  zero    same with no shift at all (copy floor)
  chain2  the production chain0-1 (conv1+conv2, prebuilt 27-lane input)
  nblock  dense variant with N=128 to see lane-width sensitivity
  bigtile chain1 with target_rows 8192 (block-size sensitivity)

Appends JSON rows to perf_results/chain_micro.jsonl.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def chain_time(launch, iters=50, repeats=5):
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--variants",
                    default="dense,chain1,slab1,al32,zero,slab_al32,chain2,slab2,nblock,bigtile")
    ap.add_argument("--out", default="perf_results/chain_micro.jsonl")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from bnn_pynq_tpu.ops.conv import sliding_window
    from bnn_pynq_tpu.ops.conv_stack import conv_chain_vmem, dense_block

    b = args.batch
    rng = np.random.default_rng(0)
    # conv2-class workload: 30x30x64 code grid
    act = jnp.asarray(rng.integers(0, 2, size=(b, 30, 30, 64),
                                   dtype=np.int64).astype(np.int8))
    w2 = jnp.asarray(rng.choice([-1, 1], size=(576, 64)).astype(np.int8))
    w2_128 = jnp.asarray(rng.choice([-1, 1], size=(576, 128)).astype(np.int8))
    t2 = jnp.asarray(np.sort(rng.integers(-64, 64, size=(1, 64)), 0)
                     .astype(np.int32))
    t2_128 = jnp.asarray(np.sort(rng.integers(-64, 64, size=(1, 128)), 0)
                         .astype(np.int32))
    # conv1 weights for the production chain (27-lane prebuilt patches)
    img = jnp.asarray(rng.integers(-128, 128, size=(b, 32, 32, 3))
                      .astype(np.int8))
    w1 = jnp.asarray(rng.choice([-1, 1], size=(27, 64)).astype(np.int8))
    t1 = jnp.asarray(np.sort(rng.integers(-512, 512, size=(1, 64)), 0)
                     .astype(np.int32))
    patches27 = jax.jit(lambda x: sliding_window(x, 3, 3, 1))(img)
    # prebuilt conv2 patches for the pure-dot variant
    patches576 = jax.jit(lambda a: sliding_window(a, 3, 3, 1))(act)
    rows576 = jax.device_put(np.asarray(patches576).reshape(-1, 576))

    flops_1layer = 2 * b * 30 * 30 * 576 * 64     # full-grid chain macs x2

    def cks(fn):
        # scalar checksum output: a multi-MB fetch through the tunnel
        # would dominate the timing window otherwise
        return jax.jit(lambda a: jnp.sum(fn(a).astype(jnp.int32)))

    # jit each variant ONCE (a fresh lambda per launch would re-trace)
    jfns = {
        "dense": (cks(lambda r: dense_block(
            r, [w2], [t2], abits=1)), rows576),
        "chain1": (cks(lambda a: conv_chain_vmem(
            a, [w2], [t2], kernel=3, abits=1,
            build_mode="patch9")), act),
        "slab1": (cks(lambda a: conv_chain_vmem(
            a, [w2], [t2], kernel=3, abits=1, build_mode="slab")), act),
        "al32": (cks(lambda a: conv_chain_vmem(
            a, [w2], [t2], kernel=3, abits=1, build_mode="patch9",
            offset_mode="aligned32")), act),
        "zero": (cks(lambda a: conv_chain_vmem(
            a, [w2], [t2], kernel=3, abits=1, build_mode="patch9",
            offset_mode="zero")), act),
        "slab_al32": (cks(lambda a: conv_chain_vmem(
            a, [w2], [t2], kernel=3, abits=1, build_mode="slab",
            offset_mode="aligned32")), act),
        "chain2": (cks(lambda p: conv_chain_vmem(
            p, [w1, w2], [t1, t2], kernel=3, abits=1, build_mode="patch9",
            input_patches=True, input_levels=True)), patches27),
        "slab2": (cks(lambda p: conv_chain_vmem(
            p, [w1, w2], [t1, t2], kernel=3, abits=1, build_mode="slab",
            input_patches=True, input_levels=True)), patches27),
        "nblock": (cks(lambda r: dense_block(
            r, [w2_128], [t2_128], abits=1)), rows576),
        "bigtile": (cks(lambda a: conv_chain_vmem(
            a, [w2], [t2], kernel=3, abits=1, build_mode="slab",
            target_rows=8192)), act),
    }

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    for name in args.variants.split(","):
        fn, arg = jfns[name]
        try:
            t0 = time.time()
            launch = lambda fn=fn, arg=arg: fn(arg)  # noqa: E731
            med, spread = chain_time(launch, iters=args.iters)
            flops = flops_1layer * (2 if name == "nblock" else 1)
            row = {"variant": name, "batch": b, "ms": round(med * 1e3, 3),
                   "spread": round(spread, 3),
                   "tops": round(flops / med / 1e12, 1),
                   "compile_s": round(time.time() - t0, 1)}
        except Exception as e:  # noqa: BLE001
            row = {"variant": name, "error": repr(e)[:250]}
        line = json.dumps(row)
        print(line, flush=True)
        with open(args.out, "a") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
