"""Conv-strategy sweep for the CNV forward path (round-2 perf push).

Measures interchangeable conv formulations of the decoded-integer route
on the real TPU, with chained-launch timing (median of R repeats) and a
bit-exactness check against the int8 patches route:

  patches   im2col (sliding_window) + one int8 MXU dot   [round-1 'xla']
  native    bf16 lax.conv (implicit im2col in VMEM), int8 codes in HBM
  native16  bf16 lax.conv, bf16 level activations kept in HBM
  shift     sum of k*k shifted int8 dots (no patch materialization)
  shift16   sum of k*k shifted bf16 dots

Usage: python tools/conv_experiments.py [--batch 1024] [--net cnv-w1a1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bnn_pynq_tpu.models import get_config
from bnn_pynq_tpu.models.network import (decode_params, init_random_params,
                                         make_plan)
from bnn_pynq_tpu.ops import ref
from bnn_pynq_tpu.ops.conv import maxpool2d, sliding_window
from bnn_pynq_tpu.ops.thresholds import codes_to_values, multithreshold
from bnn_pynq_tpu.utils.metrics import (mxu_roofline_images_per_sec,
                                        network_macs)


def conv_patches(vals_i8, w_hwio, stride):
    kh, kw, c, n = w_hwio.shape
    patches = sliding_window(vals_i8, kh, kw, stride)
    b, oh, ow, k = patches.shape
    acc = ref.int_matmul_ref(patches.reshape(b * oh * ow, k),
                             w_hwio.reshape(k, n))
    return acc.reshape(b, oh, ow, n)


def conv_native_bf16(vals, w_hwio, stride):
    acc = jax.lax.conv_general_dilated(
        vals.astype(jnp.bfloat16), w_hwio.astype(jnp.bfloat16),
        window_strides=(stride, stride), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return acc.astype(jnp.int32)


def conv_shift(vals_i8, w_hwio, stride, dtype=jnp.int8):
    kh, kw, c, n = w_hwio.shape
    b, h, w, _ = vals_i8.shape
    oh = (h - kh) // stride + 1
    ow = (w - kw) // stride + 1
    acc = None
    x = vals_i8.astype(dtype)
    wt = w_hwio.astype(dtype)
    pref = jnp.int32 if dtype == jnp.int8 else jnp.float32
    for ki in range(kh):
        for kj in range(kw):
            sl = jax.lax.slice(
                x, (0, ki, kj, 0),
                (b, ki + (oh - 1) * stride + 1,
                 kj + (ow - 1) * stride + 1, c),
                (1, stride, stride, 1))
            d = jax.lax.dot_general(
                sl, wt[ki, kj], (((3,), (0,)), ((), ())),
                preferred_element_type=pref)
            acc = d if acc is None else acc + d
    return acc.astype(jnp.int32)


def build_forward(config, variant):
    """forward(decoded, x_int8_nhwc) -> int32 logits."""
    plan = make_plan(config)
    bf16_acts = variant == "native16"

    def fwd(decoded, x):
        act = jnp.asarray(x, dtype=jnp.int8)
        for lp, p in zip(plan, decoded):
            thr = None if lp.last else p.get("thr")
            if lp.kind == "pool":
                act = maxpool2d(act, lp.window) if act.dtype == jnp.int8 \
                    else jax.lax.reduce_window(
                        act, -jnp.inf if act.dtype != jnp.int8 else 0,
                        jax.lax.max,
                        (1, lp.window, lp.window, 1),
                        (1, lp.window, lp.window, 1), "VALID")
                continue
            if lp.kind == "conv_int8":
                vals = act
            elif lp.kind == "dense":
                if act.ndim > 2:
                    act = act.reshape(act.shape[0], -1)
                vals = act if act.dtype != jnp.int8 else \
                    codes_to_values(act, config.abits)
            else:
                vals = act if act.dtype != jnp.int8 else \
                    codes_to_values(act, config.abits)
            if lp.kind in ("conv", "conv_int8"):
                w_hwio = p["w_hwio"] if "w_hwio" in p else \
                    p["w_int8"].reshape(lp.kernel, lp.kernel,
                                        lp.k // lp.kernel ** 2, lp.n)
                if variant == "patches":
                    acc = conv_patches(vals.astype(jnp.int8), w_hwio,
                                       lp.stride)
                elif variant in ("native", "native16"):
                    acc = conv_native_bf16(vals, w_hwio, lp.stride)
                elif variant == "shift":
                    acc = conv_shift(vals.astype(jnp.int8), w_hwio,
                                     lp.stride, jnp.int8)
                elif variant == "shift16":
                    acc = conv_shift(vals, w_hwio, lp.stride, jnp.bfloat16)
                else:
                    raise ValueError(variant)
            else:
                if bf16_acts and act.dtype != jnp.int8:
                    acc = jax.lax.dot_general(
                        vals.astype(jnp.bfloat16),
                        p["w_int8"].astype(jnp.bfloat16),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32).astype(jnp.int32)
                else:
                    acc = ref.int_matmul_ref(vals.astype(jnp.int8),
                                             p["w_int8"])
            if thr is None:
                act = acc
            else:
                codes = multithreshold(acc, thr)
                if bf16_acts:
                    act = codes_to_values(codes, config.abits)\
                        .astype(jnp.bfloat16)
                else:
                    act = codes
        return act
    return fwd


def chain_time(fn, args, iters=30, repeats=5):
    outs = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(outs)[0])  # warm
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        o = [fn(*args) for _ in range(iters)]
        np.asarray(jax.tree_util.tree_leaves(o[-1])[0])
        ts.append((time.perf_counter() - t0) / iters)
    ts = sorted(ts)
    med = ts[len(ts) // 2]
    spread = (ts[-1] - ts[0]) / med
    return med, spread


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--net", default="cnv-w1a1")
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--variants", default="patches,native,native16,shift,shift16")
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    cfg = get_config(args.net)
    params = [
        {k: jnp.asarray(v) for k, v in l.items()}
        for l in init_random_params(cfg, seed=0)]
    decoded = decode_params(cfg, params)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(
        -128, 128, size=(args.batch,) + cfg.input_shape).astype(np.int8))
    x_small = x[:64]

    # exactness baseline on a small batch (patches = int8-exact golden)
    golden = np.asarray(jax.jit(build_forward(cfg, "patches"))(decoded,
                                                               x_small))
    macs = network_macs(cfg)
    sol = mxu_roofline_images_per_sec(cfg)

    for variant in args.variants.split(","):
        fwd = jax.jit(build_forward(cfg, variant))
        t0 = time.time()
        try:
            out_small = np.asarray(fwd(decoded, x_small))
        except Exception as e:  # noqa: BLE001 — report and continue sweep
            print(json.dumps({"variant": variant,
                              "error": repr(e)[:200]}), flush=True)
            continue
        compile_s = time.time() - t0
        exact = bool((out_small == golden).all())
        med, spread = chain_time(fwd, (decoded, x), iters=args.iters)
        ips = args.batch / med
        print(json.dumps({
            "variant": variant, "net": args.net, "batch": args.batch,
            "ms": round(med * 1e3, 3), "images_per_sec": round(ips, 1),
            "spread": round(spread, 3), "exact_vs_int8": exact,
            "roofline_frac": round(ips / sol, 4),
            "tops": round(2 * macs * ips / 1e12, 1),
            "compile_s": round(compile_s, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
