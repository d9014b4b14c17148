"""TPU performance suite — run after any kernel change (and the moment
the device tunnel is healthy) to compare all compute routes.

    python tools/tpu_perf_suite.py [--quick] [--verify] [--routes xla,s2d]

Emits JSON lines to stdout and appends to perf_results/perf.jsonl.

Round-3 methodology fixes (VERDICT r2 ask #2):
- Every row records `calib_ms` (a fixed 2048³ bf16 matmul timed at suite
  start) and `floor_ms` (chained empty-launch dispatch floor). Cross-
  session throughput comparisons divide out calib_ms — the observed ~2×
  session-to-session variance tracks the tunnel/host, not the kernels.
- Iteration counts are AUTO-SIZED from a probe measurement so that each
  timed window is ≥ ~1 s regardless of kernel speed; `--quick` shrinks
  the window to 0.4 s and 2 repeats but can no longer produce
  under-amortized junk (the r2 `--quick` failure mode).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _engine(name, route, batch):
    from bnn_pynq_tpu.compiler.finnthesizer import CompiledNetwork
    from bnn_pynq_tpu.models import get_config
    from bnn_pynq_tpu.models.network import init_random_params
    from bnn_pynq_tpu.runtime.engine import InferenceEngine

    cfg = get_config(name)
    layers = init_random_params(cfg, seed=0)
    compiled = CompiledNetwork(
        config=cfg,
        layers=[{k: np.asarray(v) for k, v in l.items()} for l in layers],
        out_scale=np.ones(cfg.num_classes, np.float32),
        out_bias=np.zeros(cfg.num_classes, np.float32))
    return InferenceEngine(compiled, runtime="auto", route=route,
                           batch_buckets=(batch,)), cfg, compiled


def _rand_input(cfg, batch, seed=0):
    rng = np.random.default_rng(seed)
    if cfg.input_kind == "bipolar":
        return rng.choice([-1, 1], size=(
            batch, int(np.prod(cfg.input_shape)))).astype(np.int8)
    return rng.integers(-128, 128,
                        size=(batch,) + cfg.input_shape).astype(np.int8)


def _timed_windows(launch, iters, repeats):
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        outs = [launch() for _ in range(iters)]
        np.asarray(outs[-1])
        ts.append((time.perf_counter() - t0) / iters)
    ts.sort()
    med = ts[len(ts) // 2]
    spread = (ts[-1] - ts[0]) / med if med > 0 else 0.0
    return med, spread


def measure(engine, cfg, batch, repeats=5, window_s=1.0, iters=None,
            classify=False):
    """Median seconds/launch + relative spread (max-min)/median, with
    iteration counts auto-sized so each timed window spans ≥ window_s —
    the ~30 ms tunnel fetch then amortizes below the noise floor no
    matter how fast the kernel is. classify=True times the device-argmax
    production path instead of the logits path (materializing [B, ncls]
    lane-padded logits costs 5× the whole forward at B=262k — engine
    _classify_fn docstring)."""
    import jax
    xd = jax.device_put(_rand_input(cfg, batch))
    fn = engine._classify_fn() if classify else engine._fn

    def launch():
        return fn(engine.params, engine.out_scale, engine.out_bias, xd)

    t0 = time.perf_counter()
    np.asarray(launch())
    compile_s = time.perf_counter() - t0
    # probe: 10 chained launches to size the real iteration count
    probe, _ = _timed_windows(launch, 10, 1)
    if iters is None:
        iters = int(max(10, min(1000, window_s / max(probe, 1e-6))))
    med, spread = _timed_windows(launch, iters, repeats)
    return med, compile_s, spread, iters


def calibrate():
    """Session calibration: (a) fixed 2048³ bf16 matmul ms — scales with
    the chip+session health, so cross-session rows can be normalized;
    (b) chained empty-launch floor ms — the per-dispatch cost through the
    axon tunnel, the lower bound for any batch-1 latency number."""
    import jax
    import jax.numpy as jnp
    a = jax.device_put(jnp.ones((2048, 2048), jnp.bfloat16))

    @jax.jit
    def mm(a):
        return jnp.sum((a @ a).astype(jnp.float32))

    @jax.jit
    def empty(x):
        return x + 1.0

    np.asarray(mm(a))
    calib_ms, _ = _timed_windows(lambda: mm(a), 100, 3)
    x = jax.device_put(jnp.zeros((8, 128), jnp.float32))
    np.asarray(empty(x))
    floor_ms, _ = _timed_windows(lambda: empty(x), 200, 3)
    return round(calib_ms * 1e3, 4), round(floor_ms * 1e3, 4)


def verify(compiled, route, batch=16):
    """Compare this route's TPU-compiled logits against the dense golden
    twin (`runtime='ref'`) on the same device — the HW/SW
    interchangeability contract (SURVEY.md §4.1 RUNTIME_HW≡RUNTIME_SW),
    enforced on real hardware, not only under CPU interpret.

    Returns (ok, max_abs_diff). Integer-exact routes must match the twin
    bit-for-bit in the integer accumulators; after the float scale/bias
    epilogue we allow 1e-3 absolute (mega applies scale/bias in-kernel,
    so float op order may differ) but require identical argmax."""
    from bnn_pynq_tpu.runtime.engine import InferenceEngine
    cfg = compiled.config
    x = _rand_input(cfg, batch, seed=7)
    eng = InferenceEngine(compiled, runtime="auto", route=route,
                          batch_buckets=(batch,))
    ref_eng = InferenceEngine(compiled, runtime="ref",
                              batch_buckets=(batch,))
    got = eng.logits(x, prepared=True)
    want = ref_eng.logits(x, prepared=True)
    diff = float(np.max(np.abs(got - want)))
    ok = bool(diff <= 1e-3 and
              (np.argmax(got, -1) == np.argmax(want, -1)).all())
    return ok, diff


# NOTE: 'xlaconv' (lax.conv_general_dilated, bf16 or int8) is NOT in the
# case list — it hangs this backend's remote TPU compiler indefinitely
# (r3 measurement attempt; matches the int8 note in models/network.py).
# MLP batches are large because the tunnel dispatch floor (0.25-0.6 ms
# by session, see `floor_ms`) dominates smaller launches; the 32k/65k
# rows are the compute-bound MLP numbers (LFC 31M, SFC 52M img/s at
# r3-final).
CASES = [
    # Retired/witness routes (mega, direct, mxu, vpu — see the route
    # status matrix in docs/ARCHITECTURE.md) are DROPPED from the default
    # case list (r5, VERDICT next #7): each keeps its bit-exactness test
    # in tests/, the retiring measurements are committed in perf.jsonl
    # (tags r3-final/r4-final), and they can still be run explicitly via
    # --routes mega,direct,mxu,vpu.
    ("cnv-w1a1", "s2d", 1024), ("cnv-w1a1", "s2d", 2048),
    ("cnv-w1a1", "xla", 1024), ("cnv-w1a1", "xla", 2048),
    ("cnv-w1a1", "xla", 4096),
    ("cnv-w2a2", "xla", 1024), ("cnv-w2a2", "s2d", 1024),
    ("cnv-w1a2", "s2d", 1024), ("cnv-w2a2-gtsrb", "s2d", 1024),
    ("lfc-w1a1", "xla", 4096), ("lfc-w1a1", "fused", 4096),
    ("lfc-w1a1", "xla", 32768), ("lfc-w1a1", "fused", 32768),
    ("sfc-w1a1", "fused", 8192), ("sfc-w1a1", "xla", 8192),
    ("sfc-w1a1", "fused", 65536), ("sfc-w1a1", "xla", 65536),
    # launch-floor amortization rows (r4: the MLP "floor" turned out to be
    # the dispatch floor, not compute — SFC costs 1.6 ns/img incremental;
    # these batches push past it: 168M img/s SFC, 40-48M LFC measured)
    ("sfc-w1a1", "xla", 262144), ("lfc-w1a1", "xla", 131072),
    ("lfc-w1a1", "xla", 262144),
    # 2-bit-activation MLP coverage (3-threshold epilogue path at scale)
    ("lfc-w1a2", "xla", 32768), ("sfc-w1a2", "xla", 65536),
    # batch-1 latency points
    ("cnv-w1a1", "xla", 1), ("cnv-w1a1", "s2d", 1),
    ("sfc-w1a1", "fused", 1), ("sfc-w1a1", "xla", 1),
    ("lfc-w1a1", "fused", 1), ("lfc-w1a1", "xla", 1),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="0.4 s windows, 2 repeats (still amortized)")
    ap.add_argument("--iters", type=int, default=0,
                    help="force a fixed iteration count (0 = auto-size)")
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--verify", action="store_true",
                    help="also check route logits vs the ref twin on-device")
    ap.add_argument("--routes", default="",
                    help="comma list filter, e.g. xla,mega")
    ap.add_argument("--nets", default="", help="comma list filter")
    ap.add_argument("--batches", default="",
                    help="comma list filter, e.g. 1 for the latency rows")
    ap.add_argument("--classify", action="store_true",
                    help="time the device-argmax classify path (the "
                    "serving op) instead of full logits materialization")
    ap.add_argument("--tag", default="", help="free-form run label")
    ap.add_argument("--out", default="perf_results/perf.jsonl")
    args = ap.parse_args()
    window_s = 0.4 if args.quick else 1.0
    repeats = 2 if args.quick else args.repeats

    from bnn_pynq_tpu.utils.metrics import (chip_specs,
                                            mxu_roofline_images_per_sec,
                                            vpu_bitop_roofline_images_per_sec)

    cases = list(CASES)
    if args.routes:
        keep = set(args.routes.split(","))
        cases = [c for c in cases if c[1] in keep]
    if args.nets:
        keep = set(args.nets.split(","))
        cases = [c for c in cases if c[0] in keep]
    if args.batches:
        keep = {int(b) for b in args.batches.split(",")}
        cases = [c for c in cases if c[2] in keep]

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    calib_ms, floor_ms = calibrate()
    print(json.dumps({"calib_ms": calib_ms, "floor_ms": floor_ms,
                      "tag": args.tag}), flush=True)
    for name, route, batch in cases:
        try:
            engine, cfg, compiled = _engine(name, route, batch)
            dt, compile_s, spread, iters = measure(
                engine, cfg, batch, repeats=repeats, window_s=window_s,
                iters=args.iters or None, classify=args.classify)
            sol = mxu_roofline_images_per_sec(cfg, chip_specs())
            row = {"network": name, "route": route, "batch": batch,
                   "ms": round(dt * 1e3, 3),
                   "images_per_sec": round(batch / dt, 1),
                   "usec_per_image": round(dt / batch * 1e6, 3),
                   "roofline_frac": round(batch / dt / sol, 4),
                   # the packed routes' own physics (docs/packed_kernels.md)
                   "vpu_bitop_frac": round(
                       batch / dt / vpu_bitop_roofline_images_per_sec(
                           cfg, chip_specs()), 4),
                   "spread": round(spread, 3), "iters": iters,
                   "compile_s": round(compile_s, 1),
                   "calib_ms": calib_ms, "floor_ms": floor_ms}
            if args.classify:
                row["path"] = "classify"   # device-argmax output [B]
            if args.tag:
                row["tag"] = args.tag
            # headline hygiene (VERDICT r4 weak #1, now enforced in the
            # tooling): a row tagged "headline"/"final" with spread >
            # 0.1 is NOT quotable on its own — it gets a machine-visible
            # suspect marker that any table generator / reader must
            # surface. Quote medians across >=3 session windows instead
            # (tools/mlp_median.py aggregates them).
            if args.tag and ("headline" in args.tag or "final" in args.tag) \
                    and spread > 0.1:
                row["suspect"] = True
                row["suspect_reason"] = (f"spread {round(spread, 3)} > 0.1 "
                                         "(docs/session_variance.md); "
                                         "single-window, not quotable")
                print(f"WARNING: {name}/{route}@{batch} spread "
                      f"{spread:.3f} > 0.1 — marked suspect; do not quote "
                      "this single window", flush=True)
            if args.verify:
                ok, diff = verify(compiled, route)
                row["verify_ok"] = ok
                row["verify_max_abs_diff"] = diff
        except Exception as e:
            row = {"network": name, "route": route, "batch": batch,
                   "error": str(e)[:300]}
        line = json.dumps(row)
        print(line, flush=True)
        with open(args.out, "a") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
