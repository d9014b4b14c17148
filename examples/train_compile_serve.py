"""Example: full pipeline — train, compile to integer artifact, serve with
continuous batching (SURVEY.md C17 + the north-star serving path).

    python examples/train_compile_serve.py sfc-w1a1 --epochs 5
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from bnn_pynq_tpu.compiler import compile_network, save_artifact
from bnn_pynq_tpu.models import get_config
from bnn_pynq_tpu.runtime.engine import InferenceEngine
from bnn_pynq_tpu.runtime.serving import BatchingServer
from bnn_pynq_tpu.train.trainer import train


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("network", nargs="?", default="sfc-w1a1")
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--requests", type=int, default=64)
    args = ap.parse_args()

    cfg = get_config(args.network)
    print(f"training {cfg.name} ...")
    result = train(cfg, epochs=args.epochs, log_every=1)
    print(f"best val acc {result.best_val_acc:.4f}")

    compiled = compile_network(cfg, result.params, result.batch_stats,
                               meta={"val_acc": result.best_val_acc})
    path = f"artifacts/{cfg.name}.npz"
    save_artifact(path, compiled)
    print(f"artifact saved: {path}")

    engine = InferenceEngine(compiled)
    server = BatchingServer(engine, max_batch=64, max_wait_ms=2.0)
    rng = np.random.default_rng(0)
    shape = ((int(np.prod(cfg.input_shape)),) if cfg.input_kind == "bipolar"
             else cfg.input_shape)
    xs = engine.prepare(rng.integers(
        0, 256, size=(args.requests,) + cfg.input_shape).astype(np.uint8))
    futures = [server.submit(x) for x in xs]
    preds = [f.result(60) for f in futures]
    server.stop()
    print(f"served {len(preds)} requests; stats: {server.stats.summary()}")


if __name__ == "__main__":
    main()
