"""Generate pretrained artifacts for every registered network config.

Without real datasets in this container these are trained on the
deterministic synthetic sets (train/data.py) — functional demo artifacts,
NOT reference-accuracy reproductions (artifact meta records this).
Re-run with $BNN_DATA_DIR pointing at real data to produce the real ones.

    python tools/make_pretrained.py [--epochs 3] [--out pretrained]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--out", default="pretrained")
    ap.add_argument("--platform", default="cpu")
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from bnn_pynq_tpu.compiler import compile_network, save_artifact
    from bnn_pynq_tpu.models import AVAILABLE_CONFIGS, get_config
    from bnn_pynq_tpu.train import data as data_mod
    from bnn_pynq_tpu.train.trainer import train

    for name in sorted(AVAILABLE_CONFIGS):
        cfg = get_config(name)
        ds = data_mod.load(cfg.dataset, synthetic_sizes=(2048, 512))
        res = train(cfg, ds, epochs=args.epochs, batch_size=64,
                    lr_start=2e-3, lr_end=1e-4, seed=0)
        compiled = compile_network(
            cfg, res.params, res.batch_stats,
            meta={"val_acc": res.best_val_acc,
                  "synthetic_data": ds.synthetic, "epochs": args.epochs})
        path = os.path.join(args.out, f"{cfg.name}.npz")
        save_artifact(path, compiled)
        print(f"{cfg.name}: val_acc={res.best_val_acc:.3f} "
              f"synthetic={ds.synthetic} -> {path}", flush=True)


if __name__ == "__main__":
    main()
