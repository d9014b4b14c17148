"""Headline benchmark: CNV-W1A1 CIFAR-10 inference throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference's published CNV-max throughput, 21_900 images/s
(FINN paper, ZC706 @200 MHz — BASELINE.md; the repo's own PYNQ-Z1 numbers
were never durably published, so the larger published number is used).

Timing method: chained launches with a single device→host fetch at the
end (block_until_ready is unreliable through the axon tunnel), steady
state after warmup.
"""

import json
import time

import numpy as np

BASELINE_IMAGES_PER_SEC = 21_900.0


def bench_cnv_w1a1(batch: int = 1024, iters: int = 20, route: str = "xla"):
    import jax
    from bnn_pynq_tpu.models import get_config
    from bnn_pynq_tpu.models.network import init_random_params
    from bnn_pynq_tpu.compiler.finnthesizer import CompiledNetwork
    from bnn_pynq_tpu.runtime.engine import InferenceEngine

    cfg = get_config("cnv-w1a1")
    layers = init_random_params(cfg, seed=0)
    ncls = cfg.num_classes
    compiled = CompiledNetwork(
        config=cfg,
        layers=[{k: np.asarray(v) for k, v in l.items()} for l in layers],
        out_scale=np.ones(ncls, np.float32),
        out_bias=np.zeros(ncls, np.float32))
    engine = InferenceEngine(compiled, runtime="auto", route=route,
                             batch_buckets=(batch,))

    rng = np.random.default_rng(0)
    x = engine.prepare(rng.integers(
        0, 256, size=(batch,) + cfg.input_shape).astype(np.uint8))
    xd = jax.device_put(x)

    # warmup (compile)
    np.asarray(engine._fn(engine.params, engine.out_scale, engine.out_bias, xd))

    t0 = time.perf_counter()
    outs = [engine._fn(engine.params, engine.out_scale, engine.out_bias, xd)
            for _ in range(iters)]
    np.asarray(outs[-1])
    dt = (time.perf_counter() - t0) / iters
    return batch / dt


if __name__ == "__main__":
    imgs_per_sec = bench_cnv_w1a1()
    print(json.dumps({
        "metric": "cnv-w1a1_cifar10_images_per_sec_1chip",
        "value": round(imgs_per_sec, 1),
        "unit": "images/s",
        "vs_baseline": round(imgs_per_sec / BASELINE_IMAGES_PER_SEC, 3),
    }))
