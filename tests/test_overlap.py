"""Overlapped-TP engine tests (SURVEY.md §5.8 collective/compute overlap).

Teeth on a single-host CI (2 CPU cores — wall-clock "efficiency" of 8
virtual devices is physics-free here):
1. exact logits equality vs the single-device reference engine;
2. HLO STRUCTURE: the compiled program must contain collective-permute
   (the ring) and must NOT contain all-gather between hidden layers —
   i.e. the overlap transformation is provably in the compiled artifact;
3. a wall-clock ≥80% weak-scaling assertion that activates only on ≥2
   real TPU devices (BASELINE.md 2-host target; runs in hardware CI).
"""

import numpy as np
import pytest
import jax

from bnn_pynq_tpu.compiler.finnthesizer import CompiledNetwork
from bnn_pynq_tpu.models import get_config
from bnn_pynq_tpu.models.network import init_random_params
from bnn_pynq_tpu.parallel.mesh import make_mesh
from bnn_pynq_tpu.parallel.overlap import OverlapTPEngine
from bnn_pynq_tpu.runtime.engine import InferenceEngine


def _compiled(name="lfc-w1a1"):
    cfg = get_config(name)
    layers = init_random_params(cfg, seed=0)
    return CompiledNetwork(
        config=cfg,
        layers=[{k: np.asarray(v) for k, v in l.items()} for l in layers],
        out_scale=np.ones(cfg.num_classes, np.float32),
        out_bias=np.zeros(cfg.num_classes, np.float32))


@pytest.mark.parametrize("data,model", [(1, 8), (2, 4), (4, 2)])
def test_overlap_tp_matches_single_device(data, model):
    compiled = _compiled()
    mesh = make_mesh(data=data, model=model)
    eng = OverlapTPEngine(compiled, mesh)
    ref = InferenceEngine(compiled, runtime="ref", route="xla",
                          batch_buckets=(64,))
    rng = np.random.default_rng(0)
    x = rng.choice([-1, 1], size=(64, 784)).astype(np.int8)
    got = eng.logits(x)
    want = ref.logits(x, prepared=True)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_overlap_tp_hlo_structure():
    """The compiled module must ring (collective-permute) instead of
    gathering between hidden layers, and psum only the tiny logits."""
    compiled = _compiled()
    mesh = make_mesh(data=1, model=8)
    eng = OverlapTPEngine(compiled, mesh)
    x = jax.device_put(
        np.ones((64, 784), np.int8),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data")))
    hlo = eng._fn.lower(tuple(eng.weights), tuple(eng.thrs), eng.out_scale,
                        eng.out_bias, x).compile().as_text()
    assert "collective-permute" in hlo, "ring ppermute missing"
    # the only all-* collective allowed is the final logits psum
    # (all-reduce); activation all-gathers would mark a blocking layer
    # boundary like the non-overlap engine's
    assert "all-gather" not in hlo, "blocking activation all-gather present"
    # on the TPU backend XLA additionally splits each permute into
    # start/done pairs (async transfer running concurrently with the dot
    # between them); the CPU test backend keeps them fused, so that
    # stronger assertion only applies on real hardware
    if jax.default_backend() in ("tpu", "axon"):
        assert "collective-permute-start" in hlo
        assert "collective-permute-done" in hlo


def test_overlap_tp_w1a2():
    compiled = _compiled("lfc-w1a2")
    mesh = make_mesh(data=2, model=4)
    eng = OverlapTPEngine(compiled, mesh)
    ref = InferenceEngine(compiled, runtime="ref", route="xla",
                          batch_buckets=(32,))
    rng = np.random.default_rng(1)
    x = rng.choice([-1, 1], size=(32, 784)).astype(np.int8)
    np.testing.assert_allclose(eng.logits(x),
                               ref.logits(x, prepared=True),
                               rtol=1e-5, atol=1e-5)


def _real_tpu_count():
    try:
        return sum(1 for d in jax.devices() if d.platform in ("tpu", "axon"))
    except RuntimeError:
        return 0


@pytest.mark.skipif(_real_tpu_count() < 2,
                    reason="needs >=2 real TPU devices")
def test_overlap_tp_scaling_efficiency_real_hw():
    """BASELINE.md: >=80% weak-scaling efficiency at 2 devices. Only
    meaningful on real chips with real ICI."""
    import time
    compiled = _compiled()
    per_dev = 4096
    times = {}
    for nd in (1, 2):
        mesh = make_mesh(data=1, model=nd, devices=jax.devices()[:nd])
        eng = OverlapTPEngine(compiled, mesh)
        rng = np.random.default_rng(0)
        x = rng.choice([-1, 1], size=(per_dev * nd, 784)).astype(np.int8)
        eng.logits(x)  # compile
        t0 = time.perf_counter()
        for _ in range(20):
            out = eng._fn(tuple(eng.weights), tuple(eng.thrs),
                          eng.out_scale, eng.out_bias, x)
        np.asarray(out)
        times[nd] = (time.perf_counter() - t0) / 20
    eff = times[1] / times[2]   # weak scaling: ideal = equal step time
    assert eff >= 0.8, f"2-device weak-scaling efficiency {eff:.2f} < 0.8"
