"""Training stack smoke tests (SURVEY.md C13): STE learns, checkpoints
round-trip, and trained params compile into an engine whose accuracy
matches the float model.

Runs on synthetic data (no datasets ship in this container —
train/data.py docstring); real-dataset accuracy gates are opt-in via
BNN_DATA_DIR.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bnn_pynq_tpu.models.config import DenseSpec, NetworkConfig
from bnn_pynq_tpu.runtime.engine import InferenceEngine
from bnn_pynq_tpu.train import data as data_mod
from bnn_pynq_tpu.train.quant import binarize, quantize2
from bnn_pynq_tpu.train import trainer as trainer_mod
from bnn_pynq_tpu.train.trainer import (evaluate, load_checkpoint,
                                        save_checkpoint, train)
from bnn_pynq_tpu.train.model import QuantNet


def tiny_mlp(wbits=1, abits=1):
    return NetworkConfig(
        name=f"tiny-w{wbits}a{abits}", wbits=wbits, abits=abits,
        input_kind="bipolar", input_shape=(8, 8, 1),
        layers=(DenseSpec(64), DenseSpec(64), DenseSpec(4)),
        num_classes=4, dataset="mnist")


def tiny_dataset(n_train=512, n_test=256, ncls=4):
    rng = np.random.default_rng(0)
    protos = rng.choice([0, 255], size=(ncls, 8, 8, 1), p=[0.5, 0.5])

    def make(n, seed):
        r = np.random.default_rng(seed)
        y = r.integers(0, ncls, size=n).astype(np.int32)
        flips = r.random((n, 8, 8, 1)) < 0.05
        x = np.where(flips, 255 - protos[y], protos[y]).astype(np.uint8)
        return x, y

    xtr, ytr = make(n_train, 1)
    xte, yte = make(n_test, 2)
    return data_mod.Dataset("mnist", xtr, ytr, xte, yte, synthetic=True)


def test_ste_gradients():
    g = jax.grad(lambda x: jnp.sum(binarize(x)))(jnp.array([0.5, -2.0, 0.9]))
    np.testing.assert_array_equal(np.asarray(g), [1.0, 0.0, 1.0])
    g2 = jax.grad(lambda x: jnp.sum(quantize2(x)))(jnp.array([0.1, 1.5]))
    np.testing.assert_array_equal(np.asarray(g2), [1.0, 0.0])


def test_quantize2_levels():
    x = jnp.array([-1.0, -0.7, -0.5, -0.1, 0.0, 0.4, 0.7, 1.0])
    q = np.asarray(quantize2(x))
    expected = [-1, -1, -1 / 3, -1 / 3, 1 / 3, 1 / 3, 1.0, 1.0]
    np.testing.assert_allclose(q, expected, atol=1e-6)


@pytest.mark.parametrize("wbits,abits", [(1, 1), (2, 2)])
def test_training_learns_and_compiles(wbits, abits):
    cfg = tiny_mlp(wbits, abits)
    ds = tiny_dataset()
    result = train(cfg, ds, epochs=6, batch_size=64, lr_start=5e-3,
                   lr_end=1e-4, seed=0)
    assert result.best_val_acc > 0.8, result.history
    # loss went down
    assert result.history[-1]["loss"] < result.history[0]["loss"]

    # compile → integer engine reproduces float-model accuracy exactly
    model = QuantNet(cfg)
    float_acc = evaluate(cfg, model, result.params, result.batch_stats,
                         data_mod.to_bipolar(ds.x_test), ds.y_test)
    engine = InferenceEngine.from_training(
        cfg, result.params, result.batch_stats, runtime="ref")
    int_acc = (engine.classify(ds.x_test) == ds.y_test).mean()
    assert abs(float_acc - int_acc) <= 1e-9


def test_checkpoint_roundtrip(tmp_path):
    cfg = tiny_mlp()
    ds = tiny_dataset(128, 64)
    res = train(cfg, ds, epochs=1, batch_size=64, seed=0)
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, res.params, res.batch_stats, meta={"epoch": 0})
    params, stats, meta = load_checkpoint(path)
    a = InferenceEngine.from_training(cfg, res.params, res.batch_stats,
                                      runtime="ref").logits(ds.x_test[:8])
    b = InferenceEngine.from_training(cfg, params, stats,
                                      runtime="ref").logits(ds.x_test[:8])
    np.testing.assert_array_equal(a, b)


def test_stochastic_binarization():
    import jax
    import jax.numpy as jnp
    from bnn_pynq_tpu.train.quant import binarize_stochastic
    x = jnp.zeros((10000,))  # p(+1) = 0.5
    out = binarize_stochastic(x, jax.random.PRNGKey(0))
    frac = float(jnp.mean(out > 0))
    assert 0.45 < frac < 0.55
    assert set(np.unique(np.asarray(out))) <= {-1.0, 1.0}
    # extremes are deterministic
    hi = binarize_stochastic(jnp.full((100,), 2.0), jax.random.PRNGKey(1))
    assert float(jnp.min(hi)) == 1.0
    # STE gradient passes inside the clip region
    g = jax.grad(lambda v: jnp.sum(binarize_stochastic(v, jax.random.PRNGKey(2))))(
        jnp.array([0.5, 3.0]))
    np.testing.assert_array_equal(np.asarray(g), [1.0, 0.0])


def test_stochastic_model_trains():
    cfg = tiny_mlp(1, 1)
    ds = tiny_dataset(128, 64)
    model = QuantNet(cfg, stochastic=True)
    x = data_mod.to_bipolar(ds.x_train[:8])
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "quant": jax.random.PRNGKey(1)},
        x, train=True)
    out, _ = model.apply(variables, x, train=True,
                         rngs={"quant": jax.random.PRNGKey(2)},
                         mutable=["batch_stats"])
    assert np.isfinite(np.asarray(out)).all()


def test_weight_clip_applied():
    cfg = tiny_mlp()
    ds = tiny_dataset(128, 64)
    res = train(cfg, ds, epochs=2, batch_size=64, lr_start=0.1, seed=0)
    from flax import traverse_util
    from flax.core import unfreeze
    flat = traverse_util.flatten_dict(unfreeze(res.params))
    for k, v in flat.items():
        if trainer_mod._is_quant_kernel(k):
            assert np.abs(np.asarray(v)).max() <= 1.0 + 1e-6
