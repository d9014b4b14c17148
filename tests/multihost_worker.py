"""Worker process for tests/test_multihost.py — NOT a pytest module.

Runs one of N JAX processes (jax.distributed.initialize over a localhost
coordinator — the DCN-coordination analogue SURVEY.md §5.8 claims for
multi-host serving), builds a GLOBAL 2-host mesh (data=processes,
model=local devices), runs the overlap-TP forward on it, and checks this
process's addressable output shards bit-match the single-process golden
reference. Prints MULTIHOST_OK on success.

Usage: python multihost_worker.py <process_id> <num_processes> <port>
"""

import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4"
                           ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nproc, process_id=pid)

import numpy as np  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bnn_pynq_tpu.compiler.finnthesizer import CompiledNetwork  # noqa: E402
from bnn_pynq_tpu.models import get_config  # noqa: E402
from bnn_pynq_tpu.models.network import (decode_params,  # noqa: E402
                                         init_random_params)
from bnn_pynq_tpu.parallel.overlap import make_overlap_tp_forward  # noqa: E402
from bnn_pynq_tpu.runtime.engine import InferenceEngine  # noqa: E402

assert jax.process_count() == nproc, jax.process_count()
assert jax.local_device_count() == 4
assert jax.device_count() == 4 * nproc

cfg = get_config("lfc-w1a1")
layers = init_random_params(cfg, seed=0)
compiled = CompiledNetwork(
    config=cfg,
    layers=[{k: np.asarray(v) for k, v in l.items()} for l in layers],
    out_scale=np.ones(cfg.num_classes, np.float32),
    out_bias=np.zeros(cfg.num_classes, np.float32))

mesh = Mesh(np.array(jax.devices()).reshape(nproc, 4), ("data", "model"))
fwd = make_overlap_tp_forward(cfg, mesh)

# every process holds the same host copies; make_array_from_callback
# fills each process's addressable shards from them
decoded = decode_params(cfg, [
    {k: jax.numpy.asarray(v) for k, v in l.items()} for l in compiled.layers])


def put(x, spec):
    x = np.asarray(x)
    sh = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])


weights, thrs = [], []
n_layers = len(decoded)
for i, p in enumerate(decoded):
    last = i == n_layers - 1
    weights.append(put(p["w_int8"],
                       P("model", None) if last else P(None, "model")))
    if not last:
        thrs.append(put(p["thr"], P(None, "model")))
out_scale = put(compiled.out_scale, P())
out_bias = put(compiled.out_bias, P())

rng = np.random.default_rng(0)
batch = 8 * nproc
x = rng.choice([-1, 1], size=(batch, 784)).astype(np.int8)
xd = put(x, P("data"))

out = fwd(tuple(weights), tuple(thrs), out_scale, out_bias, xd)
jax.block_until_ready(out)

# golden single-process reference, computed independently in every process
want = InferenceEngine(compiled, runtime="ref", route="xla",
                       batch_buckets=(batch,)).logits(x, prepared=True)
checked = 0
for shard in out.addressable_shards:
    np.testing.assert_allclose(np.asarray(shard.data),
                               want[shard.index], rtol=1e-5, atol=1e-5)
    checked += 1
assert checked > 0
print(f"MULTIHOST_OK pid={pid} shards={checked} "
      f"devices={jax.device_count()}", flush=True)
