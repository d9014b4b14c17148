"""Collective/compute-overlapped tensor parallelism (SURVEY.md §5.8's
first-class "collective-compute overlap" component; VERDICT r1 weak #4).

The plain TP engine (parallel/tp.py) all-gathers every layer's output
channels before the next layer — a blocking collective between every
pair of matmuls. This module never gathers: activations stay
output-shard-resident, and each next layer consumes them with a RING —
at step t the device multiplies the shard it currently holds against
the matching row block of its local (column-sharded) weight matrix,
while `lax.ppermute` forwards the shard to the neighbor. XLA emits
`collective-permute-start/done` around the dot, so the ICI transfer of
shard t+1 overlaps the MXU work on shard t — the standard Megatron-
style all-gather-overlap pattern, expressed with shard_map so the
schedule is explicit.

Layer shardings:
- hidden W_j [K_j, N_j]: column-sharded P(None, 'model'), FULL rows
  (each device owns every row of its output-channel slice);
- thresholds: P(None, 'model');
- final W_L [K_L, ncls]: row-sharded P('model', None) — each device
  contributes its held shard's partial product, one psum finishes it;
- batch over 'data'.

Works on decoded int8 level weights (decode-once-at-load, the measured-
fastest storage — see perf_results). MLP topologies (SFC/LFC — the nets
whose serving path TP actually helps; CNV TP uses parallel/tp.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from bnn_pynq_tpu.compiler.finnthesizer import CompiledNetwork
from bnn_pynq_tpu.models.config import DenseSpec
from bnn_pynq_tpu.models.network import decode_params, make_plan, \
    _input_codes


def _levels(codes, abits):
    return (2 * codes.astype(jnp.int32)
            - (1 if abits == 1 else 3)).astype(jnp.int8)


def make_overlap_tp_forward(config, mesh: Mesh, *, interpret=None):
    """jitted fn(weights, thrs, out_scale, out_bias, x) → float32 logits.
    weights/thrs are lists (sharded per the module docstring)."""
    if not all(isinstance(s, DenseSpec) for s in config.layers):
        raise ValueError("overlap TP engine supports all-dense MLPs; "
                         "use parallel/tp.py for conv networks")
    plan = make_plan(config)
    abits = config.abits
    d = mesh.shape["model"]
    n_layers = len(plan)

    def local_forward(weights, thrs, out_scale, out_bias, x):
        my = jax.lax.axis_index("model")
        codes = _input_codes(config, x.reshape(x.shape[0], -1))

        # layer 0: input replicated over 'model' → straight column-
        # parallel dot, no communication at all
        acc = jax.lax.dot_general(
            _levels(codes, abits), weights[0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        code = jnp.zeros(acc.shape, jnp.int32)
        for t in range(thrs[0].shape[0]):
            code = code + (acc >= thrs[0][t][None, :]).astype(jnp.int32)
        shard = _levels(code, abits)          # [B_local, N_1/d] levels

        # hidden layers: ring-accumulate over the d activation shards;
        # ppermute(shard t+1) overlaps the dot on shard t
        for li in range(1, n_layers - 1):
            w = weights[li]                    # [K, N/d] full rows
            kshard = w.shape[0] // d
            acc = None
            cur = shard
            for t in range(d):
                idx = (my - t) % d             # which shard cur holds
                rows = jax.lax.dynamic_slice_in_dim(
                    w, idx * kshard, kshard, axis=0)
                part = jax.lax.dot_general(
                    cur, rows,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                acc = part if acc is None else acc + part
                if t != d - 1:
                    cur = jax.lax.ppermute(
                        cur, "model",
                        perm=[(i, (i + 1) % d) for i in range(d)])
            code = jnp.zeros(acc.shape, jnp.int32)
            for t in range(thrs[li].shape[0]):
                code = code + (acc >= thrs[li][t][None, :]).astype(jnp.int32)
            shard = _levels(code, abits)

        # final layer: row-sharded weights — one partial dot + psum
        part = jax.lax.dot_general(
            shard, weights[-1],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        logits = jax.lax.psum(part, "model")
        return logits.astype(jnp.float32) * out_scale[None, :] \
            + out_bias[None, :]

    w_specs = [P(None, "model")] * (n_layers - 1) + [P("model", None)]
    t_specs = [P(None, "model")] * (n_layers - 1)
    fn = shard_map(
        local_forward, mesh=mesh,
        in_specs=(tuple(w_specs), tuple(t_specs), P(None), P(None),
                  P("data")),
        out_specs=P("data"),
        check_rep=False,
    )
    return jax.jit(fn)


class OverlapTPEngine:
    """Multi-chip MLP engine with overlapped collectives (same logits API
    as runtime.InferenceEngine for prepared inputs)."""

    def __init__(self, compiled: CompiledNetwork, mesh: Mesh):
        import numpy as np
        self.compiled = compiled
        self.config = compiled.config
        self.mesh = mesh
        plan = make_plan(self.config)
        raw = [{k: jnp.asarray(v) for k, v in layer.items()}
               for layer in compiled.layers]
        decoded = decode_params(self.config, raw)
        n = len(plan)
        self.weights = []
        self.thrs = []
        for i, p in enumerate(decoded):
            spec = P("model", None) if i == n - 1 else P(None, "model")
            self.weights.append(jax.device_put(
                p["w_int8"], NamedSharding(mesh, spec)))
            if i != n - 1:
                self.thrs.append(jax.device_put(
                    p["thr"], NamedSharding(mesh, P(None, "model"))))
        self.out_scale = jax.device_put(
            jnp.asarray(compiled.out_scale), NamedSharding(mesh, P()))
        self.out_bias = jax.device_put(
            jnp.asarray(compiled.out_bias), NamedSharding(mesh, P()))
        self._fn = make_overlap_tp_forward(self.config, mesh)
        self._data_sh = NamedSharding(mesh, P("data"))
        self._np = np

    def logits(self, x_prepared):
        x = jax.device_put(jnp.asarray(x_prepared), self._data_sh)
        return self._np.asarray(self._fn(tuple(self.weights),
                                         tuple(self.thrs),
                                         self.out_scale, self.out_bias, x))

    def classify(self, x_prepared):
        return self.logits(x_prepared).argmax(-1)
