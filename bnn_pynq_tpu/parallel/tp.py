"""Tensor-parallel packed inference over a ('data','model') mesh.

TPU-native replacement for the reference's PE parallelism (SURVEY.md §2:
output-channel PE folding → output-channel sharding of the packed weight
matrices over the ICI mesh axis). Megatron-style column parallelism:

- every packed weight matrix [Kw, N] and threshold table [nthr, N] is
  sharded on N over 'model' (replicated over 'data');
- each device computes its local output channels with the SAME fused
  Pallas MVTU kernels as single-chip, then the (tiny, already 1/2-bit
  coded) activations are all-gathered over 'model' so the next layer sees
  its full contraction axis;
- the batch is sharded over 'data' (pure data parallelism — the TPU
  analogue of the reference's `numReps` batch streaming);
- the final (classes-wide) layer is replicated: its N is 10/43 and the
  all-gathered input is already present on every device.

Built with shard_map so the Pallas kernels see explicit local shapes
(GSPMD cannot partition a pallas_call on its own).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from bnn_pynq_tpu.compiler.finnthesizer import CompiledNetwork
from bnn_pynq_tpu.models.config import NetworkConfig
from bnn_pynq_tpu.models.network import make_plan, _input_codes, \
    _pack_along_last
from bnn_pynq_tpu.ops import ref
from bnn_pynq_tpu.ops.conv import conv2d_packed, maxpool2d, sliding_window
from bnn_pynq_tpu.ops.matmul import packed_matmul_padded
from bnn_pynq_tpu.ops.thresholds import multithreshold


def param_specs(config: NetworkConfig):
    """PartitionSpec pytree matching the engine's params list."""
    plan = make_plan(config)
    specs = []
    for lp in plan:
        if lp.kind == "pool":
            specs.append({})
        elif lp.last:
            # classes-wide final layer: replicated
            key = "w_int8" if lp.kind == "conv_int8" else "w_packed"
            specs.append({key: P(None, None)})
        else:
            key = "w_int8" if lp.kind == "conv_int8" else "w_packed"
            specs.append({key: P(None, "model"), "thr": P(None, "model")})
    return specs


def shard_params(params, mesh: Mesh, config: NetworkConfig):
    """device_put the engine param list with TP shardings."""
    specs = param_specs(config)
    return [
        {k: jax.device_put(v, NamedSharding(mesh, specs[i][k]))
         for k, v in layer.items()}
        for i, layer in enumerate(params)
    ]


def make_tp_forward(config: NetworkConfig, mesh: Mesh, *, route: str = "mxu",
                    interpret=None):
    """Returns a jitted fn(params, out_scale, out_bias, x) → float logits,
    sharded batch over 'data' and weights over 'model'."""
    plan = make_plan(config)
    bits = config.bits

    def local_forward(params, out_scale, out_bias, x):
        if config.input_kind == "bipolar":
            act = _input_codes(config, x.reshape(x.shape[0], -1))
        else:
            act = jnp.asarray(x, dtype=jnp.int8)
        for lp, p in zip(plan, params):
            thr = None if lp.last else p.get("thr")
            if lp.kind == "pool":
                act = maxpool2d(act, lp.window)
                continue
            if lp.kind == "conv_int8":
                patches = sliding_window(act, lp.kernel, lp.kernel, lp.stride)
                b, oh, ow, k = patches.shape
                acc = ref.int_matmul_ref(
                    patches.reshape(b * oh * ow, k), p["w_int8"])
                acc = acc.reshape(b, oh, ow, -1)
                act = acc if lp.last else multithreshold(acc, thr)
            elif lp.kind == "conv":
                act = conv2d_packed(act, p["w_packed"], thr,
                                    kernel=lp.kernel, stride=lp.stride,
                                    bits=bits, route=route,
                                    interpret=interpret)
            else:
                if act.ndim > 2:
                    act = act.reshape(act.shape[0], -1)
                a_packed = _pack_along_last(act, bits)
                act = packed_matmul_padded(a_packed, p["w_packed"], thr,
                                           k=lp.k, bits=bits, route=route,
                                           interpret=interpret)
            if not lp.last:
                # gather this layer's output channels from the model axis
                act = jax.lax.all_gather(act, "model", axis=act.ndim - 1,
                                         tiled=True)
        logits = act.astype(jnp.float32) * out_scale[None, :] \
            + out_bias[None, :]
        return logits

    p_specs = param_specs(config)
    fn = shard_map(
        local_forward, mesh=mesh,
        in_specs=(p_specs, P(None), P(None), P("data")),
        out_specs=P("data"),
        check_rep=False,
    )
    return jax.jit(fn)


def make_gspmd_engine(compiled: CompiledNetwork, mesh: Mesh):
    """GSPMD tensor+data-parallel inference for the decoded-integer
    route: forward_xla is pure XLA ops, so instead of shard_map we just
    annotate shardings (decoded weights/thresholds on output channels
    over 'model' when divisible, batch over 'data') and let XLA insert
    the ICI collectives. Complements TPInferenceEngine (which exists
    because GSPMD cannot partition pallas_call kernels)."""
    from bnn_pynq_tpu.models.network import (decode_params, forward_xla,
                                             make_plan)
    config = compiled.config
    model_size = mesh.shape["model"]
    plan = make_plan(config)
    raw = [{k: jnp.asarray(v) for k, v in layer.items()}
           for layer in compiled.layers]
    decoded = decode_params(config, raw)

    sharded = []
    for lp, p in zip(plan, decoded):
        q = {}
        for name, arr in p.items():
            if lp.last or arr.shape[-1] % model_size != 0:
                spec = P()
            else:
                spec = P(*([None] * (arr.ndim - 1) + ["model"]))
            q[name] = jax.device_put(arr, NamedSharding(mesh, spec))
        sharded.append(q)
    out_scale = jax.device_put(jnp.asarray(compiled.out_scale),
                               NamedSharding(mesh, P()))
    out_bias = jax.device_put(jnp.asarray(compiled.out_bias),
                              NamedSharding(mesh, P()))

    @jax.jit
    def fn(params, scale, bias, x):
        acc = forward_xla(config, params, x)
        return acc.astype(jnp.float32) * scale[None, :] + bias[None, :]

    data_sh = NamedSharding(mesh, P("data"))

    def logits(x_prepared):
        x = jax.device_put(jnp.asarray(x_prepared), data_sh)
        return np.asarray(fn(sharded, out_scale, out_bias, x))

    return logits


class TPInferenceEngine:
    """Multi-chip tensor-parallel engine (same API surface as
    runtime.InferenceEngine.logits/classify for prepared inputs; serving
    hooks — bucketed async launch with device argmax and parameter
    hot-swap — so BatchingServer can pipeline over it, r5)."""

    def __init__(self, compiled: CompiledNetwork, mesh: Mesh,
                 route: str = "mxu", interpret=None,
                 batch_buckets=(1, 16, 64, 256, 1024)):
        self.compiled = compiled
        self.config = compiled.config
        self.mesh = mesh
        self._data_d = mesh.shape.get("data", 1)
        self.batch_buckets = tuple(sorted(batch_buckets))
        raw = [{k: jnp.asarray(v) for k, v in layer.items()}
               for layer in compiled.layers]
        self.params = shard_params(raw, mesh, compiled.config)
        self.out_scale = jnp.asarray(compiled.out_scale)
        self.out_bias = jnp.asarray(compiled.out_bias)
        self._fn = make_tp_forward(compiled.config, mesh, route=route,
                                   interpret=interpret)
        self._fn_cls = None
        self._data_sh = NamedSharding(mesh, P("data"))

    def load_parameters(self, compiled: CompiledNetwork):
        """Hot-swap sharded parameters on the live engine (the
        doInit-while-live contract, SURVEY.md §3.2); topology must match."""
        if compiled.config.layers != self.config.layers or \
                compiled.config.wbits != self.config.wbits or \
                compiled.config.abits != self.config.abits:
            raise ValueError("parameter topology mismatch; build a new "
                             "engine for a different network")
        raw = [{k: jnp.asarray(v) for k, v in layer.items()}
               for layer in compiled.layers]
        self.params = shard_params(raw, self.mesh, self.config)
        self.out_scale = jnp.asarray(compiled.out_scale)
        self.out_bias = jnp.asarray(compiled.out_bias)
        self.compiled = compiled
        return self

    def prepare(self, x):
        from bnn_pynq_tpu.runtime.engine import prepare_host
        return prepare_host(self.config, x)

    def _bucket(self, b: int) -> int:
        dd = self._data_d
        for s in self.batch_buckets:
            s = -(-s // dd) * dd
            if b <= s:
                return s
        top = -(-self.batch_buckets[-1] // dd) * dd
        return -(-b // top) * top

    def _classify_fn(self):
        if self._fn_cls is None:
            base = self._fn

            @jax.jit
            def _fc(params, s, b, x):
                return jnp.argmax(base(params, s, b, x),
                                  axis=-1).astype(jnp.int32)
            self._fn_cls = _fc
        return self._fn_cls

    def upload(self, x_padded):
        """Async sharded host→device transfer (serving uploader hook)."""
        return jax.device_put(jnp.asarray(x_padded), self._data_sh)

    def launch_prepared(self, xd, *, argmax: bool = False,
                        words: bool = False):
        """Launch on a device-resident sharded batch without fetching."""
        if words:
            raise ValueError("TPInferenceEngine has no packed-words path")
        fn = self._classify_fn() if argmax else self._fn
        return fn(self.params, self.out_scale, self.out_bias, xd)

    def logits_device(self, x, *, prepared: bool = True,
                      argmax: bool = False):
        """Async sharded launch without the device→host fetch (pipelined
        dispatch hook for BatchingServer): returns (device_out, b)."""
        if not prepared:
            x = self.prepare(x)
        x, b = self._pad_to_bucket(np.asarray(x))
        xd = jax.device_put(jnp.asarray(x), self._data_sh)
        fn = self._classify_fn() if argmax else self._fn
        return fn(self.params, self.out_scale, self.out_bias, xd), b

    def _pad_to_bucket(self, x: np.ndarray):
        b = x.shape[0]
        bucket = self._bucket(b)
        if bucket != b:
            x = np.concatenate(
                [x, np.zeros((bucket - b,) + x.shape[1:], x.dtype)])
        return x, b

    def logits(self, x_prepared, *, prepared: bool = True):
        x = x_prepared if prepared else self.prepare(x_prepared)
        return np.asarray(self._fn(self.params, self.out_scale,
                                   self.out_bias, x))

    def classify(self, x_prepared, *, prepared: bool = True):
        return self.logits(x_prepared, prepared=prepared).argmax(-1)
