"""Inference engine — the host runtime (SURVEY.md C10/C12 rebuild).

Replaces the reference's C++ offload stack (`FoldedMVOffload`,
`binarizeAndPack`, `ExecAccel` «bnn/src/library/host/foldedmv-offload.cpp»)
and the `PynqBNN` loader «bnn/bnn.py»: loads compiled integer parameters
onto the device once, builds one jitted program per batch bucket, and
exposes classify APIs with per-image latency accounting (`usecPerImage`).

Runtimes (the HW/SW duality of SURVEY.md §4.1):
- 'tpu'        : Pallas kernels compiled for the TPU (default on TPU).
- 'interpret'  : same kernels in Pallas interpret mode (CPU debugging).
- 'ref'        : dense golden twin (bit-exact software emulator).
"""

from __future__ import annotations

import time
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from bnn_pynq_tpu.compiler.finnthesizer import CompiledNetwork
from bnn_pynq_tpu.models.config import NetworkConfig
from bnn_pynq_tpu.models.network import decode_params, forward, forward_xla
from bnn_pynq_tpu.ops.matmul import on_tpu

DEFAULT_BATCH_BUCKETS = (1, 16, 64, 256, 1024)
# conv-net forward chunk size inside one jitted program (see _fn):
# measured fastest dot shapes sit at M ≈ 200k patch rows ≈ 1024 images
MICROBATCH = 1024


def prepare_host(config: NetworkConfig, x: np.ndarray) -> np.ndarray:
    """uint8 images → engine input (binarize or center to int8); the host
    half of the reference's `binarizeAndPack` (SURVEY.md C10). Shared by
    InferenceEngine and the TP engines."""
    x = np.asarray(x)
    if config.input_kind == "bipolar":
        flat = x.reshape(x.shape[0], -1)
        if x.dtype == np.uint8:
            return np.where(flat >= 128, 1, -1).astype(np.int8)
        return np.where(flat >= 0, 1, -1).astype(np.int8)
    if x.dtype == np.uint8:
        return (x.astype(np.int32) - 128).astype(np.int8)
    return x.astype(np.int8)


class InferenceEngine:
    """Loads a CompiledNetwork and serves classifications."""

    def __init__(self, compiled: CompiledNetwork, runtime: str = "auto",
                 route: str = "s2d",
                 batch_buckets: Sequence[int] = DEFAULT_BATCH_BUCKETS):
        """route: 's2d' (decoded-integer MXU path with space-to-depth
        convs — fastest measured, docs/dot_rate_model.md), 'xla'
        (im2col convs), 'mxu'/'vpu' (packed Pallas kernels)."""
        self.compiled = compiled
        self.config: NetworkConfig = compiled.config
        if runtime == "auto":
            runtime = "tpu" if on_tpu() else "interpret"
        if runtime not in ("tpu", "interpret", "ref"):
            raise ValueError(f"unknown runtime {runtime}")
        self.runtime = runtime
        self.route = route
        self.batch_buckets = tuple(sorted(batch_buckets))
        self.usecPerImage: Optional[float] = None

        # Device-resident parameters (the analogue of the reference's
        # doInit weight-memory load, SURVEY.md §3.2 — here a plain upload).
        self.params = [
            {k: jnp.asarray(v) for k, v in layer.items()}
            for layer in compiled.layers
        ]
        self.out_scale = jnp.asarray(compiled.out_scale)
        self.out_bias = jnp.asarray(compiled.out_bias)

        use_xla_route = route in ("xla", "xlaconv", "s2d", "direct", "mega") and \
            runtime != "ref"
        use_direct = route == "direct" and runtime != "ref"
        use_mega = route == "mega" and runtime != "ref"
        use_fused = route == "fused" and runtime != "ref"
        if use_fused:
            from bnn_pynq_tpu.models.config import DenseSpec
            if not all(isinstance(s, DenseSpec) for s in self.config.layers):
                raise ValueError("route='fused' (whole-network VMEM kernel) "
                                 "currently supports all-dense MLPs")
        if use_xla_route or use_fused:
            self.params = decode_params(self.config, self.params)

        impl = "ref" if runtime == "ref" else "pallas"
        interpret = None if runtime == "tpu" else (runtime == "interpret")
        abits = self.config.abits

        if use_fused:
            from bnn_pynq_tpu.ops.fused_mlp import fused_mlp_forward_padded

            # weights/thresholds come from the `params` ARGUMENT (not a
            # closure) so load_parameters hot-swaps the fused route like
            # every other route — same shapes, same trace, no recompile
            # (the r4 "rebuild the engine" restriction was a parity gap
            # with the reference's live-overlay contract, SURVEY §3.2)
            @partial(jax.jit, static_argnums=())
            def _fn(params, out_scale, out_bias, x):
                weights = [p["w_int8"] for p in params]
                thrs = [p["thr"] for p in params[:-1]]
                pos = x.reshape(x.shape[0], -1) > 0
                if abits == 1:
                    codes = pos.astype(jnp.int8)
                else:
                    codes = jnp.where(pos, jnp.int8(2), jnp.int8(1))
                return fused_mlp_forward_padded(
                    codes, weights, thrs, out_scale, out_bias,
                    abits=abits, interpret=interpret)
        else:
            from bnn_pynq_tpu.models.config import ConvSpec
            has_convs = any(isinstance(sp, ConvSpec)
                            for sp in self.config.layers)

            @partial(jax.jit, static_argnums=())
            def _fn(params, out_scale, out_bias, x):
                if use_mega:
                    from bnn_pynq_tpu.models.network import forward_mega
                    return forward_mega(self.config, params, x, out_scale,
                                        out_bias, interpret=interpret)

                def fwd(xc):
                    if use_direct:
                        from bnn_pynq_tpu.models.network import forward_direct
                        return forward_direct(self.config, params, xc,
                                              interpret=interpret)
                    if use_xla_route:
                        return forward_xla(
                            self.config, params, xc,
                            conv_mode={"xlaconv": "native", "s2d": "s2d"}
                            .get(route, "patches"))
                    return forward(self.config, params, xc, impl=impl,
                                   route=route, interpret=interpret)

                # Conv nets degrade super-linearly past M ≈ 200k patch
                # rows (measured: batch 2048 ran at 355k img/s straight
                # vs 468k microbatched, batch 4096 at 501k — r3,
                # perf_results/). lax.map over 1024-image chunks keeps
                # every dot at its measured-fastest shape. MLPs are the
                # opposite (big batches amortize), so they never chunk.
                b = x.shape[0]
                if has_convs and use_xla_route and b > MICROBATCH and \
                        b % MICROBATCH == 0:
                    acc = jax.lax.map(
                        fwd, x.reshape((b // MICROBATCH, MICROBATCH)
                                       + x.shape[1:]))
                    acc = acc.reshape((b,) + acc.shape[2:])
                else:
                    acc = fwd(x)
                return acc.astype(jnp.float32) * out_scale[None, :] \
                    + out_bias[None, :]

        self._fn = _fn
        self._fn_words = None      # built lazily by logits_words()
        self._fn_words_cls = None  # built lazily by words_device(argmax)
        self._fn_cls = None        # built lazily by classify()/logits_device

    def load_parameters(self, compiled: CompiledNetwork):
        """Hot-swap parameters without rebuilding the jitted program — the
        analogue of the reference's `load_parameters`/doInit weight-memory
        writes (SURVEY.md §3.2). The new CompiledNetwork must share the
        engine's topology (same config layers/shapes)."""
        if compiled.config.layers != self.config.layers or \
                compiled.config.wbits != self.config.wbits or \
                compiled.config.abits != self.config.abits:
            raise ValueError("parameter topology mismatch; build a new "
                             "engine for a different network")
        new_params = [{k: jnp.asarray(v) for k, v in layer.items()}
                      for layer in compiled.layers]
        if self.route in ("xla", "xlaconv", "s2d", "direct", "mega", "fused") and \
                self.runtime != "ref":
            new_params = decode_params(self.config, new_params)
        self.params = new_params
        self.out_scale = jnp.asarray(compiled.out_scale)
        self.out_bias = jnp.asarray(compiled.out_bias)
        self.compiled = compiled
        return self

    # -- input preparation ------------------------------------------------
    def prepare(self, x: np.ndarray) -> np.ndarray:
        """uint8 images → engine input (binarize or center to int8); the
        `binarizeAndPack` half that happens on the host."""
        return prepare_host(self.config, x)

    def _pad_to_bucket(self, x: np.ndarray):
        """Pad a leading-batch array up to the next bucket size; returns
        (padded, true_batch). One definition for every entry path."""
        b = x.shape[0]
        bucket = self._bucket(b)
        if bucket != b:
            pad = np.zeros((bucket - b,) + x.shape[1:], dtype=x.dtype)
            x = np.concatenate([x, pad], axis=0)
        return x, b

    def _bucket(self, b: int) -> int:
        for s in self.batch_buckets:
            if b <= s:
                return s
        return -(-b // self.batch_buckets[-1]) * self.batch_buckets[-1]

    # -- inference --------------------------------------------------------
    def logits(self, x: np.ndarray, *, prepared: bool = False) -> np.ndarray:
        """Float logits [B, num_classes]; pads the batch to a bucket size
        to bound recompilation."""
        if not prepared:
            x = self.prepare(x)
        x, b = self._pad_to_bucket(x)
        t0 = time.perf_counter()
        out = np.asarray(self._fn(self.params, self.out_scale,
                                  self.out_bias, x))
        dt = time.perf_counter() - t0
        self.usecPerImage = dt * 1e6 / b
        return out[:b]

    def logits_packed(self, x_uint8: np.ndarray) -> np.ndarray:
        """Host-packed input path for W1A1 bipolar nets (the reference's
        binarizeAndPack contract, SURVEY.md C10): images are binarized and
        bit-packed on the host by the native library, and the device
        consumes uint32 words directly — 32× less host→device traffic.
        Requires a packed route ('mxu'/'vpu'), not 'xla'."""
        from bnn_pynq_tpu import native
        if self.config.input_kind != "bipolar" or self.config.bits != 1:
            raise ValueError("packed input is for W1A1 bipolar networks")
        if self.route not in ("mxu", "vpu"):
            raise ValueError(
                "packed input requires a packed Pallas route ('mxu'/'vpu'); "
                f"route={self.route!r} consumes int8 codes — use "
                "logits_words() for the on-device-unpack path")
        words = native.binarize_pack(
            x_uint8.reshape(x_uint8.shape[0], -1))
        words, b = self._pad_to_bucket(words)
        t0 = time.perf_counter()
        out = np.asarray(self._fn(self.params, self.out_scale,
                                  self.out_bias, jnp.asarray(words)))
        self.usecPerImage = (time.perf_counter() - t0) * 1e6 / b
        return out[:b]

    def logits_words(self, x_uint8: np.ndarray) -> np.ndarray:
        """Packed input transport for the PRODUCTION routes (s2d/xla/…):
        the host bit-packs sign bits into uint32 words (32× less
        host→device traffic than int8 codes — the reference's
        `binarizeAndPack` contract, SURVEY.md C10 «foldedmv-offload»),
        and the device unpacks to ±1 values in one cheap VPU op fused
        into the first layer. Bit-exact with prepare()+logits() for any
        bipolar-input network (the pack stores exactly the sign bit that
        `_input_codes` thresholds on)."""
        from bnn_pynq_tpu import native
        if self.config.input_kind != "bipolar":
            raise ValueError("packed word input is for bipolar-input "
                             "networks (MLPs); conv nets take int8 images")
        words = native.binarize_pack(
            x_uint8.reshape(x_uint8.shape[0], -1))
        words, b = self._pad_to_bucket(words)
        t0 = time.perf_counter()
        out = np.asarray(self._words_fn()(self.params, self.out_scale,
                                          self.out_bias,
                                          jnp.asarray(words)))
        self.usecPerImage = (time.perf_counter() - t0) * 1e6 / b
        return out[:b]

    def _words_fn(self):
        if self._fn_words is None:
            from bnn_pynq_tpu.ops import packing
            n_in = int(np.prod(self.config.input_shape))
            base_fn = self._fn

            @jax.jit
            def _fw(params, out_scale, out_bias, w):
                vals = packing.unpack_bits(w, n_in, axis=-1)
                return base_fn(params, out_scale, out_bias, vals)
            self._fn_words = _fw
        return self._fn_words

    def _words_classify_fn(self):
        if self._fn_words_cls is None:
            base = self._words_fn()

            @jax.jit
            def _fwc(params, out_scale, out_bias, w):
                return jnp.argmax(base(params, out_scale, out_bias, w),
                                  axis=-1).astype(jnp.int32)
            self._fn_words_cls = _fwc
        return self._fn_words_cls

    def words_device(self, words: np.ndarray, *, argmax: bool = False):
        """Async launch from host-packed uint32 words (see logits_words)
        WITHOUT the device→host fetch — the packed-transport twin of
        logits_device, used by the serving dispatcher for bipolar nets:
        32× less host→device traffic per batch on the transfer-bound
        serving path (perf_results/serving.jsonl)."""
        if self.config.input_kind != "bipolar":
            raise ValueError("packed word input is for bipolar-input "
                             "networks")
        words, b = self._pad_to_bucket(np.asarray(words))
        fn = self._words_classify_fn() if argmax else self._words_fn()
        return fn(self.params, self.out_scale, self.out_bias,
                  jnp.asarray(words)), b

    # -- upload/launch split (r5 serving upload pipeline) -----------------
    # The serving upload wall: each served batch pays a host→device input
    # transfer through a ~30-40 MB/s single-stream-serialized tunnel
    # (perf_results/upload_probe.jsonl: k=1/2/4 concurrent streams all
    # ~40 MB/s — no aggregation). device_put is an ASYNC call (~2 ms for
    # 6.3 MB), so a dedicated uploader thread keeping 2 transfers ahead
    # hides the launch+fetch round trips behind back-to-back transfers —
    # measured 1.50× serving-cycle throughput (threaded 165 ms/batch vs
    # serial 248, spread 0.039). These two methods are the split the
    # BatchingServer's uploader stage needs: pad host-side, upload, then
    # launch on the device-resident array.

    def upload(self, x_padded: np.ndarray):
        """Async host→device transfer of an already-padded batch."""
        return jax.device_put(x_padded)

    def launch_prepared(self, xd, *, argmax: bool = False,
                        words: bool = False):
        """Launch on a device-resident (already padded, already uploaded)
        batch; returns the device output without fetching."""
        if words:
            fn = self._words_classify_fn() if argmax else self._words_fn()
        else:
            fn = self._classify_fn() if argmax else self._fn
        return fn(self.params, self.out_scale, self.out_bias, xd)

    def _classify_fn(self):
        """jitted device-side argmax variant of _fn. Materializing the
        [B, ncls] float logits is the dominant cost at large batches on
        this backend (the ncls=10 lane dim pads to 128: measured 16.7 ms
        vs 3.3 ms with in-jit argmax at B=262k — 5×, same family as the
        epilogue layout pathologies in docs/dot_rate_model.md §2b), so
        the classify/serving path reduces on-device and fetches [B]
        int32 instead."""
        if self._fn_cls is None:
            base = self._fn

            @jax.jit
            def _fc(params, out_scale, out_bias, x):
                return jnp.argmax(base(params, out_scale, out_bias, x),
                                  axis=-1).astype(jnp.int32)
            self._fn_cls = _fc
        return self._fn_cls

    def logits_device(self, x: np.ndarray, *, prepared: bool = False,
                      argmax: bool = False):
        """Async launch: pads to a bucket and returns (device_out, b)
        WITHOUT the device→host fetch. The serving dispatcher uses this
        to pipeline: launch batch t+1 while batch t's ~25 ms tunnel
        fetch is still in flight (the fetch, not compute, bounds serving
        throughput through the axon tunnel — measured in
        perf_results/serving.jsonl). argmax=True returns device class
        indices instead of logits (see _classify_fn)."""
        if not prepared:
            x = self.prepare(x)
        x, b = self._pad_to_bucket(x)
        fn = self._classify_fn() if argmax else self._fn
        return fn(self.params, self.out_scale, self.out_bias, x), b

    def classify(self, x: np.ndarray, *, prepared: bool = False) -> np.ndarray:
        """Class indices [B] (the reference's inference_multiple) —
        argmax runs ON DEVICE (see _classify_fn)."""
        if not prepared:
            x = self.prepare(x)
        x, b = self._pad_to_bucket(x)
        fn = self._classify_fn()
        t0 = time.perf_counter()
        out = np.asarray(fn(self.params, self.out_scale, self.out_bias, x))
        self.usecPerImage = (time.perf_counter() - t0) * 1e6 / b
        return out[:b]

    def classify_one(self, image: np.ndarray) -> int:
        """Single image (the reference's `inference`)."""
        return int(self.classify(image[None])[0])

    def warmup(self, batch: int = 1, *, serving: bool = True):
        """Compile the engine's programs for `batch`'s bucket before live
        traffic. serving=True (default) also warms the programs the
        serving hot path actually dispatches — the device-argmax classify
        program and, for bipolar nets, the packed-words program — so a
        warmed server never pays a first-request jit compile (costly
        through the remote compile service)."""
        shape = ((batch, np.prod(self.config.input_shape))
                 if self.config.input_kind == "bipolar"
                 else (batch,) + self.config.input_shape)
        dummy = np.zeros(shape, dtype=np.int8)
        self.logits(dummy, prepared=True)
        if serving:
            out, _ = self.logits_device(dummy, prepared=True, argmax=True)
            outs = [out]
            if self.config.input_kind == "bipolar":
                words = np.zeros(
                    (batch, -(-int(np.prod(self.config.input_shape)) // 32)),
                    dtype=np.uint32)
                for am in (True, False):
                    out, _ = self.words_device(words, argmax=am)
                    outs.append(out)
            jax.block_until_ready(outs)
        return self

    # -- constructors -----------------------------------------------------
    @classmethod
    def from_artifact(cls, path: str, **kw) -> "InferenceEngine":
        from bnn_pynq_tpu.compiler.artifacts import load_artifact
        return cls(load_artifact(path), **kw)

    @classmethod
    def from_training(cls, config, params, batch_stats, **kw):
        from bnn_pynq_tpu.compiler.finnthesizer import compile_network
        return cls(compile_network(config, params, batch_stats), **kw)
