"""Inference graph builder: config + packed params → jittable forward.

The TPU-native analogue of the reference's per-network dataflow pipeline
(SURVEY.md C9 `DoCompute`/`BlackBoxJam` «bnn/src/network/<net>/hw/top.cpp»):
one jitted XLA program per network, chaining packed MVTU matmul/conv
kernels with fused thresholds; where the FPGA streams layer-to-layer over
FIFOs, XLA fuses the inter-layer packing/repacking ops into the kernels.

Two interchangeable implementations behind one graph (the HW/SW runtime
duality of SURVEY.md §4.1):
- impl='pallas': packed Pallas kernels (MXU or VPU route).
- impl='ref':    dense golden reference ops — the bit-exact software twin.

First-layer handling mirrors the reference: CNV's first conv consumes
8-bit images (not binary), so it runs as an exact int8 XLA dot with
decoded weights; MLPs consume bipolar (±1) inputs which are packed
directly (SURVEY.md C10 `binarizeAndPack`).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from bnn_pynq_tpu.models.config import (ConvSpec, DenseSpec, NetworkConfig,
                                        PoolSpec)
from bnn_pynq_tpu.ops import packing, ref
from bnn_pynq_tpu.ops.conv import conv2d_packed, maxpool2d, sliding_window
from bnn_pynq_tpu.ops.matmul import packed_matmul_padded
from bnn_pynq_tpu.ops.thresholds import codes_to_values, multithreshold


@dataclass(frozen=True)
class LayerPlan:
    kind: str                     # 'dense' | 'conv' | 'conv_int8' | 'pool'
    k: int = 0                    # contraction length (dense/conv)
    n: int = 0                    # output features/channels
    kernel: int = 0
    stride: int = 1
    window: int = 0
    last: bool = False            # last compute layer → int32 logits


def make_plan(config: NetworkConfig) -> Tuple[LayerPlan, ...]:
    """Derive the static per-layer execution plan from a config."""
    h, w, c = config.input_shape
    plans = []
    specs = config.layers
    last_compute = max(i for i, s in enumerate(specs)
                      if not isinstance(s, PoolSpec))
    flat = False
    for i, spec in enumerate(specs):
        if isinstance(spec, ConvSpec):
            kind = "conv_int8" if (i == 0 and config.input_kind == "int8") \
                else "conv"
            k = spec.kernel * spec.kernel * c
            plans.append(LayerPlan(kind=kind, k=k, n=spec.out_ch,
                                   kernel=spec.kernel, stride=spec.stride,
                                   last=(i == last_compute)))
            h = (h - spec.kernel) // spec.stride + 1
            w = (w - spec.kernel) // spec.stride + 1
            c = spec.out_ch
        elif isinstance(spec, PoolSpec):
            plans.append(LayerPlan(kind="pool", window=spec.window))
            h //= spec.window
            w //= spec.window
        elif isinstance(spec, DenseSpec):
            if not flat:
                k = h * w * c
                flat = True
            else:
                k = c
            plans.append(LayerPlan(kind="dense", k=k, n=spec.out_features,
                                   last=(i == last_compute)))
            c = spec.out_features
            h = w = 1
        else:
            raise TypeError(f"unknown layer spec {spec!r}")
    return tuple(plans)


def _pack_along_last(codes, bits: int):
    if bits == 1:
        return packing.pack_bits(codes, axis=-1)   # bit = code > 0
    return packing.pack_codes2(codes, axis=-1)


def _input_codes(config: NetworkConfig, x):
    """Bipolar input → activation codes in the network's packing scheme."""
    pos = jnp.asarray(x) > 0
    if config.bits == 1:
        return pos.astype(jnp.int8)                        # codes {0,1}
    return jnp.where(pos, jnp.int8(2), jnp.int8(1))        # levels ±1


def init_random_params(config: NetworkConfig, seed: int = 0):
    """Random packed parameters with plausible thresholds — used by tests
    and kernel benchmarks before trained artifacts exist."""
    rng = np.random.default_rng(seed)
    plan = make_plan(config)
    bits = config.bits
    nthr = config.nthr
    params = []
    for lp in plan:
        if lp.kind == "pool":
            params.append({})
            continue
        if lp.kind == "conv_int8":
            wmat = rng.choice([-1, 1], size=(lp.k, lp.n)).astype(np.int8)
            if config.wbits == 2:
                wmat = rng.choice([-3, -1, 1, 3], size=(lp.k, lp.n)).astype(np.int8)
            entry = {"w_int8": jnp.asarray(wmat)}
            scale = lp.k * 128
        else:
            if bits == 1:
                wvals = rng.choice([-1, 1], size=(lp.k, lp.n)).astype(np.int8)
                packed = packing.np_pack_bits(wvals, axis=0)
            else:
                if config.wbits == 1:
                    wcodes = rng.choice([1, 2], size=(lp.k, lp.n)).astype(np.int8)
                else:
                    wcodes = rng.integers(0, 4, size=(lp.k, lp.n)).astype(np.int8)
                packed = packing.np_pack_codes2(wcodes, axis=0)
            entry = {"w_packed": jnp.asarray(packed)}
            scale = lp.k * (1 if bits == 1 else 9)
        if not lp.last:
            thr = np.sort(
                rng.integers(-scale // 4, scale // 4, size=(nthr, lp.n)),
                axis=0).astype(np.int32)
            entry["thr"] = jnp.asarray(thr)
        params.append(entry)
    return params


def forward(config: NetworkConfig, params, x, *, impl: str = "pallas",
            route: str = "mxu", interpret=None):
    """Run the network. Returns int32 logits [B, num_classes].

    x: bipolar nets — any array broadcastable to [B, 784] (values ±1 or
       floats, binarized at >0), OR host-packed uint32 words
       [B, packed_len] for impl='pallas' bits=1 (the reference's
       binarizeAndPack input contract, produced by native.binarize_pack);
       int8 nets — int8 [B, H, W, C].
    """
    plan = make_plan(config)
    bits = config.bits

    packed_input = False
    if config.input_kind == "bipolar":
        x = jnp.asarray(x)
        if x.dtype == jnp.uint32:
            if impl != "pallas" or bits != 1:
                raise ValueError("packed input requires impl='pallas' and "
                                 "a W1A1 network")
            act = x.reshape(x.shape[0], -1)
            packed_input = True
        else:
            act = _input_codes(config, x.reshape(x.shape[0], -1))
    else:
        act = jnp.asarray(x, dtype=jnp.int8)

    for lp, p in zip(plan, params):
        thr = None if lp.last else p.get("thr")
        if lp.kind == "pool":
            act = maxpool2d(act, lp.window)
        elif lp.kind == "conv_int8":
            patches = sliding_window(act, lp.kernel, lp.kernel, lp.stride)
            b, oh, ow, k = patches.shape
            acc = ref.int_matmul_ref(patches.reshape(b * oh * ow, k),
                                     p["w_int8"])
            acc = acc.reshape(b, oh, ow, lp.n)
            act = acc if lp.last else multithreshold(acc, thr)
        elif lp.kind == "conv":
            if impl == "pallas":
                act = conv2d_packed(act, p["w_packed"], thr, kernel=lp.kernel,
                                    stride=lp.stride, bits=bits, route=route,
                                    interpret=interpret)
            else:
                w_lev = _unpack_weights(p["w_packed"], lp.k, bits)
                patches = sliding_window(codes_to_values(act, config.abits),
                                         lp.kernel, lp.kernel, lp.stride)
                b, oh, ow, k = patches.shape
                acc = ref.int_matmul_ref(patches.reshape(b * oh * ow, k),
                                         w_lev)
                acc = acc.reshape(b, oh, ow, lp.n)
                act = acc if lp.last else multithreshold(acc, thr)
        elif lp.kind == "dense":
            if act.ndim > 2:
                act = act.reshape(act.shape[0], -1)
            if impl == "pallas":
                if packed_input:
                    a_packed, packed_input = act, False
                else:
                    a_packed = _pack_along_last(act, bits)
                act = packed_matmul_padded(a_packed, p["w_packed"], thr,
                                           k=lp.k, bits=bits, route=route,
                                           interpret=interpret)
            else:
                w_lev = _unpack_weights(p["w_packed"], lp.k, bits)
                a_lev = codes_to_values(act, config.abits)
                acc = ref.int_matmul_ref(a_lev, w_lev)
                act = acc if lp.last else multithreshold(acc, thr)
        else:
            raise ValueError(lp.kind)
    return act


def _unpack_weights(w_packed, k: int, bits: int):
    if bits == 1:
        return packing.unpack_bits(w_packed, k, axis=0)
    return packing.codes2_to_levels(packing.unpack_codes2(w_packed, k, axis=0))


def decode_params(config: NetworkConfig, params):
    """Pre-decode packed weights to integer int8 levels once (device-
    resident), for the 'xla' route: weights stay integers, no float dequant
    ever; this trades 8× weight bytes (still ≤2 MB for CNV) for letting
    XLA's int8 MXU convs/matmuls run without in-kernel decode."""
    plan = make_plan(config)
    out = []
    for lp, p in zip(plan, params):
        if lp.kind == "pool" or "w_int8" in p:
            out.append(dict(p))
            continue
        q = dict(p)
        w_lev = _unpack_weights(p["w_packed"], lp.k, config.bits)
        if lp.kind == "conv":
            c = lp.k // (lp.kernel * lp.kernel)
            q["w_hwio"] = jnp.asarray(w_lev).reshape(
                lp.kernel, lp.kernel, c, lp.n)
        else:
            q["w_int8"] = jnp.asarray(w_lev)
        del q["w_packed"]
        out.append(q)
    return out


def _conv_bf16_exact(vals_int8, w_hwio_int8, stride: int):
    """Exact integer conv via the native XLA/MXU bf16 conv path.

    All operands are small integers (|activations| ≤ 128 first layer /
    ≤ 3 afterwards, |weights| ≤ 3), each exactly representable in
    bfloat16; products ≤ 384 and partial sums ≤ 3·3·2304·... < 2^24 stay
    exact in the MXU's float32 accumulator, so rounding the result to
    int32 is bit-exact with the integer reference. This avoids im2col's
    K² patch materialization in HBM entirely — the conv halo exchange
    happens inside XLA's conv emitter."""
    acc = jax.lax.conv_general_dilated(
        vals_int8.astype(jnp.bfloat16),
        jnp.asarray(w_hwio_int8).astype(jnp.bfloat16),
        window_strides=(stride, stride),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return acc.astype(jnp.int32)


# s2d route tuning knobs (A/B'd on hardware by tools/s2d_tune.py;
# defaults = best measured config). Module-level so profiling tools can
# flip them without threading arguments through the engine.
S2D_TUNING = {
    # Retired knobs (r5 pruning — VERDICT r4 next #7): "int4_min_m"
    # (int4 MXU cast: +21% standalone, -17% in context; ops-level
    # exactness witness kept in test_conv_s2d_int4_cast_exact) and
    # "reblock" (s=4→2 single transpose: -5% vs dephase+to_blocked;
    # op + exactness test kept in ops/conv_s2d.reblock). Both were
    # permanently off; the unreachable branches are deleted. Full route
    # status matrix: docs/ARCHITECTURE.md §"Route status".
    "chain": True,           # feed phase output straight into the next
                             # same-s s2d conv (measured best: 2.403 ms
                             # vs 2.447 dephase-between, batch 1024)
    "form": "concat",        # phase-dot form: 'concat' (2×2 patch concat
                             # + one dot) or 'shifted' (4 sliced GEMMs
                             # summed, no patch materialization —
                             # ops/conv_s2d._phase_dot_shifted). A/B'd
                             # on hardware; see perf_results/r4_conv1
                             # tag r4-form-ab.
    "acc_i16_max_k": 512,    # drain the MXU accumulator as int16 when the
                             # phase contraction ≤ this AND Σ|a·w| < 32767
                             # (exact — the abs-sum bounds every partial
                             # sum). r4 probes (perf_results/r4_conv1):
                             # standalone +9-28% at drain-bound shapes,
                             # −16% at MAC-bound K=1024 (hence the K
                             # gate); interleaved e2e A/B was NEUTRAL
                             # (2.20 vs 2.23 ms mean, spreads ≤0.02) —
                             # kept on as theoretically-clean + free.
}


def forward_xla(config: NetworkConfig, decoded, x, *,
                conv_mode: str = "patches", force_thresholds: bool = False):
    """Decoded-integer route: XLA int8 convs/matmuls (MXU) with integer
    MultiThreshold epilogues fused by XLA. Bit-exact with the packed
    Pallas route (same integer math, different storage).

    conv_mode: 'patches' — conv as sliding-window + int8 MXU dot. NOTE:
    int8 lax.conv_general_dilated hangs the TPU compiler on this backend
    (v5e/axon, jax 0.9), while patches+dot_general compiles fast.
    'native' — conv via the bf16 MXU conv path (`_conv_bf16_exact`),
    still integer-exact but without materializing K²-duplicated patches.
    's2d' — space-to-depth reformulation per layer where it pays
    (ops/conv_s2d.py): (2s)²C × s²N dot shapes, pool-as-phase-max, and
    the activation stays in phase layout across consecutive s2d layers
    (zero relayout transposes on CNV); bit-exact with 'patches'.
    """
    from bnn_pynq_tpu.ops.conv_s2d import (BlockedAct, conv_s2d_blocked,
                                           dephase, phase_maxpool,
                                           pick_s2d_block)

    plan = make_plan(config)
    if config.input_kind == "bipolar":
        x = jnp.asarray(x)
        act = _input_codes(config, x.reshape(x.shape[0], -1))
    else:
        act = jnp.asarray(x, dtype=jnp.int8)

    skip_pool = False
    for li, (lp, p) in enumerate(zip(plan, decoded)):
        # force_thresholds: profiling aid (tools/prefix_prof.py) — apply
        # the threshold on a truncated network's last layer too, so a
        # prefix ends in cheap int8 codes (not a 4x-wide int32 dephase)
        # and differencing attributes costs like the full program.
        thr = p.get("thr") if force_thresholds else             (None if lp.last else p.get("thr"))
        # choose the s2d block size for eligible convs up front, so a
        # blocked activation can chain without ever de-phasing
        s2d = 0
        if lp.kind in ("conv", "conv_int8") and conv_mode == "s2d" and \
                lp.stride == 1:
            c = lp.k // (lp.kernel * lp.kernel)
            h_in = act.oh if isinstance(act, BlockedAct) else act.shape[1]
            w_in = act.ow if isinstance(act, BlockedAct) else act.shape[2]
            oh, ow = h_in - lp.kernel + 1, w_in - lp.kernel + 1
            s2d = pick_s2d_block(c, lp.n, oh, ow, lp.kernel, lp.stride)
        if isinstance(act, BlockedAct) and not (
                s2d and act.s == s2d and S2D_TUNING["chain"]):
            act = dephase(act)
        if lp.kind == "pool":
            if skip_pool:
                skip_pool = False
            else:
                act = maxpool2d(act, lp.window)
            continue
        if lp.kind == "conv_int8":
            vals = act  # raw int8 image input, not in code domain
        else:
            if isinstance(act, BlockedAct):
                vals = BlockedAct(codes_to_values(act.codes, config.abits),
                                  act.s, act.oh, act.ow)
            else:
                if act.ndim > 2 and lp.kind == "dense":
                    act = act.reshape(act.shape[0], -1)
                vals = codes_to_values(act, config.abits)
        if lp.kind in ("conv", "conv_int8"):
            if s2d:
                c = lp.k // (lp.kernel * lp.kernel)
                w_hwio = p["w_hwio"] if "w_hwio" in p else \
                    p["w_int8"].reshape(lp.kernel, lp.kernel, c, lp.n)
                # int16 accumulator drain for drain-bound layers (exact:
                # lp.k real taps × max|a| × max|w| bounds every partial)
                phase_k = 4 * s2d * s2d * c
                amax = 128 if lp.kind == "conv_int8" \
                    else (2 ** config.abits - 1)
                wmax = 1 if config.wbits == 1 else 3
                max_k16 = S2D_TUNING["acc_i16_max_k"]
                use_i16 = (max_k16 and phase_k <= max_k16
                           and lp.k * amax * wmax < 32767)
                ba = conv_s2d_blocked(
                    vals, jnp.asarray(w_hwio), thr, s=s2d,
                    out_dtype=jnp.int16 if use_i16 else None,
                    form=S2D_TUNING["form"])
                if s2d == 2 and thr is not None and \
                        li + 1 < len(plan) and \
                        plan[li + 1].kind == "pool" and \
                        plan[li + 1].window == 2 and \
                        ba.oh % 2 == 0 and ba.ow % 2 == 0:
                    act = phase_maxpool(ba)
                    skip_pool = True
                else:
                    act = ba
                continue
            if conv_mode == "native":
                c = lp.k // (lp.kernel * lp.kernel)
                w_hwio = p["w_hwio"] if "w_hwio" in p else \
                    p["w_int8"].reshape(lp.kernel, lp.kernel, c, lp.n)
                acc = _conv_bf16_exact(vals, w_hwio, lp.stride)
            else:
                w = p["w_hwio"].reshape(lp.k, lp.n) if "w_hwio" in p \
                    else p["w_int8"]
                patches = sliding_window(vals, lp.kernel, lp.kernel,
                                         lp.stride)
                b, oh, ow, k = patches.shape
                acc = ref.int_matmul_ref(patches.reshape(b * oh * ow, k), w)
                acc = acc.reshape(b, oh, ow, lp.n)
        else:
            acc = ref.int_matmul_ref(vals, p["w_int8"])
        act = acc if lp.last else multithreshold(acc, thr)
    if isinstance(act, BlockedAct):   # network ending mid-phase (defensive)
        act = dephase(act)
    return act


def forward_direct(config: NetworkConfig, decoded, x, *, interpret=None):
    """Like forward_xla, but every packed conv layer runs the direct
    (no-im2col) Pallas kernel ops/conv_direct.py; dense layers and the
    int8 first conv stay on the XLA int8 path."""
    from bnn_pynq_tpu.ops.conv_direct import conv2d_direct
    plan = make_plan(config)
    if config.input_kind == "bipolar":
        x = jnp.asarray(x)
        act = _input_codes(config, x.reshape(x.shape[0], -1))
    else:
        act = jnp.asarray(x, dtype=jnp.int8)

    for lp, p in zip(plan, decoded):
        thr = None if lp.last else p.get("thr")
        if lp.kind == "pool":
            act = maxpool2d(act, lp.window)
            continue
        if lp.kind == "conv_int8":
            patches = sliding_window(act, lp.kernel, lp.kernel, lp.stride)
            b, oh, ow, k = patches.shape
            w = p["w_hwio"].reshape(lp.k, lp.n) if "w_hwio" in p \
                else p["w_int8"]
            acc = ref.int_matmul_ref(patches.reshape(b * oh * ow, k), w)
            acc = acc.reshape(b, oh, ow, lp.n)
            act = acc if lp.last else multithreshold(acc, thr)
        elif lp.kind == "conv":
            wmat = p["w_hwio"].reshape(lp.k, lp.n)
            act = conv2d_direct(act, wmat, thr, kernel=lp.kernel,
                                abits=config.abits, stride=lp.stride,
                                interpret=interpret)
            if lp.last:
                act = act.astype(jnp.int32)
        else:
            if act.ndim > 2:
                act = act.reshape(act.shape[0], -1)
            vals = codes_to_values(act, config.abits)
            acc = ref.int_matmul_ref(vals, p["w_int8"])
            act = acc if lp.last else multithreshold(acc, thr)
    return act


def _weight_matrix(p, lp):
    return p["w_hwio"].reshape(lp.k, lp.n) if "w_hwio" in p else p["w_int8"]


# Below this many spatial positions a conv leaves the pitch-grid chain
# kernel (whose garbage-row overhead scales as grid/valid — 25× for a
# 5×5→3×3→1×1 tail) and runs as XLA im2col + the row-domain dense_block
# kernel instead.
_MEGA_SMALL_HW = 100


def mega_stages(config: NetworkConfig, decoded, out_scale, out_bias,
                *, interpret=None):
    """Build the mega route as an explicit list of (name, fn) stages,
    where folding the fns over the prepared input activation reproduces
    `forward_mega` exactly. Stage boundaries are the kernel/XLA-glue
    boundaries, so tools/stage_prof.py can time each production stage
    standalone. All grouping decisions are made from static shape
    arithmetic (no tracers needed)."""
    from bnn_pynq_tpu.ops.conv_stack import conv_chain_vmem, dense_block
    from bnn_pynq_tpu.ops.fused_mlp import fused_mlp_forward_padded
    plan = make_plan(config)

    if config.input_kind == "bipolar":
        h, w, c = 1, 1, int(np.prod(config.input_shape))
        levels = False
    else:
        h, w, c = config.input_shape
        levels = True

    stages = []
    idx = 0
    n = len(plan)
    # -- phase 1: large-spatial conv chains + pools ------------------------
    while idx < n and plan[idx].kind != "dense":
        lp = plan[idx]
        if lp.kind == "pool":
            stages.append((f"pool{idx}",
                           lambda a, win=lp.window: maxpool2d(a, win)))
            h //= lp.window
            w //= lp.window
            idx += 1
            continue
        oh = (h - lp.kernel) // lp.stride + 1
        if oh * oh < _MEGA_SMALL_HW and lp.stride == 1:
            break  # small-spatial tail (phase 2)
        # Collect a chain: this conv + following same-kernel stride-1
        # non-final convs, while the POST-stride grid keeps a non-empty
        # valid region (each in-kernel conv shrinks it by K-1).
        ow = (w - lp.kernel) // lp.stride + 1
        group = [idx]
        j = idx + 1
        while (j < n and plan[j].kind == "conv" and plan[j].stride == 1
               and plan[j].kernel == lp.kernel and not plan[j].last
               and min(oh, ow) - len(group) * (lp.kernel - 1) > 0):
            group.append(j)
            j += 1
        if plan[group[0]].last:
            raise NotImplementedError(
                "mega route expects a dense (or small-conv) final stage")
        k = lp.kernel
        # the first conv's patches are prebuilt in XLA when the input
        # channel count can't lane-offset-store (raw 3-channel images),
        # when it strides, or when prebuilding removes garbage rows
        # cheaply (conv_int8 image input)
        prebuild = (lp.kind == "conv_int8" or lp.stride != 1 or c % 32 != 0)
        weights = [_weight_matrix(decoded[g], plan[g]) for g in group]
        thrs = [decoded[g]["thr"] for g in group]
        if prebuild:
            stages.append((f"im2col{idx}",
                           lambda a, k=k, s=lp.stride:
                           sliding_window(a, k, k, s)))
            gh, gw = oh, ow
            n_inkernel = len(group) - 1
        else:
            gh, gw = h, w
            n_inkernel = len(group)
        shrink = n_inkernel * (k - 1)
        vh, vw = gh - shrink, gw - shrink

        def chain_fn(a, weights=weights, thrs=thrs, k=k, prebuild=prebuild,
                     levels=levels, vh=vh, vw=vw):
            out = conv_chain_vmem(a, weights, thrs, kernel=k,
                                  abits=config.abits, input_patches=prebuild,
                                  input_levels=levels, interpret=interpret)
            return out[:, :vh, :vw, :]
        stages.append((f"chain{group[0]}-{group[-1]}", chain_fn))
        h, w, c = vh, vw, plan[group[-1]].n
        levels = False
        idx = j

    # -- phase 2: small-spatial convs + dense tail -------------------------
    mlp_ws, mlp_ts = [], []
    while idx < n:
        lp = plan[idx]
        p = decoded[idx]
        if lp.kind == "pool":
            stages.append((f"pool{idx}",
                           lambda a, win=lp.window: maxpool2d(a, win)))
            h //= lp.window
            w //= lp.window
            idx += 1
            continue
        if lp.kind in ("conv", "conv_int8"):
            oh = (h - lp.kernel) // lp.stride + 1
            ow = (w - lp.kernel) // lp.stride + 1
            if lp.last:
                raise NotImplementedError(
                    "mega route expects a dense (or 1×1-output conv) "
                    "final stage")
            if oh == 1 and ow == 1 and not levels:
                # kernel covers the map: conv ≡ dense on flattened rows —
                # fold into the MLP tail (sliding_window order (ki,kj,c)
                # equals a plain row-major reshape here)
                mlp_ws.append(_weight_matrix(p, lp))
                mlp_ts.append(p["thr"])
                idx += 1
                # everything after a flatten is dense-domain
                continue

            def block_fn(a, lp=lp, p=p, levels=levels):
                patches = sliding_window(a, lp.kernel, lp.kernel, lp.stride)
                b_, oh_, ow_, kk = patches.shape
                rows = dense_block(patches.reshape(b_ * oh_ * ow_, kk),
                                   [_weight_matrix(p, lp)], [p["thr"]],
                                   abits=config.abits, input_levels=levels,
                                   interpret=interpret)
                return rows.reshape(b_, oh_, ow_, lp.n)
            stages.append((f"block{idx}", block_fn))
            h, w, c = oh, ow, lp.n
            levels = False
            idx += 1
            continue
        # dense
        mlp_ws.append(p["w_int8"])
        if not lp.last:
            mlp_ts.append(p["thr"])
        idx += 1

    if not mlp_ws:
        raise NotImplementedError("mega route needs a dense final stage")

    def tail_fn(a):
        if a.ndim > 2:
            a = a.reshape(a.shape[0], -1)
        return fused_mlp_forward_padded(a, mlp_ws, mlp_ts, out_scale,
                                        out_bias, abits=config.abits,
                                        interpret=interpret)
    stages.append(("mlp_tail", tail_fn))
    return stages


def prepare_input(config: NetworkConfig, x):
    """Input prep shared by the mega route: bipolar → codes, int8 → int8."""
    if config.input_kind == "bipolar":
        xx = jnp.asarray(x)
        return _input_codes(config, xx.reshape(xx.shape[0], -1))
    return jnp.asarray(x, dtype=jnp.int8)


def forward_mega(config: NetworkConfig, decoded, x, out_scale, out_bias,
                 *, interpret=None):
    """Maximum-fusion forward — the closest TPU analogue of the
    reference's single `DoCompute` dataflow pipeline (SURVEY.md C9
    «bnn/src/network/<net>/hw/top.cpp»). Large-spatial conv runs chain
    in VMEM (ops/conv_stack.conv_chain_vmem: in-VMEM im2col + one MXU
    dot per layer); small-spatial convs run as XLA im2col + the
    row-domain dense_block kernel; kernel-covers-map convs fold into the
    fused whole-MLP kernel with the dense tail. Only maxpools, valid-
    region slices, and reshapes run as XLA glue between kernels.

    For CNV: chain(conv1+conv2) → pool → chain(conv3+conv4) → pool →
    dense_block(conv5 on B·9 rows) → fused_mlp(conv6 + 3 dense) =
    4 Pallas kernels + glue.

    Returns float32 logits (final scale/bias applied in-kernel)."""
    act = prepare_input(config, x)
    for _, fn in mega_stages(config, decoded, out_scale, out_bias,
                             interpret=interpret):
        act = fn(act)
    return act


def make_forward_fn(config: NetworkConfig, *, impl: str = "pallas",
                    route: str = "mxu", interpret=None):
    """Return a jittable `fn(params, x) -> logits` closure."""
    def fn(params, x):
        return forward(config, params, x, impl=impl, route=route,
                       interpret=interpret)
    return fn
