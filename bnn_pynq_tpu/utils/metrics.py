"""Structured metrics + roofline accounting (SURVEY.md §5.1/§5.5 rebuild:
the reference only had print-based usecPerImage; here every run can emit
machine-readable JSON and compare against hardware ceilings).

Roofline model (TPU v5e, per chip):
- MXU: 394 TOPS int8 (197e12 MACs/s). A binary MAC executed via decoded
  int8 on the MXU realises 2 bitops per int8 MAC-op pair, so the honest
  "bitops" ceiling through the MXU route equals the int8 ceiling.
- VPU: ~8×128 lanes × ~0.94 GHz ≈ 1e12 int32 lane-ops/s; the XNOR+popcount
  route spends 3 lane-ops (xor, popcount, add) per 32 binary MACs
  (64 bitops) ⇒ ~21 bitops/lane-op ceiling.
- HBM: ~819 GB/s.

These constants are documented estimates for v5e; `chip_specs()` is the
single place to adjust per generation.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Dict, Optional


@dataclass(frozen=True)
class ChipSpec:
    name: str
    int8_ops_per_sec: float      # MXU int8 ops (2 per MAC)
    vpu_lane_ops_per_sec: float  # int32 elementwise lane-ops
    hbm_bytes_per_sec: float


_CHIPS = {
    "v5e": ChipSpec("v5e", 394e12, 1.0e12, 819e9),
    "v4": ChipSpec("v4", 275e12, 1.0e12, 1200e9),
    "v6e": ChipSpec("v6e", 918e12, 1.5e12, 1600e9),
}


def chip_specs(name: Optional[str] = None) -> ChipSpec:
    if name is None:
        name = os.environ.get("PALLAS_AXON_TPU_GEN", "v5e")
    return _CHIPS.get(name, _CHIPS["v5e"])


def network_macs(config) -> int:
    """Integer MACs per image for a NetworkConfig (conv + dense layers)."""
    from bnn_pynq_tpu.models.network import make_plan
    h, w, _ = config.input_shape
    total = 0
    for lp in make_plan(config):
        if lp.kind == "pool":
            h //= lp.window
            w //= lp.window
        elif lp.kind in ("conv", "conv_int8"):
            oh = (h - lp.kernel) // lp.stride + 1
            ow = (w - lp.kernel) // lp.stride + 1
            total += oh * ow * lp.k * lp.n
            h, w = oh, ow
        else:
            total += lp.k * lp.n
            h = w = 1
    return total


def mxu_roofline_images_per_sec(config, chip: Optional[ChipSpec] = None) -> float:
    """Speed-of-light images/s if every MAC ran on the MXU at peak int8.

    On TPU this is ALSO the honest "bitop roofline" for binary layers:
    a binary MAC executes fastest as a decoded int8 MXU MAC (197e12
    MAC/s on v5e), 18× above the VPU's literal XNOR+popcount ceiling —
    see docs/packed_kernels.md for the measurement-backed analysis."""
    chip = chip or chip_specs()
    return chip.int8_ops_per_sec / (2 * network_macs(config))


def vpu_bitop_roofline_images_per_sec(config,
                                      chip: Optional[ChipSpec] = None
                                      ) -> float:
    """Ceiling of the literal packed XNOR+popcount route: 3 int32 VPU
    lane-ops per 32 binary MACs. Reported alongside the MXU fraction so
    the packed kernels are graded against their own physics
    (docs/packed_kernels.md; VERDICT r2 ask #3)."""
    chip = chip or chip_specs()
    macs_per_sec = chip.vpu_lane_ops_per_sec / 3.0 * 32.0
    return macs_per_sec / network_macs(config)


def roofline_fraction(config, images_per_sec: float,
                      chip: Optional[ChipSpec] = None) -> float:
    return images_per_sec / mxu_roofline_images_per_sec(config, chip)


@dataclass
class RunMetrics:
    """Accumulates a run's metrics and writes one JSON file/line."""
    name: str
    values: Dict[str, float] = field(default_factory=dict)
    t0: float = field(default_factory=time.time)

    def record(self, **kw):
        self.values.update({k: float(v) for k, v in kw.items()})
        return self

    def emit(self, path: Optional[str] = None) -> str:
        payload = {"run": self.name, "wall_s": time.time() - self.t0,
                   **self.values}
        line = json.dumps(payload)
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            with open(path, "a") as f:
                f.write(line + "\n")
        return line
