"""Packed-parameter artifact format (SURVEY.md C16 «bnn/params/<dataset>/»
analogue — replaces per-PE .bin files with a single npz + JSON manifest).

Layout: one `.npz` holding every layer array under keys
`layer{i}/{name}` plus `out_scale`/`out_bias`, and a JSON manifest under
key `manifest` describing the network config so artifacts are
self-contained (the analogue of the reference's classes.txt + directory
convention, SURVEY.md §1 S1→L2 contract).
"""

from __future__ import annotations

import json
import os

import numpy as np

from bnn_pynq_tpu.compiler.finnthesizer import CompiledNetwork
from bnn_pynq_tpu.models.config import (ConvSpec, DenseSpec, NetworkConfig,
                                        PoolSpec)

FORMAT_VERSION = 1


def config_to_json(cfg: NetworkConfig) -> dict:
    layers = []
    for s in cfg.layers:
        if isinstance(s, ConvSpec):
            layers.append({"kind": "conv", "out_ch": s.out_ch,
                           "kernel": s.kernel, "stride": s.stride})
        elif isinstance(s, PoolSpec):
            layers.append({"kind": "pool", "window": s.window})
        else:
            layers.append({"kind": "dense", "out_features": s.out_features})
    return {"name": cfg.name, "wbits": cfg.wbits, "abits": cfg.abits,
            "input_kind": cfg.input_kind,
            "input_shape": list(cfg.input_shape), "layers": layers,
            "num_classes": cfg.num_classes, "dataset": cfg.dataset}


def config_from_json(d: dict) -> NetworkConfig:
    specs = []
    for s in d["layers"]:
        if s["kind"] == "conv":
            specs.append(ConvSpec(s["out_ch"], s["kernel"], s["stride"]))
        elif s["kind"] == "pool":
            specs.append(PoolSpec(s["window"]))
        else:
            specs.append(DenseSpec(s["out_features"]))
    return NetworkConfig(
        name=d["name"], wbits=d["wbits"], abits=d["abits"],
        input_kind=d["input_kind"], input_shape=tuple(d["input_shape"]),
        layers=tuple(specs), num_classes=d["num_classes"],
        dataset=d.get("dataset", ""))


def save_artifact(path: str, compiled: CompiledNetwork):
    arrays = {}
    for i, layer in enumerate(compiled.layers):
        for name, arr in layer.items():
            arrays[f"layer{i}/{name}"] = np.asarray(arr)
    arrays["out_scale"] = np.asarray(compiled.out_scale)
    arrays["out_bias"] = np.asarray(compiled.out_bias)
    manifest = {
        "format_version": FORMAT_VERSION,
        "config": config_to_json(compiled.config),
        "num_layers": len(compiled.layers),
        "scheme": compiled.config.scheme(),
        "meta": _jsonable(compiled.meta),
    }
    arrays["manifest"] = np.frombuffer(
        json.dumps(manifest).encode(), dtype=np.uint8)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **arrays)


def load_artifact(path: str) -> CompiledNetwork:
    z = np.load(path, allow_pickle=False)
    manifest = json.loads(bytes(z["manifest"]).decode())
    if manifest["format_version"] > FORMAT_VERSION:
        raise ValueError(f"artifact format {manifest['format_version']} "
                         f"newer than supported {FORMAT_VERSION}")
    config = config_from_json(manifest["config"])
    layers = [dict() for _ in range(manifest["num_layers"])]
    for key in z.files:
        if key.startswith("layer"):
            idx_s, _, name = key.partition("/")
            layers[int(idx_s[5:])][name] = z[key]
    return CompiledNetwork(config=config, layers=layers,
                           out_scale=z["out_scale"], out_bias=z["out_bias"],
                           meta=manifest.get("meta", {}))


def _jsonable(obj):
    if isinstance(obj, dict):
        return {k: _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    return obj
