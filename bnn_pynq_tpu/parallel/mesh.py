"""Device mesh construction (SURVEY.md §2 parallelism table: the TPU-native
replacement for the reference's single-board PE/SIMD spatial parallelism is
a ('data', 'model') mesh — batch over 'data', packed-weight output channels
over 'model', collectives over ICI)."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(data: Optional[int] = None, model: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a ('data', 'model') mesh.

    Defaults: all devices on the data axis (pure DP) unless `model` is
    given. data*model must equal the device count used.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if model is None and data is None:
        data, model = n, 1
    elif model is None:
        model = n // data
    elif data is None:
        data = n // model
    if data * model != n:
        devices = devices[: data * model]
        if data * model > n:
            raise ValueError(f"mesh {data}x{model} needs {data * model} "
                             f"devices, have {n}")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))
