"""Device mesh construction.

The reference has no parallelism of any kind (SURVEY.md §2: zero threading/
multiprocessing/NCCL imports — one process, one stream). This package is the
new capability mandated by BASELINE.json: data-parallel coding lanes over
the ``data`` axis, tensor-parallel weights over the ``model`` axis, laid out
so TP collectives ride ICI.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh

__all__ = ["make_mesh"]


def make_mesh(data: int = -1, model: int = 1, devices=None) -> Mesh:
    """Build a (data, model) mesh. ``data=-1`` -> use all remaining devices.

    The model axis is innermost (fastest-varying over the device list) so TP
    collectives run between physically adjacent chips."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        if n % model:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.array(devices).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))
