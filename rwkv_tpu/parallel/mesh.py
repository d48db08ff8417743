"""Device mesh construction.

Axes:
  'data'  — independent stream/batch parallelism (across hosts this rides
            DCN; inside a slice, ICI).
  'model' — tensor parallelism: every quantized matmul's contracted or
            output dim is split over this axis and GSPMD reduces partial
            sums with psum/reduce-scatter over ICI.

The reference has no equivalent — it is hard-pinned to one GPU
(vulkan/rwkv.cpp:223, cudaSetDevice(0)); this module is new first-class
scope per SURVEY.md §2.3.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    model: Optional[int] = None,
    data: int = 1,
    *,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ('data', 'model') mesh.

    model=None uses all remaining devices for tensor parallelism.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if model is None:
        if n % data:
            raise ValueError(f"{n} devices not divisible by data={data}")
        model = n // data
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} needs {data*model} devices, have {n}")
    grid = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(grid, ("data", "model"))


def single_device_mesh() -> Mesh:
    return make_mesh(model=1, data=1)
