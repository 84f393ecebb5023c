"""Device mesh + sharding helpers for 2D spatial domain decomposition.

The reference is single-process/single-device (one SYCL ``queue``,
``Poissons_SYCL.cpp:659``; no MPI/NCCL anywhere — SURVEY.md §2.3).  Scaling
here is the TPU-native analogue: the grid is sharded (y, x) over a 2D
``jax.sharding.Mesh``, and XLA inserts the neighbor halo exchanges over ICI.

Two distributed code paths exist:

* **auto (this module + plain jit)** — arrays carry a ``NamedSharding``;
  the stock jnp operators are jit-compiled and GSPMD partitions the stencils
  (shifted slices become halo exchanges).  Works for any grid size, including
  the odd (2^k + 1) node counts.
* **explicit (dist.shard_cycle)** — ``shard_map`` + ``jax.lax.ppermute``
  halo rings, for hand-controlled communication (BASELINE config 5).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

GRID_AXES = ("gy", "gx")


def _factor2(n: int) -> Tuple[int, int]:
    """Most-square factorization (a, b) with a*b = n, a <= b."""
    a = int(math.isqrt(n))
    while n % a:
        a -= 1
    return a, n // a


def make_grid_mesh(shape: Optional[Tuple[int, int]] = None,
                   devices: Optional[Sequence] = None) -> Mesh:
    """2D device mesh with axes ("gy", "gx") for spatial decomposition."""
    devs = list(devices) if devices is not None else list(jax.devices())
    if shape is None:
        shape = _factor2(len(devs))
    my, mx = shape
    if my * mx != len(devs):
        raise ValueError(f"mesh shape {shape} != {len(devs)} devices")
    arr = np.asarray(devs).reshape(my, mx)
    return Mesh(arr, GRID_AXES)


def grid_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for an (S, S) grid array: rows over gy, cols over gx."""
    return NamedSharding(mesh, P("gy", "gx"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def place(x, mesh: Mesh):
    """Put a grid array on the mesh with (gy, gx) sharding."""
    return jax.device_put(x, grid_sharding(mesh))
