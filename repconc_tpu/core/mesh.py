"""Device mesh helpers.

The reference scales with `torch.distributed.launch` process-per-GPU DDP
(examples/tas-balanced/repconc/7_run_conc_train.sh:56-64). The TPU-native
equivalent is a single SPMD program over a `jax.sharding.Mesh` with a data
axis: batch shards over `dp`, collectives (`psum`/`pmax`/`pmin`/`all_gather`)
ride ICI. No launcher processes; `jax.jit` + shardings replace DDP.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "dp"


def create_mesh(n_devices: Optional[int] = None, axis_name: str = DATA_AXIS) -> Mesh:
    """A 1-D data-parallel mesh over all (or the first n) local devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def data_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
