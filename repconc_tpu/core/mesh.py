"""Device mesh helpers.

The reference scales with `torch.distributed.launch` process-per-GPU DDP
(examples/tas-balanced/repconc/7_run_conc_train.sh:56-64). The TPU-native
equivalent is a single SPMD program over a `jax.sharding.Mesh` with a data
axis: batch shards over `dp`, collectives (`psum`/`pmax`/`pmin`/`all_gather`)
ride ICI within a slice. Multi-host / multi-slice runs (one process per
host, collectives crossing DCN at the process boundary) are wired by
`core/distributed.initialize_from_env`, which `create_mesh` calls first —
after it, `jax.devices()` is the GLOBAL process-major device list, so the
1-D dp mesh keeps DCN on the outer stride and per-batch collectives stay
ICI-local wherever GSPMD can keep them so. No launcher processes on a
single host; `jax.jit` + shardings replace DDP.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "dp"


def create_mesh(n_devices: Optional[int] = None, axis_name: str = DATA_AXIS) -> Mesh:
    """A 1-D data-parallel mesh over all devices (or the first n).

    Under the REPCONC_COORDINATOR/_NUM_PROCESSES/_PROCESS_ID env contract
    this joins the multi-process runtime first and builds the mesh over the
    GLOBAL device list (every CLI reaches multi-host through this one
    call); otherwise it is the plain single-process local mesh."""
    from repconc_tpu.core.distributed import initialize_from_env

    initialize_from_env()
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
