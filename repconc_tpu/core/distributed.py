"""Multi-host (DCN) scale-out: process wiring + host-data sharding.

The reference scales with `torch.distributed.launch` one-process-per-GPU DDP
on a single node (examples/tas-balanced/repconc/7_run_conc_train.sh:56-64,
NCCL backend). The TPU-native story has two tiers:

* intra-slice (ICI): one process sees every chip through `jax.devices()`;
  `core/mesh.create_mesh` + GSPMD shardings are all that is needed and the
  collectives ride ICI. This is SURVEY §2c's single-process mapping.
* multi-slice / multi-host (DCN): one JAX process per host, glued into ONE
  global SPMD program by `jax.distributed.initialize`. After
  initialization `jax.devices()` returns the GLOBAL device list (ordered
  process-major, so a 1-D "dp" mesh keeps the process boundary — the DCN
  hop — on the outer stride), `create_mesh` works unchanged, and the same
  psum/all_gather collectives cross DCN where the mesh does.

What changes on multi-host is HOST DATA FEEDING: a process can only
device_put onto its own (addressable) chips, so each process materializes
its slice of the global batch and `jax.make_array_from_process_local_data`
assembles the logically-global array. `shard_host_batch` below hides the
single- vs multi-process split; `process_slice` computes which rows of a
global batch this process must load (the analog of DistributedSampler
rank striding in the reference's trainer).

Verified by tests/test_distributed.py: a real 2-process CPU run
(gloo collectives) through initialize_from_env -> create_mesh ->
shard_host_batch -> jitted global reductions.
"""
from __future__ import annotations

import logging
import os
from typing import Any, Optional

import jax
import numpy as np

logger = logging.getLogger(__name__)

# Env contract (mirrors jax.distributed's own args; REPCONC_* so recipes can
# set them without colliding with cluster-injected JAX variables):
#   REPCONC_COORDINATOR    host:port of process 0
#   REPCONC_NUM_PROCESSES  world size
#   REPCONC_PROCESS_ID     this process's rank
ENV_COORDINATOR = "REPCONC_COORDINATOR"
ENV_NUM_PROCESSES = "REPCONC_NUM_PROCESSES"
ENV_PROCESS_ID = "REPCONC_PROCESS_ID"


def is_distributed_env() -> bool:
    """True when the multi-process env contract (or a TPU-pod autodetect
    hint) is present."""
    return ENV_COORDINATOR in os.environ


def initialize_from_env(force: bool = False) -> bool:
    """Wire this process into the global JAX runtime if the env asks for it.

    Returns True when running multi-process (after initialization), False
    for the plain single-process path. Safe to call more than once and from
    every CLI entry point: a second call is a no-op.

    On Cloud TPU pods `jax.distributed.initialize()` autodetects all three
    values from the TPU metadata server; set REPCONC_COORDINATOR=auto to
    request that path explicitly.
    """
    if jax.distributed.is_initialized():  # already up
        return True
    if not (force or is_distributed_env()):
        return False
    coordinator = os.environ.get(ENV_COORDINATOR, "auto")
    if coordinator == "auto":
        jax.distributed.initialize()
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=int(os.environ[ENV_NUM_PROCESSES]),
            process_id=int(os.environ[ENV_PROCESS_ID]),
        )
    logger.info("distributed: process %d/%d, %d global / %d local devices",
                jax.process_index(), jax.process_count(),
                len(jax.devices()), len(jax.local_devices()))
    return True


def process_slice(global_batch: int) -> slice:
    """Rows of a global batch this process must materialize (contiguous
    block striding — matches the process-major device order of a 1-D mesh,
    so each row lands on a chip its own process addresses)."""
    n = jax.process_count()
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} must divide the "
                         f"process count {n}")
    per = global_batch // n
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)


def shard_host_batch(sharding, tree: Any) -> Any:
    """Put a host-side batch onto the mesh as logically-global arrays.

    Single-process: a plain sharded device_put of the full array.
    Multi-process: every leaf must already be this process's LOCAL slice
    (cut with `process_slice`); the global array is assembled without any
    cross-host data movement (each host feeds only its addressable chips).
    """
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(np.asarray(x), sharding),
                            tree)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)), tree)
