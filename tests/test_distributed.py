"""Multi-host (DCN) scale-out path: real 2-process CPU run + helpers.

SURVEY §2c names ICI (intra-slice) / DCN (multi-slice) as the TPU-native
communication mapping. The single-process mesh path is covered all over the
suite; this file covers the multi-PROCESS tier: `jax.distributed.initialize`
wiring via the REPCONC_* env contract, the global mesh, host-side batch
feeding with `make_array_from_process_local_data`, and collectives that
genuinely cross the process boundary (gloo on CPU here; DCN on TPU pods).
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.skipif(os.environ.get("REPCONC_TEST_TPU") == "1",
                    reason="multi-process CPU test; one real chip")
def test_two_process_dcn_run():
    """Launch 2 worker processes through the library's own env contract and
    let them jointly run mesh construction, batch feeding, a global
    reduction, and Sinkhorn's global marginals."""
    port = _free_port()
    env = {k: v for k, v in os.environ.items()}
    env.update({
        "REPCONC_COORDINATOR": f"127.0.0.1:{port}",
        "REPCONC_NUM_PROCESSES": "2",
    })
    procs = []
    for pid in range(2):
        e = dict(env, REPCONC_PROCESS_ID=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "_dcn_worker.py")],
            env=e, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert "DCN worker OK" in out


def test_single_process_helpers():
    """Without the env contract everything degrades to the local path."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from repconc_tpu.core.distributed import (initialize_from_env,
                                              is_distributed_env,
                                              process_slice,
                                              shard_host_batch)
    from repconc_tpu.core.mesh import create_mesh

    assert not is_distributed_env()
    assert initialize_from_env() is False
    assert jax.process_count() == 1
    assert process_slice(8) == slice(0, 8)
    mesh = create_mesh()
    batch = {"x": np.ones((mesh.size * 2, 4), np.float32)}
    dev = shard_host_batch(NamedSharding(mesh, P("dp")), batch)
    assert dev["x"].shape == batch["x"].shape
    assert dev["x"].is_fully_addressable
    np.testing.assert_array_equal(np.asarray(dev["x"]), batch["x"])
