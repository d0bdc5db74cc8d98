"""Worker process for tests/test_distributed.py's 2-process DCN test.

Each worker joins the global JAX runtime through the library's own
`initialize_from_env` (the exact path a multi-host TPU launch takes),
builds the global mesh with `create_mesh`, feeds its process-local slice
of a global batch with `shard_host_batch`, and checks that cross-process
collectives (a jitted global sum, and sinkhorn_log's global marginals via
shard_map psum) produce the single-process answer.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from repconc_tpu.core.distributed import (initialize_from_env, process_slice,
                                          shard_host_batch)
from repconc_tpu.core.mesh import create_mesh, DATA_AXIS


def main():
    assert initialize_from_env(), "env contract not detected"
    assert jax.process_count() == 2, jax.process_count()
    mesh = create_mesh()
    assert mesh.size == 4, mesh.size  # 2 processes x 2 virtual devices

    # --- global batch fed as process-local slices -----------------------
    rng = np.random.default_rng(7)
    global_batch = {"x": rng.normal(size=(8, 16)).astype(np.float32),
                    "ids": np.arange(8, dtype=np.int32)}
    local = {k: v[process_slice(len(v))] for k, v in global_batch.items()}
    data = NamedSharding(mesh, P(DATA_AXIS))
    dev = shard_host_batch(data, local)
    assert dev["x"].shape == (8, 16)          # logically global
    assert not dev["x"].is_fully_addressable  # truly multi-process

    # --- jitted global reduction over the dp axis ------------------------
    f = jax.jit(lambda b: jnp.sum(b["x"]) + jnp.sum(b["ids"]),
                out_shardings=NamedSharding(mesh, P()))
    got = float(f(dev))
    want = float(global_batch["x"].sum() + global_batch["ids"].sum())
    assert abs(got - want) < 1e-3, (got, want)

    # --- Sinkhorn global marginals across the process boundary -----------
    shard_map = jax.shard_map

    from repconc_tpu.quant.sinkhorn import sinkhorn_log

    M, B, K = 2, 8, 4
    neg_cost = np.asarray(
        np.random.default_rng(3).normal(size=(M, B, K)), np.float32)
    sharded_fn = jax.jit(shard_map(
        lambda c: sinkhorn_log(c, epsilon=0.05, iterations=400,
                               axis_name=DATA_AXIS),
        mesh=mesh, in_specs=P(None, DATA_AXIS, None),
        out_specs=P(None, DATA_AXIS, None)))
    cost_dev = shard_host_batch(
        NamedSharding(mesh, P(None, DATA_AXIS, None)),
        neg_cost[:, process_slice(B), :])
    logq = sharded_fn(cost_dev)
    q = np.exp(jax.device_get(
        jax.jit(lambda x: x, out_shardings=NamedSharding(mesh, P()))(logq)))
    # each sample's K-slice sums to 1; each centroid's global mass = B/K
    np.testing.assert_allclose(q.sum(axis=2), 1.0, atol=1e-3)
    np.testing.assert_allclose(q.sum(axis=1), B / K, atol=0.02 * B)

    print(f"[p{jax.process_index()}] DCN worker OK", flush=True)


if __name__ == "__main__":
    sys.exit(main())
