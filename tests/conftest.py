"""Test configuration: run everything on a virtual 8-device CPU mesh.

The TPU-native analog of a fake distributed backend (SURVEY.md §4): XLA's
host platform is forced to expose 8 devices so `shard_map`/`psum` paths are
exercised without TPU hardware.

Set REPCONC_TEST_TPU=1 to run the suite on the real accelerator instead.
"""
import os

if os.environ.get("REPCONC_TEST_TPU") != "1":
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(2022)
