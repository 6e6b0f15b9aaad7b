"""Test environment: force an 8-device virtual CPU mesh before JAX imports.

Mirrors SURVEY.md §4's recommended strategy: sharding correctness is checked
host-side with ``xla_force_host_platform_device_count`` rather than real
TPU hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the ambient env points at the TPU tunnel
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The TPU-tunnel PJRT plugin registers itself from sitecustomize before this
# file runs, and its config update overrides JAX_PLATFORMS — push CPU back.
jax.config.update("jax_platforms", "cpu")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


REFERENCE_DATA = "/root/reference/data"


def reference_scan(dataset="sim_structured", index=1):
    from la3dm_tpu.io.pcd import load_pcd

    path = f"{REFERENCE_DATA}/{dataset}/{dataset}_{index}.pcd"
    if not os.path.exists(path):
        pytest.skip(f"reference dataset not available at {path}")
    return load_pcd(path)
