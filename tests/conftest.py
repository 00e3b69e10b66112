"""Test harness: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on host CPU devices
(xla_force_host_platform_device_count); the real-TPU path is exercised by
bench.py and the driver's compile check.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The environment's sitecustomize (axon TPU tunnel) imports jax at
# interpreter startup and sets the jax_platforms CONFIG, which overrides the
# env var — so tests would silently run on the remote TPU (minutes-long
# remote compiles, bf16-default matmuls). Override the config back.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pathlib

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(20260816)


REFERENCE_BIN = pathlib.Path("/tmp/ref_build/Linux-amd64/bin")


def has_reference_oracle() -> bool:
    return (REFERENCE_BIN / "DNA_CreateCanSnpTensor").exists()


needs_oracle = pytest.mark.skipif(
    not has_reference_oracle(),
    reason="reference C++ oracle not built (/tmp/ref_build)",
)
