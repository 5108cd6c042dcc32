"""Test configuration.

Tests run on CPU with 8 virtual XLA devices so multi-chip sharding paths are
exercised without TPU hardware — the analog of the reference's loopback-
before-accelerator bring-up strategy (NTT_PCIEComunicationv3.c/v4.c).
Must set env before jax is first imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The axon site hook (sitecustomize) force-registers the TPU backend and
# overrides JAX_PLATFORMS; an in-process config update is what actually
# pins tests to the virtual-8-device CPU platform.
jax.config.update("jax_platforms", "cpu")

import pathlib

import numpy as np
import pytest

REFERENCE = pathlib.Path("/root/reference/Multiplier_NTT_Based")


@pytest.fixture(scope="session")
def reference_dir():
    if not REFERENCE.is_dir():
        pytest.skip("reference repo not mounted")
    return REFERENCE


def read_hex_vectors(path) -> np.ndarray:
    """Read one-hex-value-per-line vector files ($readmemh format)."""
    vals = []
    for line in open(path):
        line = line.split("//")[0].strip()
        if line:
            vals.append(int(line, 16))
    return np.array(vals, dtype=np.int64)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0xC0FFEE)
