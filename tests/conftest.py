"""Test configuration.

Tests run on CPU with 8 virtual XLA devices so multi-chip sharding paths are
exercised without TPU hardware — the analog of the reference's loopback-
before-accelerator bring-up strategy (NTT_PCIEComunicationv3.c/v4.c).
Must set env before jax is first imported anywhere.

On-device parity subset (the analog of running the RTL testbench against the
actual board, NTT_PolyMul_test.v:165-226): set ``TPU_NTT_TEST_TPU=1`` and
select with ``-m tpu`` — the CPU pin is lifted, only tpu-marked tests run,
and tests/test_tpu_parity.py writes a PARITY_TPU artifact.
"""

import os

TPU_MODE = os.environ.get("TPU_NTT_TEST_TPU") == "1"

if not TPU_MODE:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

import jax

if not TPU_MODE:
    # The axon site hook (sitecustomize) force-registers the TPU backend and
    # overrides JAX_PLATFORMS; an in-process config update is what actually
    # pins tests to the virtual-8-device CPU platform.
    jax.config.update("jax_platforms", "cpu")

import pathlib

import numpy as np
import pytest

REFERENCE = pathlib.Path("/root/reference/Multiplier_NTT_Based")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "tpu: needs a real TPU — run TPU_NTT_TEST_TPU=1 pytest -m tpu")


def pytest_collection_modifyitems(config, items):
    if TPU_MODE:
        on_tpu = jax.devices()[0].platform not in ("cpu",)
        skip_cpu = pytest.mark.skip(
            reason="TPU session runs only tpu-marked tests")
        skip_no_dev = pytest.mark.skip(reason="no TPU device present")
        for item in items:
            if "tpu" not in item.keywords:
                item.add_marker(skip_cpu)
            elif not on_tpu:
                item.add_marker(skip_no_dev)
    else:
        skip = pytest.mark.skip(
            reason="needs real TPU: TPU_NTT_TEST_TPU=1 pytest -m tpu")
        for item in items:
            if "tpu" in item.keywords:
                item.add_marker(skip)


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
