"""Test config: force JAX onto an 8-device virtual CPU mesh.

The environment's sitecustomize imports jax and pins JAX_PLATFORMS=axon (the
real TPU, an exclusive single chip) at interpreter start — env vars set here
are too late, so the platform is forced via jax.config before any backend
initialization.  Tests must never claim the TPU; the bench does.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import pathlib
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

REF_DATA = pathlib.Path("/root/reference/test_data")


@pytest.fixture(scope="session")
def ref_data():
    if not REF_DATA.exists():
        pytest.skip("reference test_data not available")
    return REF_DATA
