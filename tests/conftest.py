"""Force tests onto a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding/pjit tests run on
XLA's host platform with 8 virtual devices instead (same compilation path,
same collectives).
"""

import os

# Force-set (not setdefault): the harness environment pre-sets
# JAX_PLATFORMS=axon, which would route every test through the slow
# single-chip TPU tunnel.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import pathlib

import pytest

FIXTURES = pathlib.Path(__file__).parent / "fixtures"


@pytest.fixture(scope="session")
def fixture_mid() -> pathlib.Path:
    return FIXTURES / "80df1867935371808ab60eabdad2a1d2.mid"
