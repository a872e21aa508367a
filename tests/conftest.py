"""Force tests onto a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding/pjit tests run on
XLA's host platform with 8 virtual devices instead (same compilation path,
same collectives).

Two environment landmines handled here:
- the harness pre-sets JAX_PLATFORMS=axon (a tunneled single TPU chip with
  very slow host transfers), and the jaxtyping pytest plugin imports jax
  BEFORE conftest runs, freezing env-derived config — so we must update
  jax.config directly, not just os.environ;
- torch and jax thread pools deadlock XLA:CPU compilation when sharing a
  process on this single-CPU host, so torch oracles run in subprocesses
  (tests/torch_oracle.py), never in the pytest process.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (may already be imported by a pytest plugin)

jax.config.update("jax_platforms", "cpu")

import pathlib  # noqa: E402

import pytest  # noqa: E402

FIXTURES = pathlib.Path(__file__).parent / "fixtures"


@pytest.fixture(scope="session")
def fixture_mid() -> pathlib.Path:
    return FIXTURES / "80df1867935371808ab60eabdad2a1d2.mid"


@pytest.fixture(scope="module", autouse=True)
def _bound_compiled_program_accumulation():
    """De-flake (VERDICT r2 #9): XLA:CPU segfaults intermittently once a
    long-lived worker accumulates enough live compiled executables — the
    crash fires inside a LATER compile when Python's GC destroys stale
    executables mid-build (1 CPU: the destructor and the compiler thread
    pool interleave). Clearing jax's compilation caches at every module
    boundary and collecting immediately moves executable destruction to a
    deterministic idle point and keeps the per-worker live-executable count
    bounded at one module's worth. Within-module compile reuse (the big
    win) is untouched; cross-module sharing was ~nil."""
    yield
    import gc

    jax.clear_caches()
    gc.collect()


@pytest.fixture(scope="session", autouse=True)
def _torch_must_stay_out_of_process():
    """torch and XLA:CPU must not share a process on this host: jit
    compiles segfault/futex-deadlock intermittently once torch._C is
    loaded (observed killing the suite at ~90% twice). All torch work
    belongs in subprocesses (tests/torch_oracle.py pattern)."""
    yield
    import sys

    assert "torch" not in sys.modules, (
        "a test imported torch into the pytest process — move the torch "
        "code into a subprocess (see tests/torch_oracle.py); in-process "
        "torch makes later XLA:CPU compiles segfault intermittently")
