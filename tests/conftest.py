"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip hardware isn't available in CI; per the project contract we test
sharding on a virtual CPU mesh (SURVEY.md / driver notes). Env vars must be
set before jax is imported anywhere.
"""

import os

# Tests must not pop OS windows or couple to the window system: force the
# headless highgui sink regardless of DISPLAY. The dedicated GUI test
# re-enables the SDL path in a subprocess with RUSTCV_GUI=dummy.
os.environ["RUSTCV_GUI"] = "0"

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# Force CPU regardless of ambient platform config (the environment may pin
# JAX_PLATFORMS to a TPU tunnel and sitecustomize registers that plugin before
# conftest runs, so the env var alone is not enough — use the config API).
# Set RUSTCV_TEST_TPU=1 to run the suite on real hardware instead.
if os.environ.get("RUSTCV_TEST_TPU") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture()
def rng():
    """Function-scoped on purpose: a session-scoped generator made every
    test's data depend on how many other tests drew from it first
    (order-dependent flakes, e.g. test_knn_index_exact vs approximate
    FLANN). Each test now sees the same deterministic stream regardless
    of which subset of the suite runs."""
    return np.random.default_rng(1234)


@pytest.fixture(scope="session")
def jax_cpu():
    """jax on the test backend (virtual CPU mesh by default; the real chip
    when RUSTCV_TEST_TPU=1 — the name is historical)."""
    import jax

    if os.environ.get("RUSTCV_TEST_TPU") != "1":
        assert jax.default_backend() == "cpu"
    return jax
