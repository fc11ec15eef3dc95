"""Test configuration: force CPU with 8 virtual devices.

Multi-chip sharding tests run on a virtual CPU mesh (the TPU analogue of
"multi-node without a cluster" — SURVEY.md §4). The environment's axon
sitecustomize force-selects the remote TPU backend through jax.config at
interpreter start, so setting JAX_PLATFORMS alone is not enough — we must
re-update jax.config before any backend is initialized.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: kernel env presets "axon"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture(autouse=True)
def _glim_lifecycle_cleanup():
    """Stop leaked worker threads and drop stale callback observers after
    every test. Callback slots are process-wide static members and the async
    wrappers own polling threads; 200+ tests in one process accumulate both
    (observed: late-suite flaky failures and interpreter-teardown aborts)."""
    yield
    from glim_tpu.utils import lifecycle
    from glim_tpu.utils.callbacks import CallbackSlot
    lifecycle.stop_all()
    CallbackSlot.clear_all()
