"""Test configuration: force CPU with 8 virtual devices.

Multi-chip sharding tests run on a virtual CPU mesh (the TPU analogue of
"multi-node without a cluster" — SURVEY.md §4). The environment's axon
sitecustomize force-selects the remote TPU backend through jax.config at
interpreter start, so setting JAX_PLATFORMS alone is not enough — we must
re-update jax.config before any backend is initialized.
"""

import os
import resource

# The default 8 MB stack soft-limit is too small for LLVM's recursive passes
# when XLA compiles the largest fused programs (window_scan_step & friends):
# deep pass pipelines segfault late in the suite once incidental stack usage
# has crept up. The hard limit is unlimited here; Linux grows the main-thread
# stack on demand up to the soft limit, so raising it in-process is effective.
_soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
if _soft != resource.RLIM_INFINITY and _soft < 512 * 1024 * 1024:
    _target = 512 * 1024 * 1024 if _hard == resource.RLIM_INFINITY else min(_hard, 512 * 1024 * 1024)
    resource.setrlimit(resource.RLIMIT_STACK, (_target, _hard))
import threading

threading.stack_size(64 * 1024 * 1024)  # worker threads that trigger compiles

os.environ["JAX_PLATFORMS"] = "cpu"  # force: kernel env presets "axon"
# Background bucket precompilation stays off by default in the suite: the
# predicted next-bucket variants would burn CPU compiling programs no test
# ever calls. tests/test_precompile.py opts in per-instance.
os.environ.setdefault("GLIM_TPU_PRECOMPILE", "0")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: the suite compiles hundreds of programs in
# one process; the XLA CPU compiler has been observed to segfault on a
# late-suite compile after ~150 tests (LLVM state degradation — the same
# program compiles fine in a fresh process). With the cache, repeat runs
# deserialize instead of recompiling, which is both faster and avoids the
# fragile late-process compiles entirely.
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/glim_tpu_xla_cpu_tests"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


_prev_test_file = [None]


def pytest_runtest_setup(item):
    """Free compiled executables between test FILES.

    The XLA CPU runtime degrades after hundreds of in-process executable
    loads (observed: a reproducible SIGSEGV inside the JIT load path at
    ~test 154 regardless of which program loads there — both fresh compiles
    and persistent-cache deserializations crash, while the same test passes
    with any shorter prefix). Dropping executables at file boundaries keeps
    the loaded-executable count bounded; with the persistent cache the
    re-loads are deserializations, not recompiles."""
    fspath = str(item.fspath)
    if _prev_test_file[0] is not None and fspath != _prev_test_file[0]:
        jax.clear_caches()
    _prev_test_file[0] = fspath


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
