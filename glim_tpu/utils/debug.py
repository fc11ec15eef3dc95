"""Startup system diagnostics.

Equivalent role to the reference's ``print_system_info``
(reference: src/glim/util/debug.cpp:59-91 — build flags + CUDA device names):
reports the JAX/XLA stack, accelerator devices and memory, matmul precision,
native-runtime availability, and package version.
"""

from __future__ import annotations

from glim_tpu.utils.logging import create_module_logger

logger = create_module_logger("glim")


def system_info() -> dict:
    import jax

    import glim_tpu
    from glim_tpu.native import available as native_available

    devs = jax.devices()
    info = {
        "glim_tpu": glim_tpu.__version__,
        "jax": jax.__version__,
        "backend": jax.default_backend(),
        "devices": [str(d) for d in devs],
        "matmul_precision": str(jax.config.jax_default_matmul_precision),
        "native_runtime": native_available(),
    }
    try:
        stats = devs[0].memory_stats()
        if stats:
            info["hbm_limit_gb"] = round(stats.get("bytes_limit", 0) / 1e9, 2)
    except Exception:
        pass
    return info


def print_system_info() -> None:
    for k, v in system_info().items():
        logger.info("%s: %s", k, v)
