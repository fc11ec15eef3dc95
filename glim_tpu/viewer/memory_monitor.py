"""Background memory monitor.

Equivalent behavior to the reference's ``MemoryMonitor``
(reference: src/glim/viewer/memory_monitor.cpp:13-125): a polling thread
reading /proc/meminfo and /proc/self/statm plus accelerator memory stats
(jax device memory_stats replaces cuda_mem_get_info), warning above 80%
usage and requesting shutdown via ``ok()`` when critically low.
"""

from __future__ import annotations

import threading
from typing import Dict, Optional

from glim_tpu.utils.extension_module import ExtensionModule
from glim_tpu.utils.logging import create_module_logger
from glim_tpu.utils.registry import register_module

logger = create_module_logger("mem")


def read_meminfo() -> Dict[str, int]:
    out = {}
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                parts = line.split()
                out[parts[0].rstrip(":")] = int(parts[1]) * 1024  # kB -> B
    except OSError:
        pass
    return out


def read_self_rss() -> int:
    try:
        with open("/proc/self/statm") as f:
            pages = int(f.read().split()[1])
        import resource
        return pages * resource.getpagesize()
    except OSError:
        return 0


def device_memory_stats() -> Optional[Dict]:
    try:
        import jax
        dev = jax.devices()[0]
        stats = dev.memory_stats()
        return stats if stats else None
    except Exception:
        return None


class MemoryMonitor(ExtensionModule):
    def __init__(self, interval: float = 5.0, warn_ratio: float = 0.8,
                 critical_ratio: float = 0.95):
        self.interval = interval
        self.warn_ratio = warn_ratio
        self.critical_ratio = critical_ratio
        self._critical = False
        self._stop = threading.Event()
        self.thread = threading.Thread(target=self._run, daemon=True)
        self.thread.start()

    def ok(self) -> bool:
        return not self._critical

    def stop(self) -> None:
        self._stop.set()

    def _run(self) -> None:
        while not self._stop.wait(self.interval):
            info = read_meminfo()
            total = info.get("MemTotal", 0)
            avail = info.get("MemAvailable", 0)
            if total:
                used_ratio = 1.0 - avail / total
                if used_ratio > self.critical_ratio:
                    logger.error("host memory critical: %.0f%% used", used_ratio * 100)
                    self._critical = True
                elif used_ratio > self.warn_ratio:
                    logger.warning("host memory high: %.0f%% used (rss %.1f GB)",
                                   used_ratio * 100, read_self_rss() / 1e9)
            dstats = device_memory_stats()
            if dstats:
                in_use = dstats.get("bytes_in_use", 0)
                limit = dstats.get("bytes_limit", 0)
                if limit and in_use / limit > self.warn_ratio:
                    logger.warning("device HBM high: %.0f%% of %.1f GB",
                                   100 * in_use / limit, limit / 1e9)


@register_module("extension", "memory_monitor")
def create_memory_monitor(*args, **kwargs):
    return MemoryMonitor()
