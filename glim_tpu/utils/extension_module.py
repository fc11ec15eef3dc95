"""Extension module base + loader.

Equivalent surface to the reference's ``ExtensionModule``
(reference: include/glim/util/extension_module.hpp:10-42,
src/glim/util/extension_module.cpp:8-14): plugins attach to the global
callback slots; the pipeline polls ``needs_wait()`` for backpressure and
``ok()`` for health (a failing module requests system shutdown);
``at_exit(dump_path)`` fires on save. Loading replaces dlopen with the named
registry / "pkg.module:factory" import paths.
"""

from __future__ import annotations

from typing import List

from glim_tpu.utils.logging import create_module_logger
from glim_tpu.utils.registry import load_module

logger = create_module_logger("ext")


class ExtensionModule:
    def ok(self) -> bool:
        """False requests a system shutdown."""
        return True

    def needs_wait(self) -> bool:
        """True asks the pipeline to throttle input."""
        return False

    def at_exit(self, dump_path: str) -> None:
        pass

    @staticmethod
    def load_extensions(so_names: List[str]) -> List["ExtensionModule"]:
        out = []
        for name in so_names:
            mod = load_module("extension", name)
            if mod is not None:
                out.append(mod)
            else:
                logger.warning("extension module %s not available; skipped", name)
        return out
