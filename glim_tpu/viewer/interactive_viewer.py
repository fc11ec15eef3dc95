"""Interactive correction driver: the reference InteractiveViewer's
human-in-the-loop workflow (pick two submaps -> align -> inject a between
factor -> re-solve the graph) as a headless, scriptable surface.

Equivalent capability to reference src/glim/viewer/interactive_viewer.cpp
(run_modals :405-418 collects factors from the manual-loop-close / bundle-
adjustment modals and inserts them into the graph) and
interactive/manual_loop_close_modal.cpp:522-574 (BetweenFactor with
information = scale * GICP Hessian). The GUI picking loop is replaced by:

  * offline: ``InteractiveViewer.open(dump)`` -> ``loop_close(a, b)`` ->
    ``optimize()`` -> ``save()`` (driven by the REPL in
    tools/interactive_viewer.py);
  * live: ``InteractiveViewer(gm, live=True)`` issues the correction through
    the ``request_to_add_between`` callback slot, applied on the async
    global-mapping worker thread mid-run (glim_runner ``--commands`` or the
    watch.py ``POST /command`` hook feed this).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from glim_tpu.mapping.callbacks import GlobalMappingCallbacks as CB
from glim_tpu.utils.logging import create_module_logger
from glim_tpu.viewer.interactive_tools import (ManualLoopClose,
                                               ManualLoopCloseResult)

logger = create_module_logger("interactive")


class InteractiveViewer:
    """Correction workflow over a global map.

    ``live=False`` (offline): mutates ``global_mapping`` directly and
    re-optimizes inline — the dump-editing workflow.
    ``live=True``: reads submaps for alignment but injects the factor via
    ``GlobalMappingCallbacks.request_to_add_between`` so the async worker
    thread applies it between inserts (a correction issued while the
    pipeline runs lands in the running graph)."""

    def __init__(self, global_mapping=None, live: bool = False,
                 min_inlier_fraction: float = 0.3):
        self.gm = global_mapping
        self.live = live
        self.min_inlier_fraction = min_inlier_fraction
        self.mlc = ManualLoopClose()

    @classmethod
    def open(cls, dump_path: str, **kwargs) -> "InteractiveViewer":
        from glim_tpu.mapping.global_mapping import (GlobalMapping,
                                                     GlobalMappingParams)
        gm = GlobalMapping(GlobalMappingParams(enable_optimization=False))
        gm.load(dump_path)
        return cls(gm, live=False, **kwargs)

    # -- inspection --

    def submap_summaries(self) -> List[dict]:
        out = []
        for i, sm in enumerate(self.gm.submaps):
            T = np.asarray(self.gm.poses[i], np.float64)
            n = int(np.asarray(sm.frame.mask).sum()) \
                if sm.frame is not None and sm.frame.mask is not None else 0
            out.append(dict(id=i, x=float(T[0, 3]), y=float(T[1, 3]),
                            z=float(T[2, 3]), points=n))
        return out

    def factor_summary(self) -> dict:
        gm = self.gm
        return dict(
            submaps=len(gm.submaps),
            matching=len(getattr(gm, "matching_factors", [])),
            between=len(getattr(gm, "between_factors",
                                getattr(gm, "f_i", []))),
        )

    # -- correction --

    def loop_close(self, target: int, source: int, method: str = "GNC",
                   information_scale: float = 1.0,
                   from_current_estimate: bool = True,
                   ) -> Optional[ManualLoopCloseResult]:
        """Align two submaps and inject the between factor. Returns the
        alignment result, or None when the alignment was rejected (inlier
        fraction below ``min_inlier_fraction`` — the programmatic stand-in
        for the modal's human accept button)."""
        gm = self.gm
        if not (0 <= target < len(gm.submaps) and 0 <= source < len(gm.submaps)):
            raise IndexError("submap index out of range")
        T_init = None
        if from_current_estimate:
            T_init = np.linalg.inv(np.asarray(gm.poses[target], np.float64)) \
                @ np.asarray(gm.poses[source], np.float64)
        res = self.mlc.align(gm.submaps[target], gm.submaps[source],
                             method=method, T_init=T_init)
        if res.inlier_fraction < self.min_inlier_fraction or not \
                np.all(np.isfinite(res.T_target_source)):
            logger.warning("loop_close %d->%d rejected (inliers %.2f < %.2f)",
                           target, source, res.inlier_fraction,
                           self.min_inlier_fraction)
            return None
        info = information_scale * res.information \
            if res.information is not None else None
        if self.live:
            CB.request_to_add_between(target, source, res.T_target_source,
                                      info)
            logger.info("loop_close %d->%d requested on the live graph "
                        "(inliers %.2f)", target, source, res.inlier_fraction)
        else:
            gm.add_between_factor(target, source, res.T_target_source, info)
            gm.optimize()
            logger.info("loop_close %d->%d applied + re-optimized "
                        "(inliers %.2f)", target, source, res.inlier_fraction)
        return res

    def optimize(self) -> None:
        if self.live:
            CB.request_to_optimize()
        else:
            self.gm.optimize()

    def find_loops(self, min_overlap: float = 0.2) -> None:
        if self.live:
            CB.request_to_find_overlapping_submaps(min_overlap)
        else:
            self.gm.find_overlapping_submaps(min_overlap)
            self.gm.optimize()

    # -- persistence (offline only; live saves go through the async wrapper) --

    def save(self, path: str) -> None:
        self.gm.save(path)

    def export_ply(self, path: str) -> None:
        from glim_tpu.io.dump import export_ply
        export_ply(path, self.gm.export_points())


def execute_command(viewer: InteractiveViewer, cmd: dict) -> dict:
    """Execute one JSON command against a viewer (the shared dispatcher for
    the REPL, glim_runner --commands polling, and watch.py POST /command).

    Commands: {"cmd": "loop_close", "target": A, "source": B,
               "method"?: "GNC"|"RANSAC", "information_scale"?: s,
               "global_registration"?: bool}
              {"cmd": "optimize"} | {"cmd": "find_loops", "min_overlap"?: f}
              {"cmd": "list"} | {"cmd": "factors"}
              {"cmd": "save", "path": P} | {"cmd": "ply", "path": P}
    """
    name = cmd.get("cmd")
    try:
        if name == "loop_close":
            res = viewer.loop_close(
                int(cmd["target"]), int(cmd["source"]),
                method=cmd.get("method", "GNC"),
                information_scale=float(cmd.get("information_scale", 1.0)),
                from_current_estimate=not cmd.get("global_registration",
                                                  False))
            if res is None:
                return dict(ok=False, error="alignment rejected")
            return dict(ok=True, inlier_fraction=res.inlier_fraction,
                        T_target_source=np.asarray(
                            res.T_target_source).tolist())
        if name == "optimize":
            viewer.optimize()
            return dict(ok=True)
        if name == "find_loops":
            viewer.find_loops(float(cmd.get("min_overlap", 0.2)))
            return dict(ok=True)
        if name == "list":
            return dict(ok=True, submaps=viewer.submap_summaries())
        if name == "factors":
            return dict(ok=True, **viewer.factor_summary())
        if name == "save":
            viewer.save(cmd["path"])
            return dict(ok=True)
        if name == "ply":
            viewer.export_ply(cmd["path"])
            return dict(ok=True)
        return dict(ok=False, error=f"unknown command {name!r}")
    except Exception as e:           # interactive input: report, never crash
        logger.warning("command %s failed: %s", name, e)
        return dict(ok=False, error=f"{type(e).__name__}: {e}")
