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

    def bundle_adjust(self, center, radius: float, mode: str = "plane",
                      submaps: Optional[List[int]] = None,
                      information_scale: float = 1e3,
                      max_points: int = 512) -> dict:
        """Region-pick bundle adjustment (reference BundleAdjustmentModal,
        bundle_adjustment_modal.cpp:17-60; collected into the graph at
        interactive_viewer.cpp:405-418): gather every submap's points
        inside the picked sphere, refine the involved poses with the
        plane/point eigenvalue-minimization factor
        (viewer/interactive_tools.py), and inject the refined relative
        poses as strong between factors — live via request_to_add_between
        on the running graph, offline applied + re-optimized. Returns the
        region's plane thickness (sqrt of the scatter's smallest
        eigenvalue) before/after as the flatness evidence."""
        from glim_tpu.viewer.interactive_tools import (BundleAdjustment,
                                                       PlaneSelection)
        gm = self.gm
        center = np.asarray(center, np.float64).reshape(3)
        sel: List[PlaneSelection] = []
        involved: List[int] = []
        for i, sm in enumerate(gm.submaps):
            if submaps is not None and i not in submaps:
                continue
            if sm.frame is None:
                continue
            T = np.asarray(gm.poses[i], np.float64)
            pts = np.asarray(sm.frame.points)[np.asarray(sm.frame.mask)]
            world = pts @ T[:3, :3].T + T[:3, 3]
            keep = np.linalg.norm(world - center, axis=1) < radius
            if keep.sum() >= 30:
                p = pts[keep]
                if len(p) > max_points:
                    p = p[:: len(p) // max_points + 1][:max_points]
                sel.append(PlaneSelection(submap_index=len(involved),
                                          points=p.astype(np.float32)))
                involved.append(i)
        if len(involved) < 2:
            return dict(ok=False,
                        error=f"region intersects {len(involved)} submap(s); "
                              "bundle adjustment needs at least 2")

        poses = [np.asarray(gm.poses[i], np.float64) for i in involved]

        def thickness(Ts):
            world = np.concatenate(
                [s.points @ np.asarray(T)[:3, :3].T + np.asarray(T)[:3, 3]
                 for s, T in zip(sel, Ts)])
            d = world - world.mean(axis=0)
            S = d.T @ d / len(world)
            ev = np.linalg.eigvalsh(S)
            return float(np.sqrt(max(ev[0], 0.0))) if mode == "plane" \
                else float(np.sqrt(max(ev.sum(), 0.0)))

        before = thickness(poses)
        ba = BundleAdjustment()
        refined = ba.optimize([gm.submaps[i] for i in involved], poses,
                              [sel], mode=mode)
        after = thickness(refined)
        if not all(np.all(np.isfinite(T)) for T in refined) \
                or after > before:
            return dict(ok=False, error="refinement did not improve "
                        f"flatness ({before:.4f} -> {after:.4f} m)")
        info = np.eye(6) * information_scale
        for a in range(len(involved) - 1):
            Z = np.linalg.inv(refined[a]) @ refined[a + 1]
            if self.live:
                CB.request_to_add_between(involved[a], involved[a + 1], Z,
                                          info)
            else:
                gm.add_between_factor(involved[a], involved[a + 1], Z, info)
        if not self.live:
            gm.optimize()
        logger.info("bundle_adjust (%s) over submaps %s: thickness "
                    "%.4f -> %.4f m (%d between factors %s)", mode, involved,
                    before, after, len(involved) - 1,
                    "requested on the live graph" if self.live
                    else "applied + re-optimized")
        return dict(ok=True, submaps=involved, mode=mode,
                    thickness_before_m=before, thickness_after_m=after,
                    factors_added=len(involved) - 1)

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
              {"cmd": "bundle_adjust", "center": [x, y, z], "radius": r,
               "mode"?: "plane"|"point", "submaps"?: [ids],
               "information_scale"?: s}
              {"cmd": "optimize"} | {"cmd": "find_loops", "min_overlap"?: f}
              {"cmd": "list"} | {"cmd": "factors"}
              {"cmd": "save", "path": P} | {"cmd": "ply", "path": P}
              {"cmd": "set_enabled", "target": "global_optimization"|
               "loop_detection", "value": bool} | {"cmd": "status"}

    Runtime module toggles (reference standard_viewer_ui.cpp enable/disable
    checkboxes): "global_optimization" gates the backend's per-insert
    optimize, "loop_detection" gates implicit-loop / candidate search in
    either backend. Playback control (pause/resume/step) is handled by the
    RUNNER's poller (tools/glim_runner.py), not here — it acts on the feed
    loop, which no graph object owns.
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
        if name == "bundle_adjust":
            return viewer.bundle_adjust(
                cmd["center"], float(cmd["radius"]),
                mode=cmd.get("mode", "plane"),
                submaps=cmd.get("submaps"),
                information_scale=float(cmd.get("information_scale", 1e3)))
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
        if name == "set_enabled":
            target = cmd.get("target")
            value = bool(cmd.get("value", True))
            gm = viewer.gm
            if target == "global_optimization":
                prev = gm.params.enable_optimization
                gm.params.enable_optimization = value
            elif target == "loop_detection":
                prev = getattr(gm, "loop_search_enabled", True)
                gm.loop_search_enabled = value
            else:
                return dict(ok=False, error=f"unknown target {target!r}")
            logger.info("set_enabled %s -> %s (was %s)", target, value, prev)
            return dict(ok=True, target=target, value=value, previous=prev)
        if name == "status":
            gm = viewer.gm
            return dict(
                ok=True, live=viewer.live, submaps=len(gm.submaps),
                global_optimization=gm.params.enable_optimization,
                loop_detection=getattr(gm, "loop_search_enabled", True))
        return dict(ok=False, error=f"unknown command {name!r}")
    except Exception as e:           # interactive input: report, never crash
        logger.warning("command %s failed: %s", name, e)
        return dict(ok=False, error=f"{type(e).__name__}: {e}")
