"""Velocity suppressor extension.

Role model: glim_ext's velocity_suppressor ("constraints to regulate IMU
velocity") — a guard against velocity blow-ups from bad IMU calibration or
degenerate geometry. The reference injects per-frame velocity factors into
the odometry smoother through the callback surface; here the equivalent
quadratic term lives INSIDE the fused window step (zero extra dispatches,
traced weight — see ``window_estimator.window_scan_step`` ``vel_reg``),
and this module simply switches it on for the active odometry module via
``set_velocity_regulation`` the first time the smoother update fires.
"""

from __future__ import annotations

from glim_tpu.odometry.callbacks import OdometryEstimationCallbacks as OCB
from glim_tpu.utils.extension_module import ExtensionModule
from glim_tpu.utils.logging import create_module_logger
from glim_tpu.utils.registry import register_module

logger = create_module_logger("vel_sup")


class VelocitySuppressor(ExtensionModule):
    def __init__(self, max_velocity: float = 5.0, weight: float = 10.0):
        self.max_velocity = max_velocity
        self.weight = weight
        self.applied = False
        self._handle = OCB.on_smoother_update.add(self._on_smoother_update)

    def detach(self) -> None:
        if self._handle is not None:
            OCB.on_smoother_update.remove(self._handle)
            self._handle = None

    def _on_smoother_update(self, odometry_module, *args) -> None:
        if self.applied:
            return
        setter = getattr(odometry_module, "set_velocity_regulation", None)
        if setter is None:
            logger.warning("odometry module %s has no velocity regulation "
                           "hook; velocity_suppressor inactive",
                           type(odometry_module).__name__)
        else:
            setter(self.weight, self.max_velocity)
            logger.info("velocity regulation enabled: |v| <= %.1f m/s "
                        "(weight %.1f)", self.max_velocity, self.weight)
        self.applied = True


@register_module("extension", "velocity_suppressor")
def create_extension_module(*args, **kwargs):
    from glim_tpu.utils.config import GlobalConfig
    kw = {}
    try:
        cfg = GlobalConfig.instance()
        g = lambda k, d: cfg.param("velocity_suppressor", k, d)
        kw = dict(max_velocity=float(g("max_velocity", 5.0)),
                  weight=float(g("weight", 10.0)))
    except Exception:
        pass
    return VelocitySuppressor(**kw)
