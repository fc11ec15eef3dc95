"""keep_raw_points config wiring + interactive_viewer render hints.

Reference: config/config_ros.json:9 ("Keep raw points in the map (required
for only extension modules)") and config/config_viewer.json:23-39 (the
interactive viewer's own rendering-knob section).
"""

import json
import os

import numpy as np

from glim_tpu.pipeline import GlimTPU
from glim_tpu.types import PreprocessedFrame, RawPoints
from glim_tpu.utils.config import Config, create_default_config_dir


class _StubPreprocessor:
    def preprocess(self, raw):
        f = PreprocessedFrame(stamp=raw.stamp, scan_end_time=raw.stamp + 0.1,
                              k_neighbors=1, points=raw.points[:, :3],
                              raw_points=raw)
        return f


class _RecorderOdometry:
    def __init__(self):
        self.frames = []

    def insert_frame(self, frame, marginalized=None):
        self.frames.append(frame)
        return None

    def insert_imu(self, *a):
        pass


def _run_one_scan(cfg_dir):
    glim = GlimTPU(config_path=cfg_dir, async_mode=False)
    glim.preprocessor = _StubPreprocessor()
    rec = _RecorderOdometry()
    glim.odometry = rec
    raw = RawPoints(stamp=1.0,
                    points=np.random.default_rng(0).uniform(
                        -5, 5, size=(64, 3)))
    glim.insert_frame(raw)
    assert len(rec.frames) == 1
    return rec.frames[0]


class TestKeepRawPoints:
    def test_default_drops_raw_points(self, tmp_path):
        cfg_dir = create_default_config_dir(str(tmp_path / "cfg"))
        frame = _run_one_scan(cfg_dir)
        assert frame.raw_points is None

    def test_enabled_keeps_raw_points(self, tmp_path):
        cfg_dir = create_default_config_dir(str(tmp_path / "cfg"))
        path = os.path.join(cfg_dir, "config_ros.json")
        with open(path) as f:
            ros = json.load(f)
        ros["glim_ros"]["keep_raw_points"] = True
        with open(path, "w") as f:
            json.dump(ros, f)
        frame = _run_one_scan(cfg_dir)
        assert frame.raw_points is not None
        assert frame.raw_points.size == 64


class TestInteractiveViewerHints:
    def test_render_hints_from_config(self):
        from glim_tpu.viewer.offline_viewer import OfflineViewer
        cfg = Config({"interactive_viewer": {"point_size": 0.1,
                                             "points_alpha": 0.9}})
        v = OfflineViewer(config=cfg)
        assert v.render_hints["point_size"] == 0.1
        assert v.render_hints["points_alpha"] == 0.9
        # unset keys take the reference defaults (config_viewer.json:23-39)
        assert v.render_hints["factors_alpha"] == 0.5

    def test_defaults_without_config(self):
        from glim_tpu.viewer.offline_viewer import OfflineViewer
        v = OfflineViewer()
        assert v.render_hints["viewer_width"] == 2560
