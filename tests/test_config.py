"""Config system tests (JSON-with-comments, typed params, SE3 traits, GlobalConfig)."""

import json
import os

import numpy as np
import pytest

from glim_tpu.utils.config import (Config, GlobalConfig, create_default_config_dir,
                                   se3_to_tum, strip_json_comments, tum_to_se3)
from glim_tpu.ops import lie_np


def test_strip_comments():
    text = '{ // line comment\n "a": 1, /* block */ "b": "he//llo" }'
    data = json.loads(strip_json_comments(text))
    assert data == {"a": 1, "b": "he//llo"}


def test_param_lookup():
    c = Config({"mod": {"x": 5, "nested": {"y": 2.5}}})
    assert c.param("mod", "x", 0) == 5
    assert c.param("mod", "missing", 7) == 7
    assert c.param("mod", "nested/y", 0.0) == 2.5
    assert c.param("mod/nested", "y", 0.0) == 2.5
    with pytest.raises(KeyError):
        c.param_required("mod", "nope")


def test_int_to_float_promotion():
    c = Config({"m": {"v": 3}})
    v = c.param("m", "v", 1.0)
    assert isinstance(v, float) and v == 3.0


def test_se3_tum_roundtrip(rng):
    T = lie_np.se3_exp(rng.normal(size=6))
    vec = se3_to_tum(T)
    np.testing.assert_allclose(tum_to_se3(vec), T, atol=1e-9)


def test_param_se3():
    c = Config({"sensors": {"T_lidar_imu": [1.0, 2.0, 3.0, 0.0, 0.0, 0.0, 1.0]}})
    T = c.param_se3("sensors", "T_lidar_imu")
    np.testing.assert_allclose(T[:3, 3], [1, 2, 3])
    np.testing.assert_allclose(T[:3, :3], np.eye(3))


def test_override_and_save(tmp_path):
    c = Config({"m": {"x": 1}})
    c.override_param("m", "x", 9)
    c.override_param("m", "deep/y", "z")
    assert c.param("m", "x", 0) == 9
    assert c.param("m", "deep/y", "") == "z"
    p = str(tmp_path / "out.json")
    c.save(p)
    assert json.load(open(p))["m"]["x"] == 9


def test_global_config_and_dump(tmp_path):
    cfg_dir = create_default_config_dir(str(tmp_path / "config"))
    GlobalConfig.reset()
    gc = GlobalConfig.instance(cfg_dir)
    pre = gc.get_config("config_preprocess")
    assert pre.param("preprocess", "random_downsample_target", 0) == 10000
    odo = gc.get_config("config_odometry")
    assert odo.param("odometry_estimation", "so_name", "") == "libodometry_estimation_gpu.so"

    dump_dir = str(tmp_path / "dump")
    gc.dump(dump_dir)
    assert os.path.exists(os.path.join(dump_dir, "config.json"))
    assert os.path.exists(os.path.join(dump_dir, "config_preprocess.json"))
    GlobalConfig.reset()
