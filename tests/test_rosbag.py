"""Pure-Python bag ingestion: CDR/ROS1 decode, ROS1 .bag, rosbag2, MCAP."""

import bz2
import os
import sqlite3
import struct
import zlib

import numpy as np

from glim_tpu.io import rosbag as rb


# ------------------------------------------------------ CDR test encoder

class CdrWriter:
    def __init__(self):
        self.buf = bytearray(b"\x00\x01\x00\x00")   # LE CDR encapsulation

    def _align(self, n):
        pay = len(self.buf) - 4
        r = pay % n
        if r:
            self.buf += b"\x00" * (n - r)

    def prim(self, fmt, size, v):
        self._align(size)
        self.buf += struct.pack("<" + fmt, v)

    def u8(self, v):
        self.prim("B", 1, v)

    def i32(self, v):
        self.prim("i", 4, v)

    def u32(self, v):
        self.prim("I", 4, v)

    def f64(self, v):
        self.prim("d", 8, v)

    def string(self, s):
        b = s.encode() + b"\x00"
        self.u32(len(b))
        self.buf += b

    def raw_seq(self, data):
        self.u32(len(data))
        self.buf += data

    def f64s(self, vals):
        for v in vals:
            self.f64(float(v))


def encode_pointcloud2(stamp, pts, times=None):
    w = CdrWriter()
    w.i32(int(stamp))
    w.u32(int((stamp % 1.0) * 1e9))
    w.string("lidar")
    n = len(pts)
    w.u32(1)          # height
    w.u32(n)          # width
    fields = [("x", 0, 7, 1), ("y", 4, 7, 1), ("z", 8, 7, 1)]
    step = 12
    if times is not None:
        fields.append(("t", 12, 7, 1))
        step = 16
    w.u32(len(fields))
    for name, off, dt, cnt in fields:
        w.string(name)
        w.u32(off)
        w.u8(dt)
        w.u32(cnt)
    w.u8(0)           # is_bigendian
    w.u32(step)       # point_step
    w.u32(step * n)   # row_step
    data = np.zeros((n, step // 4), np.float32)
    data[:, :3] = pts
    if times is not None:
        data[:, 3] = times
    w.raw_seq(data.tobytes())
    w.u8(1)           # is_dense
    return bytes(w.buf)


def encode_imu(stamp, acc, gyro):
    w = CdrWriter()
    w.i32(int(stamp))
    w.u32(int((stamp % 1.0) * 1e9))
    w.string("imu")
    w.f64s([0, 0, 0, 1])      # orientation
    w.f64s([0] * 9)
    w.f64s(gyro)
    w.f64s([0] * 9)
    w.f64s(acc)
    w.f64s([0] * 9)
    return bytes(w.buf)


def test_cdr_roundtrip_pointcloud2():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    times = np.linspace(0, 0.1, 100).astype(np.float32)
    msg = rb.decode_pointcloud2(encode_pointcloud2(12.25, pts, times))
    assert msg.width == 100 and msg.point_step == 16
    assert [f.name for f in msg.fields] == ["x", "y", "z", "t"]
    from glim_tpu.ros.cloud_converter import extract_raw_points
    raw = extract_raw_points(msg)
    assert np.allclose(raw.points[:, :3], pts, atol=1e-6)
    assert raw.times is not None
    assert abs(raw.stamp - 12.25) < 1e-6


def test_cdr_roundtrip_imu():
    msg = rb.decode_imu(encode_imu(3.5, [0.1, -0.2, 9.8], [0.01, 0.02, -0.03]))
    assert abs(msg.stamp - 3.5) < 1e-6
    assert np.allclose(msg.linear_acceleration, [0.1, -0.2, 9.8])
    assert np.allclose(msg.angular_velocity, [0.01, 0.02, -0.03])


# --------------------------------------------------------- bag fabricators

def make_db3(path, messages):
    conn = sqlite3.connect(path)
    conn.execute("CREATE TABLE topics(id INTEGER PRIMARY KEY, name TEXT, "
                 "type TEXT, serialization_format TEXT, "
                 "offered_qos_profiles TEXT)")
    conn.execute("CREATE TABLE messages(id INTEGER PRIMARY KEY, "
                 "topic_id INTEGER, timestamp INTEGER, data BLOB)")
    topics = {}
    for topic, typ, stamp_ns, payload in messages:
        if topic not in topics:
            tid = len(topics) + 1
            topics[topic] = tid
            conn.execute("INSERT INTO topics VALUES (?,?,?,?,?)",
                         (tid, topic, typ, "cdr", ""))
        conn.execute("INSERT INTO messages(topic_id, timestamp, data) "
                     "VALUES (?,?,?)", (topics[topic], stamp_ns, payload))
    conn.commit()
    conn.close()


def _mcap_record(op, body):
    return bytes([op]) + struct.pack("<Q", len(body)) + body


def _mcap_string(s):
    b = s.encode()
    return struct.pack("<I", len(b)) + b


def make_mcap(path, messages, compress=""):
    schemas = {}
    channels = {}
    inner = b""
    out = [b"\x89MCAP0\r\n"]
    header = _mcap_string("ros2") + _mcap_string("")
    out.append(_mcap_record(0x01, header))
    for topic, typ, stamp_ns, payload in messages:
        if typ not in schemas:
            sid = len(schemas) + 1
            schemas[typ] = sid
            body = struct.pack("<H", sid) + _mcap_string(typ) + \
                _mcap_string("ros2msg") + struct.pack("<I", 0)
            inner += _mcap_record(0x03, body)
        if topic not in channels:
            cid = len(channels) + 1
            channels[topic] = cid
            body = struct.pack("<H", cid) + struct.pack("<H", schemas[typ]) \
                + _mcap_string(topic) + _mcap_string("cdr") \
                + struct.pack("<I", 0)
            inner += _mcap_record(0x04, body)
        body = struct.pack("<H", channels[topic]) + struct.pack("<I", 0) \
            + struct.pack("<Q", stamp_ns) + struct.pack("<Q", stamp_ns) \
            + payload
        inner += _mcap_record(0x05, body)
    records = zlib.compress(inner) if compress == "zlib" else inner
    chunk = struct.pack("<QQQ", 0, 0, len(inner)) + struct.pack("<I", 0) \
        + _mcap_string(compress) + struct.pack("<Q", len(records)) + records
    out.append(_mcap_record(0x06, chunk))
    out.append(_mcap_record(0x02, struct.pack("<QQI", 0, 0, 0)))  # footer
    with open(path, "wb") as f:
        f.write(b"".join(out))


def _sample_messages(n_scans=3, n_imu=10):
    rng = np.random.default_rng(1)
    msgs = []
    for i in range(n_imu):
        t = 0.02 * i
        msgs.append(("/imu", "sensor_msgs/msg/Imu", int(t * 1e9),
                     encode_imu(t, [0, 0, 9.8], [0, 0, 0.1])))
    for i in range(n_scans):
        t = 0.1 * i
        pts = rng.normal(size=(50, 3)).astype(np.float32) * 5
        msgs.append(("/points", "sensor_msgs/msg/PointCloud2", int(t * 1e9),
                     encode_pointcloud2(t, pts,
                                        np.linspace(0, 0.1, 50))))
    return sorted(msgs, key=lambda m: m[2])


def test_rosbag2_db3_reader(tmp_path):
    db = os.path.join(tmp_path, "bag_0.db3")
    make_db3(db, _sample_messages())
    kinds = [k for k, _ in rb.iter_sensor_messages(db)]
    assert kinds.count("points") == 3
    assert kinds.count("imu") == 10
    topics = rb.bag_topics(str(tmp_path))   # directory dispatch
    assert topics["/points"][1] == 3


def test_mcap_reader_plain_and_zlib(tmp_path):
    for comp in ("", "zlib"):
        p = os.path.join(tmp_path, f"bag_{comp or 'raw'}.mcap")
        make_mcap(p, _sample_messages(), compress=comp)
        msgs = list(rb.iter_sensor_messages(p))
        assert len([1 for k, _ in msgs if k == "points"]) == 3
        pts_msgs = [m for k, m in msgs if k == "points"]
        assert pts_msgs[0].size == 50


# ------------------------------------------------- ROS1 .bag fabricator

class Ros1Writer:
    """ROS1 serialization test encoder: packed little-endian, no alignment,
    strings without null terminator."""

    def __init__(self):
        self.buf = bytearray()

    def u8(self, v):
        self.buf += struct.pack("<B", v)

    def i32(self, v):
        self.buf += struct.pack("<i", v)

    def u32(self, v):
        self.buf += struct.pack("<I", v)

    def f64(self, v):
        self.buf += struct.pack("<d", float(v))

    def f64s(self, vals):
        for v in vals:
            self.f64(v)

    def string(self, s):
        b = s.encode()
        self.u32(len(b))
        self.buf += b

    def raw_seq(self, data):
        self.u32(len(data))
        self.buf += data


def _ros1_header(w, stamp, frame):
    w.u32(0)                       # seq
    w.i32(int(stamp))
    w.u32(int((stamp % 1.0) * 1e9))
    w.string(frame)


def encode_pointcloud2_ros1(stamp, pts, times=None):
    w = Ros1Writer()
    _ros1_header(w, stamp, "lidar")
    n = len(pts)
    w.u32(1)
    w.u32(n)
    fields = [("x", 0, 7, 1), ("y", 4, 7, 1), ("z", 8, 7, 1)]
    step = 12
    if times is not None:
        fields.append(("t", 12, 7, 1))
        step = 16
    w.u32(len(fields))
    for name, off, dt, cnt in fields:
        w.string(name)
        w.u32(off)
        w.u8(dt)
        w.u32(cnt)
    w.u8(0)
    w.u32(step)
    w.u32(step * n)
    data = np.zeros((n, step // 4), np.float32)
    data[:, :3] = pts
    if times is not None:
        data[:, 3] = times
    w.raw_seq(data.tobytes())
    w.u8(1)
    return bytes(w.buf)


def encode_imu_ros1(stamp, acc, gyro):
    w = Ros1Writer()
    _ros1_header(w, stamp, "imu")
    w.f64s([0, 0, 0, 1])
    w.f64s([0] * 9)
    w.f64s(gyro)
    w.f64s([0] * 9)
    w.f64s(acc)
    w.f64s([0] * 9)
    return bytes(w.buf)


def _r1_field(name, value):
    b = name.encode() + b"=" + value
    return struct.pack("<I", len(b)) + b


def _r1_record(fields, data):
    header = b"".join(fields)
    return struct.pack("<I", len(header)) + header + \
        struct.pack("<I", len(data)) + data


def make_rosbag1(path, messages, compress="none"):
    """Fabricate a minimal ROS1 v2.0 bag: bag header, one chunk holding
    connection + message-data records."""
    conns = {}
    inner = b""
    for topic, typ, stamp_ns, payload in messages:
        typ1 = typ.replace("/msg/", "/")     # ROS1 type naming
        if topic not in conns:
            cid = len(conns)
            conns[topic] = cid
            conn_data = _r1_field("topic", topic.encode()) + \
                _r1_field("type", typ1.encode()) + \
                _r1_field("md5sum", b"0" * 32) + \
                _r1_field("message_definition", b"")
            inner += _r1_record(
                [_r1_field("op", b"\x07"),
                 _r1_field("conn", struct.pack("<I", cid)),
                 _r1_field("topic", topic.encode())], conn_data)
        sec, nsec = divmod(stamp_ns, 1_000_000_000)
        inner += _r1_record(
            [_r1_field("op", b"\x02"),
             _r1_field("conn", struct.pack("<I", conns[topic])),
             _r1_field("time", struct.pack("<II", sec, nsec))], payload)
    chunk_data = bz2.compress(inner) if compress == "bz2" else inner
    chunk = _r1_record(
        [_r1_field("op", b"\x05"),
         _r1_field("compression", compress.encode()),
         _r1_field("size", struct.pack("<I", len(inner)))], chunk_data)
    bag_header = _r1_record(
        [_r1_field("op", b"\x03"),
         _r1_field("index_pos", struct.pack("<Q", 0)),
         _r1_field("conn_count", struct.pack("<I", len(conns))),
         _r1_field("chunk_count", struct.pack("<I", 1))], b" " * 64)
    with open(path, "wb") as f:
        f.write(b"#ROSBAG V2.0\n" + bag_header + chunk)


def _sample_messages_ros1(n_scans=3, n_imu=10):
    rng = np.random.default_rng(1)
    msgs = []
    for i in range(n_imu):
        t = 0.02 * i
        msgs.append(("/imu", "sensor_msgs/Imu", int(t * 1e9),
                     encode_imu_ros1(t, [0, 0, 9.8], [0, 0, 0.1])))
    for i in range(n_scans):
        t = 0.1 * i
        pts = rng.normal(size=(50, 3)).astype(np.float32) * 5
        msgs.append(("/points", "sensor_msgs/PointCloud2", int(t * 1e9),
                     encode_pointcloud2_ros1(t, pts,
                                             np.linspace(0, 0.1, 50))))
    return sorted(msgs, key=lambda m: m[2])


def test_ros1_decode_roundtrip():
    rng = np.random.default_rng(2)
    pts = rng.normal(size=(40, 3)).astype(np.float32)
    msg = rb.decode_pointcloud2(
        encode_pointcloud2_ros1(7.5, pts, np.linspace(0, 0.1, 40)), "ros1")
    assert msg.width == 40 and msg.point_step == 16
    from glim_tpu.ros.cloud_converter import extract_raw_points
    raw = extract_raw_points(msg)
    assert np.allclose(raw.points[:, :3], pts, atol=1e-6)
    assert abs(raw.stamp - 7.5) < 1e-6
    imu = rb.decode_imu(encode_imu_ros1(2.25, [0.3, 0, 9.6], [0, 0.05, 0]),
                        "ros1")
    assert abs(imu.stamp - 2.25) < 1e-6
    assert np.allclose(imu.linear_acceleration, [0.3, 0, 9.6])
    assert np.allclose(imu.angular_velocity, [0, 0.05, 0])


def test_rosbag1_reader_plain_and_bz2(tmp_path):
    for comp in ("none", "bz2"):
        p = os.path.join(tmp_path, f"seq_{comp}.bag")
        make_rosbag1(p, _sample_messages_ros1(), compress=comp)
        msgs = list(rb.iter_sensor_messages(p))
        kinds = [k for k, _ in msgs]
        assert kinds.count("points") == 3
        assert kinds.count("imu") == 10
        pts_msgs = [m for k, m in msgs if k == "points"]
        assert pts_msgs[0].size == 50
        assert pts_msgs[0].times is not None
    topics = rb.bag_topics(p)
    assert topics["/points"] == ("sensor_msgs/PointCloud2", 3)


def test_rosbag1_converter_cli(tmp_path):
    bag = os.path.join(tmp_path, "seq.bag")
    make_rosbag1(bag, _sample_messages_ros1())
    out = os.path.join(tmp_path, "dataset")
    from glim_tpu.tools.bag_converter import main
    assert main([bag, out]) == 0
    from glim_tpu.tools.glim_runner import load_dataset
    imu, scans = load_dataset(out)
    assert len(scans) == 3
    assert imu.shape == (10, 7)


def test_bag_converter_cli(tmp_path):
    bag = os.path.join(tmp_path, "bag.mcap")
    make_mcap(bag, _sample_messages())
    out = os.path.join(tmp_path, "dataset")
    from glim_tpu.tools.bag_converter import main
    assert main([bag, out]) == 0
    from glim_tpu.tools.glim_runner import load_dataset
    imu, scans = load_dataset(out)
    assert len(scans) == 3
    assert imu.shape == (10, 7)
    assert scans[0][1].shape[1] >= 3
    assert scans[0][2] is not None   # per-point times preserved


def test_glim_runner_direct_bag_playback(tmp_path, monkeypatch):
    """glim_runner plays a bag directly (the reference's glim_rosbag,
    docs/quickstart.md:70-79) — detection + streaming dispatch, with the
    pipeline stubbed so the test exercises the runner, not the estimator."""
    from glim_tpu.tools import glim_runner

    bag = os.path.join(tmp_path, "bag.mcap")
    make_mcap(bag, _sample_messages())
    assert glim_runner._is_bag(bag)
    assert glim_runner._is_bag(str(tmp_path))        # dir containing the bag
    assert not glim_runner._is_bag(os.path.join(tmp_path, "nope"))

    calls = {"imu": 0, "acc": [], "frames": [], "images": [], "saved": []}

    class StubConfig:
        def get_config(self, name):
            return self

        def param(self, module, key, default=None):
            return default

    class StubGlim:
        def __init__(self, config_path=None, async_mode=True):
            self.config = StubConfig()

        def insert_imu(self, t, acc, gyro):
            calls["imu"] += 1
            calls["acc"].append(np.asarray(acc))

        def insert_image(self, t, image):
            calls["images"].append(image)

        def insert_frame(self, raw):
            calls["frames"].append(raw)

        def workload(self):
            return 0

        def ok(self):
            return True

        def wait(self):
            pass

        def save(self, path):
            calls["saved"].append(path)

    import glim_tpu.pipeline as pipeline_mod
    monkeypatch.setattr(pipeline_mod, "GlimTPU", StubGlim)
    glim_runner.main([bag, "--dump", str(tmp_path / "dump")])
    assert calls["imu"] == 10
    assert len(calls["frames"]) == 3
    assert calls["frames"][0].size == 50
    assert calls["saved"] == [str(tmp_path / "dump")]
