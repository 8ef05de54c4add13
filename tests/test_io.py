"""IO edge: PointCloud2 codec + rosbag2/CDR reader round-trips."""

import sqlite3
import struct

import numpy as np

from lidarslam_ros2_tpu.io.pointcloud2 import pointcloud2_to_xyzi, xyzi_to_pointcloud2
from lidarslam_ros2_tpu.io.rosbag2 import (
    Rosbag2Reader,
    decode_imu,
    decode_pointcloud2,
)


class CdrWriter:
    """Test-side XCDR1 little-endian encoder (mirror of the reader)."""

    def __init__(self):
        self.buf = bytearray(b"\x00\x01\x00\x00")

    def _align(self, size):
        rem = (len(self.buf) - 4) % size
        if rem:
            self.buf += b"\x00" * (size - rem)

    def u8(self, v):
        self.buf.append(v & 0xFF)

    def b(self, v):
        self.u8(1 if v else 0)

    def i32(self, v):
        self._align(4)
        self.buf += struct.pack("<i", v)

    def u32(self, v):
        self._align(4)
        self.buf += struct.pack("<I", v)

    def f64(self, v):
        self._align(8)
        self.buf += struct.pack("<d", v)

    def string(self, s):
        raw = s.encode() + b"\x00"
        self.u32(len(raw))
        self.buf += raw

    def bytes_seq(self, data):
        self.u32(len(data))
        self.buf += data

    def header(self, stamp, frame):
        self.i32(int(stamp))
        self.u32(int((stamp % 1) * 1e9))
        self.string(frame)


def _encode_pointcloud2(msg) -> bytes:
    w = CdrWriter()
    w.header(msg["header"]["stamp"], msg["header"]["frame_id"])
    w.u32(msg["height"])
    w.u32(msg["width"])
    w.u32(len(msg["fields"]))
    for f in msg["fields"]:
        w.string(f["name"])
        w.u32(f["offset"])
        w.u8(f["datatype"])
        w.u32(f["count"])
    w.b(msg["is_bigendian"])
    w.u32(msg["point_step"])
    w.u32(msg["row_step"])
    w.bytes_seq(msg["data"])
    w.b(msg["is_dense"])
    return bytes(w.buf)


def _encode_imu(stamp, q, wvel, acc) -> bytes:
    w = CdrWriter()
    w.header(stamp, "imu_link")
    for v in q:
        w.f64(v)
    for _ in range(9):
        w.f64(0.0)
    for v in wvel:
        w.f64(v)
    for _ in range(9):
        w.f64(0.0)
    for v in acc:
        w.f64(v)
    for _ in range(9):
        w.f64(0.0)
    return bytes(w.buf)


def test_pointcloud2_roundtrip(rng):
    pts = rng.normal(size=(1000, 4)).astype(np.float32)
    msg = xyzi_to_pointcloud2(pts, stamp=1.5, frame_id="velodyne")
    back = pointcloud2_to_xyzi(msg)
    np.testing.assert_allclose(back, pts, atol=1e-6)


def test_pointcloud2_drops_nan_and_fills_intensity(rng):
    pts = rng.normal(size=(10, 3)).astype(np.float32)
    pts[3] = np.nan
    msg = xyzi_to_pointcloud2(pts)
    back = pointcloud2_to_xyzi(msg)
    assert back.shape == (9, 4)
    np.testing.assert_allclose(back[:, 3], 0.0)


def test_cdr_pointcloud2_decode(rng):
    pts = rng.normal(size=(64, 4)).astype(np.float32)
    msg = xyzi_to_pointcloud2(pts, stamp=7.25, frame_id="velodyne")
    blob = _encode_pointcloud2(msg)
    decoded = decode_pointcloud2(blob)
    assert decoded["header"]["frame_id"] == "velodyne"
    assert abs(decoded["header"]["stamp"] - 7.25) < 1e-6
    np.testing.assert_allclose(pointcloud2_to_xyzi(decoded), pts, atol=1e-6)


def test_cdr_imu_decode():
    blob = _encode_imu(3.5, (0.0, 0.0, 0.1, 0.995), (0.01, 0.02, 0.03), (0.1, 0.2, 9.8))
    m = decode_imu(blob)
    assert abs(m["stamp"] - 3.5) < 1e-6
    np.testing.assert_allclose(m["orientation"], (0.0, 0.0, 0.1, 0.995))
    np.testing.assert_allclose(m["angular_velocity"], (0.01, 0.02, 0.03))
    np.testing.assert_allclose(m["linear_acceleration"], (0.1, 0.2, 9.8))


def test_rosbag2_reader(tmp_path, rng):
    """Synthesize a rosbag2-format .db3 and replay it in time order."""
    db = str(tmp_path / "test.db3")
    conn = sqlite3.connect(db)
    conn.executescript(
        """
        CREATE TABLE topics(id INTEGER PRIMARY KEY, name TEXT, type TEXT,
                            serialization_format TEXT, offered_qos_profiles TEXT);
        CREATE TABLE messages(id INTEGER PRIMARY KEY, topic_id INTEGER,
                              timestamp INTEGER, data BLOB);
        """
    )
    conn.execute(
        "INSERT INTO topics VALUES (1, '/velodyne_points', "
        "'sensor_msgs/msg/PointCloud2', 'cdr', '')"
    )
    conn.execute(
        "INSERT INTO topics VALUES (2, '/imu', 'sensor_msgs/msg/Imu', 'cdr', '')"
    )
    pts = rng.normal(size=(32, 4)).astype(np.float32)
    for k in range(3):
        blob = _encode_pointcloud2(
            xyzi_to_pointcloud2(pts + k, stamp=k * 0.1, frame_id="velodyne")
        )
        conn.execute(
            "INSERT INTO messages VALUES (NULL, 1, ?, ?)", (int(k * 1e8), blob)
        )
    conn.execute(
        "INSERT INTO messages VALUES (NULL, 2, ?, ?)",
        (int(5e7), _encode_imu(0.05, (0, 0, 0, 1), (0, 0, 0), (0, 0, 9.81))),
    )
    conn.commit()
    conn.close()

    reader = Rosbag2Reader(db)
    assert reader.topic_names() == {
        "/velodyne_points": "sensor_msgs/msg/PointCloud2",
        "/imu": "sensor_msgs/msg/Imu",
    }
    msgs = list(reader.messages())
    assert len(msgs) == 4
    # time-ordered interleave: cloud, imu, cloud, cloud
    kinds = [name for name, _, _ in msgs]
    assert kinds == ["/velodyne_points", "/imu", "/velodyne_points", "/velodyne_points"]
    name, ts, m = msgs[0]
    np.testing.assert_allclose(pointcloud2_to_xyzi(m), pts, atol=1e-6)
    # topic filter
    only_imu = list(reader.messages(topics=("/imu",)))
    assert len(only_imu) == 1
    reader.close()
