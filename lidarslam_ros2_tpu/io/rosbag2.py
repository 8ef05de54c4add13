"""rosbag2 (sqlite3) reader AND writer with a minimal CDR codec — no ROS.

Lets the framework replay the reference's demo bags (hdl_400, Tsukuba —
README.md:123-165) directly: reads the ``.db3`` schema (``topics`` +
``messages`` tables) and decodes ``sensor_msgs/msg/PointCloud2``,
``sensor_msgs/msg/Imu``, ``geometry_msgs/msg/PoseStamped`` and
``nav_msgs/msg/Odometry`` from XCDR1 little-endian payloads.

The writer covers the reference workflow's record side (``ros2 bag record``
README.md:129-134): corrected outputs and synthetic fixtures round-trip as
standard rosbag2 sqlite3 bags that real ROS 2 tooling can open.
"""

from __future__ import annotations

import sqlite3
import struct
from typing import Dict, Iterator, Optional, Tuple

import numpy as np


class CdrReader:
    """XCDR1 little-endian reader (the rosbag2 default encoding)."""

    def __init__(self, data: bytes):
        # 4-byte encapsulation header: {0x00, 0x01} = CDR_LE
        if len(data) < 4:
            raise ValueError("short CDR payload")
        self.data = data
        self.pos = 4

    def _align(self, size: int) -> None:
        rem = (self.pos - 4) % size
        if rem:
            self.pos += size - rem

    def _unpack(self, fmt: str, size: int):
        self._align(size)
        (v,) = struct.unpack_from("<" + fmt, self.data, self.pos)
        self.pos += size
        return v

    def u8(self):
        v = self.data[self.pos]
        self.pos += 1
        return v

    def b(self):
        return bool(self.u8())

    def i32(self):
        return self._unpack("i", 4)

    def u32(self):
        return self._unpack("I", 4)

    def f32(self):
        return self._unpack("f", 4)

    def f64(self):
        return self._unpack("d", 8)

    def string(self) -> str:
        n = self.u32()
        s = self.data[self.pos : self.pos + n - 1].decode("utf-8", errors="replace")
        self.pos += n
        return s

    def bytes_seq(self) -> bytes:
        n = self.u32()
        out = self.data[self.pos : self.pos + n]
        self.pos += n
        return out

    def f64_array(self, n: int) -> Tuple[float, ...]:
        self._align(8)
        out = struct.unpack_from(f"<{n}d", self.data, self.pos)
        self.pos += 8 * n
        return out

    def header(self) -> Dict:
        sec = self.i32()
        nsec = self.u32()
        frame = self.string()
        return {"stamp": sec + nsec * 1e-9, "frame_id": frame}


def decode_pointcloud2(data: bytes) -> Dict:
    r = CdrReader(data)
    header = r.header()
    height = r.u32()
    width = r.u32()
    n_fields = r.u32()
    fields = []
    for _ in range(n_fields):
        name = r.string()
        offset = r.u32()
        datatype = r.u8()
        count = r.u32()
        fields.append(
            {"name": name, "offset": offset, "datatype": datatype, "count": count}
        )
    is_bigendian = r.b()
    point_step = r.u32()
    row_step = r.u32()
    data_blob = r.bytes_seq()
    is_dense = r.b()
    return {
        "header": header,
        "height": height,
        "width": width,
        "fields": fields,
        "is_bigendian": is_bigendian,
        "point_step": point_step,
        "row_step": row_step,
        "data": data_blob,
        "is_dense": is_dense,
    }


def decode_imu(data: bytes) -> Dict:
    r = CdrReader(data)
    header = r.header()
    qx, qy, qz, qw = r.f64_array(4)
    r.f64_array(9)  # orientation covariance
    wx, wy, wz = r.f64_array(3)
    r.f64_array(9)
    ax, ay, az = r.f64_array(3)
    r.f64_array(9)
    return {
        "stamp": header["stamp"],
        "frame_id": header["frame_id"],
        "orientation": (qx, qy, qz, qw),
        "angular_velocity": (wx, wy, wz),
        "linear_acceleration": (ax, ay, az),
    }


def _decode_pose(r: CdrReader) -> np.ndarray:
    px, py, pz = r.f64_array(3)
    qx, qy, qz, qw = r.f64_array(4)
    from ..core import se3
    import jax.numpy as jnp

    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = np.asarray(
        se3.quat_to_matrix(jnp.asarray([qx, qy, qz, qw], dtype=jnp.float32))
    )
    T[:3, 3] = [px, py, pz]
    return T


def decode_pose_stamped(data: bytes) -> Dict:
    r = CdrReader(data)
    header = r.header()
    return {"stamp": header["stamp"], "frame_id": header["frame_id"],
            "pose": _decode_pose(r)}


def decode_odometry(data: bytes) -> Dict:
    r = CdrReader(data)
    header = r.header()
    child = r.string()
    pose = _decode_pose(r)
    return {"stamp": header["stamp"], "frame_id": header["frame_id"],
            "child_frame_id": child, "pose": pose}


_DECODERS = {
    "sensor_msgs/msg/PointCloud2": decode_pointcloud2,
    "sensor_msgs/msg/Imu": decode_imu,
    "geometry_msgs/msg/PoseStamped": decode_pose_stamped,
    "nav_msgs/msg/Odometry": decode_odometry,
}


class CdrWriter:
    """XCDR1 little-endian writer (mirror of :class:`CdrReader`)."""

    def __init__(self):
        # encapsulation header: CDR_LE + 2 options bytes
        self.buf = bytearray(b"\x00\x01\x00\x00")

    def _align(self, size: int) -> None:
        rem = (len(self.buf) - 4) % size
        if rem:
            self.buf += b"\x00" * (size - rem)

    def u8(self, v: int):
        self.buf.append(v & 0xFF)

    def b(self, v: bool):
        self.u8(1 if v else 0)

    def i32(self, v: int):
        self._align(4)
        self.buf += struct.pack("<i", v)

    def u32(self, v: int):
        self._align(4)
        self.buf += struct.pack("<I", v)

    def f64_array(self, vals):
        self._align(8)
        self.buf += struct.pack(f"<{len(vals)}d", *vals)

    def string(self, s: str):
        raw = s.encode("utf-8") + b"\x00"
        self.u32(len(raw))
        self.buf += raw

    def bytes_seq(self, data: bytes):
        self.u32(len(data))
        self.buf += data

    def header(self, stamp: float, frame_id: str):
        sec = int(stamp)
        self.i32(sec)
        self.u32(int(round((stamp - sec) * 1e9)))
        self.string(frame_id)

    def tobytes(self) -> bytes:
        return bytes(self.buf)


def encode_pointcloud2(msg: Dict) -> bytes:
    """PointCloud2 dict (xyzi_to_pointcloud2 format) -> CDR payload."""
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
    w.bytes_seq(bytes(msg["data"]))
    w.b(msg["is_dense"])
    return w.tobytes()


def encode_imu(msg: Dict) -> bytes:
    """Imu dict (decode_imu format) -> CDR payload (covariances zeroed)."""
    w = CdrWriter()
    w.header(msg["stamp"], msg.get("frame_id", "imu"))
    zeros9 = (0.0,) * 9
    w.f64_array(tuple(msg["orientation"]))
    w.f64_array(zeros9)
    w.f64_array(tuple(msg["angular_velocity"]))
    w.f64_array(zeros9)
    w.f64_array(tuple(msg["linear_acceleration"]))
    w.f64_array(zeros9)
    return w.tobytes()


_ENCODERS = {
    "sensor_msgs/msg/PointCloud2": encode_pointcloud2,
    "sensor_msgs/msg/Imu": encode_imu,
}


class Rosbag2Writer:
    """Write a standard rosbag2 sqlite3 bag (``ros2 bag record`` layout:
    ``topics`` + ``messages`` tables, CDR serialization)."""

    def __init__(self, db3_path: str):
        self.conn = sqlite3.connect(db3_path)
        self.conn.executescript(
            """
            CREATE TABLE schema(
              schema_version INTEGER PRIMARY KEY,
              ros_distro TEXT NOT NULL);
            CREATE TABLE metadata(
              id INTEGER PRIMARY KEY, metadata_version INTEGER NOT NULL,
              metadata TEXT NOT NULL);
            CREATE TABLE topics(
              id INTEGER PRIMARY KEY, name TEXT NOT NULL, type TEXT NOT NULL,
              serialization_format TEXT NOT NULL,
              offered_qos_profiles TEXT NOT NULL);
            CREATE TABLE messages(
              id INTEGER PRIMARY KEY, topic_id INTEGER NOT NULL,
              timestamp INTEGER NOT NULL, data BLOB NOT NULL);
            CREATE INDEX timestamp_idx ON messages (timestamp ASC);
            """
        )
        self.conn.execute(
            "INSERT INTO schema(schema_version, ros_distro) VALUES (3, 'humble')"
        )
        self._topic_ids: Dict[str, int] = {}
        self._topic_types: Dict[str, str] = {}

    def add_topic(self, name: str, msg_type: str) -> int:
        tid = len(self._topic_ids) + 1
        self.conn.execute(
            "INSERT INTO topics VALUES (?, ?, ?, 'cdr', '')",
            (tid, name, msg_type),
        )
        self._topic_ids[name] = tid
        self._topic_types[name] = msg_type
        return tid

    def write(self, topic: str, stamp: float, msg: Dict,
              msg_type: Optional[str] = None) -> None:
        """Encode + append one message. ``stamp`` is the bag receive time in
        seconds. New topics need ``msg_type`` on first write (or add_topic)."""
        if topic not in self._topic_ids:
            if msg_type is None:
                raise ValueError(f"unknown topic {topic!r}: pass msg_type")
            self.add_topic(topic, msg_type)
        msg_type = self._topic_types[topic]
        if msg_type not in _ENCODERS:
            raise ValueError(f"no CDR encoder for {msg_type!r}")
        blob = _ENCODERS[msg_type](msg)
        self.conn.execute(
            "INSERT INTO messages(topic_id, timestamp, data) VALUES (?, ?, ?)",
            (self._topic_ids[topic], int(round(stamp * 1e9)), blob),
        )

    def close(self):
        self.conn.commit()
        self.conn.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class Rosbag2Reader:
    """Iterate decoded messages from a rosbag2 ``.db3`` file in time order."""

    def __init__(self, db3_path: str):
        self.conn = sqlite3.connect(f"file:{db3_path}?mode=ro", uri=True)
        cur = self.conn.execute("SELECT id, name, type FROM topics")
        self.topics = {row[0]: (row[1], row[2]) for row in cur.fetchall()}

    def topic_names(self):
        return {name: typ for name, typ in self.topics.values()}

    def messages(
        self, topics: Optional[Tuple[str, ...]] = None
    ) -> Iterator[Tuple[str, float, Dict]]:
        """Yields (topic_name, bag_timestamp_sec, decoded_message)."""
        ids = [
            tid
            for tid, (name, typ) in self.topics.items()
            if (topics is None or name in topics) and typ in _DECODERS
        ]
        if not ids:
            return
        q = (
            "SELECT topic_id, timestamp, data FROM messages "
            f"WHERE topic_id IN ({','.join('?' * len(ids))}) ORDER BY timestamp"
        )
        for tid, ts, blob in self.conn.execute(q, ids):
            name, typ = self.topics[tid]
            yield name, ts * 1e-9, _DECODERS[typ](blob)

    def close(self):
        self.conn.close()
