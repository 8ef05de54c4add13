"""Bag-format end-to-end: real CDR payloads through the full stack.

VERDICT r1 gap: every ATE claim rested on in-memory arrays — the rosbag2
reader + PointCloud2 codec had never fed the SLAM pipeline as one path.
These tests synthesize a genuine rosbag2 sqlite3 bag (XCDR1-encoded
PointCloud2 + Imu, written by io.rosbag2.Rosbag2Writer) and an MCAP file,
then replay them through tools/slam.py exactly like a reference user would
(`ros2 bag play` -> /velodyne_points). Real-bag (hdl_400/Tsukuba) ATE
remains open — no dataset is obtainable in this environment (PARITY.md).
"""

import json
import struct

import numpy as np

from lidarslam_ros2_tpu.io.mcap import McapReader, open_bag
from lidarslam_ros2_tpu.io.pointcloud2 import (
    pointcloud2_to_xyzi,
    xyzi_to_pointcloud2,
)
from lidarslam_ros2_tpu.io.rosbag2 import (
    Rosbag2Reader,
    Rosbag2Writer,
    encode_imu,
    encode_pointcloud2,
)
from lidarslam_ros2_tpu.utils.synthetic import (
    VLP16, World, line_trajectory, simulate_scan,
)

PC2 = "sensor_msgs/msg/PointCloud2"
IMU = "sensor_msgs/msg/Imu"


def test_rosbag2_writer_reader_roundtrip(tmp_path):
    path = str(tmp_path / "rt.db3")
    pts = np.arange(40, dtype=np.float32).reshape(10, 4)
    with Rosbag2Writer(path) as w:
        w.write("/velodyne_points", 1.5,
                xyzi_to_pointcloud2(pts, stamp=1.5, frame_id="velodyne"),
                msg_type=PC2)
        w.write("/imu", 1.51, {
            "stamp": 1.51, "frame_id": "imu",
            "orientation": (0.0, 0.0, 0.0, 1.0),
            "angular_velocity": (0.1, -0.2, 0.3),
            "linear_acceleration": (0.0, 0.0, 9.81),
        }, msg_type=IMU)

    r = Rosbag2Reader(path)
    assert r.topic_names() == {"/velodyne_points": PC2, "/imu": IMU}
    msgs = list(r.messages())
    assert [m[0] for m in msgs] == ["/velodyne_points", "/imu"]
    pc = msgs[0][2]
    assert pc["header"]["frame_id"] == "velodyne"
    assert abs(pc["header"]["stamp"] - 1.5) < 1e-9
    np.testing.assert_array_equal(pointcloud2_to_xyzi(pc), pts)
    imu = msgs[1][2]
    assert imu["angular_velocity"] == (0.1, -0.2, 0.3)
    assert imu["linear_acceleration"] == (0.0, 0.0, 9.81)


def _write_minimal_mcap(path, records_inline, records_chunked):
    """Hand-assemble an uncompressed MCAP: magic, header, inline records,
    one chunk holding `records_chunked`, footer, magic."""
    def rec(op, body):
        return bytes([op]) + struct.pack("<Q", len(body)) + body

    def s(x):
        raw = x.encode()
        return struct.pack("<I", len(raw)) + raw

    out = b"\x89MCAP0\r\n"
    out += rec(0x01, s("ros2") + s("test"))  # header: profile, library
    out += b"".join(rec(op, b) for op, b in records_inline)
    chunk_records = b"".join(rec(op, b) for op, b in records_chunked)
    chunk = (
        struct.pack("<QQQ", 0, 0, len(chunk_records))  # start/end/unc_size
        + struct.pack("<I", 0)  # crc (0 = absent)
        + s("")  # compression: none
        + struct.pack("<Q", len(chunk_records))
        + chunk_records
    )
    out += rec(0x06, chunk)
    out += rec(0x02, struct.pack("<QQI", 0, 0, 0))  # footer
    out += b"\x89MCAP0\r\n"
    with open(path, "wb") as f:
        f.write(out)


def test_mcap_reader(tmp_path):
    path = str(tmp_path / "rt.mcap")
    pts = np.arange(24, dtype=np.float32).reshape(6, 4) * 0.5
    pc_body = encode_pointcloud2(
        xyzi_to_pointcloud2(pts, stamp=2.0, frame_id="velodyne")
    )
    imu_body = encode_imu({
        "stamp": 2.01, "frame_id": "imu",
        "orientation": (0.0, 0.0, 0.0, 1.0),
        "angular_velocity": (1.0, 2.0, 3.0),
        "linear_acceleration": (0.0, 0.0, 9.81),
    })

    def s(x):
        raw = x.encode()
        return struct.pack("<I", len(raw)) + raw

    def schema(sid, name):
        return struct.pack("<H", sid) + s(name) + s("ros2msg") + struct.pack("<I", 0)

    def channel(cid, sid, topic):
        return (struct.pack("<HH", cid, sid) + s(topic) + s("cdr")
                + struct.pack("<I", 0))

    def message(cid, t_ns, data):
        return struct.pack("<HIQQ", cid, 0, t_ns, t_ns) + data

    _write_minimal_mcap(
        path,
        records_inline=[
            (0x03, schema(1, PC2)),
            (0x04, channel(1, 1, "/velodyne_points")),
            (0x05, message(1, 2_000_000_000, pc_body)),
        ],
        records_chunked=[
            (0x03, schema(2, "sensor_msgs/Imu")),  # short-form type name
            (0x04, channel(2, 2, "/imu")),
            (0x05, message(2, 2_010_000_000, imu_body)),
        ],
    )

    r = McapReader(path)
    assert r.topic_names()["/velodyne_points"] == PC2
    msgs = list(r.messages())
    assert len(msgs) == 2
    by_topic = {m[0]: m for m in msgs}
    np.testing.assert_array_equal(
        pointcloud2_to_xyzi(by_topic["/velodyne_points"][2]), pts
    )
    assert by_topic["/imu"][2]["angular_velocity"] == (1.0, 2.0, 3.0)
    assert abs(by_topic["/velodyne_points"][1] - 2.0) < 1e-9
    # the dispatcher picks the right reader by magic
    assert isinstance(open_bag(path), McapReader)


def test_bag_replay_end_to_end(tmp_path):
    """Full path: synthetic course -> real .db3 bag -> tools/slam.py
    (rosbag2 -> CDR -> PointCloud2 codec -> TF -> frontend) -> trajectory."""
    from lidarslam_ros2_tpu.tools.slam import main

    world = World(seed=13)
    gt = line_trajectory(6, step=0.4)
    bag = str(tmp_path / "course.db3")
    with Rosbag2Writer(bag) as w:
        for k, pose in enumerate(gt):
            scan = simulate_scan(world, pose, VLP16, noise=0.01, seed=k)
            w.write(
                "/velodyne_points", 0.1 * k,
                xyzi_to_pointcloud2(scan, stamp=0.1 * k, frame_id="velodyne"),
                msg_type=PC2,
            )

    params = tmp_path / "p.yaml"
    params.write_text(
        """
scan_matcher:
  ros__parameters:
    registration_method: "NDT"
    ndt_resolution: 2.0
    ndt_voxel_capacity: 8192
    trans_for_mapupdate: 1.0
    vg_size_for_input: 0.3
    vg_size_for_map: 0.15
    num_targeted_cloud: 5
    set_initial_pose: true
    initial_pose_z: 1.5
    scan_capacity: 16384
    input_capacity: 8192
    keyframe_capacity: 8192
"""
    )
    out = tmp_path / "out"
    rc = main([
        "--bag", bag, "--params", str(params), "--output", str(out),
        "--cloud-topic", "/velodyne_points", "--frontend-only",
        "--static-tf", "0 0 0 0 0 0 1",
    ])
    assert rc == 0
    summary = json.loads((out / "summary.json").read_text())
    assert summary["scans"] == len(gt)
    path = np.load(out / "path.npy")
    gt_t = np.stack(gt)[:, :3, 3]
    err = np.linalg.norm(path[:, :3, 3] - gt_t, axis=1)
    assert err.max() < 0.15, f"bag-replay trajectory error {err.max():.3f} m"
