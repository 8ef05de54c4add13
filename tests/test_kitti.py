"""KITTI IO on synthesized sequence files."""

import os

import numpy as np

from lidarslam_ros2_tpu.io.kitti import KittiSequence, read_poses, read_velodyne_bin


def _make_sequence(tmp_path, n=4):
    seq = tmp_path / "00"
    (seq / "velodyne").mkdir(parents=True)
    rng = np.random.default_rng(0)
    scans = []
    for k in range(n):
        s = rng.normal(scale=10.0, size=(2000, 4)).astype(np.float32)
        s.tofile(str(seq / "velodyne" / f"{k:06d}.bin"))
        scans.append(s)
    # calib: cam0 <- velodyne with a translation + axis permutation
    Tr = np.array(
        [[0, -1, 0, 0.1], [0, 0, -1, -0.05], [1, 0, 0, 0.2]], dtype=np.float64
    )
    with open(seq / "calib.txt", "w") as f:
        f.write("P0: " + " ".join(["0"] * 12) + "\n")
        f.write("Tr: " + " ".join(f"{v:.9f}" for v in Tr.reshape(-1)) + "\n")
    # poses (camera frame)
    poses = tmp_path / "00.txt"
    rows = []
    for k in range(n):
        T = np.eye(4)
        T[0, 3] = 0.5 * k
        rows.append(" ".join(f"{v:.9f}" for v in T[:3, :4].reshape(-1)))
    poses.write_text("\n".join(rows) + "\n")
    return str(seq), str(poses), scans


def test_kitti_sequence_iteration(tmp_path):
    seq_dir, poses_file, scans = _make_sequence(tmp_path)
    seq = KittiSequence(seq_dir, poses_file)
    assert len(seq) == 4
    items = list(seq)
    np.testing.assert_allclose(items[0][0], 0.0)
    np.testing.assert_allclose(items[1][0], 0.1)  # 10 Hz
    np.testing.assert_allclose(items[2][1], scans[2])
    # gt poses transformed into the velodyne frame: relative translation along
    # camera x (0.5 m/frame) must be preserved in magnitude
    T0, T1 = items[0][2], items[1][2]
    rel = np.linalg.inv(T0) @ T1
    np.testing.assert_allclose(np.linalg.norm(rel[:3, 3]), 0.5, atol=1e-5)
    # rigid: orthonormal rotation
    R = T1[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)


def test_kitti_without_poses_or_calib(tmp_path):
    seq_dir, _, scans = _make_sequence(tmp_path)
    os.remove(os.path.join(seq_dir, "calib.txt"))
    seq = KittiSequence(seq_dir)
    items = list(seq)
    assert items[0][2] is None
    np.testing.assert_allclose(items[3][1], scans[3])


def test_read_velodyne_roundtrip(tmp_path):
    s = np.arange(40, dtype=np.float32).reshape(10, 4)
    p = str(tmp_path / "x.bin")
    s.tofile(p)
    np.testing.assert_allclose(read_velodyne_bin(p), s)
