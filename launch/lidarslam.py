#!/usr/bin/env python
"""hdl_400 demo recipe — equivalent of lidarslam/launch/lidarslam.launch.py:
param/lidarslam.yaml, /input_cloud remapped from /velodyne_points.

    python launch/lidarslam.py --bag hdl_400.db3 [--output out/]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from lidarslam_ros2_tpu.tools.slam import main  # noqa: E402

if __name__ == "__main__":
    args = sys.argv[1:]
    raise SystemExit(
        main(
            args
            + ["--params", os.path.join(os.path.dirname(__file__), "..",
                                        "param", "lidarslam.yaml"),
               "--cloud-topic", "/velodyne_points"]
        )
    )
