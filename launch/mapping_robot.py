#!/usr/bin/env python
"""Mobile-robot recipe — equivalent of
scanmatcher/launch/mapping_robot.launch.py: standalone frontend with
param/mapping_robot.yaml, /input_cloud remapped from /velodyne_points,
/imu remapped from /gpsimu_driver/imu_data, identity base_link<-velodyne
static TF (the launch file's static_transform_publisher).

    python launch/mapping_robot.py --bag robot.db3 [--output out/]
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
                                        "param", "mapping_robot.yaml"),
               "--cloud-topic", "/velodyne_points",
               "--imu-topic", "/gpsimu_driver/imu_data",
               "--static-tf", "0 0 0 0 0 0 1",
               "--frontend-only"]
        )
    )
