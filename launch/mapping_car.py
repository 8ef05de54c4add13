#!/usr/bin/env python
"""Car/Autoware recipe — equivalent of scanmatcher/launch/mapping_car.launch.py:
param/mapping_car.yaml, /points_raw input, base_link->sensor static TF
'1.2 0 2.0' (the launch file's static_transform_publisher)."""
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
                                        "param", "mapping_car.yaml"),
               "--cloud-topic", "/points_raw",
               "--static-tf", "1.2 0 2.0 0 0 0 1"]
        )
    )
