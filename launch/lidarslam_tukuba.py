#!/usr/bin/env python
"""Tsukuba multi-km recipe — equivalent of lidarslam_tukuba.launch.py:
param/lidarslam_tukuba.yaml, /input_cloud remapped from /points_raw."""
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
                                        "param", "lidarslam_tukuba.yaml"),
               "--cloud-topic", "/points_raw"]
        )
    )
