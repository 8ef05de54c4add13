#!/usr/bin/env python
"""Standalone-backend recipe — equivalent of
graph_based_slam/launch/graphbasedslam.launch.py: graph_based_slam_node
alone with param/graphbasedslam.yaml, consuming a recorded SLAM state
(the MapArray checkpoint written by tools/slam.py --checkpoint) in place
of the live /map_array stream.

    python launch/graphbasedslam.py --checkpoint state.npz [--output out/]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from lidarslam_ros2_tpu.tools.graphslam import main  # noqa: E402

if __name__ == "__main__":
    args = sys.argv[1:]
    raise SystemExit(
        main(
            args
            + ["--params", os.path.join(os.path.dirname(__file__), "..",
                                        "param", "graphbasedslam.yaml")]
        )
    )
