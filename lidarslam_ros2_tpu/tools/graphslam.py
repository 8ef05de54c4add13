"""Standalone backend runner — the ``ros2 launch graph_based_slam
graphbasedslam.launch.py`` equivalent (reference
graph_based_slam/launch/graphbasedslam.launch.py): run loop detection + pose
adjustment over a recorded SLAM state instead of a live /map_array stream.

The input is a checkpoint written by tools/slam.py ``--checkpoint`` (the
MapArray is the reference's de-facto wire state, SURVEY.md §5.4). Replay mode
feeds the backend growing MapArray prefixes — each step reproduces exactly
one timer-driven searchLoop on the then-latest submap, i.e. the live
behavior of graph_based_slam_component.cpp:124-128.

    python -m lidarslam_ros2_tpu.tools.graphslam \
        --checkpoint state.npz --params param/graphbasedslam.yaml --output out/
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint", required=True, help="SLAM-state .npz")
    ap.add_argument("--params", default=None, help="reference-format yaml")
    ap.add_argument("--output", default="graphslam_output")
    ap.add_argument(
        "--single-shot",
        action="store_true",
        help="one searchLoop on the final submap only (skip prefix replay)",
    )
    args = ap.parse_args(argv)

    # same cache policy as tools/slam.py: opt in on TPU only
    import jax

    from .. import enable_compilation_cache

    if jax.default_backend() == "tpu":
        enable_compilation_cache()

    from ..api.config import load_yaml
    from ..core.map_array import MapArray
    from ..graph.backend import BackendConfig, GraphBasedSlam
    from ..io.checkpoint import load_checkpoint
    from ..io.pcd import save_pcd

    os.makedirs(args.output, exist_ok=True)
    if args.params:
        _, _, bcfg = load_yaml(args.params)
    else:
        bcfg = BackendConfig()
    bcfg = type(bcfg)(**{
        **bcfg.__dict__,
        "pose_graph_path": os.path.join(args.output, "pose_graph.g2o"),
        "map_pcd_path": os.path.join(args.output, "map.pcd"),
    })

    map_array, prior_edges = load_checkpoint(args.checkpoint)
    engine = GraphBasedSlam(bcfg)
    if prior_edges:
        engine.restore(map_array, prior_edges)

    n = len(map_array)
    found = []
    if args.single_shot:
        engine.receive_map_array(map_array)
        e = engine.search_loop()
        if e is not None:
            found.append(e)
    else:
        for k in range(2, n + 1):
            prefix = MapArray(cloud_coordinate=map_array.cloud_coordinate)
            prefix.submaps = list(map_array.submaps[:k])
            engine.receive_map_array(prefix)
            e = engine.search_loop()
            if e is not None:
                found.append(e)

    # /map_save over the full state writes the final corrected artifacts
    engine.receive_map_array(map_array)
    engine.map_save()
    if engine.modified_path is not None:
        np.save(os.path.join(args.output, "modified_path.npy"),
                engine.modified_path)
    if engine.modified_map_array is not None:
        save_pcd(os.path.join(args.output, "modified_map.pcd"),
                 engine.modified_map_array.global_cloud())
    summary = {
        "submaps": n,
        "prior_loop_edges": len(prior_edges),
        "new_loop_edges": len(found),
        "loop_pairs": [list(e.pair_id) for e in found],
    }
    with open(os.path.join(args.output, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
