"""YAML config schema — same parameter names and file layout as the
reference's ROS 2 params (lidarslam/param/*.yaml; full tables README.md:73-121;
declaration sites scanmatcher_component.cpp:20-81 and
graph_based_slam_component.cpp:21-44). Defaults carry the CODE defaults, which
differ from the README in places (SURVEY.md section 5.6).

A reference user's YAML drops in unchanged:

    scan_matcher:
      ros__parameters:
        registration_method: "NDT"
        ndt_resolution: 2.0
        ...
    graph_based_slam:
      ros__parameters:
        ...
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import numpy as np
import yaml

from ..graph.backend import BackendConfig
from ..models.registration import GICPConfig, NDTConfig
from ..odometry.frontend import FrontendConfig

# TPU-irrelevant knobs accepted (and recorded) for drop-in compatibility:
# OpenMP thread counts are meaningless under XLA (SURVEY.md section 2.2 #17).
_IGNORED = {"ndt_num_threads"}


@dataclasses.dataclass
class NodeOptions:
    """Frontend node options that live outside the engine config."""

    global_frame_id: str = "map"
    robot_frame_id: str = "base_link"
    odom_frame_id: str = "odom"
    set_initial_pose: bool = False
    initial_pose: Optional[np.ndarray] = None
    publish_tf: bool = True
    map_publish_period: float = 15.0
    debug_flag: bool = False


def _initial_pose_matrix(p: Dict[str, Any]) -> np.ndarray:
    from ..core import se3
    import jax.numpy as jnp

    q = np.array(
        [
            p.get("initial_pose_qx", 0.0),
            p.get("initial_pose_qy", 0.0),
            p.get("initial_pose_qz", 0.0),
            p.get("initial_pose_qw", 1.0),
        ],
        dtype=np.float32,
    )
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = np.asarray(se3.quat_to_matrix(jnp.asarray(q)))
    T[:3, 3] = [
        p.get("initial_pose_x", 0.0),
        p.get("initial_pose_y", 0.0),
        p.get("initial_pose_z", 0.0),
    ]
    return T


def frontend_from_params(p: Dict[str, Any]) -> Tuple[FrontendConfig, NodeOptions]:
    """scan_matcher ros__parameters -> (FrontendConfig, NodeOptions)."""
    method = p.get("registration_method", "NDT")
    ndt = NDTConfig(
        resolution=float(p.get("ndt_resolution", 5.0)),
        # transformation_epsilon 0.01 hardcoded in the reference (:108)
        compute_fitness=bool(p.get("debug_flag", False)),
        voxel_capacity=int(p.get("ndt_voxel_capacity", 16384)),
        # extension beyond the reference: optional coarse-to-fine pyramid
        # (widens the basin under fast rotation; () = reference behavior)
        coarse_resolutions=tuple(
            float(r) for r in p.get("ndt_coarse_resolutions", ())
        ),
    )
    gicp = GICPConfig(
        max_correspondence_distance=float(p.get("gicp_corr_dist_threshold", 5.0)),
        compute_fitness=bool(p.get("debug_flag", False)),
    )
    cfg = FrontendConfig(
        registration_method=method,
        ndt=ndt,
        gicp=gicp,
        trans_for_mapupdate=float(p.get("trans_for_mapupdate", 1.5)),
        vg_size_for_input=float(p.get("vg_size_for_input", 0.2)),
        vg_size_for_map=float(p.get("vg_size_for_map", 0.1)),
        use_min_max_filter=bool(p.get("use_min_max_filter", False)),
        scan_min_range=float(p.get("scan_min_range", 0.1)),
        scan_max_range=float(p.get("scan_max_range", 100.0)),
        scan_period=float(p.get("scan_period", 0.1)),
        num_targeted_cloud=max(1, int(p.get("num_targeted_cloud", 10))),
        use_imu=bool(p.get("use_imu", False)),
        use_odom=bool(p.get("use_odom", False)),
        scan_capacity=int(p.get("scan_capacity", 65536)),
        input_capacity=int(p.get("input_capacity", 16384)),
        keyframe_capacity=int(p.get("keyframe_capacity", 16384)),
    )
    opts = NodeOptions(
        global_frame_id=p.get("global_frame_id", "map"),
        robot_frame_id=p.get("robot_frame_id", "base_link"),
        odom_frame_id=p.get("odom_frame_id", "odom"),
        set_initial_pose=bool(p.get("set_initial_pose", False)),
        initial_pose=_initial_pose_matrix(p),
        publish_tf=bool(p.get("publish_tf", True)),
        map_publish_period=float(p.get("map_publish_period", 15.0)),
        debug_flag=bool(p.get("debug_flag", False)),
    )
    return cfg, opts


def backend_from_params(p: Dict[str, Any]) -> BackendConfig:
    """graph_based_slam ros__parameters -> BackendConfig."""
    return BackendConfig(
        registration_method=p.get("registration_method", "NDT"),
        voxel_leaf_size=float(p.get("voxel_leaf_size", 0.2)),
        ndt=NDTConfig(
            resolution=float(p.get("ndt_resolution", 5.0)),
            max_iterations=100,  # hardcoded in the reference (:66)
            voxel_capacity=int(p.get("ndt_voxel_capacity", 16384)),
            coarse_resolutions=tuple(
                float(r) for r in p.get("ndt_coarse_resolutions", ())
            ),
        ),
        gicp=GICPConfig(
            max_correspondence_distance=30.0,  # hardcoded (:76)
            max_iterations=100,
        ),
        loop_detection_period=int(p.get("loop_detection_period", 1000)),
        threshold_loop_closure_score=float(p.get("threshold_loop_closure_score", 1.0)),
        distance_loop_closure=float(p.get("distance_loop_closure", 20.0)),
        range_of_searching_loop_closure=float(
            p.get("range_of_searching_loop_closure", 20.0)
        ),
        search_submap_num=int(p.get("search_submap_num", 3)),
        num_adjacent_pose_cnstraints=int(p.get("num_adjacent_pose_cnstraints", 5)),
        use_save_map_in_loop=bool(p.get("use_save_map_in_loop", True)),
        debug_flag=bool(p.get("debug_flag", False)),
    )


def load_yaml(path: str):
    """Load a reference-format params file.

    Returns (FrontendConfig, NodeOptions, BackendConfig); missing sections
    fall back to defaults.
    """
    with open(path) as f:
        doc = yaml.safe_load(f) or {}
    sm = (doc.get("scan_matcher") or {}).get("ros__parameters") or {}
    gb = (doc.get("graph_based_slam") or {}).get("ros__parameters") or {}
    for k in list(sm):
        if k in _IGNORED:
            sm.pop(k)
    for k in list(gb):
        if k in _IGNORED:
            gb.pop(k)
    fcfg, opts = frontend_from_params(sm)
    bcfg = backend_from_params(gb)
    return fcfg, opts, bcfg
