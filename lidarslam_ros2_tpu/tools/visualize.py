"""Offline visualization — the rviz-config equivalent.

The reference ships three rviz view configs (lidarslam/rviz/mapping.rviz,
mapping_tukuba.rviz, scanmatcher/rviz/mapping.rviz) showing /map, /path,
/modified_map, /modified_path with per-recipe colors and camera framing.
Headless here: render the aggregate map (top-down, height- or intensity-
colored) with the raw and corrected trajectories to a PNG; per-recipe view
configs live in ``viz/*.yaml`` (hdl_400 / tukuba / robot) and are consumed
via ``--view`` (also honored by ``tools.slam --live-every``).

    python -m lidarslam_ros2_tpu.tools.visualize --output out/ \
        --view viz/hdl_400.yaml
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def load_view(path: str) -> dict:
    """Load a viz/*.yaml per-recipe view config."""
    import yaml

    with open(path) as f:
        return yaml.safe_load(f) or {}


def render_map(
    map_xyzi: np.ndarray,
    path: np.ndarray | None = None,
    modified_path: np.ndarray | None = None,
    out_png: str = "map.png",
    max_points: int = 2_000_000,
    color_by: str = "z",
    modified_map: np.ndarray | None = None,
    current_pose: np.ndarray | None = None,
    view: dict | None = None,
) -> str:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    view = view or {}
    displays = view.get("displays", {})
    map_disp = displays.get("map", {})
    mod_disp = displays.get("modified_map", {})
    path_disp = displays.get("path", {})
    mpath_disp = displays.get("modified_path", {})
    pose_disp = displays.get("current_pose", {})
    color_by = map_disp.get("color_by", color_by)
    bg = view.get("background")

    pts = map_xyzi
    if len(pts) > max_points:
        pts = pts[:: len(pts) // max_points + 1]
    fig, ax = plt.subplots(figsize=(12, 12), dpi=120)
    if bg:
        ax.set_facecolor(bg)

    def scatter_cloud(p, disp, default_cmap="viridis"):
        mode = disp.get("color_by", "z")
        if mode == "none":
            ax.scatter(p[:, 0], p[:, 1], color=disp.get("color", "#FFFFFF"),
                       s=disp.get("point_size", 0.2), linewidths=0,
                       rasterized=True)
            return
        c = p[:, 3] if mode == "intensity" else p[:, 2]
        hi_cap = disp.get("max_intensity") if mode == "intensity" else None
        lo, hi = np.percentile(c, [2, 98]) if len(c) else (0, 1)
        if hi_cap is not None:
            hi = min(hi, hi_cap)
        ax.scatter(p[:, 0], p[:, 1], c=np.clip(c, lo, hi),
                   s=disp.get("point_size", 0.2), cmap=default_cmap,
                   linewidths=0, rasterized=True)

    scatter_cloud(pts, {**map_disp, "color_by": color_by})
    if modified_map is not None and len(modified_map) and mod_disp.get(
        "show", True
    ):
        mm = modified_map
        if len(mm) > max_points:
            mm = mm[:: len(mm) // max_points + 1]
        scatter_cloud(mm, mod_disp, default_cmap="magma")
    if path is not None and len(path):
        ax.plot(path[:, 0, 3], path[:, 1, 3], "-",
                color=path_disp.get("color", "#E66100"), lw=1.5,
                label="path")
    if (modified_path is not None and len(modified_path)
            and mpath_disp.get("show", True)):
        ax.plot(modified_path[:, 0, 3], modified_path[:, 1, 3], "-",
                color=mpath_disp.get("color", "#D41159"), lw=1.5,
                label="modified_path")
    if current_pose is not None:
        ax.plot([current_pose[0, 3]], [current_pose[1, 3]], "o",
                color=pose_disp.get("color", "#00FF00"), ms=8,
                label="current_pose")
    if ax.get_legend_handles_labels()[0]:
        ax.legend(loc="upper right")
    cam = view.get("view", {})
    if cam.get("distance"):
        cx, cy = cam.get("center", [0.0, 0.0])
        d = float(cam["distance"])
        ax.set_xlim(cx - d, cx + d)
        ax.set_ylim(cy - d, cy + d)
    ax.set_aspect("equal")
    ax.set_xlabel("x [m]")
    ax.set_ylabel("y [m]")
    ax.set_title(f"map ({len(map_xyzi):,} pts)")
    fig.tight_layout()
    fig.savefig(out_png)
    plt.close(fig)
    return out_png


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--output", default="slam_output",
                    help="directory produced by tools.slam")
    ap.add_argument("--png", default=None)
    ap.add_argument("--color-by", choices=["z", "intensity"], default="z")
    ap.add_argument("--view", default=None,
                    help="per-recipe view config (viz/hdl_400.yaml, "
                    "viz/tukuba.yaml, viz/robot.yaml — the reference's three "
                    "rviz files)")
    args = ap.parse_args(argv)

    from ..io.pcd import load_pcd

    map_pcd = os.path.join(args.output, "map.pcd")
    pts = load_pcd(map_pcd)
    path_f = os.path.join(args.output, "path.npy")
    mod_f = os.path.join(args.output, "modified_path.npy")
    path = np.load(path_f) if os.path.exists(path_f) else None
    mod = np.load(mod_f) if os.path.exists(mod_f) else None
    out = args.png or os.path.join(args.output, "map.png")
    view = load_view(args.view) if args.view else None
    print(render_map(pts, path, mod, out, color_by=args.color_by, view=view))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
