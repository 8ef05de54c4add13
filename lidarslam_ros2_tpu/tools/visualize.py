"""Offline visualization — the rviz-config equivalent.

The reference ships rviz configs showing /map, /path, /modified_map,
/modified_path (lidarslam/rviz/mapping.rviz). Headless here: render the
aggregate map (top-down, height- or intensity-colored) with the raw and
corrected trajectories to a PNG.

    python -m lidarslam_ros2_tpu.tools.visualize --output out/  # after tools.slam
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def render_map(
    map_xyzi: np.ndarray,
    path: np.ndarray | None = None,
    modified_path: np.ndarray | None = None,
    out_png: str = "map.png",
    max_points: int = 2_000_000,
    color_by: str = "z",
) -> str:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    pts = map_xyzi
    if len(pts) > max_points:
        pts = pts[:: len(pts) // max_points + 1]
    fig, ax = plt.subplots(figsize=(12, 12), dpi=120)
    c = pts[:, 2] if color_by == "z" else pts[:, 3]
    lo, hi = np.percentile(c, [2, 98]) if len(c) else (0, 1)
    ax.scatter(
        pts[:, 0], pts[:, 1], c=np.clip(c, lo, hi), s=0.2, cmap="viridis",
        linewidths=0, rasterized=True,
    )
    if path is not None and len(path):
        ax.plot(path[:, 0, 3], path[:, 1, 3], "-", color="#E66100", lw=1.5,
                label="path")
    if modified_path is not None and len(modified_path):
        ax.plot(modified_path[:, 0, 3], modified_path[:, 1, 3], "-",
                color="#D41159", lw=1.5, label="modified_path")
    if (path is not None and len(path)) or (
        modified_path is not None and len(modified_path)
    ):
        ax.legend(loc="upper right")
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
    args = ap.parse_args(argv)

    from ..io.pcd import load_pcd

    map_pcd = os.path.join(args.output, "map.pcd")
    pts = load_pcd(map_pcd)
    path_f = os.path.join(args.output, "path.npy")
    mod_f = os.path.join(args.output, "modified_path.npy")
    path = np.load(path_f) if os.path.exists(path_f) else None
    mod = np.load(mod_f) if os.path.exists(mod_f) else None
    out = args.png or os.path.join(args.output, "map.png")
    print(render_map(pts, path, mod, out, color_by=args.color_by))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
