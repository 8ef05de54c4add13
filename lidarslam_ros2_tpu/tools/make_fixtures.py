"""Pre-stage the bench/test fixture scans into ``fixtures/scans/``.

The synthetic raymarch (utils/synthetic.py) costs ~2.7 s per VLP-16 scan on
a single host core; the driver always runs ``bench.py`` on a fresh image, so
regenerating the fixture courses there burned the whole round-3 bench budget
before any secondary section ran (BENCH_r03: "fixtures staged" at +483.6 s
against a 420 s budget). This tool generates every scan bench.py needs ONCE,
into the repo-committed pre-stage store that utils/synthetic.py consults
before its /tmp cache — version the outputs like golden files.

    python -m lidarslam_ros2_tpu.tools.make_fixtures [--out fixtures]

Regenerate (and re-commit) whenever ``_SIM_VERSION`` or any course parameter
in bench.py / utils/cpu_slam.py changes; stale keys are simply never read.
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def _stage_courses(scans_dir: str) -> int:
    """Generate every simulate_scan() call bench.py makes, with the cache
    pointed at the pre-stage dir (same key scheme — zero consumer changes)."""
    from ..utils import synthetic
    from ..utils.synthetic import (
        HDL64,
        VLP16,
        World,
        circle_trajectory,
        line_trajectory,
        simulate_scan,
    )

    synthetic._CACHE_DIR = scans_dir  # write side
    synthetic._PRESTAGE_DIR = scans_dir  # read side (idempotent reruns)
    n = 0

    # bench full_slam + ate_parity (+ tests/test_ate_parity.py via
    # cpu_slam.parity_setup): World(seed=7), VLP16 circle course, seeds 100+k
    world7 = World(seed=7)
    gt = circle_trajectory(97, radius=4.0)
    for k in range(97):
        simulate_scan(world7, gt[k], VLP16, noise=0.01, seed=100 + k)
        n += 1
        if k % 16 == 0:
            print(f"  course scan {k}/97", flush=True)

    # bench multistream (BASELINE config 5 run literally since r5):
    # World(seed=3), 64-beam KITTI-class line course at n_steps=48
    import bench

    world3 = World(seed=3)
    for k, pose in enumerate(
        line_trajectory(6, step=bench._MULTISTREAM_STEP)
    ):
        simulate_scan(world3, pose, HDL64, noise=0.01, seed=k, n_steps=48)
        n += 1
        print(f"  hdl64 frame {k}/6", flush=True)

    # the long_course scans are NOT pre-staged: they come from the exact-
    # geometry cast_scan (~0.24 s/scan, ~95 s for the 400-scan course) and
    # would add ~48 MB of npy to the repo for a one-and-a-half-minute save
    return n


def _stage_window(out_dir: str) -> None:
    """The headline-section VLP-32 window fixture (bench._vlp32_window).
    Built on the CPU platform so the stored arrays are deterministic and the
    bench never spends TPU budget on fixture voxelization."""
    import bench

    bench._FIXTURE_DIR = out_dir
    window, source, pose = bench._vlp32_window()
    print(
        f"  window fixture: {int(window.count())} window pts, "
        f"{int(source.count())} source pts"
    )


def main(argv=None) -> int:
    # fixture generation is a host job: force the CPU platform BEFORE any
    # backend initializes (the image's sitecustomize re-pins the remote TPU
    # at interpreter start, so the env var alone is defeated)
    import jax

    jax.config.update("jax_platforms", "cpu")

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default=None, help="fixtures dir (default: repo/fixtures)")
    args = ap.parse_args(argv)
    repo = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
    out = args.out or os.path.join(repo, "fixtures")
    scans_dir = os.path.join(out, "scans")
    os.makedirs(scans_dir, exist_ok=True)
    sys.path.insert(0, repo)  # for `import bench`

    t0 = time.perf_counter()
    n = _stage_courses(scans_dir)
    _stage_window(out)
    dt = time.perf_counter() - t0
    files = [f for f in os.listdir(scans_dir) if f.endswith(".npy")]
    size_mb = sum(
        os.path.getsize(os.path.join(scans_dir, f)) for f in files
    ) / 1e6
    print(
        f"staged {n} courses -> {len(files)} scan files, {size_mb:.1f} MB, "
        f"{dt:.0f}s"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
