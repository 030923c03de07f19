#!/usr/bin/env python
"""One-command demo: synthesize a sequence, run the full SLAM system, score
everything (the reference's README demo-run equivalent).

Usage: python scripts/run_demo.py [--workdir DIR] [--frames N] [--backend]
"""

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/denseslam_demo")
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--backend", action="store_true",
                    help="enable local BA + loop closing")
    args = ap.parse_args()

    data = os.path.join(args.workdir, "data")
    out = os.path.join(args.workdir, "out")
    os.makedirs(out, exist_ok=True)
    here = os.path.dirname(__file__)

    subprocess.run([sys.executable, os.path.join(here, "make_synthetic_dataset.py"),
                    data, "--frames", str(args.frames)], check=True)

    from denseslam_tpu.main import main as run

    cmd = [
        "--dataset_root", data,
        "--voxel_size", "0.05", "--max_depth", "10",
        "--table_slots_log2", "14", "--max_visible_log2", "12",
        "--voxel_decay", "--slide_window",
        "--save_trajectory", os.path.join(out, "traj_tum.txt"),
        "--save_kitti_trajectory", os.path.join(out, "traj_kitti.txt"),
        "--save_mesh", os.path.join(out, "scene.obj"),
        "--save_raycast_depth_dir", os.path.join(out, "raycast"),
        "--save_memory_log", os.path.join(out, "memory.txt"),
        "--metrics_json", os.path.join(out, "metrics.json"),
    ]
    if args.backend:
        cmd.append("--enable_backend")
    run(cmd)

    # score trajectory vs ground truth
    from denseslam_tpu.eval import traj_metrics
    from denseslam_tpu.io.trajectory import load_kitti

    est = load_kitti(os.path.join(out, "traj_kitti.txt"))
    gt = load_kitti(os.path.join(data, "poses_gt.txt"))[: len(est)]
    scores = dict(
        ate_rmse_m=traj_metrics.ate_rmse(est, gt), **traj_metrics.rpe(est, gt)
    )
    print("trajectory:", json.dumps(scores))
    with open(os.path.join(out, "trajectory_scores.json"), "w") as f:
        json.dump(scores, f)

    # score raycast depth vs GT dumps
    subprocess.run([
        sys.executable, os.path.join(here, "eval_raycast_depth.py"),
        os.path.join(out, "raycast"), os.path.join(data, "depth_gt"),
        "--no-crop", "--out", os.path.join(out, "depth_scores.json"),
    ], check=True)


if __name__ == "__main__":
    main()
