#!/usr/bin/env python
"""Odometry accuracy experiment over sequences (reference:
scripts/odo_basic_exp.sh:24-70 — run seqs, dump trajectories, eval).

Runs the full pipeline per sequence directory, writes KITTI trajectories,
and when `poses_gt.txt` exists, scores ATE/RPE/KITTI errors.

Usage: python scripts/odo_exp.py SEQ_DIR [SEQ_DIR ...] --out OUT
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("seqs", nargs="+")
    ap.add_argument("--out", required=True)
    ap.add_argument("--frames", type=int, default=None)
    ap.add_argument("--compute_depth", action="store_true")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    from denseslam_tpu.eval import traj_metrics
    from denseslam_tpu.io.trajectory import load_kitti
    from denseslam_tpu.main import main as run

    summary = {}
    for seq in args.seqs:
        name = os.path.basename(os.path.normpath(seq))
        traj_path = os.path.join(args.out, f"{name}_traj.txt")
        cmd = [
            "--dataset_root", seq,
            "--save_kitti_trajectory", traj_path,
            "--metrics_json", os.path.join(args.out, f"{name}_metrics.json"),
            "--quiet",
        ]
        if args.frames:
            cmd += ["--frame_limit", str(args.frames)]
        if args.compute_depth:
            cmd += ["--compute_depth"]
        run(cmd)
        entry = {"trajectory": traj_path}
        gt_path = os.path.join(seq, "poses_gt.txt")
        if os.path.exists(gt_path):
            est = load_kitti(traj_path)
            gt = load_kitti(gt_path)[: len(est)]
            entry["ate_rmse_m"] = traj_metrics.ate_rmse(est, gt)
            entry.update(traj_metrics.rpe(est, gt))
            entry.update(traj_metrics.kitti_sequence_errors(est, gt))
        summary[name] = entry
        print(name, json.dumps(entry, default=str))
    with open(os.path.join(args.out, "odo_summary.json"), "w") as f:
        json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()
