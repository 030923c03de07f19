#!/usr/bin/env python
"""Basic experiments over KITTI *tracking* sequences (reference:
scripts/tracking_basic_exp.sh:17-75 — per-sequence runs sweeping the
regularization config, with conservative decay settings and unattended
frame-limited execution).

For every sequence directory and every regularization profile
(none / decay / slide-window / decay+slide-window) this runs the pipeline,
logs the memory curve, and collects trajectory + map stats into one
sweep.json.

Usage: python scripts/tracking_exp.py SEQ_DIR [SEQ_DIR ...] --out OUT
       [--frames N] [--min_decay_age 300] [--max_decay_weight 3]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

PROFILES = {
    "none": [],
    "decay": ["--voxel_decay"],
    "slide": ["--slide_window"],
    "decay_slide": ["--voxel_decay", "--slide_window"],
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("seqs", nargs="+")
    ap.add_argument("--out", required=True)
    ap.add_argument("--frames", type=int, default=None)
    ap.add_argument("--dataset_type", default="kitti_tracking")
    # conservative defaults per the reference's mostly-still-sequence
    # caution (tracking_basic_exp.sh:30-31)
    ap.add_argument("--min_decay_age", type=int, default=300)
    ap.add_argument("--max_decay_weight", type=float, default=3.0)
    ap.add_argument("--profiles", nargs="+", default=list(PROFILES),
                    choices=list(PROFILES))
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    from denseslam_tpu.main import main as run

    results = []
    for seq in args.seqs:
        name = os.path.basename(os.path.normpath(seq))
        for prof in args.profiles:
            tag = f"{name}_{prof}"
            mj = os.path.join(args.out, f"{tag}.json")
            argv = [
                "--dataset_root", seq,
                "--dataset_type", args.dataset_type,
                "--min_decay_age", str(args.min_decay_age),
                "--max_decay_weight", str(args.max_decay_weight),
                "--save_memory_log", os.path.join(args.out, f"memory_{tag}.txt"),
                "--save_kitti_trajectory",
                os.path.join(args.out, f"{tag}_traj.txt"),
                "--metrics_json", mj, "--quiet",
            ] + PROFILES[prof]
            if args.frames:
                argv += ["--frame_limit", str(args.frames)]
            run(argv)
            with open(mj) as f:
                m = json.load(f)
            m.update(sequence=name, profile=prof)
            results.append(m)
            print(f"{tag}: blocks={m['final_blocks']} "
                  f"mem={m['final_memory_mb']:.1f}MB fps={m['fps']:.2f}")
    with open(os.path.join(args.out, "sweep.json"), "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
