#!/usr/bin/env python
"""Voxel-decay parameter sweep (reference: scripts/decay_exp.sh:10-42 —
decay weight/age sweep with memory + map-quality logging).

Runs the pipeline over a dataset for each (min_decay_age, max_decay_weight)
combination, recording the memory curve and final stats.

Usage: python scripts/decay_exp.py DATASET_ROOT OUT_DIR [--frames N]
"""

import argparse
import itertools
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("root")
    ap.add_argument("out")
    ap.add_argument("--frames", type=int, default=None)
    ap.add_argument("--ages", type=int, nargs="+", default=[10, 20, 30])
    ap.add_argument("--weights", type=float, nargs="+", default=[1, 2, 3])
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    from denseslam_tpu.main import main as run

    results = []
    for age, wgt in itertools.product(args.ages, args.weights):
        tag = f"decay_a{age}_w{wgt:g}"
        mj = os.path.join(args.out, f"{tag}.json")
        run([
            "--dataset_root", args.root,
            "--voxel_decay", "--min_decay_age", str(age),
            "--max_decay_weight", str(wgt),
            "--save_memory_log", os.path.join(args.out, f"memory_{tag}.txt"),
            "--metrics_json", mj, "--quiet",
        ] + (["--frame_limit", str(args.frames)] if args.frames else []))
        with open(mj) as f:
            m = json.load(f)
        m.update(min_decay_age=age, max_decay_weight=wgt)
        results.append(m)
        print(f"{tag}: blocks={m['final_blocks']} mem={m['final_memory_mb']:.1f}MB "
              f"fps={m['fps']:.2f}")
    # baseline without decay
    run([
        "--dataset_root", args.root,
        "--save_memory_log", os.path.join(args.out, "memory_baseline.txt"),
        "--metrics_json", os.path.join(args.out, "baseline.json"), "--quiet",
    ] + (["--frame_limit", str(args.frames)] if args.frames else []))
    with open(os.path.join(args.out, "sweep.json"), "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
