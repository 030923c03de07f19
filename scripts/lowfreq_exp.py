#!/usr/bin/env python
"""Fusion-frequency sweep (reference: scripts/lowfreq_exp.sh:19-55 — fuse
every k-th frame and measure map quality / runtime trade-off).

Usage: python scripts/lowfreq_exp.py DATASET_ROOT OUT_DIR [--ks 1 2 4]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("root")
    ap.add_argument("out")
    ap.add_argument("--ks", type=int, nargs="+", default=[1, 2, 4])
    ap.add_argument("--frames", type=int, default=None)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    from denseslam_tpu.main import main as run

    results = []
    for k in args.ks:
        mj = os.path.join(args.out, f"lowfreq_k{k}.json")
        cmd = [
            "--dataset_root", args.root,
            "--keyframe_every", str(k),
            "--save_raycast_depth_dir", os.path.join(args.out, f"raycast_k{k}"),
            "--metrics_json", mj, "--quiet",
        ]
        if args.frames:
            cmd += ["--frame_limit", str(args.frames)]
        run(cmd)
        with open(mj) as f:
            m = json.load(f)
        m["keyframe_every"] = k
        results.append(m)
        print(f"k={k}: fps={m['fps']:.2f} blocks={m['final_blocks']}")
    with open(os.path.join(args.out, "lowfreq_sweep.json"), "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
