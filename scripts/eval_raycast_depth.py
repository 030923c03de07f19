#!/usr/bin/env python
"""Score raycast-depth dumps against ground-truth depth maps.

Functional equivalent of the reference's scripts/eval_raycast_depth.py
(:47-180): pairs PNG dumps with GT by filename, applies the crop and valid
mask, and reports MAE/RMSE/AbsRel/lg10/SqRel/delta metrics; can also score
the raw input depth for the raycast-vs-input comparison (the
`test_raycast_depth` switch at reference :67).

Usage:
  python scripts/eval_raycast_depth.py RAYCAST_DIR GT_DIR [--input-dir D]
      [--no-crop] [--out metrics.json]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def load_depth_png(path):
    import cv2

    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if img is None:
        raise IOError(path)
    return img.astype(np.float32) / 256.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("raycast_dir")
    ap.add_argument("gt_dir")
    ap.add_argument("--input-dir", default=None,
                    help="also score the raw input depth dumps")
    ap.add_argument("--no-crop", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from denseslam_tpu.eval import depth_metrics as dm

    names = sorted(
        n for n in os.listdir(args.raycast_dir)
        if n.endswith(".png") and os.path.exists(os.path.join(args.gt_dir, n))
    )
    if not names:
        print("no overlapping frames", file=sys.stderr)
        return 1

    def accumulate(src_dir):
        accs = []
        for n in names:
            pred = load_depth_png(os.path.join(src_dir, n))
            gt = load_depth_png(os.path.join(args.gt_dir, n))
            accs.append(dm.depth_metrics(pred, gt, crop=not args.no_crop))
        keys = [k for k in accs[0] if k != "n"]
        agg = {k: float(np.nanmean([a[k] for a in accs])) for k in keys}
        agg["frames"] = len(accs)
        return agg

    result = {"raycast": accumulate(args.raycast_dir)}
    if args.input_dir:
        result["input"] = accumulate(args.input_dir)
    print(json.dumps(result, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
