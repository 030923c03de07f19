#!/usr/bin/env python
"""Offline dataset downscaling tool (reference: scripts/scale_sequence.py —
produce a reduced-resolution copy of a sequence so the pipeline runs at low
res; the reference scales images + notes the intrinsics scaling that
`input_scale` applies at runtime).

Here the output is a fully self-consistent dataset directory: color/gray
images are area-resampled, depth maps are nearest-resampled (no value
change), disparity maps are nearest-resampled AND value-scaled by the factor
(disparity is measured in pixels), PFM disparities likewise, and KITTI
calib.txt P-matrices are rescaled (fx, fy, cx, cy, tx all multiply by the
factor, so the recovered baseline is unchanged).

Usage:
  python scripts/scale_sequence.py SRC_ROOT DST_ROOT --scale 0.5 \
      [--dataset_type kitti_odometry]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def scale_calib_kitti(src: str, dst: str, s: float) -> None:
    """Rescale all P0..P3 projection rows by s (pixel-unit entries only)."""
    out_lines = []
    with open(src) as f:
        for line in f:
            if ":" not in line:
                out_lines.append(line.rstrip("\n"))
                continue
            name, rest = line.split(":", 1)
            vals = rest.split()
            if name.strip().startswith("P") and len(vals) == 12:
                p = np.array([float(v) for v in vals]).reshape(3, 4)
                p[:2, :] *= s  # rows in pixel units: fx,0,cx,tx / 0,fy,cy,ty
                out_lines.append(
                    name + ": " + " ".join(f"{v:.12e}" for v in p.reshape(-1))
                )
            else:
                out_lines.append(line.rstrip("\n"))
    with open(dst, "w") as f:
        f.write("\n".join(out_lines) + "\n")


def resize(img: np.ndarray, s: float, nearest: bool) -> np.ndarray:
    import cv2

    h, w = img.shape[:2]
    nw, nh = max(1, int(round(w * s))), max(1, int(round(h * s)))
    interp = cv2.INTER_NEAREST if nearest else cv2.INTER_AREA
    return cv2.resize(img, (nw, nh), interpolation=interp)


def process_folder(src: str, dst: str, s: float, kind: str) -> int:
    """kind: 'color' | 'depth' | 'disparity'. Returns files written."""
    import cv2

    from denseslam_tpu.io import pfm

    if not os.path.isdir(src):
        return 0
    os.makedirs(dst, exist_ok=True)
    n = 0
    for fname in sorted(os.listdir(src)):
        sp, dp = os.path.join(src, fname), os.path.join(dst, fname)
        if fname.endswith(".pfm"):
            disp = np.asarray(pfm.read_pfm(sp), np.float32)
            out = resize(disp, s, nearest=True)
            if kind == "disparity":
                out = out * np.float32(s)
            pfm.write_pfm(dp, out)
            n += 1
            continue
        if not fname.lower().endswith((".png", ".jpg", ".jpeg")):
            continue
        img = cv2.imread(sp, cv2.IMREAD_UNCHANGED)
        if img is None:
            continue
        if kind == "color":
            out = resize(img, s, nearest=False)
        elif kind == "depth":
            out = resize(img, s, nearest=True)
        else:  # disparity png: pixel-valued — scale values too
            vals = resize(img.astype(np.float32), s, nearest=True) * s
            out = np.clip(np.rint(vals), 0, np.iinfo(img.dtype).max).astype(
                img.dtype
            )
        cv2.imwrite(dp, out)
        n += 1
    return n


def main() -> None:
    from denseslam_tpu.io.datasets import CONFIGS, DatasetType

    ap = argparse.ArgumentParser()
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("--scale", type=float, required=True)
    ap.add_argument(
        "--dataset_type",
        default="kitti_odometry",
        choices=[t.name.lower() for t in DatasetType],
    )
    args = ap.parse_args()
    s = args.scale
    assert 0.0 < s <= 1.0, "scale must be in (0, 1]"
    cfg = CONFIGS[DatasetType[args.dataset_type.upper()]]()

    total = 0
    for folder in (cfg.left_gray_folder, cfg.right_gray_folder,
                   cfg.left_color_folder, cfg.right_color_folder):
        if folder:
            total += process_folder(
                os.path.join(args.src, folder), os.path.join(args.dst, folder),
                s, "color")
    kind = "disparity" if cfg.depth_is_disparity else "depth"
    total += process_folder(
        os.path.join(args.src, cfg.depth_folder),
        os.path.join(args.dst, cfg.depth_folder), s, kind)

    calib = os.path.join(args.src, cfg.calibration_fname)
    if cfg.calibration_fname and os.path.exists(calib):
        scale_calib_kitti(
            calib, os.path.join(args.dst, cfg.calibration_fname), s)
    # TUM-style association / trajectory files copy through unchanged
    for meta in ("associate.txt", "rgb.txt", "depth.txt", "times.txt",
                 "poses_gt.txt", "groundtruth.txt"):
        mp = os.path.join(args.src, meta)
        if os.path.exists(mp):
            with open(mp) as f:
                data = f.read()
            with open(os.path.join(args.dst, meta), "w") as f:
                f.write(data)
    print(f"wrote {total} images at scale {s} -> {args.dst}")


if __name__ == "__main__":
    main()
