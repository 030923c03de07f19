#!/usr/bin/env python
"""Render the analytic synthetic scene into a KITTI-odometry folder layout.

The reference ships a mini KITTI demo sequence (reference: README.md:43-47);
this generates our equivalent fixture so every experiment script can run
without external data.

Usage: python scripts/make_synthetic_dataset.py OUT_DIR [--frames N]
       [--width W --height H --baseline B]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--height", type=int, default=240)
    ap.add_argument("--baseline", type=float, default=0.3)
    ap.add_argument("--step", type=float, default=0.05)
    ap.add_argument("--yaw", type=float, default=0.004)
    args = ap.parse_args()

    import cv2
    import jax
    # fixture generation is tiny — always render on CPU so this works
    # without a TPU (and doesn't queue behind the remote compile service)
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from denseslam_tpu.config import tiny_test_config
    from denseslam_tpu.io import datasets, pfm, synthetic, trajectory

    cfg = tiny_test_config(width=args.width, height=args.height,
                           baseline_m=args.baseline)
    ds = datasets.kitti_odometry_config()
    for sub in [ds.left_gray_folder, ds.right_gray_folder, ds.depth_folder]:
        os.makedirs(os.path.join(args.out, sub), exist_ok=True)
    poses = synthetic.make_trajectory(args.frames, step_m=args.step,
                                      yaw_rate=args.yaw)
    intr = cfg.rig.intr
    for i in range(args.frames):
        T = jnp.asarray(poses[i])
        left, right, depth = synthetic.render_stereo(T, cfg.rig)
        cv2.imwrite(os.path.join(args.out, ds.left_gray_folder, f"{i:06d}.png"),
                    np.asarray(left).astype(np.uint8))
        cv2.imwrite(os.path.join(args.out, ds.right_gray_folder, f"{i:06d}.png"),
                    np.asarray(right).astype(np.uint8))
        d = np.asarray(depth)
        disp = np.where(d > 0, intr.fx * cfg.rig.baseline_m / np.maximum(d, 1e-6), 0)
        pfm.write_pfm(os.path.join(args.out, ds.depth_folder, f"{i:06d}.pfm"),
                      disp.astype(np.float32))
        # ground-truth depth PNG (x256) for eval_raycast_depth
        gtdir = os.path.join(args.out, "depth_gt")
        os.makedirs(gtdir, exist_ok=True)
        cv2.imwrite(os.path.join(gtdir, f"{i:06d}.png"),
                    np.clip(d * 256.0, 0, 65535).astype(np.uint16))
    with open(os.path.join(args.out, "calib.txt"), "w") as f:
        f.write(f"P0: {intr.fx} 0 {intr.cx} 0  0 {intr.fy} {intr.cy} 0  0 0 1 0\n")
        f.write(f"P1: {intr.fx} 0 {intr.cx} {-intr.fx*cfg.rig.baseline_m}  "
                f"0 {intr.fy} {intr.cy} 0  0 0 1 0\n")
    trajectory.save_kitti(os.path.join(args.out, "poses_gt.txt"), list(poses))
    print(f"wrote {args.frames} frames to {args.out}")


if __name__ == "__main__":
    main()
