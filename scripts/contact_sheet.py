#!/usr/bin/env python
"""Offline viewer: render a run's map + trajectory into one contact sheet.

The headless stand-in for the reference's Pangolin GUI panes
(reference: src/DenseSLAM/DenseSLAMGUI.cpp:312-542 — raycast pane, depth
pane, trajectory/map pane, memory plot): loads a checkpoint, raycasts
color/normal/depth previews from the latest pose, and plots the trajectory
and memory curve into a single PNG.

Usage: python scripts/contact_sheet.py CKPT.npz OUT.png
       [--memory-log memory.txt] [--voxel-size V] [--width W --height H ...]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("out")
    ap.add_argument("--memory-log", default=None)
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--height", type=int, default=240)
    ap.add_argument("--baseline", type=float, default=0.3)
    ap.add_argument("--voxel-size", type=float, default=0.05)
    ap.add_argument("--max-depth", type=float, default=10.0)
    ap.add_argument("--table-log2", type=int, default=14)
    args = ap.parse_args()

    import dataclasses

    import jax.numpy as jnp
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    from denseslam_tpu.config import tiny_test_config
    from denseslam_tpu.io.checkpoint import load_slam_checkpoint
    from denseslam_tpu.models.dense_slam import DenseSLAM
    from denseslam_tpu.ops import raycast as rc_ops

    cfg = tiny_test_config(width=args.width, height=args.height,
                           baseline_m=args.baseline)
    cfg = dataclasses.replace(
        cfg,
        tsdf=dataclasses.replace(
            cfg.tsdf, voxel_size_m=args.voxel_size,
            trunc_dist_m=args.voxel_size * 4,
            table_slots=1 << args.table_log2,
            max_visible_blocks=1 << (args.table_log2 - 2),
            max_alloc_per_frame=1 << (args.table_log2 - 2),
            max_depth_m=args.max_depth,
        ),
    )
    slam = DenseSLAM(cfg)
    load_slam_checkpoint(args.ckpt, slam)

    T = jnp.asarray(slam.pose_history[-1][1]) if slam.pose_history \
        else jnp.eye(4, dtype=jnp.float32)
    rc = slam.raycast_view(T)

    fig, axes = plt.subplots(2, 3, figsize=(13, 7))
    axes[0, 0].imshow(np.asarray(rc_ops.render_preview(rc, "color")))
    axes[0, 0].set_title("raycast color")
    axes[0, 1].imshow(np.asarray(rc_ops.render_preview(rc, "normal")))
    axes[0, 1].set_title("normals")
    d = np.asarray(rc.depth)
    im = axes[0, 2].imshow(np.where(d > 0, d, np.nan), cmap="turbo")
    axes[0, 2].set_title("raycast depth (m)")
    fig.colorbar(im, ax=axes[0, 2], fraction=0.04)

    traj = np.stack([p[1][:3, 3] for p in slam.pose_history]) \
        if slam.pose_history else np.zeros((1, 3))
    axes[1, 0].plot(traj[:, 0], traj[:, 2], "-o", ms=2)
    axes[1, 0].set_title("trajectory (x-z)")
    axes[1, 0].axis("equal")
    axes[1, 0].grid(alpha=0.3)

    if args.memory_log and os.path.exists(args.memory_log):
        vals = [float(l) * 100 for l in open(args.memory_log) if l.strip()]
        axes[1, 1].plot(vals)
        axes[1, 1].set_title("map memory (MB)")
        axes[1, 1].grid(alpha=0.3)
    else:
        axes[1, 1].axis("off")

    axes[1, 2].axis("off")
    axes[1, 2].text(
        0.05, 0.7,
        f"frames: {slam.frame}\n"
        f"keyframes: {slam.current_keyframes}\n"
        f"blocks: {slam.submaps.local_map_size(slam.submaps.active_idx)}\n"
        f"map memory: {slam.memory_bytes()/1e6:.1f} MB",
        fontsize=11, family="monospace",
    )
    for ax in axes[0]:
        ax.set_xticks([])
        ax.set_yticks([])
    fig.tight_layout()
    fig.savefig(args.out, dpi=120)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
