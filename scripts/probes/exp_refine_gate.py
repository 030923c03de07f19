#!/usr/bin/env python
"""Measure where the subpixel match refinement actually pays (VERDICT r4
item 2): the round-4 VO hardening bought ATE 0.14 m but cost ~40% of
whole-system throughput (fps_steady 24.9 -> 14.7). The refinement runs
three patch-correlation legs on `refine_cap` compacted quads every frame;
this probe drives the SAME open-loop VO workload (loop drive, photometric
nuisance) under variants that cut legs/cap/patch, and records

  * open-loop KITTI t_err %  (the metric the r3 stack-drift showed up in),
  * per-frame translation error vs GT (median / p90),
  * valid-quad count stats (is refine_cap oversized?),

so the throughput lever can be chosen on accuracy evidence, not hope.
The reference's equivalent stage is CPU-cheap parabolic subpixel
(reference: src/libviso2/src/matcher.cpp:1384-1588) run on every match;
ours is more accurate but must be spent only where it pays.

Run on CPU: python scripts/probes/exp_refine_gate.py [--frames 150]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from denseslam_tpu.config import StereoConfig, SystemConfig, TsdfConfig
from denseslam_tpu.eval import traj_metrics
from denseslam_tpu.io import synthetic
from denseslam_tpu.models import frontend
from denseslam_tpu.utils.camera import Intrinsics, StereoRig


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=150)
    ap.add_argument("--loop-frames", type=int, default=500)
    ap.add_argument("--width", type=int, default=1226)
    ap.add_argument("--height", type=int, default=370)
    ap.add_argument("--radius", type=float, default=18.0)
    ap.add_argument("--photo-noise", type=float, default=2.0)
    ap.add_argument("--variants", default=None,
                    help="comma list to run (default: all)")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    w, h = args.width, args.height
    scale = w / 1226.0
    intr = Intrinsics(fx=707.09 * scale, fy=707.09 * scale,
                      cx=(w - 1) / 2.0, cy=(h - 1) / 2.0, width=w, height=h)
    rig = StereoRig(intr=intr, baseline_m=0.537)
    base_cfg = SystemConfig(rig=rig, tsdf=TsdfConfig(table_slots=1 << 10),
                            stereo=StereoConfig(max_disparity=64))

    n = args.frames
    gt_full = synthetic.make_loop_trajectory(args.loop_frames,
                                             radius_m=args.radius,
                                             closure_frames=44)
    scene = synthetic.loop_scene(gt_full)
    gt = gt_full[:n]

    @jax.jit
    def _noise(lg, rg, i):
        fi = jnp.asarray(i, jnp.float32)
        g = 1.0 + 0.15 * jnp.sin(2 * jnp.pi * fi / 150.0)
        k = jax.random.fold_in(jax.random.PRNGKey(0), i)
        kl, kr = jax.random.split(k)
        nl = args.photo_noise * jax.random.normal(kl, lg.shape, jnp.float32)
        nr = args.photo_noise * jax.random.normal(kr, rg.shape, jnp.float32)
        return jnp.clip(lg * g + nl, 0, 255), jnp.clip(rg * g + nr, 0, 255)

    print(f"rendering {n} frames...", flush=True)
    frames = []
    for base in range(0, n, 16):
        hi = min(base + 16, n)
        lg, rg, _ = synthetic.render_stereo_trajectory(gt[base:hi], rig,
                                                       scene)
        for i in range(hi - base):
            l, r = _noise(lg[i], rg[i], base + i)
            frames.append((np.asarray(l, np.float32),
                           np.asarray(r, np.float32)))

    VARIANTS = {
        "base":      dict(),
        "none":      dict(subpixel_refine=False),
        "temporal":  dict(refine_mode="temporal"),
        "cap384":    dict(refine_cap=384),
        "cap512":    dict(refine_cap=512),
        "temp384":   dict(refine_mode="temporal", refine_cap=384),
        "patch7":    dict(refine_patch=7),
    }
    if args.variants:
        keep = args.variants.split(",")
        VARIANTS = {k: v for k, v in VARIANTS.items() if k in keep}

    results = {}
    for name, over in VARIANTS.items():
        cfg = dataclasses.replace(
            base_cfg, frontend=dataclasses.replace(base_cfg.frontend, **over))
        step = jax.jit(lambda s, l, r: frontend.vo_step(s, l, r, cfg))
        state = frontend.init_frontend(cfg)
        est = []
        per_frame_err = []
        quads = []
        t0 = time.time()
        for i, (l, r) in enumerate(frames):
            state, out = step(state, jnp.asarray(l), jnp.asarray(r))
            est.append(np.asarray(out.T_wc, np.float64))
            quads.append(int(out.num_quads))
            if i > 0:
                # per-frame step error vs GT relative motion
                d_est = np.linalg.norm(np.asarray(out.T_delta)[:3, 3])
                T_rel = np.linalg.inv(gt[i]) @ gt[i - 1]
                d_gt = np.linalg.norm(T_rel[:3, 3])
                per_frame_err.append(abs(d_est - d_gt))
        wall = time.time() - t0
        gtl = [gt[i] for i in range(len(est))]
        # short segments: the default 100 m+ KITTI lengths never fit a
        # 150-frame (~34 m) probe path
        kitti = traj_metrics.kitti_sequence_errors(
            est, gtl, lengths=(10, 20, 30))
        ate = traj_metrics.ate_rmse(est, gtl)
        end_err = float(np.linalg.norm(est[-1][:3, 3] - gtl[-1][:3, 3]))
        pe = np.array(per_frame_err)
        rec = dict(
            t_err_pct=round(kitti["kitti_t_err_pct"], 4),
            ate_m=round(ate, 4), end_err_m=round(end_err, 4),
            step_err_mm_med=round(float(np.median(pe)) * 1e3, 2),
            step_err_mm_p90=round(float(np.percentile(pe, 90)) * 1e3, 2),
            quads_med=int(np.median(quads)), quads_p95=int(
                np.percentile(quads, 95)),
            wall_s=round(wall, 1),
        )
        results[name] = rec
        print(f"{name:10s} {json.dumps(rec)}", flush=True)

    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
