#!/usr/bin/env python
"""Probe: isolate the dense-map quality error budget (VERDICT r2 item 3).

The 544-frame drive shows input SGM depth at AbsRel 0.013 but raycast
depth at AbsRel 0.25-0.41 — fusion/render/pose owns the gap. This probe
removes pose error entirely (fusion at GT poses) and splits the rest:

  A) GT pose + GT depth,  splat render   -> pure fusion+render error
  B) GT pose + SGM depth, splat render   -> + stereo-depth noise
  A_oracle) config A rendered by the reference-exact sphere-trace
     raycast (1 frame; 15+ s/frame)      -> splat-render error isolated

Same scene/config as scripts/long_drive_eval.py (full KITTI res, decay +
slide-window on, keyframe_every=4 fusion cadence, eval during the run).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

from denseslam_tpu.config import (SlideWindowParams, StereoConfig,
                                  SystemConfig, TsdfConfig,
                                  VoxelDecayParams)
from denseslam_tpu.eval import depth_metrics
from denseslam_tpu.io import synthetic
from denseslam_tpu.ops import raycast as rc_ops
from denseslam_tpu.ops import splat as splat_ops
from denseslam_tpu.ops import stereo as stereo_ops
from denseslam_tpu.ops import tsdf as tsdf_ops
from denseslam_tpu.utils.camera import Intrinsics, StereoRig


def main():
    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 160
    w, h = 1226, 370
    intr = Intrinsics(fx=707.09, fy=707.09, cx=(w - 1) / 2.0,
                      cy=(h - 1) / 2.0, width=w, height=h)
    rig = StereoRig(intr=intr, baseline_m=0.537)
    cfg = SystemConfig(
        rig=rig,
        tsdf=TsdfConfig(voxel_size_m=0.06, trunc_dist_m=0.24,
                        table_slots=1 << 17, max_visible_blocks=1 << 13,
                        max_alloc_per_frame=1 << 13, max_depth_m=40.0,
                        sampler="pallas"),
        stereo=StereoConfig(cost_dtype="bfloat16"),
        decay=VoxelDecayParams(enabled=True, min_decay_age=30,
                               max_decay_weight=2),
        slide_window=SlideWindowParams(enabled=True, max_age=60),
    )
    tc = cfg.tsdf
    sp = cfg.splat
    scfg = splat_ops.SplatConfig(
        max_blocks=sp.max_blocks, max_voxels=sp.max_voxels,
        surface_eta=sp.surface_eta, z_bits=sp.z_bits,
        fill_levels=sp.fill_levels)

    gt = synthetic.make_loop_trajectory(frames, radius_m=18.0,
                                        closure_frames=0)
    scene = synthetic.loop_scene(gt)

    @jax.jit
    def fuse(m, depth, gray, T):
        m, slots, live = tsdf_ops.allocate_for_frame(m, depth, T, intr, tc)
        m = tsdf_ops.integrate(m, slots, live, depth,
                               tsdf_ops.pack_gray(gray), T, intr, tc)
        m = tsdf_ops.decay_and_slide(m, cfg.decay.max_decay_weight,
                                     cfg.decay.min_decay_age,
                                     cfg.slide_window.max_age)
        return tsdf_ops.advance_frame(m)

    @jax.jit
    def splat(m, T):
        return splat_ops.splat_render(m, T, intr, tc, scfg)

    @jax.jit
    def sgm(l, r):
        return stereo_ops.compute_depth(l, r, rig, cfg.stereo,
                                        max_depth_m=tc.max_depth_m)

    def run(depth_source: str):
        m = tsdf_ops.make_map(tc)
        accs = []
        for t in range(0, frames, 4):          # keyframe_every=4 cadence
            T = jnp.asarray(gt[t])
            if depth_source == "gt":
                gray, depth = synthetic.render_view(T, intr, scene)
                depth = jnp.where(depth > tc.max_depth_m, 0.0, depth)
            else:
                l, r, _ = synthetic.render_stereo(T, rig, scene)
                gray = l
                depth, valid = sgm(l, r)
                depth = jnp.where(valid, depth, 0.0)
            m = fuse(m, depth, gray, T)
            if t and t % 24 == 0:              # eval during the run
                rc = splat(m, T)
                _, gtd = synthetic.render_view(T, intr, scene)
                g = np.array(gtd)
                g[g > tc.max_depth_m] = 0.0
                accs.append(depth_metrics.depth_metrics(
                    np.asarray(rc.depth), g, min_depth=0.5,
                    max_depth=tc.max_depth_m))
        agg = {k: float(np.nanmean([a[k] for a in accs])) for k in accs[0]}
        return m, agg

    t0 = time.perf_counter()
    m_gt, dm_a = run("gt")
    print(f"A  (GT pose + GT depth, splat): "
          f"{ {k: round(v, 4) for k, v in dm_a.items()} }", flush=True)
    _, dm_b = run("sgm")
    print(f"B  (GT pose + SGM depth, splat): "
          f"{ {k: round(v, 4) for k, v in dm_b.items()} }", flush=True)

    # oracle sphere-trace render of config A's final map, 1 frame
    t_eval = frames - 8
    T = jnp.asarray(gt[t_eval])
    rc = rc_ops.raycast(m_gt, T, intr, tc)
    _, gtd = synthetic.render_view(T, intr, scene)
    g = np.array(gtd)
    g[g > tc.max_depth_m] = 0.0
    dm_o = depth_metrics.depth_metrics(np.asarray(rc.depth), g,
                                       min_depth=0.5,
                                       max_depth=tc.max_depth_m)
    print(f"A_oracle (GT map, sphere-trace raycast, 1 frame @t={t_eval}): "
          f"{ {k: round(float(v), 4) for k, v in dm_o.items()} }",
          flush=True)
    # same frame with splat, for a like-for-like single-frame comparison
    rc_s = splat(m_gt, T)
    dm_s = depth_metrics.depth_metrics(np.asarray(rc_s.depth), g,
                                       min_depth=0.5,
                                       max_depth=tc.max_depth_m)
    print(f"A_splat  (same frame, splat):    "
          f"{ {k: round(float(v), 4) for k, v in dm_s.items()} }",
          flush=True)
    print(f"total {time.perf_counter() - t0:.1f} s")


if __name__ == "__main__":
    main()
