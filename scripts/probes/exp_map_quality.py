#!/usr/bin/env python
"""Probe: isolate the dense-map quality error budget (VERDICT r2 item 3).

The 544-frame drive shows input SGM depth at AbsRel 0.013 but raycast
depth at AbsRel 0.25-0.41 — fusion/render/pose owns the gap. This probe
removes pose error entirely (fusion at GT poses) and splits the rest:

  A) GT pose + GT depth,  splat render   -> pure fusion+render error
  B) GT pose + SGM depth, splat render   -> + stereo-depth noise
  A_oracle) config A's map rendered by the reference-exact sphere-trace
     raycast (1 frame; 15+ s/frame)      -> splat-render error isolated

Same scene/config as scripts/long_drive_eval.py (full KITTI res, decay +
slide-window on, keyframe_every=4 cadence, eval during the run). Fusion
runs through `fuse_sequence` batches (the production scan path — a
standalone per-frame fuse jit wedges the remote compiler for 45+ min;
scan-form programs compile fine).
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
from denseslam_tpu.models.dense_slam import fuse_sequence, make_fusion_db
from denseslam_tpu.ops import raycast as rc_ops
from denseslam_tpu.ops import splat as splat_ops
from denseslam_tpu.ops import stereo as stereo_ops
from denseslam_tpu.ops import tsdf as tsdf_ops
from denseslam_tpu.utils.camera import Intrinsics, StereoRig

BATCH = 8   # keyframes per fuse_sequence dispatch


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
    import dataclasses
    cfg = dataclasses.replace(
        cfg, pipeline=dataclasses.replace(cfg.pipeline,
                                          fusion_db_capacity=8))
    tc = cfg.tsdf
    sp = cfg.splat
    scfg = splat_ops.SplatConfig(
        max_blocks=sp.max_blocks, max_voxels=sp.max_voxels,
        surface_eta=sp.surface_eta, z_bits=sp.z_bits,
        fill_levels=sp.fill_levels)

    gt = synthetic.make_loop_trajectory(frames, radius_m=18.0,
                                        closure_frames=0)
    scene = synthetic.loop_scene(gt)

    fuse_batch = jax.jit(
        lambda m, db, d, g, T, f: fuse_sequence(m, db, d, g, T, f, cfg),
        donate_argnums=(0, 1),
    )

    @jax.jit
    def splat(m, T):
        return splat_ops.splat_render(m, T, intr, tc, scfg)

    @jax.jit
    def sgm(l, r):
        return stereo_ops.compute_depth(l, r, rig, cfg.stereo,
                                        max_depth_m=tc.max_depth_m)

    kf_ts = list(range(0, frames, 4))          # keyframe_every=4 cadence

    def run(depth_source: str):
        m = tsdf_ops.make_map(tc)
        db = make_fusion_db(cfg)
        accs = []
        for b0 in range(0, len(kf_ts) - BATCH + 1, BATCH):
            ts = kf_ts[b0: b0 + BATCH]
            Ts = jnp.asarray(np.stack([gt[t] for t in ts]))
            if depth_source == "gt":
                grays, depths = synthetic.render_trajectory(
                    np.stack([gt[t] for t in ts]), intr, scene)
                depths = jnp.where(depths > tc.max_depth_m, 0.0, depths)
            else:
                l, r, _ = synthetic.render_stereo_trajectory(
                    np.stack([gt[t] for t in ts]), rig, scene)
                dd, vv = jax.vmap(sgm)(l, r)
                grays = l
                depths = jnp.where(vv, dd, 0.0)
            fids = jnp.asarray(ts, jnp.int32)
            m, db = fuse_batch(m, db, depths, grays, Ts, fids)
            # eval during the run at the batch's last keyframe pose
            t = ts[-1]
            rc = splat(m, jnp.asarray(gt[t]))
            _, gtd = synthetic.render_view(jnp.asarray(gt[t]), intr, scene)
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
    t_eval = kf_ts[-4]
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
    rc_s = splat(m_gt, T)
    dm_s = depth_metrics.depth_metrics(np.asarray(rc_s.depth), g,
                                       min_depth=0.5,
                                       max_depth=tc.max_depth_m)
    print(f"A_splat  (same frame, splat):    "
          f"{ {k: round(float(v), 4) for k, v in dm_s.items()} }",
          flush=True)

    # ---- renderer lever sweep on the same map/frame --------------------
    def show(name, d):
        dm = depth_metrics.depth_metrics(np.asarray(d), g, min_depth=0.5,
                                         max_depth=tc.max_depth_m)
        print(f"{name}: absrel={dm['absrel']:.4f} mae={dm['mae']:.3f} "
              f"d1_25={dm['d1_25']:.3f} cov={dm['coverage']:.3f} "
              f"sqrel={dm['sqrel']:.3f}", flush=True)

    nofill = splat_ops.SplatConfig(
        max_blocks=sp.max_blocks, max_voxels=sp.max_voxels,
        surface_eta=sp.surface_eta, z_bits=sp.z_bits, fill_levels=0)
    rc_nf = jax.jit(lambda m, T: splat_ops.splat_render(
        m, T, intr, tc, nofill))(m_gt, T)
    show("A_nofill (fill_levels=0)       ", rc_nf.depth)

    for steps, prune in ((2, 0.0), (2, 0.5), (3, 0.3)):
        d_r = jax.jit(lambda m, d, k, T, s=steps, p=prune:
                      splat_ops.refine_depth(m, d, k, T, intr, tc,
                                             steps=s, prune_sdf=p))(
            m_gt, rc_s.depth, rc_s.mask, T)
        show(f"A_refine{steps}_prune{prune}        ", d_r)

    # occlusion-aware fill (bleed suppression) +- refine/prune
    for br, babs in ((0.15, 0.5), (0.08, 0.25)):
        bs = splat_ops.SplatConfig(
            max_blocks=sp.max_blocks, max_voxels=sp.max_voxels,
            surface_eta=sp.surface_eta, z_bits=sp.z_bits,
            fill_levels=sp.fill_levels, bleed_rel=br, bleed_abs=babs)
        rc_b = jax.jit(lambda m, T, c=bs: splat_ops.splat_render(
            m, T, intr, tc, c))(m_gt, T)
        show(f"A_bleedfill r{br} a{babs}      ", rc_b.depth)
        for steps, prune in ((2, 0.5), (2, 0.0)):
            d_r = jax.jit(lambda m, d, k, T, s=steps, p=prune:
                          splat_ops.refine_depth(m, d, k, T, intr, tc,
                                                 steps=s, prune_sdf=p))(
                m_gt, rc_b.depth, rc_b.mask, T)
            show(f"A_bleedfill+refine{steps}_prune{prune}", d_r)
    print(f"total {time.perf_counter() - t0:.1f} s")


if __name__ == "__main__":
    main()
