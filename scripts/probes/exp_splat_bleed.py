#!/usr/bin/env python
"""Probe: is the splat renderer's error background BLEED-THROUGH?

Theory (from exp_map_quality): voxel splats at depth z land ~fx*vsz/z px
apart; between foreground splats the scatter-min z-buffer is won by
surfaces BEHIND them, so bad pixels should be (a) asymmetric — splat
depth >> oracle depth, rarely the reverse — and (b) concentrated where a
nearby pixel is much closer than the pixel itself.

Renders one frame of a GT-pose/GT-depth map with splat and the
reference-exact sphere-trace raycast and prints the signed-error split.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

from denseslam_tpu.config import (SlideWindowParams, SystemConfig,
                                  TsdfConfig, VoxelDecayParams)
from denseslam_tpu.io import synthetic
from denseslam_tpu.models.dense_slam import fuse_sequence, make_fusion_db
from denseslam_tpu.ops import raycast as rc_ops
from denseslam_tpu.ops import splat as splat_ops
from denseslam_tpu.ops import tsdf as tsdf_ops
from denseslam_tpu.utils.camera import Intrinsics, StereoRig


def main():
    frames = 160
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

    gt = synthetic.make_loop_trajectory(frames, radius_m=18.0,
                                        closure_frames=0)
    scene = synthetic.loop_scene(gt)
    fuse_batch = jax.jit(
        lambda m, db, d, g, T, f: fuse_sequence(m, db, d, g, T, f, cfg),
        donate_argnums=(0, 1))
    kf_ts = list(range(0, frames, 4))
    m = tsdf_ops.make_map(tc)
    db = make_fusion_db(cfg)
    B = 8
    for b0 in range(0, len(kf_ts) - B + 1, B):
        ts = kf_ts[b0: b0 + B]
        grays, depths = synthetic.render_trajectory(
            np.stack([gt[t] for t in ts]), intr, scene)
        depths = jnp.where(depths > tc.max_depth_m, 0.0, depths)
        m, db = fuse_batch(m, db, depths, grays,
                           jnp.asarray(np.stack([gt[t] for t in ts])),
                           jnp.asarray(ts, jnp.int32))

    t_eval = kf_ts[-4]
    T = jnp.asarray(gt[t_eval])
    scfg = splat_ops.SplatConfig(
        max_blocks=sp.max_blocks, max_voxels=sp.max_voxels,
        surface_eta=sp.surface_eta, z_bits=sp.z_bits,
        fill_levels=sp.fill_levels)
    rc_s = jax.jit(lambda m, T: splat_ops.splat_render(
        m, T, intr, tc, scfg))(m, T)
    rc_o = rc_ops.raycast(m, T, intr, tc)
    ds = np.asarray(rc_s.depth)
    do = np.asarray(rc_o.depth)
    _, gtd = synthetic.render_view(T, intr, scene)
    g = np.array(gtd)
    g[g > tc.max_depth_m] = 0.0

    both = (ds > 0) & (do > 0)
    diff = ds[both] - do[both]
    print(f"pixels both hit: {both.sum()}")
    for thr in (0.25, 0.5, 1.0, 2.0):
        behind = (diff > thr).mean()
        front = (diff < -thr).mean()
        print(f"  |err|>{thr:4.2f} m: splat BEHIND oracle {behind:.4f}  "
              f"in-front {front:.4f}")
    ok = np.abs(diff) < 0.25
    print(f"  agree <0.25 m: {ok.mean():.4f}; "
          f"median |diff| on agreeing: {np.median(np.abs(diff[ok])):.4f} m")
    # the bad splat pixels vs GT: are they behind GT too?
    vs = (ds > 0) & (g > 0.5)
    d2 = ds[vs] - g[vs]
    print(f"splat vs GT: behind>1m {(d2 > 1).mean():.4f}  "
          f"front>1m {(d2 < -1).mean():.4f}")
    vo = (do > 0) & (g > 0.5)
    d3 = do[vo] - g[vo]
    print(f"oracle vs GT: behind>1m {(d3 > 1).mean():.4f}  "
          f"front>1m {(d3 < -1).mean():.4f}")


if __name__ == "__main__":
    main()
