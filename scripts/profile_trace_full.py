"""Capture a device trace of one process_sequence chunk (the bench_full
program, already warm in the compile cache) and print the op-level time
breakdown — the tool for finding WHERE the full-pipeline frame time goes.

Usage: python scripts/profile_trace_full.py [trace_dir]
Parses the xplane with tensorboard_plugin_profile if available; otherwise
leaves the trace dir for manual inspection.
"""

from __future__ import annotations

import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp


def main() -> None:
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jax_trace_full"
    from denseslam_tpu.config import (
        SlideWindowParams, StereoConfig, SystemConfig, TsdfConfig,
        VoxelDecayParams)
    from denseslam_tpu.io import synthetic
    from denseslam_tpu.models import frontend as fe
    from denseslam_tpu.models.dense_slam import (
        make_fusion_db, process_sequence)
    from denseslam_tpu.ops import tsdf as tsdf_ops
    from denseslam_tpu.utils.camera import Intrinsics, StereoRig

    w, h = 1226, 370
    intr = Intrinsics(fx=707.09, fy=707.09, cx=601.89, cy=183.11,
                      width=w, height=h)
    rig = StereoRig(intr=intr, baseline_m=0.537)
    tsdf = TsdfConfig(
        voxel_size_m=0.06, trunc_dist_m=0.24, table_slots=1 << 17,
        max_visible_blocks=1 << 13, max_alloc_per_frame=1 << 13,
        max_depth_m=50.0, alloc_subsample=2, sampler="pallas", storage_dtype="bfloat16",
    )
    cfg = SystemConfig(
        rig=rig, tsdf=tsdf,
        decay=VoxelDecayParams(enabled=True, min_decay_age=30,
                               max_decay_weight=2),
        slide_window=SlideWindowParams(enabled=True, max_age=60),
        stereo=StereoConfig(cost_dtype="bfloat16"),
    )
    cfg = dataclasses.replace(
        cfg,
        pipeline=dataclasses.replace(cfg.pipeline, fusion_db_capacity=8),
        frontend=dataclasses.replace(cfg.frontend, max_features=2048,
                                     nms_tau=10.0, max_per_bucket=8),
    )

    chunk = 10
    poses = synthetic.make_trajectory(2 * chunk, step_m=0.4, yaw_rate=0.003)
    scene = synthetic.street_scene()
    lefts, rights, _ = synthetic.render_stereo_trajectory(poses, rig, scene)
    jax.block_until_ready(lefts)

    st = fe.init_frontend(cfg, seed=0)
    m = tsdf_ops.make_map(cfg.tsdf)
    db = make_fusion_db(cfg)
    f = jax.jit(
        lambda st, m, db, l, r, fi: process_sequence(st, m, db, l, r, fi, cfg),
        donate_argnums=(1, 2),
    )
    count = jax.jit(tsdf_ops.num_allocated_blocks)
    fids = jnp.arange(chunk, dtype=jnp.int32)
    st, m, db, stats = f(st, m, db, lefts[:chunk], rights[:chunk], fids)
    float(jax.device_get(count(m)))

    jax.profiler.start_trace(trace_dir)
    st, m, db, stats = f(st, m, db, lefts[chunk:], rights[chunk:],
                         fids + jnp.int32(chunk))
    float(jax.device_get(count(m)))
    jax.profiler.stop_trace()
    print("trace ->", trace_dir)

    # find xplane files
    import glob
    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    print("xplane files:", paths)


if __name__ == "__main__":
    main()
