#!/usr/bin/env python
"""Probe: device trace of ONE drive-config process_sequence chunk.

The 544-frame drive spends ~78 s in the chunk scan (≈143 ms/frame) while
bench_full at kf4 on the street scene runs ~17 ms/frame. Same program
structure — so WHERE do the extra 125 ms/frame go? This traces the scan
with the EXACT drive configuration (loop scene, f32 storage, fusion DB
capacity 64, correction enabled, chunk 16, photometric noise) and prints
the op-level breakdown via scripts/parse_xplane.py.

Usage: python scripts/probes/exp_drive_trace.py [trace_dir]
"""

from __future__ import annotations

import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np


def main() -> None:
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jax_trace_drive"
    from denseslam_tpu.config import (OnlineCorrectionParams,
                                      PipelineConfig, SlideWindowParams,
                                      StereoConfig, SystemConfig,
                                      TsdfConfig, VoxelDecayParams)
    from denseslam_tpu.io import synthetic
    from denseslam_tpu.models import frontend as fe
    from denseslam_tpu.models.dense_slam import (make_fusion_db,
                                                 process_sequence)
    from denseslam_tpu.ops import tsdf as tsdf_ops
    from denseslam_tpu.utils.camera import Intrinsics, StereoRig

    w, h = 1226, 370
    intr = Intrinsics(fx=707.09, fy=707.09, cx=(w - 1) / 2.0,
                      cy=(h - 1) / 2.0, width=w, height=h)
    rig = StereoRig(intr=intr, baseline_m=0.537)
    cfg = SystemConfig(
        rig=rig,
        tsdf=TsdfConfig(voxel_size_m=0.06, trunc_dist_m=0.24,
                        table_slots=1 << 17, max_visible_blocks=1 << 13,
                        max_alloc_per_frame=1 << 13, max_depth_m=40.0,
                        sampler="pallas", alloc_subsample=2),
        stereo=StereoConfig(cost_dtype="bfloat16"),
        decay=VoxelDecayParams(enabled=True, min_decay_age=30,
                               max_decay_weight=2),
        slide_window=SlideWindowParams(enabled=True, max_age=60),
        correction=OnlineCorrectionParams(enabled=True, correction_num=5,
                                          start_correction_num=4,
                                          min_error=0.01),
        pipeline=PipelineConfig(keyframe_every=4, fusion_db_capacity=64),
    )

    chunk = 16
    n = 4 * chunk
    gt = synthetic.make_loop_trajectory(max(120, n), radius_m=18.0,
                                        closure_frames=0)
    scene = synthetic.loop_scene(gt)
    lefts, rights, _ = synthetic.render_stereo_trajectory(gt[:n], rig,
                                                          scene)
    jax.block_until_ready(lefts)

    st = fe.init_frontend(cfg, seed=0)
    m = tsdf_ops.make_map(cfg.tsdf)
    db = make_fusion_db(cfg)
    f = jax.jit(
        lambda st, m, db, l, r, fi: process_sequence(
            st, m, db, l, r, fi, cfg),
        donate_argnums=(1, 2),
    )
    count = jax.jit(tsdf_ops.num_allocated_blocks)
    import time
    # warm: 3 chunks (compile + the slow first post-readback window)
    for c in range(3):
        fids = jnp.arange(c * chunk, (c + 1) * chunk, dtype=jnp.int32)
        st, m, db, stats = f(st, m, db, lefts[c*chunk:(c+1)*chunk],
                             rights[c*chunk:(c+1)*chunk], fids)
    print("blocks after warm:", float(jax.device_get(count(m))),
          flush=True)

    t0 = time.perf_counter()
    jax.profiler.start_trace(trace_dir)
    fids = jnp.arange(3 * chunk, 4 * chunk, dtype=jnp.int32)
    st, m, db, stats = f(st, m, db, lefts[3*chunk:], rights[3*chunk:],
                         fids)
    float(jax.device_get(count(m)))
    jax.profiler.stop_trace()
    wall = time.perf_counter() - t0
    print(f"traced chunk wall: {wall*1000:.0f} ms "
          f"({wall/chunk*1000:.1f} ms/frame)")
    print("trace ->", trace_dir)

    import glob
    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    print("xplane files:", paths)


if __name__ == "__main__":
    main()
