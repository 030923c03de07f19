#!/usr/bin/env python
"""Probe: what drives the ~3 s/dispatch overhead of the drive's chunk scan?

Trace evidence (exp_drive_trace): device executes a 16-frame chunk in
226 ms but wall is 3.4 s — the rest is tunneled-runtime dispatch
overhead. The verify-skill notes per-dispatch overhead scales with
argument BYTES under contention; the drive's scan carries a 232 MB
fusion DB (64 x full-res depth+gray f32). Sweep:

  * fusion_db_capacity 64 vs 8  (arg bytes: ~500 MB vs ~290 MB)
  * chunk 16 vs 32              (amortisation of fixed per-dispatch cost)

and print wall ms/frame for steady chunks of each config.
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

from denseslam_tpu.config import (OnlineCorrectionParams, PipelineConfig,
                                  SlideWindowParams, StereoConfig,
                                  SystemConfig, TsdfConfig,
                                  VoxelDecayParams)
from denseslam_tpu.io import synthetic
from denseslam_tpu.models import frontend as fe
from denseslam_tpu.models.dense_slam import (make_fusion_db,
                                             process_sequence)
from denseslam_tpu.ops import tsdf as tsdf_ops
from denseslam_tpu.utils.camera import Intrinsics, StereoRig


def run_config(db_cap: int, chunk: int, gt, scene, rig, n_chunks=5):
    w, h = rig.intr.width, rig.intr.height
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
        pipeline=PipelineConfig(keyframe_every=4, fusion_db_capacity=db_cap),
    )
    f = jax.jit(
        lambda st, m, db, l, r, fi: process_sequence(st, m, db, l, r, fi,
                                                     cfg),
        donate_argnums=(1, 2))
    st = fe.init_frontend(cfg, seed=0)
    m = tsdf_ops.make_map(cfg.tsdf)
    db = make_fusion_db(cfg)
    n = n_chunks * chunk
    lefts, rights, _ = synthetic.render_stereo_trajectory(gt[:n], rig,
                                                          scene)
    jax.block_until_ready(lefts)
    times = []
    for c in range(n_chunks):
        fids = jnp.arange(c * chunk, (c + 1) * chunk, dtype=jnp.int32)
        t0 = time.perf_counter()
        st, m, db, stats = f(st, m, db, lefts[c*chunk:(c+1)*chunk],
                             rights[c*chunk:(c+1)*chunk], fids)
        # sync via a scalar fetch derived from the outputs
        float(jax.device_get(stats["T_wc"][-1, 0, 3]))
        times.append(time.perf_counter() - t0)
    steady = times[2:]
    print(f"db_cap={db_cap:3d} chunk={chunk:3d}: "
          f"{[f'{t*1e3:.0f}' for t in times]} ms/chunk -> steady "
          f"{np.mean(steady)*1e3/chunk:.1f} ms/frame", flush=True)


def main():
    w, h = 1226, 370
    intr = Intrinsics(fx=707.09, fy=707.09, cx=(w - 1) / 2.0,
                      cy=(h - 1) / 2.0, width=w, height=h)
    rig = StereoRig(intr=intr, baseline_m=0.537)
    gt = synthetic.make_loop_trajectory(200, radius_m=18.0,
                                        closure_frames=0)
    scene = synthetic.loop_scene(gt)
    run_config(64, 16, gt, scene, rig)   # the drive config (cached)
    run_config(8, 16, gt, scene, rig)    # small DB
    run_config(64, 32, gt, scene, rig)   # bigger chunks
    run_config(8, 32, gt, scene, rig)


if __name__ == "__main__":
    main()
