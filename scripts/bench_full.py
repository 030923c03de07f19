"""Full-pipeline throughput bench: VO + stereo depth + TSDF fusion per
frame (the reference's ProcessFrame loop, ~10 FPS on its GPU — reference:
src/DenseSLAM/DenseSlam.h:488-489), run as batched `process_sequence`
scans on one chip at KITTI scale over the street-corridor scene.

Prints one JSON line. The headline driver bench (bench.py) measures fusion
throughput; this script covers the complete linear pipeline.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np


def main() -> None:
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--keyframe_every", type=int, default=1,
                    help="fuse (and compute SGM depth) every k-th frame; "
                         "1 = every frame (strictly MORE work than the "
                         "reference, which fuses only at ORB keyframe "
                         "rate, roughly every 5-10 KITTI frames)")
    ap.add_argument("--sgm_backend", default="xla",
                    choices=["xla", "pallas", "pallas_fused"])
    args = ap.parse_args()

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
        max_depth_m=50.0, alloc_subsample=2, sampler="pallas",
        storage_dtype="bfloat16",
    )
    cfg = SystemConfig(
        rig=rig, tsdf=tsdf,
        decay=VoxelDecayParams(enabled=True, min_decay_age=30,
                               max_decay_weight=2),
        slide_window=SlideWindowParams(enabled=True, max_age=60),
        # bf16 SGM volume: half the HBM traffic of the dominant stereo
        # passes; measured depth-vs-GT MAE identical to f32 (0.1712 vs
        # 0.1711 m on the synthetic street scene)
        # sgm_backend stays "xla": the pallas aggregation wins standalone
        # (33.5 vs 44 ms on an argument volume) but LOSES 3x in-pipeline —
        # the kernel boundaries force the 232 MB volume to materialise
        # where XLA otherwise fuses the cost-volume producer into the
        # first scan (see ops/sgm_pallas.py docstring).
        stereo=StereoConfig(cost_dtype="bfloat16",
                            sgm_backend=args.sgm_backend),
    )
    cfg = dataclasses.replace(
        cfg,
        pipeline=dataclasses.replace(cfg.pipeline, fusion_db_capacity=8,
                                     keyframe_every=args.keyframe_every),
        frontend=dataclasses.replace(cfg.frontend, max_features=2048,
                                     nms_tau=10.0, max_per_bucket=8),
    )

    chunk = 10
    n_chunks = 4   # 40 frames: the street-corridor trajectory stays within
                   # the 8192 visible/alloc caps (60 frames overflows)
    n_warm = 2     # chunk 0 compiles; chunk 1 still pays one-time input
                   # materialisation on the tunneled runtime (measured 15 s
                   # vs the 1.1 s steady state) — time chunks 2+ only
    poses = synthetic.make_trajectory(n_chunks * chunk, step_m=0.4,
                                      yaw_rate=0.003)
    scene = synthetic.street_scene()
    lefts, rights, _ = synthetic.render_stereo_trajectory(poses, rig, scene)

    # pre-slice all chunk inputs OUTSIDE the timed loop (an in-loop slice is
    # an extra eager dispatch per chunk on this runtime)
    L = [lefts[i * chunk:(i + 1) * chunk] for i in range(n_chunks)]
    R = [rights[i * chunk:(i + 1) * chunk] for i in range(n_chunks)]
    F = [jnp.arange(chunk, dtype=jnp.int32) + jnp.int32(i * chunk)
         for i in range(n_chunks)]
    jax.block_until_ready((L, R, F))

    st = fe.init_frontend(cfg, seed=0)
    m = tsdf_ops.make_map(cfg.tsdf)
    db = make_fusion_db(cfg)
    f = jax.jit(
        lambda st, m, db, l, r, fi: process_sequence(st, m, db, l, r, fi, cfg),
        donate_argnums=(1, 2),
    )

    count = jax.jit(tsdf_ops.num_allocated_blocks)
    for i in range(n_warm):
        st, m, db, stats = f(st, m, db, L[i], R[i], F[i])
        float(jax.device_get(count(m)))  # readback = real execution barrier

    t0 = time.perf_counter()
    for i in range(n_warm, n_chunks):
        st, m, db, stats = f(st, m, db, L[i], R[i], F[i])
    float(jax.device_get(count(m)))
    dt = time.perf_counter() - t0
    fps = (n_chunks - n_warm) * chunk / dt

    ok = np.asarray(jax.device_get(stats["tracking_ok"]))
    overflow = int(jax.device_get(m.overflow))
    if overflow:
        raise RuntimeError(f"visible/alloc cap overflowed ({overflow})")
    print(json.dumps({
        "metric": "full_pipeline_frames_per_s_per_chip_kitti"
                  + ("" if args.keyframe_every == 1
                     else f"_kf{args.keyframe_every}"),
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / 10.0, 3),
        "tracking_ok": f"{int(ok.sum())}/{len(ok)}",
    }))


if __name__ == "__main__":
    main()
