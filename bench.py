"""Benchmark: dense-fusion throughput on one chip, KITTI-scale frames.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Headline metric (BASELINE.md): fused frames/s/chip at KITTI stereo
resolution (1226x370, 50 m range, 6 cm voxels) — the reference's full
pipeline runs ~10 FPS on its contemporary GPU (design assumption,
reference: src/DenseSLAM/DenseSlam.h:488-489), so vs_baseline = fps / 10.
One fused frame = hash allocate + TSDF integrate + slide-window + decay +
fusion-DB record (the reference's per-keyframe fusion tail,
DenseSlam.cpp:212-228). Frames are processed in `lax.scan` batches — the
throughput pipeline (models/dense_slam.py fuse_sequence) — with donated map
state.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp


def main(argv=None) -> None:
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--sampler", default="pallas",
                    choices=["gather", "pallas"])
    ap.add_argument("--storage", default="bfloat16",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--no_color", action="store_true")
    args = ap.parse_args(argv)

    from denseslam_tpu.config import (
        SlideWindowParams,
        SystemConfig,
        TsdfConfig,
        VoxelDecayParams,
    )
    from denseslam_tpu.io import synthetic
    from denseslam_tpu.models.dense_slam import fuse_sequence, make_fusion_db
    from denseslam_tpu.ops import tsdf as tsdf_ops
    from denseslam_tpu.utils.camera import Intrinsics, StereoRig

    # KITTI-scale workload (odometry camera geometry)
    w, h = 1226, 370
    intr = Intrinsics(fx=707.09, fy=707.09, cx=601.89, cy=183.11,
                      width=w, height=h)
    rig = StereoRig(intr=intr, baseline_m=0.537)
    # Static caps sized to the measured working set (~1-3k visible blocks at
    # KITTI street scale): every element-granular gather/scatter in fusion
    # scales with max_visible_blocks * 512, at ~15-30 ns/element (see
    # .claude/skills/verify/SKILL.md), so an oversized cap directly costs
    # frame time. alloc_subsample=2 quarters the allocation dedupe sorts
    # (blocks project >=3 px at 50 m, so stride 2 cannot skip a block).
    # The street corridor scene touches ~4.9k unique blocks/frame at 50 m
    # range (the old single-room scene touched only ~200-600 — an
    # unrepresentatively light allocation load); cap 8192 leaves headroom
    # and the overflow assert below keeps the number honest.
    tsdf = TsdfConfig(
        voxel_size_m=0.06,
        trunc_dist_m=0.24,
        table_slots=1 << 17,
        max_visible_blocks=1 << 13,
        max_alloc_per_frame=1 << 13,
        max_depth_m=50.0,
        raycast_steps=192,
        alloc_subsample=2,
        sampler=args.sampler,
        storage_dtype=args.storage,
        fuse_color=not args.no_color,
    )
    cfg = SystemConfig(
        rig=rig,
        tsdf=tsdf,
        decay=VoxelDecayParams(enabled=True, min_decay_age=30, max_decay_weight=2),
        slide_window=SlideWindowParams(enabled=True, max_age=60),
    )
    cfg = dataclasses.replace(
        cfg,
        pipeline=dataclasses.replace(cfg.pipeline, fusion_db_capacity=8),
    )

    chunk = 10
    fuse_batch = jax.jit(
        lambda m, db, d, g, T, f: fuse_sequence(m, db, d, g, T, f, cfg),
        donate_argnums=(0, 1),
    )

    # synthetic street-like scene rendered at KITTI geometry — ONE batched
    # render dispatch (an eager per-frame render loop floods the tunneled
    # runtime with dispatches and degrades every later measurement).
    poses = synthetic.make_trajectory(chunk, step_m=0.8, yaw_rate=0.003)
    scene = synthetic.street_scene()
    grays, depths = synthetic.render_trajectory(poses, intr, scene)
    depths = jax.device_put(depths)
    grays = jax.device_put(grays)
    T_wcs = jax.device_put(jnp.asarray(poses))
    fids = jnp.arange(chunk, dtype=jnp.int32)

    m = tsdf_ops.make_map(cfg.tsdf)
    db = make_fusion_db(cfg)

    # Sync by fetching a scalar DERIVED from the map: on this tunneled
    # runtime block_until_ready alone can return before remote execution
    # completes (see .claude/skills/verify/SKILL.md — timing methodology).
    count = jax.jit(tsdf_ops.num_allocated_blocks)

    def dispatch_health_ms() -> float:
        """Per-dispatch ENQUEUE latency of pipelined tiny programs
        (CLAUDE.md rule 5's congestion probe, re-based for the current
        runtime: any SERIALIZED tiny round-trip now costs the full
        ~27-30 ms tunnel RTT healthy or not, so only the async enqueue
        rate still carries the congestion signal). Measured healthy:
        ~0.16-0.19 ms/dispatch; a congested remote compile service
        inflates it several-fold. Salt varies per dispatch (the runtime
        dedupes identical (executable, args) pairs)."""
        tiny = jax.jit(lambda x, s: jnp.sum(x * 2.0 + s))
        x = jnp.ones((8, 128), jnp.float32)
        float(jax.device_get(tiny(x, jnp.float32(0.0))))   # compile + run
        reps = 20
        t0 = time.perf_counter()
        outs = [tiny(x, jnp.float32(k + 1.0)) for k in range(reps)]
        dt = time.perf_counter() - t0
        outs[-1].block_until_ready()
        return dt / reps * 1e3

    health_ms = dispatch_health_ms()

    # warmup / compile + 2 untimed steady-state chunks: the FIRST dispatch
    # window after a warmup fetch runs ~1.6x slow on the tunneled runtime
    # (measured 31.5 fps then 49-50 fps for identical windows); timing must
    # start from steady state or it reports tunnel pacing, not pipeline cost
    warm_chunks = 3
    for i in range(warm_chunks):
        m, db = fuse_batch(m, db, depths, grays, T_wcs,
                           fids + jnp.int32(i * chunk))
    float(jax.device_get(count(m)))

    n_chunks = 12
    t0 = time.perf_counter()
    for i in range(n_chunks):
        m, db = fuse_batch(m, db, depths, grays, T_wcs,
                           fids + jnp.int32((warm_chunks + i) * chunk))
    float(jax.device_get(count(m)))
    dt = time.perf_counter() - t0
    fps = n_chunks * chunk / dt

    overflow = int(jax.device_get(m.overflow))
    if overflow:
        raise RuntimeError(
            f"visible/alloc cap overflowed ({overflow}) — fps number would "
            "be understating the work; raise max_visible_blocks")

    # complete-system context from the committed long-drive record (the
    # fusion tail answers a narrower question than the reference's ~10 fps
    # whole-system number; the full-system fps/ATE ride along so one line
    # carries both) — reference fps: src/DenseSLAM/DenseSlam.h:488-489
    health_after_ms = dispatch_health_ms()

    rec = {
        "metric": "fused_frames_per_s_per_chip_kitti",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / 10.0, 3),
        # in-band evidence for the timing's trustworthiness (CLAUDE.md
        # rule 5): pre/post per-dispatch enqueue latency (healthy
        # ~0.16-0.19 ms); >= ~1 ms flags a congested remote-compile
        # service -> fps is a lower bound only
        "health_ms": round(health_ms, 3),
        "health_after_ms": round(health_after_ms, 3),
        "congested": bool(max(health_ms, health_after_ms) >= 1.0),
    }
    try:
        root = os.path.dirname(os.path.abspath(__file__))
        with open(os.path.join(root, "results_long_drive.json")) as fh:
            drive = json.load(fh)
        rec["full_system_fps_steady"] = drive.get("fps_steady")
        rec["full_system_ate_m"] = drive.get("ate_rmse_m")
        rec["full_system_frames"] = drive.get("frames")
        # fps_steady varies run-to-run at identical config (committed
        # flagship runs spanned 10.8-14.7 under remote-service weather):
        # quote the median + range over the recorded matching-config runs,
        # not whichever run happens to be current (VERDICT r4 item 9)
        hist_path = os.path.join(root, "results_long_drive_history.jsonl")
        if os.path.exists(hist_path):
            same = []
            with open(hist_path) as fh:
                for line in fh:
                    try:
                        r = json.loads(line)
                    except ValueError:
                        continue
                    if (r.get("frames") == drive.get("frames")
                            and r.get("chunk") == drive.get("chunk")
                            and r.get("sensor") == drive.get("sensor")
                            and r.get("keyframe_every")
                            == drive.get("keyframe_every")
                            and r.get("slide_max_age")
                            == drive.get("slide_max_age")
                            # eval density materially changes fps_steady
                            # (each eval frame costs ~0.6 s of renders
                            # inside the steady window)
                            and r.get("depth_eval_every")
                            == drive.get("depth_eval_every")
                            and not r.get("blackout")
                            and not r.get("dwell")):
                        same.append(float(r["fps_steady"]))
            if len(same) >= 2:
                import statistics
                rec["full_system_fps_steady"] = round(
                    statistics.median(same), 2)
                rec["full_system_fps_range"] = [round(min(same), 2),
                                                round(max(same), 2)]
                rec["full_system_fps_runs"] = len(same)
    except Exception:
        pass
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
