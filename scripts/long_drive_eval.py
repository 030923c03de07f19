#!/usr/bin/env python
"""Full-scale trajectory validation (VERDICT r1 item 2): a >=500-frame
full-resolution synthetic LOOP drive through the COMPLETE SLAMSystem —
stereo VO + SGM depth + TSDF fusion + local BA + loop closing + online
correction + decay/slide-window — with photometric noise and occluders,
scored against exact ground truth:

  * ATE / RPE / KITTI rot+trans errors of the full trajectory,
  * raycast-depth metrics (MAE/RMSE/AbsRel/delta-thresholds) of the fused
    map vs GT depth at sampled keyframes,
  * loop / correction / culling counters, fps.

Writes a human-readable RESULTS block and a JSON record. Run on the real
TPU (the driver workload); a small `--frames 40 --width 320 --height 240`
run works on CPU for smoke-testing.

Usage: python scripts/long_drive_eval.py [--frames 500] [--out RESULTS.md]
           [--json results_long_drive.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sensor", default="stereo",
                    choices=["stereo", "rgbd", "mono"],
                    help="rgbd drives the TUM/ICL-style depth-sensor path "
                    "(reference: Input.h:30-35): VO from rgbd_vo_step's "
                    "virtual right views, fusion of the sensor depth, no "
                    "stereo matcher. mono drives the MONOCULAR path "
                    "(reference: Input.h:24-28 + viso_mono): VO from "
                    "8-point RANSAC + ground-plane scale (depth never "
                    "feeds the estimator); fusion consumes the supplied "
                    "depth, as the reference's precomputed-depth mono "
                    "mode does")
    ap.add_argument("--depth-noise", type=float, default=0.01,
                    help="rgbd: relative sensor depth noise sigma")
    ap.add_argument("--depth-holes", type=float, default=0.05,
                    help="rgbd: fraction of depth pixels dropped to 0")
    ap.add_argument("--frames", type=int, default=500)
    ap.add_argument("--closure", type=int, default=40,
                    help="extra frames past the loop start (the revisit)")
    ap.add_argument("--width", type=int, default=1226)
    ap.add_argument("--height", type=int, default=370)
    ap.add_argument("--radius", type=float, default=18.0)
    ap.add_argument("--photo-noise", type=float, default=2.0,
                    help="per-pixel gaussian intensity noise sigma")
    ap.add_argument("--gain-amp", type=float, default=0.15,
                    help="slow sinusoidal exposure modulation amplitude")
    ap.add_argument("--keyframe-every", type=int, default=4)
    ap.add_argument("--depth-eval-every", type=int, default=25,
                    help="evaluate raycast depth at every Nth fused frame")
    ap.add_argument("--render-chunk", type=int, default=16)
    ap.add_argument("--chunk", type=int, default=64,
                    help="frames per process_chunk batch (the production "
                    "throughput path: one lax.scan device program per "
                    "batch; 0 = per-frame host loop, which pays ~27 ms "
                    "tunnel RTT per scalar readback and is only needed "
                    "when exercising relocalization). Round-4 sweep with "
                    "the hardened VO (576-frame drive): 32 -> ATE 0.21, "
                    "64 -> ATE 0.12-0.14 / best fps (sweet spot: lower "
                    "per-frame drift tolerates sparser corrections, and "
                    "fewer ticks cost fewer tunnel RTTs); 96 -> equal "
                    "ATE, worse fps. The old chunk-32 sweet spot was "
                    "tuned on the pre-hardening VO (drift per chunk was "
                    "4x higher)")
    ap.add_argument("--blackout", default=None, metavar="START:LEN",
                    help="blank (zero) frames [START, START+LEN) to "
                    "exercise tracking loss + relocalization (the "
                    "reference's tracker recovery, DenseSlam.cpp:89-96)")
    ap.add_argument("--dwell", default=None, metavar="START:LEN",
                    help="hold the camera stationary for LEN frames at "
                    "frame START (an intersection stop): coincident "
                    "keyframes make keyframe culling genuinely fire "
                    "(reference: ORB-SLAM2 KeyFrameCulling + fused-frame "
                    "purge, DenseSlam.cpp:417-429)")
    ap.add_argument("--prefetch", action="store_true",
                    help="pipeline chunk k+1's scan dispatch under chunk "
                    "k's eval/telemetry (SLAMSystem.prefetch_chunk). WINS "
                    "only when host<->device bandwidth is not the "
                    "bottleneck: on the tunneled axon runtime the in-"
                    "flight scan's argument streaming contends with every "
                    "tick dispatch and the drive measured 3.5x SLOWER "
                    "(fps_steady 8.1 -> 2.3, all phases uniformly "
                    "inflated); default off here, on for real TPU hosts")
    ap.add_argument("--slide-max-age", type=int, default=60,
                    help="slide-window eviction age (frames). 60 bounds "
                    "memory tightly but caps raycast coverage ~0.40 on the "
                    "544-frame drive (the sphere-trace ORACLE only reaches "
                    "0.459 under it); 120+ trades HBM for coverage")
    ap.add_argument("--decay-min-age", type=int, default=30,
                    help="voxel decay minimum age (frames)")
    ap.add_argument("--submap-threshold", type=float, default=-1.0,
                    help="new-submap visible-fraction threshold "
                    "(reference F_originalBlocksThreshold; -1 = single "
                    "submap). Chunk mode checks once per chunk")
    ap.add_argument("--map-budget-mb", type=float, default=-1.0,
                    help="device-memory budget across submaps; oldest "
                    "inactive submaps spill to host beyond it "
                    "(ITMSwappingEngine role; -1 = unbounded)")
    ap.add_argument("--out", default=None, help="append RESULTS block here")
    ap.add_argument("--json", default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from denseslam_tpu.config import (OnlineCorrectionParams,
                                      PipelineConfig, SlideWindowParams,
                                      StereoConfig, SystemConfig,
                                      TsdfConfig, VoxelDecayParams)
    from denseslam_tpu.eval import depth_metrics, traj_metrics
    from denseslam_tpu.io import synthetic
    from denseslam_tpu.models.system import SLAMSystem
    from denseslam_tpu.utils.camera import Intrinsics, StereoRig

    w, h = args.width, args.height
    scale = w / 1226.0
    intr = Intrinsics(fx=707.09 * scale, fy=707.09 * scale,
                      cx=(w - 1) / 2.0, cy=(h - 1) / 2.0, width=w, height=h)
    rig = StereoRig(intr=intr, baseline_m=0.537)
    cfg = SystemConfig(
        rig=rig,
        tsdf=TsdfConfig(
            voxel_size_m=0.06, trunc_dist_m=0.24, table_slots=1 << 17,
            max_visible_blocks=1 << 13, max_alloc_per_frame=1 << 13,
            max_depth_m=40.0, sampler="pallas",
            # quarters the allocation dedupe sorts; blocks project >=3 px
            # within max_depth so stride 2 cannot skip one (bench.py note).
            # storage stays float32: correction de-fusion must be exact.
            alloc_subsample=2,
        ),
        stereo=StereoConfig(cost_dtype="bfloat16"),
        decay=VoxelDecayParams(enabled=True, min_decay_age=args.decay_min_age,
                               max_decay_weight=2),
        slide_window=SlideWindowParams(enabled=True,
                                       max_age=args.slide_max_age),
        correction=OnlineCorrectionParams(enabled=True, correction_num=5,
                                          start_correction_num=4,
                                          min_error=0.01),
        pipeline=PipelineConfig(keyframe_every=args.keyframe_every,
                                fusion_db_capacity=64,
                                new_submap_threshold=args.submap_threshold,
                                map_memory_budget_mb=args.map_budget_mb,
                                sensor=args.sensor),
    )
    if args.cpu:  # small-shape smoke mode
        cfg = dataclasses.replace(
            cfg, tsdf=dataclasses.replace(
                cfg.tsdf, table_slots=1 << 14, max_visible_blocks=1 << 11,
                max_alloc_per_frame=1 << 11, sampler="gather"),
            stereo=StereoConfig(max_disparity=64))

    n_total = args.frames + args.closure
    if args.chunk > 0 and n_total % args.chunk:
        # a ragged tail chunk is a DIFFERENT batch shape -> a full scan
        # recompile (~30 s) inside the steady-state window; extend the
        # closure to the next chunk multiple instead
        n_total += args.chunk - (n_total % args.chunk)
        print(f"(extending closure to {n_total} total frames: "
              f"chunk-multiple batches avoid a tail-shape recompile)")
    dwell = None
    if args.dwell:
        d0, dlen = (int(x) for x in args.dwell.split(":"))
        dwell = (d0, dlen)
    n_path = n_total - (dwell[1] if dwell else 0)
    gt = synthetic.make_loop_trajectory(args.frames, radius_m=args.radius,
                                        closure_frames=n_path - args.frames)
    scene = synthetic.loop_scene(gt)
    if dwell:
        # time-warp: pause the trajectory for dlen frames at d0 (the
        # scene/path itself is unchanged; the closure still happens)
        idx = np.concatenate([np.arange(dwell[0]),
                              np.full(dwell[1], dwell[0]),
                              np.arange(dwell[0], n_path)])
        gt = gt[idx]
    rng = np.random.default_rng(0)

    system = SLAMSystem(cfg, ba_every=4, loop_every=2)

    # compile everything up front (the production posture: the reference's
    # CUDA kernels are resident from startup; first-use compiles otherwise
    # land inside the drive and pollute steady-state fps)
    print("warmup: compiling backend + scan programs...", flush=True)
    tw = time.perf_counter()
    system.warmup(chunk=args.chunk if args.chunk > 0 else 0)
    # the eval renderer too (it interleaves with the drive)
    _ = np.asarray(system.slam.raycast_view(jnp.eye(4, dtype=jnp.float32)).depth)
    # ... and the eval SGM program: its first-use compile inside chunk 0's
    # eval congested the remote compile service and stalled the next
    # chunks' scan dispatches for minutes (r7 drive: ~400 s across the
    # first two chunks). rgbd mode has no stereo matcher: the "input
    # depth" metric scores the (noisy) sensor depth itself.
    if args.sensor in ("rgbd", "mono"):
        _sgm_eval = None
    else:
        from denseslam_tpu.ops import stereo as stereo_ops
        _sgm_eval = jax.jit(lambda l, r: stereo_ops.compute_depth(
            l, r, rig, cfg.stereo, max_depth_m=cfg.tsdf.max_depth_m))
        zi = jnp.zeros((h, w), jnp.float32)
        _ = np.asarray(_sgm_eval(zi, zi)[0])
    warm_s = time.perf_counter() - tw
    print(f"warmup done in {warm_s:.1f} s", flush=True)

    # device-side photometric nuisance: slow exposure ramp (exercises the
    # gain loop) + sensor noise — computed ON DEVICE so frames never cross
    # the host tunnel (a 1226x370 f32 stereo chunk is ~58 MB; pulling it
    # to numpy and back was most of the round-1 wall time)
    @jax.jit
    def _nuisance(lg, rg, t0_idx, key):
        tt = t0_idx + jnp.arange(lg.shape[0], dtype=jnp.float32)
        g = 1.0 + args.gain_amp * jnp.sin(2 * jnp.pi * tt / 150.0)
        kl, kr = jax.random.split(key)
        nl = args.photo_noise * jax.random.normal(kl, lg.shape, jnp.float32)
        nr = args.photo_noise * jax.random.normal(kr, rg.shape, jnp.float32)
        g = g[:, None, None]
        return (jnp.clip(lg * g + nl, 0, 255),
                jnp.clip(rg * g + nr, 0, 255))

    @jax.jit
    def _depth_nuisance(lg, dd, t0_idx, key):
        """RGB-D sensor model: photometric nuisance on gray + relative
        depth noise + dropout holes (TUM-style depth sensor)."""
        tt = t0_idx + jnp.arange(lg.shape[0], dtype=jnp.float32)
        g = 1.0 + args.gain_amp * jnp.sin(2 * jnp.pi * tt / 150.0)
        kl, kd, kh = jax.random.split(key, 3)
        nl = args.photo_noise * jax.random.normal(kl, lg.shape, jnp.float32)
        gray = jnp.clip(lg * g[:, None, None] + nl, 0, 255)
        dn = dd * (1.0 + args.depth_noise
                   * jax.random.normal(kd, dd.shape, jnp.float32))
        holes = jax.random.uniform(kh, dd.shape) < args.depth_holes
        dn = jnp.where(holes | (dd <= 0)
                       | (dd > cfg.tsdf.max_depth_m), 0.0, dn)
        return gray, dn

    blackout = None
    if args.blackout:
        b0, blen = (int(x) for x in args.blackout.split(":"))
        blackout = (b0, b0 + blen)

    use_chunk = args.chunk > 0
    ck = args.chunk if use_chunk else args.render_chunk
    print(f"long drive: {n_total} frames @ {w}x{h}, loop radius "
          f"{args.radius} m, kf_every={args.keyframe_every}, "
          f"{'chunk=%d' % ck if use_chunk else 'per-frame'}", flush=True)
    # input-depth (SGM) metrics at the eval frames (defined pre-warmup) —
    # the reference's raycast-vs-input-depth comparison
    # (eval_raycast_depth.py:67 switch): separates stereo-matching error
    # from fusion/render error.
    # depth-metric floor: the rig's resolvable-depth envelope. Objects
    # closer than fx*b/max_disparity have true disparity outside the
    # search range — no stereo system on this rig can measure them (the
    # frame-400 close occluder scored absrel 0.92 purely on such pixels).
    # Scoring starts where the sensor can physically see.
    if args.sensor in ("rgbd", "mono"):
        z_floor = 0.5      # supplied depth: no disparity-envelope floor
    else:
        z_floor = max(0.5, rig.intr.fx * rig.baseline_m
                      / (cfg.stereo.max_disparity - 1))

    def _health_ms() -> float:
        """Per-dispatch enqueue latency, as in bench.py (healthy
        ~0.16-0.19 ms; congestion inflates it)."""
        tiny = jax.jit(lambda x, s: jnp.sum(x * 2.0 + s))
        x = jnp.ones((8, 128), jnp.float32)
        float(jax.device_get(tiny(x, jnp.float32(0.0))))
        t0 = time.perf_counter()
        outs = [tiny(x, jnp.float32(k + 1.0)) for k in range(20)]
        dt = time.perf_counter() - t0
        outs[-1].block_until_ready()
        return dt / 20 * 1e3

    health_pre = _health_ms()

    t0 = time.perf_counter()
    t_steady = None          # set after the warmup frames (compile stall)
    steady_from = 2 * ck     # first 2 chunks pay compile + the slow
    steady_frame0 = None     # first post-readback dispatch window
    proc_s = 0.0             # pipeline-only time (excludes synthetic
    proc_frames = 0          # data generation + noise injection + eval)
    synth_s = 0.0
    eval_s = 0.0
    lost = 0
    dm_acc = []
    dm_gt_acc = []
    dm_in_acc = []
    eval_ids = []            # which frames were depth-evaluated
    kf_seen = 0
    key0 = jax.random.PRNGKey(0)

    def _make_chunk(lo, hi2, block=True):
        """Synthesize frames [lo, hi2) (device-side render + nuisance).
        stereo -> (lefts, rights); rgbd -> (grays, sensor depths)."""
        ts = time.perf_counter()
        # render in <=32-frame sub-batches: one 64-frame stereo render
        # dispatch measured ~25x slower than 2x32 on the tunneled runtime
        # (232 MB of program outputs in one dispatch)
        subs = []
        for s0 in range(lo, hi2, 32):
            s1 = min(s0 + 32, hi2)
            if args.sensor in ("rgbd", "mono"):
                lg, dd = synthetic.render_trajectory(
                    jnp.asarray(gt[s0:s1]), intr, scene)
                subs.append(_depth_nuisance(lg, dd, jnp.float32(s0),
                                            jax.random.fold_in(key0, s0)))
            else:
                lg, rgs, _ = synthetic.render_stereo_trajectory(
                    gt[s0:s1], rig, scene)
                subs.append(_nuisance(lg, rgs, jnp.float32(s0),
                                      jax.random.fold_in(key0, s0)))
        if len(subs) == 1:
            ls, rs = subs[0]
        else:
            ls = jnp.concatenate([a for a, _ in subs])
            rs = jnp.concatenate([b for _, b in subs])
        if blackout is not None:
            t_idx = np.arange(lo, hi2)
            b = (t_idx >= blackout[0]) & (t_idx < blackout[1])
            if b.any():
                keep = jnp.asarray(~b, jnp.float32)[:, None, None]
                ls = ls * keep
                rs = rs * keep
        if block:
            rs.block_until_ready()
        nonlocal synth_s
        synth_s += time.perf_counter() - ts
        return ls, rs

    prepped = None           # next chunk's frames, already dispatched
    for base in range(0, n_total, ck):
        hi = min(base + ck, n_total)
        if prepped is None:
            lefts, rights = _make_chunk(base, hi)
        else:
            lefts, rights = prepped

        eval_frames = []     # (gt_index) to depth-eval after this batch
        if use_chunk:
            tp = time.perf_counter()
            out = system.process_chunk(lefts, rights)
            okf = np.asarray(out["tracking_ok_frames"])
            dtp = time.perf_counter() - tp
            if base >= steady_from:
                proc_s += dtp
                proc_frames += hi - base
            elif hi >= steady_from and t_steady is None:
                t_steady = time.perf_counter()
                steady_frame0 = hi
            nl = int((~okf[1:]).sum() if base == 0 else (~okf).sum())
            lost += nl
            if nl and os.environ.get("DSL_DEBUG_RESYNC"):
                print(f"    LOST {nl} frames in chunk @{base}: "
                      f"{np.flatnonzero(~okf).tolist()}", flush=True)
            for i in range(hi - base):
                t = base + i
                if t % args.keyframe_every == 0 and okf[i]:
                    if kf_seen % args.depth_eval_every == 0:
                        eval_frames.append(t)
                    kf_seen += 1
        else:
            lefts = np.asarray(lefts)
            rights = np.asarray(rights)
            for i in range(hi - base):
                t = base + i
                tp = time.perf_counter()
                out = system.process_frame(jnp.asarray(lefts[i]),
                                           jnp.asarray(rights[i]))
                ok = bool(out["tracking_ok"])   # readback = sync barrier
                if t > steady_from:
                    proc_s += time.perf_counter() - tp
                    proc_frames += 1
                if not ok:
                    lost += 1
                if t == steady_from:
                    t_steady = time.perf_counter()
                    steady_frame0 = t + 1
                if t % args.keyframe_every == 0:
                    if kf_seen % args.depth_eval_every == 0:
                        eval_frames.append(t)
                    kf_seen += 1

        # ---- pipeline the next chunk: synthesize + dispatch its scan NOW
        # so its device time hides under this chunk's eval renders and
        # telemetry (SLAMSystem.prefetch_chunk — the flattened form of the
        # reference's tracking/mapping thread overlap). On chunks with
        # depth-eval frames, prefetch AFTER the eval instead: the eval
        # renders then see exactly the map state the unpipelined run saw.
        prepped = None

        def _prefetch_next():
            nonlocal prepped
            if (args.prefetch and use_chunk and hi < n_total
                    and prepped is None):
                nxt = _make_chunk(hi, min(hi + ck, n_total), block=False)
                system.prefetch_chunk(*nxt)
                prepped = nxt

        if not eval_frames:
            _prefetch_next()

        # ---- raycast-depth eval, DURING the run (reference renders at
        # the tracked pose while the sequence plays; rendering later is
        # meaningless under slide-window eviction).
        #
        # MAP QUALITY (primary, `depth`): render the map at the ESTIMATED
        # pose of frame t and compare against GT geometry rendered from
        # that SAME pose. The map lives in the (drifted) estimated frame —
        # rendering it from the GT pose conflates trajectory drift (which
        # ATE already measures) with fusion/render error; the synthetic
        # scene lets us render GT depth at any pose, so we can decouple
        # them exactly. `depth_gtpose` keeps the reference-style
        # GT-pose comparison (drift included) for continuity.
        te = time.perf_counter()
        ev_t = dict(rc=0.0, gt=0.0, sgm=0.0, met=0.0)
        for t in eval_frames:
            T_est = next((np.asarray(Tp, np.float32)
                          for f, Tp in reversed(system.slam.pose_history)
                          if f == t), None)
            if T_est is None:
                continue
            eval_ids.append(t)
            T_est = jnp.asarray(T_est)
            t_rc = time.perf_counter()
            if len(system.slam.submaps.maps) > 1:
                # multi-submap run: score the composite (active map alone
                # misses geometry owned by earlier submaps). respill=False:
                # spilled submaps stay resident for the whole eval burst
                # (round-3 record paid a ~190 MB restore+evict round trip
                # PER eval frame -> 0.4 fps); the budget is re-enforced
                # right after, and clean restores evict for free
                rc = np.asarray(system.slam.raycast_composite(
                    T_est, respill=False, ghost=True).depth)
            else:
                rc = np.asarray(system.slam.raycast_view(T_est).depth)
            ev_t["rc"] += time.perf_counter() - t_rc
            t_gt = time.perf_counter()
            _, gt_at_est = synthetic.render_view(T_est, intr, scene)
            gtd_e = np.array(gt_at_est)
            ev_t["gt"] += time.perf_counter() - t_gt
            gtd_e[gtd_e > cfg.tsdf.max_depth_m] = 0.0
            t_met = time.perf_counter()
            dm_acc.append(depth_metrics.depth_metrics(
                rc, gtd_e, min_depth=z_floor, max_depth=cfg.tsdf.max_depth_m))
            ev_t["met"] += time.perf_counter() - t_met
            # reference-style: same render scored against GT depth at the
            # TRUE pose (pose drift leaks in, as it does on real data)
            t_gt = time.perf_counter()
            T_gt = jnp.asarray(gt[t])
            _, gt_d = synthetic.render_view(T_gt, intr, scene)
            gtd = np.array(gt_d)
            ev_t["gt"] += time.perf_counter() - t_gt
            gtd[gtd > cfg.tsdf.max_depth_m] = 0.0
            t_met = time.perf_counter()
            dm_gt_acc.append(depth_metrics.depth_metrics(
                rc, gtd, min_depth=z_floor, max_depth=cfg.tsdf.max_depth_m))
            ev_t["met"] += time.perf_counter() - t_met
            t_sgm = time.perf_counter()
            if args.sensor in ("rgbd", "mono"):
                d_in = np.asarray(rights[t - base])   # the supplied depth
            else:
                d_in, v_in = _sgm_eval(lefts[t - base], rights[t - base])
                d_in = np.asarray(jnp.where(v_in, d_in, 0.0))
            ev_t["sgm"] += time.perf_counter() - t_sgm
            t_met = time.perf_counter()
            dm_in_acc.append(depth_metrics.depth_metrics(
                d_in, gtd, min_depth=z_floor,
                max_depth=cfg.tsdf.max_depth_m))
            ev_t["met"] += time.perf_counter() - t_met
        if eval_frames and len(system.slam.submaps.maps) > 1:
            # re-enforce the budget after the eval burst (composite ran
            # with respill=False); untouched restores evict for free
            t_enf = time.perf_counter()
            system.slam.submaps.enforce_memory_budget()
            ev_t["enforce"] = time.perf_counter() - t_enf
        if eval_frames and os.environ.get("DSL_EVAL_TIMERS"):
            print(f"    eval@{eval_frames}: " + " ".join(
                f"{k}={v:.1f}s" for k, v in ev_t.items()), flush=True)
        eval_s += time.perf_counter() - te
        _prefetch_next()

        if (base // ck) % 4 == 0:
            el = time.perf_counter() - t0
            print(f"  frame {hi}/{n_total}  {hi/el:5.1f} fps  "
                  f"loops={system.num_loops} corr={system.num_corrections} "
                  f"culled={system.num_culled} "
                  f"mem={system.memory_bytes()/1e6:.0f}MB", flush=True)
    system.finish()
    wall = time.perf_counter() - t0
    fps = n_total / wall
    fps_steady = ((n_total - steady_frame0)
                  / max(time.perf_counter() - t_steady, 1e-9)
                  if t_steady is not None else fps)

    # ---- trajectory metrics --------------------------------------------
    est = [T for _, T in system.trajectory()]
    gtl = [gt[i] for i in range(len(est))]
    ate = traj_metrics.ate_rmse(est, gtl)
    rpe_d = traj_metrics.rpe(est, gtl)
    kitti = traj_metrics.kitti_sequence_errors(est, gtl)
    end_err = float(np.linalg.norm(est[-1][:3, 3] - gtl[-1][:3, 3]))

    dm = {k: float(np.nanmean([d[k] for d in dm_acc]))
          for k in dm_acc[0]} if dm_acc else {}
    dm_gt = {k: float(np.nanmean([d[k] for d in dm_gt_acc]))
             for k in dm_gt_acc[0]} if dm_gt_acc else {}
    dm_in = {k: float(np.nanmean([d[k] for d in dm_in_acc]))
             for k in dm_in_acc[0]} if dm_in_acc else {}

    rec = dict(
        sensor=args.sensor,
        frames=n_total, width=w, height=h, radius_m=args.radius,
        photo_noise=args.photo_noise, gain_amp=args.gain_amp,
        keyframe_every=args.keyframe_every,
        backend=jax.default_backend(),
        chunk=args.chunk, blackout=args.blackout,
        slide_max_age=args.slide_max_age, decay_min_age=args.decay_min_age,
        depth_eval_every=args.depth_eval_every,
        depth_eval_min_m=round(z_floor, 3),
        health_ms_pre=round(health_pre, 3),
        health_ms_post=round(_health_ms(), 3),
        fps=round(fps, 2), fps_steady=round(fps_steady, 2),
        fps_pipeline=round(proc_frames / max(proc_s, 1e-9), 2),
        wall_s=round(wall, 1), synth_s=round(synth_s, 1),
        eval_s=round(eval_s, 1), warmup_s=round(warm_s, 1),
        phase_s={k: round(v, 1) for k, v in sorted(
            {**system.phase_s, **system.backend.phase_s}.items())},
        tracking_lost_frames=lost,
        loops=system.num_loops, corrections=system.num_corrections,
        # retrieval-margin telemetry: accepted detections + the
        # best-rejected candidate per detect call (VERDICT r3 item 10)
        loop_margins=[lg for lg in system.backend.loop_log
                      if lg["sim_best"] is not None][-40:],
        culled=system.num_culled, relocs=system.num_relocs,
        dwell=args.dwell,
        # redundancy-fraction the cull trigger saw per BA window (how far
        # from firing culling sat over the drive)
        cull_margin_max=(max(system.backend.cull_margins)
                         if system.backend.cull_margins else None),
        cull_margin_last10=[round(x, 3)
                            for x in system.backend.cull_margins[-10:]],
        ba_rejects=system.backend.ba_rejects,
        pg_rejects=system.backend.pg_rejects,
        keyframes=system.backend.num_keyframes,
        submaps=len(system.slam.submaps.maps),
        submaps_on_host=sum(
            1 for i in range(len(system.slam.submaps.maps))
            if system.slam.submaps.is_on_host(i)),
        final_map_mb=round(system.memory_bytes() / 1e6, 1),
        memory=system.slam.memory_report(),
        ate_rmse_m=round(ate, 4), end_error_m=round(end_err, 4),
        **{k: round(v, 5) for k, v in rpe_d.items()},
        **{("kitti_" + k): round(v, 5) for k, v in kitti.items()},
        depth=({k: round(v, 4) for k, v in dm.items()} if dm else None),
        depth_gtpose=({k: round(v, 4) for k, v in dm_gt.items()}
                      if dm_gt else None),
        depth_input=({k: round(v, 4) for k, v in dm_in.items()}
                     if dm_in else None),
        # per-eval-frame spread: the headline depth numbers average only
        # ~6-20 frames, so one catastrophic frame dominates the mean —
        # keep the per-frame values visible for outlier diagnosis
        depth_per_frame=dict(
            frame=eval_ids,
            absrel=[round(d["absrel"], 4) for d in dm_gt_acc],
            absrel_estpose=[round(d["absrel"], 4) for d in dm_acc],
            absrel_input=[round(d["absrel"], 4) for d in dm_in_acc],
            mae=[round(d["mae"], 3) for d in dm_gt_acc],
            coverage=[round(d["coverage"], 3) for d in dm_gt_acc],
        ) if dm_gt_acc else None,
    )
    print(json.dumps(rec))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(rec, f, indent=1)
        # append-only run history beside the latest-run file: bench.py
        # quotes fps_steady as the median/range over matching-config runs
        # (single runs varied 10.8-14.7 fps at identical config — quoting
        # whichever run is current oversold or undersold the system)
        hist = os.path.splitext(args.json)[0] + "_history.jsonl"
        with open(hist, "a") as f:
            f.write(json.dumps(rec) + "\n")
    if args.out:
        with open(args.out, "a") as f:
            f.write(f"\n## Long-drive validation "
                    f"({time.strftime('%Y-%m-%d')}, "
                    f"{jax.default_backend()})\n\n")
            f.write("```json\n" + json.dumps(rec, indent=1) + "\n```\n")


if __name__ == "__main__":
    main()
