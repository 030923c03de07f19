#!/usr/bin/env python
"""Bisect the stereo-VO solver chain against a float64 oracle (VERDICT r3
item 1).

Context: identical code produced flagship ATE 0.229 m on one remote
compiler stack and 0.819 m on the next (open-loop t_err 0.33% -> 1.22%),
with the drift isolated to VO numerics (RESULTS.md "Compiler-stack
numerics drift"). The reference runs its whole motion estimator in double
precision (reference: src/libviso2/src/matrix.h:44-45,
viso_stereo.cpp:283-400); our RANSAC/GN chain is f32. This probe captures
the REAL per-frame solver inputs (quad matches, PRNG key, warm-start pose)
from the production frontend on the synthetic loop drive, then re-runs the
solver chain per stage in f32 and f64 to find where f32 output diverges at
the stack-sensitive level:

  S1  hypothesis 3-point GN solves  (same sampled triplets)
  S2  consensus vote (inlier counts / argmax winner flips)
  S3  final refit GN, SAME winner pose + SAME inlier weights
  S4  full solver end-to-end
  S5  perturbation sensitivity: re-run f32 with +-0.001 px jitter on the
      match coordinates — a direct proxy for "a different op lowering
      rounded differently upstream"

Run on CPU (f64 needs x64): python scripts/probes/exp_vo_numerics.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from denseslam_tpu.config import SystemConfig, TsdfConfig, StereoConfig
from denseslam_tpu.io import synthetic
from denseslam_tpu.models import frontend
from denseslam_tpu.ops import ransac
from denseslam_tpu.utils import lie
from denseslam_tpu.utils.camera import Intrinsics, StereoRig


def _pose_diff(Ta, Tb):
    """(rot deg, trans m) between two 4x4s."""
    Ta = np.asarray(Ta, np.float64)
    Tb = np.asarray(Tb, np.float64)
    R = Ta[:3, :3].T @ Tb[:3, :3]
    c = np.clip((np.trace(R) - 1) / 2, -1, 1)
    return float(np.degrees(np.arccos(c))), float(
        np.linalg.norm(Ta[:3, 3] - Tb[:3, 3]))


def _cast_q(q, dtype):
    return q._replace(
        uv_lc=q.uv_lc.astype(dtype), uv_rc=q.uv_rc.astype(dtype),
        uv_lp=q.uv_lp.astype(dtype), uv_rp=q.uv_rp.astype(dtype))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=96,
                    help="how many frames of the drive to probe")
    ap.add_argument("--loop-frames", type=int, default=500,
                    help="frames in the FULL loop — sets per-frame motion; "
                    "500 matches the flagship drive (0.226 m / 0.72 deg "
                    "per frame)")
    ap.add_argument("--width", type=int, default=1226)
    ap.add_argument("--height", type=int, default=370)
    ap.add_argument("--radius", type=float, default=18.0)
    ap.add_argument("--photo-noise", type=float, default=2.0)
    ap.add_argument("--max-features", type=int, default=0,
                    help="override frontend.max_features (0 = default)")
    ap.add_argument("--max-per-bucket", type=int, default=0)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    w, h = args.width, args.height
    scale = w / 1226.0
    intr = Intrinsics(fx=707.09 * scale, fy=707.09 * scale,
                      cx=(w - 1) / 2.0, cy=(h - 1) / 2.0, width=w, height=h)
    rig = StereoRig(intr=intr, baseline_m=0.537)
    cfg = SystemConfig(rig=rig, tsdf=TsdfConfig(table_slots=1 << 10),
                       stereo=StereoConfig(max_disparity=64))
    if args.max_features:
        import dataclasses
        cfg = dataclasses.replace(cfg, frontend=dataclasses.replace(
            cfg.frontend, max_features=args.max_features,
            max_per_bucket=args.max_per_bucket or cfg.frontend.max_per_bucket))
    fc = cfg.frontend

    n = args.frames
    gt_full = synthetic.make_loop_trajectory(args.loop_frames,
                                             radius_m=args.radius,
                                             closure_frames=44)
    scene = synthetic.loop_scene(gt_full)
    gt = gt_full[:n]
    step_m = float(np.linalg.norm(
        (np.linalg.inv(gt[1]) @ gt[0])[:3, 3]))

    # ---- capture the production frontend's solver inputs ----------------
    CAP = []
    orig = ransac.estimate_stereo_motion

    def capturing(q, rig_, fc_, key, T_init=None, budget_scale=None):
        CAP.append((q, key, jnp.eye(4, jnp.float32) if T_init is None
                    else T_init))
        return orig(q, rig_, fc_, key, T_init=T_init,
                    budget_scale=budget_scale)

    ransac.estimate_stereo_motion = capturing

    def step_cap(state, l, r):
        CAP.clear()
        ns, out = frontend.vo_step(state, l, r, cfg)
        q, key, T_init = CAP[-1]
        return ns, out, q, key, T_init

    step_j = jax.jit(step_cap)

    @jax.jit
    def _noise(lg, rg, i):
        # same photometric nuisance as long_drive_eval: slow exposure ramp
        # + per-pixel sensor noise
        fi = jnp.asarray(i, jnp.float32)
        g = 1.0 + 0.15 * jnp.sin(2 * jnp.pi * fi / 150.0)
        k = jax.random.fold_in(jax.random.PRNGKey(0), i)
        kl, kr = jax.random.split(k)
        nl = args.photo_noise * jax.random.normal(kl, lg.shape, jnp.float32)
        nr = args.photo_noise * jax.random.normal(kr, rg.shape, jnp.float32)
        return jnp.clip(lg * g + nl, 0, 255), jnp.clip(rg * g + nr, 0, 255)

    print(f"rendering + capturing {n} frames...", flush=True)
    state = frontend.init_frontend(cfg)
    caps = []
    t0 = time.time()
    CHUNK = 16
    for base in range(0, n, CHUNK):
        hi = min(base + CHUNK, n)
        lg, rg, _ = synthetic.render_stereo_trajectory(gt[base:hi], rig,
                                                       scene)
        for i in range(hi - base):
            l, r = _noise(lg[i], rg[i], base + i)
            state, out, q, key, T_init = step_j(
                state, l.astype(jnp.float32), r.astype(jnp.float32))
            caps.append(dict(
                q=jax.tree.map(np.asarray, q), key=np.asarray(key),
                T_init=np.asarray(T_init),
                T_delta=np.asarray(out.T_delta),
                ok=bool(out.tracking_ok)))
    print(f"capture done in {time.time()-t0:.1f} s", flush=True)

    # ---- per-stage f32 vs f64 re-solve ----------------------------------
    def stages(q, key, T_init, dtype):
        """Runs the solver chain at `dtype`, returning per-stage results."""
        q = _cast_q(q, dtype)
        T_init = T_init.astype(dtype)
        pts_prev, ok = ransac.triangulate_prev(q, rig)
        obs_l, obs_r = q.uv_lc, q.uv_rc
        okf = ok.astype(dtype)
        n_ok = jnp.sum(okf)
        k = fc.ransac_iters
        order = jnp.argsort(~ok, stable=True)
        raw = jax.random.randint(key, (k, 3), 0, jnp.iinfo(jnp.int32).max)
        denom = jnp.maximum(n_ok.astype(jnp.int32), 3)
        sel = order[raw % denom]

        def solve_one(idx3):
            return ransac._gn_refine(
                T_init, pts_prev[idx3], obs_l[idx3], obs_r[idx3],
                jnp.ones((3,), dtype), rig, fc.gn_iters)

        T_hyp = jax.vmap(solve_one)(sel)

        def count(T):
            r, _ = ransac._reproject_residuals(T, pts_prev, obs_l, obs_r,
                                               rig)
            good = jnp.all(jnp.abs(r) < fc.ransac_thresh_px, axis=-1) & ok
            return jnp.sum(good.astype(jnp.int32)), good

        counts, inlier_sets = jax.vmap(count)(T_hyp)
        best = jnp.argmax(counts)
        wfit = inlier_sets[best].astype(dtype)
        if fc.edge_reweighting:
            cu = rig.intr.cx
            wfit = wfit / (jnp.abs(obs_l[:, 0] - cu) / abs(cu) + 0.05)
        T_ref = ransac._gn_refine(T_hyp[best], pts_prev, obs_l, obs_r,
                                  wfit, rig, fc.refine_iters)
        return dict(T_hyp=T_hyp, counts=counts, best=best,
                    inliers=inlier_sets[best], T_refined=T_ref,
                    pts_prev=pts_prev, obs_l=obs_l, obs_r=obs_r, wfit=wfit)

    def refit_only(sres64, q, dtype):
        """S3: refit at `dtype` from the ORACLE's winner + inlier weights."""
        q = _cast_q(q, dtype)
        pts_prev, _ = ransac.triangulate_prev(q, rig)
        return ransac._gn_refine(
            sres64["T_hyp"][sres64["best"]].astype(dtype), pts_prev,
            q.uv_lc, q.uv_rc, sres64["wfit"].astype(dtype), rig,
            fc.refine_iters)

    stages32 = jax.jit(lambda q, k, t: stages(q, k, t, jnp.float32))
    stages64 = jax.jit(lambda q, k, t: stages(q, k, t, jnp.float64))

    rows = []
    per = dict(s1_dt=[], s2_flip=[], s2_cdiff=[], s3_dt=[], s3_dr=[],
               s4_dt=[], s4_dr=[], s5_dt=[], s5_dr=[],
               e32_dt=[], e64_dt=[], e32_dr=[], inl_ham=[],
               e_par=[], e_perp=[], n_inl=[])
    rng = np.random.default_rng(7)
    for t in range(1, n):      # frame 0 has no previous frame
        c = caps[t]
        q = jax.tree.map(jnp.asarray, c["q"])
        key, T_init = jnp.asarray(c["key"]), jnp.asarray(c["T_init"])
        s32 = jax.tree.map(np.asarray, stages32(q, key, T_init))
        s64 = jax.tree.map(np.asarray, stages64(q, key, T_init))

        # S1: hypothesis solves (same triplets)
        d1 = [_pose_diff(a, b)[1] for a, b in
              zip(s32["T_hyp"][:32], s64["T_hyp"][:32])]
        per["s1_dt"].append(float(np.median(d1)))
        # S2: consensus
        per["s2_flip"].append(int(s32["best"] != s64["best"]))
        per["s2_cdiff"].append(
            int(np.abs(s32["counts"] - s64["counts"]).max()))
        # S3: refit only (same winner + weights from the oracle)
        r32 = np.asarray(refit_only(
            jax.tree.map(jnp.asarray, s64), q, jnp.float32))
        r64 = np.asarray(refit_only(
            jax.tree.map(jnp.asarray, s64), q, jnp.float64))
        dr3, dt3 = _pose_diff(r32, r64)
        per["s3_dr"].append(dr3)
        per["s3_dt"].append(dt3)
        # S4: end-to-end
        dr4, dt4 = _pose_diff(s32["T_refined"], s64["T_refined"])
        per["s4_dr"].append(dr4)
        per["s4_dt"].append(dt4)
        per["inl_ham"].append(int((s32["inliers"] != s64["inliers"]).sum()))
        # S5: f32 sensitivity to 1e-3 px input jitter
        qj = c["q"]
        jit_uv = lambda a: a + rng.uniform(-1e-3, 1e-3,
                                           a.shape).astype(np.float32)
        qj = qj._replace(uv_lc=jit_uv(qj.uv_lc), uv_rc=jit_uv(qj.uv_rc),
                         uv_lp=jit_uv(qj.uv_lp), uv_rp=jit_uv(qj.uv_rp))
        sj = jax.tree.map(np.asarray, stages32(
            jax.tree.map(jnp.asarray, qj), key, T_init))
        dr5, dt5 = _pose_diff(s32["T_refined"], sj["T_refined"])
        per["s5_dr"].append(dr5)
        per["s5_dt"].append(dt5)
        # each vs ground truth relative motion
        T_gt = np.linalg.inv(gt[t]) @ gt[t - 1]
        per["e32_dt"].append(_pose_diff(s32["T_refined"], T_gt)[1])
        per["e64_dt"].append(_pose_diff(s64["T_refined"], T_gt)[1])
        per["e32_dr"].append(_pose_diff(s32["T_refined"], T_gt)[0])
        # error decomposition: parallel (scale bias) vs perpendicular
        tg = T_gt[:3, 3]
        e = np.asarray(s32["T_refined"], np.float64)[:3, 3] - tg
        u = tg / max(np.linalg.norm(tg), 1e-9)
        per["e_par"].append(float(e @ u))
        per["e_perp"].append(float(np.linalg.norm(e - (e @ u) * u)))
        per["n_inl"].append(int(np.asarray(s32["inliers"]).sum()))

    def stats(v):
        v = np.asarray(v, np.float64)
        return dict(med=float(np.median(v)), p90=float(np.percentile(v, 90)),
                    max=float(v.max()), mean=float(v.mean()))

    rep = {k: stats(v) for k, v in per.items()}
    rep["n_frames"] = n
    print(json.dumps(rep, indent=1))

    print("\n--- interpretation aids ---")
    print(f"S2 winner flips: {sum(per['s2_flip'])}/{n-1} frames; "
          f"max count diff {max(per['s2_cdiff'])}")
    print(f"inlier-set hamming (end): med {np.median(per['inl_ham']):.0f} "
          f"max {max(per['inl_ham'])}")
    print(f"S3 refit-only f32 error:  med {rep['s3_dt']['med']:.2e} m, "
          f"p90 {rep['s3_dt']['p90']:.2e}")
    print(f"S4 end-to-end f32 error:  med {rep['s4_dt']['med']:.2e} m, "
          f"p90 {rep['s4_dt']['p90']:.2e}")
    print(f"S5 1e-3px-jitter response: med {rep['s5_dt']['med']:.2e} m")
    print(f"per-frame |err| vs GT: f32 {rep['e32_dt']['med']:.2e} m / "
          f"f64 {rep['e64_dt']['med']:.2e} m (median)")
    ep = np.asarray(per["e_par"])
    print(f"parallel (scale) bias: mean {ep.mean():+.4f} m  std {ep.std():.4f}"
          f"  (GT step {step_m:.3f} m -> bias {100*ep.mean()/step_m:+.2f}%)")
    print(f"perp err: med {np.median(per['e_perp']):.4f} m; "
          f"rot err med {np.median(per['e32_dr']):.3f} deg; "
          f"inliers med {np.median(per['n_inl']):.0f}")
    if args.json:
        with open(args.json, "w") as f:
            json.dump(rep, f, indent=1)


if __name__ == "__main__":
    main()
