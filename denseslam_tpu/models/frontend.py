"""Sparse VO frontend as a pure, jittable state machine.

Capability target: the reference's per-frame sparse tracking path — libviso2
stereo odometry driven from DenseSlam::ProcessFrame's async lambda
(reference: src/DenseSLAM/DenseSlam.cpp:60-86) and the SparseSFProvider
surface (reference: src/DenseSLAM/InstRecLib/SparseSFProvider.h:52-79).
The CPU-thread asynchrony (P1 in SURVEY.md section 2c) is replaced by a
fused device program: detection, quad matching, and the vmapped RANSAC
solver all live in one jit step, so "overlap" comes from XLA scheduling
rather than host threads.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..config import SystemConfig
from ..ops import features as feat_ops
from ..ops import matching, mono, ransac
from ..utils import lie


class FrontendState(NamedTuple):
    feats_l: feat_ops.Features   # previous-frame left features
    feats_r: feat_ops.Features   # previous-frame right features
    disp_l: jax.Array            # (N,) prev-left stereo disparity, -1 invalid
    disp_r: jax.Array            # (N,) prev-right disparity, -1 invalid
    T_wc: jax.Array              # current camera-to-world estimate
    T_delta_prev: jax.Array      # last inter-frame motion (warm start / fallback)
    initialized: jax.Array       # bool — has a previous frame
    prior_ok: jax.Array          # bool — last RANSAC succeeded (trust the
                                 # constant-velocity prior for gating)
    key: jax.Array               # PRNG key for RANSAC sampling
    frame: jax.Array             # i32 frame counter
    img_l: jax.Array             # (H, W) previous exposure-compensated left
                                 # image — gain-estimation + subpixel-
                                 # refinement anchor
    img_r: jax.Array             # (H, W) previous right image (subpixel
                                 # refinement of the rp quad corner)
    exposure: jax.Array          # f32 scalar multiplicative exposure
                                 # compensation (matcher gain loop,
                                 # reference: matcher.cpp:291-333)


class VOOutput(NamedTuple):
    T_wc: jax.Array
    T_delta: jax.Array           # prev-cam -> curr-cam
    num_inliers: jax.Array
    num_quads: jax.Array
    tracking_ok: jax.Array       # bool (reference GetTrackingState()==OK)
    # matched prev->curr flow vectors for the GUI scene-flow pane
    # (reference: VisoSparseSFProvider::GetFlow rendered by
    # DenseSLAMGUI.cpp:216-220); (M, 2) px, valid (M,)
    flow_uv_prev: jax.Array
    flow_uv_curr: jax.Array
    flow_valid: jax.Array


def _empty_features(cfg: SystemConfig) -> feat_ops.Features:
    n = cfg.frontend.max_features
    return feat_ops.Features(
        uv=jnp.zeros((n, 2), jnp.float32),
        cls=jnp.zeros((n,), jnp.int32),
        desc=jnp.zeros((n, feat_ops.desc_dim(cfg.frontend)), jnp.float32),
        score=jnp.zeros((n,), jnp.float32),
        valid=jnp.zeros((n,), bool),
    )


def init_frontend(cfg: SystemConfig, T_init: jax.Array | None = None,
                  seed: int = 0) -> FrontendState:
    eye = jnp.eye(4, dtype=jnp.float32)
    n = cfg.frontend.max_features
    h, w = cfg.rig.intr.height, cfg.rig.intr.width
    return FrontendState(
        feats_l=_empty_features(cfg),
        feats_r=_empty_features(cfg),
        disp_l=jnp.full((n,), -1.0),
        disp_r=jnp.full((n,), -1.0),
        T_wc=eye if T_init is None else T_init,
        T_delta_prev=eye,
        initialized=jnp.zeros((), bool),
        prior_ok=jnp.zeros((), bool),
        key=jax.random.PRNGKey(seed),
        frame=jnp.zeros((), jnp.int32),
        img_l=jnp.zeros((h, w), jnp.float32),
        img_r=jnp.zeros((h, w), jnp.float32),
        exposure=jnp.ones((), jnp.float32),
    )


def vo_step(
    state: FrontendState,
    left: jax.Array,
    right: jax.Array,
    cfg: SystemConfig,
    budget_scale: jax.Array | None = None,
) -> Tuple[FrontendState, VOOutput]:
    """One frame of stereo VO. Pure function; jit it once per image size.

    budget_scale: optional device scalar from the PD feature-budget
    controller; modulates the RANSAC hypothesis budget (ops/ransac.py)."""
    fc = cfg.frontend
    if fc.gain_normalization:
        # Exposure compensation (the matcher gain loop, reference:
        # matcher.cpp:291-333): images are corrected by the running
        # exposure estimate before feature extraction so SAD/descriptor
        # costs stay comparable across exposure changes; the residual
        # gain measured on this frame's matches updates the estimate
        # (one-frame lag — exact for smooth auto-exposure ramps).
        left = left * state.exposure
        right = right * state.exposure
    f_lc = feat_ops.detect(left, fc)
    f_rc = feat_ops.detect(right, fc)
    f_lc = feat_ops.bucket(f_lc, cfg.rig.intr.width, cfg.rig.intr.height, fc)

    if fc.use_motion_prior_gate:
        # Warm-start matching: gate around positions predicted by the last
        # motion (constant-velocity prior) + per-feature stereo depth.
        # The tight predictive gate only applies while the prior is TRUSTED
        # (last RANSAC succeeded); otherwise disparities are masked out and
        # every feature falls back to the wide gate — a wrong-but-trusted
        # prior after sudden motion onset must not lock tracking out.
        trusted = state.initialized & state.prior_ok
        q = matching.quad_match(
            f_lc, f_rc, state.feats_l, state.feats_r, fc,
            disp_lp=jnp.where(trusted, state.disp_l, -1.0),
            disp_rp=jnp.where(trusted, state.disp_r, -1.0),
            T_pred=state.T_delta_prev, rig=cfg.rig)
    else:
        q = matching.quad_match(f_lc, f_rc, state.feats_l, state.feats_r, fc)
    q = matching.remove_outliers(q, fc)
    if fc.subpixel_refine:
        # Re-anchor the matched positions to the physical surface patch by
        # direct correlation on the raw images — detector peak-locking is
        # the dominant VO noise term (see refine_quad_subpix docstring).
        # Frame 0's prev images are zeros, but every quad is invalid then.
        q = matching.refine_quad_subpix(q, state.img_l, state.img_r,
                                        left, right, fc,
                                        T_pred=state.T_delta_prev, rig=cfg.rig)
    if fc.use_motion_prior_gate:
        # XLA CSE merges this with quad_match's internal stereo match
        disp_lc, disp_rc = matching.stereo_disparities(f_lc, f_rc, fc)
    else:
        n = f_lc.uv.shape[0]
        disp_lc = disp_rc = jnp.full((n,), -1.0)
    key, sub = jax.random.split(state.key)
    res = ransac.estimate_stereo_motion(q, cfg.rig, fc, sub,
                                        T_init=state.T_delta_prev,
                                        budget_scale=budget_scale)

    # Constant-velocity fallback when RANSAC fails (reference keeps the last
    # motion on libviso2 failure, VisoSparseSFProvider.cpp:49-51).
    use_est = state.initialized & res.ok
    T_delta = jnp.where(use_est, res.T_delta, state.T_delta_prev)
    T_delta = jnp.where(state.initialized, T_delta, jnp.eye(4, dtype=jnp.float32))
    T_wc = state.T_wc @ lie.inv_T(T_delta)

    if fc.gain_normalization:
        # residual gain of this (compensated) frame vs the previous one
        # over temporally matched patches; fold into the running estimate
        g = matching.estimate_gain(
            state.img_l, left, q.uv_lp, q.uv_lc,
            q.valid & state.initialized)
        g = jnp.clip(g, 0.7, 1.4)   # trust region per frame
        exposure = jnp.clip(state.exposure / g, 0.25, 4.0)
    else:
        exposure = state.exposure

    new_state = FrontendState(
        feats_l=f_lc,
        feats_r=f_rc,
        disp_l=disp_lc,
        disp_r=disp_rc,
        T_wc=T_wc,
        T_delta_prev=T_delta,
        initialized=jnp.ones((), bool),
        prior_ok=use_est,
        key=key,
        frame=state.frame + 1,
        img_l=left,          # compensated frames: next step's anchors
        img_r=right,
        exposure=exposure,
    )
    out = VOOutput(
        T_wc=T_wc,
        T_delta=T_delta,
        num_inliers=res.num_inliers,
        num_quads=jnp.sum(q.valid.astype(jnp.int32)),
        tracking_ok=use_est | ~state.initialized,
        flow_uv_prev=q.uv_lp,
        flow_uv_curr=q.uv_lc,
        flow_valid=q.valid & state.initialized,
    )
    return new_state, out


def rgbd_vo_step(
    state: FrontendState,
    gray: jax.Array,
    depth: jax.Array,
    cfg: SystemConfig,
) -> Tuple[FrontendState, VOOutput]:
    """One frame of RGB-D VO (reference: orbTrackRGBD,
    OrbSLAMDriver.h:76-86 — feature tracking with sensor depth).

    TPU re-design: the depth image synthesises VIRTUAL right-view
    observations (disparity = fx*B/Z at each feature), turning RGB-D into
    exactly the stereo quad problem — temporal matching, flow consensus,
    and the 4-way-reprojection RANSAC/GN solver all run unchanged. The
    virtual baseline is cfg.rig.baseline_m (any positive value works; it
    cancels through the solver as long as both frames use the same B)."""
    fc = cfg.frontend
    intr = cfg.rig.intr
    f_lc = feat_ops.detect(gray, fc)
    f_lc = feat_ops.bucket(f_lc, intr.width, intr.height, fc)

    # virtual disparity of the current features from the depth image
    ui = jnp.clip(jnp.round(f_lc.uv[:, 0]).astype(jnp.int32), 0,
                  intr.width - 1)
    vi = jnp.clip(jnp.round(f_lc.uv[:, 1]).astype(jnp.int32), 0,
                  intr.height - 1)
    z = depth.reshape(-1)[vi * intr.width + ui]
    disp_lc = jnp.where(f_lc.valid & (z > 0.1),
                        intr.fx * cfg.rig.baseline_m / jnp.maximum(z, 0.1),
                        -1.0)

    if fc.use_motion_prior_gate:
        trusted = state.initialized & state.prior_ok
        pred, pok = matching.predict_uv(
            state.feats_l.uv, jnp.where(trusted, state.disp_l, -1.0),
            state.T_delta_prev, intr.fx, intr.fy, intr.cx, intr.cy,
            cfg.rig.baseline_m)
        m = matching.match_temporal(f_lc, state.feats_l, fc, pred, pok)
    else:
        m = matching.match_temporal(f_lc, state.feats_l, fc)

    n = f_lc.uv.shape[0]
    i_lc = jnp.arange(n, dtype=jnp.int32)
    ok = (m >= 0) & f_lc.valid & (disp_lc > 0.5)
    disp_lp = state.disp_l[jnp.maximum(m, 0)]
    ok = ok & (disp_lp > 0.5)
    uv_lp = state.feats_l.uv[jnp.maximum(m, 0)]
    uv_lc_m = f_lc.uv
    if fc.subpixel_refine:
        # temporal-leg refinement only: the right views are VIRTUAL
        # (disparity synthesized from sensor depth), so only the real
        # lp -> lc correspondence has image support to correlate. The
        # predicted-scale anchor (disp from the sensor depth) carries the
        # stereo path's forward-motion scale compensation.
        uv_lc_m = matching.refine_temporal_subpix(
            state.img_l, gray, uv_lp, f_lc.uv, ok, fc,
            disp_prev=disp_lp, T_pred=state.T_delta_prev, rig=cfg.rig)
    q = matching.QuadMatches(
        idx_lc=i_lc, idx_rc=i_lc, idx_lp=m, idx_rp=m,
        uv_lc=uv_lc_m,
        uv_rc=uv_lc_m - jnp.stack([disp_lc, jnp.zeros_like(disp_lc)], -1),
        uv_lp=uv_lp,
        uv_rp=uv_lp - jnp.stack([disp_lp, jnp.zeros_like(disp_lp)], -1),
        valid=ok,
    )
    q = matching.remove_outliers(q, fc)
    key, sub = jax.random.split(state.key)
    res = ransac.estimate_stereo_motion(q, cfg.rig, fc, sub,
                                        T_init=state.T_delta_prev)

    use_est = state.initialized & res.ok
    T_delta = jnp.where(use_est, res.T_delta, state.T_delta_prev)
    T_delta = jnp.where(state.initialized, T_delta,
                        jnp.eye(4, dtype=jnp.float32))
    T_wc = state.T_wc @ lie.inv_T(T_delta)

    new_state = FrontendState(
        feats_l=f_lc,
        feats_r=state.feats_r,
        disp_l=disp_lc,
        disp_r=state.disp_r,
        T_wc=T_wc,
        T_delta_prev=T_delta,
        initialized=jnp.ones((), bool),
        prior_ok=use_est,
        key=key,
        frame=state.frame + 1,
        img_l=gray,
        img_r=state.img_r,
        exposure=state.exposure,
    )
    out = VOOutput(
        T_wc=T_wc,
        T_delta=T_delta,
        num_inliers=res.num_inliers,
        num_quads=jnp.sum(q.valid.astype(jnp.int32)),
        tracking_ok=use_est | ~state.initialized,
        flow_uv_prev=q.uv_lp,
        flow_uv_curr=q.uv_lc,
        flow_valid=q.valid & state.initialized,
    )
    return new_state, out


def mono_vo_step(
    state: FrontendState,
    left: jax.Array,
    cfg: SystemConfig,
) -> Tuple[FrontendState, VOOutput]:
    """One frame of monocular VO: temporal matching + 8-point RANSAC +
    ground-plane metric scale (the reference's libviso2 mono variant —
    viso_mono.h:56-62 — where scale comes from the calibrated camera
    height). Same state machine as `vo_step`; right features stay empty."""
    fc = cfg.frontend
    intr = cfg.rig.intr
    f_lc = feat_ops.detect(left, fc)
    f_lc = feat_ops.bucket(f_lc, intr.width, intr.height, fc)

    m = matching.match_temporal(f_lc, state.feats_l, fc)     # curr -> prev
    valid = (m >= 0) & f_lc.valid
    uv_prev = state.feats_l.uv[jnp.maximum(m, 0)]
    uv_curr = f_lc.uv
    if fc.subpixel_refine:
        uv_curr = matching.refine_temporal_subpix(
            state.img_l, left, uv_prev, uv_curr, valid, fc)
    if fc.outlier_removal:
        valid = matching.flow_consensus(
            uv_curr,
            uv_curr[:, 0] - uv_prev[:, 0],
            uv_curr[:, 1] - uv_prev[:, 1],
            None,
            valid,
            k=fc.outlier_knn,
            tol_flow=fc.outlier_flow_tol_px,
            tol_disp=fc.outlier_disp_tol_px,
            min_support=fc.outlier_min_support,
        )

    key, sub = jax.random.split(state.key)
    res = mono.estimate_mono_motion(uv_prev, uv_curr, valid, intr, fc, sub)
    sc = mono.estimate_scale_ground(
        res.T_delta, uv_prev, uv_curr, res.inliers, intr,
        fc.camera_height_m, fc.camera_pitch_rad)
    # No visible ground -> hold the previous frame's metric speed instead
    # of the raw unit-norm pose (the reference likewise keeps the last
    # motion when mono scale is unobservable, viso_mono fallback).
    prev_speed = jnp.linalg.norm(state.T_delta_prev[:3, 3])
    scale_fb = jnp.where(state.initialized & (prev_speed > 1e-6),
                         prev_speed, 1.0)
    T_est = mono.apply_scale(res.T_delta,
                             jnp.where(sc.ok, sc.scale, scale_fb))

    use_est = state.initialized & res.ok
    T_delta = jnp.where(use_est, T_est, state.T_delta_prev)
    T_delta = jnp.where(state.initialized, T_delta, jnp.eye(4, dtype=jnp.float32))
    T_wc = state.T_wc @ lie.inv_T(T_delta)

    new_state = FrontendState(
        feats_l=f_lc,
        feats_r=state.feats_r,
        disp_l=state.disp_l,    # mono: no stereo disparity
        disp_r=state.disp_r,
        T_wc=T_wc,
        T_delta_prev=T_delta,
        initialized=jnp.ones((), bool),
        prior_ok=use_est,
        key=key,
        frame=state.frame + 1,
        img_l=left,
        img_r=state.img_r,
        exposure=state.exposure,
    )
    out = VOOutput(
        T_wc=T_wc,
        T_delta=T_delta,
        num_inliers=res.num_inliers,
        num_quads=jnp.sum(valid.astype(jnp.int32)),
        tracking_ok=use_est | ~state.initialized,
        flow_uv_prev=uv_prev,
        flow_uv_curr=uv_curr,
        flow_valid=valid & state.initialized,
    )
    return new_state, out
