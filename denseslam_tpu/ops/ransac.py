"""Stereo visual odometry: RANSAC + Gauss-Newton on 4-way reprojection.

Math target = the reference's `VisualOdometryStereo::estimateMotion`
(reference: src/libviso2/src/viso_stereo.cpp:64-193 — triangulate previous
frame from disparity, 200 RANSAC rounds of 3-point Gauss-Newton, inliers by
2 px 4-way reprojection, inlier refit), used as the analytic oracle for
tests. TPU re-design: ALL hypotheses run simultaneously via `vmap` — each
RANSAC round is a batched 3-point GN solve, inlier counting is one batched
(K, N) reduction, and the final refit is a masked GN over all matches. No
data-dependent loops; the whole solver is one jitted program.

Convention: returns T_prev_curr a.k.a. "T_delta" with
p_curr = R p_prev + t, i.e. the transform taking previous-camera-frame
points to the current camera frame (the reference's Tr_delta inverse
composition is handled by the caller).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import FrontendConfig
from ..utils import lie
from ..utils.camera import StereoRig
from .matching import QuadMatches
from .smallsolve import solve_spd6


class VOResult(NamedTuple):
    T_delta: jax.Array      # (4, 4) prev-cam -> curr-cam
    inliers: jax.Array      # bool (N,)
    num_inliers: jax.Array  # i32
    ok: jax.Array           # bool — solution trustworthy


def triangulate_prev(q: QuadMatches, rig: StereoRig):
    """Previous-frame 3D points from stereo disparity
    (reference math: viso_stereo.cpp:99-105)."""
    intr = rig.intr
    disp = jnp.maximum(q.uv_lp[:, 0] - q.uv_rp[:, 0], 1e-3)
    base = rig.baseline_m
    z = intr.fx * base / disp
    x = (q.uv_lp[:, 0] - intr.cx) * base / disp
    y = (q.uv_lp[:, 1] - intr.cy) * base / disp * (intr.fx / intr.fy)
    pts = jnp.stack([x, y, z], axis=-1)
    ok = q.valid & (disp > 0.5) & (z > 0.1) & (z < 100.0)
    return pts, ok


def _reproject_residuals(xi_T, pts_prev, obs_l, obs_r, rig: StereoRig):
    """4-way reprojection residuals (N, 4): left u,v + right u,v."""
    intr = rig.intr
    p = lie.transform_points(xi_T, pts_prev)
    z = jnp.maximum(p[..., 2], 1e-6)
    ul = p[..., 0] / z * intr.fx + intr.cx
    vl = p[..., 1] / z * intr.fy + intr.cy
    ur = (p[..., 0] - rig.baseline_m) / z * intr.fx + intr.cx
    vr = vl
    return jnp.stack(
        [ul - obs_l[..., 0], vl - obs_l[..., 1],
         ur - obs_r[..., 0], vr - obs_r[..., 1]],
        axis=-1,
    ), p


def _gn_jacobian(p, rig: StereoRig):
    """Analytic Jacobian of the 4 residuals wrt the left-multiplied twist
    [v, w]: (N, 4, 6). Oracle: viso_stereo.cpp:283-400."""
    intr = rig.intr
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    z = jnp.maximum(z, 1e-6)
    iz = 1.0 / z
    iz2 = iz * iz

    def duv_dp(xc):
        # d(u)/d(p) for u = fx * xc / z + cx where xc is x (left) or x-B (right)
        du = jnp.stack([intr.fx * iz, jnp.zeros_like(z), -intr.fx * xc * iz2], axis=-1)
        dv = jnp.stack([jnp.zeros_like(z), intr.fy * iz, -intr.fy * y * iz2], axis=-1)
        return du, dv

    dul, dvl = duv_dp(x)
    dur, dvr = duv_dp(x - rig.baseline_m)
    J_p = jnp.stack([dul, dvl, dur, dvr], axis=-2)      # (N, 4, 3)

    # dp/dxi = [I | -[p]x]
    zero = jnp.zeros_like(z)
    px = jnp.stack(
        [
            jnp.stack([zero, z, -y], axis=-1),
            jnp.stack([-z, zero, x], axis=-1),
            jnp.stack([y, -x, zero], axis=-1),
        ],
        axis=-2,
    )                                                    # (N, 3, 3) = -[p]x
    dp_dxi = jnp.concatenate(
        [jnp.broadcast_to(jnp.eye(3, dtype=p.dtype), p.shape[:-1] + (3, 3)), px],
        axis=-1,
    )                                                    # (N, 3, 6)
    return J_p @ dp_dxi                                  # (N, 4, 6)


def _gn_refine(T0, pts_prev, obs_l, obs_r, weights, rig, iters: int):
    """Masked Gauss-Newton; weights (N,) select/weight correspondences."""

    def body(_, T):
        r, p = _reproject_residuals(T, pts_prev, obs_l, obs_r, rig)
        J = _gn_jacobian(p, rig)
        JTw = J * weights[:, None, None]
        A = jnp.einsum("nri,nrj->ij", JTw, J)
        b = jnp.einsum("nri,nr->i", JTw, r)
        damp = 1e-6 * jnp.trace(A) + 1e-9
        xi = -solve_spd6(A + damp * jnp.eye(6, dtype=A.dtype), b)
        # guard divergent steps
        xi = jnp.clip(xi, -0.5, 0.5)
        return lie.se3_exp(xi) @ T

    # UNROLLED (iters is static, <= ~12): a fori_loop pays while-loop
    # bookkeeping per iteration on tensors this small — straight-line code
    # lets XLA schedule the whole refinement without loop overhead
    T = T0
    for it in range(iters):
        T = body(it, T)
    return T


def estimate_stereo_motion(
    q: QuadMatches,
    rig: StereoRig,
    cfg: FrontendConfig,
    key: jax.Array,
    T_init: jax.Array | None = None,
    budget_scale: jax.Array | None = None,
) -> VOResult:
    """Full RANSAC + refit solver over quad matches.

    budget_scale (device f32 scalar in (0, 1], optional) is the PD
    feature-budget controller's knob (reference: DenseSlam.h:382-409 — the
    reference modulates the ORB feature count to hold the target frame
    time; under jit feature caps are compile-time constants, so the
    runtime-variable knob here is the RANSAC hypothesis budget): only the
    first ceil(K * budget_scale) hypotheses may win the consensus vote."""
    n = q.uv_lc.shape[0]
    pts_prev, ok = triangulate_prev(q, rig)
    obs_l = q.uv_lc
    obs_r = q.uv_rc
    okf = ok.astype(jnp.float32)
    n_ok = jnp.sum(okf)

    # --- hypotheses: K x 3 random correspondences (bias toward valid ones
    # by sampling from a shuffled valid-first ordering) -------------------
    k = cfg.ransac_iters
    order = jnp.argsort(~ok, stable=True)       # valid indices first
    # sample within [0, n_ok) — modulo keeps indices on valid entries
    raw = jax.random.randint(key, (k, 3), 0, jnp.iinfo(jnp.int32).max)
    denom = jnp.maximum(n_ok.astype(jnp.int32), 3)
    sel = order[raw % denom]                    # (K, 3) indices into matches

    eye = jnp.eye(4, dtype=jnp.float32)
    T0 = eye if T_init is None else T_init

    def solve_one(idx3):
        pts = pts_prev[idx3]
        ol = obs_l[idx3]
        orr = obs_r[idx3]
        w = jnp.ones((3,), jnp.float32)
        return _gn_refine(T0, pts, ol, orr, w, rig, cfg.gn_iters)

    T_hyp = jax.vmap(solve_one)(sel)                          # (K, 4, 4)

    # --- inlier counting: batched residuals over all matches -------------
    def count(T):
        r, _ = _reproject_residuals(T, pts_prev, obs_l, obs_r, rig)
        good = jnp.all(jnp.abs(r) < cfg.ransac_thresh_px, axis=-1) & ok
        return jnp.sum(good.astype(jnp.int32)), good

    counts, inlier_sets = jax.vmap(count)(T_hyp)              # (K,), (K, N)
    if budget_scale is not None:
        k_active = jnp.ceil(
            jnp.float32(k) * jnp.clip(budget_scale, 1.0 / k, 1.0)
        ).astype(jnp.int32)
        active = jnp.arange(k, dtype=jnp.int32) < jnp.maximum(k_active, 1)
        counts = jnp.where(active, counts, -1)
    best = jnp.argmax(counts)
    best_inliers = inlier_sets[best]
    best_T = T_hyp[best]

    # --- refit on inliers -------------------------------------------------
    w = best_inliers.astype(jnp.float32)
    if cfg.edge_reweighting:
        # reference reweighting: features near the horizontal image centre
        # weigh more in the refit (viso_stereo.cpp:327-331,
        # weight = 1 / (|u - cu| / |cu| + 0.05))
        cu = rig.intr.cx
        w = w / (jnp.abs(obs_l[:, 0] - cu) / abs(cu) + 0.05)
    T_refined = _gn_refine(best_T, pts_prev, obs_l, obs_r, w, rig,
                           cfg.refine_iters)
    _, final_inliers = count(T_refined)
    num = jnp.sum(final_inliers.astype(jnp.int32))
    ok_solution = num >= 6
    T_final = jnp.where(ok_solution, T_refined, T0)
    return VOResult(T_delta=T_final, inliers=final_inliers,
                    num_inliers=num, ok=ok_solution)
