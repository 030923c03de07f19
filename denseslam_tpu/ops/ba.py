"""Local bundle adjustment: batched Gauss-Newton with Schur complement.

Capability target: ORB-SLAM2's LocalMapping local BA (g2o levenberg +
Schur over the camera-landmark system; reference surface SURVEY.md section
2b — the fork hands optimised keyframes to fusion via
`LocalMapping::getProcessKeyFrames`, OrbSLAMDriver.h:100-102).

TPU re-design: the observation set is a dense (L, K) grid with a validity
mask — every per-observation quantity (residuals, 2x6 / 2x3 Jacobians,
Huber weights) is one batched einsum, the landmark-block inversions are a
batched 3x3 solve, and the Schur complement S = U - W V^-1 W^T contracts on
the MXU. The reduced (6K, 6K) camera system is tiny and dense. Stereo
observations (u_l, v, u_r) anchor scale, as in ORB-SLAM2's stereo BA.

Distribution note (SURVEY.md section 2c P5): every contraction over L below
is a sum over landmarks, so sharding landmarks across devices and `psum`-ing
U/W/b terms gives the distributed Schur-complement BA — see parallel/.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..config import BackendConfig
from ..utils import lie
from .smallsolve import inv3x3
from ..utils.camera import StereoRig


class BAProblem(NamedTuple):
    T_wc: jax.Array       # (K, 4, 4) initial keyframe poses (camera-to-world)
    points_w: jax.Array   # (L, 3) initial landmark positions (world)
    obs: jax.Array        # (L, K, 3) observed (u_l, v, u_r); u_r<0 = mono obs
    obs_mask: jax.Array   # (L, K) bool
    fixed: jax.Array      # (K,) bool — gauge-fixed keyframes
    point_valid: jax.Array  # (L,) bool


class BAResult(NamedTuple):
    T_wc: jax.Array
    points_w: jax.Array
    initial_cost: jax.Array
    final_cost: jax.Array
    num_obs: jax.Array


def _residuals(T_cw, points_w, obs, rig: StereoRig):
    """(L, K, 3) stereo reprojection residuals + camera-frame points."""
    intr = rig.intr
    # p_c[l, k] = R_k p_l + t_k
    p = jnp.einsum("kij,lj->lki", T_cw[:, :3, :3], points_w) + T_cw[None, :, :3, 3]
    z = jnp.maximum(p[..., 2], 1e-6)
    ul = p[..., 0] / z * intr.fx + intr.cx
    v = p[..., 1] / z * intr.fy + intr.cy
    ur = (p[..., 0] - rig.baseline_m) / z * intr.fx + intr.cx
    r = jnp.stack([ul - obs[..., 0], v - obs[..., 1], ur - obs[..., 2]], axis=-1)
    return r, p


def _jacobians(p, rig: StereoRig):
    """J_cam (L, K, 3, 6) wrt camera twist (in camera frame, left-mult on
    T_cw), J_pt (L, K, 3, 3) wrt world point."""
    intr = rig.intr
    x, y = p[..., 0], p[..., 1]
    z = jnp.maximum(p[..., 2], 1e-6)
    iz = 1.0 / z
    iz2 = iz * iz
    zero = jnp.zeros_like(z)
    # d(residual)/d(p_c): rows ul, v, ur
    dul = jnp.stack([intr.fx * iz, zero, -intr.fx * x * iz2], axis=-1)
    dv = jnp.stack([zero, intr.fy * iz, -intr.fy * y * iz2], axis=-1)
    dur = jnp.stack([intr.fx * iz, zero, -intr.fx * (x - rig.baseline_m) * iz2], axis=-1)
    J_p = jnp.stack([dul, dv, dur], axis=-2)            # (L, K, 3, 3)

    # p_c = exp(xi) T_cw X  =>  dp/dxi = [I | -[p_c]x]
    px = jnp.stack(
        [
            jnp.stack([zero, z, -y], axis=-1),
            jnp.stack([-z, zero, x], axis=-1),
            jnp.stack([y, -x, zero], axis=-1),
        ],
        axis=-2,
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=p.dtype), p.shape[:-1] + (3, 3))
    dp_dxi = jnp.concatenate([eye, px], axis=-1)        # (L, K, 3, 6)
    J_cam = J_p @ dp_dxi
    return J_cam, J_p  # J_pt = J_p @ R_k applied later


def _huber_w(r, delta):
    """Huber IRLS weights per observation row (L, K)."""
    n = jnp.linalg.norm(r, axis=-1)
    return jnp.where(n <= delta, 1.0, delta / jnp.maximum(n, 1e-9))


def solve(problem: BAProblem, rig: StereoRig, cfg: BackendConfig,
          axis_name: str | None = None) -> BAResult:
    """Damped GN with Schur elimination; a chi2 outlier pass at half-time
    drops gross wrong associations (ORB-SLAM2 does the same between its g2o
    rounds) — Huber alone lets them bias the solve when inliers are thin.

    axis_name: when set, the landmark axis is assumed sharded across that
    mesh axis (each device holds a slice of L) and every camera-side
    reduction — U, b_c, the Schur complement, costs — is `psum`ed. This IS
    the distributed Schur-complement BA of the north-star design: landmark
    blocks (V, dx_p) stay device-local, only (6K)^2-sized aggregates ride
    the interconnect."""
    K = problem.T_wc.shape[0]
    allsum = (lambda x: jax.lax.psum(x, axis_name)) if axis_name else (lambda x: x)
    delta = cfg.huber_px
    mono = problem.obs[..., 2] < 0.0  # no right obs: zero the ur residual row
    zero_ur = mono[..., None] & (jnp.arange(3) == 2)

    def cost_of(T_cw, pts, mask):
        r, p = _residuals(T_cw, pts, problem.obs, rig)
        r = jnp.where(zero_ur, 0.0, r)
        w = _huber_w(r, delta) * mask
        ok = w * (p[..., 2] > 0.05)
        return allsum(jnp.sum(ok[..., None] * r * r)), r, p, ok

    def gn_iter(mask):
        # Cameras with too few effective observations this round are
        # FROZEN like gauge-fixed ones: their U blocks are near-singular,
        # and the damped solve emits large null-direction steps that a
        # Huber-plateaued total cost never vetoes (measured on the
        # 540-frame drive: a keyframe with no cross-window matches walked
        # 2 m -> 18 m -> 16 km over three accepted solves). 8 obs ~= the
        # minimum for a well-conditioned 6-dof stereo camera.
        eff = mask & problem.point_valid[:, None]
        weak = allsum(jnp.sum(eff.astype(jnp.int32), axis=0)) < 8
        fixm = problem.fixed | weak

        def step(carry, _):
            T_cw, pts, lm_damp = carry
            cost0, r, p, w = cost_of(T_cw, pts, mask)
            J_cam, J_p = _jacobians(p, rig)
            sel = jnp.arange(3)[None, None, :, None]
            J_cam = jnp.where(mono[..., None, None] & (sel == 2), 0.0, J_cam)
            J_pm = jnp.where(mono[..., None, None] & (sel == 2), 0.0, J_p)
            r = jnp.where(zero_ur, 0.0, r)

            R_cw = T_cw[:, :3, :3]
            J_pt = jnp.einsum("lkab,kbc->lkac", J_pm, R_cw)
            wm = (w * mask * problem.point_valid[:, None])[..., None, None]
            Jc_w = J_cam * wm
            U = allsum(jnp.einsum("lkai,lkaj->kij", Jc_w, J_cam))
            V = jnp.einsum("lkai,lkaj->lij", J_pt * wm, J_pt)
            W = jnp.einsum("lkai,lkaj->lkij", Jc_w, J_pt)
            b_c = allsum(jnp.einsum("lkai,lka->ki", Jc_w, r))
            b_p = jnp.einsum("lkai,lka->li", J_pt * wm, r)

            damp_c = lm_damp * jnp.maximum(
                jax.vmap(jnp.diag)(U).max(axis=-1), 1e-3)[:, None]
            U = U + damp_c[..., None] * jnp.eye(6, dtype=U.dtype)
            damp_p = lm_damp * jnp.maximum(
                jax.vmap(jnp.diag)(V).max(axis=-1), 1e-3)[:, None]
            V = V + damp_p[..., None] * jnp.eye(3, dtype=V.dtype)

            Vinv = inv3x3(V)   # batched closed form — avoids the linalg custom-call
            WVinv = jnp.einsum("lkij,ljm->lkim", W, Vinv)
            # Schur: S = blockdiag(U) - sum_l W Vinv W^T
            S = -allsum(jnp.einsum("lkim,lqjm->kqij", WVinv, W))
            S = S.at[jnp.arange(K), jnp.arange(K)].add(U)
            rhs = b_c - allsum(jnp.einsum("lkim,lm->ki", WVinv, b_p))

            S = jnp.where(
                fixm[:, None, None, None] | fixm[None, :, None, None], 0.0, S)
            S = S.at[jnp.arange(K), jnp.arange(K)].add(
                fixm[:, None, None] * jnp.eye(6, dtype=S.dtype))
            rhs = jnp.where(fixm[:, None], 0.0, rhs)

            S_dense = jnp.transpose(S, (0, 2, 1, 3)).reshape(6 * K, 6 * K)
            dx_c = -jnp.linalg.solve(
                S_dense + 1e-8 * jnp.eye(6 * K, dtype=S.dtype),
                rhs.reshape(-1)).reshape(K, 6)
            # back-substitute landmarks: dx_p = -Vinv (b_p + W^T dx_c)
            Wt_dxc = jnp.einsum("lkij,ki->lj", W, dx_c)
            dx_p = -jnp.einsum("lij,lj->li", Vinv, b_p + Wt_dxc)
            dx_p = jnp.where(problem.point_valid[:, None], dx_p, 0.0)

            T_cw_new = jax.vmap(lambda xi, T: lie.se3_exp(xi) @ T)(dx_c, T_cw)
            pts_new = pts + dx_p
            cost1, _, _, _ = cost_of(T_cw_new, pts_new, mask)
            better = cost1 < cost0
            T_cw = jnp.where(better, T_cw_new, T_cw)
            pts = jnp.where(better, pts_new, pts)
            lm_damp = jnp.where(better, lm_damp * 0.5, lm_damp * 4.0)
            lm_damp = jnp.clip(lm_damp, 1e-8, 1e2)
            return (T_cw, pts, lm_damp), cost1
        return step

    T_cw0 = lie.inv_T(problem.T_wc)
    mask0 = problem.obs_mask
    init_cost, _, _, _ = cost_of(T_cw0, problem.points_w, mask0)

    half = max(cfg.ba_iters // 2, 1)
    (T_cw_h, pts_h, _), _ = jax.lax.scan(
        gn_iter(mask0), (T_cw0, problem.points_w, jnp.float32(1e-4)), None,
        length=half)

    # chi2 outlier pass: drop observations still gross after the half-solve
    r_h, _ = _residuals(T_cw_h, pts_h, problem.obs, rig)
    r_h = jnp.where(zero_ur, 0.0, r_h)
    keep = jnp.linalg.norm(r_h, axis=-1) < cfg.outlier_px
    mask1 = mask0 & keep

    (T_cw_f, pts_f, _), _ = jax.lax.scan(
        gn_iter(mask1), (T_cw_h, pts_h, jnp.float32(1e-4)), None,
        length=max(cfg.ba_iters - half, 1))
    final_cost, _, _, _ = cost_of(T_cw_f, pts_f, mask1)
    return BAResult(
        T_wc=lie.inv_T(T_cw_f),
        points_w=pts_f,
        initial_cost=init_cost,
        final_cost=final_cost,
        num_obs=allsum(jnp.sum(mask1.astype(jnp.int32))),
    )
