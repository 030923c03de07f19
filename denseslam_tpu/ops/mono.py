"""Monocular visual odometry: batched 8-point essential matrix + chierality.

Capability target: libviso2's mono variant (reference:
src/libviso2/src/viso_mono.h:56-62 — RANSAC over 8-point fundamental
estimates with chierality disambiguation; scale is unobservable and fixed
externally, the reference uses the known camera height). TPU re-design: all
RANSAC hypotheses solve simultaneously under `vmap` (batched 8x9 SVD
nullspaces on the MXU), inliers score by Sampson distance in one (K, N)
reduction, and the four (R, t) decompositions are ranked by batched midpoint
triangulation depth counts.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import FrontendConfig
from ..utils import lie
from ..utils.camera import Intrinsics


class MonoVOResult(NamedTuple):
    T_delta: jax.Array      # (4, 4) prev-cam -> curr-cam, ||t|| = 1
    inliers: jax.Array      # bool (N,)
    num_inliers: jax.Array
    ok: jax.Array


class MonoScale(NamedTuple):
    scale: jax.Array        # f32 () metric scale for the unit translation
    num_ground: jax.Array   # i32 () points that voted
    ok: jax.Array           # bool ()


def _normalize(uv: jax.Array, intr: Intrinsics):
    x = (uv[..., 0] - intr.cx) / intr.fx
    y = (uv[..., 1] - intr.cy) / intr.fy
    return x, y


def _eight_point(xp, yp, xc, yc):
    """E from >=8 normalized correspondences (rows of the sampled subset).

    Solves min ||A e|| with the SVD nullspace, then projects onto the
    essential manifold (two equal singular values, third zero)."""
    a = jnp.stack(
        [xc * xp, xc * yp, xc, yc * xp, yc * yp, yc, xp, yp,
         jnp.ones_like(xp)],
        axis=-1,
    )                                            # (8, 9)
    _, _, vt = jnp.linalg.svd(a, full_matrices=True)
    e = vt[-1].reshape(3, 3)
    u, s, vt2 = jnp.linalg.svd(e)
    sbar = 0.5 * (s[0] + s[1])
    e_proj = (u * jnp.array([sbar, sbar, 0.0])) @ vt2
    return e_proj


def _sampson(E, xp, yp, xc, yc):
    """Squared Sampson distance of all correspondences to E."""
    # l_c = E @ p_prev ; l_p = E^T @ p_curr  (homogeneous normalized coords)
    lx = E[0, 0] * xp + E[0, 1] * yp + E[0, 2]
    ly = E[1, 0] * xp + E[1, 1] * yp + E[1, 2]
    lz = E[2, 0] * xp + E[2, 1] * yp + E[2, 2]
    mx = E[0, 0] * xc + E[1, 0] * yc + E[2, 0]
    my = E[0, 1] * xc + E[1, 1] * yc + E[2, 1]
    num = xc * lx + yc * ly + lz
    den = lx * lx + ly * ly + mx * mx + my * my
    return num * num / jnp.maximum(den, 1e-12)


def _triangulate_depths(R, t, xp, yp, xc, yc):
    """Midpoint-free linear triangulation depth signs for chierality.

    Returns (z_prev, z_curr) per point for camera motion p_c = R p_p + t."""
    # Solve for depth along prev ray: z_p * R @ dp + t = z_c * dc
    # Cross with dc to eliminate z_c: z_p * (R dp) x dc = -t x dc
    dpx, dpy, dpz = xp, yp, jnp.ones_like(xp)
    rx = R[0, 0] * dpx + R[0, 1] * dpy + R[0, 2] * dpz
    ry = R[1, 0] * dpx + R[1, 1] * dpy + R[1, 2] * dpz
    rz = R[2, 0] * dpx + R[2, 1] * dpy + R[2, 2] * dpz
    cx_, cy_, cz_ = xc, yc, jnp.ones_like(xc)
    # a = (R dp) x dc ; b = -t x dc
    ax = ry * cz_ - rz * cy_
    ay = rz * cx_ - rx * cz_
    az = rx * cy_ - ry * cx_
    bx = -(t[1] * cz_ - t[2] * cy_)
    by = -(t[2] * cx_ - t[0] * cz_)
    bz = -(t[0] * cy_ - t[1] * cx_)
    denom = ax * ax + ay * ay + az * az
    z_p = (ax * bx + ay * by + az * bz) / jnp.maximum(denom, 1e-12)
    # z_c from the z row: z_c = z_p * rz + t_z
    z_c = z_p * rz + t[2]
    return z_p, z_c


def estimate_scale_ground(
    T_delta: jax.Array,     # (4, 4) prev -> curr, ||t|| = 1
    uv_prev: jax.Array,     # (N, 2)
    uv_curr: jax.Array,     # (N, 2)
    inliers: jax.Array,     # bool (N,)
    intr: Intrinsics,
    camera_height_m: float,
    camera_pitch_rad: float = 0.0,
) -> MonoScale:
    """Metric scale from the known camera height over the ground plane
    (reference: src/libviso2/src/viso_mono.cpp — monocular scale is fixed by
    triangulating inliers at unit translation and comparing the median
    distance of ground-plane points to the calibrated camera height).

    TPU shape: triangulation and the plane distances are (N,) SoA arithmetic;
    the robust median is one sort of a masked vector. Ground candidates are
    inliers below the principal row with positive plane distance."""
    xp, yp = _normalize(uv_prev, intr)
    xc, yc = _normalize(uv_curr, intr)
    R = T_delta[:3, :3]
    t = T_delta[:3, 3]
    z_p, z_c = _triangulate_depths(R, t, xp, yp, xc, yc)
    # 3D point in the prev camera frame at unit scale
    py, pz = z_p * yp, z_p
    # Ground plane normal in camera coords (y down, z forward), tilted by
    # the mounting pitch: n = (0, cos p, -sin p); distance below camera.
    cp = jnp.cos(camera_pitch_rad)
    sp = jnp.sin(camera_pitch_rad)
    d = py * cp - pz * sp
    # Ground candidates live in the BOTTOM BAND of the image, not merely
    # below the horizon: obstacle/wall features below cy but above the
    # road dominate dense feature sets and drag the median off the true
    # ground (measured 2.3x scale error at the 2048-feature default).
    row_floor = intr.cy + 0.35 * (intr.height - 1 - intr.cy)
    cand = (
        inliers
        & (z_p > 0.1) & (z_c > 0.1)
        & (uv_prev[:, 1] > row_floor)
        & (d > 1e-3) & jnp.isfinite(d)
    )

    def masked_median(sel):
        k = jnp.sum(sel.astype(jnp.int32))
        vals = jnp.sort(jnp.where(sel, d, jnp.inf))
        return vals[jnp.clip((k - 1) // 2, 0, vals.shape[0] - 1)], k

    med0, n_cand = masked_median(cand)
    # trimmed re-median: off-plane stragglers (obstacle bases, far wall)
    # sit far from the plane cluster; one consensus round rejects them
    band = cand & (jnp.abs(d - med0) < 0.3 * med0)
    med1, n_band = masked_median(band)
    use_band = n_band >= 8
    med = jnp.where(use_band, med1, med0)
    ok = n_cand >= 8
    scale = jnp.where(ok, camera_height_m / jnp.maximum(med, 1e-3), 1.0)
    scale = jnp.clip(scale, 1e-3, 1e3)
    return MonoScale(scale=scale, num_ground=n_cand, ok=ok)


def apply_scale(T_delta: jax.Array, scale: jax.Array) -> jax.Array:
    """Scale the translation of a unit-norm relative pose to metric."""
    return T_delta.at[:3, 3].multiply(scale)


def estimate_mono_motion(
    uv_prev: jax.Array,     # (N, 2)
    uv_curr: jax.Array,     # (N, 2)
    valid: jax.Array,       # (N,)
    intr: Intrinsics,
    cfg: FrontendConfig,
    key: jax.Array,
) -> MonoVOResult:
    n = uv_prev.shape[0]
    xp, yp = _normalize(uv_prev, intr)
    xc, yc = _normalize(uv_curr, intr)
    n_ok = jnp.sum(valid.astype(jnp.int32))

    # hypothesis sampling biased to valid entries
    order = jnp.argsort(~valid, stable=True)
    raw = jax.random.randint(key, (cfg.ransac_iters, 8), 0,
                             jnp.iinfo(jnp.int32).max)
    sel = order[raw % jnp.maximum(n_ok, 8)]

    def solve_one(idx8):
        return _eight_point(xp[idx8], yp[idx8], xc[idx8], yc[idx8])

    Es = jax.vmap(solve_one)(sel)                       # (K, 3, 3)

    thresh = (cfg.ransac_thresh_px / intr.fx) ** 2

    def count(E):
        d = _sampson(E, xp, yp, xc, yc)
        good = (d < thresh) & valid
        return jnp.sum(good.astype(jnp.int32)), good

    counts, inlier_sets = jax.vmap(count)(Es)
    best = jnp.argmax(counts)
    E = Es[best]
    best_inliers = inlier_sets[best]

    # decompose E -> 4 candidate (R, t)
    u, _, vt = jnp.linalg.svd(E)
    # enforce proper rotations
    u = u * jnp.sign(jnp.linalg.det(u))
    vt = vt * jnp.sign(jnp.linalg.det(vt))
    w_mat = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    R1 = u @ w_mat @ vt
    R2 = u @ w_mat.T @ vt
    t1 = u[:, 2]
    cands_R = jnp.stack([R1, R1, R2, R2])
    cands_t = jnp.stack([t1, -t1, t1, -t1])

    def chierality(R, t):
        z_p, z_c = _triangulate_depths(R, t, xp, yp, xc, yc)
        front = (z_p > 0) & (z_c > 0) & best_inliers
        return jnp.sum(front.astype(jnp.int32))

    votes = jax.vmap(chierality)(cands_R, cands_t)
    pick = jnp.argmax(votes)
    R = cands_R[pick]
    t = cands_t[pick]

    num = counts[best]
    ok = (num >= 12) & (votes[pick] >= num // 2)
    T = lie.make_T(R, t)
    T = jnp.where(ok, T, jnp.eye(4, dtype=T.dtype))
    return MonoVOResult(T_delta=T, inliers=best_inliers, num_inliers=num, ok=ok)
