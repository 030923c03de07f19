"""Projective point-to-plane ICP against the raycast model — the
`ITMTrackingController::Track` / depth-tracker equivalent
(reference surface: src/DenseSLAM/InfiniTamDriver.h:151-163 TrackLocalMap,
which runs ICP of the incoming depth against the raycast of the scene).

TPU design: every GN iteration is a single fused data-parallel pass over all
pixels — per-pixel residual/Jacobian built as SoA (H*W,) planes (never
(N, 3) intermediates, see the layout rule in ops/hash.py), the 6x6 normal
equations reduced with one einsum over a (N, 6) matrix, a tiny dense solve,
and an `se3_exp` pose update, iterated under `lax.fori_loop`.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import TsdfConfig
from ..utils import lie
from .smallsolve import solve_spd6
from ..utils.camera import Intrinsics


class ICPResult(NamedTuple):
    T_wc: jax.Array          # refined camera-to-world pose
    inlier_frac: jax.Array   # fraction of valid pixels with good association
    rmse: jax.Array          # point-to-plane RMSE over inliers (m)
    converged: jax.Array     # bool — enough inliers to trust the solve


def _bilinear_plane(img, u, v, inb):
    h, w = img.shape
    u0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, w - 2)
    v0 = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, h - 2)
    du = u - u0
    dv = v - v0
    flat = img.reshape(-1)
    base = v0 * w + u0
    p00 = flat[base]
    p01 = flat[base + 1]
    p10 = flat[base + w]
    p11 = flat[base + w + 1]
    val = (p00 * (1 - du) * (1 - dv) + p01 * du * (1 - dv)
           + p10 * (1 - du) * dv + p11 * du * dv)
    return jnp.where(inb, val, 0.0)


def track(
    depth: jax.Array,            # (H, W) current frame depth, m
    model_points_w: jax.Array,   # (H, W, 3) raycast model points (world)
    model_normals_w: jax.Array,  # (H, W, 3) raycast model normals (world)
    model_mask: jax.Array,       # (H, W) raycast hit mask
    T_wc_init: jax.Array,        # initial guess (e.g. previous pose or VO)
    T_wc_render: jax.Array,      # pose the model maps were raycast from
    intr: Intrinsics,
    num_iters: int = 12,
    dist_thresh_m: float = 0.15,
    normal_min_cos: float = 0.5,
    min_inliers: int = 300,
) -> ICPResult:
    """Refine T_wc so current depth aligns with the raycast model.

    Projective association: current points -> world via the pose estimate ->
    projected into the *render* camera -> bilinear lookup of model
    point/normal planes.
    """
    h, w = depth.shape
    vv = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0).reshape(-1)
    uu = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1).reshape(-1)
    d = depth.reshape(-1)
    cx = (uu - intr.cx) / intr.fx * d
    cy = (vv - intr.cy) / intr.fy * d
    cz = d
    valid_d = d > 0

    # model planes
    mpx = model_points_w[..., 0]
    mpy = model_points_w[..., 1]
    mpz = model_points_w[..., 2]
    mnx = model_normals_w[..., 0]
    mny = model_normals_w[..., 1]
    mnz = model_normals_w[..., 2]
    mmf = model_mask.astype(jnp.float32)

    T_render_inv = lie.inv_T(T_wc_render)
    Ri = T_render_inv[:3, :3]
    ti = T_render_inv[:3, 3]

    def gn_step(_, carry):
        T_est, _, _, _ = carry
        R = T_est[:3, :3]
        t = T_est[:3, 3]
        # current points -> world (SoA)
        px = R[0, 0] * cx + R[0, 1] * cy + R[0, 2] * cz + t[0]
        py = R[1, 0] * cx + R[1, 1] * cy + R[1, 2] * cz + t[1]
        pz = R[2, 0] * cx + R[2, 1] * cy + R[2, 2] * cz + t[2]
        # into the render camera for association
        rx = Ri[0, 0] * px + Ri[0, 1] * py + Ri[0, 2] * pz + ti[0]
        ry = Ri[1, 0] * px + Ri[1, 1] * py + Ri[1, 2] * pz + ti[1]
        rz = Ri[2, 0] * px + Ri[2, 1] * py + Ri[2, 2] * pz + ti[2]
        zsafe = jnp.where(jnp.abs(rz) > 1e-9, rz, 1e-9)
        u = rx / zsafe * intr.fx + intr.cx
        v = ry / zsafe * intr.fy + intr.cy
        inb = (u >= 0) & (u <= w - 2) & (v >= 0) & (v <= h - 2) & (rz > 0)

        mx = _bilinear_plane(mpx, u, v, inb)
        my = _bilinear_plane(mpy, u, v, inb)
        mz = _bilinear_plane(mpz, u, v, inb)
        nx = _bilinear_plane(mnx, u, v, inb)
        ny = _bilinear_plane(mny, u, v, inb)
        nz = _bilinear_plane(mnz, u, v, inb)
        mm = _bilinear_plane(mmf, u, v, inb)
        nn = jnp.sqrt(nx * nx + ny * ny + nz * nz)
        inv_nn = 1.0 / jnp.maximum(nn, 1e-9)
        nx_u = nx * inv_nn
        ny_u = ny * inv_nn
        nz_u = nz * inv_nn

        dxp = px - mx
        dyp = py - my
        dzp = pz - mz
        r = nx_u * dxp + ny_u * dyp + nz_u * dzp
        dist2 = dxp * dxp + dyp * dyp + dzp * dzp
        ok = (
            valid_d & inb & (mm > 0.999) & (nn > 0.5)
            & (dist2 < dist_thresh_m * dist_thresh_m)
        )
        wgt = ok.astype(jnp.float32)

        # J = [n, p x n] for r = n . (p_w - m)
        jwx = py * nz_u - pz * ny_u
        jwy = pz * nx_u - px * nz_u
        jwz = px * ny_u - py * nx_u
        J = jnp.stack([nx_u, ny_u, nz_u, jwx, jwy, jwz], axis=-1)  # (N, 6)

        Jw = J * wgt[:, None]
        JTJ = Jw.T @ J
        JTr = Jw.T @ r
        damp = 1e-6 * jnp.trace(JTJ) + 1e-8
        xi = -solve_spd6(JTJ + damp * jnp.eye(6, dtype=JTJ.dtype), JTr)

        n_in = jnp.sum(wgt)
        enough = n_in >= min_inliers
        xi = jnp.where(enough, xi, jnp.zeros_like(xi))
        T_new = lie.se3_exp(xi) @ T_est
        rmse = jnp.sqrt(jnp.sum(wgt * r * r) / jnp.maximum(n_in, 1.0))
        frac = n_in / jnp.maximum(jnp.sum(valid_d.astype(jnp.float32)), 1.0)
        return (T_new, frac, rmse, enough)

    init = (
        T_wc_init,
        jnp.zeros((), jnp.float32),
        jnp.zeros((), jnp.float32),
        jnp.zeros((), bool),
    )
    T_fin, frac, rmse, enough = jax.lax.fori_loop(0, num_iters, gn_step, init)
    return ICPResult(T_wc=T_fin, inlier_frac=frac, rmse=rmse, converged=enough)
