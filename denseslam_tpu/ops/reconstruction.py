"""Sparse 3D reconstruction from tracked features + known egomotion.

Capability target: libviso2's reconstruction module (reference:
src/libviso2/src/reconstruction.{h,cpp} — per-track linear triangulation
followed by Gauss-Newton point refinement against all observations).
TPU re-design: tracks are a fixed-cap (L, K) observation grid; the linear
DLT init is a batched 3x3 solve and the refinement is a vmapped GN over all
tracks simultaneously.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils import lie
from ..utils.camera import Intrinsics
from .smallsolve import solve3x3


class Tracks(NamedTuple):
    uv: jax.Array        # f32 (L, K, 2) observations per frame
    obs_mask: jax.Array  # bool (L, K)
    T_wc: jax.Array      # f32 (K, 4, 4) camera poses


class Reconstruction(NamedTuple):
    points_w: jax.Array   # (L, 3)
    valid: jax.Array      # (L,)
    reproj_rmse: jax.Array  # (L,) pixels


def triangulate_tracks(tracks: Tracks, intr: Intrinsics,
                       gn_iters: int = 5,
                       max_reproj_px: float = 3.0,
                       min_obs: int = 2) -> Reconstruction:
    """DLT init + batched GN refinement of every track."""
    L, K, _ = tracks.uv.shape
    T_cw = lie.inv_T(tracks.T_wc)                       # (K, 4, 4)
    R = T_cw[:, :3, :3]
    t = T_cw[:, :3, 3]

    # normalized rays per observation
    x = (tracks.uv[..., 0] - intr.cx) / intr.fx         # (L, K)
    y = (tracks.uv[..., 1] - intr.cy) / intr.fy
    m = tracks.obs_mask.astype(jnp.float32)

    # Linear midpoint init: for each obs, ray in world frame through camera
    # center; solve min sum || (I - d d^T)(p - c) ||^2  =>  A p = b with
    # A = sum (I - d d^T), b = sum (I - d d^T) c
    # world ray dir d = R^T [x, y, 1]
    dx = R[:, 0, 0][None] * x + R[:, 1, 0][None] * y + R[:, 2, 0][None]
    dy = R[:, 0, 1][None] * x + R[:, 1, 1][None] * y + R[:, 2, 1][None]
    dz = R[:, 0, 2][None] * x + R[:, 1, 2][None] * y + R[:, 2, 2][None]
    norm = jnp.sqrt(dx * dx + dy * dy + dz * dz)
    dx, dy, dz = dx / norm, dy / norm, dz / norm
    centers = tracks.T_wc[:, :3, 3]                     # (K, 3)
    cx_, cy_, cz_ = centers[:, 0][None], centers[:, 1][None], centers[:, 2][None]

    def outer_terms(dx, dy, dz):
        # rows of (I - d d^T)
        return (
            1 - dx * dx, -dx * dy, -dx * dz,
            1 - dy * dy, -dy * dz, 1 - dz * dz,
        )

    a11, a12, a13, a22, a23, a33 = outer_terms(dx, dy, dz)
    A = jnp.stack(
        [
            jnp.stack([jnp.sum(m * a11, 1), jnp.sum(m * a12, 1), jnp.sum(m * a13, 1)], -1),
            jnp.stack([jnp.sum(m * a12, 1), jnp.sum(m * a22, 1), jnp.sum(m * a23, 1)], -1),
            jnp.stack([jnp.sum(m * a13, 1), jnp.sum(m * a23, 1), jnp.sum(m * a33, 1)], -1),
        ],
        axis=-2,
    )                                                    # (L, 3, 3)
    bx = a11 * cx_ + a12 * cy_ + a13 * cz_
    by = a12 * cx_ + a22 * cy_ + a23 * cz_
    bz = a13 * cx_ + a23 * cy_ + a33 * cz_
    b = jnp.stack([jnp.sum(m * bx, 1), jnp.sum(m * by, 1), jnp.sum(m * bz, 1)], -1)
    eye = jnp.eye(3)[None]
    p0 = solve3x3(A + 1e-6 * eye, b)                              # (L, 3)

    # GN refinement on reprojection residuals
    def residuals(p):
        pc_x = jnp.einsum("kj,lj->lk", R[:, 0, :], p) + t[:, 0][None]
        pc_y = jnp.einsum("kj,lj->lk", R[:, 1, :], p) + t[:, 1][None]
        pc_z = jnp.einsum("kj,lj->lk", R[:, 2, :], p) + t[:, 2][None]
        z = jnp.maximum(pc_z, 1e-6)
        ru = (pc_x / z - x) * intr.fx
        rv = (pc_y / z - y) * intr.fy
        return ru, rv, pc_x, pc_y, z

    def gn(i, p):
        ru, rv, pcx, pcy, z = residuals(p)
        iz = 1.0 / z
        # d(ru)/dp = fx * (R0/z - pcx R2 / z^2)
        Ju = intr.fx * (R[:, 0, :][None] * iz[..., None]
                        - R[:, 2, :][None] * (pcx * iz * iz)[..., None])
        Jv = intr.fy * (R[:, 1, :][None] * iz[..., None]
                        - R[:, 2, :][None] * (pcy * iz * iz)[..., None])
        w = m[..., None]
        H = (jnp.einsum("lki,lkj->lij", Ju * w, Ju)
             + jnp.einsum("lki,lkj->lij", Jv * w, Jv))
        g = (jnp.einsum("lki,lk->li", Ju * w, ru)
             + jnp.einsum("lki,lk->li", Jv * w, rv))
        dp = -solve3x3(H + 1e-5 * jnp.eye(3)[None], g)
        return p + jnp.clip(dp, -1.0, 1.0)

    p = jax.lax.fori_loop(0, gn_iters, gn, p0)

    ru, rv, _, _, z = residuals(p)
    n_obs = jnp.sum(tracks.obs_mask.astype(jnp.int32), axis=1)
    sq = m * (ru * ru + rv * rv)
    rmse = jnp.sqrt(jnp.sum(sq, 1) / jnp.maximum(n_obs, 1))
    in_front = jnp.all(jnp.where(tracks.obs_mask, z > 0.05, True), axis=1)
    valid = (n_obs >= min_obs) & (rmse < max_reproj_px) & in_front
    return Reconstruction(points_w=p, valid=valid, reproj_rmse=rmse)
