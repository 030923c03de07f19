"""Projective point-to-plane ICP against the raycast model — the
`ITMTrackingController::Track` / depth-tracker equivalent
(reference surface: src/DenseSLAM/InfiniTamDriver.h:151-163 TrackLocalMap,
which runs ICP of the incoming depth against the raycast of the scene).

TPU design: every GN iteration is a single fused data-parallel pass over all
pixels — build per-pixel residual/Jacobian, reduce the 6x6 normal equations
with `jnp.einsum` (one big MXU-friendly contraction), solve the tiny system,
update the pose with `se3_exp`. A fixed iteration count under `lax.fori_loop`
keeps it one compiled program; bad associations are masked, not branched.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..config import TsdfConfig
from ..utils import lie
from ..utils.camera import Intrinsics, backproject, project
from ..utils.image import bilinear_sample


class ICPResult(NamedTuple):
    T_wc: jax.Array          # refined camera-to-world pose
    inlier_frac: jax.Array   # fraction of valid pixels with good association
    rmse: jax.Array          # point-to-plane RMSE over inliers (m)
    converged: jax.Array     # bool — enough inliers to trust the solve


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
    point/normal maps.
    """
    pts_c = backproject(depth, intr)                     # (H, W, 3)
    valid_d = depth > 0

    T_render_inv = lie.inv_T(T_wc_render)

    def gn_step(_, carry):
        T_est, _, _, _ = carry
        pts_w = lie.transform_points(T_est, pts_c.reshape(-1, 3)).reshape(pts_c.shape)
        # into the render camera for association
        pts_r = lie.transform_points(T_render_inv, pts_w.reshape(-1, 3)).reshape(pts_c.shape)
        uv, z = project(pts_r, intr)
        mp, m_ok1 = bilinear_sample(model_points_w, uv)
        mn, m_ok2 = bilinear_sample(model_normals_w, uv)
        mm, _ = bilinear_sample(model_mask.astype(jnp.float32), uv)
        nn = jnp.linalg.norm(mn, axis=-1, keepdims=True)
        mn_unit = mn / jnp.maximum(nn, 1e-9)

        diff = pts_w - mp
        r = jnp.sum(mn_unit * diff, axis=-1)             # point-to-plane residual
        dist = jnp.linalg.norm(diff, axis=-1)
        ok = (
            valid_d & m_ok1 & m_ok2 & (mm > 0.999)
            & (z > 0) & (nn[..., 0] > 0.5)
            & (dist < dist_thresh_m)
        )
        w = ok.astype(jnp.float32)

        # J wrt left-multiplied twist on T_est: d(exp(xi) p)/dxi = [I, -[p]x]
        # residual r = n . (p_w - m)  =>  J = [n, p_w x n]  (v first, w second)
        Jv = mn_unit                                      # (H, W, 3)
        Jw = jnp.cross(pts_w, mn_unit)                    # (H, W, 3)
        J = jnp.concatenate([Jv, Jw], axis=-1).reshape(-1, 6)
        rf = r.reshape(-1)
        wf = w.reshape(-1)

        JTJ = jnp.einsum("ni,nj->ij", J * wf[:, None], J)
        JTr = jnp.einsum("ni,n->i", J * wf[:, None], rf)
        # Levenberg damping keeps the solve sane when poorly constrained.
        damp = 1e-6 * jnp.trace(JTJ) + 1e-8
        xi = -jnp.linalg.solve(JTJ + damp * jnp.eye(6, dtype=JTJ.dtype), JTr)

        n_in = jnp.sum(wf)
        enough = n_in >= min_inliers
        xi = jnp.where(enough, xi, jnp.zeros_like(xi))
        T_new = lie.se3_exp(xi) @ T_est
        rmse = jnp.sqrt(jnp.sum(wf * rf * rf) / jnp.maximum(n_in, 1.0))
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
