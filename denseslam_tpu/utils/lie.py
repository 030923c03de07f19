"""SO(3)/SE(3) Lie-group utilities as pure JAX functions.

The reference keeps poses as 4x4 column-major matrices plus a 6-dof se(3)
parameterisation ([tx,ty,tz,rx,ry,rz]) inside `ITMPose`
(reference: src/DenseSLAM/InfiniTamDriver.cpp:41-52, DenseSlam.cpp:330-337).
Here every pose is a row-major float32 4x4 matrix; tangent vectors are
`[vx, vy, vz, wx, wy, wz]` (translation first, matching ITMPose.GetParams()).

All functions are shape-polymorphic over leading batch dims via vmap-friendly
construction and jit-stable (no data-dependent control flow).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8
# Small-angle switchover: below theta = 1e-2 the closed forms cancel
# catastrophically in float32 (e.g. 1-cos(theta) ~ 5e-5), while the Taylor
# expansions are accurate to ~theta^4 ~ 1e-8. theta^2 threshold:
_SMALL2 = 1e-4


def hat(w: jax.Array) -> jax.Array:
    """so(3) hat operator: R^3 -> 3x3 skew-symmetric matrix."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def vee(W: jax.Array) -> jax.Array:
    """Inverse of hat: 3x3 skew matrix -> R^3."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def so3_exp(w: jax.Array) -> jax.Array:
    """Rodrigues formula, numerically safe near ||w|| = 0."""
    theta2 = jnp.sum(w * w, axis=-1, keepdims=True)[..., None]
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    W = hat(w)
    W2 = W @ W
    # sin(t)/t and (1-cos(t))/t^2 with Taylor fallback for small angles.
    small = theta2 < _SMALL2
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a * W + b * W2


def so3_log(R: jax.Array) -> jax.Array:
    """Log map of SO(3), safe for angles in [0, pi)."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    # Clip strictly inside (-1, 1): arccos' diverges at +-1 and poisons
    # jacfwd/jacrev through pose-graph residuals at near-identity edges.
    # The value is unaffected (w_raw is ~0 exactly where the clip bites).
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0 + 1e-6, 1.0 - 1e-6)
    theta = jnp.arccos(cos_t)
    w_raw = vee(R - jnp.swapaxes(R, -1, -2)) * 0.5
    sin_t = jnp.sin(theta)
    # theta / (2 sin(theta)) with Taylor fallback.
    small = theta[..., None] < 1e-2
    scale = jnp.where(
        small,
        0.5 + theta[..., None] ** 2 / 12.0,
        theta[..., None] / jnp.maximum(2.0 * sin_t[..., None], _EPS),
    )
    w = 2.0 * scale * w_raw
    # Near theta = pi the above is ill-conditioned; fall back to the
    # diagonal-based extraction.
    near_pi = theta[..., None] > 3.0
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    axis_sq = jnp.maximum((diag - cos_t[..., None]) / jnp.maximum(1.0 - cos_t[..., None], _EPS), 0.0)
    axis = jnp.sqrt(axis_sq)
    # Sign from the off-diagonal skew part.
    sign = jnp.sign(jnp.where(jnp.abs(w_raw) > 1e-9, w_raw, 1.0))
    w_pi = axis * sign * theta[..., None]
    return jnp.where(near_pi, w_pi, w)


def se3_exp(xi: jax.Array) -> jax.Array:
    """se(3) exp: [v, w] (6,) -> 4x4 transform. v first, then w."""
    v, w = xi[..., :3], xi[..., 3:]
    theta2 = jnp.sum(w * w, axis=-1, keepdims=True)[..., None]
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    W = hat(w)
    W2 = W @ W
    small = theta2 < _SMALL2
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    c = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / (theta2 * theta))
    R = so3_exp(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)
    V = eye + b * W + c * W2
    t = (V @ v[..., None])[..., 0]
    return make_T(R, t)


def se3_log(T: jax.Array) -> jax.Array:
    """Log map of SE(3) -> [v, w]."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    w = so3_log(R)
    theta2 = jnp.sum(w * w, axis=-1, keepdims=True)[..., None]
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    W = hat(w)
    W2 = W @ W
    small = theta2 < _SMALL2
    # V^{-1} = I - W/2 + (1/theta^2)(1 - theta sin / (2(1-cos))) W^2
    denom = jnp.maximum(2.0 * (1.0 - jnp.cos(theta)), 1e-12)
    coef = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - theta * jnp.sin(theta) / denom) / theta2,
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), W.shape)
    Vinv = eye - 0.5 * W + coef * W2
    v = (Vinv @ t[..., None])[..., 0]
    return jnp.concatenate([v, w], axis=-1)


def se3_exp_np(xi) -> "np.ndarray":
    """Pure-numpy se(3) exp for host-side setup code (no device dispatch).

    Same [v, w] convention as `se3_exp`."""
    import numpy as np
    xi = np.asarray(xi, dtype=np.float64)
    v, w = xi[:3], xi[3:]
    theta = float(np.linalg.norm(w))
    W = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]],
                 dtype=np.float64)
    W2 = W @ W
    if theta < 1e-5:
        t2 = theta * theta
        a, b, c = 1.0 - t2 / 6.0, 0.5 - t2 / 24.0, 1.0 / 6.0 - t2 / 120.0
    else:
        t2 = theta * theta
        a = np.sin(theta) / theta
        b = (1.0 - np.cos(theta)) / t2
        c = (theta - np.sin(theta)) / (t2 * theta)
    R = np.eye(3) + a * W + b * W2
    V = np.eye(3) + b * W + c * W2
    T = np.eye(4, dtype=np.float64)
    T[:3, :3] = R
    T[:3, 3] = V @ v
    return T.astype(np.float32)


def pose_error_weighted_np(T_a, T_b) -> float:
    """Pure-numpy port of `pose_error_weighted` for host-side gates (the
    deferred-correction stash in dense_slam.apply_pose_updates). MUST stay
    metric-identical to the jitted `_correct` gate, else a stashed pose
    can fall below the replay gate and be dropped without re-fusing."""
    import numpy as np
    Ta = np.asarray(T_a, np.float64)
    Tb = np.asarray(T_b, np.float64)
    D = np.linalg.inv(Ta) @ Tb
    R, t = D[:3, :3], D[:3, 3]
    c = np.clip((np.trace(R) - 1.0) / 2.0, -1.0, 1.0)
    theta = float(np.arccos(c))
    if theta < 1e-7:
        w = np.zeros(3)
        Vinv = np.eye(3)
    else:
        w = theta / (2.0 * np.sin(theta)) * np.array(
            [R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
        W = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]],
                      [-w[1], w[0], 0]], dtype=np.float64)
        t2 = theta * theta
        coef = (1.0 - theta * np.sin(theta)
                / max(2.0 * (1.0 - np.cos(theta)), 1e-12)) / t2
        Vinv = np.eye(3) - 0.5 * W + coef * (W @ W)
    v = Vinv @ t
    return float(np.sqrt(v @ v + 0.5 * (w @ w)))


def make_T(R: jax.Array, t: jax.Array) -> jax.Array:
    """Assemble 4x4 from 3x3 rotation and translation."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), batch + (4,)
    )[..., None, :]
    return jnp.concatenate([top, bottom], axis=-2)


def inv_T(T: jax.Array) -> jax.Array:
    """Inverse of a rigid transform (exploits orthonormal R)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return make_T(Rt, -(Rt @ t[..., None])[..., 0])


def transform_points(T: jax.Array, pts: jax.Array) -> jax.Array:
    """Apply 4x4 transform to (..., N, 3) points."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return pts @ jnp.swapaxes(R, -1, -2) + t[..., None, :]


def rotate_vectors(T: jax.Array, vecs: jax.Array) -> jax.Array:
    """Apply only the rotation of T to (..., N, 3) vectors."""
    R = T[..., :3, :3]
    return vecs @ jnp.swapaxes(R, -1, -2)


def pose_error_weighted(T_a: jax.Array, T_b: jax.Array) -> jax.Array:
    """Drift magnitude between two poses of the same frame.

    Mirrors the online-correction error: || se3(T_a^{-1} T_b) ||_W with
    W = diag(.5,.5,.5) on rotation and 1 on translation
    (reference: src/DenseSLAM/DenseSlam.cpp:317-356).
    """
    xi = se3_log(inv_T(T_a) @ T_b)
    v, w = xi[..., :3], xi[..., 3:]
    return jnp.sqrt(jnp.sum(v * v, axis=-1) + 0.5 * jnp.sum(w * w, axis=-1))


def project_to_so3(R: jax.Array) -> jax.Array:
    """Re-orthonormalise a near-rotation matrix (ITMPose::Coerce analogue)."""
    u, _, vt = jnp.linalg.svd(R)
    det = jnp.linalg.det(u @ vt)
    d = jnp.concatenate(
        [jnp.ones_like(det)[..., None], jnp.ones_like(det)[..., None], det[..., None]],
        axis=-1,
    )
    return (u * d[..., None, :]) @ vt
