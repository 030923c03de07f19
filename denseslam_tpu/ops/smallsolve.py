"""Small fixed-size linear solves as unrolled elementwise programs.

`jnp.linalg.solve` / `jnp.linalg.inv` lower to the TPU linalg custom-call
path; for the tiny systems in the SLAM solvers (6x6 GN normal equations,
3x3 landmark blocks) that path measured ~0.4 ms PER CALL inside vmapped
loops (e.g. ~3.1 ms/frame across RANSAC's GN iterations). Unrolled
factorisations are a handful of fused VPU ops over the batch instead.

All functions are batched over leading dimensions and jit/vmap-stable.
The reference solves the same systems with its own dense f64 routines
(src/libviso2/src/matrix.cpp LU/solve); here the systems are damped SPD so
f32 Cholesky / adjugate forms are numerically adequate (tests compare
against the analytic oracles).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def solve_spd6(A: jax.Array, b: jax.Array) -> jax.Array:
    """Batched 6x6 symmetric-positive-definite solve via unrolled Cholesky.

    A: (..., 6, 6) SPD (GN normal equations + damping), b: (..., 6).
    """
    n = 6
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = A[..., j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        d = jnp.sqrt(jnp.maximum(s, 1e-20))
        L[j][j] = d
        inv = 1.0 / d
        for i2 in range(j + 1, n):
            s2 = A[..., i2, j]
            for k in range(j):
                s2 = s2 - L[i2][k] * L[j][k]
            L[i2][j] = s2 * inv
    y = [None] * n                      # forward: L y = b
    for i2 in range(n):
        s = b[..., i2]
        for k in range(i2):
            s = s - L[i2][k] * y[k]
        y[i2] = s / L[i2][i2]
    x = [None] * n                      # backward: L^T x = y
    for i2 in reversed(range(n)):
        s = y[i2]
        for k in range(i2 + 1, n):
            s = s - L[k][i2] * x[k]
        x[i2] = s / L[i2][i2]
    return jnp.stack(x, axis=-1)


def inv3x3(A: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Batched closed-form 3x3 inverse (adjugate / determinant).

    A: (..., 3, 3). Singular inputs get a pseudo-guarded determinant — the
    callers damp their systems, so |det| ~ 0 only for empty blocks whose
    results are masked downstream.
    """
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    c00 = e * i - f * h
    c01 = c * h - b * i
    c02 = b * f - c * e
    c10 = f * g - d * i
    c11 = a * i - c * g
    c12 = c * d - a * f
    c20 = d * h - e * g
    c21 = b * g - a * h
    c22 = a * e - b * d
    det = a * c00 + b * c10 + c * c20
    det = jnp.where(jnp.abs(det) < eps, eps, det)
    inv = jnp.stack([
        jnp.stack([c00, c01, c02], axis=-1),
        jnp.stack([c10, c11, c12], axis=-1),
        jnp.stack([c20, c21, c22], axis=-1),
    ], axis=-2)
    return inv / det[..., None, None]


def solve3x3(A: jax.Array, b: jax.Array) -> jax.Array:
    """Batched 3x3 solve via the closed-form inverse. A: (..., 3, 3),
    b: (..., 3)."""
    return jnp.einsum("...ij,...j->...i", inv3x3(A), b)
