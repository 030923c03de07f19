"""Pose-graph optimisation (loop-closure relaxation).

Capability target: g2o's pose-graph solve inside ORB-SLAM2's LoopClosing +
InfiniTAM's MiniSlamGraphLib submap alignment (reference surface SURVEY.md
section 2b: `MiniSlamGraphLib`, linked at CMakeLists.txt:110). TPU design:
fixed-cap node/edge arrays; per-edge 6-dof residuals with exact Jacobians
via `jax.jacfwd` batched over edges; normal equations assembled by
scatter-add into a dense (6N, 6N) system solved with one Cholesky — at
N <= a few hundred nodes this is a single tiny MXU solve per iteration.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import BackendConfig
from ..utils import lie


class PoseGraph(NamedTuple):
    T_wc: jax.Array       # (N, 4, 4) node poses
    node_valid: jax.Array  # (N,) bool
    edge_i: jax.Array     # (E,) i32 source node
    edge_j: jax.Array     # (E,) i32 target node
    T_ij: jax.Array       # (E, 4, 4) measured relative transform: T_i^-1 T_j
    edge_weight: jax.Array  # (E,) f32 information weight (0 = inactive)
    fixed: jax.Array      # (N,) bool gauge anchors


def make_graph(cfg: BackendConfig) -> PoseGraph:
    n, e = cfg.max_pg_nodes, cfg.max_pg_edges
    eye = jnp.tile(jnp.eye(4, dtype=jnp.float32), (n, 1, 1))
    eye_e = jnp.tile(jnp.eye(4, dtype=jnp.float32), (e, 1, 1))
    return PoseGraph(
        T_wc=eye,
        node_valid=jnp.zeros((n,), bool),
        edge_i=jnp.zeros((e,), jnp.int32),
        edge_j=jnp.zeros((e,), jnp.int32),
        T_ij=eye_e,
        edge_weight=jnp.zeros((e,), jnp.float32),
        fixed=jnp.zeros((n,), bool).at[0].set(True),
    )


def _edge_residual(xi_i, xi_j, T_i, T_j, T_ij_meas):
    """r = log( T_ij_meas^-1 · (exp(xi_i) T_i)^-1 · (exp(xi_j) T_j) )."""
    Ti = lie.se3_exp(xi_i) @ T_i
    Tj = lie.se3_exp(xi_j) @ T_j
    return lie.se3_log(lie.inv_T(T_ij_meas) @ (lie.inv_T(Ti) @ Tj))


def optimize(g: PoseGraph, cfg: BackendConfig, iters: int | None = None) -> PoseGraph:
    """Gauss-Newton relaxation of all active nodes."""
    n = g.T_wc.shape[0]
    iters = cfg.pg_iters if iters is None else iters
    zero6 = jnp.zeros((6,), jnp.float32)

    # residual+jacobian for one edge, linearised at xi=0
    def edge_terms(T_i, T_j, T_meas):
        r = _edge_residual(zero6, zero6, T_i, T_j, T_meas)
        J_i = jax.jacfwd(lambda x: _edge_residual(x, zero6, T_i, T_j, T_meas))(zero6)
        J_j = jax.jacfwd(lambda x: _edge_residual(zero6, x, T_i, T_j, T_meas))(zero6)
        return r, J_i, J_j

    batched_terms = jax.vmap(edge_terms)

    def gn_iter(_, T_wc):
        Ti = T_wc[g.edge_i]
        Tj = T_wc[g.edge_j]
        r, J_i, J_j = batched_terms(Ti, Tj, g.T_ij)       # (E,6), (E,6,6)x2
        w = g.edge_weight[:, None, None]

        H = jnp.zeros((n, n, 6, 6), jnp.float32)
        b = jnp.zeros((n, 6), jnp.float32)
        JiT = jnp.swapaxes(J_i, -1, -2)
        JjT = jnp.swapaxes(J_j, -1, -2)
        H = H.at[g.edge_i, g.edge_i].add(w * (JiT @ J_i))
        H = H.at[g.edge_j, g.edge_j].add(w * (JjT @ J_j))
        H = H.at[g.edge_i, g.edge_j].add(w * (JiT @ J_j))
        H = H.at[g.edge_j, g.edge_i].add(w * (JjT @ J_i))
        b = b.at[g.edge_i].add((w[..., 0] * (JiT @ r[..., None])[..., 0]))
        b = b.at[g.edge_j].add((w[..., 0] * (JjT @ r[..., None])[..., 0]))

        # gauge + inactive nodes: pin with identity
        pin = g.fixed | ~g.node_valid
        H = jnp.where(pin[:, None, None, None] | pin[None, :, None, None], 0.0, H)
        H = H.at[jnp.arange(n), jnp.arange(n)].add(
            jnp.where(pin, 1.0, 0.0)[:, None, None] * jnp.eye(6, dtype=H.dtype)
        )
        b = jnp.where(pin[:, None], 0.0, b)

        H_dense = jnp.transpose(H, (0, 2, 1, 3)).reshape(6 * n, 6 * n)
        damp = 1e-6 * jnp.trace(H_dense) / (6 * n) + 1e-8
        dx = -jnp.linalg.solve(
            H_dense + damp * jnp.eye(6 * n, dtype=H.dtype), b.reshape(-1)
        ).reshape(n, 6)
        dx = jnp.clip(dx, -1.0, 1.0)
        return jax.vmap(lambda xi, T: lie.se3_exp(xi) @ T)(dx, T_wc)

    T_new = jax.lax.fori_loop(0, iters, gn_iter, g.T_wc)
    return g._replace(T_wc=T_new)


def total_error(g: PoseGraph) -> jax.Array:
    """Sum of weighted squared edge residual norms (diagnostic)."""
    Ti = g.T_wc[g.edge_i]
    Tj = g.T_wc[g.edge_j]
    zero6 = jnp.zeros((6,), jnp.float32)
    r = jax.vmap(lambda a, b, m: _edge_residual(zero6, zero6, a, b, m))(
        Ti, Tj, g.T_ij
    )
    return jnp.sum(g.edge_weight * jnp.sum(r * r, axis=-1))
