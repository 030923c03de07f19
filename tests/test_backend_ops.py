import jax
import jax.numpy as jnp
import numpy as np
import pytest

from denseslam_tpu.config import tiny_test_config, BackendConfig
from denseslam_tpu.ops import ba, posegraph
from denseslam_tpu.utils import lie


def make_ba_problem(rng, K=4, L=64, noise_px=0.0, pose_noise=0.02,
                    point_noise=0.05, rig=None):
    """Synthetic BA problem with known ground truth."""
    # ground-truth poses along a small trajectory
    T_gt = [np.eye(4, dtype=np.float32)]
    for k in range(1, K):
        xi = np.array([0.1, 0.02 * k, 0.05, 0.0, 0.02, 0.0], np.float32)
        T_gt.append(np.asarray(lie.se3_exp(jnp.asarray(xi)) @ jnp.asarray(T_gt[-1])))
    T_gt = np.stack(T_gt)

    pts = rng.uniform([-2, -1.5, 2.0], [2, 1.5, 6.0], (L, 3)).astype(np.float32)

    intr = rig.intr
    obs = np.zeros((L, K, 3), np.float32)
    mask = np.zeros((L, K), bool)
    for k in range(K):
        T_cw = np.asarray(lie.inv_T(jnp.asarray(T_gt[k])))
        pc = pts @ T_cw[:3, :3].T + T_cw[:3, 3]
        z = pc[:, 2]
        ul = pc[:, 0] / z * intr.fx + intr.cx
        v = pc[:, 1] / z * intr.fy + intr.cy
        ur = (pc[:, 0] - rig.baseline_m) / z * intr.fx + intr.cx
        ok = (z > 0.5) & (ul > 0) & (ul < intr.width) & (v > 0) & (v < intr.height)
        obs[:, k, 0] = ul + rng.normal(0, noise_px, L)
        obs[:, k, 1] = v + rng.normal(0, noise_px, L)
        obs[:, k, 2] = ur + rng.normal(0, noise_px, L)
        mask[:, k] = ok

    # perturb initial poses (except fixed kf 0) and points
    T_init = T_gt.copy()
    for k in range(1, K):
        xi = np.concatenate([
            rng.normal(0, pose_noise, 3), rng.normal(0, pose_noise / 2, 3)
        ]).astype(np.float32)
        T_init[k] = np.asarray(jnp.asarray(T_gt[k]) @ lie.se3_exp(jnp.asarray(xi)))
    pts_init = pts + rng.normal(0, point_noise, (L, 3)).astype(np.float32)

    fixed = np.zeros(K, bool)
    fixed[0] = True
    problem = ba.BAProblem(
        T_wc=jnp.asarray(T_init),
        points_w=jnp.asarray(pts_init),
        obs=jnp.asarray(obs),
        obs_mask=jnp.asarray(mask),
        fixed=jnp.asarray(fixed),
        point_valid=jnp.ones((L,), bool),
    )
    return problem, T_gt, pts


def test_ba_recovers_poses(rng):
    cfg = tiny_test_config(width=320, height=240, baseline_m=0.2)
    problem, T_gt, pts_gt = make_ba_problem(rng, rig=cfg.rig)
    res = ba.solve(problem, cfg.rig, cfg.backend)
    assert float(res.final_cost) < float(res.initial_cost) * 1e-3
    for k in range(T_gt.shape[0]):
        err = float(lie.pose_error_weighted(res.T_wc[k], jnp.asarray(T_gt[k])))
        assert err < 2e-3, (k, err)
    pt_err = np.linalg.norm(np.asarray(res.points_w) - pts_gt, axis=-1)
    assert np.median(pt_err) < 5e-3


def test_ba_with_noise_and_outliers(rng):
    cfg = tiny_test_config(width=320, height=240, baseline_m=0.2)
    problem, T_gt, pts_gt = make_ba_problem(rng, noise_px=0.3, rig=cfg.rig)
    # inject 5% gross outlier observations — Huber must keep the solve sane
    obs = np.array(problem.obs)
    mask = np.asarray(problem.obs_mask)
    n_out = int(0.05 * mask.sum())
    li = rng.integers(0, obs.shape[0], n_out)
    ki = rng.integers(0, obs.shape[1], n_out)
    obs[li, ki, :2] += rng.normal(0, 30, (n_out, 2))
    problem = problem._replace(obs=jnp.asarray(obs))
    res = ba.solve(problem, cfg.rig, cfg.backend)
    for k in range(T_gt.shape[0]):
        err = float(lie.pose_error_weighted(res.T_wc[k], jnp.asarray(T_gt[k])))
        assert err < 0.015, (k, err)


def test_ba_fixed_gauge(rng):
    cfg = tiny_test_config(width=320, height=240, baseline_m=0.2)
    problem, T_gt, _ = make_ba_problem(rng, rig=cfg.rig)
    res = ba.solve(problem, cfg.rig, cfg.backend)
    # keyframe 0 is fixed: must not move at all
    np.testing.assert_allclose(
        np.asarray(res.T_wc[0]), np.asarray(problem.T_wc[0]), atol=1e-6
    )


def test_ba_jit(rng):
    cfg = tiny_test_config(width=320, height=240, baseline_m=0.2)
    problem, _, _ = make_ba_problem(rng, rig=cfg.rig)
    f = jax.jit(lambda p: ba.solve(p, cfg.rig, cfg.backend))
    res = f(problem)
    assert float(res.final_cost) < float(res.initial_cost)


# ---------------------------------------------------------------------------


def _ring_graph(cfg: BackendConfig, n_active=12, drift=0.02, rng=None):
    """Odometry ring with a loop-closure edge; ground truth = regular polygon."""
    g = posegraph.make_graph(cfg)
    # ground-truth: walk a circle in n_active steps
    step = 2 * np.pi / n_active
    T_gt = [np.eye(4, dtype=np.float32)]
    xi_step = np.array([0.0, 0.0, 0.5, 0.0, step, 0.0], np.float32)
    for i in range(1, n_active):
        T_gt.append(np.asarray(jnp.asarray(T_gt[-1]) @ lie.se3_exp(jnp.asarray(xi_step))))
    T_gt = np.stack(T_gt)

    # odometry measurements = true relative + drift noise
    T_wc = T_gt.copy()
    ei, ej, Tij, w = [], [], [], []
    for i in range(n_active - 1):
        noise = np.concatenate([rng.normal(0, drift, 3), rng.normal(0, drift / 2, 3)])
        T_meas = np.asarray(
            lie.se3_exp(jnp.asarray(noise.astype(np.float32)))
            @ (lie.inv_T(jnp.asarray(T_gt[i])) @ jnp.asarray(T_gt[i + 1]))
        )
        ei.append(i); ej.append(i + 1); Tij.append(T_meas); w.append(1.0)
    # integrate noisy odometry for the initial guess
    for i in range(1, n_active):
        T_wc[i] = T_wc[i - 1] @ Tij[i - 1]
    # loop closure: exact measurement from last node back to first
    T_loop = np.asarray(lie.inv_T(jnp.asarray(T_gt[-1])) @ jnp.asarray(T_gt[0]))
    ei.append(n_active - 1); ej.append(0); Tij.append(T_loop); w.append(10.0)

    e = len(ei)
    g = g._replace(
        T_wc=g.T_wc.at[:n_active].set(jnp.asarray(T_wc)),
        node_valid=g.node_valid.at[:n_active].set(True),
        edge_i=g.edge_i.at[:e].set(jnp.asarray(ei, dtype=jnp.int32)),
        edge_j=g.edge_j.at[:e].set(jnp.asarray(ej, dtype=jnp.int32)),
        T_ij=g.T_ij.at[:e].set(jnp.asarray(np.stack(Tij))),
        edge_weight=g.edge_weight.at[:e].set(jnp.asarray(w, dtype=jnp.float32)),
    )
    return g, T_gt


def test_posegraph_closes_loop(rng):
    cfg = BackendConfig(max_pg_nodes=16, max_pg_edges=32, pg_iters=25)
    g, T_gt = _ring_graph(cfg, rng=rng)
    err_before = float(posegraph.total_error(g))
    g2 = posegraph.optimize(g, cfg)
    err_after = float(posegraph.total_error(g2))
    assert err_after < err_before * 0.1, (err_before, err_after)
    # end node should be pulled close to ground truth
    end_err_before = float(lie.pose_error_weighted(g.T_wc[11], jnp.asarray(T_gt[11])))
    end_err_after = float(lie.pose_error_weighted(g2.T_wc[11], jnp.asarray(T_gt[11])))
    assert end_err_after < end_err_before * 0.5


def test_posegraph_fixed_anchor(rng):
    cfg = BackendConfig(max_pg_nodes=16, max_pg_edges=32, pg_iters=10)
    g, _ = _ring_graph(cfg, rng=rng)
    g2 = posegraph.optimize(g, cfg)
    np.testing.assert_allclose(np.asarray(g2.T_wc[0]), np.eye(4), atol=1e-5)


def test_posegraph_jit(rng):
    cfg = BackendConfig(max_pg_nodes=16, max_pg_edges=32, pg_iters=5)
    g, _ = _ring_graph(cfg, rng=rng)
    f = jax.jit(lambda g: posegraph.optimize(g, cfg))
    g2 = f(g)
    assert np.isfinite(np.asarray(g2.T_wc)).all()
