import jax
import jax.numpy as jnp
import numpy as np
import pytest

from denseslam_tpu.config import tiny_test_config
from denseslam_tpu.io import synthetic
from denseslam_tpu.ops import icp, raycast as rc_ops, tsdf as tsdf_ops
from denseslam_tpu.utils import lie


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_test_config()
    m = tsdf_ops.make_map(cfg.tsdf)
    poses = synthetic.make_trajectory(4, step_m=0.05, yaw_rate=0.0)

    @jax.jit
    def fuse(m, depth, T):
        m, slots, mask = tsdf_ops.allocate_for_frame(m, depth, T, cfg.rig.intr, cfg.tsdf)
        m = tsdf_ops.integrate(m, slots, mask, depth, None, T, cfg.rig.intr, cfg.tsdf)
        return tsdf_ops.advance_frame(m)

    for i in range(4):
        T = jnp.asarray(poses[i])
        _, depth = synthetic.render_view(T, cfg.rig.intr)
        m = fuse(m, depth, T)
    return cfg, m, poses


def test_icp_recovers_known_offset(setup):
    cfg, m, poses = setup
    T_true = jnp.asarray(poses[3])
    _, depth = synthetic.render_view(T_true, cfg.rig.intr)

    # raycast the model from the previous pose
    T_render = jnp.asarray(poses[2])
    rc = rc_ops.raycast(m, T_render, cfg.rig.intr, cfg.tsdf)

    # perturb the true pose and ask ICP to recover it
    xi = jnp.array([0.02, -0.015, 0.03, 0.008, -0.01, 0.006], jnp.float32)
    T_init = T_true @ lie.se3_exp(xi)
    res = icp.track(
        depth, rc.points, rc.normals, rc.mask,
        T_init, T_render, cfg.rig.intr, num_iters=15, min_inliers=200,
    )
    assert bool(res.converged)
    err = float(lie.pose_error_weighted(res.T_wc, T_true))
    init_err = float(lie.pose_error_weighted(T_init, T_true))
    assert err < 0.01, (err, init_err)
    assert err < init_err * 0.25


def test_icp_identity_stays_put(setup):
    cfg, m, poses = setup
    T_true = jnp.asarray(poses[2])
    _, depth = synthetic.render_view(T_true, cfg.rig.intr)
    rc = rc_ops.raycast(m, T_true, cfg.rig.intr, cfg.tsdf)
    res = icp.track(depth, rc.points, rc.normals, rc.mask,
                    T_true, T_true, cfg.rig.intr, num_iters=8, min_inliers=200)
    err = float(lie.pose_error_weighted(res.T_wc, T_true))
    assert err < 5e-3, err  # voxel-discretisation bias; 5cm voxels -> mm-scale drift
    assert float(res.rmse) < 0.02


def test_icp_no_model_fails_gracefully(setup):
    cfg, _, poses = setup
    T = jnp.asarray(poses[0])
    _, depth = synthetic.render_view(T, cfg.rig.intr)
    empty = jnp.zeros((cfg.rig.intr.height, cfg.rig.intr.width, 3), jnp.float32)
    mask = jnp.zeros((cfg.rig.intr.height, cfg.rig.intr.width), bool)
    res = icp.track(depth, empty, empty, mask, T, T, cfg.rig.intr)
    assert not bool(res.converged)
    # pose unchanged when not converged
    np.testing.assert_allclose(np.asarray(res.T_wc), np.asarray(T), atol=1e-6)


def test_icp_jit(setup):
    cfg, m, poses = setup
    T = jnp.asarray(poses[2])
    _, depth = synthetic.render_view(T, cfg.rig.intr)
    rc = rc_ops.raycast(m, T, cfg.rig.intr, cfg.tsdf)
    f = jax.jit(
        lambda d, p, n, k, t: icp.track(d, p, n, k, t, t, cfg.rig.intr, num_iters=5,
                                        min_inliers=200)
    )
    res = f(depth, rc.points, rc.normals, rc.mask, T)
    assert bool(res.converged)
