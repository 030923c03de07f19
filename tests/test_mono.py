import jax
import jax.numpy as jnp
import numpy as np

from denseslam_tpu.config import tiny_test_config
from denseslam_tpu.ops import mono
from denseslam_tpu.utils import lie


def make_pair(rng, T_delta, intr, n=200, noise_px=0.0, outlier_frac=0.0):
    """Project random 3D points into prev (identity) and curr (T_delta)."""
    pts = rng.uniform([-3, -2, 2.0], [3, 2, 10.0], (n, 3)).astype(np.float32)
    def proj(T):
        Ti = np.asarray(lie.inv_T(jnp.asarray(T)))
        pc = pts @ Ti[:3, :3].T + Ti[:3, 3]
        u = pc[:, 0] / pc[:, 2] * intr.fx + intr.cx
        v = pc[:, 1] / pc[:, 2] * intr.fy + intr.cy
        return np.stack([u, v], -1), pc[:, 2]
    uv_p, zp = proj(np.eye(4, dtype=np.float32))
    # curr camera at pose T_wc = T_delta^-1 (so p_c = T_delta p_p)
    uv_c, zc = proj(np.asarray(lie.inv_T(jnp.asarray(T_delta))))
    ok = (zp > 0.1) & (zc > 0.1)
    uv_p += rng.normal(0, noise_px, uv_p.shape)
    uv_c += rng.normal(0, noise_px, uv_c.shape)
    n_out = int(outlier_frac * n)
    if n_out:
        idx = rng.choice(n, n_out, replace=False)
        uv_c[idx] += rng.uniform(20, 80, (n_out, 2))
    return jnp.asarray(uv_p), jnp.asarray(uv_c), jnp.asarray(ok)


def test_mono_recovers_motion(rng):
    cfg = tiny_test_config(width=320, height=240)
    intr = cfg.rig.intr
    xi = np.array([0.2, 0.05, 0.1, 0.01, 0.03, 0.005], np.float32)
    T_gt = np.asarray(lie.se3_exp(jnp.asarray(xi)))
    uv_p, uv_c, ok = make_pair(rng, T_gt, intr)
    res = mono.estimate_mono_motion(uv_p, uv_c, ok, intr, cfg.frontend,
                                    jax.random.PRNGKey(0))
    assert bool(res.ok)
    # rotation recovered
    R_err = float(lie.pose_error_weighted(
        lie.make_T(res.T_delta[:3, :3], jnp.zeros(3)),
        lie.make_T(jnp.asarray(T_gt[:3, :3]), jnp.zeros(3))))
    assert R_err < 5e-3, R_err
    # translation DIRECTION recovered (scale unobservable)
    t_est = np.asarray(res.T_delta[:3, 3])
    t_gt = T_gt[:3, 3] / np.linalg.norm(T_gt[:3, 3])
    cos = abs(float(t_est @ t_gt))
    assert cos > 0.99, cos


def test_mono_with_noise_and_outliers(rng):
    cfg = tiny_test_config(width=320, height=240)
    intr = cfg.rig.intr
    xi = np.array([0.15, 0.0, 0.25, 0.0, 0.02, 0.0], np.float32)
    T_gt = np.asarray(lie.se3_exp(jnp.asarray(xi)))
    uv_p, uv_c, ok = make_pair(rng, T_gt, intr, noise_px=0.3, outlier_frac=0.15)
    res = mono.estimate_mono_motion(uv_p, uv_c, ok, intr, cfg.frontend,
                                    jax.random.PRNGKey(1))
    assert bool(res.ok)
    t_est = np.asarray(res.T_delta[:3, 3])
    t_gt = T_gt[:3, 3] / np.linalg.norm(T_gt[:3, 3])
    assert abs(float(t_est @ t_gt)) > 0.97
    assert int(res.num_inliers) > 100


def test_mono_degenerate_fails_gracefully(rng):
    cfg = tiny_test_config(width=320, height=240)
    intr = cfg.rig.intr
    uv = jnp.asarray(rng.uniform(0, 200, (50, 2)).astype(np.float32))
    res = mono.estimate_mono_motion(uv, uv * 0 + 5.0, jnp.zeros(50, bool),
                                    intr, cfg.frontend, jax.random.PRNGKey(2))
    assert not bool(res.ok)
    np.testing.assert_allclose(np.asarray(res.T_delta), np.eye(4), atol=1e-6)


def test_mono_scale_from_ground(rng):
    cfg = tiny_test_config(width=320, height=240)
    intr = cfg.rig.intr
    h_cam = 1.2
    # points: half on the ground plane y=h_cam, half in the air
    n = 240
    ground = np.stack([
        rng.uniform(-3, 3, n // 2),
        np.full(n // 2, h_cam),
        rng.uniform(2.5, 9.0, n // 2),
    ], -1)
    air = rng.uniform([-3, -2, 2.5], [3, 0.5, 9.0], (n - n // 2, 3))
    pts = np.concatenate([ground, air]).astype(np.float32)
    s_gt = 0.3
    T_gt = np.eye(4, dtype=np.float32)
    T_gt[2, 3] = s_gt  # forward motion, metric

    def proj(T):
        Ti = np.asarray(lie.inv_T(jnp.asarray(T)))
        pc = pts @ Ti[:3, :3].T + Ti[:3, 3]
        u = pc[:, 0] / pc[:, 2] * intr.fx + intr.cx
        v = pc[:, 1] / pc[:, 2] * intr.fy + intr.cy
        return np.stack([u, v], -1), pc[:, 2]

    uv_p, zp = proj(np.eye(4, dtype=np.float32))
    uv_c, zc = proj(np.asarray(lie.inv_T(jnp.asarray(T_gt))))
    ok = (zp > 0.1) & (zc > 0.1)
    res = mono.estimate_mono_motion(
        jnp.asarray(uv_p), jnp.asarray(uv_c), jnp.asarray(ok), intr,
        cfg.frontend, jax.random.PRNGKey(0))
    assert bool(res.ok)
    sc = mono.estimate_scale_ground(
        res.T_delta, jnp.asarray(uv_p), jnp.asarray(uv_c), res.inliers,
        intr, camera_height_m=h_cam, camera_pitch_rad=0.0)
    assert bool(sc.ok), int(sc.num_ground)
    assert abs(float(sc.scale) - s_gt) / s_gt < 0.1, float(sc.scale)


def test_mono_vo_trajectory():
    import dataclasses
    from denseslam_tpu.io import synthetic
    from denseslam_tpu.models import frontend as fe

    cfg = tiny_test_config(width=320, height=240)
    cfg = dataclasses.replace(
        cfg, frontend=dataclasses.replace(
            cfg.frontend, camera_height_m=1.2, camera_pitch_rad=0.0))
    n, step = 8, 0.25
    poses = synthetic.make_trajectory(n, step_m=step, yaw_rate=0.0)
    grays, _ = synthetic.render_trajectory(poses, cfg.rig.intr)
    st = fe.init_frontend(cfg, seed=0)
    f = jax.jit(lambda st, img: fe.mono_vo_step(st, img, cfg))
    for i in range(n):
        st, vo = f(st, grays[i])
    # metric forward progress recovered via the ground-plane scale
    T = np.asarray(vo.T_wc)
    gt = poses[-1]
    dist = np.linalg.norm(T[:3, 3])
    gt_dist = np.linalg.norm(gt[:3, 3])
    assert gt_dist > 0
    assert abs(dist - gt_dist) / gt_dist < 0.25, (dist, gt_dist)


def test_mono_pipeline_mode():
    import dataclasses
    from denseslam_tpu.io import synthetic
    from denseslam_tpu.models.dense_slam import DenseSLAM

    cfg = tiny_test_config(width=320, height=240)
    cfg = dataclasses.replace(
        cfg,
        pipeline=dataclasses.replace(cfg.pipeline, sensor="mono",
                                     fusion_db_capacity=4),
        frontend=dataclasses.replace(cfg.frontend, camera_height_m=1.2),
    )
    n = 4
    poses = synthetic.make_trajectory(n, step_m=0.2, yaw_rate=0.0)
    grays, depths = synthetic.render_trajectory(poses, cfg.rig.intr)
    slam = DenseSLAM(cfg, seed=0)
    # tracking-only frames: no depth -> no fusion
    out0 = slam.process_frame(grays[0])
    assert not out0["fused"] and out0["num_blocks"] == 0
    out1 = slam.process_frame(grays[1])
    assert not out1["fused"]
    # depth-supplied frames fuse (mono + external depth)
    out2 = slam.process_frame(grays[2], depth=depths[2])
    assert out2["fused"] and out2["num_blocks"] > 0
