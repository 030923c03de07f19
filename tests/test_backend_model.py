import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from denseslam_tpu.config import tiny_test_config
from denseslam_tpu.io import synthetic
from denseslam_tpu.models import backend as be
from denseslam_tpu.ops import features
from denseslam_tpu.utils import lie


@pytest.fixture(scope="module")
def cfg():
    return tiny_test_config(width=320, height=240, baseline_m=0.25)


def make_kf_inputs(cfg, T):
    l, r, _ = synthetic.render_stereo(T, cfg.rig)
    fl = features.detect(l, cfg.frontend)
    fr = features.detect(r, cfg.frontend)
    return fl, fr


def test_local_ba_improves_noisy_poses(cfg, rng):
    bk = be.Backend(cfg)
    n = 5
    poses = synthetic.make_trajectory(n, step_m=0.08, yaw_rate=0.01)
    noisy = poses.copy()
    for i in range(1, n):
        xi = np.concatenate(
            [rng.normal(0, 0.02, 3), rng.normal(0, 0.006, 3)]
        ).astype(np.float32)
        noisy[i] = np.asarray(jnp.asarray(poses[i]) @ lie.se3_exp(jnp.asarray(xi)))
    for i in range(n):
        fl, fr = make_kf_inputs(cfg, jnp.asarray(poses[i]))
        bk.add_keyframe(i, noisy[i], fl, fr)

    before = [
        float(lie.pose_error_weighted(jnp.asarray(noisy[i]), jnp.asarray(poses[i])))
        for i in range(n)
    ]
    out = bk.local_ba()
    assert out is not None
    ids, opt = out
    after = [
        float(lie.pose_error_weighted(jnp.asarray(bk.keyframes[i].T_wc), jnp.asarray(poses[i])))
        for i in range(n)
    ]
    # BA anchors on (noisy) kf0; compare relative improvement on later kfs
    assert np.mean(after[1:]) < np.mean(before[1:]), (before, after)


def test_loop_detection_on_revisit(cfg):
    bk = be.Backend(cfg)
    # trajectory that wanders and returns to the start pose
    n = 14
    poses = [np.eye(4, dtype=np.float32)]
    for i in range(1, n):
        if i < n // 2:
            xi = np.array([0.05, 0, 0.1, 0, 0.02, 0], np.float32)
        else:
            xi = np.array([-0.05, 0, -0.1, 0, -0.02, 0], np.float32)
        poses.append(np.asarray(jnp.asarray(poses[-1]) @ lie.se3_exp(jnp.asarray(xi))))
    poses.append(poses[0].copy())  # exact revisit
    for i, T in enumerate(poses):
        fl, fr = make_kf_inputs(cfg, jnp.asarray(T))
        bk.add_keyframe(i, T, fl, fr)
        hit = bk.detect_loop(min_gap=8, min_inliers=30)
        if hit is not None:
            qi, ci = hit
            assert qi == len(bk.keyframes) - 1
            assert ci <= 2  # matched back to the start
            return
    pytest.fail("no loop detected on exact revisit")


def test_posegraph_corrects_drift(cfg, rng):
    """Odometry drift + loop edge: graph relaxation pulls the revisit node
    back to the start."""
    bk = be.Backend(cfg)
    n = 12
    # ground truth: out-and-back ending at start
    gt = [np.eye(4, dtype=np.float32)]
    for i in range(1, n):
        sgn = 1.0 if i < n // 2 else -1.0
        xi = np.array([0, 0, sgn * 0.12, 0, 0, 0], np.float32)
        gt.append(np.asarray(jnp.asarray(gt[-1]) @ lie.se3_exp(jnp.asarray(xi))))
    gt.append(gt[0].copy())
    # drifted odometry
    est = [gt[0]]
    for i in range(1, len(gt)):
        T_rel = np.asarray(lie.inv_T(jnp.asarray(gt[i - 1])) @ jnp.asarray(gt[i]))
        noise = np.concatenate([rng.normal(0, 0.01, 3), rng.normal(0, 0.003, 3)])
        T_rel = np.asarray(jnp.asarray(T_rel) @ lie.se3_exp(jnp.asarray(noise.astype(np.float32))))
        est.append(est[-1] @ T_rel)
    for i, T in enumerate(est):
        fl, fr = make_kf_inputs(cfg, jnp.asarray(gt[i]))
        bk.add_keyframe(i, T, fl, fr)
    # add a ground-truth loop edge last->first manually (verified loops are
    # covered by test_loop_detection_on_revisit)
    T_ij = np.asarray(lie.inv_T(jnp.asarray(gt[-1])) @ jnp.asarray(gt[0]))
    bk.loop_edges.append((len(gt) - 1, 0, T_ij, 10.0))

    drift_before = float(
        lie.pose_error_weighted(jnp.asarray(bk.keyframes[-1].T_wc), jnp.asarray(gt[-1]))
    )
    ids, opt = bk.optimize_graph()
    drift_after = float(
        lie.pose_error_weighted(jnp.asarray(bk.keyframes[-1].T_wc), jnp.asarray(gt[-1]))
    )
    assert drift_after < drift_before * 0.5, (drift_before, drift_after)
