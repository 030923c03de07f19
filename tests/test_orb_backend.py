"""ORB feature stack wired through the common frontend/backend programs
(cfg.frontend.feature_type="orb"): VO tracking, window BA, loop retrieval.

Reference parity: the reference backend (ORB-SLAM2 fork) matches keyframes
with ORB descriptors; here the same jitted matching/BA/retrieval programs
run on ORB via the +-1/16 bit-vector embedding (ops/orb.to_common)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from denseslam_tpu.config import tiny_test_config
from denseslam_tpu.io import synthetic
from denseslam_tpu.models import backend as be
from denseslam_tpu.models import frontend as fe
from denseslam_tpu.ops import features
from denseslam_tpu.utils import lie


@pytest.fixture(scope="module")
def cfg():
    c = tiny_test_config(width=320, height=240, baseline_m=0.25)
    return dataclasses.replace(
        c, frontend=dataclasses.replace(c.frontend, feature_type="orb"))


def make_kf_inputs(cfg, T):
    l, r, _ = synthetic.render_stereo(T, cfg.rig)
    fl = features.detect(l, cfg.frontend)
    fr = features.detect(r, cfg.frontend)
    return fl, fr


def test_orb_detect_common_shapes(cfg):
    l, _, _ = synthetic.render_stereo(jnp.eye(4), cfg.rig)
    f = features.detect(l, cfg.frontend)
    n = cfg.frontend.max_features
    assert f.uv.shape == (n, 2)
    assert f.desc.shape == (n, features.desc_dim(cfg.frontend))
    assert int(f.valid.sum()) > 50
    # unit-norm bit-vector embedding => squared-L2 == Hamming/64
    norms = jnp.linalg.norm(f.desc[f.valid], axis=-1)
    assert jnp.allclose(norms, 1.0, atol=1e-5)


def test_orb_vo_tracks_small_motion(cfg):
    state = fe.init_frontend(cfg)
    step = jax.jit(lambda s, l, r: fe.vo_step(s, l, r, cfg))
    T0 = jnp.eye(4)
    xi = jnp.asarray([0.04, 0.0, 0.08, 0.0, 0.01, 0.0], jnp.float32)
    T1 = T0 @ lie.se3_exp(xi)
    l0, r0, _ = synthetic.render_stereo(T0, cfg.rig)
    l1, r1, _ = synthetic.render_stereo(T1, cfg.rig)
    state, _ = step(state, l0, r0)
    state, out = step(state, l1, r1)
    assert bool(out.tracking_ok)
    err = float(lie.pose_error_weighted(out.T_wc, T1))
    assert err < 0.05, err


def test_orb_local_ba_improves_noisy_poses(cfg, rng):
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
    after = [
        float(lie.pose_error_weighted(jnp.asarray(bk.keyframes[i].T_wc),
                                      jnp.asarray(poses[i])))
        for i in range(n)
    ]
    assert np.mean(after[1:]) < np.mean(before[1:]), (before, after)


def test_orb_loop_detection_on_revisit(cfg):
    bk = be.Backend(cfg)
    n = 14
    poses = [np.eye(4, dtype=np.float32)]
    for i in range(1, n):
        if i < n // 2:
            xi = np.array([0.05, 0, 0.1, 0, 0.02, 0], np.float32)
        else:
            xi = np.array([-0.05, 0, -0.1, 0, -0.02, 0], np.float32)
        poses.append(np.asarray(jnp.asarray(poses[-1]) @ lie.se3_exp(jnp.asarray(xi))))
    poses.append(poses[0].copy())
    for i, T in enumerate(poses):
        fl, fr = make_kf_inputs(cfg, jnp.asarray(T))
        bk.add_keyframe(i, T, fl, fr)
        hit = bk.detect_loop(min_gap=8, min_inliers=30)
        if hit is not None:
            qi, ci = hit
            assert qi == len(bk.keyframes) - 1
            assert ci <= 2
            return
    pytest.fail("no loop detected on exact revisit with ORB features")
