import jax
import jax.numpy as jnp
import numpy as np
import pytest

from denseslam_tpu.config import tiny_test_config
from denseslam_tpu.io import synthetic
from denseslam_tpu.ops import features, matching, ransac
from denseslam_tpu.utils import lie


@pytest.fixture(scope="module")
def stereo_frames():
    # bigger image so plenty of features
    cfg = tiny_test_config(width=320, height=240)
    poses = synthetic.make_trajectory(2, step_m=0.08, yaw_rate=0.01)
    frames = []
    for i in range(2):
        T = jnp.asarray(poses[i])
        l, r, d = synthetic.render_stereo(T, cfg.rig)
        frames.append((l, r, d))
    return cfg, poses, frames


def test_detect_features(stereo_frames):
    cfg, poses, frames = stereo_frames
    l0 = frames[0][0]
    f = features.detect(l0, cfg.frontend)
    n = int(f.valid.sum())
    assert n > 200, n
    # all detected coords in-bounds and away from borders
    uv = np.asarray(f.uv)[np.asarray(f.valid)]
    # border mask admits integer coords >= 8; parabolic subpixel may
    # shift up to half a pixel outward
    assert uv[:, 0].min() >= 7.5 and uv[:, 0].max() < cfg.rig.intr.width - 7.5
    # descriptors unit-norm
    d = np.asarray(f.desc)[np.asarray(f.valid)]
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-3)


def test_bucketing(stereo_frames):
    cfg, poses, frames = stereo_frames
    f = features.detect(frames[0][0], cfg.frontend)
    fb = features.bucket(f, cfg.rig.intr.width, cfg.rig.intr.height, cfg.frontend)
    assert int(fb.valid.sum()) <= int(f.valid.sum())
    # per-cell cap respected
    uv = np.asarray(fb.uv)[np.asarray(fb.valid)]
    cells = (uv[:, 1] // cfg.frontend.bucket_h).astype(int) * 100 + (
        uv[:, 0] // cfg.frontend.bucket_w
    ).astype(int)
    _, counts = np.unique(cells, return_counts=True)
    assert counts.max() <= cfg.frontend.max_per_bucket


def test_stereo_match_disparity(stereo_frames):
    """L->R matches must satisfy the known disparity relation."""
    cfg, poses, frames = stereo_frames
    l0, r0, d0 = frames[0]
    fl = features.detect(l0, cfg.frontend)
    fr = features.detect(r0, cfg.frontend)
    m = matching.match_stereo(fl, fr, cfg.frontend)
    midx = np.asarray(m)
    valid = midx >= 0
    assert valid.sum() > 100, valid.sum()
    uvl = np.asarray(fl.uv)[valid]
    uvr = np.asarray(fr.uv)[np.maximum(midx[valid], 0)]
    gt_d = np.asarray(d0)[uvl[:, 1].astype(int), uvl[:, 0].astype(int)]
    pred_disp = uvl[:, 0] - uvr[:, 0]
    gt_disp = cfg.rig.intr.fx * cfg.rig.baseline_m / np.maximum(gt_d, 1e-6)
    err = np.abs(pred_disp - gt_disp)
    # most matches within 2 px of true disparity
    assert np.median(err) < 1.5, np.median(err)
    assert (err < 3.0).mean() > 0.7


def test_quad_match_and_vo(stereo_frames):
    cfg, poses, frames = stereo_frames
    l0, r0, _ = frames[0]
    l1, r1, _ = frames[1]
    f_lp = features.detect(l0, cfg.frontend)
    f_rp = features.detect(r0, cfg.frontend)
    f_lc = features.detect(l1, cfg.frontend)
    f_rc = features.detect(r1, cfg.frontend)
    q = matching.quad_match(f_lc, f_rc, f_lp, f_rp, cfg.frontend)
    nq = int(q.valid.sum())
    assert nq > 50, nq

    res = ransac.estimate_stereo_motion(
        q, cfg.rig, cfg.frontend, jax.random.PRNGKey(0)
    )
    assert bool(res.ok)
    assert int(res.num_inliers) > 30

    # ground-truth delta: T_delta maps prev-cam points to curr-cam
    T0, T1 = jnp.asarray(poses[0]), jnp.asarray(poses[1])
    T_gt = lie.inv_T(T1) @ T0
    err = float(lie.pose_error_weighted(res.T_delta, T_gt))
    assert err < 0.02, err


def test_vo_zero_motion(stereo_frames):
    cfg, poses, frames = stereo_frames
    l0, r0, _ = frames[0]
    f_l = features.detect(l0, cfg.frontend)
    f_r = features.detect(r0, cfg.frontend)
    q = matching.quad_match(f_l, f_r, f_l, f_r, cfg.frontend)
    res = ransac.estimate_stereo_motion(q, cfg.rig, cfg.frontend, jax.random.PRNGKey(1))
    assert bool(res.ok)
    err = float(lie.pose_error_weighted(res.T_delta, jnp.eye(4)))
    # integer-pixel detection noise bounds this until subpixel refinement
    assert err < 8e-3, err


def test_vo_jit(stereo_frames):
    cfg, poses, frames = stereo_frames
    l0, r0, _ = frames[0]
    l1, r1, _ = frames[1]

    @jax.jit
    def pipeline(l0, r0, l1, r1, key):
        f_lp = features.detect(l0, cfg.frontend)
        f_rp = features.detect(r0, cfg.frontend)
        f_lc = features.detect(l1, cfg.frontend)
        f_rc = features.detect(r1, cfg.frontend)
        q = matching.quad_match(f_lc, f_rc, f_lp, f_rp, cfg.frontend)
        return ransac.estimate_stereo_motion(q, cfg.rig, cfg.frontend, key)

    res = pipeline(l0, r0, l1, r1, jax.random.PRNGKey(0))
    assert bool(res.ok)


def test_flow_consensus_rejects_incoherent_matches():
    """kNN flow-consensus (the Delaunay-outlier-removal analogue,
    matcher.cpp:1212-1382) kills matches whose flow disagrees with their
    spatial neighbours and keeps the coherent field."""
    m = 256
    rng = np.random.default_rng(0)
    uv = jnp.asarray(rng.uniform(10, 300, size=(m, 2)).astype(np.float32))
    flow_u = jnp.full((m,), 3.0)
    flow_v = jnp.full((m,), -1.5)
    disp = jnp.full((m,), 20.0)
    bad = np.zeros(m, bool)
    bad[[5, 50, 120, 200]] = True
    flow_u = flow_u.at[np.where(bad)[0]].set(40.0)   # wild flow
    valid = jnp.ones((m,), bool)
    keep = matching.flow_consensus(
        uv, flow_u, flow_v, disp, valid,
        k=8, tol_flow=5.0, tol_disp=5.0, min_support=2)
    keep = np.asarray(keep)
    assert not keep[bad].any()
    assert keep[~bad].mean() > 0.95


def test_remove_outliers_improves_vo_with_corrupted_quads(stereo_frames):
    """Corrupt a block of quad matches; consensus filter removes them and
    RANSAC still recovers the pose."""
    cfg, poses, frames = stereo_frames
    l0, r0, _ = frames[0]
    l1, r1, _ = frames[1]
    f_lp = features.detect(l0, cfg.frontend)
    f_rp = features.detect(r0, cfg.frontend)
    f_lc = features.detect(l1, cfg.frontend)
    f_rc = features.detect(r1, cfg.frontend)
    q = matching.quad_match(f_lc, f_rc, f_lp, f_rp, cfg.frontend)
    n_before = int(q.valid.sum())
    # corrupt 20% of valid quads with large random previous-frame offsets
    # (random per match: mutually-agreeing corruption is indistinguishable
    # from a coherent motion cluster, which consensus rightly keeps)
    vidx = np.where(np.asarray(q.valid))[0]
    bad = vidx[:: 5]
    rng = np.random.default_rng(7)
    offs = rng.uniform(20.0, 60.0, size=(len(bad), 2)).astype(np.float32)
    offs *= rng.choice([-1.0, 1.0], size=(len(bad), 2)).astype(np.float32)
    uv_lp = q.uv_lp.at[bad].add(jnp.asarray(offs))
    q = q._replace(uv_lp=uv_lp)
    qf = matching.remove_outliers(q, cfg.frontend)
    keep = np.asarray(qf.valid)
    assert not keep[bad].any()          # corrupted quads all rejected
    assert keep.sum() > 0.5 * n_before  # coherent majority survives
    res = ransac.estimate_stereo_motion(
        qf, cfg.rig, cfg.frontend, jax.random.PRNGKey(3))
    assert bool(res.ok)


def test_predict_uv_analytic():
    """Motion-prior projection matches a hand-computed transform."""
    from denseslam_tpu.utils.camera import Intrinsics
    intr = Intrinsics(fx=100.0, fy=100.0, cx=80.0, cy=60.0, width=160,
                      height=120)
    B = 0.5
    uv = jnp.asarray([[80.0, 60.0], [100.0, 60.0]])
    disp = jnp.asarray([10.0, -1.0])          # second has no disparity
    # pure forward motion 1 m: prev-cam point (0,0,5) -> (0,0,4)
    T = jnp.eye(4).at[2, 3].set(-1.0)
    pred, ok = matching.predict_uv(uv, disp, T, intr.fx, intr.fy, intr.cx,
                                   intr.cy, B)
    assert bool(ok[0]) and not bool(ok[1])
    # center ray stays centered under forward motion
    np.testing.assert_allclose(np.asarray(pred[0]), [80.0, 60.0], atol=1e-4)
    # off-center point: prev (u=100, d=10) -> Z=5, X=(100-80)/100*5=1
    # after dz=-1: Z=4 -> u = 1/4*100+80 = 105
    pred2, ok2 = matching.predict_uv(
        jnp.asarray([[100.0, 60.0]]), jnp.asarray([10.0]), T,
        intr.fx, intr.fy, intr.cx, intr.cy, B)
    np.testing.assert_allclose(np.asarray(pred2[0]), [105.0, 60.0], atol=1e-4)


def test_motion_prior_gate_tracks_accelerating_rotation():
    """A yaw rate that RAMPS past the wide match gate stays trackable only
    with the predictive gate (reference Tr_delta warm start): the prior
    locks on while flow is small and extrapolates through the ramp."""
    import dataclasses

    from denseslam_tpu.models import frontend as fe
    from denseslam_tpu.utils import lie as lie_np

    base = tiny_test_config(width=320, height=240)
    fc = dataclasses.replace(base.frontend, match_radius_px=30.0,
                             predictive_gate_px=16.0)
    # per-frame yaw deltas: ramp 0 -> 0.24 rad/frame (flow ~0 -> ~65 px)
    deltas = [0.0, 0.04, 0.08, 0.12, 0.16, 0.20, 0.24, 0.24]
    poses = []
    T = np.eye(4, dtype=np.float32)
    for dy in deltas:
        poses.append(T.copy())
        xi = np.array([0, 0, 0, 0, dy, 0], dtype=np.float32)
        T = (T @ np.asarray(lie_np.se3_exp_np(xi))).astype(np.float32)

    results = {}
    for flag in (False, True):
        cfg_f = dataclasses.replace(
            base, frontend=dataclasses.replace(fc, use_motion_prior_gate=flag))
        st = fe.init_frontend(cfg_f)
        step = jax.jit(lambda s, l, r: fe.vo_step(s, l, r, cfg_f))
        oks = []
        for i in range(len(deltas)):
            l, r, _ = synthetic.render_stereo(jnp.asarray(poses[i]), base.rig)
            st, vo = step(st, l, r)
            oks.append(bool(vo.tracking_ok))
        results[flag] = oks
    # without the prior, the >30 px flow frames (yaw >= 0.12) are lost
    assert not all(results[False][4:]), results
    # with the prior, tracking survives the whole ramp
    assert all(results[True][1:]), results
