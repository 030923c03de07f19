import os

import numpy as np
import pytest

from denseslam_tpu.eval import depth_metrics as dm
from denseslam_tpu.eval import traj_metrics as tm
from denseslam_tpu.io import datasets, pfm, trajectory
from denseslam_tpu.utils import lie
import jax.numpy as jnp


def test_pfm_roundtrip(tmp_path, rng):
    img = rng.random((24, 32)).astype(np.float32)
    p = str(tmp_path / "disp.pfm")
    pfm.write_pfm(p, img)
    back = pfm.read_pfm(p)
    np.testing.assert_allclose(back, img, rtol=1e-6)
    # 3-channel
    img3 = rng.random((10, 12, 3)).astype(np.float32)
    p3 = str(tmp_path / "c.pfm")
    pfm.write_pfm(p3, img3)
    np.testing.assert_allclose(pfm.read_pfm(p3), img3, rtol=1e-6)


def _make_kitti_dataset(root, n=3, w=64, h=48):
    import cv2

    cfg = datasets.kitti_odometry_config()
    for sub in [cfg.left_gray_folder, cfg.right_gray_folder, cfg.depth_folder]:
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    rng = np.random.default_rng(0)
    fx, baseline = 80.0, 0.5
    for i in range(n):
        img = rng.integers(0, 255, (h, w), np.uint8)
        cv2.imwrite(os.path.join(root, cfg.left_gray_folder, f"{i:06d}.png"), img)
        cv2.imwrite(os.path.join(root, cfg.right_gray_folder, f"{i:06d}.png"), img)
        # disparity PFM for a constant 4m depth
        disp = np.full((h, w), fx * baseline / 4.0, np.float32)
        pfm.write_pfm(os.path.join(root, cfg.depth_folder, f"{i:06d}.pfm"), disp)
    with open(os.path.join(root, "calib.txt"), "w") as f:
        p0 = f"P0: {fx} 0 {w/2} 0  0 {fx} {h/2} 0  0 0 1 0\n"
        p1 = f"P1: {fx} 0 {w/2} {-fx*baseline}  0 {fx} {h/2} 0  0 0 1 0\n"
        f.write(p0 + p1)
    return cfg


def test_kitti_input(tmp_path):
    root = str(tmp_path)
    cfg = _make_kitti_dataset(root)
    inp = datasets.Input(root, cfg)
    assert inp.rig.intr.fx == 80.0
    assert abs(inp.rig.baseline_m - 0.5) < 1e-6
    assert inp.rig.intr.width == 64 and inp.rig.intr.height == 48
    frames = list(inp)
    assert len(frames) == 3
    f0 = frames[0]
    assert f0["left"].shape == (48, 64)
    assert f0["right"].shape == (48, 64)
    # disparity converted to 4m depth
    np.testing.assert_allclose(f0["depth"], 4.0, atol=1e-3)


def test_kitti_frame_offset_and_limit(tmp_path):
    root = str(tmp_path)
    cfg = _make_kitti_dataset(root, n=5)
    inp = datasets.Input(root, cfg, frame_offset=1, frame_limit=2)
    frames = list(inp)
    assert len(frames) == 2


def test_tum_input_with_association(tmp_path):
    import cv2

    root = str(tmp_path / "rgbd_dataset_freiburg1_xyz")
    cfg = datasets.tum_config()
    os.makedirs(os.path.join(root, "rgb"))
    os.makedirs(os.path.join(root, "depth"))
    rng = np.random.default_rng(0)
    for i in range(4):
        t_rgb = 100.0 + i * 0.1
        t_d = t_rgb + 0.005  # slightly offset depth timestamps
        img = rng.integers(0, 255, (48, 64, 3), np.uint8)
        cv2.imwrite(os.path.join(root, "rgb", f"{t_rgb:.6f}.png"), img)
        d16 = np.full((48, 64), 5000 * 2, np.uint16)  # 2m
        cv2.imwrite(os.path.join(root, "depth", f"{t_d:.6f}.png"), d16)
    from denseslam_tpu.utils.camera import Intrinsics, StereoRig
    rig = StereoRig(Intrinsics(60, 60, 32, 24, 64, 48), 0.1)
    inp = datasets.Input(root, cfg, rig=rig)
    frames = list(inp)
    assert len(frames) == 4
    np.testing.assert_allclose(frames[0]["depth"], 2.0, atol=1e-3)
    assert frames[0]["right"] is None
    assert abs(frames[1]["timestamp"] - 100.1) < 1e-6


def test_trajectory_tum_roundtrip(rng):
    entries = []
    for i in range(5):
        xi = jnp.asarray(rng.standard_normal(6).astype(np.float32) * 0.3)
        entries.append((float(i), np.asarray(lie.se3_exp(xi))))
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "traj.txt")
        trajectory.save_tum(p, entries)
        back = trajectory.load_tum(p)
    assert len(back) == 5
    for (t0, T0), (t1, T1) in zip(entries, back):
        assert abs(t0 - t1) < 1e-6
        np.testing.assert_allclose(T1, T0, atol=1e-5)


def test_trajectory_kitti_roundtrip(tmp_path, rng):
    poses = []
    for i in range(4):
        xi = jnp.asarray(rng.standard_normal(6).astype(np.float32) * 0.3)
        poses.append(np.asarray(lie.se3_exp(xi)))
    p = str(tmp_path / "kitti.txt")
    trajectory.save_kitti(p, poses)
    back = trajectory.load_kitti(p)
    for T0, T1 in zip(poses, back):
        np.testing.assert_allclose(T1, T0, atol=1e-6)


def test_depth_metrics_perfect():
    gt = np.random.default_rng(0).uniform(1, 20, (50, 60)).astype(np.float32)
    m = dm.depth_metrics(gt, gt)
    assert m["mae"] == 0 and m["rmse"] == 0
    assert m["d1_25"] == 1.0 and m["d1_01"] == 1.0


def test_depth_metrics_biased():
    gt = np.full((50, 60), 10.0, np.float32)
    pred = gt * 1.1
    m = dm.depth_metrics(pred, gt)
    assert abs(m["mae"] - 1.0) < 1e-5
    assert abs(m["absrel"] - 0.1) < 1e-5
    assert m["d1_25"] == 1.0
    assert m["d1_01"] == 0.0


def test_depth_metrics_crop():
    img = np.ones((370, 1226), np.float32)
    c = dm.kitti_crop(img)
    assert c.shape == (228, 912)


def test_ate_alignment_invariance(rng):
    gt = [np.asarray(lie.se3_exp(jnp.asarray(
        np.array([0.1 * i, 0, 0.2 * i, 0, 0.01 * i, 0], np.float32))))
        for i in range(10)]
    offset = np.asarray(lie.se3_exp(jnp.asarray(
        np.array([1.0, 2.0, 3.0, 0.2, 0.3, 0.1], np.float32))))
    est = [offset @ T for T in gt]
    # rigidly transformed trajectory has ~0 ATE after alignment
    assert tm.ate_rmse(est, gt) < 1e-5
    # unaligned differs
    assert tm.ate_rmse(est, gt, align=False) > 1.0


def test_rpe_and_kitti_errors(rng):
    gt = [np.asarray(lie.se3_exp(jnp.asarray(
        np.array([0, 0, 1.0 * i, 0, 0, 0], np.float32)))) for i in range(120)]
    # estimate with per-frame translation drift
    est = []
    for i, T in enumerate(gt):
        D = np.eye(4, dtype=np.float32)
        D[0, 3] = 0.01 * i
        est.append(T @ D)
    r = tm.rpe(est, gt)
    assert 0.005 < r["rpe_trans_rmse"] < 0.05
    k = tm.kitti_sequence_errors(est, gt, lengths=(50, 100), step=5)
    assert k["kitti_t_err_pct"] > 0
