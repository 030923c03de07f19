import jax.numpy as jnp
import numpy as np

from denseslam_tpu.config import tiny_test_config
from denseslam_tpu.ops import reconstruction as rec
from denseslam_tpu.utils import lie


def make_tracks(rng, n_pts=64, n_frames=5, noise_px=0.0):
    cfg = tiny_test_config(width=320, height=240)
    intr = cfg.rig.intr
    pts = rng.uniform([-2, -1.5, 3.0], [2, 1.5, 9.0], (n_pts, 3)).astype(np.float32)
    poses = []
    T = np.eye(4, dtype=np.float32)
    for k in range(n_frames):
        poses.append(T.copy())
        xi = np.array([0.15, 0.02, 0.1, 0.0, 0.01, 0.0], np.float32)
        T = T @ np.asarray(lie.se3_exp(jnp.asarray(xi)))
    poses = np.stack(poses)
    uv = np.zeros((n_pts, n_frames, 2), np.float32)
    mask = np.zeros((n_pts, n_frames), bool)
    for k in range(n_frames):
        Ti = np.asarray(lie.inv_T(jnp.asarray(poses[k])))
        pc = pts @ Ti[:3, :3].T + Ti[:3, 3]
        u = pc[:, 0] / pc[:, 2] * intr.fx + intr.cx
        v = pc[:, 1] / pc[:, 2] * intr.fy + intr.cy
        ok = (pc[:, 2] > 0.5) & (u > 0) & (u < intr.width) & (v > 0) & (v < intr.height)
        uv[:, k, 0] = u + rng.normal(0, noise_px, n_pts)
        uv[:, k, 1] = v + rng.normal(0, noise_px, n_pts)
        mask[:, k] = ok
    tracks = rec.Tracks(uv=jnp.asarray(uv), obs_mask=jnp.asarray(mask),
                        T_wc=jnp.asarray(poses))
    return cfg, tracks, pts


def test_triangulation_exact(rng):
    cfg, tracks, pts_gt = make_tracks(rng)
    out = rec.triangulate_tracks(tracks, cfg.rig.intr)
    v = np.asarray(out.valid)
    assert v.sum() > 50
    err = np.linalg.norm(np.asarray(out.points_w)[v] - pts_gt[v], axis=-1)
    assert np.median(err) < 0.01, np.median(err)


def test_triangulation_noisy(rng):
    cfg, tracks, pts_gt = make_tracks(rng, noise_px=0.5)
    out = rec.triangulate_tracks(tracks, cfg.rig.intr)
    v = np.asarray(out.valid)
    assert v.sum() > 40
    err = np.linalg.norm(np.asarray(out.points_w)[v] - pts_gt[v], axis=-1)
    assert np.median(err) < 0.15, np.median(err)
    assert float(np.asarray(out.reproj_rmse)[v].mean()) < 1.5


def test_triangulation_rejects_short_tracks(rng):
    cfg, tracks, _ = make_tracks(rng)
    # single-observation tracks are invalid
    mask = np.asarray(tracks.obs_mask).copy()
    mask[:10, 1:] = False
    tracks = tracks._replace(obs_mask=jnp.asarray(mask))
    out = rec.triangulate_tracks(tracks, cfg.rig.intr)
    assert not np.asarray(out.valid)[:10].any()
