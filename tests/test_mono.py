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
