import jax
import jax.numpy as jnp
import numpy as np

from denseslam_tpu.utils import lie


def random_xi(rng, scale=1.0, n=None):
    shape = (6,) if n is None else (n, 6)
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * scale)


def test_so3_exp_log_roundtrip(rng):
    w = random_xi(rng, 0.8, n=32)[:, 3:]
    R = lie.so3_exp(w)
    w2 = lie.so3_log(R)
    np.testing.assert_allclose(np.asarray(w2), np.asarray(w), atol=1e-4)


def test_so3_exp_is_rotation(rng):
    w = random_xi(rng, 2.0, n=16)[:, 3:]
    R = lie.so3_exp(w)
    eye = np.eye(3, dtype=np.float32)
    for i in range(R.shape[0]):
        np.testing.assert_allclose(np.asarray(R[i] @ R[i].T), eye, atol=1e-5)
        assert abs(float(jnp.linalg.det(R[i])) - 1.0) < 1e-4


def test_so3_small_angle(rng):
    w = jnp.array([[1e-9, 0, 0], [0, 0, 0]], dtype=jnp.float32)
    R = lie.so3_exp(w)
    np.testing.assert_allclose(np.asarray(R[1]), np.eye(3), atol=1e-6)
    assert np.all(np.isfinite(np.asarray(lie.so3_log(R))))


def test_se3_exp_log_roundtrip(rng):
    xi = random_xi(rng, 0.6, n=32)
    T = lie.se3_exp(xi)
    xi2 = lie.se3_log(T)
    np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=1e-4)


def test_se3_inverse(rng):
    xi = random_xi(rng, 0.5, n=8)
    T = lie.se3_exp(xi)
    TI = lie.inv_T(T)
    prod = np.asarray(T @ TI)
    for i in range(prod.shape[0]):
        np.testing.assert_allclose(prod[i], np.eye(4), atol=1e-5)


def test_transform_points(rng):
    xi = random_xi(rng, 0.5)
    T = lie.se3_exp(xi)
    pts = jnp.asarray(rng.standard_normal((10, 3)).astype(np.float32))
    out = lie.transform_points(T, pts)
    expected = (np.asarray(T[:3, :3]) @ np.asarray(pts).T).T + np.asarray(T[:3, 3])
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)


def test_pose_error_weighted_zero(rng):
    xi = random_xi(rng, 0.4)
    T = lie.se3_exp(xi)
    err = lie.pose_error_weighted(T, T)
    assert float(err) < 1e-5


def test_pose_error_weighted_translation():
    T0 = jnp.eye(4)
    T1 = T0.at[0, 3].set(0.3)
    err = float(lie.pose_error_weighted(T0, T1))
    assert abs(err - 0.3) < 1e-5


def test_jit_compatible(rng):
    xi = random_xi(rng, 0.5, n=4)
    f = jax.jit(lambda x: lie.se3_log(lie.se3_exp(x)))
    np.testing.assert_allclose(np.asarray(f(xi)), np.asarray(xi), atol=1e-4)
