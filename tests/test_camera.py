import jax.numpy as jnp
import numpy as np

from denseslam_tpu.config import tiny_test_config
from denseslam_tpu.utils import camera
from denseslam_tpu.utils.image import bilinear_sample, depth_bilinear_sample


def test_project_backproject_roundtrip():
    cfg = tiny_test_config()
    intr = cfg.rig.intr
    depth = jnp.full((intr.height, intr.width), 2.0, dtype=jnp.float32)
    pts = camera.backproject(depth, intr)
    uv, z = camera.project(pts, intr)
    v = jnp.arange(intr.height, dtype=jnp.float32)[:, None]
    u = jnp.arange(intr.width, dtype=jnp.float32)[None, :]
    np.testing.assert_allclose(np.asarray(uv[..., 0]), np.broadcast_to(u, uv.shape[:2]), atol=1e-3)
    np.testing.assert_allclose(np.asarray(uv[..., 1]), np.broadcast_to(v, uv.shape[:2]), atol=1e-3)
    np.testing.assert_allclose(np.asarray(z), 2.0, atol=1e-5)


def test_disparity_to_depth():
    cfg = tiny_test_config()
    disp = jnp.array([[6.0, 0.0, 0.001]], dtype=jnp.float32)
    d = camera.disparity_to_depth(disp, cfg.rig)
    expected = cfg.rig.intr.fx * cfg.rig.baseline_m / 6.0
    assert abs(float(d[0, 0]) - expected) < 1e-5
    assert float(d[0, 1]) == 0.0  # invalid
    assert float(d[0, 2]) == 0.0  # beyond max depth -> invalid


def test_depth_mm_roundtrip():
    d = jnp.array([0.0, 1.2345, 32.0], dtype=jnp.float32)
    mm = camera.depth_m_to_mm_i16(d)
    back = camera.depth_mm_i16_to_m(mm)
    np.testing.assert_allclose(np.asarray(back), np.asarray(d), atol=5e-4)


def test_bilinear_sample_interior_and_oob():
    img = jnp.arange(12, dtype=jnp.float32).reshape(3, 4)
    uv = jnp.array([[1.5, 1.0], [-3.0, 0.0], [0.0, 0.0]], dtype=jnp.float32)
    vals, mask = bilinear_sample(img, uv)
    assert abs(float(vals[0]) - 5.5) < 1e-5
    assert not bool(mask[1]) and float(vals[1]) == 0.0
    assert bool(mask[2]) and abs(float(vals[2]) - 0.0) < 1e-5


def test_depth_bilinear_edge_guard():
    depth = jnp.array(
        [[1.0, 1.0, 5.0], [1.0, 1.0, 5.0], [1.0, 1.0, 5.0]], dtype=jnp.float32
    )
    uv = jnp.array([[1.5, 1.0]], dtype=jnp.float32)  # between 1m and 5m columns
    val, valid = depth_bilinear_sample(depth, uv)
    # must NOT interpolate across the 4m jump; falls back to nearest (1m)
    assert bool(valid[0])
    assert abs(float(val[0]) - 1.0) < 1e-5
