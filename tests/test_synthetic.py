import jax.numpy as jnp
import numpy as np

from denseslam_tpu.config import tiny_test_config
from denseslam_tpu.io import synthetic
from denseslam_tpu.utils import lie
from denseslam_tpu.utils.camera import backproject


def test_render_depth_consistency():
    """Rendered depth must agree with analytic geometry: backprojected points
    must lie on a scene surface (sphere / plane / wall)."""
    cfg = tiny_test_config()
    scene = synthetic.default_scene()
    T = jnp.eye(4, dtype=jnp.float32)
    gray, depth = synthetic.render_view(T, cfg.rig.intr, scene)
    d = np.asarray(depth)
    assert (d > 0).mean() > 0.9  # wall closes the scene: nearly all rays hit
    pts = np.asarray(backproject(depth, cfg.rig.intr))
    valid = d > 0
    # distance to nearest surface for each valid point
    centers = np.asarray(scene.sphere_centers)
    radii = np.asarray(scene.sphere_radii)
    p = pts[valid]
    dists = [np.abs(np.linalg.norm(p - c, axis=-1) - r) for c, r in zip(centers, radii)]
    dists.append(np.abs(p[:, 1] - scene.plane_y))
    dists.append(np.abs(p[:, 2] - scene.wall_z))
    min_dist = np.min(np.stack(dists), axis=0)
    assert np.quantile(min_dist, 0.99) < 0.02


def test_render_view_invariance():
    """Texture is world-anchored: the same 3D point must render to the same
    intensity from two different camera poses."""
    cfg = tiny_test_config()
    scene = synthetic.default_scene()
    T0 = jnp.eye(4, dtype=jnp.float32)
    xi = jnp.array([0.02, 0.0, 0.05, 0.0, 0.01, 0.0], dtype=jnp.float32)
    T1 = T0 @ lie.se3_exp(xi)
    g0, d0 = synthetic.render_view(T0, cfg.rig.intr, scene)
    g1, d1 = synthetic.render_view(T1, cfg.rig.intr, scene)
    # reproject frame-1 center pixel into frame 0
    h, w = cfg.rig.intr.height, cfg.rig.intr.width
    pt1 = np.asarray(backproject(d1, cfg.rig.intr))[h // 2, w // 2]
    pt_w = np.asarray(T1[:3, :3]) @ pt1 + np.asarray(T1[:3, 3])
    tex = float(synthetic._texture(jnp.asarray(pt_w)))
    assert abs(tex - float(g1[h // 2, w // 2])) < 1e-2


def test_stereo_disparity_geometry():
    """Left/right renders must satisfy d = f*B/z at corresponding pixels."""
    cfg = tiny_test_config()
    T = jnp.eye(4, dtype=jnp.float32)
    left, right, depth = synthetic.render_stereo(T, cfg.rig)
    h, w = cfg.rig.intr.height, cfg.rig.intr.width
    z = float(depth[h // 2, w // 2])
    assert z > 0
    disp = cfg.rig.intr.fx * cfg.rig.baseline_m / z
    # the right image shifted by disp should match the left at the center px
    u = w // 2 - disp
    u0 = int(np.floor(u))
    a = u - u0
    rv = (1 - a) * float(right[h // 2, u0]) + a * float(right[h // 2, u0 + 1])
    lv = float(left[h // 2, w // 2])
    assert abs(rv - lv) < 8.0  # texture is smooth; small interpolation error


def test_trajectory_shape():
    poses = synthetic.make_trajectory(10)
    assert poses.shape == (10, 4, 4)
    np.testing.assert_allclose(poses[0], np.eye(4), atol=1e-6)
    # moves forward in z
    assert poses[-1][2, 3] > 0.3
