import jax
import jax.numpy as jnp
import numpy as np
import pytest

from denseslam_tpu.config import tiny_test_config
from denseslam_tpu.io import synthetic
from denseslam_tpu.ops import raycast as rc_ops
from denseslam_tpu.ops import tsdf as tsdf_ops


@pytest.fixture(scope="module")
def fused_map():
    cfg = tiny_test_config()
    m = tsdf_ops.make_map(cfg.tsdf)
    poses = synthetic.make_trajectory(5, step_m=0.06, yaw_rate=0.0)

    @jax.jit
    def fuse(m, depth, T):
        m, slots, mask = tsdf_ops.allocate_for_frame(m, depth, T, cfg.rig.intr, cfg.tsdf)
        m = tsdf_ops.integrate(m, slots, mask, depth, None, T, cfg.rig.intr, cfg.tsdf)
        return tsdf_ops.advance_frame(m)

    for i in range(5):
        T = jnp.asarray(poses[i])
        _, depth = synthetic.render_view(T, cfg.rig.intr)
        m = fuse(m, depth, T)
    return cfg, m, poses


def test_raycast_depth_matches_gt(fused_map):
    cfg, m, poses = fused_map
    T = jnp.asarray(poses[2])
    _, gt_depth = synthetic.render_view(T, cfg.rig.intr)
    rc = rc_ops.raycast(m, T, cfg.rig.intr, cfg.tsdf)
    d = np.asarray(rc.depth)
    gt = np.asarray(gt_depth)
    eligible = (gt > 0) & (gt < 7.0)
    both = (d > 0) & eligible
    assert both.sum() / eligible.sum() > 0.9, "hit coverage too low"
    err = np.abs(d[both] - gt[both])
    # voxel size is 5 cm; median error should be within ~1 voxel
    assert np.median(err) < 0.06, np.median(err)
    # away from depth discontinuities the raycast must be tight everywhere
    gy, gx = np.gradient(gt)
    smooth = (np.abs(gx) + np.abs(gy)) < 0.1
    err_s = np.abs(d[both & smooth] - gt[both & smooth])
    assert np.quantile(err_s, 0.95) < 0.1, np.quantile(err_s, 0.95)


def test_raycast_from_novel_view(fused_map):
    """Raycast from a pose never fused — map must still render coherently."""
    cfg, m, poses = fused_map
    from denseslam_tpu.utils import lie
    offset = lie.se3_exp(jnp.array([0.05, -0.03, 0.1, 0.01, 0.02, 0.0], jnp.float32))
    T = jnp.asarray(poses[2]) @ offset
    _, gt_depth = synthetic.render_view(T, cfg.rig.intr)
    rc = rc_ops.raycast(m, T, cfg.rig.intr, cfg.tsdf)
    d = np.asarray(rc.depth)
    gt = np.asarray(gt_depth)
    eligible = (gt > 0) & (gt < 7.0)
    both = (d > 0) & eligible
    assert both.sum() / eligible.sum() > 0.85
    err = np.abs(d[both] - gt[both])
    assert np.median(err) < 0.08, np.median(err)


def test_raycast_normals_sane(fused_map):
    cfg, m, poses = fused_map
    T = jnp.asarray(poses[2])
    rc = rc_ops.raycast(m, T, cfg.rig.intr, cfg.tsdf)
    n = np.asarray(rc.normals)
    mask = np.linalg.norm(n, axis=-1) > 0.5
    assert mask.mean() > 0.5
    # unit length where defined
    np.testing.assert_allclose(np.linalg.norm(n[mask], axis=-1), 1.0, atol=1e-3)
    # ground-plane pixels (bottom rows) should have normals close to -y (up)
    bottom = n[-8:, :, :][mask[-8:, :]]
    if bottom.size:
        assert np.abs(bottom[:, 1]).mean() > 0.7


def test_empty_map_raycast_misses():
    cfg = tiny_test_config()
    m = tsdf_ops.make_map(cfg.tsdf)
    rc = rc_ops.raycast(m, jnp.eye(4, dtype=jnp.float32), cfg.rig.intr, cfg.tsdf)
    assert float(rc.depth.max()) == 0.0
    assert not bool(rc.mask.any())


def test_png16_roundtrip():
    d = jnp.array([[0.0, 1.5, 49.9]], dtype=jnp.float32)
    png = rc_ops.depth_to_png16(d)
    back = rc_ops.png16_to_depth(png)
    np.testing.assert_allclose(np.asarray(back), np.asarray(d), atol=1 / 256.0)


def test_preview_render(fused_map):
    cfg, m, poses = fused_map
    rc = rc_ops.raycast(m, jnp.asarray(poses[2]), cfg.rig.intr, cfg.tsdf)
    for kind in ["depth", "gray", "normal", "raycast_depth"]:
        img = rc_ops.render_preview(rc, kind)
        assert img.shape[:2] == (cfg.rig.intr.height, cfg.rig.intr.width)
