import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from denseslam_tpu.config import tiny_test_config
from denseslam_tpu.io import synthetic
from denseslam_tpu.ops import raycast as rc_ops
from denseslam_tpu.ops import splat as splat_ops
from denseslam_tpu.ops import tsdf as tsdf_ops


def _fused_map(cfg, n=3):
    poses = synthetic.make_trajectory(n, step_m=0.1, yaw_rate=0.0)
    grays, depths = synthetic.render_trajectory(poses, cfg.rig.intr)
    m = tsdf_ops.make_map(cfg.tsdf)
    for i in range(n):
        T = jnp.asarray(poses[i])
        color = tsdf_ops.pack_gray(grays[i])
        m, slots, mask = tsdf_ops.allocate_for_frame(
            m, depths[i], T, cfg.rig.intr, cfg.tsdf)
        m = tsdf_ops.integrate(m, slots, mask, depths[i], color, T,
                               cfg.rig.intr, cfg.tsdf)
        m = tsdf_ops.advance_frame(m)
    return m, jnp.asarray(poses[0]), depths[0]


def test_splat_matches_raycast():
    cfg = tiny_test_config(width=160, height=120)
    m, T, depth_gt = _fused_map(cfg)
    sc = splat_ops.SplatConfig(max_blocks=1024, max_voxels=1 << 16)
    rc = jax.jit(lambda m, T: splat_ops.splat_render(
        m, T, cfg.rig.intr, cfg.tsdf, sc))(m, T)
    ray = rc_ops.raycast(m, T, cfg.rig.intr, cfg.tsdf)

    d_s = np.asarray(rc.depth)
    d_r = np.asarray(ray.depth)
    both = (d_s > 0) & (d_r > 0)
    # coverage: splat sees most of what the marcher sees
    assert both.sum() > 0.85 * (d_r > 0).sum()
    # agreement on mutual hits within ~2 voxels
    err = np.abs(d_s[both] - d_r[both])
    assert np.median(err) < 2 * cfg.tsdf.voxel_size_m, np.median(err)
    # and against the rendered GT depth
    errg = np.abs(d_s[both] - np.asarray(depth_gt)[both])
    assert np.median(errg) < 2 * cfg.tsdf.voxel_size_m, np.median(errg)


def test_splat_color_and_normals():
    cfg = tiny_test_config(width=160, height=120)
    m, T, _ = _fused_map(cfg)
    rc = splat_ops.splat_render(m, T, cfg.rig.intr, cfg.tsdf,
                                splat_ops.SplatConfig(max_blocks=1024,
                                                      max_voxels=1 << 16))
    mask = np.asarray(rc.mask)
    assert mask.any()
    color = np.asarray(rc.color)
    assert color[mask].max() > 0           # fused gray made it through
    n = np.asarray(rc.normals)
    nn = np.linalg.norm(n[mask], axis=-1)
    # most hit pixels have unit-ish normals (interior of surfaces)
    assert (np.abs(nn - 1.0) < 1e-3).mean() > 0.5


def test_splat_empty_map():
    cfg = tiny_test_config(width=80, height=60)
    m = tsdf_ops.make_map(cfg.tsdf)
    rc = splat_ops.splat_render(m, jnp.eye(4), cfg.rig.intr, cfg.tsdf,
                                splat_ops.SplatConfig(max_blocks=256,
                                                      max_voxels=1 << 14))
    assert not bool(np.asarray(rc.mask).any())


def test_splat_respects_pose():
    """Moving the camera back shifts splat depths accordingly."""
    cfg = tiny_test_config(width=160, height=120)
    m, T, _ = _fused_map(cfg)
    sc = splat_ops.SplatConfig(max_blocks=1024, max_voxels=1 << 16)
    rc0 = splat_ops.splat_render(m, T, cfg.rig.intr, cfg.tsdf, sc)
    T_back = np.asarray(T).copy()
    T_back[2, 3] -= 0.5  # move back 0.5 m
    rc1 = splat_ops.splat_render(m, jnp.asarray(T_back), cfg.rig.intr,
                                 cfg.tsdf, sc)
    d0 = np.asarray(rc0.depth)
    d1 = np.asarray(rc1.depth)
    both = (d0 > 0) & (d1 > 0)
    # central region: depth increases by ~0.5
    hh, ww = d0.shape
    c = both[hh // 3: 2 * hh // 3, ww // 3: 2 * ww // 3]
    dd = (d1 - d0)[hh // 3: 2 * hh // 3, ww // 3: 2 * ww // 3][c]
    assert abs(np.median(dd) - 0.5) < 0.1, np.median(dd)


def test_splat_refine_improves_depth():
    """refine_depth sphere-tracing steps shrink median error vs GT depth."""
    cfg = tiny_test_config(width=160, height=120)
    m, T, depth_gt = _fused_map(cfg)
    sc = splat_ops.SplatConfig(max_blocks=1024, max_voxels=1 << 16)
    rc = jax.jit(lambda m, T: splat_ops.splat_render(
        m, T, cfg.rig.intr, cfg.tsdf, sc))(m, T)
    d_ref = jax.jit(lambda m, d, k, T: splat_ops.refine_depth(
        m, d, k, T, cfg.rig.intr, cfg.tsdf, steps=2))(
        m, rc.depth, rc.mask, T)
    gt = np.asarray(depth_gt)
    d0 = np.asarray(rc.depth)
    d1 = np.asarray(d_ref)
    both = (d0 > 0) & (gt > 0) & (d1 > 0)
    e0 = np.median(np.abs(d0[both] - gt[both]))
    e1 = np.median(np.abs(d1[both] - gt[both]))
    assert e1 < e0 * 0.8, (e0, e1)
    assert e1 < 0.5 * cfg.tsdf.voxel_size_m, e1


def test_pipeline_splat_refine_flag():
    """PipelineConfig.splat_refine wires refinement into raycast_view."""
    from denseslam_tpu.models.dense_slam import DenseSLAM
    cfg = tiny_test_config(width=160, height=120)
    cfg_r = dataclasses.replace(
        cfg, pipeline=dataclasses.replace(cfg.pipeline, splat_refine=2))
    poses = synthetic.make_trajectory(3, step_m=0.05, yaw_rate=0.0)
    outs = {}
    for key, c in (("raw", cfg), ("refined", cfg_r)):
        slam = DenseSLAM(c)
        for i in range(3):
            l, r, d = synthetic.render_stereo(jnp.asarray(poses[i]), c.rig)
            slam.process_frame(l, r, depth=d)
        rc = slam.raycast_view()
        _, _, d_gt = synthetic.render_stereo(
            jnp.asarray(slam.pose_history[-1][1]), c.rig)
        gt = np.asarray(d_gt)
        dd = np.asarray(rc.depth)
        both = (dd > 0) & (gt > 0)
        outs[key] = np.median(np.abs(dd[both] - gt[both]))
    assert outs["refined"] <= outs["raw"] + 1e-6, outs


def test_fill_holes_bleed_override():
    """Occlusion-aware fill: hits far BEHIND the min-pooled neighbourhood
    are background bleed-through (rays slipping between a near surface's
    point splats) and get overridden with the foreground estimate;
    plain fill (rel=abs=0) must leave them untouched."""
    d = np.full((16, 16), 10.0, np.float32)   # background won the z-buffer
    d[::2, ::2] = 2.0                          # sparse foreground splats
    filled = np.asarray(splat_ops._fill_holes(
        jnp.asarray(d), 3, bleed_rel=0.15, bleed_abs=0.5))
    assert filled[1, 1] < 3.0, filled[1, 1]    # overridden to foreground
    raw = np.asarray(splat_ops._fill_holes(jnp.asarray(d), 3))
    assert raw[1, 1] == 10.0                   # plain fill keeps real hits
    # a CONSISTENT surface (no discontinuity) is untouched by suppression
    smooth = np.full((16, 16), 5.0, np.float32)
    out = np.asarray(splat_ops._fill_holes(
        jnp.asarray(smooth), 3, bleed_rel=0.15, bleed_abs=0.5))
    np.testing.assert_array_equal(out, smooth)
