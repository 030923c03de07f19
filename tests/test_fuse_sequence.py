"""fuse_sequence (batched throughput path) must match per-frame fusion."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from denseslam_tpu.config import tiny_test_config
from denseslam_tpu.io import synthetic
from denseslam_tpu.models.dense_slam import (
    fuse_keyframe,
    fuse_sequence,
    make_fusion_db,
)
from denseslam_tpu.ops import raycast as rc_ops
from denseslam_tpu.ops import tsdf as tsdf_ops


def test_fuse_sequence_matches_per_frame():
    cfg = tiny_test_config()
    n = 4
    poses = synthetic.make_trajectory(n, step_m=0.06, yaw_rate=0.0)
    depths, grays = [], []
    for i in range(n):
        g, d = synthetic.render_view(jnp.asarray(poses[i]), cfg.rig.intr)
        grays.append(g)
        depths.append(d)
    depths_s = jnp.stack(depths)
    grays_s = jnp.stack(grays)
    T_s = jnp.asarray(poses)
    fids = jnp.arange(n, dtype=jnp.int32)

    # batched
    m_b = tsdf_ops.make_map(cfg.tsdf)
    db_b = make_fusion_db(cfg)
    m_b, db_b = jax.jit(
        lambda m, db: fuse_sequence(m, db, depths_s, grays_s, T_s, fids, cfg)
    )(m_b, db_b)

    # per-frame
    m_p = tsdf_ops.make_map(cfg.tsdf)
    db_p = make_fusion_db(cfg)
    step = jax.jit(lambda m, db, d, g, T, f: fuse_keyframe(m, db, d, g, T, f, cfg))
    for i in range(n):
        m_p, db_p = step(m_p, db_p, depths_s[i], grays_s[i], T_s[i],
                         jnp.int32(i))

    assert int(tsdf_ops.num_allocated_blocks(m_b)) == int(
        tsdf_ops.num_allocated_blocks(m_p))
    # raycast depth from both maps must agree (same math; batched path uses
    # nearest sampling identical to per-frame default)
    T = jnp.asarray(poses[2])
    rc_b = rc_ops.raycast(m_b, T, cfg.rig.intr, cfg.tsdf)
    rc_p = rc_ops.raycast(m_p, T, cfg.rig.intr, cfg.tsdf)
    d_b = np.asarray(rc_b.depth)
    d_p = np.asarray(rc_p.depth)
    both = (d_b > 0) & (d_p > 0)
    assert both.mean() > 0.5
    assert np.median(np.abs(d_b[both] - d_p[both])) < 1e-4
    # DB contents identical
    np.testing.assert_allclose(np.asarray(db_b.depth), np.asarray(db_p.depth))
    np.testing.assert_array_equal(np.asarray(db_b.frame_id),
                                  np.asarray(db_p.frame_id))


def test_fuse_sequence_with_regularisers():
    cfg = tiny_test_config()
    # NOTE: in the batched path ages are chunk-granular (phase 1 advances the
    # frame counter for the whole chunk before phase 3 regularises), so
    # windows must exceed the chunk length to behave like the per-frame path.
    cfg = dataclasses.replace(
        cfg,
        decay=dataclasses.replace(cfg.decay, enabled=True, min_decay_age=4,
                                  max_decay_weight=0.5),
        slide_window=dataclasses.replace(cfg.slide_window, enabled=True,
                                         max_age=4),
    )
    n = 6
    poses = synthetic.make_trajectory(n, step_m=0.3, yaw_rate=0.0)
    depths, grays = [], []
    for i in range(n):
        g, d = synthetic.render_view(jnp.asarray(poses[i]), cfg.rig.intr)
        grays.append(g)
        depths.append(d)
    m = tsdf_ops.make_map(cfg.tsdf)
    db = make_fusion_db(cfg)
    m, db = jax.jit(
        lambda m, db: fuse_sequence(
            m, db, jnp.stack(depths), jnp.stack(grays), jnp.asarray(poses),
            jnp.arange(n, dtype=jnp.int32), cfg)
    )(m, db)
    # map bounded by the regularisers but non-empty
    nb = int(tsdf_ops.num_allocated_blocks(m))
    assert 0 < nb
    # Freed slots may hold stale data (cleared lazily on reallocation by
    # allocate_for_frame's fresh-slot clear). The real invariant: re-fusing
    # a frame reallocates cleanly — fresh blocks start from weight <= 1.
    g, d = synthetic.render_view(jnp.asarray(poses[0]), cfg.rig.intr)
    m2, slots, mask = tsdf_ops.allocate_for_frame(
        m, d, jnp.asarray(poses[0]), cfg.rig.intr, cfg.tsdf)
    m2 = tsdf_ops.integrate(m2, slots, mask, d, None, jnp.asarray(poses[0]),
                            cfg.rig.intr, cfg.tsdf)
    was_free = ~np.asarray(m.table.valid)
    now_valid = np.asarray(m2.table.valid)
    reclaimed = was_free & now_valid
    assert reclaimed.any()
    # one integrate on a clean block adds at most weight 1 per voxel
    w_reclaimed = np.asarray(m2.weight)[reclaimed]
    assert w_reclaimed.max() <= 1.0 + 1e-5, w_reclaimed.max()


def test_process_sequence_full_pipeline():
    """The batched VO+stereo+fusion scan tracks and fuses like the host
    loop."""
    import dataclasses
    import numpy as np
    from denseslam_tpu.config import tiny_test_config
    from denseslam_tpu.io import synthetic
    from denseslam_tpu.models import frontend as fe
    from denseslam_tpu.models.dense_slam import (
        make_fusion_db, process_sequence)
    from denseslam_tpu.ops import tsdf as tsdf_ops

    cfg = tiny_test_config(width=320, height=240, baseline_m=0.25)
    cfg = dataclasses.replace(
        cfg, pipeline=dataclasses.replace(cfg.pipeline, fusion_db_capacity=8))
    n = 5
    poses = synthetic.make_trajectory(n, step_m=0.15, yaw_rate=0.0)
    lefts, rights, _ = synthetic.render_stereo_trajectory(poses, cfg.rig)

    st = fe.init_frontend(cfg, seed=0)
    m = tsdf_ops.make_map(cfg.tsdf)
    db = make_fusion_db(cfg)
    fids = jnp.arange(n, dtype=jnp.int32)
    f = jax.jit(lambda st, m, db, l, r, fi: process_sequence(
        st, m, db, l, r, fi, cfg))
    st, m, db, stats = f(st, m, db, lefts, rights, fids)

    ok = np.asarray(stats["tracking_ok"])
    assert ok[1:].all(), ok          # frame 0 initialises
    assert np.asarray(stats["fused"]).sum() >= n - 1
    assert int(tsdf_ops.num_allocated_blocks(m)) > 0
    # forward motion recovered within 25%
    T_last = np.asarray(stats["T_wc"][-1])
    gt = np.linalg.norm(poses[-1][:3, 3])
    est = np.linalg.norm(T_last[:3, 3])
    assert abs(est - gt) / gt < 0.25, (est, gt)
    # the fusion DB recorded the fused frames
    assert int(np.asarray(db.valid).sum()) == int(np.asarray(stats["fused"]).sum())
