import jax
import jax.numpy as jnp
import numpy as np
import pytest

from denseslam_tpu.config import tiny_test_config
from denseslam_tpu.io import synthetic
from denseslam_tpu.ops import tsdf as tsdf_ops


@pytest.fixture(scope="module")
def frame():
    cfg = tiny_test_config()
    T = jnp.eye(4, dtype=jnp.float32)
    gray, depth = synthetic.render_view(T, cfg.rig.intr)
    color = tsdf_ops.pack_gray(gray)
    return cfg, T, depth, color


def fuse_one(cfg, m, depth, color, T):
    m, slots, mask = tsdf_ops.allocate_for_frame(m, depth, T, cfg.rig.intr, cfg.tsdf)
    m = tsdf_ops.integrate(m, slots, mask, depth, color, T, cfg.rig.intr, cfg.tsdf)
    return m, slots, mask


def test_allocate_and_integrate(frame):
    cfg, T, depth, color = frame
    m = tsdf_ops.make_map(cfg.tsdf)
    m, slots, mask = fuse_one(cfg, m, depth, color, T)
    nblocks = int(tsdf_ops.num_allocated_blocks(m))
    assert nblocks > 20
    assert int(m.overflow) == 0
    # some voxels got weight
    assert float(m.weight.max()) > 0
    # memory accounting is proportional to block count
    assert int(tsdf_ops.used_memory_bytes(m, 16)) == nblocks * 16 * 512


def test_tsdf_zero_crossing_near_surface(frame):
    """Fused TSDF must change sign across the known surface depth."""
    cfg, T, depth, color = frame
    m = tsdf_ops.make_map(cfg.tsdf)
    m, _, _ = fuse_one(cfg, m, depth, color, T)
    h, w = depth.shape
    d = float(depth[h // 2, w // 2])
    intr = cfg.rig.intr
    # point slightly in front of / behind the surface along the central ray
    mu = cfg.tsdf.trunc_dist_m
    for offset, sign in [(-0.5 * mu, +1), (0.5 * mu, -1)]:
        z = d + offset
        pt = jnp.array(
            [[(w // 2 - intr.cx) / intr.fx * z, (h // 2 - intr.cy) / intr.fy * z, z]],
            dtype=jnp.float32,
        )
        sdf, wgt = tsdf_ops.sample_tsdf_nearest(m, pt, cfg.tsdf)
        assert float(wgt[0]) > 0
        assert np.sign(float(sdf[0])) == sign, (offset, float(sdf[0]))


def test_integrate_deintegrate_identity(frame):
    """De-fusing the same view restores the prior map (OnlineCorrection's
    core invariant)."""
    cfg, T, depth, color = frame
    m0 = tsdf_ops.make_map(cfg.tsdf)
    m0, slots0, mask0 = fuse_one(cfg, m0, depth, color, T)
    w_before = m0.weight
    t_before = m0.tsdf

    # fuse a second (different) view, then de-fuse it
    T1 = jnp.eye(4, dtype=jnp.float32).at[0, 3].set(0.08)
    _, depth1 = synthetic.render_view(T1, cfg.rig.intr)
    color1 = tsdf_ops.pack_gray(depth1 * 20)
    m1, slots1, mask1 = tsdf_ops.allocate_for_frame(m0, depth1, T1, cfg.rig.intr, cfg.tsdf)
    m1 = tsdf_ops.integrate(m1, slots1, mask1, depth1, color1, T1, cfg.rig.intr, cfg.tsdf)
    assert float(jnp.abs(m1.weight - w_before).max()) > 0  # actually changed

    m2 = tsdf_ops.deintegrate(m1, slots1, mask1, depth1, color1, T1, cfg.rig.intr, cfg.tsdf)
    np.testing.assert_allclose(np.asarray(m2.weight), np.asarray(w_before), atol=1e-4)
    # where weight remains, tsdf is restored
    live = np.asarray(w_before) > 0
    np.testing.assert_allclose(
        np.asarray(m2.tsdf)[live], np.asarray(t_before)[live], atol=1e-3
    )


def test_decay_reclaims_low_weight_blocks(frame):
    cfg, T, depth, color = frame
    m = tsdf_ops.make_map(cfg.tsdf)
    m, _, _ = fuse_one(cfg, m, depth, color, T)
    n0 = int(tsdf_ops.num_allocated_blocks(m))
    # age the map: advance frames beyond min_decay_age
    for _ in range(3):
        m = tsdf_ops.advance_frame(m)
    # all voxels have weight <= 1 (single fusion) -> decay with threshold 1
    m = tsdf_ops.decay(m, max_decay_weight=1.0, min_decay_age=2)
    n1 = int(tsdf_ops.num_allocated_blocks(m))
    assert n1 == 0
    assert int(m.decayed_blocks) == n0
    # weights cleared
    assert float(m.weight.max()) == 0.0


def test_decay_age_gate(frame):
    cfg, T, depth, color = frame
    m = tsdf_ops.make_map(cfg.tsdf)
    m, _, _ = fuse_one(cfg, m, depth, color, T)
    n0 = int(tsdf_ops.num_allocated_blocks(m))
    # not old enough: nothing decays
    m2 = tsdf_ops.decay(m, max_decay_weight=1.0, min_decay_age=5)
    assert int(tsdf_ops.num_allocated_blocks(m2)) == n0
    # force_all ignores age (DecayCatchup)
    m3 = tsdf_ops.decay_catchup(m, max_decay_weight=1.0)
    assert int(tsdf_ops.num_allocated_blocks(m3)) == 0


def test_decay_keeps_heavy_voxels(frame):
    cfg, T, depth, color = frame
    m = tsdf_ops.make_map(cfg.tsdf)
    # fuse the same frame 4x -> weights ~4
    for _ in range(4):
        m, _, _ = fuse_one(cfg, m, depth, color, T)
    for _ in range(3):
        m = tsdf_ops.advance_frame(m)
    n0 = int(tsdf_ops.num_allocated_blocks(m))
    m = tsdf_ops.decay(m, max_decay_weight=2.0, min_decay_age=1)
    # heavy blocks survive
    assert int(tsdf_ops.num_allocated_blocks(m)) > n0 // 2


def test_slide_window_evicts_old_blocks(frame):
    cfg, T, depth, color = frame
    m = tsdf_ops.make_map(cfg.tsdf)
    m, _, _ = fuse_one(cfg, m, depth, color, T)
    n0 = int(tsdf_ops.num_allocated_blocks(m))
    for _ in range(4):
        m = tsdf_ops.advance_frame(m)
    # allocate a fresh far-away frame
    T2 = jnp.eye(4, dtype=jnp.float32).at[2, 3].set(-3.0)
    _, depth2 = synthetic.render_view(T2, cfg.rig.intr)
    m, s2, k2 = tsdf_ops.allocate_for_frame(m, depth2, T2, cfg.rig.intr, cfg.tsdf)
    m = tsdf_ops.integrate(m, s2, k2, depth2, None, T2, cfg.rig.intr, cfg.tsdf)
    m = tsdf_ops.slide_window(m, max_age=3)
    # frame-0 blocks evicted; frame-4 blocks survive
    alloc_frames = np.asarray(m.alloc_frame)[np.asarray(m.table.valid)]
    assert (alloc_frames >= 4).all()
    assert int(tsdf_ops.num_allocated_blocks(m)) > 0


def test_fusion_jit_stable(frame):
    cfg, T, depth, color = frame

    @jax.jit
    def step(m, depth, color, T):
        m, slots, mask = tsdf_ops.allocate_for_frame(m, depth, T, cfg.rig.intr, cfg.tsdf)
        m = tsdf_ops.integrate(m, slots, mask, depth, color, T, cfg.rig.intr, cfg.tsdf)
        return tsdf_ops.advance_frame(m)

    m = tsdf_ops.make_map(cfg.tsdf)
    m = step(m, depth, color, T)
    m = step(m, depth, color, T)
    assert int(m.frame) == 2
    assert int(tsdf_ops.num_allocated_blocks(m)) > 0


def test_alloc_subsample_equivalent():
    """Stride-2 allocation finds the same touched blocks (blocks project
    far wider than 2 px at test scale)."""
    import dataclasses
    import numpy as np
    from denseslam_tpu.config import tiny_test_config
    from denseslam_tpu.io import synthetic
    from denseslam_tpu.ops import tsdf as tsdf_ops

    cfg = tiny_test_config(width=160, height=120)
    _, depth = synthetic.render_view(jnp.eye(4), cfg.rig.intr)
    T = jnp.eye(4)
    keysets = []
    for s in (1, 2):
        tc = dataclasses.replace(cfg.tsdf, alloc_subsample=s,
                                 table_slots=1 << 14,
                                 max_visible_blocks=8192,
                                 max_alloc_per_frame=8192)
        m = tsdf_ops.make_map(tc)
        m, slots, mask = tsdf_ops.allocate_for_frame(m, depth, T,
                                                     cfg.rig.intr, tc)
        keys = np.asarray(m.table.keys)[np.asarray(m.table.valid)]
        keysets.append(set(keys.tolist()))
    s1, s2 = keysets
    assert s2 <= s1
    # stride 2 may miss silhouette-edge sliver blocks (touched by a single
    # pixel's truncation band); those carry ~zero weight and are allocated
    # by subsequent frames. Bound the miss rate.
    assert len(s1 - s2) <= 0.08 * len(s1), (len(s1), len(s2))


def test_bf16_storage_matches_f32_within_quantisation(frame):
    """storage_dtype=bfloat16 halves pool traffic; fused TSDF must agree
    with f32 within bf16 quantisation (~1/256 relative)."""
    import dataclasses
    cfg, T, depth, color = frame
    m32 = tsdf_ops.make_map(cfg.tsdf)
    m32, slots, mask = tsdf_ops.allocate_for_frame(m32, depth, T, cfg.rig.intr, cfg.tsdf)
    m32 = tsdf_ops.integrate(m32, slots, mask, depth, color, T, cfg.rig.intr, cfg.tsdf)

    t16 = dataclasses.replace(cfg.tsdf, storage_dtype="bfloat16")
    m16 = tsdf_ops.make_map(t16)
    m16, slots, mask = tsdf_ops.allocate_for_frame(m16, depth, T, cfg.rig.intr, t16)
    m16 = tsdf_ops.integrate(m16, slots, mask, depth, color, T, cfg.rig.intr, t16)
    assert m16.tsdf.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(m16.tsdf, np.float32), np.asarray(m32.tsdf), atol=1/128)
    np.testing.assert_allclose(
        np.asarray(m16.weight, np.float32), np.asarray(m32.weight), atol=1e-6)
    # decay + slide-window preserve the dtype
    m16 = tsdf_ops.decay(m16, 2.0, 0, force_all=True)
    m16 = tsdf_ops.slide_window(m16, 1)
    assert m16.tsdf.dtype == jnp.bfloat16
    assert m16.weight.dtype == jnp.bfloat16


def test_bf16_pipeline_and_checkpoint(tmp_path):
    """End-to-end frames + checkpoint round-trip with bf16 map storage."""
    import dataclasses
    from denseslam_tpu.config import tiny_test_config
    from denseslam_tpu.io.checkpoint import (load_slam_checkpoint,
                                             save_slam_checkpoint)
    from denseslam_tpu.models.dense_slam import DenseSLAM

    cfg = tiny_test_config(width=160, height=120, baseline_m=0.3)
    cfg = dataclasses.replace(
        cfg, tsdf=dataclasses.replace(cfg.tsdf, storage_dtype="bfloat16"))
    slam = DenseSLAM(cfg)
    poses = synthetic.make_trajectory(4, step_m=0.06, yaw_rate=0.004)
    for i in range(4):
        l, r, d = synthetic.render_stereo(jnp.asarray(poses[i]), cfg.rig)
        out = slam.process_frame(l, r, depth=d)
    assert out["tracking_ok"] and out["num_blocks"] > 20
    p = str(tmp_path / "ck.npz")
    save_slam_checkpoint(p, slam)
    slam2 = DenseSLAM(cfg)
    load_slam_checkpoint(p, slam2)
    assert slam2.submaps.active.tsdf.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(slam2.submaps.active.tsdf, np.float32),
        np.asarray(slam.submaps.active.tsdf, np.float32))


def test_checkpoint_cross_dtype_load(tmp_path):
    """A bf16-saved checkpoint loads into a float32-configured map as
    VALUES (not raw bits) — regression for the uint16 bit-view leak."""
    import dataclasses
    from denseslam_tpu.config import tiny_test_config
    from denseslam_tpu.io.checkpoint import (load_slam_checkpoint,
                                             save_slam_checkpoint)
    from denseslam_tpu.models.dense_slam import DenseSLAM

    cfg16 = tiny_test_config(width=160, height=120, baseline_m=0.3)
    cfg16 = dataclasses.replace(
        cfg16, tsdf=dataclasses.replace(cfg16.tsdf, storage_dtype="bfloat16"))
    slam = DenseSLAM(cfg16)
    poses = synthetic.make_trajectory(3, step_m=0.06, yaw_rate=0.0)
    for i in range(3):
        l, r, d = synthetic.render_stereo(jnp.asarray(poses[i]), cfg16.rig)
        slam.process_frame(l, r, depth=d)
    p = str(tmp_path / "ck16.npz")
    save_slam_checkpoint(p, slam)

    cfg32 = tiny_test_config(width=160, height=120, baseline_m=0.3)
    slam32 = DenseSLAM(cfg32)
    load_slam_checkpoint(p, slam32)
    t = slam32.submaps.active.tsdf
    assert t.dtype == jnp.float32
    tv = np.asarray(t)
    assert np.abs(tv).max() <= 1.0 + 1e-3          # values, not bf16 bit patterns
    np.testing.assert_allclose(
        tv, np.asarray(slam.submaps.active.tsdf, np.float32), atol=1e-6)


def test_defusion_part_gc(frame):
    """DecayDefusionPart reclaims blocks emptied by de-integration while
    SlideWindowDefusionPart leaves freshly re-fused content alone."""
    cfg, T, depth, color = frame
    m = tsdf_ops.make_map(cfg.tsdf)
    m, slots, mask = fuse_one(cfg, m, depth, color, T)
    n0 = int(tsdf_ops.num_allocated_blocks(m))
    # de-integrate the same frame: every block's weight returns to 0
    m = tsdf_ops.deintegrate(m, slots, mask, depth, color, T, cfg.rig.intr,
                             cfg.tsdf)
    assert int(tsdf_ops.num_allocated_blocks(m)) == n0  # not yet reclaimed
    m2 = tsdf_ops.decay_defusion_part(m)
    assert int(tsdf_ops.num_allocated_blocks(m2)) < n0 // 4
    assert int(m2.decayed_blocks) > 0

    # re-fuse: defusion-part slide must NOT evict the fresh content even
    # when its alloc age exceeds max_age
    m3, slots, mask = fuse_one(cfg, m2, depth, color, T)
    m3 = m3._replace(frame=m3.frame + 100)      # age everything
    m3 = m3._replace(last_seen=jnp.where(m3.table.valid, m3.frame,
                                         m3.last_seen))
    n3 = int(tsdf_ops.num_allocated_blocks(m3))
    m4 = tsdf_ops.slide_window_defusion_part(m3, max_age=10)
    # fused blocks carry weight >= floor in their occupied voxels; most
    # survive (only sparse low-occupancy boundary blocks may go)
    assert int(tsdf_ops.num_allocated_blocks(m4)) > 0.5 * n3


def test_decay_and_slide_matches_sequential(frame):
    """The fused regularisation pass (one pool read+write) must produce the
    same map as slide_window() followed by decay() (the fuse_keyframe
    order), including the decayed-block count."""
    cfg, T, depth, color = frame
    m = tsdf_ops.make_map(cfg.tsdf)
    m, _, _ = fuse_one(cfg, m, depth, color, T)
    # second, offset frame so some blocks are light and some heavy
    T2 = jnp.eye(4, dtype=jnp.float32).at[2, 3].set(-0.4)
    gray2, depth2 = synthetic.render_view(T2, cfg.rig.intr)
    m, s2, k2 = tsdf_ops.allocate_for_frame(m, depth2, T2, cfg.rig.intr,
                                            cfg.tsdf)
    m = tsdf_ops.integrate(m, s2, k2, depth2, None, T2, cfg.rig.intr,
                           cfg.tsdf)
    for _ in range(5):
        m = tsdf_ops.advance_frame(m)

    seq = tsdf_ops.decay(
        tsdf_ops.slide_window(m, max_age=4),
        max_decay_weight=1.0, min_decay_age=2)
    fused = tsdf_ops.decay_and_slide(
        m, max_decay_weight=1.0, min_decay_age=2, max_age=4)

    np.testing.assert_array_equal(np.asarray(seq.table.valid),
                                  np.asarray(fused.table.valid))
    np.testing.assert_array_equal(np.asarray(seq.tsdf), np.asarray(fused.tsdf))
    np.testing.assert_array_equal(np.asarray(seq.weight),
                                  np.asarray(fused.weight))
    np.testing.assert_array_equal(np.asarray(seq.color), np.asarray(fused.color))
    assert int(seq.decayed_blocks) == int(fused.decayed_blocks)


def test_checkpoint_preserves_pending_corrections(tmp_path):
    """Corrections deferred while a submap is spilled must survive a
    checkpoint/resume cycle (they replay on the next restore)."""
    from denseslam_tpu.config import tiny_test_config
    from denseslam_tpu.io.checkpoint import (load_slam_checkpoint,
                                             save_slam_checkpoint)
    from denseslam_tpu.models.dense_slam import DenseSLAM

    import dataclasses

    from denseslam_tpu.config import OnlineCorrectionParams

    cfg = tiny_test_config(width=160, height=120, baseline_m=0.3)
    cfg = dataclasses.replace(
        cfg, correction=OnlineCorrectionParams(
            enabled=True, correction_num=3, start_correction_num=1,
            min_error=0.005))
    slam = DenseSLAM(cfg)
    poses = synthetic.make_trajectory(3, step_m=0.06, yaw_rate=0.0)
    for i in range(3):
        l, r, d = synthetic.render_stereo(jnp.asarray(poses[i]), cfg.rig)
        slam.process_frame(l, r, depth=d)
    slam.submaps.create_new(np.asarray(poses[2]), anchor_frame_id=2)
    slam.submaps.evict_to_host(0)
    T = np.eye(4, dtype=np.float32)
    T[0, 3] = 0.25
    slam.apply_pose_updates(np.array([1]), T[None])
    assert slam.submaps.pending_corrections[0], "correction not deferred"

    p = str(tmp_path / "ck_pend.npz")
    save_slam_checkpoint(p, slam)
    slam2 = DenseSLAM(cfg)
    load_slam_checkpoint(p, slam2)
    pend = slam2.submaps.pending_corrections[0]
    assert 1 in pend
    np.testing.assert_allclose(pend[1][0], T)
    # the stash error magnitude survives too (the replay trigger reads it)
    assert pend[1][1] > cfg.correction.inactive_min_error
    # and the restore replays it
    slam2.restore_submap(0)
    assert not slam2.submaps.pending_corrections[0]
