"""Inter-submap alignment (MiniSlamGraphLib role) + cross-spawn correction
history (VERDICT r1 items 3/6): optimised global poses must visibly realign
the composite render, and the fusion DB must survive submap spawns."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from denseslam_tpu.config import OnlineCorrectionParams, tiny_test_config
from denseslam_tpu.io import synthetic
from denseslam_tpu.models.dense_slam import DenseSLAM
from denseslam_tpu.utils import lie


@pytest.fixture(scope="module")
def cfg():
    c = tiny_test_config()
    return dataclasses.replace(
        c,
        correction=OnlineCorrectionParams(
            enabled=True, correction_num=3, start_correction_num=1,
            min_error=0.005),
        pipeline=dataclasses.replace(c.pipeline, fusion_db_capacity=8),
    )


def _err_matrix():
    # a visible rigid drift: vertical lift + pitch — moves the ground
    # plane and sphere surfaces in DEPTH (translations parallel to a
    # surface are depth-invariant and wouldn't show in the metric)
    xi = np.array([0.05, 0.18, 0.0, 0.03, 0.0, 0.0], np.float32)
    return np.asarray(lie.se3_exp_np(xi))


def _composite_err(slam, T_eval, gt_depth, sel):
    rc = slam.raycast_composite(jnp.asarray(T_eval))
    d = np.asarray(rc.depth)
    g = np.asarray(gt_depth)
    both = (d > 0) & sel
    assert both.sum() > 300, both.sum()
    return float(np.median(np.abs(d[both] - g[both])))


def test_alignment_realigns_composite(cfg):
    scene = synthetic.street_scene(length_m=40.0)
    slam = DenseSLAM(cfg)
    gt = synthetic.make_trajectory(6, step_m=2.0, yaw_rate=0.0)
    D_err = _err_matrix()

    # submap 0: frames 0-2 fused at TRUE poses
    for i in range(3):
        _, depth = synthetic.render_view(jnp.asarray(gt[i]), cfg.rig.intr,
                                         scene)
        slam.process_frame(jnp.zeros_like(depth), depth=depth,
                           pose_override=jnp.asarray(gt[i]))
    # submap 1: spawned at a DRIFTED pose, frames 3-5 fused drifted —
    # further down the corridor, so it holds content submap 0 never saw
    drift3 = (D_err @ gt[3]).astype(np.float32)
    slam.submaps.create_new(drift3, anchor_frame_id=3)
    for i in range(3, 6):
        _, depth = synthetic.render_view(jnp.asarray(gt[i]), cfg.rig.intr,
                                         scene)
        T_dr = jnp.asarray((D_err @ gt[i]).astype(np.float32))
        slam.process_frame(jnp.zeros_like(depth), depth=depth,
                           pose_override=T_dr)
    assert slam.submaps.num_local_maps == 2

    # evaluate ONLY where submap 1 is the sole source (beyond submap 0's
    # coverage) — shared pixels are dominated by submap 0's true content
    T_eval = jnp.asarray(gt[5])
    _, gt_depth = synthetic.render_view(T_eval, cfg.rig.intr, scene)
    rc0 = slam._raycast(slam.submaps.maps[0], T_eval)
    g = np.asarray(gt_depth)
    sel = (~np.asarray(rc0.mask)) & (g > 0) & (g < cfg.tsdf.max_depth_m)
    err_before = _composite_err(slam, T_eval, gt_depth, sel)

    # the backend optimises the anchor keyframes back to truth
    slam.apply_pose_updates(np.array([0, 3]), np.stack([gt[0], gt[3]]))

    # submap 1's global pose moved toward the true anchor pose
    d1 = slam.submaps.delta(1)
    d_target = np.asarray(lie.inv_T(jnp.asarray(D_err)))
    assert np.linalg.norm(d1 - d_target) < 0.05, (d1, d_target)

    err_after = _composite_err(slam, T_eval, gt_depth, sel)
    assert err_after < err_before * 0.5, (err_before, err_after)


def test_correction_history_survives_spawn(cfg):
    """Pose updates for frames fused into an OLD submap must still replay
    (round-1 reset the fusion DB on spawn, killing the history)."""
    rng = np.random.default_rng(5)
    slam = DenseSLAM(cfg)
    gt = synthetic.make_trajectory(5, step_m=0.06, yaw_rate=0.0)
    drift = [np.asarray(gt[0])]
    for i in range(1, 5):
        xi = np.concatenate([rng.normal(0, 0.04, 3),
                             rng.normal(0, 0.01, 3)]).astype(np.float32)
        drift.append(np.asarray(jnp.asarray(gt[i]) @ lie.se3_exp(jnp.asarray(xi))))
    # frames 0-2 fused (drifted) into submap 0
    for i in range(3):
        _, depth = synthetic.render_view(jnp.asarray(gt[i]), cfg.rig.intr)
        slam.process_frame(jnp.zeros_like(depth), depth=depth,
                           pose_override=jnp.asarray(drift[i]))
    # spawn; frames 3-4 into submap 1
    slam.submaps.create_new(np.asarray(drift[3]), anchor_frame_id=3)
    for i in range(3, 5):
        _, depth = synthetic.render_view(jnp.asarray(gt[i]), cfg.rig.intr)
        slam.process_frame(jnp.zeros_like(depth), depth=depth,
                           pose_override=jnp.asarray(drift[i]))

    # old submap's DB still holds its frames
    assert int(np.asarray(slam.submaps.dbs[0].valid).sum()) == 3
    T0_before = np.asarray(slam.submaps.dbs[0].T_fused).copy()

    # optimise ALL frames back to truth: the ACTIVE submap re-fuses
    # immediately; the inactive one's corrections are DEFERRED (round-4
    # policy: inactive pools replay lazily at next use — correcting them
    # live cost 1-3 s of device replay per tick) and stashed as pending
    num = slam.apply_pose_updates(
        np.arange(5), np.stack([np.asarray(g) for g in gt]))
    assert num > 0
    assert len(slam.submaps.pending_corrections[0]) > 0
    np.testing.assert_allclose(T0_before,
                               np.asarray(slam.submaps.dbs[0].T_fused))
    # replay on use: the next composite (or explicit swap-in) applies it
    slam.restore_submap(0)
    T0_after = np.asarray(slam.submaps.dbs[0].T_fused)
    assert not np.allclose(T0_before, T0_after), (
        "old submap's correction history was not replayed on use")


def test_memory_budget_spills_and_restores(cfg):
    """Swapping engine (ITMSwappingEngine::SaveToGlobalMemory, reference
    DenseSlam.h:248-251) wired to a memory-budget policy: spawning past the
    budget spills the inactive submap to host; composite rendering and
    online correction restore it on demand and spill it back."""
    one = DenseSLAM(cfg).submaps.submap_device_bytes(0)
    budget_mb = 1.5 * one / 1e6          # two submaps don't fit
    cfg2 = dataclasses.replace(
        cfg, pipeline=dataclasses.replace(
            cfg.pipeline, map_memory_budget_mb=budget_mb))

    rng = np.random.default_rng(5)
    slam = DenseSLAM(cfg2)
    gt = synthetic.make_trajectory(5, step_m=0.06, yaw_rate=0.0)
    drift = [np.asarray(gt[0])]
    for i in range(1, 5):
        xi = np.concatenate([rng.normal(0, 0.04, 3),
                             rng.normal(0, 0.01, 3)]).astype(np.float32)
        drift.append(np.asarray(
            jnp.asarray(gt[i]) @ lie.se3_exp(jnp.asarray(xi))))
    for i in range(3):
        _, depth = synthetic.render_view(jnp.asarray(gt[i]), cfg.rig.intr)
        slam.process_frame(jnp.zeros_like(depth), depth=depth,
                           pose_override=jnp.asarray(drift[i]))
    blocks0 = slam.submaps.local_map_size(0)
    assert blocks0 > 0

    # spawn -> over budget -> submap 0 spills
    slam.submaps.create_new(np.asarray(drift[3]), anchor_frame_id=3)
    assert slam.submaps.is_on_host(0)
    assert slam.submaps.num_evictions == 1
    assert slam.submaps.device_memory_bytes() <= budget_mb * 1e6
    assert slam.submaps.num_active_local_maps == 1
    # host-side accounting still works without touching the device
    assert slam.submaps.local_map_size(0) == blocks0

    for i in range(3, 5):
        _, depth = synthetic.render_view(jnp.asarray(gt[i]), cfg.rig.intr)
        slam.process_frame(jnp.zeros_like(depth), depth=depth,
                           pose_override=jnp.asarray(drift[i]))

    # composite render restores the spilled submap, uses it, spills back
    rc = slam.raycast_composite(jnp.asarray(gt[0]))
    assert slam.submaps.is_on_host(0)
    assert int(np.asarray(rc.mask).sum()) > 100   # submap-0 content shows
    assert slam.submaps.num_restores >= 1

    # correction touching the spilled submap's frames is DEFERRED (no
    # device round-trip per tick — measured 0.4 fps when every tick
    # restored+corrected+re-evicted the pool over the host boundary);
    # the pending poses replay when the submap is next restored
    T0_before = np.asarray(slam.submaps.dbs[0].T_fused).copy()
    restores_before = slam.submaps.num_restores
    num = slam.apply_pose_updates(
        np.arange(5), np.stack([np.asarray(g) for g in gt]))
    assert num > 0
    assert slam.submaps.is_on_host(0)             # never left host
    assert slam.submaps.num_restores == restores_before
    # frames 1-2 stash; frame 0's drift is identically zero and the
    # round-4 magnitude gate rightly skips it
    assert len(slam.submaps.pending_corrections[0]) == 2
    np.testing.assert_allclose(T0_before,
                               np.asarray(slam.submaps.dbs[0].T_fused))

    # restore replays the deferred corrections: the DB's fused poses move
    slam.restore_submap(0)
    assert not slam.submaps.pending_corrections[0]
    T0_after = np.asarray(slam.submaps.dbs[0].T_fused)
    assert not np.allclose(T0_before, T0_after), (
        "deferred corrections were not replayed on restore")
    slam.submaps.evict_to_host(0)

    # correction that does NOT touch the spilled submap stashes nothing
    slam.apply_pose_updates(np.array([4]), gt[4][None])
    assert not slam.submaps.pending_corrections[0]
    assert slam.submaps.num_restores == restores_before + 1


def test_compact_spill_roundtrip_bit_exact(cfg):
    """Valid-block compaction (gather_block_rows / rebuild_from_rows —
    the block-granular ITMSwappingEngine transfer, reference
    DenseSlam.h:248-251): evict -> restore -> evict must reproduce the
    map bit-exactly, and the tunnel-crossing form must be ~occupancy-
    sized, not pool-sized."""
    import jax

    slam = DenseSLAM(cfg)
    gt = synthetic.make_trajectory(3, step_m=0.06, yaw_rate=0.01)
    for i in range(3):
        _, depth = synthetic.render_view(jnp.asarray(gt[i]), cfg.rig.intr)
        slam.process_frame(jnp.zeros_like(depth), depth=depth,
                           pose_override=jnp.asarray(gt[i]))
    sm = slam.submaps
    before = jax.tree.map(np.asarray, sm.maps[0])

    sm.evict_to_host(0)
    host0 = sm.maps[0]
    for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(host0)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    sm.restore_to_device(0)
    assert not sm.is_on_host(0)
    after = jax.tree.map(np.asarray, sm.maps[0])
    for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # clean (unmutated) restore evicts for FREE via the spill cache:
    # the host copy object is reused, no fetch program runs
    assert sm._spill_cache[0] is not None and not sm.dirty[0]
    sm.evict_to_host(0)
    assert sm.maps[0] is host0

    # dirty restore re-fetches: mutate on device, evict, verify content
    sm.restore_to_device(0)
    sm.maps[0] = sm.maps[0]._replace(tsdf=sm.maps[0].tsdf * 0.5)
    sm.mark_dirty(0)
    sm.evict_to_host(0)
    np.testing.assert_allclose(
        np.asarray(sm.maps[0].tsdf).astype(np.float32),
        np.asarray(before.tsdf).astype(np.float32) * 0.5, rtol=2e-2)


def test_subtrigger_corrections_replay_at_flush(cfg):
    """Drift in (min_error, inactive_min_error] on an INACTIVE submap is
    stashed (never silently discarded), does NOT trigger a replay on a
    transient restore (eval renders stay cheap), and IS re-fused by the
    sequence-end flush_deferred_corrections() pass — the finished map
    carries the full correction history."""
    rng = np.random.default_rng(7)
    slam = DenseSLAM(cfg)
    gt = synthetic.make_trajectory(5, step_m=0.06, yaw_rate=0.0)
    # sub-trigger drift: ~2 cm, above min_error 0.005, below the 0.05
    # inactive replay trigger
    drift = []
    for i in range(5):
        xi = np.concatenate([rng.normal(0, 0.012, 3),
                             np.zeros(3)]).astype(np.float32)
        drift.append(np.asarray(
            jnp.asarray(gt[i]) @ lie.se3_exp(jnp.asarray(xi))))
    for i in range(3):
        _, depth = synthetic.render_view(jnp.asarray(gt[i]), cfg.rig.intr)
        slam.process_frame(jnp.zeros_like(depth), depth=depth,
                           pose_override=jnp.asarray(drift[i]))
    slam.submaps.create_new(np.asarray(drift[3]), anchor_frame_id=3)
    for i in range(3, 5):
        _, depth = synthetic.render_view(jnp.asarray(gt[i]), cfg.rig.intr)
        slam.process_frame(jnp.zeros_like(depth), depth=depth,
                           pose_override=jnp.asarray(drift[i]))

    T0_before = np.asarray(slam.submaps.dbs[0].T_fused).copy()
    slam.apply_pose_updates(
        np.arange(5), np.stack([np.asarray(g) for g in gt]))
    pend = slam.submaps.pending_corrections[0]
    assert pend, "sub-trigger drift must be stashed, not dropped"
    assert all(e <= cfg.correction.inactive_min_error
               for _, e in pend.values())

    # transient restore: below the trigger -> no replay, stash intact
    slam.restore_submap(0)
    assert slam.submaps.pending_corrections[0]
    np.testing.assert_allclose(
        T0_before, np.asarray(slam.submaps.dbs[0].T_fused))
    slam.submaps.evict_to_host(0)

    # sequence-end flush re-fuses the stash
    n = slam.flush_deferred_corrections()
    assert n == 1
    assert not slam.submaps.pending_corrections[0]
    assert not np.allclose(
        T0_before, np.asarray(slam.submaps.dbs[0].T_fused))


def test_budget_caps_clean_cache_footprint(cfg):
    """map_memory_budget_mb bounds TRUE HBM footprint, not just committed
    (dirty) bytes: after an eval burst leaves clean render-cache
    residents, enforce_memory_budget drops them (a free evict) until the
    device fits the budget again."""
    import dataclasses as dc
    one = DenseSLAM(cfg).submaps.submap_device_bytes(0)
    cfg2 = dc.replace(cfg, pipeline=dc.replace(
        cfg.pipeline, map_memory_budget_mb=1.5 * one / 1e6))
    slam = DenseSLAM(cfg2)
    gt = synthetic.make_trajectory(4, step_m=0.06, yaw_rate=0.0)
    for i in range(3):
        _, depth = synthetic.render_view(jnp.asarray(gt[i]), cfg.rig.intr)
        slam.process_frame(jnp.zeros_like(depth), depth=depth,
                           pose_override=jnp.asarray(gt[i]))
    slam.submaps.create_new(np.asarray(gt[3]), anchor_frame_id=3)
    assert slam.submaps.is_on_host(0)          # spilled on spawn
    # eval-style restore: submap 0 comes back as a CLEAN cache resident
    slam.submaps.restore_to_device(0)
    assert slam.submaps.device_memory_bytes() > 1.5 * one
    evicted = slam.submaps.enforce_memory_budget()
    assert 0 in evicted
    assert slam.submaps.is_on_host(0)
    assert slam.submaps.device_memory_bytes() <= 1.5 * one


def test_ghost_render_matches_full_restore(cfg):
    """Composite eval of a spilled submap via the render-only ghost path
    (in-view rows, f16 tsdf + u8 weight, no restore) must reproduce the
    full restore-render-respill composite's depth, leave the submap on
    host, and count no restore."""
    slam = DenseSLAM(cfg)
    gt = synthetic.make_trajectory(5, step_m=0.06, yaw_rate=0.0)
    for i in range(3):
        _, depth = synthetic.render_view(jnp.asarray(gt[i]), cfg.rig.intr)
        slam.process_frame(jnp.zeros_like(depth), depth=depth,
                           pose_override=jnp.asarray(gt[i]))
    slam.submaps.create_new(np.asarray(gt[3]), anchor_frame_id=3)
    slam.submaps.evict_to_host(0)
    for i in range(3, 5):
        _, depth = synthetic.render_view(jnp.asarray(gt[i]), cfg.rig.intr)
        slam.process_frame(jnp.zeros_like(depth), depth=depth,
                           pose_override=jnp.asarray(gt[i]))

    T_eval = jnp.asarray(gt[0])
    d_full = np.asarray(slam.raycast_composite(T_eval).depth)
    assert slam.submaps.is_on_host(0)
    restores_before = slam.submaps.num_restores
    d_ghost = np.asarray(slam.raycast_composite(T_eval, ghost=True).depth)
    assert slam.submaps.is_on_host(0)
    assert slam.submaps.num_restores == restores_before
    assert slam.submaps.num_ghost_renders >= 1

    both = (d_full > 0) & (d_ghost > 0)
    assert both.sum() > 500
    # f16 tsdf quantisation moves the splat surface estimate by well
    # under a voxel
    assert np.median(np.abs(d_full[both] - d_ghost[both])) < 0.02
    # coverage parity: the in-view row filter must not drop contributing
    # blocks
    assert (d_ghost > 0).sum() > 0.95 * (d_full > 0).sum()


def test_delta_respill_bit_exact(cfg):
    """After a deferred-correction replay on a restored submap, the evict
    takes the delta path (only changed rows re-cross the host boundary)
    and the merged host copy must be BIT-IDENTICAL to a full fetch of the
    post-replay device state."""
    import jax

    rng = np.random.default_rng(3)
    slam = DenseSLAM(cfg)
    gt = synthetic.make_trajectory(5, step_m=0.06, yaw_rate=0.0)
    drift = []
    for i in range(5):
        xi = np.concatenate([rng.normal(0, 0.04, 3),
                             rng.normal(0, 0.01, 3)]).astype(np.float32)
        drift.append(np.asarray(
            jnp.asarray(gt[i]) @ lie.se3_exp(jnp.asarray(xi))))
    for i in range(3):
        _, depth = synthetic.render_view(jnp.asarray(gt[i]), cfg.rig.intr)
        slam.process_frame(jnp.zeros_like(depth), depth=depth,
                           pose_override=jnp.asarray(drift[i]))
    slam.submaps.create_new(np.asarray(drift[3]), anchor_frame_id=3)
    slam.submaps.evict_to_host(0)
    for i in range(3, 5):
        _, depth = synthetic.render_view(jnp.asarray(gt[i]), cfg.rig.intr)
        slam.process_frame(jnp.zeros_like(depth), depth=depth,
                           pose_override=jnp.asarray(drift[i]))
    slam.apply_pose_updates(
        np.arange(5), np.stack([np.asarray(g) for g in gt]))
    assert slam.submaps.pending_corrections[0]

    slam.restore_submap(0)          # replay -> dirty with delta rows
    assert slam.submaps.dirty[0]
    assert slam.submaps._delta_rows[0] is not None
    assert slam.submaps._delta_rows[0].size > 0
    full_ref = jax.tree.map(np.asarray, slam.submaps.maps[0])
    db_ref = jax.tree.map(np.asarray, slam.submaps.dbs[0])

    slam.submaps.evict_to_host(0)
    assert slam.submaps.num_delta_spills == 1
    assert slam.submaps.is_on_host(0)
    got = slam.submaps.maps[0]
    for a, b in zip(jax.tree.leaves(full_ref), jax.tree.leaves(got)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(db_ref),
                    jax.tree.leaves(slam.submaps.dbs[0])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_async_spill_matches_sync(cfg):
    """evict_to_host_async must produce the same host copy as the sync
    compacted spill — the transfer just completes on a worker thread
    (the swapping engine's async stream)."""
    import jax

    slam = DenseSLAM(cfg)
    gt = synthetic.make_trajectory(3, step_m=0.06, yaw_rate=0.0)
    for i in range(3):
        _, depth = synthetic.render_view(jnp.asarray(gt[i]), cfg.rig.intr)
        slam.process_frame(jnp.zeros_like(depth), depth=depth,
                           pose_override=jnp.asarray(gt[i]))
    slam.submaps.create_new(np.asarray(gt[2]), anchor_frame_id=2)
    # the tiny test pool (4096 slots) fits one row bucket, which the
    # async path declines as not-compacted; shrink the bucket so the
    # compacted transfer actually runs
    slam.submaps._SPILL_GRAN = 256
    ref = jax.tree.map(np.asarray, slam.submaps.maps[0])
    db_ref = jax.tree.map(np.asarray, slam.submaps.dbs[0])
    started = slam.submaps.evict_to_host_async(0)
    assert started
    assert slam.submaps.num_async_spills == 1
    slam.submaps.finalize_spills()
    assert slam.submaps.is_on_host(0)
    for a, b in zip(jax.tree.leaves(ref),
                    jax.tree.leaves(slam.submaps.maps[0])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(db_ref),
                    jax.tree.leaves(slam.submaps.dbs[0])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # a second restore after an async spill round-trips fine
    slam.submaps.restore_to_device(0)
    assert not slam.submaps.is_on_host(0)


def test_ghost_defers_to_restore_on_armed_corrections(cfg):
    """A spilled submap with a SUPER-trigger deferred correction must not
    ghost-render stale content: the composite forces the full
    restore+replay so every super-trigger correction is visible."""
    rng = np.random.default_rng(11)
    slam = DenseSLAM(cfg)
    gt = synthetic.make_trajectory(5, step_m=0.06, yaw_rate=0.0)
    drift = []
    for i in range(5):
        xi = np.concatenate([rng.normal(0, 0.04, 3),
                             rng.normal(0, 0.01, 3)]).astype(np.float32)
        drift.append(np.asarray(
            jnp.asarray(gt[i]) @ lie.se3_exp(jnp.asarray(xi))))
    for i in range(3):
        _, depth = synthetic.render_view(jnp.asarray(gt[i]), cfg.rig.intr)
        slam.process_frame(jnp.zeros_like(depth), depth=depth,
                           pose_override=jnp.asarray(drift[i]))
    slam.submaps.create_new(np.asarray(drift[3]), anchor_frame_id=3)
    slam.submaps.evict_to_host(0)
    for i in range(3, 5):
        _, depth = synthetic.render_view(jnp.asarray(gt[i]), cfg.rig.intr)
        slam.process_frame(jnp.zeros_like(depth), depth=depth,
                           pose_override=jnp.asarray(drift[i]))
    slam.apply_pose_updates(
        np.arange(5), np.stack([np.asarray(g) for g in gt]))
    pend = slam.submaps.pending_corrections[0]
    assert any(e > cfg.correction.inactive_min_error
               for _, e in pend.values()), "setup needs a super-trigger"

    ghosts_before = slam.submaps.num_ghost_renders
    restores_before = slam.submaps.num_restores
    slam.raycast_composite(jnp.asarray(gt[0]), ghost=True)
    # the armed correction forced the restore path, not a ghost
    assert slam.submaps.num_restores == restores_before + 1
    assert slam.submaps.num_ghost_renders == ghosts_before
    assert not slam.submaps.pending_corrections[0]   # replayed
