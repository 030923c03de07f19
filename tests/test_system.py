"""Full-system tests: frontend + fusion + backend wired (SLAMSystem)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from denseslam_tpu.config import (
    OnlineCorrectionParams,
    StereoConfig,
    tiny_test_config,
)
from denseslam_tpu.io import synthetic
from denseslam_tpu.models.system import PDController, SLAMSystem
from denseslam_tpu.utils import lie


def make_cfg():
    cfg = tiny_test_config(width=320, height=240, baseline_m=0.25)
    return dataclasses.replace(
        cfg,
        stereo=StereoConfig(max_disparity=48),
        correction=OnlineCorrectionParams(
            enabled=True, correction_num=3, start_correction_num=2,
            min_error=0.005,
        ),
    )


def test_system_tracks_and_runs_ba():
    cfg = make_cfg()
    sys_ = SLAMSystem(cfg, ba_every=3, loop_every=0)
    poses = synthetic.make_trajectory(6, step_m=0.06, yaw_rate=0.004)
    outs = []
    for i in range(6):
        T = jnp.asarray(poses[i])
        l, r, d = synthetic.render_stereo(T, cfg.rig)
        outs.append(sys_.process_frame(l, r, depth=d))
    assert all(o["tracking_ok"] for o in outs)
    assert sys_.backend.num_keyframes == 6
    # BA ran at least once (every 3 keyframes)
    errs = [
        float(lie.pose_error_weighted(jnp.asarray(sys_.backend.keyframes[i].T_wc),
                                      jnp.asarray(poses[i])))
        for i in range(6)
    ]
    assert max(errs) < 0.05, errs
    assert outs[-1]["frame_ms"] > 0
    assert 0.25 <= outs[-1]["budget_scale"] <= 1.0


def test_system_loop_closure_corrects_map():
    """Out-and-back trajectory with a revisit: the system must detect the
    loop, relax the graph, and re-fuse the dense map.

    min_error is dropped to 0.2 mm here: the round-4 frontend (2048
    features + subpixel match refinement) tracks this loop at 2-7 mm
    drift, below the production 5 mm correction gate — the chain under
    test (loop -> relax -> re-fuse) must still fire on mm-level updates."""
    cfg = make_cfg()
    cfg = dataclasses.replace(
        cfg, correction=dataclasses.replace(cfg.correction,
                                            min_error=2e-4))
    sys_ = SLAMSystem(cfg, ba_every=0, loop_every=1)
    n = 12
    gt = [np.eye(4, dtype=np.float32)]
    for i in range(1, n):
        sgn = 1.0 if i < n // 2 else -1.0
        xi = np.array([0.01 * sgn, 0, sgn * 0.1, 0, sgn * 0.008, 0], np.float32)
        gt.append(np.asarray(jnp.asarray(gt[-1]) @ lie.se3_exp(jnp.asarray(xi))))
    gt.append(gt[0].copy())  # revisit

    for i, T in enumerate(gt):
        l, r, d = synthetic.render_stereo(jnp.asarray(T), cfg.rig)
        sys_.process_frame(l, r, depth=d)

    assert sys_.num_loops >= 1, "loop not detected"
    assert sys_.num_corrections >= 1, "online correction did not re-fuse"
    # final keyframe pulled near ground truth by the pose graph
    err = float(lie.pose_error_weighted(
        jnp.asarray(sys_.backend.keyframes[-1].T_wc), jnp.asarray(gt[-1])))
    assert err < 0.05, err


def test_pd_controller_converges():
    pd = PDController(kp=0.8, kd=0.08, target_ms=100.0)
    # overload: measured 400ms -> budget shrinks
    for _ in range(20):
        s_low = pd.update(400.0)
    assert s_low <= 0.3
    # underload: budget recovers
    for _ in range(60):
        s_high = pd.update(20.0)
    assert s_high >= 0.9


def test_system_chunked_throughput_mode():
    """process_chunk runs the batched scan and the chunk-rate backend."""
    import dataclasses
    cfg = tiny_test_config(width=320, height=240, baseline_m=0.25)
    cfg = dataclasses.replace(
        cfg, pipeline=dataclasses.replace(cfg.pipeline, fusion_db_capacity=8))
    sys_ = SLAMSystem(cfg, ba_every=2, loop_every=0)
    n, chunk = 8, 4
    poses = synthetic.make_trajectory(n, step_m=0.12, yaw_rate=0.0)
    lefts, rights, _ = synthetic.render_stereo_trajectory(poses, cfg.rig)
    outs = []
    for i in range(0, n, chunk):
        outs.append(sys_.process_chunk(lefts[i:i+chunk], rights[i:i+chunk]))
    assert all(o["fused"] for o in outs)
    assert outs[-1]["tracking_ok"]
    assert outs[-1]["tracking_ok_frames"].shape == (chunk,)
    # EVERY fused frame registers as a backend keyframe (keyframe_every=1
    # here), not just the chunk tails — loop closure/BA see all of them
    assert sys_.backend.num_keyframes == n
    assert len(sys_.trajectory()) == n
    # recovered motion sane
    import numpy as np
    est = np.linalg.norm(outs[-1]["T_wc"][:3, 3])
    gt = np.linalg.norm(poses[-1][:3, 3])
    assert abs(est - gt) / gt < 0.3, (est, gt)


def test_relocalization_after_lost_tracking():
    """Blank frames kill tracking; once frames return to a known view, the
    system relocalizes against the keyframe DB (ORB-SLAM2 capability) and
    recovers the pose instead of coasting on constant velocity."""
    import numpy as np

    cfg = tiny_test_config(width=320, height=240, baseline_m=0.25)
    sys_ = SLAMSystem(cfg, ba_every=0, loop_every=0, reloc_after=2)
    poses = synthetic.make_trajectory(5, step_m=0.1, yaw_rate=0.0)
    # phase 1: build keyframes
    for i in range(5):
        l, r, d = synthetic.render_stereo(jnp.asarray(poses[i]), cfg.rig)
        out = sys_.process_frame(l, r, depth=d)
    assert sys_.backend.num_keyframes >= 4
    # phase 2: blind frames (featureless) -> tracking lost, pose drifts on
    # the constant-velocity prior
    blank = jnp.zeros_like(l)
    for _ in range(3):
        out = sys_.process_frame(blank, blank, depth=d)
    assert not out["tracking_ok"]
    # phase 3: revisit the SECOND pose (seen before) -> relocalize
    l2, r2, d2 = synthetic.render_stereo(jnp.asarray(poses[1]), cfg.rig)
    relocalized = False
    for _ in range(4):
        out = sys_.process_frame(l2, r2, depth=d2)
        if out.get("relocalized"):
            relocalized = True
            break
    assert relocalized
    assert sys_.num_relocs >= 1
    err = np.linalg.norm(np.asarray(out["T_wc"])[:3, 3] - poses[1][:3, 3])
    assert err < 0.15, err


def test_chunk_mode_relocalization_after_blackout():
    """Chunk-path relocalization (reference: tracker recovery is always
    active — DenseSlam.cpp:89-96 + ORB-SLAM2 relocalization): a blank-frame
    blackout inside process_chunk arms a pending reloc; the next chunk that
    revisits a known view re-locks, corrects the drift-suspect keyframes
    registered since the blackout began, and re-anchors the frontier."""
    cfg = tiny_test_config(width=320, height=240, baseline_m=0.25)
    cfg = dataclasses.replace(
        cfg, pipeline=dataclasses.replace(cfg.pipeline, fusion_db_capacity=8))
    sys_ = SLAMSystem(cfg, ba_every=0, loop_every=0, reloc_after=2)
    chunk = 4
    poses = synthetic.make_trajectory(8, step_m=0.1, yaw_rate=0.0)
    lefts, rights, _ = synthetic.render_stereo_trajectory(poses, cfg.rig)
    # phase 1: two clean chunks build the keyframe DB
    for i in range(0, 8, chunk):
        out = sys_.process_chunk(lefts[i:i + chunk], rights[i:i + chunk])
    assert out["tracking_ok"]
    assert sys_.backend.num_keyframes >= 6
    # phase 2: a blackout chunk (featureless frames) -> lost streak arms
    # the pending reloc; blank features cannot verify, so no reloc yet
    blanks = jnp.zeros_like(lefts[:chunk])
    out = sys_.process_chunk(blanks, blanks)
    assert not out["tracking_ok"]
    assert sys_._reloc_pending
    assert sys_.num_relocs == 0
    # phase 3: revisit a known view -> the chunk-path reloc re-locks
    l2, r2, _ = synthetic.render_stereo_trajectory(
        np.stack([poses[1]] * chunk), cfg.rig)
    out = sys_.process_chunk(l2, r2)
    assert sys_.num_relocs >= 1
    assert not sys_._reloc_pending
    err = np.linalg.norm(np.asarray(out["T_wc"])[:3, 3] - poses[1][:3, 3])
    assert err < 0.15, err
    # the drift-suspect keyframes were pulled back too: the last stored
    # keyframe sits near the revisited pose, not where the blackout coast
    # left it
    kf_err = np.linalg.norm(
        np.asarray(sys_.backend.keyframes[-1].T_wc)[:3, 3]
        - poses[1][:3, 3])
    assert kf_err < 0.3, kf_err


def test_resync_propagates_delta_not_teleport():
    """The backend pose back-channel must apply the optimisation DELTA to
    the frontend's CURRENT pose (which, in chunk mode, is several frames
    past the optimised keyframe) — overwriting with the keyframe pose
    teleports the frontend backwards by the intervening motion (measured
    13x ATE blowup on the 540-frame drive before the fix)."""
    cfg = make_cfg()
    sys_ = SLAMSystem(cfg, ba_every=0, loop_every=0)

    # frontend is 0.5 m past the keyframe
    T_kf = np.eye(4, dtype=np.float32)
    T_cur = np.eye(4, dtype=np.float32)
    T_cur[2, 3] = 0.5
    sys_.slam.fe_state = sys_.slam.fe_state._replace(
        T_wc=jnp.asarray(T_cur))

    # the optimiser nudged the keyframe by a known world-side delta
    delta = np.eye(4, dtype=np.float32)
    delta[0, 3] = 0.1
    T_opt = delta @ T_kf
    from denseslam_tpu.models.backend import Keyframe
    sys_.backend.keyframes.append(
        Keyframe(0, T_opt, None, None, None))
    sys_._resync_pose(T_before=T_kf)

    got = np.asarray(sys_.slam.fe_state.T_wc)
    np.testing.assert_allclose(got, delta @ T_cur, atol=1e-6)

    # no-op when the optimiser did not move the keyframe
    sys_.backend.keyframes[-1] = Keyframe(0, T_kf, None, None, None)
    sys_.slam.fe_state = sys_.slam.fe_state._replace(
        T_wc=jnp.asarray(T_cur))
    sys_._resync_pose(T_before=T_kf)
    np.testing.assert_allclose(
        np.asarray(sys_.slam.fe_state.T_wc), T_cur, atol=0)


def test_prefetch_chunk_matches_unprefetched():
    """prefetch_chunk + process_chunk must produce the SAME trajectory and
    backend state as plain process_chunk calls: the prefetch only hoists
    the scan dispatch ahead of host work, it never reorders device
    programs relative to the tick's corrections."""
    import dataclasses

    import numpy as np

    cfg = tiny_test_config(width=320, height=240, baseline_m=0.25)
    cfg = dataclasses.replace(
        cfg, pipeline=dataclasses.replace(cfg.pipeline, fusion_db_capacity=8))
    n, chunk = 12, 4
    poses = synthetic.make_trajectory(n, step_m=0.12, yaw_rate=0.02)
    lefts, rights, _ = synthetic.render_stereo_trajectory(poses, cfg.rig)

    def drive(prefetch: bool):
        s = SLAMSystem(cfg, ba_every=2, loop_every=0)
        pre = None
        for i in range(0, n, chunk):
            s.process_chunk(lefts[i:i + chunk], rights[i:i + chunk])
            if prefetch and i + chunk < n:
                s.prefetch_chunk(lefts[i + chunk:i + 2 * chunk],
                                 rights[i + chunk:i + 2 * chunk])
        return s

    s_a = drive(False)
    s_b = drive(True)
    ta = np.stack([T for _, T in s_a.trajectory()])
    tb = np.stack([T for _, T in s_b.trajectory()])
    np.testing.assert_allclose(ta, tb, atol=1e-6)
    assert s_a.backend.num_keyframes == s_b.backend.num_keyframes


def test_chunk_mode_submap_spawn():
    """The production chunked path runs the new-submap policy at chunk
    rate (per-frame mode checks after every fused keyframe): turning the
    camera away from the fused scene must spawn a fresh submap, and the
    old submap keeps its fusion DB."""
    import dataclasses

    cfg = tiny_test_config(width=320, height=240, baseline_m=0.25)
    cfg = dataclasses.replace(
        cfg, pipeline=dataclasses.replace(
            cfg.pipeline, fusion_db_capacity=8, new_submap_threshold=0.5))
    sys_ = SLAMSystem(cfg, ba_every=0, loop_every=0)
    n, chunk = 12, 4
    poses = synthetic.make_trajectory(n, step_m=0.1, yaw_rate=0.18)
    lefts, rights, _ = synthetic.render_stereo_trajectory(poses, cfg.rig)
    for i in range(0, n, chunk):
        sys_.process_chunk(lefts[i:i + chunk], rights[i:i + chunk])
    assert len(sys_.slam.submaps.maps) >= 2, "no submap spawned in chunk mode"
    assert int(np.asarray(sys_.slam.submaps.dbs[0].valid).sum()) > 0


def test_rgbd_chunk_mode_tracks_and_registers():
    """RGB-D throughput path (process_sequence_rgbd + virtual right
    features for backend registration — reference RGBD sensor,
    Input.h:30-35): the chunk scan must track from sensor depth, fuse,
    and register keyframes whose virtual stereo features feed BA."""
    cfg = make_cfg()
    cfg = dataclasses.replace(
        cfg, pipeline=dataclasses.replace(cfg.pipeline, sensor="rgbd",
                                          keyframe_every=2))
    sys_ = SLAMSystem(cfg, ba_every=2, loop_every=0)
    n = 12
    poses = synthetic.make_trajectory(n, step_m=0.05, yaw_rate=0.003)
    grays, depths = synthetic.render_trajectory(
        jnp.asarray(poses), cfg.rig.intr)
    out = sys_.process_chunk(grays[:6], depths[:6])
    out = sys_.process_chunk(grays[6:], depths[6:])
    okf = np.asarray(out["tracking_ok_frames"])
    assert okf[1:].mean() > 0.7, f"rgbd chunk tracking lost: {okf}"
    assert sys_.backend.num_keyframes >= 3
    # virtual right features must be present (BA needs the disparity)
    kf = sys_.backend.keyframes[-1]
    assert int(np.asarray(kf.feats_r.valid).sum()) > 20
    # trajectory error stays bounded
    est = {f: T for f, T in sys_.slam.pose_history}
    errs = [float(np.linalg.norm(est[i][:3, 3] - poses[i][:3, 3]))
            for i in range(n) if i in est]
    assert max(errs) < 0.15, errs
