"""Full SLAM system: frontend + dense fusion + sparse backend, two-rate.

This is the complete analogue of the reference's running system: the
per-frame path (sparse tracking + keyframe-gated fusion, DenseSlam::
ProcessFrame) plus the keyframe-rate backend (local BA + loop closing)
whose optimised poses flow back into the dense map through online
correction — the handoff the reference implements with the LocalMapping
keyframe queue and cond-var back-channels (reference:
OrbSLAMDriver.h:100-118, DenseSlam.cpp:89-100, 175-179).

Thread replacement (SURVEY.md section 2c P1/P2): instead of Tracking /
LocalMapping / LoopClosing CPU threads, the backend runs as explicitly
scheduled jitted programs every `ba_every` keyframes — deterministic,
single-process, device-resident.

Also hosts the PD controller on the feature budget (reference:
DenseSlam.h:382-409, gains kp=0.8 kd=0.08 at :486-489): the reference
modulates ORB feature count to hold ~100 ms/frame; here the budget
modulates RANSAC hypothesis count (the comparable knob under jit —
feature caps are compile-time constants).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SystemConfig
from .backend import Backend
from .dense_slam import DenseSLAM


class PDController:
    """PD control of a latency-coupled budget (reference DenseSlam.h:382-409)."""

    def __init__(self, kp: float, kd: float, target_ms: float,
                 lo: float = 0.25, hi: float = 1.0):
        self.kp, self.kd = kp, kd
        self.target = target_ms
        self.lo, self.hi = lo, hi
        self.prev_err = 0.0
        self.scale = 1.0

    def update(self, measured_ms: float) -> float:
        err = (self.target - measured_ms) / self.target
        d = err - self.prev_err
        self.prev_err = err
        self.scale = float(np.clip(self.scale + self.kp * err * 0.1 + self.kd * d, self.lo, self.hi))
        return self.scale


class SLAMSystem:
    def __init__(self, cfg: SystemConfig, seed: int = 0,
                 ba_every: int = 4, loop_every: int = 1,
                 reloc_after: int = 3):
        self.cfg = cfg
        self.slam = DenseSLAM(cfg, seed=seed)
        self.backend = Backend(cfg)
        self.ba_every = ba_every
        self.loop_every = loop_every
        self.reloc_after = reloc_after   # lost frames before relocalizing
        self.pd = PDController(cfg.frontend.pd_kp, cfg.frontend.pd_kd,
                               cfg.frontend.target_frame_ms)
        self.num_loops = 0
        self.num_corrections = 0
        self.num_relocs = 0
        self.num_culled = 0
        self._lost_streak = 0
        self._seq_fn = None

    def process_frame(self, left, right=None, depth=None,
                      timestamp: Optional[float] = None) -> dict:
        import time as _time

        t0 = _time.perf_counter()
        out = self.slam.process_frame(left, right, depth=depth,
                                      timestamp=timestamp,
                                      budget_scale=self.pd.scale)

        # Relocalization after sustained tracking loss (ORB-SLAM2
        # capability: the constant-velocity fallback alone never re-locks).
        if out["tracking_ok"]:
            self._lost_streak = 0
        else:
            self._lost_streak += 1
            if (self.reloc_after
                    and self._lost_streak >= self.reloc_after
                    and self.backend.num_keyframes):
                fe = self.slam.fe_state
                T = self.backend.relocalize(fe.feats_l, fe.feats_r)
                if T is not None:
                    eye = jnp.eye(4, dtype=jnp.float32)
                    self.slam.fe_state = fe._replace(
                        T_wc=jnp.asarray(T),
                        T_delta_prev=eye,
                        prior_ok=jnp.zeros((), bool),
                    )
                    self.slam.pose_history[-1] = (
                        self.slam.pose_history[-1][0], np.asarray(T))
                    out["T_wc"] = jnp.asarray(T)
                    out["relocalized"] = True
                    self.num_relocs += 1
                    self._lost_streak = 0

        if out["fused"]:
            # register the fused keyframe with the backend (the
            # getProcessKeyFrames handoff, reversed direction)
            fe = self.slam.fe_state
            self.backend.add_keyframe(
                out["frame"], np.asarray(out["T_wc"]), fe.feats_l, fe.feats_r
            )
            self._backend_tick()

        frame_ms = (_time.perf_counter() - t0) * 1000.0
        out["frame_ms"] = frame_ms
        out["budget_scale"] = self.pd.update(frame_ms)
        out["num_loops"] = self.num_loops
        out["num_corrections"] = self.num_corrections
        out["ba_ms"] = self.backend.last_ba_ms
        return out

    def process_chunk(self, lefts, rights) -> dict:
        """Throughput mode: run a frame batch through the batched
        `process_sequence` scan (ONE device program — see its docstring for
        why the host loop costs ~3x), then register every fused keyframe
        with the backend and run the two-rate backend work between chunks.

        Returns the last frame's telemetry plus per-chunk stats arrays."""
        import time as _time

        from .dense_slam import process_sequence

        t0 = _time.perf_counter()
        n = lefts.shape[0]
        slam = self.slam
        if self._seq_fn is None:
            import functools
            self._seq_fn = jax.jit(
                functools.partial(process_sequence, cfg=self.cfg),
                donate_argnums=(1, 2),
            )
        frame0 = slam.frame          # authoritative (checkpoint-restored)
        fids = jnp.arange(frame0, frame0 + n, dtype=jnp.int32)
        st, m, db, stats = self._seq_fn(
            slam.fe_state, slam.submaps.active, slam.db, lefts, rights, fids)
        slam.fe_state = st
        slam.submaps.active = m
        slam.db = db
        slam.frame = frame0 + n

        T_last = np.asarray(stats["T_wc"][-1])
        fused_flags = np.asarray(stats["fused"])
        fused_any = bool(fused_flags.any())
        for i in range(n):
            slam.pose_history.append(
                (int(frame0 + i), np.asarray(stats["T_wc"][i])))

        # register EVERY fused keyframe with the backend (the reference's
        # LocalMapping queue receives every keyframe; registering only the
        # chunk tail starved loop closure/BA of 1/chunk of the keyframes)
        for i in np.flatnonzero(fused_flags):
            self.backend.add_keyframe(
                int(frame0 + i),
                np.asarray(stats["T_wc"][i]),
                jax.tree.map(lambda x: x[i], stats["feats_l"]),
                jax.tree.map(lambda x: x[i], stats["feats_r"]),
            )
            self._backend_tick()

        dt = (_time.perf_counter() - t0) * 1000.0
        ok_frames = np.asarray(stats["tracking_ok"])
        return dict(
            T_wc=T_last,
            tracking_ok=bool(ok_frames[1:].all()),
            tracking_ok_frames=ok_frames,     # which frame failed, exactly
            fused=fused_any,
            frames=n,
            chunk_ms=dt,
            num_loops=self.num_loops,
            num_corrections=self.num_corrections,
            ba_ms=self.backend.last_ba_ms,
        )

    def _backend_tick(self) -> None:
        """Keyframe-rate backend work: loop closing every `loop_every`
        keyframes, local BA every `ba_every`; optimised poses flow back to
        the frontend and dense map (the LocalMapping/LoopClosing thread
        cadence, flattened to explicit scheduling)."""
        nkf = self.backend.num_keyframes
        if self.loop_every and nkf % self.loop_every == 0:
            if self.backend.detect_loop() is not None:
                self.num_loops += 1
                ids, opt = self.backend.optimize_graph()
                self.num_corrections += self.slam.apply_pose_updates(ids, opt)
                self._resync_pose()
        if self.ba_every and nkf >= 2 and nkf % self.ba_every == 0:
            res = self.backend.local_ba()
            if res is not None:
                ids, opt = res
                self.num_corrections += self.slam.apply_pose_updates(ids, opt)
                self._resync_pose()
                # redundant-keyframe culling on the BA window's
                # covisibility evidence; the culled frames' fused
                # contributions are de-integrated from the dense map
                # (reference: DenseSlam.cpp:417-429)
                culled = self.backend.cull_redundant()
                if culled:
                    self.slam.purge_keyframes(np.asarray(culled))
                    self.num_culled += len(culled)

    def _resync_pose(self) -> None:
        """Propagate the backend's latest optimised keyframe pose into the
        frontend estimate (the reference's pose back-channel,
        OrbSLAMDriver.h:120-122)."""
        if not self.backend.keyframes:
            return
        last = self.backend.keyframes[-1]
        # re-anchor the frontend at the optimised pose of its latest keyframe
        fe = self.slam.fe_state
        T_opt = jnp.asarray(last.T_wc)
        self.slam.fe_state = fe._replace(T_wc=T_opt)

    def finish(self) -> None:
        """Sequence end: decay catch-up (reference DecayCatchup)."""
        self.slam.decay_catchup()

    # telemetry passthroughs
    def memory_bytes(self) -> int:
        return self.slam.memory_bytes()

    def trajectory(self):
        return self.slam.trajectory()

    def keyframe_trajectory(self):
        return self.backend.keyframe_poses()
