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
        # per-phase wall-time accounting for process_chunk (seconds)
        from collections import defaultdict
        self.phase_s = defaultdict(float)
        # raw scan pose of the last registered keyframe (chunk-mode
        # relative chaining); None until a chunk registers one
        self._chain_scan = None
        # chunk-mode relocalization state: a qualifying lost streak arms
        # `_reloc_pending`; `_lost_anchor_nkf` marks how many keyframes
        # existed when the streak began (later ones carry blackout drift)
        self._reloc_pending = False
        self._lost_anchor_nkf = 0
        self._reloc_extra = None   # reloc delta when no kf anchors it
        self._prefetched = None    # (frame0, n, stats) from prefetch_chunk

    def _get_seq_fn(self):
        if self._seq_fn is None:
            import functools

            from .dense_slam import (process_sequence,
                                     process_sequence_mono,
                                     process_sequence_rgbd)
            # rgbd/mono route the chunk scan through the depth-supplied
            # bodies (process_chunk's `rights` argument carries the depth
            # maps; mono's VO ignores them — fusion + backend consume them)
            seq = {"rgbd": process_sequence_rgbd,
                   "mono": process_sequence_mono}.get(
                       self.cfg.pipeline.sensor, process_sequence)
            self._seq_fn = jax.jit(
                functools.partial(seq, cfg=self.cfg),
                donate_argnums=(1, 2),
            )
        return self._seq_fn

    def warmup(self, chunk: int = 0) -> float:
        """Compile every program this system can dispatch mid-run.

        The reference keeps all its CUDA kernels resident from startup;
        here first-use compiles otherwise land INSIDE the drive (measured
        on the remote TPU compile service: correction replay 22 s, loop
        verification 4.6 s, the chunk scan's first windows ~110+68 s) and
        crush steady-state fps. `chunk` > 0 also warms the chunk-scan
        program at that batch size. Returns elapsed seconds."""
        import time as _time

        t0 = _time.perf_counter()
        cfg = self.cfg
        be = self.backend
        slam = self.slam
        from ..ops import posegraph
        from .backend import _stack_features
        from .frontend import _empty_features

        empty = _empty_features(cfg)
        # local BA window solve (+ problem build)
        K = cfg.backend.window_keyframes
        fl = _stack_features([empty] * K)
        T = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (K, 1, 1))
        problem = be._build(fl, fl, T, fixed=jnp.arange(K) >= 0)
        res = be._ba(problem)
        jax.device_get((res.initial_cost, res.final_cost))
        # loop / reloc geometric verification (batched: detect_loop top-3,
        # relocalize top-5 are distinct batch shapes)
        for k in (3, 5):
            ck = _stack_features([empty] * k)
            keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(k))
            T_rel, n_inl, ok = be._verify_batch(empty, empty, ck, ck, keys)
        # retrieval sketch buffer + device scorer
        from .backend import _SIG_M
        d_dim = empty.desc.shape[1]
        be._score_fn(jnp.zeros((_SIG_M, d_dim), jnp.float32),
                     jnp.zeros((be._sig_cap, _SIG_M, d_dim), jnp.float32),
                     jnp.zeros((be._sig_cap,), bool))
        be._sig_set(jnp.zeros((be._sig_cap, _SIG_M, d_dim), jnp.float32),
                    0, jnp.zeros((_SIG_M, d_dim), jnp.float32))
        # pose-graph relaxation (static caps)
        g = posegraph.make_graph(cfg.backend)
        g = be._pg(g)
        # correction replay + purge on the live map (all-False masks:
        # semantically a no-op — the compile is the point)
        from .dense_slam import make_fusion_db
        db0 = make_fusion_db(cfg)
        c = cfg.pipeline.fusion_db_capacity
        opt_T = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (c, 1, 1))
        no = jnp.zeros((c,), bool)
        if slam._sharded is not None:
            _, _, num = slam._sharded.correct(
                slam.submaps.active, db0, opt_T, no)
            slam._sharded.purge(slam.submaps.active, db0, no)
        else:
            _, _, num = slam._correct(slam.submaps.active, db0, opt_T, no)
            slam._purge(slam.submaps.active, db0, no)
        # composite-combine programs (multi-submap eval renders them
        # mid-drive; their first-use compiles measured ~40 s/eval frame
        # on the remote service)
        rc0 = slam.raycast_view(jnp.eye(4, dtype=jnp.float32))
        eye = jnp.eye(4, dtype=jnp.float32)
        rc1 = slam._composite_first(rc0, eye)
        rc2 = slam._composite_merge(rc1, rc0, eye)
        # ghost-render builder (composite eval of spilled submaps): its
        # first-use compile must not land inside an eval burst mid-drive
        ghost_sync = rc2.depth[0, 0]
        if (cfg.pipeline.new_submap_threshold >= 0
                or cfg.pipeline.map_memory_budget_mb >= 0):
            from ..ops.tsdf import BLOCK_VOL
            # the delta-returning correction replay (restore_submap's
            # program) — first use otherwise compiles mid-drive
            if slam._sharded is None:
                _, _, numd, chg = slam._correct_delta(
                    slam.submaps.active, db0, opt_T, no)
                jax.device_get((numd, chg[0]))
            sm = slam.submaps
            s = cfg.tsdf.table_slots
            sd = jnp.asarray(sm.active.tsdf[:1, :1]).dtype
            build = sm._ghost_build_fn(sd)
            for npad in sorted({min(b, s) for b in
                                (4096, 8192, 12288, 16384)}):
                gm = build(jnp.zeros((s,), jnp.int32),
                           jnp.zeros((s,), jnp.int32),
                           jnp.zeros((npad, BLOCK_VOL), jnp.float16),
                           jnp.zeros((npad, BLOCK_VOL), jnp.uint8),
                           jnp.zeros((), jnp.int32))
                ghost_sync = ghost_sync + gm.tsdf[0, 0].astype(jnp.float32)
        # sync everything above via scalar fetches (block_until_ready is
        # not a reliable barrier on the tunneled runtime)
        jax.device_get((n_inl, g.T_wc[0, 0, 0], num, ghost_sync))
        if chunk and slam._sharded is None:
            # the chunk-scan program on throwaway state (m/db are donated)
            from . import frontend as fe
            from ..ops import tsdf as tsdf_ops
            intr = cfg.rig.intr
            lefts = jnp.zeros((chunk, intr.height, intr.width), jnp.float32)
            st0 = fe.init_frontend(cfg, seed=99)
            m0 = tsdf_ops.make_map(cfg.tsdf)
            fids = jnp.arange(chunk, dtype=jnp.int32)
            _, _, _, stats = self._get_seq_fn()(
                st0, m0, make_fusion_db(cfg), lefts, lefts, fids)
            jax.device_get(stats["T_wc"][0])
        return _time.perf_counter() - t0

    def process_frame(self, left, right=None, depth=None,
                      timestamp: Optional[float] = None) -> dict:
        import time as _time

        if self._prefetched is not None:
            raise RuntimeError("a prefetched chunk is pending — call "
                               "process_chunk before process_frame")
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
            self._chain_scan = None     # per-frame registration breaks the
            self._backend_tick()        # chunk-mode scan chain

        frame_ms = (_time.perf_counter() - t0) * 1000.0
        out["frame_ms"] = frame_ms
        out["budget_scale"] = self.pd.update(frame_ms)
        out["num_loops"] = self.num_loops
        out["num_corrections"] = self.num_corrections
        out["ba_ms"] = self.backend.last_ba_ms
        return out

    def _dispatch_scan(self, lefts, rights):
        """Dispatch the chunk-scan device program on the current state and
        advance the state handles to its (async) outputs. Returns
        (frame0, n, stats) with stats still on device."""
        import time as _time

        t0 = _time.perf_counter()
        n = lefts.shape[0]
        slam = self.slam
        seq_fn = self._get_seq_fn()
        frame0 = int(slam.frame)     # authoritative (checkpoint-restored)
        fids = jnp.arange(frame0, frame0 + n, dtype=jnp.int32)
        st, m, db, stats = seq_fn(
            slam.fe_state, slam.submaps.active, slam.db, lefts, rights, fids)
        slam.fe_state = st
        slam.submaps.active = m
        slam.db = db
        slam.frame = frame0 + n
        self.phase_s["scan_dispatch"] += _time.perf_counter() - t0
        return frame0, n, stats

    def prefetch_chunk(self, lefts, rights) -> None:
        """Dispatch the NEXT chunk's scan ahead of between-chunk host work.

        Call it right after `process_chunk` returns (the previous tick's
        corrections are already dispatched, so the scan consumes corrected
        state — ordering is IDENTICAL to the unprefetched path) and then do
        whatever host work sits between chunks (telemetry, data prep);
        the scan's device time hides under it instead of serializing
        inside the next `process_chunk`'s fetch. The next `process_chunk`
        call MUST pass the same batch. This is the flattened-schedule form
        of the reference's tracking-thread / mapping-thread overlap
        (SURVEY.md section 2c P1/P2): the device races ahead on odometry +
        fusion while the host turns the crank on the backend's bookwork."""
        if self._prefetched is not None:
            raise RuntimeError("prefetch_chunk called twice without an "
                               "intervening process_chunk")
        self._prefetched = self._dispatch_scan(lefts, rights)

    def process_chunk(self, lefts, rights) -> dict:
        """Throughput mode: run a frame batch through the batched
        `process_sequence` scan (ONE device program — see its docstring for
        why the host loop costs ~3x), then register every fused keyframe
        with the backend and run ONE backend tick for the whole chunk.

        The tick is BATCHED per chunk (round-2 ran it per keyframe,
        serializing up to 4 BA solves + 4 loop detections + 2 correction
        programs behind each scan — measured 5.6 s/chunk at 540-frame
        scale; the reference hides this work in its LocalMapping /
        LoopClosing threads, SURVEY.md section 2c P1/P2 — batching is the
        flattened-schedule equivalent). All host<->device traffic is one
        packed stats fetch; keyframe sketches are computed inside the scan
        (`signature_device`), and registration math is pure numpy.

        Relocalization runs here too (reference: tracker recovery is
        always active, DenseSlam.cpp:89-96 + ORB-SLAM2 relocalization): a
        lost streak >= `reloc_after` arms a pending reloc; once features
        verify against the keyframe database, the recovered pose corrects
        the frontier AND the drift-suspect keyframes registered since the
        blackout began.

        Returns the last frame's telemetry plus per-chunk stats arrays."""
        import time as _time

        t0 = _time.perf_counter()
        slam = self.slam
        if self._prefetched is not None:
            # the scan for THIS chunk was dispatched by prefetch_chunk
            # after the previous chunk's tick — its device time has been
            # hiding under the caller's between-chunk host work
            frame0, n, stats = self._prefetched
            self._prefetched = None
            if n != lefts.shape[0]:
                raise ValueError(
                    f"prefetched chunk has {n} frames, caller passed "
                    f"{lefts.shape[0]} — prefetch_chunk/process_chunk must "
                    "receive the same batch")
        else:
            frame0, n, stats = self._dispatch_scan(lefts, rights)

        # ONE packed fetch (each readback pays the full tunnel RTT): poses
        # + flags + the fused keyframes' retrieval sketches
        tf = _time.perf_counter()
        T_all, fused_flags, ok_frames, sigs = jax.device_get(
            (stats["T_wc"], stats["fused"], stats["tracking_ok"],
             stats["sig"]))
        self.phase_s["scan_wait_fetch"] += _time.perf_counter() - tf
        # async spawn-spills dispatched last chunk streamed under this
        # chunk's scan; whatever remains unfinished is the true serial
        # cost (phase "spill_wait")
        t_sw = _time.perf_counter()
        slam.submaps.finalize_spills()
        self.phase_s["spill_wait"] += _time.perf_counter() - t_sw
        fused_any = bool(fused_flags.any())
        import os
        _dbg = bool(os.environ.get("DSL_DEBUG_RESYNC"))
        if _dbg:
            t_mag = np.abs(T_all[:, :3, 3]).max()
            print(f"    scan f{int(frame0)}+{n}: max|t|={t_mag:.2f} "
                  f"finite={bool(np.isfinite(T_all).all())}", flush=True)

        # Register EVERY fused keyframe with the backend (the reference's
        # LocalMapping queue receives every keyframe; registering only the
        # chunk tail starved loop closure/BA of 1/chunk of the keyframes)
        # by RELATIVE CHAINING: new_pose = (previous keyframe's CURRENT
        # stored pose, i.e. post-BA) @ (raw scan relative motion). Scan
        # poses in the batch predate the backend tick; registering them as
        # absolutes makes the backend's consecutive-keyframe edges encode
        # the optimisation delta as false motion. Accumulating per-tick
        # deltas multiplicatively was tried and is UNSTABLE (measured
        # exponential blowup); chaining to the stored pose is
        # self-stabilising: the registration error never exceeds one
        # inter-keyframe hop.
        def _orth(T):
            # project the rotation part back onto SO(3). The chain
            # composes host-side f32 products every keyframe; _inv_se3
            # uses R^T as the inverse, so any scale/skew ε in R compounds
            # CUBICALLY per hop (measured: poses exploded x45/keyframe
            # after ~100 frames while translations still printed sane).
            U, _, Vt = np.linalg.svd(np.asarray(T[:3, :3], np.float64))
            R = (U @ Vt).astype(np.float32)
            out = np.eye(4, dtype=np.float32)
            out[:3, :3] = R
            out[:3, 3] = T[:3, 3]
            return out

        def _inv_se3(T):
            R, t = T[:3, :3], T[:3, 3]
            out = np.eye(4, dtype=np.float32)
            out[:3, :3] = R.T
            out[:3, 3] = -R.T @ t
            return out

        t_reg = _time.perf_counter()
        j_last = None          # scan index of the last registered keyframe
        kf_before = [self.backend.num_keyframes] * (n + 1)
        for j in range(n):
            kf_before[j + 1] = kf_before[j]
            if fused_flags[j]:
                fid = int(frame0 + j)
                if self._chain_scan is None or not self.backend.keyframes:
                    T_reg = _orth(T_all[j])
                else:
                    rel = _inv_se3(_orth(self._chain_scan)) @ _orth(T_all[j])
                    T_reg = _orth(
                        np.asarray(self.backend.keyframes[-1].T_wc,
                                   np.float32) @ rel)
                self.backend.add_keyframe(
                    fid, T_reg,
                    jax.tree.map(lambda x: x[j], stats["feats_l"]),
                    jax.tree.map(lambda x: x[j], stats["feats_r"]),
                    sig=sigs[j],
                )
                self._chain_scan = np.asarray(T_all[j], np.float32)
                j_last = j
                kf_before[j + 1] += 1

        self.phase_s["register"] += _time.perf_counter() - t_reg

        # ---- lost-streak accounting + chunk-mode relocalization --------
        t_rl = _time.perf_counter()
        streak = self._lost_streak
        for i in range(n):
            if not ok_frames[i] and not (frame0 == 0 and i == 0):
                if streak == 0:
                    self._lost_anchor_nkf = kf_before[i]
                streak += 1
                if self.reloc_after and streak >= self.reloc_after:
                    self._reloc_pending = True
            else:
                streak = 0
        self._lost_streak = streak

        if (self._reloc_pending and self.reloc_after
                and self.backend.num_keyframes):
            T_rec = self.backend.relocalize(
                jax.tree.map(lambda x: x[n - 1], stats["feats_l"]),
                jax.tree.map(lambda x: x[n - 1], stats["feats_r"]))
            if T_rec is not None:
                # current (drifted) estimate of the last frame, pre-tick
                if j_last is not None:
                    C_pre = _orth(
                        np.asarray(self.backend.keyframes[-1].T_wc,
                                   np.float32)
                        @ _inv_se3(_orth(T_all[j_last])))
                else:
                    C_pre = np.eye(4, dtype=np.float32)
                est_last = _orth(C_pre @ T_all[n - 1])
                D_reloc = _orth(_orth(np.asarray(T_rec, np.float32))
                                @ _inv_se3(est_last))
                # left-multiply the drift-suspect keyframes (registered
                # since the blackout began): intra-group relative edges
                # are invariant under a common world-side delta
                kfs = self.backend.keyframes
                a0 = min(self._lost_anchor_nkf, len(kfs))
                for idx in range(a0, len(kfs)):
                    kfs[idx] = kfs[idx]._replace(
                        T_wc=_orth(D_reloc @ kfs[idx].T_wc))
                # the one odometry edge SPANNING the blackout encoded the
                # constant-velocity guess; recompute it from the corrected
                # stored poses at low weight
                if 0 < a0 < len(kfs):
                    fa, fb = kfs[a0 - 1].frame_id, kfs[a0].frame_id
                    Ta = _orth(np.asarray(kfs[a0 - 1].T_wc, np.float32))
                    Tb = _orth(np.asarray(kfs[a0].T_wc, np.float32))
                    T_ab = _inv_se3(Ta) @ Tb
                    self.backend.odom_edges = [
                        e for e in self.backend.odom_edges
                        if not (e[0] == fa and e[1] == fb)]
                    self.backend.odom_edges.append((fa, fb, T_ab, 0.3))
                # motion prior across the jump is garbage
                slam.fe_state = slam.fe_state._replace(
                    T_delta_prev=jnp.eye(4, dtype=jnp.float32),
                    prior_ok=jnp.zeros((), bool))
                self.num_relocs += 1
                self._reloc_pending = False
                self._lost_streak = 0
                if _dbg:
                    print(f"    RELOC: |D_t|="
                          f"{np.linalg.norm(D_reloc[:3, 3]):.2f} over "
                          f"{len(kfs) - a0} kfs", flush=True)
                if j_last is None:
                    # no keyframe this chunk anchors the correction; fold
                    # it into the frontier directly via the history path
                    self._reloc_extra = D_reloc
        D_extra = getattr(self, "_reloc_extra", None)
        self.phase_s["reloc"] += _time.perf_counter() - t_rl

        # ---- chunk-rate submap management (BEFORE the tick: correction
        # replay advances the map's frame counter past the last
        # keyframe's last_seen stamps, which would zero the visible-
        # fraction read — per-frame mode likewise checks right after
        # fusion, before backend feedback) ------------------------------
        if fused_any and j_last is not None:
            anchor = (np.asarray(self.backend.keyframes[-1].T_wc,
                                 np.float32)
                      if self.backend.keyframes else _orth(T_all[j_last]))
            t_sp = _time.perf_counter()
            # defer the budget-forced spill of the demoted submap PAST
            # the tick: the spawn decision must read the pre-tick
            # visible fraction, but dispatching the ~190 MB spill fetch
            # here made every tick fetch queue behind it on the serial
            # tunnel (measured tick 8 s -> 52 s); enforcing after the
            # tick lets the async stream ride the eval + next chunk's
            # scan window instead
            slam.maybe_spawn_submap(anchor, defer_enforce=True)
            self.phase_s["spawn"] += _time.perf_counter() - t_sp

        # ---- ONE backend tick for the whole chunk -----------------------
        t_tk = _time.perf_counter()
        if fused_any:
            self._chunk_tick()
        self.phase_s["tick"] += _time.perf_counter() - t_tk
        # budget enforcement deferred from the spawn check: dispatch the
        # demoted submap's compacted spill NOW (async) so it streams
        # under the caller's eval work and the next chunk's scan; the
        # post-scan finalize_spills() join measures any residual
        t_sp = _time.perf_counter()
        slam.submaps.enforce_memory_budget(async_spill=True)
        self.phase_s["spawn"] += _time.perf_counter() - t_sp

        # ---- world-side correction from the tick (+ reloc), applied to
        # the chunk's history and the frontier in one re-anchor ----------
        D_run = np.eye(4, dtype=np.float32)
        if j_last is not None:
            fid_last = int(frame0 + j_last)
            kfs = self.backend.keyframes
            T_stored = next(
                (np.asarray(k.T_wc, np.float32) for k in reversed(kfs)
                 if k.frame_id == fid_last), None)
            if T_stored is not None:
                D_run = _orth(T_stored @ _inv_se3(_orth(T_all[j_last])))
        elif D_extra is not None:
            D_run = D_extra
        self._reloc_extra = None

        for j in range(n):
            slam.pose_history.append((int(frame0 + j), D_run @ T_all[j]))
        T_last = _orth(slam.pose_history[-1][1])

        # one frontend re-anchor per chunk: continue the next scan from
        # the corrected chain, and map the chain's raw scan pose into the
        # next chunk's (shifted) scan frame
        if not np.allclose(D_run, np.eye(4), atol=1e-7):
            slam.fe_state = slam.fe_state._replace(
                T_wc=jnp.asarray(T_last, jnp.float32))
            if self._chain_scan is not None:
                self._chain_scan = _orth(D_run @ self._chain_scan)

        dt = (_time.perf_counter() - t0) * 1000.0
        return dict(
            T_wc=T_last,
            tracking_ok=bool(ok_frames[1:].all()),
            tracking_ok_frames=ok_frames,     # which frame failed, exactly
            fused=fused_any,
            frames=n,
            chunk_ms=dt,
            num_loops=self.num_loops,
            num_corrections=self.num_corrections,
            num_relocs=self.num_relocs,
            ba_ms=self.backend.last_ba_ms,
        )

    def _chunk_tick(self) -> None:
        """Chunk-rate backend work: ONE loop detection, ONE local BA, ONE
        merged correction pass per chunk — the batched equivalent of the
        per-keyframe `_backend_tick` cadence. Merging the loop-graph and
        BA pose updates into a single `apply_pose_updates` also halves the
        de-fuse/re-fuse correction programs per chunk."""
        import time as _time
        updates: dict = {}
        t0 = _time.perf_counter()
        self._tick_count = getattr(self, "_tick_count", 0) + 1
        # loop detection every `loop_every` TICKS in chunk mode (running
        # it every chunk paid a ~1 s/chunk verification program on the
        # 544-frame drive, re-verifying the same non-loop candidates; the
        # reference's LoopClosing thread similarly lags keyframe insertion)
        if (self.loop_every and self._tick_count % self.loop_every == 0
                and self.backend.detect_loop() is not None):
            self.num_loops += 1
            t_g = _time.perf_counter()
            ids, opt = self.backend.optimize_graph()
            # attributed separately: on the round-5 multi-submap drive
            # tick_loop ballooned to 72 s with dl_* near zero — the
            # unattributed remainder is the graph relaxation + its fetch
            self.phase_s["dl_graph"] = self.phase_s.get(
                "dl_graph", 0.0) + (_time.perf_counter() - t_g)
            for f, p in zip(ids, opt):
                updates[int(f)] = p
        self.phase_s["tick_loop"] += _time.perf_counter() - t0
        t0 = _time.perf_counter()
        if self.ba_every and self.backend.num_keyframes >= 2:
            res = self.backend.local_ba()
            if res is not None:
                ids, opt = res
                for f, p in zip(ids, opt):   # BA refines on top of the
                    updates[int(f)] = p      # relaxed poses: later wins
                culled = self.backend.cull_redundant()
                if culled:
                    self.slam.purge_keyframes(np.asarray(culled))
                    self.num_culled += len(culled)
        self.phase_s["tick_ba"] += _time.perf_counter() - t0
        t0 = _time.perf_counter()
        if updates:
            ids = np.fromiter(updates.keys(), np.int64, len(updates))
            poses = np.stack([updates[int(f)] for f in ids])
            self.num_corrections += self.slam.apply_pose_updates(
                ids, poses, enforce_budget=False)
        self.phase_s["tick_apply"] += _time.perf_counter() - t0

    def _backend_tick(self, resync: bool = True) -> np.ndarray:
        """Keyframe-rate backend work: loop closing every `loop_every`
        keyframes, local BA every `ba_every`; optimised poses flow back to
        the frontend and dense map (the LocalMapping/LoopClosing thread
        cadence, flattened to explicit scheduling). `resync=True`
        (per-frame mode) propagates the optimisation into the frontend
        pose immediately; chunk mode passes False and re-anchors the
        frontend once per chunk from the keyframe chain instead. Returns
        the net world-side delta applied to the frontend pose."""
        D = np.eye(4, dtype=np.float32)
        nkf = self.backend.num_keyframes
        if self.loop_every and nkf % self.loop_every == 0:
            if self.backend.detect_loop() is not None:
                self.num_loops += 1
                T_before = self.backend.keyframes[-1].T_wc.copy()
                ids, opt = self.backend.optimize_graph()
                self.num_corrections += self.slam.apply_pose_updates(ids, opt)
                if resync:
                    D = self._resync_pose(T_before) @ D
        if self.ba_every and nkf >= 2 and nkf % self.ba_every == 0:
            T_before = self.backend.keyframes[-1].T_wc.copy()
            res = self.backend.local_ba()
            if res is not None:
                ids, opt = res
                self.num_corrections += self.slam.apply_pose_updates(ids, opt)
                if resync:
                    D = self._resync_pose(T_before) @ D
                # redundant-keyframe culling on the BA window's
                # covisibility evidence; the culled frames' fused
                # contributions are de-integrated from the dense map
                # (reference: DenseSlam.cpp:417-429)
                culled = self.backend.cull_redundant()
                if culled:
                    self.slam.purge_keyframes(np.asarray(culled))
                    self.num_culled += len(culled)
        return D

    def _resync_pose(self, T_before: np.ndarray) -> None:
        """Propagate the backend's latest keyframe optimisation into the
        frontend estimate (the reference's pose back-channel,
        OrbSLAMDriver.h:120-122) as a WORLD-SIDE DELTA: the frontend may
        be several frames past the keyframe (chunk mode), so overwriting
        its pose with the keyframe pose teleports it backwards by the
        intervening motion — measured 13x ATE blowup on the 540-frame
        drive. T_cur' = T_opt @ T_before^-1 @ T_cur is a no-op when the
        optimiser didn't move the keyframe and reduces to the overwrite
        when the frontend IS at the keyframe (per-frame mode). Returns
        the delta it applied."""
        eye = np.eye(4, dtype=np.float32)
        if not self.backend.keyframes:
            return eye
        last = self.backend.keyframes[-1]
        Tb = np.asarray(T_before, np.float32)
        Tb_inv = eye.copy()
        Tb_inv[:3, :3] = Tb[:3, :3].T
        Tb_inv[:3, 3] = -Tb[:3, :3].T @ Tb[:3, 3]
        delta = np.asarray(last.T_wc, np.float32) @ Tb_inv
        if np.allclose(delta, eye, atol=1e-7):
            return eye
        import os
        if os.environ.get("DSL_DEBUG_RESYNC"):
            t = float(np.linalg.norm(delta[:3, 3]))
            r = float(np.linalg.norm(delta[:3, :3] - np.eye(3)))
            print(f"    resync kf={last.frame_id} |dt|={t:.4f} |dR|={r:.4f}",
                  flush=True)
        fe = self.slam.fe_state
        T_new = jnp.asarray(delta, jnp.float32) @ fe.T_wc
        self.slam.fe_state = fe._replace(T_wc=T_new)
        return delta

    def finish(self) -> None:
        """Sequence end: land in-flight spills, replay every
        still-deferred inactive-submap correction (the finished map must
        carry the full correction history), then decay catch-up
        (reference DecayCatchup)."""
        self.slam.submaps.finalize_spills()
        self.slam.flush_deferred_corrections()
        self.slam.decay_catchup()

    # telemetry passthroughs
    def memory_bytes(self) -> int:
        return self.slam.memory_bytes()

    def trajectory(self):
        return self.slam.trajectory()

    def keyframe_trajectory(self):
        return self.backend.keyframe_poses()
