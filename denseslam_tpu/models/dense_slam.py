"""DenseSLAM pipeline orchestrator — the `DenseSlam` class equivalent
(reference: src/DenseSLAM/DenseSlam.{h,cpp}, call stack SURVEY.md section
3.2), re-architected as a thin host loop over three jitted device programs:

  1. `vo_step`       — sparse stereo odometry (every frame)
  2. `fuse_keyframe` — allocate + integrate + slide-window + decay (keyframe rate)
  3. `raycast`       — previews / ICP model / saved raycast depth

Reference mechanisms carried over, TPU-shaped:
  * fusion-frame database (`mfusionFrameDataBase`, DenseSlam.h:429-433) ->
    fixed-capacity device ring buffer storing depth/gray/pose per fused
    frame, the replay source for de-integration;
  * OnlineCorrection (DenseSlam.cpp:298-432) -> drift scoring of DB entries
    against externally optimised poses, top-k worst de-fused at their fused
    pose and re-fused at the corrected pose;
  * SlideWindowPose (DenseSlam.cpp:284-296) -> ring-buffer overwrite +
    map-block eviction by age;
  * depth post-processing (DenseSlam.cpp:434-552) -> cross-frame
    consistency culling of the incoming depth;
  * submap management (createNewLocalMap / setEstimatedGlobalPose,
    DenseSlam.cpp:133-153) -> SubmapManager over per-submap MapStates.
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SystemConfig
from ..ops import icp as icp_ops
from ..ops import raycast as rc_ops
from ..ops import stereo as stereo_ops
from ..ops import hash as vhash
from ..ops import tsdf as tsdf_ops
from ..utils import lie
from ..utils.image import bilateral_filter_depth, rgb_to_gray
from ..utils.timing import TIMERS
from . import frontend as fe


class FusionDB(NamedTuple):
    """Ring buffer of fused keyframes — the de-fusion replay source.

    The reference stores full RGB+depth per fused keyframe
    (DenseSlam.h:46-60); we do the same with a static capacity. Storage
    is mm-uint16 depth + uint8 gray by default (the reference's own
    int16-mm depth convention, DepthProvider.h:57-98): fusion consumes
    the DEQUANTIZED values, so de-fusion replay stays bit-exact, and the
    DB shrinks ~5x — it rides every chunk-scan dispatch as a donated
    argument, and per-dispatch overhead on the tunneled runtime scales
    with argument bytes (probes/exp_dispatch_overhead.py)."""
    depth: jax.Array     # u16 mm (C, H, W)  (f32 m when not quantized)
    gray: jax.Array      # u8 (C, H, W) — for color re-fusion (f32 ditto)
    T_fused: jax.Array   # f32 (C, 4, 4) pose used at fusion time
    frame_id: jax.Array  # i32 (C,) global frame number, -1 = empty
    valid: jax.Array     # bool (C,)
    head: jax.Array      # i32 () next write slot


def make_fusion_db(cfg: SystemConfig) -> FusionDB:
    c = cfg.pipeline.fusion_db_capacity
    h, w = cfg.rig.intr.height, cfg.rig.intr.width
    quant = cfg.pipeline.fusion_db_quantized
    return FusionDB(
        depth=jnp.zeros((c, h, w), jnp.uint16 if quant else jnp.float32),
        gray=jnp.zeros((c, h, w), jnp.uint8 if quant else jnp.float32),
        T_fused=jnp.tile(jnp.eye(4, dtype=jnp.float32), (c, 1, 1)),
        frame_id=jnp.full((c,), -1, jnp.int32),
        valid=jnp.zeros((c,), bool),
        head=jnp.zeros((), jnp.int32),
    )


def db_quantize_depth(db: FusionDB, depth: jax.Array) -> jax.Array:
    """Depth as fusion must consume it for the DB replay to be exact:
    mm-rounded when the DB stores uint16 (<=0.5 mm change; the reference
    itself fuses int16-mm depth), identity otherwise."""
    if db.depth.dtype == jnp.uint16:
        q = jnp.clip(jnp.round(depth * 1e3), 0, 65535)
        return q.astype(jnp.float32) * 1e-3
    return depth


def db_depth(db: FusionDB, slot) -> jax.Array:
    """Replay-side depth of a DB slot (dequantized)."""
    d = db.depth[slot]
    if d.dtype == jnp.uint16:
        return d.astype(jnp.float32) * 1e-3
    return d


def db_gray(db: FusionDB, slot) -> jax.Array:
    g = db.gray[slot]
    if g.dtype == jnp.uint8:
        return g.astype(jnp.float32)
    return g


def db_push(db: FusionDB, depth, gray, T_wc, frame_id) -> FusionDB:
    i = db.head
    if db.depth.dtype == jnp.uint16:
        depth = jnp.clip(jnp.round(depth * 1e3), 0, 65535).astype(jnp.uint16)
        # pack_gray truncates to int, so u8 truncation replays exactly
        gray = jnp.clip(gray, 0, 255).astype(jnp.uint8)
    return FusionDB(
        depth=db.depth.at[i].set(depth),
        gray=db.gray.at[i].set(gray),
        T_fused=db.T_fused.at[i].set(T_wc),
        frame_id=db.frame_id.at[i].set(frame_id),
        valid=db.valid.at[i].set(True),
        head=(i + 1) % db.depth.shape[0],
    )


# ---------------------------------------------------------------------------
# Depth post-processing (cross-frame consistency culling)
# ---------------------------------------------------------------------------

def depth_postprocess(
    depth_curr: jax.Array,
    T_curr: jax.Array,
    depth_prev: jax.Array,
    T_prev: jax.Array,
    cfg: SystemConfig,
) -> jax.Array:
    """Cull pixels of depth_curr that disagree with the previous fused frame
    (reference: DenseSlam.cpp:434-552 — relative-depth gate, applied to the
    lower `filter_area` fraction of the image where dynamic objects and
    stereo failures concentrate in KITTI)."""
    from ..utils.camera import backproject, project
    from ..utils.image import depth_bilinear_sample

    intr = cfg.rig.intr
    pp = cfg.postprocess
    pts_c = backproject(depth_curr, intr)
    T_rel = lie.inv_T(T_prev) @ T_curr
    pts_p = lie.transform_points(T_rel, pts_c.reshape(-1, 3)).reshape(pts_c.shape)
    uv, z = project(pts_p, intr)
    d_prev, ok = depth_bilinear_sample(depth_prev, uv, max_gap_m=0.3)
    rel = jnp.abs(d_prev - z) / jnp.maximum(z, 1e-3)
    disagree = ok & (z > 0) & (rel > pp.filter_threshold)
    h = depth_curr.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, depth_curr.shape, 0)
    in_area = rows >= jnp.int32(h * (1.0 - pp.filter_area))
    return jnp.where(disagree & in_area, 0.0, depth_curr)


# ---------------------------------------------------------------------------
# Fusion keyframe step (jitted)
# ---------------------------------------------------------------------------

def fuse_keyframe(
    m: tsdf_ops.MapState,
    db: FusionDB,
    depth: jax.Array,
    gray: jax.Array,
    T_wc: jax.Array,
    frame_id: jax.Array,
    cfg: SystemConfig,
) -> Tuple[tsdf_ops.MapState, FusionDB]:
    """allocate -> integrate -> slide-window -> decay, then record in DB.
    Mirrors the fusion tail of ProcessFrame (DenseSlam.cpp:212-228)."""
    intr = cfg.rig.intr
    tc = cfg.tsdf
    if cfg.pipeline.bilateral_filter:
        depth = bilateral_filter_depth(depth)
    # fuse what the DB will replay (mm quantisation — exact de-fusion)
    depth = db_quantize_depth(db, depth)
    color = tsdf_ops.pack_gray(gray) if tc.fuse_color else None
    m, slots, mask = tsdf_ops.allocate_for_frame(m, depth, T_wc, intr, tc)
    m = tsdf_ops.integrate(m, slots, mask, depth, color, T_wc, intr, tc)
    db = db_push(db, depth, gray, T_wc, frame_id)
    if cfg.slide_window.enabled and cfg.decay.enabled:
        # one fused pool pass instead of two (see tsdf.decay_and_slide)
        m = tsdf_ops.decay_and_slide(
            m, cfg.decay.max_decay_weight, cfg.decay.min_decay_age,
            cfg.slide_window.max_age)
    elif cfg.slide_window.enabled:
        m = tsdf_ops.slide_window(m, cfg.slide_window.max_age)
    elif cfg.decay.enabled:
        m = tsdf_ops.decay(m, cfg.decay.max_decay_weight, cfg.decay.min_decay_age)
    m = tsdf_ops.advance_frame(m)
    return m, db


def fuse_sequence(
    m: tsdf_ops.MapState,
    db: FusionDB,
    depths: jax.Array,      # (N, H, W)
    grays: jax.Array,       # (N, H, W)
    T_wcs: jax.Array,       # (N, 4, 4)
    frame_ids: jax.Array,   # (N,)
    cfg: SystemConfig,
) -> Tuple[tsdf_ops.MapState, FusionDB]:
    """Fuse a batch of keyframes in ONE device program (`lax.scan` over the
    frame axis) — the throughput path: per-dispatch overhead amortises over
    the batch and XLA pipelines frames back-to-back on device.

    (A 3-phase variant that hoisted the image gathers out of the scan into
    one vectorized (N, V, 512) sampling stage was tried and measured ~2x
    SLOWER on v5e — the giant intermediates cost more HBM traffic than the
    in-scan gathers save. Keep the simple per-frame body.)"""

    def body(carry, frame):
        m, db = carry
        d, g, T, fid = frame
        m, db = fuse_keyframe(m, db, d, g, T, fid, cfg)
        return (m, db), None

    (m, db), _ = jax.lax.scan(body, (m, db), (depths, grays, T_wcs, frame_ids))
    return m, db


def process_sequence(
    fe_state: "fe.FrontendState",
    m: tsdf_ops.MapState,
    db: FusionDB,
    lefts: jax.Array,       # (N, H, W) gray
    rights: jax.Array,      # (N, H, W)
    frame_ids: jax.Array,   # (N,) i32
    cfg: SystemConfig,
) -> Tuple["fe.FrontendState", tsdf_ops.MapState, FusionDB, dict]:
    """Full-pipeline throughput path: VO + stereo depth + keyframe-gated
    fusion for a frame batch in ONE device program (`lax.scan`).

    This is the fused-scan analogue of the host loop in
    `DenseSLAM.process_frame` (reference: ProcessFrame, DenseSlam.cpp:9-266):
    per-frame host dispatch + scalar readbacks cost ~3-4x the device compute
    at KITTI scale on this runtime, so the linear odometry->fusion path runs
    as one scan. Two-rate machinery (submap spawn, online correction,
    backend feedback) stays host-side between batches — call this with
    modest N (e.g. 8-32) and run corrections between calls.

    Returns (fe_state, map, db, stats) where stats arrays have leading dim N
    (poses, tracking_ok, num_inliers, fused)."""

    def body(carry, inp):
        fe_state, m, db = carry
        l, r, fid = inp
        fe_state, vo = fe.vo_step(fe_state, l, r, cfg)
        is_kf = vo.tracking_ok & (
            jnp.mod(fid, cfg.pipeline.keyframe_every) == 0)

        def fuse(args):
            # dense depth (SGM) is only CONSUMED by fusion, so it lives
            # inside the keyframe branch — at keyframe_every=k the
            # per-frame stereo cost amortises k-fold (the reference
            # likewise only uses its precomputed depth at keyframe rate,
            # DenseSlam.cpp:89-96 early-return)
            m, db = args
            depth, _ = stereo_ops.compute_depth(l, r, cfg.rig, cfg.stereo)
            return fuse_keyframe(m, db, depth, l, vo.T_wc, fid, cfg)

        m, db = jax.lax.cond(is_kf, fuse, lambda args: args, (m, db))
        from .backend import signature_device
        stats = dict(
            T_wc=vo.T_wc,
            tracking_ok=vo.tracking_ok,
            num_inliers=vo.num_inliers,
            fused=is_kf,
            # per-frame features so the host can register EVERY fused
            # keyframe with the backend (not just the chunk's last — the
            # reference's LocalMapping queue sees every keyframe)
            feats_l=fe_state.feats_l,
            feats_r=fe_state.feats_r,
            # retrieval sketch computed ON DEVICE so keyframe
            # registration needs no descriptor readbacks (the sketches
            # ride the chunk's single packed stats fetch)
            sig=signature_device(fe_state.feats_l),
        )
        return (fe_state, m, db), stats

    (fe_state, m, db), stats = jax.lax.scan(
        body, (fe_state, m, db), (lefts, rights, frame_ids))
    return fe_state, m, db, stats


def _virtual_right_features(feats_l, disp: jax.Array):
    """Virtual right-view features from per-feature (virtual) disparity —
    the RGB-D sensor's depth expressed in the backend's stereo currency
    (the rgbd_vo_step trick extended to keyframe registration): BA
    triangulation, loop verification and relocalization all run their
    stereo programs unchanged on RGB-D keyframes."""
    ok = disp > 0.5
    uv_r = feats_l.uv - jnp.stack(
        [jnp.maximum(disp, 0.5), jnp.zeros_like(disp)], axis=-1)
    return feats_l._replace(uv=uv_r, valid=feats_l.valid & ok)


def process_sequence_rgbd(
    fe_state: "fe.FrontendState",
    m: tsdf_ops.MapState,
    db: FusionDB,
    grays: jax.Array,       # (N, H, W) gray
    depths: jax.Array,      # (N, H, W) sensor depth, meters (0 = hole)
    frame_ids: jax.Array,   # (N,) i32
    cfg: SystemConfig,
) -> Tuple["fe.FrontendState", tsdf_ops.MapState, FusionDB, dict]:
    """RGB-D throughput path (reference: Input.h:30-35 RGBD sensor +
    orbTrackRGBD): same one-scan design as `process_sequence`, but motion
    comes from `rgbd_vo_step` (depth-synthesized virtual right views) and
    fusion consumes the SENSOR depth directly — no stereo matcher runs."""

    def body(carry, inp):
        fe_state, m, db = carry
        g, d, fid = inp
        fe_state, vo = fe.rgbd_vo_step(fe_state, g, d, cfg)
        is_kf = vo.tracking_ok & (
            jnp.mod(fid, cfg.pipeline.keyframe_every) == 0)

        def fuse(args):
            m, db = args
            return fuse_keyframe(m, db, d, g, vo.T_wc, fid, cfg)

        m, db = jax.lax.cond(is_kf, fuse, lambda args: args, (m, db))
        from .backend import signature_device
        feats_r = _virtual_right_features(fe_state.feats_l,
                                          fe_state.disp_l)
        stats = dict(
            T_wc=vo.T_wc,
            tracking_ok=vo.tracking_ok,
            num_inliers=vo.num_inliers,
            fused=is_kf,
            feats_l=fe_state.feats_l,
            feats_r=feats_r,
            sig=signature_device(fe_state.feats_l),
        )
        return (fe_state, m, db), stats

    (fe_state, m, db), stats = jax.lax.scan(
        body, (fe_state, m, db), (grays, depths, frame_ids))
    return fe_state, m, db, stats


def process_sequence_mono(
    fe_state: "fe.FrontendState",
    m: tsdf_ops.MapState,
    db: FusionDB,
    grays: jax.Array,       # (N, H, W) gray
    depths: jax.Array,      # (N, H, W) SUPPLIED depth, meters (0 = hole)
    frame_ids: jax.Array,   # (N,) i32
    cfg: SystemConfig,
) -> Tuple["fe.FrontendState", tsdf_ops.MapState, FusionDB, dict]:
    """Monocular throughput path (reference: Input.h:24-28 MONOCULAR +
    orbTrackMonocular, libviso2 viso_mono.h:56-62): motion comes from
    `mono_vo_step` — 8-point RANSAC + ground-plane metric scale, the depth
    maps NEVER feed the estimator — while fusion and the backend currency
    consume the supplied depth (the reference's mono mode likewise fuses
    only precomputed external depth, PrecomputedDepthProvider.cpp:30-68).
    Same one-scan design as `process_sequence`."""
    intr = cfg.rig.intr

    def body(carry, inp):
        fe_state, m, db = carry
        g, d, fid = inp
        fe_state, vo = fe.mono_vo_step(fe_state, g, cfg)
        is_kf = vo.tracking_ok & (
            jnp.mod(fid, cfg.pipeline.keyframe_every) == 0)

        def fuse(args):
            m, db = args
            return fuse_keyframe(m, db, d, g, vo.T_wc, fid, cfg)

        m, db = jax.lax.cond(is_kf, fuse, lambda args: args, (m, db))
        from .backend import signature_device
        # backend currency: virtual disparity sampled from the supplied
        # depth at feature positions (the rgbd trick) — BA triangulation,
        # loop verification and relocalization run their stereo programs
        # unchanged on mono keyframes
        f_l = fe_state.feats_l
        ui = jnp.clip(jnp.round(f_l.uv[:, 0]).astype(jnp.int32), 0,
                      intr.width - 1)
        vi = jnp.clip(jnp.round(f_l.uv[:, 1]).astype(jnp.int32), 0,
                      intr.height - 1)
        z = d.reshape(-1)[vi * intr.width + ui]
        disp = jnp.where(
            f_l.valid & (z > 0.1),
            intr.fx * cfg.rig.baseline_m / jnp.maximum(z, 0.1), -1.0)
        stats = dict(
            T_wc=vo.T_wc,
            tracking_ok=vo.tracking_ok,
            num_inliers=vo.num_inliers,
            fused=is_kf,
            feats_l=f_l,
            feats_r=_virtual_right_features(f_l, disp),
            sig=signature_device(f_l),
        )
        return (fe_state, m, db), stats

    (fe_state, m, db), stats = jax.lax.scan(
        body, (fe_state, m, db), (grays, depths, frame_ids))
    return fe_state, m, db, stats


# ---------------------------------------------------------------------------
# Online correction (jitted)
# ---------------------------------------------------------------------------

def online_correction(
    m: tsdf_ops.MapState,
    db: FusionDB,
    opt_T: jax.Array,        # (C, 4, 4) optimised pose per DB slot
    opt_valid: jax.Array,    # (C,) which slots have an optimised pose
    cfg: SystemConfig,
    key_filter=None,
    tsdf_cfg=None,
) -> Tuple[tsdf_ops.MapState, FusionDB, jax.Array]:
    """De-fuse / re-fuse the worst-drift fused keyframes
    (reference: DenseSlam.cpp:298-432).

    opt_T comes from the backend (BA / pose graph), aligned to DB slots.
    Returns (map, db, num_corrected).

    key_filter / tsdf_cfg: spatial-ownership seam for the sharded map —
    replay is ownership-local (each shard de-fuses / re-fuses only the
    blocks it owns; the drift scoring reads only the replicated DB, so
    every shard agrees on WHICH frames to correct without communication).
    """
    oc = cfg.correction
    intr = cfg.rig.intr
    tc = tsdf_cfg if tsdf_cfg is not None else cfg.tsdf

    err = lie.pose_error_weighted(db.T_fused, opt_T)
    stale = db.valid & opt_valid & (err > oc.min_error)
    n_stale = jnp.sum(stale.astype(jnp.int32))
    do_correct = n_stale >= oc.start_correction_num

    scores = jnp.where(stale & do_correct, err, -1.0)
    _, worst = jax.lax.top_k(scores, oc.correction_num)

    def correct_one(i, carry):
        m, db = carry
        slot = worst[i]
        run = scores[slot] > 0.0

        def apply(ops):
            m, db = ops
            depth = db_depth(db, slot)
            color = tsdf_ops.pack_gray(db_gray(db, slot))
            T_old = db.T_fused[slot]
            T_new = opt_T[slot]
            # DEINTEGRATE at the fused pose (DenseSlam.cpp:390-393)
            m2, s_old, k_old = tsdf_ops.allocate_for_frame(
                m, depth, T_old, intr, tc, key_filter=key_filter)
            m2 = tsdf_ops.deintegrate(m2, s_old, k_old, depth, color, T_old, intr, tc)
            # REINTEGRATE at the optimised pose (DenseSlam.cpp:396-403)
            m2, s_new, k_new = tsdf_ops.allocate_for_frame(
                m2, depth, T_new, intr, tc, key_filter=key_filter)
            m2 = tsdf_ops.integrate(m2, s_new, k_new, depth, color, T_new, intr, tc)
            db2 = db._replace(T_fused=db.T_fused.at[slot].set(T_new))
            return m2, db2

        return jax.lax.cond(run, apply, lambda ops: ops, (m, db))

    m, db = jax.lax.fori_loop(0, oc.correction_num, correct_one, (m, db))
    num = jnp.sum((scores > 0.0).astype(jnp.int32))
    num = jnp.minimum(num, oc.correction_num)

    # Defusion-part GC (reference: the N x SlideWindowMapDefusionPart /
    # DecayDefusionPart calls when correction is on, DenseSlam.cpp:215-225):
    # reclaim blocks the replay emptied and evict stale low-weight leftovers
    # at the pre-correction pose, without waiting for the global age gates.
    def gc(md):
        m, db = md
        if cfg.decay.enabled:
            m = tsdf_ops.decay_defusion_part(m)
        if cfg.slide_window.enabled:
            m = tsdf_ops.slide_window_defusion_part(
                m, cfg.slide_window.max_age)
        return m, db

    m, db = jax.lax.cond(do_correct & (num > 0), gc, lambda md: md, (m, db))
    return m, db, jnp.where(do_correct, num, 0)


def online_correction_delta(m, db, opt_T, opt_valid, cfg,
                            key_filter=None, tsdf_cfg=None):
    """online_correction + a changed-rows mask (S,) computed by direct
    pool comparison — robust to every mutation source (de/re-fusion AND
    the defusion-part GC, which can free stale slots anywhere). Feeds the
    delta respill: after a deferred-correction replay on a restored
    submap, only the changed rows need to re-cross the host boundary
    (the r5 multi-submap drive paid ~10 s of full compacted fetch per
    replay cycle at the tunnel's ~10-20 MB/s)."""
    m2, db2, num = online_correction(m, db, opt_T, opt_valid, cfg,
                                     key_filter=key_filter,
                                     tsdf_cfg=tsdf_cfg)
    # CONTENT changes only: last_seen/alloc_frame stamps flip on every
    # VISIBLE slot of every replayed frame (most of the pool) and are
    # (S,) scalars the delta evict fetches wholesale for ~1 MB — folding
    # them into the row mask made the "delta" ~the whole pool (r5
    # measurement: enforce stayed ~10 s/cycle)
    changed = (
        (m2.table.keys != m.table.keys)
        | jnp.any(m2.tsdf != m.tsdf, axis=-1)
        | jnp.any(m2.weight != m.weight, axis=-1)
        | jnp.any(m2.color != m.color, axis=-1)
    )
    return m2, db2, num, changed


def purge_culled(
    m: tsdf_ops.MapState,
    db: FusionDB,
    culled: jax.Array,       # (C,) bool — keyframes removed by the backend
    cfg: SystemConfig,
    key_filter=None,
    tsdf_cfg=None,
) -> Tuple[tsdf_ops.MapState, FusionDB]:
    """De-fuse DB entries whose keyframe was culled and drop them
    (reference: DenseSlam.cpp:417-429). Processes up to correction_num per
    call (bounded work, like the reference's per-frame budget).
    key_filter / tsdf_cfg: ownership seam (see online_correction)."""
    intr = cfg.rig.intr
    tc = tsdf_cfg if tsdf_cfg is not None else cfg.tsdf
    scores = jnp.where(db.valid & culled, 1.0, -1.0)
    _, idxs = jax.lax.top_k(scores, cfg.correction.correction_num)

    def one(i, carry):
        m, db = carry
        slot = idxs[i]
        run = scores[slot] > 0.0

        def apply(ops):
            m, db = ops
            depth = db_depth(db, slot)
            color = tsdf_ops.pack_gray(db_gray(db, slot))
            T_old = db.T_fused[slot]
            m2, s, k = tsdf_ops.allocate_for_frame(
                m, depth, T_old, intr, tc, key_filter=key_filter)
            m2 = tsdf_ops.deintegrate(m2, s, k, depth, color, T_old, intr, tc)
            db2 = db._replace(
                valid=db.valid.at[slot].set(False),
                frame_id=db.frame_id.at[slot].set(-1),
            )
            return m2, db2

        return jax.lax.cond(run, apply, lambda ops: ops, (m, db))

    return jax.lax.fori_loop(0, cfg.correction.correction_num, one, (m, db))


# ---------------------------------------------------------------------------
# Submap manager (ITMVoxelMapGraphManager / ITMActiveMapManager equivalent)
# ---------------------------------------------------------------------------

def _composite_transform(rc: rc_ops.Raycast, D: jax.Array) -> rc_ops.Raycast:
    """Map a submap render's points/normals through its alignment delta
    (one jitted program — see raycast_composite)."""
    pts = lie.transform_points(
        D, rc.points.reshape(-1, 3)).reshape(rc.points.shape)
    pts = jnp.where(rc.mask[..., None], pts, 0.0)
    nrm = (rc.normals.reshape(-1, 3) @ D[:3, :3].T).reshape(
        rc.normals.shape)
    return rc._replace(points=pts, normals=nrm)


def _composite_merge(best: rc_ops.Raycast, rc: rc_ops.Raycast,
                     D: jax.Array) -> rc_ops.Raycast:
    """Delta-transform `rc` and min-depth merge it into `best`."""
    rc = _composite_transform(rc, D)
    closer = rc.mask & (~best.mask | (rc.depth < best.depth))
    return rc_ops.Raycast(
        depth=jnp.where(closer, rc.depth, best.depth),
        points=jnp.where(closer[..., None], rc.points, best.points),
        normals=jnp.where(closer[..., None], rc.normals, best.normals),
        mask=best.mask | rc.mask,
        color=jnp.where(closer[..., None], rc.color, best.color),
    )


class SubmapManager:
    """Host-side registry of per-submap MapStates with estimated global
    poses (reference surface: createNewLocalMap / setEstimatedGlobalPose /
    getLocalMap / numLocalMaps, SURVEY.md section 2b).

    Each submap carries:
      * its own fusion DB (correction history SURVIVES submap spawns —
        round-1 reset the DB on spawn and lost it),
      * `spawn_poses[i]` — the camera pose at spawn (immutable record),
      * `global_poses[i]` — the CURRENT estimated global anchor pose
        (reference: estimatedGlobalPose), updated by the inter-submap
        pose graph (`optimize_alignment`, the MiniSlamGraphLib role);
        `delta(i) = global_poses[i] @ inv(spawn_poses[i])` is the rigid
        correction applied to the submap's content at composite-render
        time."""

    def __init__(self, cfg: SystemConfig):
        self.cfg = cfg
        self.maps: List[tsdf_ops.MapState] = []
        self.dbs: List[FusionDB] = []
        self.global_poses: List[np.ndarray] = []
        self.spawn_poses: List[np.ndarray] = []
        self.anchor_frames: List[int] = []
        # per-submap deferred corrections for HOST-RESIDENT submaps:
        # frame_id -> latest optimised pose. Replaying every backend tick
        # into a spilled submap would round-trip its ~200 MB pool through
        # the host boundary per tick (measured: the submap drive crawled
        # to 0.4 fps); deferring until restore is exactly equivalent —
        # replay de-fuses at the DB's stored fused pose, so only the
        # LATEST optimised pose per frame matters.
        self.pending_corrections: List[dict] = []
        # clean-restore cache: (host map, host db) kept after a restore so
        # an untouched submap evicts without re-fetching its pool; dirty
        # marks device-side mutations that invalidate it
        self._spill_cache: List[Optional[tuple]] = []
        self.dirty: List[bool] = []
        # delta-respill state: when a device mutation reports its changed
        # rows (mark_dirty(changed_slots=...)), the clean-restore cache is
        # KEPT and only those rows re-cross the boundary at evict
        self._delta_rows: List[Optional[np.ndarray]] = []
        self.num_evictions = 0
        self.num_restores = 0
        self.num_ghost_renders = 0
        self.num_delta_spills = 0
        self.num_async_spills = 0
        self._ghost_cache: dict = {}     # storage-dtype -> jitted builder
        self._spill_threads: dict = {}   # idx -> in-flight spill worker
        self.create_new(np.eye(4, dtype=np.float32), anchor_frame_id=0)

    def create_new(self, T_global: np.ndarray,
                   anchor_frame_id: int = -1,
                   map_state: Optional[tsdf_ops.MapState] = None,
                   async_spill: bool = False,
                   enforce: bool = True) -> int:
        """map_state overrides the fresh pool (sharded mode spawns a
        sharded ACTIVE map instead of a single-chip one). async_spill
        lets the budget-forced demotion of the old active stream under
        the next chunk's scan; enforce=False defers the budget check
        entirely to the caller (the chunked path enforces after its
        backend tick so the spill stream never serializes the tick's
        fetches behind it — measured tick 8 s -> 52 s when it did)."""
        self.maps.append(map_state if map_state is not None
                         else tsdf_ops.make_map(self.cfg.tsdf))
        self.dbs.append(make_fusion_db(self.cfg))
        self.global_poses.append(np.asarray(T_global))
        self.spawn_poses.append(np.asarray(T_global))
        self.anchor_frames.append(int(anchor_frame_id))
        self.pending_corrections.append({})
        self._spill_cache.append(None)
        self.dirty.append(True)
        self._delta_rows.append(None)
        # a spawn is when the device footprint jumps by one pool + DB —
        # the natural memory-pressure checkpoint
        if enforce:
            self.enforce_memory_budget(async_spill=async_spill)
        return len(self.maps) - 1

    def delta(self, idx: int) -> np.ndarray:
        """Rigid correction of submap content: optimised anchor pose
        relative to the spawn-time anchor pose."""
        return np.asarray(
            jnp.asarray(self.global_poses[idx])
            @ lie.inv_T(jnp.asarray(self.spawn_poses[idx])))

    def optimize_alignment(self, anchor_meas: dict,
                           pg_fn=None) -> None:
        """Relax all submap global poses against (a) optimised anchor-pose
        measurements from the backend (`anchor_meas`: submap idx -> 4x4)
        and (b) spawn-chain odometry between consecutive submaps — the
        inter-submap pose graph (reference: MiniSlamGraphLib over local
        maps, CMakeLists.txt:110 / DenseSlam.cpp:133-153). Node 0 is the
        world anchor (fixed); submap i is node i+1."""
        from ..ops import posegraph
        s = len(self.maps)
        if s == 0 or (not anchor_meas and s < 2):
            return
        bc = self.cfg.backend
        g = posegraph.make_graph(bc)
        n = s + 1
        poses = np.stack([np.eye(4, dtype=np.float32)]
                         + [p.astype(np.float32) for p in self.global_poses])
        g = g._replace(
            T_wc=g.T_wc.at[:n].set(jnp.asarray(poses)),
            node_valid=g.node_valid.at[:n].set(True),
        )
        edges = []
        # anchor measurements: world -> submap, strong
        for idx, T in anchor_meas.items():
            edges.append((0, idx + 1, np.asarray(T, np.float32), 5.0))
        # spawn-chain odometry between consecutive submaps — the chain
        # CONTAINS the drift the anchors correct, so it only constrains
        # submaps that have no anchor measurement of their own (its job
        # is to carry corrections to unanchored neighbours, not to pull
        # anchored nodes back toward the drifted spawn chain)
        for i in range(s - 1):
            if i in anchor_meas and (i + 1) in anchor_meas:
                continue
            T_ij = np.asarray(
                lie.inv_T(jnp.asarray(self.spawn_poses[i]))
                @ jnp.asarray(self.spawn_poses[i + 1]))
            edges.append((i + 1, i + 2, T_ij.astype(np.float32), 0.5))
        if not edges:
            return
        e = len(edges)
        g = g._replace(
            edge_i=g.edge_i.at[:e].set(
                jnp.asarray([x[0] for x in edges], jnp.int32)),
            edge_j=g.edge_j.at[:e].set(
                jnp.asarray([x[1] for x in edges], jnp.int32)),
            T_ij=g.T_ij.at[:e].set(
                jnp.asarray(np.stack([x[2] for x in edges]))),
            edge_weight=g.edge_weight.at[:e].set(
                jnp.asarray([x[3] for x in edges], jnp.float32)),
        )
        if pg_fn is None:
            pg_fn = functools.partial(posegraph.optimize, cfg=bc)
        g = pg_fn(g)
        opt = np.asarray(g.T_wc[1:n])
        for i in range(s):
            self.global_poses[i] = opt[i]

    @property
    def num_local_maps(self) -> int:
        return len(self.maps)

    @property
    def active_idx(self) -> int:
        return len(self.maps) - 1

    @property
    def active(self) -> tsdf_ops.MapState:
        return self.maps[-1]

    @active.setter
    def active(self, m: tsdf_ops.MapState) -> None:
        self.maps[-1] = m

    def set_estimated_global_pose(self, idx: int, T: np.ndarray) -> None:
        self.global_poses[idx] = np.asarray(T)

    # -- host spill: the ITMSwappingEngine::SaveToGlobalMemory equivalent
    # (reference: DenseSlam.h:248-251 — evict whole submap volumes to host
    # memory); device HBM is freed, state restorable on demand. The fusion
    # DB travels with its submap (it is the larger array at KITTI res:
    # capacity x HxW x f32 x 2 planes) so eviction actually frees HBM.

    _SPILL_GRAN = 4096          # row-count bucket: bounds executable count

    def _npad(self, n: int, s: int) -> int:
        g = self._SPILL_GRAN
        return min(((max(n, 1) + g - 1) // g) * g, s)

    # jit re-specializes per row-count bucket; _npad bounds the variants
    _gather_rows = staticmethod(jax.jit(tsdf_ops.gather_block_rows))
    _rebuild_rows = staticmethod(jax.jit(tsdf_ops.rebuild_from_rows))

    def finalize_spills(self) -> None:
        """Join any in-flight async spill workers (their map/db swaps are
        content-preserving, so readers racing a swap stay correct; the
        join exists so evict/restore never double-transfer)."""
        for idx, th in list(self._spill_threads.items()):
            th.join()
            del self._spill_threads[idx]

    def evict_to_host_async(self, idx: int) -> bool:
        """Dispatch the compacted spill fetch now and complete the
        transfer on a worker thread, overlapping the ~10-20 MB/s tunnel
        stream with the next chunk's device compute — the reference's
        swapping engine likewise runs on its own CUDA stream
        (ITMSwappingEngine, DenseSlam.h:248-251). Falls back to the sync
        paths when they are already cheap (clean cache, delta rows).
        Returns True when a worker was started."""
        import threading
        if idx in self._spill_threads:
            return True
        if self.is_on_host(idx):
            return False
        if self._spill_cache[idx] is not None:   # free or delta evict
            self.evict_to_host(idx)
            return False
        m = self.maps[idx]
        db = self.dbs[idx]
        s = m.num_slots
        keys = np.asarray(m.table.keys)          # small (S,) fetch
        slots = np.flatnonzero(keys != vhash.EMPTY_KEY).astype(np.int32)
        n = int(slots.size)
        npad = self._npad(n, s)
        if npad >= s:
            self.evict_to_host(idx)
            return False
        pad_slots = np.zeros((npad,), np.int32)
        pad_slots[:n] = slots
        rows = self._gather_rows(m, jnp.asarray(pad_slots))  # async dispatch
        payload = rows + (m.frame, m.decayed_blocks, m.overflow, db)

        def work():
            fetched = jax.device_get(payload)
            (keys_r, tsdf_r, w_r, c_r, af_r, ls_r,
             fr, dec, ovf, db_h) = fetched
            full = tsdf_ops.MapState(
                table=vhash.HashTable(
                    keys=np.full((s,), vhash.EMPTY_KEY, np.int32)),
                tsdf=np.ones((s,) + m.tsdf.shape[1:], tsdf_r.dtype),
                weight=np.zeros((s,) + m.weight.shape[1:], w_r.dtype),
                color=np.zeros((s,) + m.color.shape[1:], np.int32),
                alloc_frame=np.zeros((s,), np.int32),
                last_seen=np.zeros((s,), np.int32),
                frame=np.asarray(fr), decayed_blocks=np.asarray(dec),
                overflow=np.asarray(ovf),
            )
            full.table.keys[slots] = keys_r[:n]
            full.tsdf[slots] = tsdf_r[:n]
            full.weight[slots] = w_r[:n]
            full.color[slots] = c_r[:n]
            full.alloc_frame[slots] = af_r[:n]
            full.last_seen[slots] = ls_r[:n]
            # content-preserving swap (device copy -> exact host copy)
            self.maps[idx] = full
            self.dbs[idx] = db_h
            self._spill_cache[idx] = None
            self._delta_rows[idx] = None

        th = threading.Thread(target=work, daemon=True)
        th.start()
        self._spill_threads[idx] = th
        self.num_evictions += 1
        self.num_async_spills += 1
        return True

    def evict_to_host(self, idx: int) -> None:
        if idx in self._spill_threads:
            self._spill_threads.pop(idx).join()
        if self.is_on_host(idx):
            return
        if not self.dirty[idx] and self._spill_cache[idx] is not None:
            # the device copy is an untouched restore (eval-only render):
            # the host copy is still exact — drop the device arrays free
            self.maps[idx], self.dbs[idx] = self._spill_cache[idx]
            self._spill_cache[idx] = None
            self.num_evictions += 1
            return
        if (self.dirty[idx] and self._spill_cache[idx] is not None
                and self._delta_rows[idx] is not None):
            self._evict_delta(idx)
            return
        # fall through: full compacted spill (unknown mutation extent)
        m = self.maps[idx]
        s = m.num_slots
        keys = np.asarray(m.table.keys)
        slots = np.flatnonzero(keys != vhash.EMPTY_KEY).astype(np.int32)
        n = int(slots.size)
        npad = self._npad(n, s)
        if npad < s:
            # valid-block compaction: cross the host boundary with only
            # the allocated rows (reference block-granular swapping,
            # DenseSlam.h:248-251); the host copy is re-expanded to the
            # ordinary full numpy MapState so every downstream consumer
            # (checkpoint, replay, telemetry) is format-agnostic
            pad_slots = np.zeros((npad,), np.int32)
            pad_slots[:n] = slots
            rows = jax.device_get(
                self._gather_rows(m, jnp.asarray(pad_slots))
                + (m.frame, m.decayed_blocks, m.overflow))
            keys_r, tsdf_r, w_r, c_r, af_r, ls_r, fr, dec, ovf = rows
            full = tsdf_ops.MapState(
                table=vhash.HashTable(
                    keys=np.full((s,), vhash.EMPTY_KEY, np.int32)),
                tsdf=np.ones((s,) + m.tsdf.shape[1:], tsdf_r.dtype),
                weight=np.zeros((s,) + m.weight.shape[1:], w_r.dtype),
                color=np.zeros((s,) + m.color.shape[1:], np.int32),
                alloc_frame=np.zeros((s,), np.int32),
                last_seen=np.zeros((s,), np.int32),
                frame=np.asarray(fr), decayed_blocks=np.asarray(dec),
                overflow=np.asarray(ovf),
            )
            full.table.keys[slots] = keys_r[:n]
            full.tsdf[slots] = tsdf_r[:n]
            full.weight[slots] = w_r[:n]
            full.color[slots] = c_r[:n]
            full.alloc_frame[slots] = af_r[:n]
            full.last_seen[slots] = ls_r[:n]
            self.maps[idx] = full
        else:
            self.maps[idx] = jax.tree.map(np.asarray, m)
        self.dbs[idx] = jax.tree.map(np.asarray, self.dbs[idx])
        self._spill_cache[idx] = None
        self.num_evictions += 1

    def _evict_delta(self, idx: int) -> None:
        """Evict a device-resident submap whose mutations since restore
        are fully described by _delta_rows: fetch ONLY those pool rows
        (plus the small DB pose/validity fields — replay never touches
        the stored depth/gray frames) and merge them into the still-valid
        host cache. The merge copies the host planes before writing so a
        checkpoint holding the old arrays stays intact."""
        slots = np.asarray(self._delta_rows[idx], np.int32)
        m = self.maps[idx]
        db = self.dbs[idx]
        host_m, host_db = self._spill_cache[idx]
        if slots.size:
            s = m.num_slots
            npad = self._npad(int(slots.size), s)
            pad_slots = np.zeros((npad,), np.int32)
            pad_slots[: slots.size] = slots
            # content rows by delta; the (S,) stamp planes wholesale
            # (~1 MB — they change on every visible slot per replayed
            # frame, far more rows than the content delta)
            fetched = jax.device_get(
                self._gather_rows(m, jnp.asarray(pad_slots))
                + (m.alloc_frame, m.last_seen,
                   m.frame, m.decayed_blocks, m.overflow,
                   db.T_fused, db.frame_id, db.valid, db.head))
            (keys_r, tsdf_r, w_r, c_r, _af_r, _ls_r,
             af_full, ls_full,
             fr, dec, ovf, dbT, dbf, dbv, dbh) = fetched
            n = int(slots.size)

            def merge(plane, rows):
                out = np.array(plane)          # copy-on-write semantics
                out[slots] = rows[:n]
                return out

            merged = tsdf_ops.MapState(
                table=vhash.HashTable(
                    keys=merge(host_m.table.keys, keys_r)),
                tsdf=merge(host_m.tsdf, tsdf_r),
                weight=merge(host_m.weight, w_r),
                color=merge(host_m.color, c_r),
                alloc_frame=np.asarray(af_full),
                last_seen=np.asarray(ls_full),
                frame=np.asarray(fr), decayed_blocks=np.asarray(dec),
                overflow=np.asarray(ovf),
            )
            self.maps[idx] = merged
            self.dbs[idx] = host_db._replace(
                T_fused=np.asarray(dbT), frame_id=np.asarray(dbf),
                valid=np.asarray(dbv), head=np.asarray(dbh))
            self.num_delta_spills += 1
        else:
            self.maps[idx], self.dbs[idx] = host_m, host_db
        self._spill_cache[idx] = None
        self._delta_rows[idx] = None
        self.num_evictions += 1

    def restore_to_device(self, idx: int) -> None:
        if idx in self._spill_threads:
            self._spill_threads.pop(idx).join()
        if not self.is_on_host(idx):
            return
        m = self.maps[idx]          # full numpy MapState
        host_copy = (m, self.dbs[idx])
        s = m.tsdf.shape[0]
        keys = np.asarray(m.table.keys)
        slots = np.flatnonzero(keys != vhash.EMPTY_KEY).astype(np.int32)
        n = int(slots.size)
        npad = self._npad(n, s)
        if npad < s:
            inv = np.full((s,), npad, np.int32)   # npad = sentinel row
            inv[slots] = np.arange(n, dtype=np.int32)

            def pad_rows(a, fill):
                out = np.full((npad,) + a.shape[1:], fill, a.dtype)
                out[:n] = a[slots]
                return out

            dev = self._rebuild_rows(
                jnp.asarray(inv),
                jnp.asarray(pad_rows(keys, vhash.EMPTY_KEY)),
                jnp.asarray(pad_rows(m.tsdf, 1)),
                jnp.asarray(pad_rows(m.weight, 0)),
                jnp.asarray(pad_rows(m.color, 0)),
                jnp.asarray(pad_rows(m.alloc_frame, 0)),
                jnp.asarray(pad_rows(m.last_seen, 0)),
                jnp.asarray(m.frame), jnp.asarray(m.decayed_blocks),
                jnp.asarray(m.overflow))
            self.maps[idx] = dev
        else:
            self.maps[idx] = jax.tree.map(jnp.asarray, m)
        self.dbs[idx] = jax.tree.map(jnp.asarray, self.dbs[idx])
        # keep the host copy: if nothing dirties the device copy, the
        # next evict is free (composite-eval restore-render-evict cycles)
        self._spill_cache[idx] = host_copy
        self.dirty[idx] = False
        self.num_restores += 1

    def mark_dirty(self, idx: int,
                   changed_slots: Optional[np.ndarray] = None) -> None:
        """Device-side content changed; the spill cache is stale — unless
        the caller names exactly WHICH rows changed (changed_slots), in
        which case the host cache stays valid for every other row and the
        next evict only fetches the delta (a deferred-correction replay
        touches a few frames' frusta; full compacted respills were ~10 s
        each over the tunnel on the r5 multi-submap drive)."""
        self.dirty[idx] = True
        if changed_slots is not None and self._spill_cache[idx] is not None:
            prev = self._delta_rows[idx]
            self._delta_rows[idx] = (changed_slots if prev is None
                                     else np.union1d(prev, changed_slots))
            return
        self._spill_cache[idx] = None
        self._delta_rows[idx] = None

    # -- render-only ghost restore -----------------------------------------

    def _ghost_build_fn(self, sd):
        """Per-storage-dtype jitted builder for ghost render states."""
        key = str(sd)
        fn = self._ghost_cache.get(key)
        if fn is None:
            @jax.jit
            def build(inv, keys_full, tsdf_r, w_r, frame):
                s = inv.shape[0]
                tsdf_p = jnp.concatenate(
                    [tsdf_r.astype(sd),
                     jnp.ones((1, tsdf_ops.BLOCK_VOL), sd)])
                w_p = jnp.concatenate(
                    [w_r.astype(sd),
                     jnp.zeros((1, tsdf_ops.BLOCK_VOL), sd)])
                return tsdf_ops.MapState(
                    table=vhash.HashTable(keys=keys_full),
                    tsdf=tsdf_p[inv],
                    weight=w_p[inv],
                    color=jnp.zeros((s, tsdf_ops.BLOCK_VOL), jnp.int32),
                    alloc_frame=jnp.zeros((s,), jnp.int32),
                    last_seen=jnp.zeros((s,), jnp.int32),
                    frame=jnp.asarray(frame, jnp.int32),
                    decayed_blocks=jnp.zeros((), jnp.int32),
                    overflow=jnp.zeros((), jnp.int32),
                )

            fn = self._ghost_cache[key] = build
        return fn

    def ghost_render_state(self, idx: int,
                           slots: np.ndarray) -> tsdf_ops.MapState:
        """Transient render-only device state of a HOST-resident submap,
        streaming ONLY the given block rows — the swapping engine's
        visible-block streaming, specialised for composite eval renders
        (reference: ITMSwappingEngine moves visible blocks, not pools;
        DenseSlam.h:248-251). A full restore uploads every allocated row
        in full precision plus the fusion DB (~130 MB/submap mid-drive,
        5-12 s per eval frame over the tunneled runtime, r5 measurement);
        a ghost uploads the in-view rows as f16 tsdf + u8 weight and the
        full key array (probe chains must stay intact — dropping keys
        would orphan surviving keys whose open-addressing path crosses
        them), ~15x less traffic. The splat renderer reads weight only as
        an observed mask (w > 0), which u8-ceil preserves exactly; color
        reads as zeros, so ghosts serve depth eval, not color previews.
        The host copy stays authoritative: nothing is marked resident,
        dirty, or budget-relevant."""
        m = self.maps[idx]
        s = m.tsdf.shape[0]
        n = int(slots.size)
        npad = self._npad(n, s)
        pad_slots = np.zeros((npad,), np.int32)
        pad_slots[:n] = slots
        inv = np.full((s,), npad, np.int32)
        inv[slots] = np.arange(n, dtype=np.int32)
        tsdf_r = np.asarray(m.tsdf[pad_slots], np.float32).astype(np.float16)
        w_r = np.ceil(np.clip(np.asarray(m.weight[pad_slots], np.float32),
                              0, 255)).astype(np.uint8)
        sd = jnp.asarray(m.tsdf[:1, :1]).dtype   # storage dtype
        return self._ghost_build_fn(sd)(
            jnp.asarray(inv), jnp.asarray(m.table.keys),
            jnp.asarray(tsdf_r), jnp.asarray(w_r),
            jnp.asarray(m.frame, jnp.int32))

    def is_on_host(self, idx: int) -> bool:
        return isinstance(self.maps[idx].tsdf, np.ndarray)

    # -- memory-budget policy (what actually CALLS the swapping engine) ----

    @staticmethod
    def _tree_nbytes(tree) -> int:
        return sum(int(np.prod(x.shape)) * x.dtype.itemsize
                   for x in jax.tree.leaves(tree))

    def submap_device_bytes(self, idx: int) -> int:
        """True HBM footprint of one submap: voxel pool + hash table +
        fusion DB (all fixed-shape, fully allocated — unlike the
        used-block accounting of `local_map_size`, which mirrors the
        reference's ITMVoxel bookkeeping, this is what the device
        actually holds)."""
        if self.is_on_host(idx):
            return 0
        return (self._tree_nbytes(self.maps[idx])
                + self._tree_nbytes(self.dbs[idx]))

    def device_memory_bytes(self) -> int:
        return sum(self.submap_device_bytes(i)
                   for i in range(len(self.maps)))

    def committed_memory_bytes(self) -> int:
        """Device bytes that would COST something to reclaim: the active
        submap plus DIRTY residents. A clean resident (untouched since
        restore) evicts for free via the spill cache — it is a
        reclaimable cache page, not committed memory."""
        total = 0
        for i in range(len(self.maps)):
            if self.is_on_host(i):
                continue
            if i == len(self.maps) - 1 or self.dirty[i]:
                total += self.submap_device_bytes(i)
        return total

    def enforce_memory_budget(self, async_spill: bool = False) -> List[int]:
        """Spill the oldest non-active DIRTY device-resident submaps until
        committed bytes fit `pipeline.map_memory_budget_mb` (<0 =
        unbounded). The active submap is never evicted (it is being fused
        into every keyframe). CLEAN residents don't count against the
        budget and are left resident as a render cache — re-spilling them
        per eval frame re-uploaded ~200-300 MB of pools per composite
        (the round-3 multi-submap drive crawled at 0.4-1.6 fps on exactly
        that); they are dropped for free only when a correction dirties
        them or an explicit drop_clean_cache() call reclaims HBM.
        Returns the indices evicted."""
        budget_mb = self.cfg.pipeline.map_memory_budget_mb
        if budget_mb < 0 or len(self.maps) < 2:
            return []
        budget = int(budget_mb * 1e6)
        evicted: List[int] = []
        for idx in range(len(self.maps) - 1):        # oldest first
            if self.committed_memory_bytes() <= budget:
                break
            # only dirty residents count against the budget, so only
            # they can bring it down. async_spill (the spawn path)
            # dispatches the fetch and streams it under the next chunk's
            # scan; in-flight submaps still count as resident, so the
            # loop won't re-evict them
            if not self.is_on_host(idx) and self.dirty[idx]:
                if async_spill:
                    self.evict_to_host_async(idx)
                else:
                    self.evict_to_host(idx)
                evicted.append(idx)
                if async_spill:
                    break   # bytes free only at join; avoid over-evicting
        # The budget is a HARD cap on real HBM, not just on committed
        # bytes: clean render-cache residents are free to keep only while
        # TRUE footprint has headroom. After an eval burst restores many
        # submaps (raycast_composite(respill=False)), drop clean caches
        # oldest-first (a no-cost evict via the spill cache) until the
        # device fits the budget again.
        if self.device_memory_bytes() > budget:
            for idx in range(len(self.maps) - 1):
                if self.device_memory_bytes() <= budget:
                    break
                if (not self.is_on_host(idx) and not self.dirty[idx]
                        and self._spill_cache[idx] is not None):
                    self.evict_to_host(idx)
                    evicted.append(idx)
        return evicted

    def drop_clean_cache(self) -> int:
        """Free every clean resident submap's device copy (a no-cost
        evict). Call under real HBM pressure. Returns count dropped."""
        n = 0
        for idx in range(len(self.maps) - 1):
            if (not self.is_on_host(idx) and not self.dirty[idx]
                    and self._spill_cache[idx] is not None):
                self.evict_to_host(idx)
                n += 1
        return n

    @property
    def num_active_local_maps(self) -> int:
        """Device-resident submap count (reference:
        ITMActiveMapManager::numActiveLocalMaps, InfiniTamDriver.h:263-265)."""
        return sum(1 for i in range(len(self.maps)) if not self.is_on_host(i))

    def local_map_size(self, idx: int) -> int:
        if self.is_on_host(idx):   # count on host; don't round-trip HBM
            return int(np.asarray(self.maps[idx].table.valid).sum())
        return int(tsdf_ops.num_allocated_blocks(self.maps[idx]))

    def should_start_new(self, visible_blocks: int,
                         threshold: float,
                         size: Optional[int] = None) -> bool:
        """reference: DenseSlam.cpp:554-565 — new submap when the visible
        fraction of the primary map drops below threshold (threshold < 0
        disables, the reference's default). Pass `size` when the caller
        already fetched the allocated-block count (the chunked path packs
        it with the visible count into one readback)."""
        if threshold < 0:
            return False
        if size is None:
            size = self.local_map_size(self.active_idx)
        if size == 0:
            return False
        return visible_blocks / size < threshold


# ---------------------------------------------------------------------------
# The orchestrator
# ---------------------------------------------------------------------------

class DenseSLAM:
    """Host-side pipeline: thin loop over jitted device programs.

    Pass `mesh` (a jax.sharding.Mesh over the `map` axis) to run the dense
    map SHARDED across devices: fusion, raycast, online correction and
    culled-frame purge all go through the SPMD programs in
    parallel/sharded_map.py (ownership-partitioned block table, pmin
    raycast combine, ownership-local de-fusion replay)."""

    def __init__(self, cfg: SystemConfig, seed: int = 0, mesh=None):
        self.cfg = cfg
        if cfg.correction.enabled and cfg.tsdf.storage_dtype == "bfloat16":
            import warnings
            warnings.warn(
                "online correction replays de-integration against a "
                "bfloat16-quantised map: the de-fuse/re-fuse inverse is "
                "approximate (~1/256 tsdf error per correction) instead of "
                "exact. Use float32 storage when correction fidelity "
                "matters.", stacklevel=2)
        self.fe_state = fe.init_frontend(cfg, seed=seed)
        self.submaps = SubmapManager(cfg)
        self._sharded = None
        if mesh is not None:
            from ..parallel.sharded_map import ShardedTsdf
            self._sharded = ShardedTsdf(cfg, mesh)
            self.submaps.maps[0] = self._sharded.make_map()
        self.frame = 0
        self.current_keyframes = 0
        self.pose_history: List[Tuple[int, np.ndarray]] = []
        self.last_fused_depth: Optional[jax.Array] = None
        self.last_fused_T: Optional[jax.Array] = None
        self.fusion_ms: List[float] = []
        # (uv_prev, uv_curr, valid) of the last VO step's matches — device
        # arrays kept for the GUI scene-flow pane (fetched only when a
        # viewer renders it); reference: VisoSparseSFProvider::GetFlow
        self.last_flow: Optional[Tuple[jax.Array, jax.Array, jax.Array]] = None

        self._vo = jax.jit(functools.partial(fe.vo_step, cfg=cfg))
        self._mono_vo = jax.jit(functools.partial(fe.mono_vo_step, cfg=cfg))
        self._rgbd_vo = jax.jit(functools.partial(fe.rgbd_vo_step, cfg=cfg))
        self._fuse = jax.jit(functools.partial(fuse_keyframe, cfg=cfg))
        self._stereo = jax.jit(
            functools.partial(stereo_ops.compute_depth, rig=cfg.rig, cfg=cfg.stereo)
        )
        if cfg.pipeline.renderer == "splat":
            from ..ops import splat as splat_ops
            sc = splat_ops.SplatConfig(
                max_blocks=cfg.splat.max_blocks,
                max_voxels=cfg.splat.max_voxels,
                surface_eta=cfg.splat.surface_eta,
                z_bits=cfg.splat.z_bits,
                fill_levels=cfg.splat.fill_levels,
                bleed_rel=cfg.splat.bleed_rel,
                bleed_abs=cfg.splat.bleed_abs,
            )
            refine = cfg.pipeline.splat_refine
            prune = cfg.pipeline.splat_prune_sdf

            def _splat(m, T_wc):
                rc = splat_ops.splat_render(m, T_wc, cfg.rig.intr, cfg.tsdf,
                                            sc)
                if refine > 0:
                    d = splat_ops.refine_depth(
                        m, rc.depth, rc.mask, T_wc, cfg.rig.intr, cfg.tsdf,
                        steps=refine, prune_sdf=prune)
                    rc = rc._replace(mask=d > 0)
                    rc = _regeom(rc, d, T_wc)
                return rc

            def _regeom(rc, depth, T_wc):
                # recompute points/normals from the refined depth image
                h, w = depth.shape
                vv = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
                uu = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
                cx = (uu - cfg.rig.intr.cx) / cfg.rig.intr.fx * depth
                cy = (vv - cfg.rig.intr.cy) / cfg.rig.intr.fy * depth
                R = T_wc[:3, :3]
                t = T_wc[:3, 3]
                px = R[0, 0] * cx + R[0, 1] * cy + R[0, 2] * depth + t[0]
                py = R[1, 0] * cx + R[1, 1] * cy + R[1, 2] * depth + t[1]
                pz = R[2, 0] * cx + R[2, 1] * cy + R[2, 2] * depth + t[2]
                z0 = jnp.zeros_like(px)
                px = jnp.where(rc.mask, px, z0)
                py = jnp.where(rc.mask, py, z0)
                pz = jnp.where(rc.mask, pz, z0)
                nx, ny, nz, _ = rc_ops._normals_soA(px, py, pz, rc.mask)
                return rc._replace(
                    depth=depth,
                    points=jnp.stack([px, py, pz], axis=-1),
                    normals=jnp.stack([nx, ny, nz], axis=-1),
                )

            self._raycast = jax.jit(_splat)
        else:
            self._raycast = jax.jit(
                functools.partial(rc_ops.raycast, intr=cfg.rig.intr,
                                  cfg=cfg.tsdf)
            )
        from ..ops import posegraph as pg_ops
        self._pg_submaps = jax.jit(
            functools.partial(pg_ops.optimize, cfg=cfg.backend))
        self._postproc = jax.jit(functools.partial(depth_postprocess, cfg=cfg))
        self._correct = jax.jit(functools.partial(online_correction, cfg=cfg))
        # delta variant for deferred-correction replay on restored submaps
        # (returns the changed-rows mask the delta respill needs)
        self._correct_delta = jax.jit(
            functools.partial(online_correction_delta, cfg=cfg))
        self._purge = jax.jit(functools.partial(purge_culled, cfg=cfg))
        self._composite_first = jax.jit(_composite_transform)
        self._composite_merge = jax.jit(_composite_merge)
        self._icp = jax.jit(
            functools.partial(icp_ops.track, intr=cfg.rig.intr)
        )
        # spawn-policy scalars (visible blocks + allocated blocks) in one
        # program + one packed fetch: eager jnp ops here were ~4 dispatches
        # plus two scalar readbacks per chunk on the tunneled runtime
        self._spawn_stats = jax.jit(lambda m: (
            jnp.sum((m.last_seen == (m.frame - 1)) & m.table.valid),
            tsdf_ops.num_allocated_blocks(m)))
        # telemetry packers: the host needs a handful of scalars every
        # frame (tracking_ok before the fusion decision; pose + block
        # count for history/accounting). On the tunneled runtime EACH
        # scalar readback costs a full fetch RTT (~27 ms), so the
        # per-frame path packs them into two single-fetch vectors
        # instead of 6 separate int()/bool()/np.asarray() pulls.
        self._pack3 = jax.jit(lambda a, b, c: jnp.stack(
            [a.astype(jnp.float32), b.astype(jnp.float32),
             c.astype(jnp.float32)]))
        self._pack_pose_nb = jax.jit(lambda T, m: jnp.concatenate(
            [T.reshape(-1).astype(jnp.float32),
             tsdf_ops.num_allocated_blocks(m).astype(jnp.float32)[None]]))

    # -- fusion DB: lives with the ACTIVE submap (correction history
    # survives submap spawns; round-1 reset it and lost the history) ------

    @property
    def db(self) -> FusionDB:
        return self.submaps.dbs[self.submaps.active_idx]

    @db.setter
    def db(self, value: FusionDB) -> None:
        self.submaps.dbs[self.submaps.active_idx] = value

    # -- per-frame ---------------------------------------------------------

    def process_frame(
        self,
        left: jax.Array,
        right: Optional[jax.Array] = None,
        depth: Optional[jax.Array] = None,
        timestamp: Optional[float] = None,
        pose_override: Optional[jax.Array] = None,
        budget_scale: float = 1.0,
    ) -> dict:
        """Process one stereo (or RGB-D) frame. Returns telemetry dict.

        Mirrors ProcessFrame's stages (SURVEY.md section 3.2): odometry every
        frame, fusion at keyframe rate, optional depth post-processing.
        pose_override injects an external pose (the reference's
        SetPoseLocalMap path, InfiniTamDriver.h:173-178) and skips odometry.
        budget_scale is the PD controller's RANSAC-budget knob (a device
        scalar — no recompile when it changes).
        """
        import time as _time

        cfg = self.cfg
        if left.ndim == 3:
            left = rgb_to_gray(left)
        if right is not None and right.ndim == 3:
            right = rgb_to_gray(right)

        TIMERS.tic("frontend")
        if pose_override is not None:
            T_wc = jnp.asarray(pose_override)
            self.fe_state = self.fe_state._replace(T_wc=T_wc)
            tracking_ok = True
            vo_stats = {}
        elif cfg.pipeline.sensor == "mono":
            # Monocular mode (reference: Input.h:30-35 MONOCULAR +
            # OrbSLAMDriver::orbTrackMonocular): pose from mono VO with
            # ground-plane scale; dense fusion only when depth is supplied.
            self.fe_state, vo = self._mono_vo(self.fe_state, left)
            T_wc = vo.T_wc
            self.last_flow = (vo.flow_uv_prev, vo.flow_uv_curr, vo.flow_valid)
            s = np.asarray(self._pack3(
                vo.tracking_ok, vo.num_inliers, vo.num_quads))
            tracking_ok = bool(s[0])
            vo_stats = dict(num_inliers=int(s[1]), num_quads=int(s[2]))
        elif cfg.pipeline.sensor == "rgbd" and cfg.pipeline.use_external_odometry:
            # RGB-D mode (reference: orbTrackRGBD): feature VO with depth
            # synthesising virtual right-view observations (rgbd_vo_step)
            if depth is None:
                raise ValueError("rgbd VO needs a depth image")
            self.fe_state, vo = self._rgbd_vo(self.fe_state, left, depth)
            T_wc = vo.T_wc
            self.last_flow = (vo.flow_uv_prev, vo.flow_uv_curr, vo.flow_valid)
            s = np.asarray(self._pack3(
                vo.tracking_ok, vo.num_inliers, vo.num_quads))
            tracking_ok = bool(s[0])
            vo_stats = dict(num_inliers=int(s[1]), num_quads=int(s[2]))
        elif cfg.pipeline.use_external_odometry:
            if right is None:
                raise ValueError("stereo VO needs a right image")
            self.fe_state, vo = self._vo(
                self.fe_state, left, right,
                budget_scale=jnp.float32(budget_scale))
            T_wc = vo.T_wc
            self.last_flow = (vo.flow_uv_prev, vo.flow_uv_curr, vo.flow_valid)
            s = np.asarray(self._pack3(
                vo.tracking_ok, vo.num_inliers, vo.num_quads))
            tracking_ok = bool(s[0])
            vo_stats = dict(num_inliers=int(s[1]), num_quads=int(s[2]))
        else:
            # internal odometry: ICP against the raycast of the active map
            T_prev = (
                self.last_fused_T
                if self.last_fused_T is not None
                else jnp.eye(4, dtype=jnp.float32)
            )
            if depth is None:
                if right is None:
                    raise ValueError("need depth or a right image")
                depth, _ = self._stereo(left, right)
            if self.frame == 0:
                T_wc, tracking_ok, vo_stats = T_prev, True, {}
            else:
                rc = self._raycast(self.submaps.active, T_prev)
                res = self._icp(depth, rc.points, rc.normals, rc.mask, T_prev, T_prev)
                T_wc = res.T_wc
                s = np.asarray(self._pack3(
                    res.converged, res.rmse, res.rmse))
                tracking_ok = bool(s[0])
                vo_stats = dict(icp_rmse=float(s[1]))
        TIMERS.toc("frontend", sync=T_wc)

        if depth is None and right is not None:
            TIMERS.tic("stereo_depth")
            depth, _ = self._stereo(left, right)
            TIMERS.toc("stereo_depth", sync=depth)

        fused = False
        is_keyframe = (
            depth is not None
            and tracking_ok
            and self.frame % cfg.pipeline.keyframe_every == 0
        )
        if is_keyframe:
            if cfg.postprocess.enabled and self.last_fused_depth is not None:
                depth = self._postproc(
                    depth, T_wc, self.last_fused_depth, self.last_fused_T
                )
            t0 = _time.perf_counter()
            TIMERS.tic("fusion")
            if self._sharded is not None:
                # fuse the mm-quantized depth so the DB replay is exact
                if self.db.depth.dtype == jnp.uint16:
                    depth = jax.jit(lambda d: jnp.clip(
                        jnp.round(d * 1e3), 0, 65535).astype(jnp.float32)
                        * 1e-3)(depth)
                m = self._sharded.fuse(self.submaps.active, depth, left,
                                       T_wc)
                self.db = jax.jit(db_push)(self.db, depth, left, T_wc,
                                           jnp.int32(self.frame))
            else:
                m, self.db = self._fuse(
                    self.submaps.active, self.db, depth, left, T_wc,
                    jnp.int32(self.frame),
                )
            self.submaps.active = m
            TIMERS.toc("fusion", sync=m.tsdf)
            self.fusion_ms.append((_time.perf_counter() - t0) * 1000.0)
            self.last_fused_depth = depth
            self.last_fused_T = T_wc
            self.current_keyframes += 1
            fused = True

            self.maybe_spawn_submap(T_wc)

        # pose + block count in ONE fetch (see _pack_pose_nb note)
        pose_nb = np.asarray(self._pack_pose_nb(T_wc, self.submaps.active))
        return self._finish_frame_record(pose_nb, fused, tracking_ok,
                                         vo_stats)

    def maybe_spawn_submap(self, T_wc, defer_enforce: bool = False) -> bool:
        """New-submap policy (reference: shouldStartNewLocalMap +
        createNewLocalMap, DenseSlam.cpp:133-148, 554-571): spawn when the
        current frame's visible fraction of the active map is low. The
        per-frame path checks after every fused keyframe; the production
        chunked path checks once per chunk (SLAMSystem.process_chunk) —
        the two-rate cadence the reference's map management runs at.
        Spawning trips the memory-budget policy (a new pool + DB is
        exactly when the device footprint jumps). Returns True if a new
        submap was started."""
        cfg = self.cfg
        thr = cfg.pipeline.new_submap_threshold
        if thr < 0:
            return False
        visible, size = (int(x) for x in jax.device_get(
            self._spawn_stats(self.submaps.active)))
        if not self.submaps.should_start_new(visible, thr, size=size):
            return False
        # the old submap keeps its fusion DB (its correction history
        # stays replayable); the new one starts fresh
        if self._sharded is not None:
            # sharded mode shards the ACTIVE map only: demote the old
            # active to a probe-consistent single-chip submap that starts
            # life HOST-SPILLED (its deferred-correction replay is already
            # ownership-agnostic), and spawn a fresh SHARDED active map —
            # composing the multi-local-map machinery
            # (createNewLocalMap/estimatedGlobalPose,
            # reference: DenseSlam.cpp:133-148) with the distribution axis
            old_idx = self.submaps.active_idx
            self.submaps.maps[old_idx] = self._sharded.gather_to_single(
                self.submaps.active, as_numpy=True)
            self.submaps.dbs[old_idx] = jax.tree.map(
                np.asarray, self.submaps.dbs[old_idx])
            self.submaps.create_new(np.asarray(T_wc),
                                    anchor_frame_id=self.frame,
                                    map_state=self._sharded.make_map())
        else:
            self.submaps.create_new(np.asarray(T_wc),
                                    anchor_frame_id=self.frame,
                                    enforce=not defer_enforce)
        if not defer_enforce:
            self.submaps.enforce_memory_budget()
        return True

    def _finish_frame_record(self, pose_nb, fused, tracking_ok, vo_stats):
        T_np = pose_nb[:16].reshape(4, 4)
        nb = int(pose_nb[16])
        self.pose_history.append((self.frame, T_np))
        self.frame += 1
        return dict(
            T_wc=T_np,
            fused=fused,
            tracking_ok=tracking_ok,
            frame=self.frame - 1,
            num_blocks=nb,
            memory_bytes=nb * 16 * tsdf_ops.BLOCK_VOL,
            **vo_stats,
        )

    # -- global consistency ------------------------------------------------

    def restore_submap(self, si: int, force_replay: bool = False) -> None:
        """Restore a spilled submap to device AND replay the corrections
        deferred while it was on host (pending_corrections) — the
        swapped-in submap must look exactly as if it had been corrected
        in place.

        Replay trigger: at least one pending pose moved more than
        inactive_min_error (or force_replay). Sub-trigger stashes stay
        pending — they replay coalesced under a later trigger or in the
        sequence-end flush — so a transient eval restore doesn't pay a
        correction program (and the dirty re-spill it forces) for
        voxel-noise-level pose deltas."""
        self.submaps.restore_to_device(si)
        pend = self.submaps.pending_corrections[si]
        if not pend:
            return
        trigger = force_replay or any(
            err > self.cfg.correction.inactive_min_error
            for _, err in pend.values())
        if not trigger:
            return
        db_i = self.submaps.dbs[si]
        db_ids = np.asarray(db_i.frame_id)
        c = db_ids.shape[0]
        opt_T = np.tile(np.eye(4, dtype=np.float32), (c, 1, 1))
        opt_valid = np.zeros((c,), bool)
        for slot, fid in enumerate(db_ids):
            if int(fid) in pend:
                opt_T[slot] = pend[int(fid)][0]
                opt_valid[slot] = True
        pend.clear()
        if not opt_valid.any():
            return
        m, db, num, changed = self._correct_delta(
            self.submaps.maps[si], db_i,
            jnp.asarray(opt_T), jnp.asarray(opt_valid))
        self.submaps.maps[si] = m
        self.submaps.dbs[si] = db
        # dirty ONLY when the replay actually re-fused something: tiny
        # deltas are rejected by the correction's min_error gate and
        # leave the map bit-identical. The changed-rows mask rides the
        # num fetch, so the eventual evict re-crosses only the rows the
        # replay touched (delta respill) instead of the whole pool.
        num_h, changed_h = jax.device_get((num, changed))
        if int(num_h) > 0:
            self.submaps.mark_dirty(
                si, changed_slots=np.flatnonzero(changed_h))

    def flush_deferred_corrections(self) -> int:
        """Sequence-end replay of every sub-trigger deferred correction:
        the FINISHED map gets the full correction history, including
        drift in (min_error, inactive_min_error] that never crossed the
        lazy-replay trigger while the submap sat inactive. Returns the
        number of submaps flushed."""
        n = 0
        for si in range(self.submaps.num_local_maps):
            if self.submaps.pending_corrections[si]:
                self.restore_submap(si, force_replay=True)
                n += 1
        if n:
            self.submaps.enforce_memory_budget()
        return n

    def apply_pose_updates(self, frame_ids: np.ndarray, poses: np.ndarray,
                           enforce_budget: bool = True) -> int:
        """Feed backend-optimised poses; runs OnlineCorrection on EVERY
        device-resident submap whose fusion DB holds affected frames (the
        correction history survives submap spawns), then relaxes the
        inter-submap pose graph from optimised anchor keyframes. Returns
        number of re-fused keyframes."""
        lut = {int(f): i for i, f in enumerate(frame_ids)}

        # inter-submap alignment: a submap whose anchor keyframe was
        # optimised gets a fresh global-pose measurement
        if self.submaps.num_local_maps > 1:
            anchor_meas = {
                si: poses[lut[af]]
                for si, af in enumerate(self.submaps.anchor_frames)
                if af in lut
            }
            if anchor_meas:
                self.submaps.optimize_alignment(anchor_meas,
                                                pg_fn=self._pg_submaps)

        if not self.cfg.correction.enabled:
            return 0
        # ONE packed fetch of every submap's DB index (frame ids + valid
        # flags): the per-submap np.asarray reads each paid a full tunnel
        # RTT. Spilled submaps' DBs are host numpy already — device_get
        # passes them through untouched.
        nmaps = self.submaps.num_local_maps
        db_index = jax.device_get(
            [(self.submaps.dbs[si].frame_id, self.submaps.dbs[si].valid,
              self.submaps.dbs[si].T_fused)
             for si in range(nmaps)])
        nums = []
        for si in range(nmaps):
            db_ids, db_valid, db_Tf = (np.asarray(a) for a in db_index[si])
            if si != self.submaps.active_idx:
                # INACTIVE submap (spilled or cache-resident): DEFER —
                # stash the latest optimised pose per touched frame; the
                # replay happens when the submap is next USED (composite
                # render / swap-in). Correcting inactive pools live cost
                # 1-3 s of device replay per tick (measured tick_apply
                # 2 -> 27 s when the clean cache kept them resident), and
                # deferral coalesces many ticks' updates into one replay.
                # Stash EVERYTHING above the correction min_error (same
                # se3-log weighted metric as the jitted _correct gate —
                # a coarser stash metric could stash poses _correct then
                # rejects, or drop ones it would accept); the REPLAY
                # trigger is gated on inactive_min_error instead
                # (restore_submap): inactive content is near-final map
                # geometry, and sub-trigger deltas would voxel-noise-
                # level-change the map while forcing a spill/restore
                # cycle per eval. Sub-trigger stashes still replay —
                # coalesced under a later loop-scale trigger, or in the
                # sequence-end flush_deferred_corrections() pass — so
                # mid-size drift (rigid part absorbed by the alignment
                # delta, residual re-fused at flush) is never silently
                # discarded.
                pend = self.submaps.pending_corrections[si]
                T_f = db_Tf          # rode the packed DB-index fetch
                gate = self.cfg.correction.min_error
                for slot, fid in enumerate(db_ids):
                    if not db_valid[slot] or int(fid) not in lut:
                        continue
                    err = lie.pose_error_weighted_np(T_f[slot],
                                                     poses[lut[int(fid)]])
                    if err > gate:
                        pend[int(fid)] = (np.asarray(poses[lut[int(fid)]],
                                                     np.float32), err)
                continue
            db_i = self.submaps.dbs[si]
            c = db_ids.shape[0]
            opt_T = np.tile(np.eye(4, dtype=np.float32), (c, 1, 1))
            opt_valid = np.zeros((c,), bool)
            for slot, fid in enumerate(db_ids):
                if int(fid) in lut:
                    opt_T[slot] = poses[lut[int(fid)]]
                    opt_valid[slot] = True
            if not opt_valid.any():
                continue
            # sharded mode shards the ACTIVE map only; inactive submaps
            # (if spawned) stay single-chip and use the single-chip replay
            if self._sharded is not None and si == self.submaps.active_idx:
                correct = self._sharded.correct
            else:
                correct = self._correct
            m, db, num = correct(
                self.submaps.maps[si], db_i,
                jnp.asarray(opt_T), jnp.asarray(opt_valid))
            self.submaps.maps[si] = m
            self.submaps.dbs[si] = db
            nums.append((si, num))
        # one sync for every submap's re-fuse counter (int(num) inside the
        # loop serialized a readback behind each correction program);
        # dirty only submaps whose correction actually re-fused frames
        fetched = jax.device_get([n for _, n in nums]) if nums else []
        for (si, _), n in zip(nums, fetched):
            if int(n) > 0:
                self.submaps.mark_dirty(si)
        if enforce_budget:   # chunk mode defers to its post-tick enforce
            self.submaps.enforce_memory_budget()
        return int(np.sum(fetched)) if fetched else 0

    def purge_keyframes(self, culled_frame_ids: np.ndarray) -> None:
        """Remove fused keyframes the backend culled (DenseSlam.cpp:417-429)."""
        db_ids = np.asarray(self.db.frame_id)
        culled = jnp.asarray(np.isin(db_ids, culled_frame_ids))
        purge = (self._sharded.purge if self._sharded is not None
                 else self._purge)
        m, db = purge(self.submaps.active, self.db, culled)
        self.submaps.active = m
        self.db = db

    def decay_catchup(self) -> None:
        """Sequence-end decay (InfiniTamDriver.h:315-331). In sharded mode
        the pass runs as an explicit per-shard shard_map program (decay is
        per-slot; only the freed counter crosses shards)."""
        if not self.cfg.decay.enabled:
            return
        w = self.cfg.decay.max_decay_weight
        for _ in range(self.cfg.decay.min_decay_age):
            if self._sharded is not None:
                self.submaps.active = self._sharded.decay_catchup_step(
                    self.submaps.active, jnp.float32(w))
            else:
                self.submaps.active = tsdf_ops.decay(
                    self.submaps.active, w, 0, force_all=True)

    # -- rendering / export ------------------------------------------------

    def raycast_view(self, T_wc: Optional[jax.Array] = None) -> rc_ops.Raycast:
        T = T_wc if T_wc is not None else jnp.asarray(self.fe_state.T_wc)
        if self._sharded is not None:
            return self._sharded.raycast(self.submaps.active, T)
        return self._raycast(self.submaps.active, T)

    def get_preview(self, kind: str, T_wc: Optional[jax.Array] = None):
        return rc_ops.render_preview(self.raycast_view(T_wc), kind)

    def _inview_slots(self, idx: int, T_wc) -> np.ndarray:
        """HOST-side frustum filter for a host-resident submap: project
        every allocated block center (numpy bit unpack of the packed keys
        — no device work) through the current alignment delta into the
        camera at T_wc; return the slot indices that land in the frustum
        within max_depth. The frustum pad is depth-dependent — a block's
        extent (half-diagonal 0.87*bs) projects far past its center up
        close, so a fixed-pixel pad culled near geometry — with a 16 px
        floor of slack. Feeds both the restore gate and the ghost-render
        row selection."""
        m = self.submaps.maps[idx]
        keys = np.asarray(m.table.keys)
        alloc = np.flatnonzero(keys != vhash.EMPTY_KEY).astype(np.int32)
        if alloc.size == 0:
            return alloc
        ks = keys[alloc]
        half = int(vhash.PACK_HALF)
        mask = (1 << int(vhash.PACK_BITS)) - 1
        bx = (ks & mask) - half
        by = ((ks >> int(vhash.PACK_BITS)) & mask) - half
        bz = ((ks >> (2 * int(vhash.PACK_BITS))) & mask) - half
        bs = tsdf_ops.BLOCK * self.cfg.tsdf.voxel_size_m
        P = (np.stack([bx, by, bz], -1).astype(np.float64) + 0.5) * bs
        M = np.linalg.inv(np.asarray(T_wc, np.float64)) @ np.asarray(
            self.submaps.delta(idx), np.float64)
        pc = P @ M[:3, :3].T + M[:3, 3]
        z = pc[:, 2]
        ok = (z > 0.2 - bs) & (z < self.cfg.tsdf.max_depth_m + 2 * bs)
        intr = self.cfg.rig.intr
        u = pc[:, 0] / np.maximum(z, 0.2) * intr.fx + intr.cx
        v = pc[:, 1] / np.maximum(z, 0.2) * intr.fy + intr.cy
        pad = np.maximum(intr.fx * 0.87 * bs / np.maximum(z, 0.2), 16.0)
        ok &= (u > -pad) & (u < intr.width + pad) \
            & (v > -pad) & (v < intr.height + pad)
        return alloc[ok]

    def _spilled_submap_in_view(self, idx: int, T_wc,
                                min_blocks: int = 2) -> bool:
        """Visibility gate on the frustum filter. min_blocks is
        deliberately low: a thin sliver still contributes real geometry;
        a false positive costs one wasted restore, a false negative
        scores holes in the composite eval."""
        return self._inview_slots(idx, T_wc).size >= min_blocks

    def raycast_composite(self, T_wc: Optional[jax.Array] = None,
                          respill: bool = True,
                          ghost: bool = False) -> rc_ops.Raycast:
        """Raycast across ALL device-resident submaps, min-depth combined —
        the multi-local-map rendering the reference gets from
        ITMVoxelMapGraphManager's composite visualisation. Each submap is
        rendered under its CURRENT alignment correction (delta = optimised
        global anchor pose relative to spawn — estimatedGlobalPose role),
        so pose-graph updates visibly realign the composite.

        respill=False leaves restored submaps device-resident (callers
        rendering a BURST of composite views — the drive's eval frames —
        re-enforce the memory budget afterwards; a clean, unmutated
        restore then evicts for free via the spill cache).

        ghost=True renders host-resident submaps from a TRANSIENT
        in-view-rows-only upload (ghost_render_state, ~15x less tunnel
        traffic than a restore) instead of swapping them in — the r5
        multi-submap drive spent 5-12 s per eval frame on full restores.
        Deferred corrections past the replay trigger still force a full
        restore so the composite always reflects every super-trigger
        correction; ghosts render depth only (color reads zero), so keep
        ghost=False for color previews and mesh/save paths."""
        T = T_wc if T_wc is not None else jnp.asarray(self.fe_state.T_wc)
        best: Optional[rc_ops.Raycast] = None
        for idx in range(self.submaps.num_local_maps):
            respill_this = False
            ghost_m = None
            if self.submaps.is_on_host(idx):
                slots = self._inview_slots(idx, T)
                if slots.size < 2:
                    # pure-host frustum gate: restoring a spilled submap
                    # uploads its whole pool over the tunnel; a submap
                    # whose blocks don't project into this view cannot
                    # contribute a pixel (mid-drive evals were paying
                    # multi-second restores for submaps BEHIND the
                    # camera)
                    continue
                pend = self.submaps.pending_corrections[idx]
                trigger = any(
                    err > self.cfg.correction.inactive_min_error
                    for _, err in pend.values())
                if ghost and not trigger and self._sharded is None:
                    ghost_m = self.submaps.ghost_render_state(idx, slots)
                    self.submaps.num_ghost_renders += 1
                else:
                    # spilled submap with armed corrections (or a color
                    # consumer): restore — replaying deferred corrections
                    # — render, spill back; the reference's swapped-out
                    # submaps round-trip the swapping engine the same way
                    self.restore_submap(idx)
                    respill_this = respill
            elif (idx != self.submaps.active_idx
                  and self.submaps.pending_corrections[idx]):
                # cache-resident inactive submap with deferred
                # corrections: replay them now (corrections are deferred
                # for ALL inactive submaps — see apply_pose_updates)
                self.restore_submap(idx)
            D = jnp.asarray(self.submaps.delta(idx))
            # render the submap as if its content were rigidly moved by D:
            # camera inv(D) @ T sees map-frame content exactly as T sees
            # D-corrected content; points/normals map back through D
            if self._sharded is not None and idx == self.submaps.active_idx:
                # the active submap is sharded: render it with the sharded
                # renderer (per-shard render + pmin combine), not the
                # single-chip program
                rc = self._sharded.raycast(self.submaps.maps[idx],
                                           lie.inv_T(D) @ T)
            elif ghost_m is not None:
                rc = self._raycast(ghost_m, lie.inv_T(D) @ T)
            else:
                rc = self._raycast(self.submaps.maps[idx], lie.inv_T(D) @ T)
            # ONE jitted program for transform + min-depth merge: the
            # eager form was ~15 per-op remote dispatches per submap, and
            # each op's FIRST use paid a seconds-long remote compile
            # inside the drive (measured ~40 s/eval frame on the first
            # composites)
            if best is None:
                best = self._composite_first(rc, D)
            else:
                best = self._composite_merge(best, rc, D)
            if respill_this:   # rendered image is its own buffer
                self.submaps.evict_to_host(idx)   # free when clean
        assert best is not None, "no device-resident submaps"
        return best

    def memory_bytes(self) -> int:
        """ITMVoxel-equivalent used-map bytes across ALL submaps, device
        AND host-spilled (the reference's memory telemetry is whole-map,
        reference: DenseSLAMGUI.cpp:568-595 + InfiniTamDriver.h:333-352).
        Counting only the active submap under-reported a multi-submap
        drive as 0.0 MB while 7 submaps were alive (round-3 record)."""
        blocks = sum(self.submaps.local_map_size(i)
                     for i in range(len(self.submaps.maps)))
        return blocks * 16 * tsdf_ops.BLOCK_VOL

    def memory_report(self) -> dict:
        """Per-submap memory split for telemetry: used map bytes by
        residency, plus true HBM footprint of the fixed pools."""
        dev_used = host_used = 0
        for i in range(len(self.submaps.maps)):
            b = self.submaps.local_map_size(i) * 16 * tsdf_ops.BLOCK_VOL
            if self.submaps.is_on_host(i):
                host_used += b
            else:
                dev_used += b
        return dict(
            used_device_mb=round(dev_used / 1e6, 1),
            used_host_mb=round(host_used / 1e6, 1),
            hbm_footprint_mb=round(
                self.submaps.device_memory_bytes() / 1e6, 1),
            # committed = active + dirty residents; clean residents are a
            # freely-reclaimable render cache (see enforce_memory_budget)
            hbm_committed_mb=round(
                self.submaps.committed_memory_bytes() / 1e6, 1),
            submaps=len(self.submaps.maps),
            submaps_on_host=sum(
                1 for i in range(len(self.submaps.maps))
                if self.submaps.is_on_host(i)),
        )

    def save_mesh(self, path: str) -> int:
        """Marching-tetrahedra OBJ export of the active submap
        (SaveStaticMap / SaveCurrSceneToMesh equivalent,
        reference: DenseSlam.cpp:638-643). Returns triangle count. A
        sharded map is first repacked probe-consistently single-chip
        (each shard hashes modulo LOCAL slots; meshing's neighbor lookups
        need global probing)."""
        from ..ops import meshing
        m = self.submaps.active
        if self._sharded is not None:
            m = self._sharded.gather_to_single(m)
        tris = meshing.extract_mesh(m, self.cfg.tsdf)
        meshing.save_obj(path, tris)
        return int(tris.shape[0])

    def save_raycast_depth(self, path: str,
                           T_wc: Optional[jax.Array] = None) -> None:
        """16-bit PNG raycast depth dump, depth*256 convention
        (reference: DenseSlam.cpp:573-603, InfiniTamDriver.cpp:187-199)."""
        import cv2
        rc = self.raycast_view(T_wc)
        png = np.asarray(rc_ops.depth_to_png16(rc.depth))
        cv2.imwrite(path, png)

    def save_raycast_rgb(self, path: str,
                         T_wc: Optional[jax.Array] = None) -> None:
        """Raycast color/shaded dump (reference: DenseSlam.cpp:605-636)."""
        import cv2
        rc = self.raycast_view(T_wc)
        img = np.asarray(rc_ops.render_preview(rc, rc_ops.PREVIEW_COLOR))
        if img.max() == 0:  # no color fused: fall back to shaded preview
            img = np.asarray(rc_ops.render_preview(rc, rc_ops.PREVIEW_GRAY))
        cv2.imwrite(path, img)

    @property
    def current_pose(self) -> np.ndarray:
        return np.asarray(self.fe_state.T_wc)

    def trajectory(self) -> List[Tuple[int, np.ndarray]]:
        return list(self.pose_history)

    def mean_fusion_ms(self) -> float:
        return float(np.mean(self.fusion_ms)) if self.fusion_ms else 0.0
