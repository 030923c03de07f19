"""Descriptor matching on the MXU.

The reference matches features with per-bin SAD searches over spatial hash
buckets and SSE `_mm_sad_epu8` (reference: src/libviso2/src/matcher.cpp:
895-1212) and closes a circular L-prev -> R-prev -> R-curr -> L-curr
consistency loop. TPU re-design: the whole cost matrix is ONE matmul —
squared-L2 distance = |a|^2 + |b|^2 - 2 a.b — with class equality and
spatial gates applied as masks, then mutual-nearest-neighbour selection by
row/col argmin. The circular consistency check becomes index-composition of
four mutual-NN maps. O(N^2) cost matrices at N ~= 1-2k are tiny MXU work.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import numpy as np
import jax.numpy as jnp

from ..config import FrontendConfig
from .features import Features

# numpy, not jnp: module-level device constants poison this runtime's
# dispatch path for the whole process (see ops/hash.py sentinel comment).
_INF = np.float32(1e9)


def _pair_cost(a: Features, b: Features) -> jax.Array:
    """Squared L2 descriptor distance (Na, Nb) — MXU matmul."""
    dots = a.desc @ b.desc.T
    na = jnp.sum(a.desc * a.desc, axis=-1)
    nb = jnp.sum(b.desc * b.desc, axis=-1)
    return na[:, None] + nb[None, :] - 2.0 * dots


def _gated_cost(
    a: Features,
    b: Features,
    max_du: float,
    max_dv: float,
    du_range: tuple[float, float] | None = None,
) -> jax.Array:
    """Masked cost matrix: class equality + validity + spatial gates.

    du_range (lo, hi) additionally constrains u_a - u_b (for stereo:
    disparity in [0, max_disp])."""
    cost = _pair_cost(a, b)
    du = a.uv[:, 0][:, None] - b.uv[:, 0][None, :]
    dv = a.uv[:, 1][:, None] - b.uv[:, 1][None, :]
    ok = (
        a.valid[:, None]
        & b.valid[None, :]
        & (a.cls[:, None] == b.cls[None, :])
        & (jnp.abs(du) <= max_du)
        & (jnp.abs(dv) <= max_dv)
    )
    if du_range is not None:
        ok = ok & (du >= du_range[0]) & (du <= du_range[1])
    return jnp.where(ok, cost, _INF)


def mutual_nn(cost: jax.Array) -> jax.Array:
    """Mutual nearest neighbour: (Na,) index into b, -1 when unmatched."""
    fwd = jnp.argmin(cost, axis=1)                 # (Na,)
    bwd = jnp.argmin(cost, axis=0)                 # (Nb,)
    best = jnp.take_along_axis(cost, fwd[:, None], axis=1)[:, 0]
    ok = (best < _INF * 0.5) & (bwd[fwd] == jnp.arange(cost.shape[0]))
    return jnp.where(ok, fwd, -1)


class QuadMatches(NamedTuple):
    """Circularly-consistent quad matches, indexed by current-left feature.

    Mirrors the reference RawFlow quad (SURVEY.md section 2a row
    'Sparse scene flow': curr/prev x left/right pixel + indices)."""
    idx_lc: jax.Array  # i32 (M,) index into curr-left features
    idx_rc: jax.Array  # i32 (M,)
    idx_lp: jax.Array  # i32 (M,)
    idx_rp: jax.Array  # i32 (M,)
    uv_lc: jax.Array   # f32 (M, 2)
    uv_rc: jax.Array
    uv_lp: jax.Array
    uv_rp: jax.Array
    valid: jax.Array   # bool (M,)


def estimate_gain(
    img_a: jax.Array,        # (H, W) gray
    img_b: jax.Array,
    uv_a: jax.Array,         # (M, 2) matched positions in a
    uv_b: jax.Array,         # (M, 2) matched positions in b
    valid: jax.Array,        # (M,)
    radius: int = 2,
) -> jax.Array:
    """Photometric gain of b relative to a over matched patches
    (reference: src/libviso2/src/matcher.cpp:291-333 — mean intensity ratio
    across correspondences; used to normalise exposure changes)."""
    h, w = img_a.shape

    def patch_sum(img, uv):
        ui = jnp.clip(uv[:, 0].astype(jnp.int32), radius, w - 1 - radius)
        vi = jnp.clip(uv[:, 1].astype(jnp.int32), radius, h - 1 - radius)
        flat = img.reshape(-1)
        acc = 0.0
        for dy in range(-radius, radius + 1):
            for dx in range(-radius, radius + 1):
                acc = acc + flat[(vi + dy) * w + (ui + dx)]
        return acc

    sa = patch_sum(img_a, uv_a)
    sb = patch_sum(img_b, uv_b)
    vf = valid.astype(jnp.float32)
    num = jnp.sum(vf * sb)
    den = jnp.sum(vf * sa)
    return jnp.where(den > 1e-6, num / jnp.maximum(den, 1e-6), 1.0)


def flow_consensus(
    uv: jax.Array,        # (M, 2) anchor positions (curr-left)
    flow_u: jax.Array,    # (M,) u-flow of each match
    flow_v: jax.Array,    # (M,) v-flow
    disp: jax.Array | None,  # (M,) stereo disparity, or None (mono)
    valid: jax.Array,     # (M,)
    k: int,
    tol_flow: float,
    tol_disp: float,
    min_support: int,
) -> jax.Array:
    """Neighbourhood flow-consensus inlier mask (M,).

    The reference removes match outliers by Delaunay-triangulating the
    current-left match positions and keeping a match only when its
    triangulation neighbours agree in flow (and disparity for stereo)
    (reference: src/libviso2/src/matcher.cpp:1212-1382, via Shewchuk's
    Triangle). Delaunay construction is sequential pointer-chasing — the
    TPU re-design gets the same local-consensus semantics from the k
    nearest *matched* neighbours in the image plane: one (M, M) squared
    -distance matrix on the MXU, `top_k` per row, then a vote. A match
    survives when >= min_support neighbours have |d_flow| and |d_disp|
    within tolerance (the reference's 2-agreeing-neighbours rule)."""
    m = uv.shape[0]
    d2 = jnp.sum(uv * uv, axis=-1)
    dist = d2[:, None] + d2[None, :] - 2.0 * (uv @ uv.T)
    ok = valid[:, None] & valid[None, :]
    dist = jnp.where(ok, dist, _INF)
    dist = jnp.where(jnp.eye(m, dtype=bool), _INF, dist)
    # k rounds of argmin-extract instead of `lax.top_k`: top_k lowers to a
    # full (M, M) two-operand sort on TPU (measured ~30 ms/frame at
    # M=2048 — the single most expensive frontend op); k argmin passes are
    # plain VPU row reductions over the same matrix (~1 ms). Result is
    # identical for distinct distances.
    cols = jax.lax.broadcasted_iota(jnp.int32, (m, m), 1)
    support = jnp.zeros((m,), jnp.int32)
    for round_i in range(k):
        nbr = jnp.argmin(dist, axis=1)
        best = jnp.take_along_axis(dist, nbr[:, None], axis=1)[:, 0]
        nbr_ok = best < _INF * 0.5                  # neighbour is real+valid
        du = jnp.abs(flow_u - flow_u[nbr])
        dv = jnp.abs(flow_v - flow_v[nbr])
        agree = nbr_ok & (du <= tol_flow) & (dv <= tol_flow)
        if disp is not None:
            agree = agree & (jnp.abs(disp - disp[nbr]) <= tol_disp)
        support = support + agree.astype(jnp.int32)
        if round_i + 1 < k:
            dist = jnp.where(cols == nbr[:, None], _INF, dist)
    return valid & (support >= min_support)


def remove_outliers(q: QuadMatches, cfg: FrontendConfig) -> QuadMatches:
    """Flow+disparity consensus over quad matches (stereo path)."""
    if not cfg.outlier_removal:
        return q
    keep = flow_consensus(
        q.uv_lc,
        q.uv_lc[:, 0] - q.uv_lp[:, 0],
        q.uv_lc[:, 1] - q.uv_lp[:, 1],
        q.uv_lc[:, 0] - q.uv_rc[:, 0],
        q.valid,
        k=cfg.outlier_knn,
        tol_flow=cfg.outlier_flow_tol_px,
        tol_disp=cfg.outlier_disp_tol_px,
        min_support=cfg.outlier_min_support,
    )
    return q._replace(valid=keep)


def _bilinear_patches(img: jax.Array, uv: jax.Array, half: int,
                      ext: int = 0,
                      scale: jax.Array | None = None,
                      ext_v: int | None = None) -> jax.Array:
    """Bilinear-sampled square patches around subpixel centers.

    Returns (M, S, S) with S = 2*(half+ext)+1, sampled at
    uv + scale * integer offsets (the fractional part of uv rides the
    bilinear weights, so integer-shifted windows of the SAME patch stack
    stay aligned to the true subpixel center). `scale` (M,) resamples the
    patch at a per-feature magnification — used to match the anchor's
    scale to a forward-motion-expanded target patch."""
    h, w = img.shape
    flat = img.reshape(-1)
    if scale is None:
        # Unit-stride fast path: ONE gather of the (Sv+1, Su+1) integer
        # super-patch; the four bilinear corners are shifted SLICES of it
        # (the naive form pays 4 full gathers — and on this TPU the whole
        # op is gather-bound at ~8 ns/element). ext_v overrides the
        # vertical extension (1D stereo legs search u only).
        ev = ext if ext_v is None else ext_v
        su_ = 2 * (half + ext) + 1
        sv_ = 2 * (half + ev) + 1
        u0f = jnp.floor(uv[:, 0])
        v0f = jnp.floor(uv[:, 1])
        fu = (uv[:, 0] - u0f)[:, None, None]
        fv = (uv[:, 1] - v0f)[:, None, None]
        co = np.arange(su_ + 1, dtype=np.int32) - (half + ext)
        ro = np.arange(sv_ + 1, dtype=np.int32) - (half + ev)
        vi = jnp.clip(v0f.astype(jnp.int32)[:, None] + ro[None, :],
                      0, h - 1)
        ui = jnp.clip(u0f.astype(jnp.int32)[:, None] + co[None, :],
                      0, w - 1)
        sup = flat[vi[:, :, None] * w + ui[:, None, :]]  # (M, Sv+1, Su+1)
        p00 = sup[:, :-1, :-1]
        p01 = sup[:, :-1, 1:]
        p10 = sup[:, 1:, :-1]
        p11 = sup[:, 1:, 1:]
        return (p00 * (1 - fu) * (1 - fv) + p01 * fu * (1 - fv)
                + p10 * (1 - fu) * fv + p11 * fu * fv)
    offs = np.arange(-(half + ext), half + ext + 1, dtype=np.float32)
    sc = scale[:, None, None]
    su = uv[:, 0, None, None] + sc * offs[None, None, :]
    sv = uv[:, 1, None, None] + sc * offs[None, :, None]
    su = jnp.broadcast_to(su, su.shape[:1] + (offs.size, offs.size))
    sv = jnp.broadcast_to(sv, sv.shape[:1] + (offs.size, offs.size))
    su = jnp.clip(su, 0.0, w - 1.001)    # border samples degrade to clamp
    sv = jnp.clip(sv, 0.0, h - 1.001)
    u0 = jnp.floor(su).astype(jnp.int32)
    v0 = jnp.floor(sv).astype(jnp.int32)
    fu = su - u0
    fv = sv - v0
    idx = v0 * w + u0                                   # (M, S, S)
    p00 = flat[idx]
    p01 = flat[idx + 1]
    p10 = flat[idx + w]
    p11 = flat[idx + w + 1]
    return (p00 * (1 - fu) * (1 - fv) + p01 * fu * (1 - fv)
            + p10 * (1 - fu) * fv + p11 * fu * fv)


def _zssd(a: jax.Array, b: jax.Array) -> jax.Array:
    """Zero-mean SSD over trailing (S, S) dims -> (M,). Mean removal makes
    the cost offset-invariant; residual multiplicative gain between the
    one-frame-lagged exposure-compensated anchor and the target is NOT
    cancelled, but it is bounded by the gain loop (<~1%/frame on the
    drive's ramp) and biases all candidate shifts of a patch equally to
    first order — the parabolic minimum moves far less than the noise
    floor. (Full gain invariance would be ZNCC — variance-normalised
    patches — at one extra rsqrt per patch; not needed at this bound.)"""
    am = a - jnp.mean(a, axis=(-2, -1), keepdims=True)
    bm = b - jnp.mean(b, axis=(-2, -1), keepdims=True)
    d = am - bm
    return jnp.sum(d * d, axis=(-2, -1))


def _parabolic(c_m, c_0, c_p):
    """Subpixel offset of a quadratic through 3 cost samples, clipped."""
    den = c_m - 2.0 * c_0 + c_p
    off = jnp.where(jnp.abs(den) > 1e-9, 0.5 * (c_m - c_p) / den, 0.0)
    return jnp.clip(off, -0.6, 0.6)


def _refine_leg(anchor: jax.Array, img: jax.Array, uv: jax.Array,
                half: int, search: int, du_only: bool) -> jax.Array:
    """Correlate `anchor` patches (M, S, S) against `img` around `uv`;
    return refined uv. du_only restricts the search to the u axis
    (rectified stereo partners).

    The search grid is sampled BILINEARLY at uv + integer shifts — the
    grid phase matches the detector's position estimate, so the cost
    minimum lands near a grid point and the parabolic fit stays
    locking-free (an integer-base grid was tried: ~3x cheaper gathers but
    the minimum lands up to 0.7 px off-grid and pixel-locking pushed the
    drive's translation-scale bias from -0.65% back to -1.6%). The
    bilinear cost is ONE super-patch gather (see _bilinear_patches), and
    du_only legs gather only the rows they use."""
    r = search
    s = 2 * half + 1
    ext = _bilinear_patches(img, uv, half, ext=r,
                            ext_v=0 if du_only else r)
    n_dv = 1 if du_only else (2 * r + 1)
    costs = []
    for dy in range(n_dv):
        yy = 0 if du_only else dy
        row = []
        for dx in range(2 * r + 1):
            row.append(_zssd(anchor, ext[:, yy:yy + s, dx:dx + s]))
        costs.append(jnp.stack(row, axis=-1))           # (M, 2r+1)
    c = jnp.stack(costs, axis=-2)                       # (M, n_dv, 2r+1)
    m = c.shape[0]
    flatc = c.reshape(m, -1)
    best = jnp.argmin(flatc, axis=-1)
    by = best // (2 * r + 1)
    bx = best % (2 * r + 1)
    # clamp to interior so the parabolic neighbours exist
    bx_i = jnp.clip(bx, 1, 2 * r - 1)
    rows = jnp.take_along_axis(
        c, by[:, None, None].astype(jnp.int32), axis=1)[:, 0, :]
    cx0 = jnp.take_along_axis(rows, bx_i[:, None] - 1, axis=1)[:, 0]
    cx1 = jnp.take_along_axis(rows, bx_i[:, None], axis=1)[:, 0]
    cx2 = jnp.take_along_axis(rows, bx_i[:, None] + 1, axis=1)[:, 0]
    du = bx_i.astype(jnp.float32) - r + _parabolic(cx0, cx1, cx2)
    if du_only:
        dv = jnp.zeros_like(du)
    else:
        by_i = jnp.clip(by, 1, 2 * r - 1)
        cols = jnp.take_along_axis(
            c, bx_i[:, None, None].astype(jnp.int32), axis=2)[:, :, 0]
        cy0 = jnp.take_along_axis(cols, by_i[:, None] - 1, axis=1)[:, 0]
        cy1 = jnp.take_along_axis(cols, by_i[:, None], axis=1)[:, 0]
        cy2 = jnp.take_along_axis(cols, by_i[:, None] + 1, axis=1)[:, 0]
        dv = by_i.astype(jnp.float32) - r + _parabolic(cy0, cy1, cy2)
    # flat cost surface (textureless patch): keep the original position
    spread = jnp.max(flatc, axis=-1) - jnp.min(flatc, axis=-1)
    flat_ok = spread > 1e-3
    du = jnp.where(flat_ok, du, 0.0)
    dv = jnp.where(flat_ok, dv, 0.0)
    return uv + jnp.stack([du, dv], axis=-1)


def refine_quad_subpix(
    q: QuadMatches,
    img_lp: jax.Array,
    img_rp: jax.Array,
    img_lc: jax.Array,
    img_rc: jax.Array,
    cfg: FrontendConfig,
    T_pred: jax.Array | None = None,
    rig=None,
) -> QuadMatches:
    """Subpixel refinement of quad-match positions by direct patch
    correlation on the raw images (the reference's post-match parabolic
    refinement stage, src/libviso2/src/matcher.cpp:1384-1588).

    Detector peaks relocalize under noise/viewpoint change (peak-locking);
    correlating image patches around the matched positions re-anchors
    every corner of the quad to the SAME physical surface patch:

      rp <- 1D u-search in img_rp, anchored to the lp patch (rectified);
      lc <- 2D search in img_lc, anchored to the lp patch;
      rc <- 1D u-search in img_rc, anchored to the REFINED lc patch.

    cfg.refine_mode="temporal" runs only the lc leg (with its predicted-
    scale anchor — the scale-bias mechanism lives there); the stereo
    partners keep detector positions, whose zero-mean disparity noise the
    ~200-inlier refit averages down. Measured equal-or-better drift at
    ~45% of the gather traffic (scripts/probes/exp_refine_gate.py).

    All legs are one bilinear patch gather + a static unrolled ZSSD grid +
    parabolic interpolation — O(M * patch^2 * (2*search+1)^2) VPU work,
    no data-dependent shapes. Measured on the synthetic drive: temporal
    flow-u noise 1.26 -> ~0.4 px, per-frame VO translation error ~2x down.

    With (T_pred, rig) the TEMPORAL anchor is resampled at the predicted
    per-feature scale z_curr/z_prev: under forward motion the current
    patch is an expanded copy of the previous one, and correlating at
    mismatched scale systematically undershoots radial flow — a direct
    translation-scale bias (measured -0.8% of the per-frame step on the
    synthetic drive without compensation).

    Cost control (the first cut of this op measured 45 ms/frame on TPU,
    gather-bound at ~8 ns/element): only the first `refine_cap`
    valid-compacted quads are refined (valid rows are a small fraction of
    the static feature cap), target grids sample ONE integer-base gather
    each, and 1D legs gather only the rows they use — together ~15x less
    gather traffic at equal output quality."""
    half = cfg.refine_patch // 2
    r = cfg.refine_search
    m = q.uv_lc.shape[0]
    cap = min(cfg.refine_cap, m)
    order = jnp.argsort(~q.valid, stable=True)[:cap]    # valid rows first
    temporal_only = cfg.refine_mode == "temporal"

    uv_lp = q.uv_lp[order]
    uv_rp0 = q.uv_rp[order]
    uv_lc0 = q.uv_lc[order]
    uv_rc0 = q.uv_rc[order]

    if temporal_only:
        # stereo partners keep their detector positions; the predicted-
        # scale disparity comes from them directly
        uv_rp = uv_rp0
    else:
        anchor_p = _bilinear_patches(img_lp, uv_lp, half)
        # rectified partners search along the row of their left anchor
        c_rp = jnp.stack([uv_rp0[:, 0], uv_lp[:, 1]], axis=-1)
        uv_rp = _refine_leg(anchor_p, img_rp, c_rp, half, r, du_only=True)
    if T_pred is not None and rig is not None:
        disp = jnp.maximum(uv_lp[:, 0] - uv_rp[:, 0], 0.5)
        z_p = rig.intr.fx * rig.baseline_m / disp
        x_p = (uv_lp[:, 0] - rig.intr.cx) / rig.intr.fx * z_p
        y_p = (uv_lp[:, 1] - rig.intr.cy) / rig.intr.fy * z_p
        z_c = (T_pred[2, 0] * x_p + T_pred[2, 1] * y_p
               + T_pred[2, 2] * z_p + T_pred[2, 3])
        # anchor offsets shrink by z_c/z_p so one anchor pixel spans the
        # same surface extent as one target pixel
        scale = jnp.clip(z_c / jnp.maximum(z_p, 0.5), 0.75, 1.3)
        anchor_t = _bilinear_patches(img_lp, uv_lp, half, scale=scale)
    elif temporal_only:
        anchor_t = _bilinear_patches(img_lp, uv_lp, half)
    else:
        anchor_t = anchor_p
    uv_lc = _refine_leg(anchor_t, img_lc, uv_lc0, half, r, du_only=False)
    if temporal_only:
        return q._replace(uv_lc=q.uv_lc.at[order].set(uv_lc))
    anchor_c = _bilinear_patches(img_lc, uv_lc, half)
    c_rc = jnp.stack([uv_rc0[:, 0], uv_lc[:, 1]], axis=-1)
    uv_rc = _refine_leg(anchor_c, img_rc, c_rc, half, r, du_only=True)
    # scatter the refined rows back (cap unique indices — tiny)
    return q._replace(
        uv_rp=q.uv_rp.at[order].set(uv_rp),
        uv_lc=q.uv_lc.at[order].set(uv_lc),
        uv_rc=q.uv_rc.at[order].set(uv_rc),
    )


def refine_temporal_subpix(
    img_prev: jax.Array,
    img_curr: jax.Array,
    uv_prev: jax.Array,
    uv_curr: jax.Array,
    valid: jax.Array,
    cfg: FrontendConfig,
    disp_prev: jax.Array | None = None,
    T_pred: jax.Array | None = None,
    rig=None,
) -> jax.Array:
    """Compacted 2D temporal-leg refinement for single-image sensors
    (rgbd/mono): anchor at the previous frame's position, correlate in
    the current frame; only the first refine_cap valid-compacted rows
    run. Returns refined uv_curr.

    With (disp_prev, T_pred, rig) the anchor is resampled at the
    predicted per-feature scale z_curr/z_prev — the same forward-motion
    scale compensation the stereo path's refine_quad_subpix carries;
    without it, correlating an unexpanded anchor against the expanded
    current patch systematically undershoots radial flow (a direct
    translation-scale bias, measured -0.8%/frame on the stereo drive
    and the r5 RGB-D drive's dominant drift term)."""
    m = uv_curr.shape[0]
    cap = min(cfg.refine_cap, m)
    order = jnp.argsort(~valid, stable=True)[:cap]
    half = cfg.refine_patch // 2
    if disp_prev is not None and T_pred is not None and rig is not None:
        uv_p = uv_prev[order]
        disp = jnp.maximum(disp_prev[order], 0.5)
        z_p = rig.intr.fx * rig.baseline_m / disp
        x_p = (uv_p[:, 0] - rig.intr.cx) / rig.intr.fx * z_p
        y_p = (uv_p[:, 1] - rig.intr.cy) / rig.intr.fy * z_p
        z_c = (T_pred[2, 0] * x_p + T_pred[2, 1] * y_p
               + T_pred[2, 2] * z_p + T_pred[2, 3])
        scale = jnp.clip(z_c / jnp.maximum(z_p, 0.5), 0.75, 1.3)
        scale = jnp.where(disp_prev[order] > 0.5, scale, 1.0)
        anchor = _bilinear_patches(img_prev, uv_p, half, scale=scale)
    else:
        anchor = _bilinear_patches(img_prev, uv_prev[order], half)
    ref = _refine_leg(anchor, img_curr, uv_curr[order], half,
                      cfg.refine_search, du_only=False)
    ref = jnp.where(valid[order][:, None], ref, uv_curr[order])
    return uv_curr.at[order].set(ref)


def match_stereo(a: Features, b: Features, cfg: FrontendConfig) -> jax.Array:
    """Left->right matches along the epipolar band; returns (Na,) idx/-1."""
    cost = _gated_cost(
        a, b, max_du=256.0, max_dv=cfg.stereo_band_px, du_range=(0.0, 256.0)
    )
    return mutual_nn(cost)


def stereo_disparities(a: Features, b: Features, cfg: FrontendConfig):
    """Per-feature disparity from the left<->right mutual match.

    Returns (disp_a, disp_b): disparity aligned to each feature array,
    -1 where unmatched — the per-feature depth the motion-prior gate needs
    (the reference keeps it as the quad's u1p-u2p, viso_stereo.cpp:99-105)."""
    m = match_stereo(a, b, cfg)
    ok = m >= 0
    du = a.uv[:, 0] - b.uv[jnp.maximum(m, 0), 0]
    disp_a = jnp.where(ok & (du > 0), du, -1.0)
    nb = b.uv.shape[0]
    tgt = jnp.where(ok & (du > 0), m, nb)
    disp_b = jnp.full((nb + 1,), -1.0).at[tgt].set(
        jnp.where(ok & (du > 0), du, -1.0), mode="drop")[:nb]
    return disp_a, disp_b


def predict_uv(
    uv: jax.Array,        # (N, 2) feature positions in the PREVIOUS frame
    disp: jax.Array,      # (N,) stereo disparity (px), -1 invalid
    T_pred: jax.Array,    # (4, 4) prev-cam -> curr-cam motion prior
    fx: float, fy: float, cx: float, cy: float, baseline_m: float,
    right: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Project previous features into the current frame under a motion
    prior (the reference's Tr_delta warm start guiding the matcher's search
    windows, viso_stereo.cpp:53-57 + matcher stage-2 statistics). Returns
    (uv_pred (N, 2), ok (N,))."""
    ok = disp > 0.5
    d = jnp.maximum(disp, 0.5)
    z = fx * baseline_m / d
    x = (uv[:, 0] - cx) / fx * z
    y = (uv[:, 1] - cy) / fy * z
    if right:
        x = x + baseline_m           # right-cam point -> left-cam frame
    R = T_pred[:3, :3]
    t = T_pred[:3, 3]
    px = R[0, 0] * x + R[0, 1] * y + R[0, 2] * z + t[0]
    py = R[1, 0] * x + R[1, 1] * y + R[1, 2] * z + t[1]
    pz = R[2, 0] * x + R[2, 1] * y + R[2, 2] * z + t[2]
    if right:
        px = px - baseline_m         # back to right-cam frame
    ok = ok & (pz > 0.1)
    zs = jnp.maximum(pz, 0.1)
    up = px / zs * fx + cx
    vp = py / zs * fy + cy
    return jnp.stack([up, vp], axis=-1), ok


def match_temporal(
    a: Features, b: Features, cfg: FrontendConfig,
    uv_pred_b: jax.Array | None = None,
    pred_ok_b: jax.Array | None = None,
) -> jax.Array:
    """Curr->prev matches within the motion gate; returns (Na,) idx/-1.

    With a motion prior (uv_pred_b = b's predicted current-frame
    positions), admissible pairs are the UNION of the wide gate and a
    tight predictive_gate_px window around each prediction — the prior
    EXTENDS the search beyond the wide gate under large motion, and a bad
    prediction (wrong disparity) costs nothing because the wide gate still
    applies (the reference likewise falls back to full-range search when
    stage-2 statistics are unavailable, matcher.cpp:738-874)."""
    cost = _pair_cost(a, b)
    base_ok = (
        a.valid[:, None] & b.valid[None, :]
        & (a.cls[:, None] == b.cls[None, :])
    )
    du = a.uv[:, 0][:, None] - b.uv[:, 0][None, :]
    dv = a.uv[:, 1][:, None] - b.uv[:, 1][None, :]
    ok = base_ok & (jnp.abs(du) <= cfg.match_radius_px) \
        & (jnp.abs(dv) <= cfg.match_radius_px)
    if uv_pred_b is not None:
        dup = a.uv[:, 0][:, None] - uv_pred_b[:, 0][None, :]
        dvp = a.uv[:, 1][:, None] - uv_pred_b[:, 1][None, :]
        g = cfg.predictive_gate_px
        near = (jnp.abs(dup) <= g) & (jnp.abs(dvp) <= g)
        ok = ok | (base_ok & pred_ok_b[None, :] & near)
    return mutual_nn(jnp.where(ok, cost, _INF))


def quad_match(
    left_curr: Features,
    right_curr: Features,
    left_prev: Features,
    right_prev: Features,
    cfg: FrontendConfig,
    disp_lp: jax.Array | None = None,   # (N,) prev-left disparity, -1 invalid
    disp_rp: jax.Array | None = None,   # (N,) prev-right disparity
    T_pred: jax.Array | None = None,    # prev-cam -> curr-cam motion prior
    rig=None,
) -> QuadMatches:
    """Circular consistency: lc -> rc -> rp -> lp -> lc must close.

    (The reference walks lp -> rp -> rc -> lc, matcher.cpp:895-970; direction
    is immaterial.) With (disp_lp, disp_rp, T_pred, rig) the temporal legs
    gate around motion-prior predictions (warm-start matching)."""
    n = left_curr.uv.shape[0]
    i_lc = jnp.arange(n, dtype=jnp.int32)

    pred_lp = pred_rp = ok_lp = ok_rp = None
    if T_pred is not None and disp_lp is not None and rig is not None:
        intr = rig.intr
        pred_lp, ok_lp = predict_uv(
            left_prev.uv, disp_lp, T_pred, intr.fx, intr.fy, intr.cx,
            intr.cy, rig.baseline_m, right=False)
        pred_rp, ok_rp = predict_uv(
            right_prev.uv, disp_rp, T_pred, intr.fx, intr.fy, intr.cx,
            intr.cy, rig.baseline_m, right=True)

    m_lc_rc = match_stereo(left_curr, right_curr, cfg)          # lc -> rc
    m_rc_rp = match_temporal(right_curr, right_prev, cfg,
                             pred_rp, ok_rp)                    # rc -> rp
    m_rp_lp = mutual_nn(
        _gated_cost(right_prev, left_prev, max_du=256.0,
                    max_dv=cfg.stereo_band_px, du_range=(-256.0, 0.0))
    )                                                            # rp -> lp
    m_lc_lp = match_temporal(left_curr, left_prev, cfg,
                             pred_lp, ok_lp)                    # lc -> lp (check)

    i_rc = m_lc_rc
    i_rp = jnp.where(i_rc >= 0, m_rc_rp[jnp.maximum(i_rc, 0)], -1)
    i_lp = jnp.where(i_rp >= 0, m_rp_lp[jnp.maximum(i_rp, 0)], -1)
    closes = (i_lp >= 0) & (i_lp == m_lc_lp)

    def take(f: Features, idx):
        return f.uv[jnp.maximum(idx, 0)]

    valid = (
        closes
        & left_curr.valid
        & (i_rc >= 0) & (i_rp >= 0) & (i_lp >= 0)
    )
    return QuadMatches(
        idx_lc=i_lc,
        idx_rc=i_rc,
        idx_lp=i_lp,
        idx_rp=i_rp,
        uv_lc=left_curr.uv,
        uv_rc=take(right_curr, i_rc),
        uv_lp=take(left_prev, i_lp),
        uv_rp=take(right_prev, i_rp),
        valid=valid,
    )
