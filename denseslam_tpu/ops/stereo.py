"""Dense stereo depth: ZSAD cost volume + semi-global aggregation.

The reference pipeline *reads* precomputed disparity from ELAS/DispNet PNGs
(reference: src/DenseSLAM/PrecomputedDepthProvider.cpp:30-68); computing it
is delegated to external tools. Here depth is computed on-device so the
framework is self-contained.

TPU layout: the cost volume is (H, W, D) with the disparity axis on the
128-wide vector lanes (D = max_disparity = 128 exactly tiles), so WTA
argmin, subpixel refinement and the SGM disparity-smoothness shifts are all
lane-local VPU work:

  * cost volume: zero-mean SAD between left and d-shifted right image,
    box-filtered — D is a static python loop (unrolled into one fused XLA
    program); window sums are separable cumulative-sum box filters;
  * SGM: 4-direction path aggregation, each direction one `lax.scan` whose
    step updates an entire row/column x D slab at once — the classic
    serial-per-pixel recursion becomes a (S, D) vector recursion;
  * WTA + parabolic subpixel + left/right consistency. The right-image
    volume is the shear cost_R(x, d) = cost_L(x+d, d); it is evaluated as
    D STATIC column shifts with a running argmin — never as a
    take-along-axis gather of the whole volume (58M element-granular
    gathered elements ~= 1 s on this hardware; see the cost laws in
    .claude/skills/verify/SKILL.md).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import StereoConfig
from ..utils.camera import StereoRig, disparity_to_depth

_BIG = 1e4


def _box_along(x: jax.Array, axis: int, r: int) -> jax.Array:
    """1-D box sum of width 2r+1 along `axis` via padded cumsum."""
    c = jnp.cumsum(x, axis=axis)
    pad_lo = [(0, 0)] * x.ndim
    pad_lo[axis] = (r + 1, 0)
    pad_hi = [(0, 0)] * x.ndim
    pad_hi[axis] = (0, r)
    upper = jnp.pad(c, pad_hi, mode="edge")
    lower = jnp.pad(c, pad_lo, mode="constant")
    n = x.shape[axis]
    sl_u = [slice(None)] * x.ndim
    sl_u[axis] = slice(r, r + n)
    sl_l = [slice(None)] * x.ndim
    sl_l[axis] = slice(0, n)
    return upper[tuple(sl_u)] - lower[tuple(sl_l)]


def _box_filter(img: jax.Array, radius: int) -> jax.Array:
    """Separable box sum over the last two dims via padded cumsum."""
    return _box_along(_box_along(img, -1, radius), -2, radius)


def cost_volume(left: jax.Array, right: jax.Array, cfg: StereoConfig) -> jax.Array:
    """(H, W, D) zero-mean SAD matching cost. Invalid (no overlap) = large."""
    h, w = left.shape
    r = cfg.patch_radius
    area = (2 * r + 1) ** 2
    lm = left - _box_filter(left, r) / area
    rm = right - _box_filter(right, r) / area

    # Per-slab unrolled loop: a batched (H, W, D) box pass was tried and
    # measured ~35% SLOWER (45 vs 33 ms at KITTI res) — the 232 MB volume
    # materialisations cost more than the per-slab pipelines XLA fuses.
    costs = []
    for d in range(cfg.max_disparity):
        if d == 0:
            shifted = rm
        else:
            shifted = jnp.concatenate(
                [jnp.zeros((h, d), rm.dtype), rm[:, :-d]], axis=1)
        ad = jnp.abs(lm - shifted)
        c = _box_filter(ad, r) / area
        # columns with no overlap are invalid
        col = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        c = jnp.where(col >= d, c, _BIG)
        costs.append(c)
    return jnp.stack(costs, axis=-1)


def sgm_aggregate(cost: jax.Array, cfg: StereoConfig) -> jax.Array:
    """4-path semi-global aggregation. cost: (H, W, D) -> same shape.
    Each path is one lax.scan along its axis over (slab, D) slices; the
    disparity-smoothness shifts are lane-local. With
    cfg.sgm_backend == "pallas" the passes run as pallas kernels instead
    (ops/sgm_pallas.py)."""
    if cfg.sgm_backend == "pallas":
        from .sgm_pallas import sgm_aggregate_pallas
        return sgm_aggregate_pallas(
            cost, cfg.sgm_p1, cfg.sgm_p2,
            interpret=jax.default_backend() == "cpu")
    h, w, d = cost.shape
    # constants in the COST dtype — f32 literals would silently upcast a
    # bf16 volume scan back to f32
    p1 = jnp.asarray(cfg.sgm_p1, cost.dtype)
    p2 = jnp.asarray(cfg.sgm_p2, cost.dtype)

    def path_scan(vol, reverse=False):       # vol: (T, S, D) scan over T
        def step(prev, cur):
            # prev, cur: (S, D)
            prev_min = jnp.min(prev, axis=-1, keepdims=True)
            shift_p = jnp.concatenate([prev[:, :1], prev[:, :-1]], axis=1)
            shift_n = jnp.concatenate([prev[:, 1:], prev[:, -1:]], axis=1)
            best = jnp.minimum(
                jnp.minimum(prev, shift_p + p1),
                jnp.minimum(shift_n + p1, prev_min + p2),
            )
            out = cur + best - prev_min
            return out, out

        # Reverse passes use scan(reverse=True) — a [::-1] on the volume
        # materialises a full (232 MB at KITTI res) reversed copy per pass,
        # measured ~1.6 ms each x4 copies/frame; reverse scan reads the
        # original buffer back-to-front and stacks outputs in place.
        # NOTE: scan vol[1:]/vol[:-1] + concat, NOT a zero-carry scan over
        # the whole volume: the border slice forces the transposed volume
        # to MATERIALISE in scan-major layout. A full-volume scan lets XLA
        # keep the transpose as a layout bitcast, and every scan step and
        # every downstream (H, W) reduction turns strided — measured 13
        # ms/frame per pass instead of 2-3 ms (2.8x whole-pipeline hit).
        # NOTE: a 2x-unrolled pair scan was tried here (halve the step
        # count by doing two recurrence steps per iteration) and REGRESSED
        # the whole pipeline 2x: the (T/2, 2, S, D) pair reshape gives the
        # scan ys a {3,2,1,0} layout that poisons every downstream volume
        # reduction into strided passes — same failure mode as the
        # zero-carry full-volume scan documented above. Keep the plain
        # slice + concat form.
        if reverse:
            init = vol[-1]
            _, rest = jax.lax.scan(step, init, vol[:-1], reverse=True)
            return jnp.concatenate([rest, init[None]], axis=0)
        init = vol[0]
        _, rest = jax.lax.scan(step, init, vol[1:])
        return jnp.concatenate([init[None], rest], axis=0)

    # vertical passes scan the leading (H) axis directly; horizontal passes
    # scan W after a major-axis transpose (the lane axis D never moves).
    a_tb = path_scan(cost)
    a_bt = path_scan(cost, reverse=True)
    v_lr = jnp.transpose(cost, (1, 0, 2))          # (W, H, D)
    a_lr = path_scan(v_lr)
    a_rl = path_scan(v_lr, reverse=True)

    return a_tb + a_bt + jnp.transpose(a_lr + a_rl, (1, 0, 2))


def _disparity_from_maps(best, cmin, c0, c2, best_r, d: int,
                         cfg: StereoConfig):
    """Disparity assembly from per-pixel WTA maps: parabolic subpixel +
    left-right consistency + validity gates (disparity_from_cost's tail)."""
    h, w = best.shape
    denom = c0 - 2.0 * cmin + c2
    sub = jnp.where(jnp.abs(denom) > 1e-6, 0.5 * (c0 - c2) / denom, 0.0)
    disp = best.astype(jnp.float32) + jnp.clip(sub, -0.5, 0.5)

    # disp at left pixel x should equal right disp at x - disp
    row = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    xl = jnp.clip(col - best, 0, w - 1)
    rd = best_r.reshape(-1)[(row * w + xl).reshape(-1)].reshape(h, w)
    consistent = jnp.abs(best - rd) <= cfg.lr_check_px

    valid = consistent & (cmin < 1e3) & (best > 0) & (best < d - 1)
    return jnp.where(valid, disp, 0.0), valid


def disparity_from_cost(cost: jax.Array, cfg: StereoConfig,
                        raw_cost: jax.Array = None):
    """WTA + parabolic subpixel + left-right consistency (+ raw-cost
    uniqueness gate when `raw_cost` is given and cfg.uniq_ratio > 0 —
    see StereoConfig.uniq_ratio for why the gate must use the
    PRE-aggregation volume: SGM's smoothness penalties flatten the
    aggregated volume and destroy the ratio's discriminative power).

    Returns (disp (H, W) f32, valid (H, W) bool)."""
    h, w, d = cost.shape
    best = jnp.argmin(cost, axis=-1).astype(jnp.int32)      # (H, W)
    # volume passes stay in the storage dtype (bf16 option halves their
    # HBM traffic); only the (H, W) per-pixel results upcast
    cmin = jnp.min(cost, axis=-1).astype(jnp.float32)

    # parabolic subpixel around the winner. take_along_axis on the volume
    # is a lane-dynamic select that costs a full-volume pass EACH (~7.5 ms
    # x2 at KITTI res); a one-hot masked sum fuses both neighbours (and the
    # lane compares) into ONE volume read. Pixels at best==0 / best==d-1
    # get c0/c2 = 0 here instead of the clipped edge value — immaterial,
    # they are rejected by `valid` below either way.
    lane = jax.lax.broadcasted_iota(jnp.int32, (h, w, d), 2)
    bm = best[..., None]
    zero = jnp.zeros((), cost.dtype)
    c0 = jnp.sum(jnp.where(lane == bm - 1, cost, zero), axis=-1,
                 dtype=jnp.float32)
    c2 = jnp.sum(jnp.where(lane == bm + 1, cost, zero), axis=-1,
                 dtype=jnp.float32)
    # left-right check. cost_R(x, d) = cost_L(x + d, d) is a shear of the
    # left volume: D static column shifts with a running argmin (pure VPU,
    # no volume-sized gather).
    big = jnp.asarray(_BIG, cost.dtype)
    best_r_val = jnp.full((h, w), big)
    best_r = jnp.zeros((h, w), jnp.int32)
    for dd in range(d):
        slab = cost[..., dd]
        if dd >= w:          # whole shear out of frame (only when d > W)
            continue
        if dd > 0:
            slab = jnp.concatenate(
                [slab[:, dd:], jnp.full((h, dd), big)], axis=1)
        better = slab < best_r_val
        best_r_val = jnp.where(better, slab, best_r_val)
        best_r = jnp.where(better, dd, best_r)

    disp, valid = _disparity_from_maps(best, cmin, c0, c2, best_r, d, cfg)
    if raw_cost is not None and cfg.uniq_ratio > 0:
        rawf = raw_cost
        c_at = jnp.sum(jnp.where(lane == bm, rawf, zero), axis=-1,
                       dtype=jnp.float32)
        second = jnp.min(jnp.where(jnp.abs(lane - bm) > 2, rawf, big),
                         axis=-1).astype(jnp.float32)
        unique = c_at <= cfg.uniq_ratio * second
        disp = jnp.where(unique, disp, 0.0)
        valid = valid & unique
    return disp, valid


def compute_depth(left: jax.Array, right: jax.Array, rig: StereoRig,
                  cfg: StereoConfig,
                  min_depth_m: float = 0.05,
                  max_depth_m: float = 60.0) -> Tuple[jax.Array, jax.Array]:
    """Full stereo pipeline: gray pair -> (depth_m, valid)."""
    cost = cost_volume(left, right, cfg)
    if cfg.cost_dtype == "bfloat16":
        cost = cost.astype(jnp.bfloat16)
    raw = cost
    if cfg.use_sgm:
        cost = sgm_aggregate(cost, cfg)
    disp, valid = disparity_from_cost(cost, cfg, raw_cost=raw)
    depth = disparity_to_depth(disp, rig, min_depth_m, max_depth_m)
    return depth, valid & (depth > 0)
