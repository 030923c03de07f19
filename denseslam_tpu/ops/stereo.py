"""Dense stereo depth: ZSAD cost volume + semi-global aggregation.

The reference pipeline *reads* precomputed disparity from ELAS/DispNet PNGs
(reference: src/DenseSLAM/PrecomputedDepthProvider.cpp:30-68); computing it
is delegated to external tools. Here depth is computed on-device so the
framework is self-contained:

  * cost volume: zero-mean SAD between left and d-shifted right image,
    box-filtered — built as a (D, H, W) tensor where D is a static python
    loop (unrolled into one fused XLA program) and the window sum is a
    separable cumulative-sum box filter (O(1) per pixel, VPU-friendly);
  * SGM: 4-direction path aggregation, each direction one `lax.scan` whose
    step updates an entire row/column x D slab at once — the classic
    serial-per-pixel recursion becomes a (W, D) vector recursion;
  * WTA + parabolic subpixel + left/right consistency via cost-volume
    re-indexing (no second matcher pass).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import StereoConfig
from ..utils.camera import StereoRig, disparity_to_depth


def _box_filter(img: jax.Array, radius: int) -> jax.Array:
    """Separable box sum over the last two dims via padded cumsum."""
    r = radius

    def along(x, axis):
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

    return along(along(img, -1), -2)


def cost_volume(left: jax.Array, right: jax.Array, cfg: StereoConfig) -> jax.Array:
    """(D, H, W) zero-mean SAD matching cost. Invalid (no overlap) = large."""
    h, w = left.shape
    r = cfg.patch_radius
    area = (2 * r + 1) ** 2
    lm = left - _box_filter(left, r) / area
    rm = right - _box_filter(right, r) / area

    costs = []
    big = 1e4
    for d in range(cfg.max_disparity):
        if d == 0:
            shifted = rm
        else:
            shifted = jnp.concatenate([jnp.zeros((h, d), rm.dtype), rm[:, :-d]], axis=1)
        ad = jnp.abs(lm - shifted)
        c = _box_filter(ad, r) / area
        # columns with no overlap are invalid
        col = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        c = jnp.where(col >= d, c, big)
        costs.append(c)
    return jnp.stack(costs, axis=0)


def sgm_aggregate(cost: jax.Array, cfg: StereoConfig) -> jax.Array:
    """4-path semi-global aggregation. cost: (D, H, W) -> aggregated same
    shape. Each path is one lax.scan along its axis over (slab, D) slices."""
    d, h, w = cost.shape
    p1 = jnp.float32(cfg.sgm_p1)
    p2 = jnp.float32(cfg.sgm_p2)

    def path_scan(vol):                      # vol: (T, S, D) scan over T
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

        init = vol[0]
        _, rest = jax.lax.scan(step, init, vol[1:])
        return jnp.concatenate([init[None], rest], axis=0)

    # direction: left->right. scan axis = W; slab = H.
    v_lr = jnp.transpose(cost, (2, 1, 0))          # (W, H, D)
    a_lr = path_scan(v_lr)
    a_rl = path_scan(v_lr[::-1])[::-1]
    v_tb = jnp.transpose(cost, (1, 2, 0))          # (H, W, D)
    a_tb = path_scan(v_tb)
    a_bt = path_scan(v_tb[::-1])[::-1]

    agg = (
        jnp.transpose(a_lr + a_rl, (2, 1, 0))
        + jnp.transpose(a_tb + a_bt, (2, 0, 1))
    )
    return agg


def disparity_from_cost(cost: jax.Array, cfg: StereoConfig):
    """WTA + parabolic subpixel + left-right consistency.

    Returns (disp (H, W) f32, valid (H, W) bool)."""
    d, h, w = cost.shape
    best = jnp.argmin(cost, axis=0)                          # (H, W)
    cmin = jnp.min(cost, axis=0)

    # parabolic subpixel around the winner
    dm1 = jnp.clip(best - 1, 0, d - 1)
    dp1 = jnp.clip(best + 1, 0, d - 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    c0 = cost[dm1, row, col]
    c2 = cost[dp1, row, col]
    denom = c0 - 2.0 * cmin + c2
    sub = jnp.where(jnp.abs(denom) > 1e-6, 0.5 * (c0 - c2) / denom, 0.0)
    disp = best.astype(jnp.float32) + jnp.clip(sub, -0.5, 0.5)

    # left-right check: right-image cost volume is a shear of the left one:
    # cost_R(x, d) = cost_L(x + d, d)
    xr = jnp.clip(col[None] + jnp.arange(d, dtype=jnp.int32)[:, None, None], 0, w - 1)
    cost_r = jnp.take_along_axis(cost, xr, axis=2)
    best_r = jnp.argmin(cost_r, axis=0)                      # (H, W) right disp
    # disp at left pixel x should equal right disp at x - disp
    xl = jnp.clip(col - best, 0, w - 1)
    rd = best_r[row, xl]
    consistent = jnp.abs(best - rd) <= cfg.lr_check_px

    valid = consistent & (cmin < 1e3) & (best > 0) & (best < d - 1)
    return jnp.where(valid, disp, 0.0), valid


def compute_depth(left: jax.Array, right: jax.Array, rig: StereoRig,
                  cfg: StereoConfig,
                  min_depth_m: float = 0.05,
                  max_depth_m: float = 60.0) -> Tuple[jax.Array, jax.Array]:
    """Full stereo pipeline: gray pair -> (depth_m, valid)."""
    cost = cost_volume(left, right, cfg)
    if cfg.use_sgm:
        cost = sgm_aggregate(cost, cfg)
    disp, valid = disparity_from_cost(cost, cfg)
    depth = disparity_to_depth(disp, rig, min_depth_m, max_depth_m)
    return depth, valid & (depth > 0)
