"""TSDF raycasting: the ITMVisualisationEngine equivalent
(reference surface: SURVEY.md section 2b, use sites
src/DenseSLAM/InfiniTamDriver.cpp:229-277 GetImage/GetFloatImage).

Design: bounded-step sphere-tracing DDA, one `lax.scan` over a static step
count with all H*W rays in flight — per-ray divergence becomes masked lanes,
empty space is skipped at block granularity (a miss in the hash table lets
the ray jump a whole block), and near the surface the step follows the
sampled SDF. A final secant refinement + trilinear resample gives sub-voxel
depth. Outputs feed the ICP tracker, the GUI-style previews, and the
raycast-depth evaluation suite.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import TsdfConfig
from ..utils.camera import Intrinsics, backproject
from . import tsdf as tsdf_ops


class Raycast(NamedTuple):
    depth: jax.Array    # (H, W) m in the raycast camera, 0 = miss
    points: jax.Array   # (H, W, 3) world-frame surface points
    normals: jax.Array  # (H, W, 3) world-frame normals (0 where miss)
    mask: jax.Array     # (H, W) hit mask
    color: jax.Array    # (H, W, 3) volume color at hit


def raycast(
    m: tsdf_ops.MapState,
    T_wc: jax.Array,
    intr: Intrinsics,
    cfg: TsdfConfig,
) -> Raycast:
    h, w = intr.height, intr.width
    mu = cfg.trunc_dist_m
    block_m = cfg.block_size_m

    ones = jnp.ones((h, w), dtype=jnp.float32)
    dirs_c = backproject(ones, intr)            # z-normalised ray dirs
    R = T_wc[:3, :3]
    t = T_wc[:3, 3]
    dirs_w = (dirs_c @ R.T).reshape(-1, 3)       # (N, 3)
    norm = jnp.linalg.norm(dirs_w, axis=-1, keepdims=True)
    unit_w = dirs_w / jnp.maximum(norm, 1e-9)
    origin = t

    n = h * w
    t0 = jnp.full((n,), cfg.min_depth_m, dtype=jnp.float32)
    t_max = cfg.max_depth_m * norm[:, 0]        # ray-length bound

    def step(carry, _):
        t_cur, prev_sdf, prev_alloc, prev_t, hit_t, done = carry
        pts = origin + unit_w * t_cur[:, None]
        sdf, wgt = tsdf_ops.sample_tsdf_nearest(m, pts, cfg)
        allocated = wgt > 0.0

        # A crossing needs BOTH samples observed: entering a negative region
        # straight from unallocated space is a back-side phantom (matters at
        # the map frontier, and is load-bearing for the sharded map, where
        # each shard sees only its owned blocks and phantoms would win the
        # cross-shard min-depth combine).
        crossed = allocated & prev_alloc & (prev_sdf > 0.0) & (sdf <= 0.0) & ~done
        denom = prev_sdf - sdf
        frac = jnp.where(jnp.abs(denom) > 1e-6, prev_sdf / jnp.maximum(denom, 1e-6), 0.5)
        t_surf = prev_t + (t_cur - prev_t) * frac
        hit_t = jnp.where(crossed, t_surf, hit_t)
        done = done | crossed | (t_cur > t_max)

        # Step: full block through unallocated space, SDF-proportional when
        # tracking the surface, never less than half a voxel.
        adv = jnp.where(
            allocated,
            jnp.maximum(sdf * mu, cfg.voxel_size_m * 0.5),
            block_m * 0.8,
        )
        t_next = jnp.where(done, t_cur, t_cur + adv)
        return (
            t_next,
            jnp.where(allocated, sdf, 1.0),
            allocated | done,
            jnp.where(done, prev_t, t_cur),
            hit_t,
            done,
        ), None

    init = (
        t0,
        jnp.ones((n,), dtype=jnp.float32),
        jnp.zeros((n,), dtype=bool),
        t0,
        jnp.zeros((n,), dtype=jnp.float32),
        jnp.zeros((n,), dtype=bool),
    )
    (tf, _, _, _, hit_t, done), _ = jax.lax.scan(step, init, None, length=cfg.raycast_steps)

    hit = hit_t > 0.0
    pts_w = origin + unit_w * hit_t[:, None]

    # Refine with one trilinear secant step: x' = x - sdf(x) * mu * dir.
    sdf_tri, _ = tsdf_ops.sample_tsdf_trilinear(m, pts_w, cfg)
    pts_w = jnp.where(hit[:, None], pts_w - unit_w * (sdf_tri * mu)[:, None], pts_w)

    # Depth in the raycast camera = z of the camera-frame point.
    T_cw_R = R.T
    pc = (pts_w - t) @ T_cw_R.T
    depth = jnp.where(hit, pc[..., 2], 0.0).reshape(h, w)
    points = jnp.where(hit[:, None], pts_w, 0.0).reshape(h, w, 3)

    normals = _normals_from_points(points, depth > 0)
    color = tsdf_ops.sample_color_nearest(m, pts_w, cfg)
    color = jnp.where(hit[:, None], color, 0.0).reshape(h, w, 3)
    return Raycast(depth=depth, points=points,
                   normals=normals, mask=depth > 0, color=color)


def _normals_from_points(points: jax.Array, mask: jax.Array) -> jax.Array:
    """Image-space normals via cross products of neighbour differences —
    cheap, fully vectorised, standard for projective ICP."""
    dx = jnp.roll(points, -1, axis=1) - jnp.roll(points, 1, axis=1)
    dy = jnp.roll(points, -1, axis=0) - jnp.roll(points, 1, axis=0)
    n = jnp.cross(dy, dx)
    nn = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n = n / jnp.maximum(nn, 1e-9)
    ok = (
        mask
        & jnp.roll(mask, -1, axis=1) & jnp.roll(mask, 1, axis=1)
        & jnp.roll(mask, -1, axis=0) & jnp.roll(mask, 1, axis=0)
        & (nn[..., 0] > 1e-9)
    )
    return jnp.where(ok[..., None], n, 0.0)


# ---------------------------------------------------------------------------
# Preview rendering — the GetImage / PreviewType surface
# (reference: src/DenseSLAM/InfiniTamDriver.cpp:16-38 kToItmVisualisation,
#  src/DenseSLAM/PreviewType.h)
# ---------------------------------------------------------------------------

PREVIEW_DEPTH = "depth"
PREVIEW_GRAY = "gray"
PREVIEW_COLOR = "color"
PREVIEW_NORMAL = "normal"
PREVIEW_RAYCAST_DEPTH = "raycast_depth"


def render_preview(rc: Raycast, kind: str, view_dir_w: jax.Array | None = None):
    """Turn a raycast into a displayable image (uint8 or float depth)."""
    if kind == PREVIEW_RAYCAST_DEPTH or kind == PREVIEW_DEPTH:
        return rc.depth
    if kind == PREVIEW_NORMAL:
        img = (rc.normals * 0.5 + 0.5) * 255.0
        return jnp.where(rc.mask[..., None], img, 0.0).astype(jnp.uint8)
    if kind == PREVIEW_COLOR:
        return jnp.clip(rc.color, 0.0, 255.0).astype(jnp.uint8)
    if kind == PREVIEW_GRAY:
        # Lambertian shading from a headlight (ITM "shaded" preview).
        if view_dir_w is None:
            view_dir_w = jnp.array([0.0, 0.0, 1.0], dtype=jnp.float32)
        lam = jnp.abs(jnp.sum(rc.normals * view_dir_w, axis=-1))
        img = lam * 220.0 + 20.0
        return jnp.where(rc.mask, img, 0.0).astype(jnp.uint8)
    raise ValueError(f"unknown preview kind {kind}")


def depth_to_png16(depth_m: jax.Array) -> jax.Array:
    """Depth (m) -> uint16 PNG convention depth*256
    (reference: src/DenseSLAM/InfiniTamDriver.cpp:187-199)."""
    return jnp.clip(jnp.round(depth_m * 256.0), 0, 65535).astype(jnp.uint16)


def png16_to_depth(png: jax.Array) -> jax.Array:
    return png.astype(jnp.float32) / 256.0
