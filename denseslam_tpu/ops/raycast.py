"""TSDF raycasting: the ITMVisualisationEngine equivalent
(reference surface: SURVEY.md section 2b, use sites
src/DenseSLAM/InfiniTamDriver.cpp:229-277 GetImage/GetFloatImage).

Design: bounded-step sphere-tracing DDA, one `lax.scan` over a static step
count with all H*W rays in flight — per-ray divergence becomes masked lanes,
empty space is skipped at block granularity (a hash miss lets the ray jump a
whole block), and near the surface the step follows the sampled SDF. All
marching state is SoA ((N,) planes — see the layout rule in ops/hash.py);
the (H, W, 3) point/normal maps are materialised exactly once as outputs.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import TsdfConfig
from ..utils.camera import Intrinsics
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

    vv = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0).reshape(-1)
    uu = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1).reshape(-1)
    dcx = (uu - intr.cx) / intr.fx
    dcy = (vv - intr.cy) / intr.fy
    R = T_wc[:3, :3]
    t = T_wc[:3, 3]
    dx = R[0, 0] * dcx + R[0, 1] * dcy + R[0, 2]
    dy = R[1, 0] * dcx + R[1, 1] * dcy + R[1, 2]
    dz = R[2, 0] * dcx + R[2, 1] * dcy + R[2, 2]
    norm = jnp.sqrt(dx * dx + dy * dy + dz * dz)
    inv_n = 1.0 / jnp.maximum(norm, 1e-9)
    ux, uy, uz = dx * inv_n, dy * inv_n, dz * inv_n

    n = h * w
    t0 = jnp.full((n,), cfg.min_depth_m, dtype=jnp.float32)
    t_max = cfg.max_depth_m * norm

    def step(carry, _):
        t_cur, prev_sdf, prev_alloc, prev_t, hit_t, done = carry
        px = t[0] + ux * t_cur
        py = t[1] + uy * t_cur
        pz = t[2] + uz * t_cur
        sdf, wgt = tsdf_ops.sample_tsdf_xyz(m, px, py, pz, cfg)
        allocated = wgt > 0.0

        # Crossings require BOTH samples observed: entering a negative
        # region straight from unallocated space is a back-side phantom
        # (matters at the map frontier and for sharded-min combining).
        crossed = allocated & prev_alloc & (prev_sdf > 0.0) & (sdf <= 0.0) & ~done
        denom = prev_sdf - sdf
        frac = jnp.where(jnp.abs(denom) > 1e-6,
                         prev_sdf / jnp.maximum(denom, 1e-6), 0.5)
        t_surf = prev_t + (t_cur - prev_t) * frac
        hit_t = jnp.where(crossed, t_surf, hit_t)
        done = done | crossed | (t_cur > t_max)

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
    (tf, _, _, _, hit_t, done), _ = jax.lax.scan(
        step, init, None, length=cfg.raycast_steps
    )

    hit = hit_t > 0.0
    px = t[0] + ux * hit_t
    py = t[1] + uy * hit_t
    pz = t[2] + uz * hit_t

    # One trilinear secant refinement: x' = x - sdf(x) * mu * dir.
    sdf_tri, _ = tsdf_ops.sample_tsdf_trilinear_xyz(m, px, py, pz, cfg)
    corr = jnp.where(hit, sdf_tri * mu, 0.0)
    px = px - ux * corr
    py = py - uy * corr
    pz = pz - uz * corr

    # Depth in the raycast camera: z-row of T_cw applied to the point.
    rx = px - t[0]
    ry = py - t[1]
    rz = pz - t[2]
    depth = R[0, 2] * rx + R[1, 2] * ry + R[2, 2] * rz
    depth = jnp.where(hit, depth, 0.0).reshape(h, w)
    hit2 = depth > 0

    pxi = jnp.where(hit, px, 0.0).reshape(h, w)
    pyi = jnp.where(hit, py, 0.0).reshape(h, w)
    pzi = jnp.where(hit, pz, 0.0).reshape(h, w)
    nx, ny, nz, n_ok = _normals_soA(pxi, pyi, pzi, hit2)

    cr, cg, cb = tsdf_ops.sample_color_xyz(m, px, py, pz, cfg)
    cr = jnp.where(hit, cr, 0.0).reshape(h, w)
    cg = jnp.where(hit, cg, 0.0).reshape(h, w)
    cb = jnp.where(hit, cb, 0.0).reshape(h, w)

    # materialise (H, W, 3) outputs exactly once
    points = jnp.stack([pxi, pyi, pzi], axis=-1)
    normals = jnp.stack([nx, ny, nz], axis=-1)
    color = jnp.stack([cr, cg, cb], axis=-1)
    return Raycast(depth=depth, points=points, normals=normals,
                   mask=hit2, color=color)


def _normals_soA(px, py, pz, mask):
    """Image-space normals via cross products of neighbour differences."""
    def ddx(a):
        d = jnp.roll(a, -1, axis=1) - jnp.roll(a, 1, axis=1)
        return d.at[:, 0].set(0.0).at[:, -1].set(0.0)

    def ddy(a):
        d = jnp.roll(a, -1, axis=0) - jnp.roll(a, 1, axis=0)
        return d.at[0, :].set(0.0).at[-1, :].set(0.0)

    ax, ay, az = ddy(px), ddy(py), ddy(pz)
    bx, by, bz = ddx(px), ddx(py), ddx(pz)
    nx = ay * bz - az * by
    ny = az * bx - ax * bz
    nz = ax * by - ay * bx
    nn = jnp.sqrt(nx * nx + ny * ny + nz * nz)
    inv = 1.0 / jnp.maximum(nn, 1e-9)
    ok = (
        mask
        & jnp.roll(mask, -1, axis=1) & jnp.roll(mask, 1, axis=1)
        & jnp.roll(mask, -1, axis=0) & jnp.roll(mask, 1, axis=0)
        & (nn > 1e-9)
    )
    z = jnp.zeros_like(nx)
    return (
        jnp.where(ok, nx * inv, z),
        jnp.where(ok, ny * inv, z),
        jnp.where(ok, nz * inv, z),
        ok,
    )


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
