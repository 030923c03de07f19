"""Forward surface-splat renderer — the TPU-native fast path for the
reference's raycast surface (ITMVisualisationEngine previews / ICP model,
reference use sites: src/DenseSLAM/InfiniTamDriver.cpp:229-277).

WHY NOT RAY MARCHING ON TPU: a sphere-tracing scan needs per-step
computed-index gathers over the whole voxel pool; element-granular gathers
cost ~10 ns/element on this hardware (serial, data-dependent — see
.claude/skills/verify/SKILL.md), so 453k rays x 192 steps x 18 gathered
elements is ~17 s/frame no matter how the loop is organised. The splat
formulation inverts the access pattern to match the hardware: iterate the
allocated blocks DENSELY (row reads, DMA-friendly), project near-surface
voxels forward into the image, and resolve occlusion with one scatter-min
z-buffer — total element-granular traffic is bounded by the near-surface
voxel count (~10^5), not rays x steps.

Identity-through-the-key idiom (no multi-operand sorts, which explode
compile time on this backend): every sort carries a single int32 whose low
bits ARE the payload (slot id / voxel id); the z-buffer winner is recovered
by re-reading the scatter-min result and comparing quantized depths.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import numpy as np
import jax.numpy as jnp

from ..config import TsdfConfig
from ..utils.camera import Intrinsics
from . import hash as vhash
from . import tsdf as tsdf_ops

_I32_MAX = np.int32(2**31 - 1)


class SplatConfig(NamedTuple):
    """Static caps for the splat pipeline (compile-time shapes).
    Defaults mirror config.SplatParams (see its docstring for why
    surface_eta is 0.8 — grazing-ground coverage)."""
    max_blocks: int = 2048        # frustum-visible block cap
    max_voxels: int = 1 << 19     # near-surface voxel cap (524k)
    surface_eta: float = 0.8      # |tsdf| threshold for "near surface"
    z_bits: int = 12              # z-buffer depth quantisation bits
    fill_levels: int = 3          # pull-push hole-fill pyramid depth
    # occlusion-aware fill (bleed suppression): a hit whose depth exceeds
    # the min-pooled neighbourhood depth by more than
    # `up * bleed_rel + bleed_abs` is background BLEED-THROUGH — a ray
    # slipping between a near surface's point splats and winning the
    # z-buffer with whatever lies behind (measured: raw splat MAE 2.6 m
    # vs the exact raycast's 0.25 m on the same GT-pose map, errors
    # almost all on the far side). Such hits are overridden with the
    # neighbourhood foreground estimate (refine_depth then snaps them to
    # the true surface, or prune invalidates them honestly). 0 rel+abs
    # disables the override (pure hole fill).
    bleed_rel: float = 0.0
    bleed_abs: float = 0.0


def _fill_holes(depth: jax.Array, levels: int,
                bleed_rel: float = 0.0, bleed_abs: float = 0.0) -> jax.Array:
    """Pull-push hole fill: voxel splats land ~fx*voxel/z px apart, so near
    surfaces leave holes between splats; fill them from min-pooled coarser
    levels (purely vectorised image ops). depth 0 = miss. With
    bleed_rel/bleed_abs > 0, hits FAR BEHIND the neighbourhood min are
    overridden too (see SplatConfig.bleed_rel)."""
    if levels <= 0:
        return depth
    pyr = [depth]
    d = depth
    for _ in range(levels):
        h2, w2 = d.shape[0] // 2, d.shape[1] // 2
        d4 = d[: h2 * 2, : w2 * 2].reshape(h2, 2, w2, 2)
        big = jnp.where(d4 > 0, d4, jnp.float32(np.inf))
        dmin = jnp.min(jnp.min(big, axis=3), axis=1)
        d = jnp.where(jnp.isfinite(dmin), dmin, 0.0)
        pyr.append(d)
    suppress = bleed_rel > 0.0 or bleed_abs > 0.0
    for lv in range(levels - 1, -1, -1):
        tgt = pyr[lv]
        up = jnp.repeat(jnp.repeat(pyr[lv + 1], 2, axis=0), 2, axis=1)
        ph = tgt.shape[0] - up.shape[0]
        pw = tgt.shape[1] - up.shape[1]
        if ph or pw:
            up = jnp.pad(up, ((0, max(ph, 0)), (0, max(pw, 0))), mode="edge")
        up = up[: tgt.shape[0], : tgt.shape[1]]
        keep = tgt > 0
        if suppress:
            keep = keep & ~((up > 0)
                            & (tgt > up * (1.0 + bleed_rel) + bleed_abs))
        pyr[lv] = jnp.where(keep, tgt, up)
    return pyr[0]


def splat_render(
    m: tsdf_ops.MapState,
    T_wc: jax.Array,
    intr: Intrinsics,
    cfg: TsdfConfig,
    sc: SplatConfig = SplatConfig(),
):
    """Render depth/points/normals/color from the map by forward splatting.

    Returns an ops.raycast.Raycast (same contract as `raycast.raycast`):
    depth 0 = miss; normals are image-space (cross products over the depth
    image, like the marching renderer's tail)."""
    from . import raycast as rc_ops

    h, w = intr.height, intr.width
    n_pix = h * w
    vsz = cfg.voxel_size_m
    block_m = cfg.block_size_m
    s = m.num_slots
    T_cw = jnp.linalg.inv(T_wc)
    Rcw = T_cw[:3, :3]
    tcw = T_cw[:3, 3]

    # ---- 1. frustum-visible allocated blocks --------------------------------
    bx, by, bz = vhash.unpack_xyz(m.table.keys)
    cxw = (bx.astype(jnp.float32) + 0.5) * block_m
    cyw = (by.astype(jnp.float32) + 0.5) * block_m
    czw = (bz.astype(jnp.float32) + 0.5) * block_m
    pcx = Rcw[0, 0] * cxw + Rcw[0, 1] * cyw + Rcw[0, 2] * czw + tcw[0]
    pcy = Rcw[1, 0] * cxw + Rcw[1, 1] * cyw + Rcw[1, 2] * czw + tcw[1]
    pcz = Rcw[2, 0] * cxw + Rcw[2, 1] * cyw + Rcw[2, 2] * czw + tcw[2]
    marg = 0.87 * block_m  # half block diagonal
    zok = (pcz > cfg.min_depth_m - marg) & (pcz < cfg.max_depth_m + marg)
    zs = jnp.maximum(pcz, 1e-3)
    uc = pcx / zs * intr.fx + intr.cx
    vc = pcy / zs * intr.fy + intr.cy
    pad = marg / zs * intr.fx
    inim = (uc > -pad) & (uc < w - 1 + pad) & (vc > -pad) & (vc < h - 1 + pad)
    bmask = m.table.valid & zok & inim

    # ---- 2. block compaction: identity-in-key sort --------------------------
    slot_bits = max(1, int(s - 1).bit_length())
    bkey = jnp.where(bmask, jax.lax.iota(jnp.int32, s),
                     jnp.int32(1) << slot_bits)
    rows = jnp.sort(bkey)[: sc.max_blocks]          # ascending slot ids first
    rmask = rows < (jnp.int32(1) << slot_bits)
    rows = jnp.where(rmask, rows, 0)

    # ---- 3. dense row reads of the compact visible set ----------------------
    ct = m.tsdf[rows].astype(jnp.float32)            # (V, 512) row gather
    cw_ = m.weight[rows].astype(jnp.float32)
    cc = m.color[rows]
    ckeys = jnp.where(rmask, m.table.keys[rows], vhash.EMPTY_KEY)

    # ---- 4. near-surface voxel compaction -----------------------------------
    near = rmask[:, None] & (cw_ > 0) & (jnp.abs(ct) < sc.surface_eta)
    nv = sc.max_blocks * tsdf_ops.BLOCK_VOL
    vox_bits = max(1, int(nv - 1).bit_length())
    vid = jax.lax.broadcasted_iota(jnp.int32, near.shape, 0) * \
        jnp.int32(tsdf_ops.BLOCK_VOL) + \
        jax.lax.broadcasted_iota(jnp.int32, near.shape, 1)
    vkey = jnp.where(near, vid, jnp.int32(1) << vox_bits).reshape(-1)
    cvox = jnp.sort(vkey)[: sc.max_voxels]           # ascending voxel ids
    vmask = cvox < (jnp.int32(1) << vox_bits)
    cvox = jnp.where(vmask, cvox, 0)
    vrow = cvox >> 9                                  # block row in compact set
    voff = cvox & 511

    # per-voxel attribute gathers — small, ascending-index (coherent)
    sdf = ct.reshape(-1)[cvox]
    col = cc.reshape(-1)[cvox]
    vbk = ckeys[vrow]
    gx, gy, gz = vhash.unpack_xyz(vbk)
    ox = voff & 7
    oy = (voff >> 3) & 7
    oz = voff >> 6
    wx = ((gx * tsdf_ops.BLOCK + ox).astype(jnp.float32) + 0.5) * vsz
    wy = ((gy * tsdf_ops.BLOCK + oy).astype(jnp.float32) + 0.5) * vsz
    wz = ((gz * tsdf_ops.BLOCK + oz).astype(jnp.float32) + 0.5) * vsz

    # ---- 5. project + z-buffer scatter-min ----------------------------------
    px = Rcw[0, 0] * wx + Rcw[0, 1] * wy + Rcw[0, 2] * wz + tcw[0]
    py = Rcw[1, 0] * wx + Rcw[1, 1] * wy + Rcw[1, 2] * wz + tcw[1]
    pz = Rcw[2, 0] * wx + Rcw[2, 1] * wy + Rcw[2, 2] * wz + tcw[2]
    # surface point: push the voxel centre along the viewing ray by sdf*mu
    # (first-order surface estimate — the voxel's signed distance is along
    # the surface normal, but along-ray is exact for front-facing surfaces
    # up to the normal/ray angle; the z-test keeps the nearest estimate).
    zray = jnp.sqrt(px * px + py * py + pz * pz)
    corr = sdf * cfg.trunc_dist_m * (pz / jnp.maximum(zray, 1e-6))
    zsurf = pz + corr
    zc = jnp.maximum(pz, 1e-6)
    ui = jnp.round(px / zc * intr.fx + intr.cx).astype(jnp.int32)
    vi = jnp.round(py / zc * intr.fy + intr.cy).astype(jnp.int32)
    ok = (
        vmask & (zsurf > cfg.min_depth_m) & (zsurf < cfg.max_depth_m)
        & (ui >= 0) & (ui < w) & (vi >= 0) & (vi < h)
    )
    pix = jnp.where(ok, vi * w + ui, n_pix)          # dummy pixel when masked
    # ONE scatter-min resolves occlusion AND elects the winner: the key
    # packs quantized depth in the high bits and the compact voxel index in
    # the low bits (identity-through-the-key), so the per-pixel min is the
    # nearest voxel, ties broken by lowest index CONSISTENTLY for depth and
    # color. This replaces the previous scatter-min + won-recovery gather +
    # two attribute scatters (4 element-granular passes -> 1 scatter + 2
    # coherent gathers over the compact arrays), and the recovered depth is
    # the winner's exact f32 zsurf, not its quantized bucket.
    n_vox = int(zsurf.shape[0])            # per-shard count under shard_map
    cvox_bits = max(1, int(n_vox - 1).bit_length())
    # z_bits shrinks if the voxel index needs more room (the recovered
    # depth is the winner's exact f32 zsurf either way — z quantisation
    # only decides occlusion ties between voxels < 1 bucket apart)
    z_bits = min(sc.z_bits, 31 - cvox_bits)
    if z_bits < 8:
        raise ValueError(
            f"max_voxels {n_vox} leaves z_bits={z_bits} < 8 in the packed "
            "int32 z-buffer key; lower max_voxels")
    zscale = (1 << z_bits) / cfg.max_depth_m
    # clip to max-2 so every valid key stays strictly below the _I32_MAX
    # miss sentinel even at the largest voxel index
    zq = jnp.clip((zsurf * zscale).astype(jnp.int32), 0,
                  (1 << z_bits) - 2)
    vidx = jax.lax.iota(jnp.int32, n_vox)
    key = jnp.where(ok, (zq << cvox_bits) | vidx, _I32_MAX)
    zbuf = jnp.full((n_pix + 1,), _I32_MAX, dtype=jnp.int32)
    zbuf = zbuf.at[pix].min(key, mode="promise_in_bounds")

    # ---- 6. winner recovery: coherent gathers by the elected voxel index ----
    win = zbuf[:n_pix]
    won = win != _I32_MAX
    wv = jnp.where(won, win & ((1 << cvox_bits) - 1), 0)
    dflat = jnp.where(won, zsurf[wv], 0.0)
    cflat = jnp.where(won, col[wv], 0)

    depth = dflat.reshape(h, w)
    depth = _fill_holes(depth, sc.fill_levels, sc.bleed_rel, sc.bleed_abs)
    hit = depth > 0

    # ---- 7. per-pixel geometry (vectorised, no gathers) ---------------------
    vv = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    uu = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    cx_ = (uu - intr.cx) / intr.fx * depth
    cy_ = (vv - intr.cy) / intr.fy * depth
    R = T_wc[:3, :3]
    t = T_wc[:3, 3]
    pxw = R[0, 0] * cx_ + R[0, 1] * cy_ + R[0, 2] * depth + t[0]
    pyw = R[1, 0] * cx_ + R[1, 1] * cy_ + R[1, 2] * depth + t[1]
    pzw = R[2, 0] * cx_ + R[2, 1] * cy_ + R[2, 2] * depth + t[2]
    z0 = jnp.zeros_like(pxw)
    pxw = jnp.where(hit, pxw, z0)
    pyw = jnp.where(hit, pyw, z0)
    pzw = jnp.where(hit, pzw, z0)
    nx, ny, nz, n_ok = rc_ops._normals_soA(pxw, pyw, pzw, hit)

    cr, cg, cb = tsdf_ops.unpack_rgb(cflat.reshape(h, w))
    cr = jnp.where(hit, cr, 0.0)
    cg = jnp.where(hit, cg, 0.0)
    cb = jnp.where(hit, cb, 0.0)

    return rc_ops.Raycast(
        depth=depth,
        points=jnp.stack([pxw, pyw, pzw], axis=-1),
        normals=jnp.stack([nx, ny, nz], axis=-1),
        mask=hit,
        color=jnp.stack([cr, cg, cb], axis=-1),
    )


def refine_depth(
    m: tsdf_ops.MapState,
    depth: jax.Array,          # (H, W) splat depth, 0 = miss
    mask: jax.Array,           # (H, W) hit mask
    T_wc: jax.Array,
    intr: Intrinsics,
    cfg: TsdfConfig,
    steps: int = 2,
    prune_sdf: float = 0.0,
):
    """Sub-voxel depth refinement: sphere-tracing correction steps from the
    splat estimate using trilinear TSDF samples (the reference raycaster's
    final refinement, ITM sphere tracing tail). The splat depth is within
    ~half a voxel of the zero crossing, so 1-2 Newton-style steps
    (d += sdf * mu along the ray) converge; cost is 8 pool lookups per
    hit pixel per step — use via `PipelineConfig.splat_refine` when ICP /
    depth-eval accuracy matters more than the ~30 ms/step at KITTI res.

    prune_sdf > 0 additionally INVALIDATES pixels whose refined point
    samples an inconsistent field (|tsdf| > prune_sdf, or unobserved
    space): the pull-push hole fill fabricates depth in disocclusions
    (foreground depth pulled over background), and those fabrications are
    exactly the pixels that cannot be reconciled with the TSDF — pruning
    turns multi-metre tail errors into honest misses."""
    h, w = depth.shape
    mu = cfg.trunc_dist_m
    vv = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    uu = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    dirx_c = (uu - intr.cx) / intr.fx
    diry_c = (vv - intr.cy) / intr.fy
    R = T_wc[:3, :3]
    t = T_wc[:3, 3]
    d = depth
    sdf = jnp.zeros_like(depth)
    wmin = jnp.zeros_like(depth)
    for _ in range(steps):
        cx = dirx_c * d
        cy = diry_c * d
        px = R[0, 0] * cx + R[0, 1] * cy + R[0, 2] * d + t[0]
        py = R[1, 0] * cx + R[1, 1] * cy + R[1, 2] * d + t[1]
        pz = R[2, 0] * cx + R[2, 1] * cy + R[2, 2] * d + t[2]
        sdf, wmin = tsdf_ops.sample_tsdf_trilinear_xyz(m, px, py, pz, cfg)
        ok = mask & (wmin > 0) & (jnp.abs(sdf) < 1.0)
        d = jnp.where(ok, jnp.maximum(d + sdf * mu, cfg.min_depth_m), d)
    if prune_sdf > 0:
        mask = mask & (wmin > 0) & (jnp.abs(sdf) < prune_sdf)
    return jnp.where(mask, d, 0.0)
