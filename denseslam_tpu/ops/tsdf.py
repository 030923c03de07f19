"""Voxel-hashed TSDF volume: allocate / integrate / de-integrate / decay /
sliding-window — the ITMLib dense-mapper equivalent (SURVEY.md section 2b),
re-designed as fixed-shape data-parallel updates over a slot-indexed block
pool.

Layout: a block is 8x8x8 voxels stored flat as 512 = 4x128 lanes — exactly
one float32 (8,128)-tile pair per block, so every per-voxel op vectorises
onto the VPU with zero padding waste. Block identity is a PACKED int32 key
(ops/hash.py) and ALL hot-path math is structure-of-arrays: separate
x/y/z/u/v planes, never (N, 3) intermediates (see the layout rule in
ops/hash.py — minor-dim-3 tensors pad 42x on TPU and wreck compile and run
time). Color is packed RGB in one int32 per voxel (as ITM's u8 voxel colors
are packed, reference ITMVoxel surface).

Semantics mirrored from the reference driver surface:
  * IntegrateLocalMap / DeIntegrateLocalMap with optional depth weighting
    (reference: src/DenseSLAM/InfiniTamDriver.h:187-199,
     src/DenseSLAM/SystemEntry.cpp:183-187),
  * Decay / DecayCatchup: voxel GC by (weight < max_decay_weight,
    age > min_decay_age) + block reclamation with freed-memory accounting
    (reference: src/DenseSLAM/InfiniTamDriver.h:274-331, 366-370),
  * SlideWindow: evict blocks older than max_age
    (reference: src/DenseSLAM/InfiniTamDriver.h:294-310),
  * memory accounting bytes = voxel_bytes * 512 * allocated_blocks
    (reference: src/DenseSLAM/InfiniTamDriver.h:333-352).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import TsdfConfig
from ..utils import lie
from ..utils.camera import Intrinsics
from . import hash as vhash

BLOCK = 8
BLOCK_VOL = BLOCK * BLOCK * BLOCK  # 512


def _voxel_off_xyz():
    """Three (512,) int32 arrays: voxel offsets within a block, x fastest."""
    idx = jnp.arange(BLOCK_VOL, dtype=jnp.int32)
    return idx % BLOCK, (idx // BLOCK) % BLOCK, idx // (BLOCK * BLOCK)


def _voxel_offsets() -> jax.Array:
    """(512, 3) offsets — cold paths (meshing) only."""
    x, y, z = _voxel_off_xyz()
    return jnp.stack([x, y, z], axis=-1)


# -- packed RGB helpers ------------------------------------------------------

def pack_rgb(r: jax.Array, g: jax.Array, b: jax.Array) -> jax.Array:
    """Float [0,255] channels -> packed int32 (r | g<<8 | b<<16)."""
    ri = jnp.clip(r, 0, 255).astype(jnp.int32)
    gi = jnp.clip(g, 0, 255).astype(jnp.int32)
    bi = jnp.clip(b, 0, 255).astype(jnp.int32)
    return ri | (gi << 8) | (bi << 16)


def unpack_rgb(p: jax.Array):
    return (
        (p & 0xFF).astype(jnp.float32),
        ((p >> 8) & 0xFF).astype(jnp.float32),
        ((p >> 16) & 0xFF).astype(jnp.float32),
    )


def pack_gray(gray: jax.Array) -> jax.Array:
    return pack_rgb(gray, gray, gray)


class MapState(NamedTuple):
    """One submap's TSDF volume. A pytree of fixed-shape arrays."""
    table: vhash.HashTable          # packed-key table (S,)
    tsdf: jax.Array                 # f32 (S, 512), init +1 (free space)
    weight: jax.Array               # f32 (S, 512)
    color: jax.Array                # i32 (S, 512) packed RGB
    alloc_frame: jax.Array          # i32 (S,) frame at which slot was allocated
    last_seen: jax.Array            # i32 (S,) last frame the block was visible
    frame: jax.Array                # i32 () current frame counter
    decayed_blocks: jax.Array       # i32 () total blocks reclaimed by decay
    overflow: jax.Array             # i32 () dropped allocations

    @property
    def num_slots(self) -> int:
        return self.tsdf.shape[0]


def storage_dtype(cfg: TsdfConfig):
    return jnp.bfloat16 if cfg.storage_dtype == "bfloat16" else jnp.float32


def make_map(cfg: TsdfConfig) -> MapState:
    s = cfg.table_slots
    sd = storage_dtype(cfg)
    return MapState(
        table=vhash.make_table(s),
        tsdf=jnp.ones((s, BLOCK_VOL), dtype=sd),
        weight=jnp.zeros((s, BLOCK_VOL), dtype=sd),
        color=jnp.zeros((s, BLOCK_VOL), dtype=jnp.int32),
        alloc_frame=jnp.zeros((s,), dtype=jnp.int32),
        last_seen=jnp.zeros((s,), dtype=jnp.int32),
        frame=jnp.zeros((), dtype=jnp.int32),
        decayed_blocks=jnp.zeros((), dtype=jnp.int32),
        overflow=jnp.zeros((), dtype=jnp.int32),
    )


def num_allocated_blocks(m: MapState) -> jax.Array:
    return jnp.sum(m.table.valid.astype(jnp.int32))


def used_memory_bytes(m: MapState, voxel_bytes: int = 16) -> jax.Array:
    """ITMVoxel-equivalent accounting (InfiniTamDriver.h:333-352)."""
    return num_allocated_blocks(m) * (voxel_bytes * BLOCK_VOL)


# ---------------------------------------------------------------------------
# Allocation
# ---------------------------------------------------------------------------

def touched_block_keys(
    depth: jax.Array,          # (H, W) meters, 0 = invalid
    T_wc: jax.Array,
    intr: Intrinsics,
    cfg: TsdfConfig,
    row0=None,
) -> jax.Array:
    """Packed keys of blocks in the truncation band of each depth sample —
    (k*H*W/s^2,) int32, EMPTY_KEY where invalid. Fully SoA.

    row0 (optional, traced int32 ok): when given, `depth` is an ALREADY
    alloc-subsampled ROW SLAB whose first row is subsampled row `row0` of
    the full image — the seam that lets the sharded map divide key
    generation across devices (parallel/sharded_map.py exchange alloc)."""
    s = cfg.alloc_subsample
    if row0 is None:
        if s > 1:
            depth = depth[::s, ::s]
        row0 = 0
    h, w = depth.shape
    mu = cfg.trunc_dist_m
    block_m = cfg.block_size_m
    inv_block = 1.0 / block_m
    v = (jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
         + jnp.asarray(row0, jnp.float32)) * float(s)
    u = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) * float(s)
    dirx = (u - intr.cx) / intr.fx
    diry = (v - intr.cy) / intr.fy
    valid = (depth > cfg.min_depth_m) & (depth < cfg.max_depth_m)

    k = max(3, math.ceil(2.0 * mu / block_m) + 2)
    R = T_wc[:3, :3]
    t = T_wc[:3, 3]

    keys = []
    for i in range(k):
        d = depth + (-mu + 2.0 * mu * i / (k - 1))
        pcx = dirx * d
        pcy = diry * d
        pcz = d
        wx = R[0, 0] * pcx + R[0, 1] * pcy + R[0, 2] * pcz + t[0]
        wy = R[1, 0] * pcx + R[1, 1] * pcy + R[1, 2] * pcz + t[1]
        wz = R[2, 0] * pcx + R[2, 1] * pcy + R[2, 2] * pcz + t[2]
        bx = jnp.floor(wx * inv_block).astype(jnp.int32)
        by = jnp.floor(wy * inv_block).astype(jnp.int32)
        bz = jnp.floor(wz * inv_block).astype(jnp.int32)
        keys.append(vhash.pack_xyz(bx, by, bz, valid).reshape(-1))
    return jnp.concatenate(keys, axis=0)


def allocate_for_frame(
    m: MapState,
    depth: jax.Array,
    T_wc: jax.Array,
    intr: Intrinsics,
    cfg: TsdfConfig,
    key_filter=None,
) -> Tuple[MapState, jax.Array, jax.Array]:
    """Allocate blocks touched by this frame; returns (map, visible_slots
    (max_visible_blocks,), visible_mask) — the static-cap analogue of ITM's
    visible-entry list.

    key_filter (optional, keys -> keys) drops blocks this table must not
    own by mapping them to EMPTY_KEY — the spatial-ownership seam for the
    sharded map (parallel/sharded_map.py): each shard allocates (and hence
    integrates / de-integrates / corrects) only the blocks it owns."""
    keys = touched_block_keys(depth, T_wc, intr, cfg)
    if key_filter is not None:
        keys = key_filter(keys)
    uniq, umask, total = vhash.unique_keys(keys, cfg.max_visible_blocks)
    return allocate_keys(m, uniq, umask, total, cfg)


def allocate_keys(
    m: MapState,
    uniq: jax.Array,           # (max_visible_blocks,) deduplicated keys
    umask: jax.Array,          # (max_visible_blocks,) bool
    total: jax.Array,          # unique count BEFORE the cap (overflow stat)
    cfg: TsdfConfig,
) -> Tuple[MapState, jax.Array, jax.Array]:
    """Insert pre-deduplicated keys (allocate_for_frame minus key-gen) —
    entry point for callers that produced the frame's unique key set some
    other way (the sharded map's owner-routed key exchange)."""
    table, slots, fresh = vhash.insert_keys(m.table, uniq, umask, cfg.probe_len)
    live = umask & (slots >= 0)

    widx = jnp.where(fresh, slots, m.num_slots)
    # Defensively clear freshly claimed slots: a freed slot's voxel data may
    # be dirty (e.g. the batched fuse path can write into a slot after it
    # was freed earlier in the same chunk).
    m = m._replace(
        tsdf=m.tsdf.at[widx].set(1.0, mode="drop"),
        weight=m.weight.at[widx].set(0.0, mode="drop"),
        color=m.color.at[widx].set(0, mode="drop"),
    )
    alloc_frame = m.alloc_frame.at[widx].set(m.frame, mode="drop")
    seen_idx = jnp.where(live, slots, m.num_slots)
    last_seen = m.last_seen.at[seen_idx].set(m.frame, mode="drop")

    dropped = jnp.maximum(total - jnp.int32(cfg.max_visible_blocks), 0)
    failed = jnp.sum((umask & (slots < 0)).astype(jnp.int32))
    m = m._replace(
        table=table,
        alloc_frame=alloc_frame,
        last_seen=last_seen,
        overflow=m.overflow + dropped + failed,
    )
    return m, jnp.where(live, slots, -1), live


# ---------------------------------------------------------------------------
# Integrate / de-integrate
# ---------------------------------------------------------------------------

def _bilinear_soA(img: jax.Array, u: jax.Array, v: jax.Array):
    """Bilinear sample of (H, W) img at SoA coords; returns (val, inb)."""
    h, w = img.shape
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    du = u - u0
    dv = v - v0
    u0i = u0.astype(jnp.int32)
    v0i = v0.astype(jnp.int32)
    inb = (u0i >= 0) & (u0i < w - 1) & (v0i >= 0) & (v0i < h - 1)
    u0c = jnp.clip(u0i, 0, w - 2)
    v0c = jnp.clip(v0i, 0, h - 2)
    flat = img.reshape(-1)
    base = v0c * w + u0c
    p00 = flat[base]
    p01 = flat[base + 1]
    p10 = flat[base + w]
    p11 = flat[base + w + 1]
    val = (
        p00 * (1 - du) * (1 - dv) + p01 * du * (1 - dv)
        + p10 * (1 - du) * dv + p11 * du * dv
    )
    corners_min = jnp.minimum(jnp.minimum(p00, p01), jnp.minimum(p10, p11))
    corners_max = jnp.maximum(jnp.maximum(p00, p01), jnp.maximum(p10, p11))
    return val, inb, p00, corners_min, corners_max


def _depth_sample_soA(depth: jax.Array, u: jax.Array, v: jax.Array,
                      max_gap_m: float):
    """Edge-aware bilinear depth sample (SoA depth_bilinear_sample)."""
    val, inb, nn, cmin, cmax = _bilinear_soA(depth, u, v)
    all_valid = cmin > 0
    smooth = all_valid & ((cmax - cmin) < max_gap_m)
    out = jnp.where(smooth, val, nn)
    ok = inb & (out > 0)
    return jnp.where(ok, out, 0.0), ok


def _fusion_geometry(m, visible_slots, visible_mask, T_wc, intr, cfg):
    """Camera-frame voxel positions for the visible set, fully SoA.

    Returns (u, v, z) pixel coords + camera depth, each (V, 512)."""
    vsz = cfg.voxel_size_m
    T_cw = lie.inv_T(T_wc)
    R = T_cw[:3, :3]
    t = T_cw[:3, 3]
    safe = jnp.where(visible_mask, visible_slots, 0)
    bkeys = m.table.keys[safe]
    bx, by, bz = vhash.unpack_xyz(bkeys)
    ox, oy, oz = _voxel_off_xyz()
    wx = ((bx[:, None] * BLOCK + ox[None, :]).astype(jnp.float32) + 0.5) * vsz
    wy = ((by[:, None] * BLOCK + oy[None, :]).astype(jnp.float32) + 0.5) * vsz
    wz = ((bz[:, None] * BLOCK + oz[None, :]).astype(jnp.float32) + 0.5) * vsz
    px = R[0, 0] * wx + R[0, 1] * wy + R[0, 2] * wz + t[0]
    py = R[1, 0] * wx + R[1, 1] * wy + R[1, 2] * wz + t[1]
    pz = R[2, 0] * wx + R[2, 1] * wy + R[2, 2] * wz + t[2]
    zc = jnp.where(jnp.abs(pz) > 1e-9, pz, 1e-9)
    u = px / zc * intr.fx + intr.cx
    v = py / zc * intr.fy + intr.cy
    return u, v, pz, safe


def integrate(
    m: MapState,
    visible_slots: jax.Array,
    visible_mask: jax.Array,
    depth: jax.Array,                       # (H, W) m
    color_packed: Optional[jax.Array],      # (H, W) packed RGB or None
    T_wc: jax.Array,
    intr: Intrinsics,
    cfg: TsdfConfig,
    sign: float = 1.0,
) -> MapState:
    """TSDF fusion over the visible block set. sign=+1 integrates, -1
    de-integrates (exact inverse when replayed with the identical view+pose
    — the property OnlineCorrection depends on, DenseSlam.cpp:390-403)."""
    mu = cfg.trunc_dist_m
    u, v, z, safe_slots = _fusion_geometry(
        m, visible_slots, visible_mask, T_wc, intr, cfg
    )
    # NOTE: the packed path must be sign-independent — de-integration must
    # replay the exact same (quantised) depth samples to be integrate's
    # exact inverse (OnlineCorrection's invariant).
    packed_gather = (
        cfg.gray_color_fusion and color_packed is not None
        and not cfg.bilinear_fusion
    )
    gray_samp = None
    if cfg.sampler == "pallas" and not cfg.bilinear_fusion:
        # Pallas tile-sampler path (ops/sampling.py): same 1 mm-quantised
        # nearest-pixel semantics as the packed gather below, but the image
        # access runs as per-block VMEM tile DMAs instead of 4M element
        # gathers. Near-field overflow blocks resolve via a compacted XLA
        # gather so semantics stay exact for every voxel.
        from . import sampling
        d_mm_img = jnp.clip(jnp.round(depth * 1000.0), 0, 65535).astype(
            jnp.int32)
        z_gated = jnp.where(visible_mask[:, None], z, 0.0)
        interpret = jax.default_backend() == "cpu"
        rgb_mode = color_packed is not None and not cfg.gray_color_fusion
        if rgb_mode:
            # true-RGB: two packed images, five-plane kernel
            r8, g8_, b8 = unpack_rgb(color_packed)
            img1 = jnp.where(depth > 0,
                             d_mm_img | (r8.astype(jnp.int32) << 16), 0)
            img2 = jnp.where(depth > 0,
                             g8_.astype(jnp.int32)
                             | (b8.astype(jnp.int32) << 8), 0)
            d_mm, cr_s, cg_s, cb_s, fits, over = sampling.tile_sample_rgb(
                img1, img2, u, v, z_gated, intr.width, intr.height,
                interpret=interpret)
            combo_fb = jnp.where(depth > 0, (d_mm_img << 8), 0)
        else:
            if color_packed is not None:
                g8 = jnp.clip(color_packed & 0xFF, 0, 255)
            else:
                g8 = jnp.zeros_like(d_mm_img)
            combo_fb = jnp.where(depth > 0, (d_mm_img << 8) | g8, 0)
            d_mm, gray, fits, over = sampling.tile_sample(
                combo_fb, u, v, z_gated, intr.width, intr.height,
                interpret=interpret)
        sel, d_mm_o, gray_o, ok_o = sampling.gather_fallback(
            combo_fb, u, v, z_gated, intr.width, intr.height, over,
            cfg.pallas_overflow_cap)
        d_mm = d_mm.at[sel].set(jnp.where(ok_o, d_mm_o, d_mm[sel]))
        fits = fits.at[sel].set(fits[sel] | ok_o)
        # overflow blocks beyond the fallback cap lose their out-of-tile
        # voxel samples — account for them like dropped allocations so the
        # bench's overflow==0 assertion keeps the numbers honest
        n_over = jnp.sum(over.astype(jnp.int32))
        m = m._replace(overflow=m.overflow + jnp.maximum(
            n_over - jnp.int32(cfg.pallas_overflow_cap), 0))
        if rgb_mode:
            # fallback color: one extra compacted gather of the RGB image
            ui_o = jnp.clip(jnp.round(u[sel]).astype(jnp.int32), 0,
                            intr.width - 1)
            vi_o = jnp.clip(jnp.round(v[sel]).astype(jnp.int32), 0,
                            intr.height - 1)
            cp_o = color_packed.reshape(-1)[vi_o * intr.width + ui_o]
            r_o, g_o, b_o = unpack_rgb(cp_o)
            cr_s = cr_s.at[sel].set(jnp.where(ok_o, r_o, cr_s[sel]))
            cg_s = cg_s.at[sel].set(jnp.where(ok_o, g_o, cg_s[sel]))
            cb_s = cb_s.at[sel].set(jnp.where(ok_o, b_o, cb_s[sel]))
            gray_samp = (cr_s, cg_s, cb_s)
        elif color_packed is not None:
            gray = gray.at[sel].set(jnp.where(ok_o, gray_o, gray[sel]))
            gray_samp = gray
        d_samp = d_mm * 1e-3
        d_valid = fits & (d_samp > 0)
        d_samp = jnp.where(d_valid, d_samp, 0.0)
    elif cfg.bilinear_fusion:
        d_samp, d_valid = _depth_sample_soA(depth, u, v, max_gap_m=mu)
    else:
        # nearest sample — single gather per voxel (ITM's choice)
        ui = jnp.round(u).astype(jnp.int32)
        vi = jnp.round(v).astype(jnp.int32)
        inb = (ui >= 0) & (ui < intr.width) & (vi >= 0) & (vi < intr.height)
        uc = jnp.clip(ui, 0, intr.width - 1)
        vc = jnp.clip(vi, 0, intr.height - 1)
        if packed_gather:
            # ONE gather for depth+luminance: depth as 16-bit mm (<<8) |
            # 8-bit gray. Element-granular image gathers are fusion's
            # dominant cost (~15-30 ns/elem); this halves them. 1 mm depth
            # quantisation is far below stereo noise at any range.
            d_mm = jnp.clip(jnp.round(depth * 1000.0), 0, 65535).astype(
                jnp.int32)
            g8 = jnp.clip(color_packed & 0xFF, 0, 255)
            combo = jnp.where(depth > 0, (d_mm << 8) | g8, 0)
            got = combo.reshape(-1)[vc * intr.width + uc]
            d_samp = (got >> 8).astype(jnp.float32) * 1e-3
            gray_samp = (got & 0xFF).astype(jnp.float32)
        else:
            d_samp = depth.reshape(-1)[vc * intr.width + uc]
        d_valid = inb & (d_samp > 0)
        d_samp = jnp.where(d_valid, d_samp, 0.0)

    sdf = d_samp - z
    upd = (
        visible_mask[:, None] & d_valid & (z > 1e-3)
        & (sdf > -mu) & (d_samp > cfg.min_depth_m)
    )
    eta = jnp.clip(sdf / mu, -1.0, 1.0)

    if cfg.weights.depth_weighting:
        wp = cfg.weights
        w_new = jnp.maximum(
            1.0, wp.max_new_w * (1.0 - jnp.clip(d_samp / wp.max_distance, 0.0, 1.0))
        )
    else:
        w_new = 1.0
    w_new = jnp.where(upd, w_new, 0.0)

    old_t = m.tsdf[safe_slots].astype(jnp.float32)
    old_w = m.weight[safe_slots].astype(jnp.float32)

    if sign > 0:
        new_w = jnp.minimum(old_w + w_new, cfg.max_weight)
        num = old_t * old_w + eta * w_new
        new_t = jnp.where(new_w > 0, num / jnp.maximum(new_w, 1e-6), 1.0)
    else:
        new_w = jnp.maximum(old_w - w_new, 0.0)
        num = old_t * old_w - eta * w_new
        new_t = jnp.where(new_w > 1e-6, num / jnp.maximum(new_w, 1e-6), 1.0)

    sidx = jnp.where(visible_mask, visible_slots, m.num_slots)
    out = m._replace(
        tsdf=m.tsdf.at[sidx].set(new_t.astype(m.tsdf.dtype), mode="drop"),
        weight=m.weight.at[sidx].set(new_w.astype(m.weight.dtype), mode="drop"),
    )

    if color_packed is not None and sign > 0:
        # nearest-pixel color, weight-led running average per channel
        if isinstance(gray_samp, tuple):
            cr, cg, cb = gray_samp       # true-RGB pallas samples
        elif gray_samp is not None:
            cr = cg = cb = gray_samp     # luminance came with the depth
        else:
            ui = jnp.clip(jnp.round(u).astype(jnp.int32), 0, intr.width - 1)
            vi = jnp.clip(jnp.round(v).astype(jnp.int32), 0, intr.height - 1)
            cp = color_packed.reshape(-1)[vi * intr.width + ui]
            cr, cg, cb = unpack_rgb(cp)
        c_upd = upd & (jnp.abs(sdf) < 0.5 * mu)
        cw = jnp.where(c_upd, w_new, 0.0)
        old_c = m.color[safe_slots]
        orr, og, ob = unpack_rgb(old_c)
        tot = jnp.maximum(old_w + cw, 1e-6)
        nr = (orr * old_w + cr * cw) / tot
        ng = (og * old_w + cg * cw) / tot
        nb = (ob * old_w + cb * cw) / tot
        new_c = pack_rgb(nr, ng, nb)
        out = out._replace(color=out.color.at[sidx].set(new_c, mode="drop"))
    return out


def deintegrate(m, visible_slots, visible_mask, depth, color_packed, T_wc,
                intr, cfg):
    return integrate(m, visible_slots, visible_mask, depth, color_packed,
                     T_wc, intr, cfg, sign=-1.0)


# ---------------------------------------------------------------------------
# Map regularisation: decay & sliding window
# ---------------------------------------------------------------------------

def decay(
    m: MapState,
    max_decay_weight: float,
    min_decay_age: int,
    force_all: bool = False,
    only_mask: Optional[jax.Array] = None,
) -> MapState:
    """Voxel GC: zero voxels with weight <= max_decay_weight in blocks older
    than min_decay_age; reclaim blocks left empty. `force_all` ignores the
    age gate (DecayCatchup semantics, InfiniTamDriver.h:315-331);
    `only_mask` (S,) restricts the pass to a block subset (the
    *DefusionPart variants, InfiniTamDriver.h:286-291)."""
    age = m.frame - m.alloc_frame
    eligible = m.table.valid & (force_all | (age >= min_decay_age))
    if only_mask is not None:
        eligible = eligible & only_mask
    wd = m.weight.dtype
    kill = eligible[:, None] & (m.weight <= max_decay_weight) & (m.weight > 0)
    weight = jnp.where(kill, jnp.zeros((), wd), m.weight)
    tsdf = jnp.where(kill, jnp.ones((), m.tsdf.dtype), m.tsdf)
    empty = eligible & jnp.all(weight <= 0.0, axis=-1)
    freed = jnp.sum(empty.astype(jnp.int32))
    table = vhash.free_mask(m.table, empty)
    return m._replace(
        table=table,
        tsdf=jnp.where(empty[:, None], jnp.ones((), m.tsdf.dtype), tsdf),
        weight=jnp.where(empty[:, None], jnp.zeros((), wd), weight),
        color=jnp.where(empty[:, None], 0, m.color),
        decayed_blocks=m.decayed_blocks + freed,
    )


def decay_catchup(m: MapState, max_decay_weight: float) -> MapState:
    """Run decay once ignoring age — sequence-end catch-up."""
    return decay(m, max_decay_weight, 0, force_all=True)


def decay_and_slide(
    m: MapState,
    max_decay_weight: float,
    min_decay_age: int,
    max_age: int,
) -> MapState:
    """decay() followed by slide_window() fused into ONE pool pass.

    Run separately these are the per-frame regularisation tail's two
    full-pool read+write rounds over tsdf/weight/color (~3 GB of HBM
    traffic at the 2^17-slot pool); combining the masks halves that.
    Semantics identical to slide_window(...) then decay(...) (the
    fuse_keyframe tail order): slide ages by alloc_frame, which decay
    never modifies, so the masks compose; decayed_blocks counts only
    blocks decay would have freed AFTER slide already evicted its set."""
    age = m.frame - m.alloc_frame
    eligible = m.table.valid & (age >= min_decay_age)
    wd = m.weight.dtype
    kill = eligible[:, None] & (m.weight <= max_decay_weight) & (m.weight > 0)
    w1 = jnp.where(kill, jnp.zeros((), wd), m.weight)
    empty = eligible & jnp.all(w1 <= 0.0, axis=-1)
    old = m.table.valid & (age > max_age)
    drop = empty | old
    freed = jnp.sum((empty & ~old).astype(jnp.int32))
    table = vhash.free_mask(m.table, drop)
    gone = drop[:, None]
    return m._replace(
        table=table,
        tsdf=jnp.where(gone | kill, jnp.ones((), m.tsdf.dtype), m.tsdf),
        weight=jnp.where(gone, jnp.zeros((), wd), w1),
        color=jnp.where(gone, 0, m.color),
        decayed_blocks=m.decayed_blocks + freed,
    )


def decay_defusion_part(m: MapState) -> MapState:
    """Reclaim blocks of the correction working set left empty by
    de-integration (reference: DecayDefusionPart,
    InfiniTamDriver.h:286-291 — the de-fuse/re-fuse replay gets its own
    bounded GC pass instead of waiting for the age-gated global decay).
    The working set = blocks touched this frame (last_seen == frame);
    max_decay_weight=0 makes this pure empty-block reclamation — surviving
    weights are never zeroed."""
    touched = m.last_seen == m.frame
    return decay(m, 0.0, 0, force_all=True, only_mask=touched)


def slide_window_defusion_part(m: MapState, max_age: int,
                               occupancy_floor: float = 0.02) -> MapState:
    """Evict stale near-empty blocks of the correction working set
    (reference: SlideWindowDefusionPart(scene, renderState, max_age,
    maxSize), InfiniTamDriver.h:304-308): after a replay, blocks that were
    de-integrated but not re-covered keep a few residual weighted voxels at
    the OLD pose — evict those older than max_age. Re-fused blocks carry a
    real occupied surface band (>> the occupancy floor) and survive."""
    occ = jnp.mean((m.weight > 0).astype(jnp.float32), axis=-1)
    touched = (m.last_seen == m.frame) & (occ < occupancy_floor)
    old = m.table.valid & touched & ((m.frame - m.alloc_frame) > max_age)
    table = vhash.free_mask(m.table, old)
    return m._replace(
        table=table,
        tsdf=jnp.where(old[:, None], jnp.ones((), m.tsdf.dtype), m.tsdf),
        weight=jnp.where(old[:, None], jnp.zeros((), m.weight.dtype),
                         m.weight),
        color=jnp.where(old[:, None], 0, m.color),
    )


def slide_window(m: MapState, max_age: int, by_last_seen: bool = False) -> MapState:
    """Evict blocks whose age exceeds the window (reference slide-window
    semantics keyed on allocation age; by_last_seen for visibility age)."""
    ref_frame = m.last_seen if by_last_seen else m.alloc_frame
    old = m.table.valid & ((m.frame - ref_frame) > max_age)
    table = vhash.free_mask(m.table, old)
    return m._replace(
        table=table,
        tsdf=jnp.where(old[:, None], jnp.ones((), m.tsdf.dtype), m.tsdf),
        weight=jnp.where(old[:, None], jnp.zeros((), m.weight.dtype), m.weight),
        color=jnp.where(old[:, None], 0, m.color),
    )


def reset(m: MapState, cfg: TsdfConfig) -> MapState:
    """ITMDenseMapper::ResetScene equivalent."""
    return make_map(cfg)


def gather_block_rows(m: MapState, slots: jax.Array):
    """Compact tunnel-crossing form of a map: the rows of the given slot
    indices (Npad,), plus table keys. The swap path's analogue of the
    reference's block-granular ITMSwappingEngine transfers
    (reference: src/DenseSLAM/DenseSlam.h:248-251) — the fixed pool is
    ~90-95% empty slots at street scale, so fetching only allocated rows
    cuts host<->device spill traffic ~10x. Pure gathers: no scatter, no
    sort (hot-path compile rules, ops/hash.py / CLAUDE.md)."""
    return (m.table.keys[slots], m.tsdf[slots], m.weight[slots],
            m.color[slots], m.alloc_frame[slots], m.last_seen[slots])


def rebuild_from_rows(
    inv_perm: jax.Array,        # (S,) int32: full-slot -> row index;
                                # rows.shape[0] (== Npad) selects "empty"
    keys_r: jax.Array,          # (Npad,)
    tsdf_r: jax.Array,          # (Npad, 512)
    weight_r: jax.Array,
    color_r: jax.Array,
    af_r: jax.Array,            # (Npad,)
    ls_r: jax.Array,
    frame: jax.Array,
    decayed_blocks: jax.Array,
    overflow: jax.Array,
) -> MapState:
    """Inverse of gather_block_rows: reconstruct the full fixed pool from
    compact rows via ONE gather per plane (a sentinel empty row is
    appended so unallocated slots read empty/free-space values — no
    scatter ever runs)."""
    keys_p = jnp.concatenate(
        [keys_r, jnp.full((1,), vhash.EMPTY_KEY, jnp.int32)])
    tsdf_p = jnp.concatenate(
        [tsdf_r, jnp.ones((1, BLOCK_VOL), tsdf_r.dtype)])
    weight_p = jnp.concatenate(
        [weight_r, jnp.zeros((1, BLOCK_VOL), weight_r.dtype)])
    color_p = jnp.concatenate(
        [color_r, jnp.zeros((1, BLOCK_VOL), jnp.int32)])
    af_p = jnp.concatenate([af_r, jnp.zeros((1,), jnp.int32)])
    ls_p = jnp.concatenate([ls_r, jnp.zeros((1,), jnp.int32)])
    return MapState(
        table=vhash.HashTable(keys=keys_p[inv_perm]),
        tsdf=tsdf_p[inv_perm],
        weight=weight_p[inv_perm],
        color=color_p[inv_perm],
        alloc_frame=af_p[inv_perm],
        last_seen=ls_p[inv_perm],
        frame=jnp.asarray(frame, jnp.int32),
        decayed_blocks=jnp.asarray(decayed_blocks, jnp.int32),
        overflow=jnp.asarray(overflow, jnp.int32),
    )


def advance_frame(m: MapState) -> MapState:
    return m._replace(frame=m.frame + 1)


# ---------------------------------------------------------------------------
# Voxel sampling (shared with raycast/ICP) — SoA
# ---------------------------------------------------------------------------

def sample_tsdf_xyz(m: MapState, px, py, pz, cfg: TsdfConfig):
    """Nearest-voxel TSDF sample at SoA world coords (any common shape).

    Returns (sdf, weight); sdf=+1, w=0 where unallocated."""
    inv_v = 1.0 / cfg.voxel_size_m
    vx = jnp.floor(px * inv_v).astype(jnp.int32)
    vy = jnp.floor(py * inv_v).astype(jnp.int32)
    vz = jnp.floor(pz * inv_v).astype(jnp.int32)
    bx = vx >> 3
    by = vy >> 3
    bz = vz >> 3
    keys = vhash.pack_xyz(bx, by, bz)
    shape = keys.shape
    slots = vhash.lookup_keys(m.table, keys.reshape(-1), cfg.probe_len)
    lx = vx - (bx << 3)
    ly = vy - (by << 3)
    lz = vz - (bz << 3)
    lidx = (lx + ly * BLOCK + lz * BLOCK * BLOCK).reshape(-1)
    safe = jnp.where(slots >= 0, slots, 0)
    flat_idx = safe * BLOCK_VOL + lidx
    sdf = m.tsdf.reshape(-1)[flat_idx].astype(jnp.float32)
    wgt = m.weight.reshape(-1)[flat_idx].astype(jnp.float32)
    sdf = jnp.where(slots >= 0, sdf, 1.0).reshape(shape)
    wgt = jnp.where(slots >= 0, wgt, 0.0).reshape(shape)
    return sdf, wgt


def sample_tsdf_nearest(m: MapState, pts_w: jax.Array, cfg: TsdfConfig):
    """(…, 3) wrapper for cold paths (meshing/tests)."""
    return sample_tsdf_xyz(m, pts_w[..., 0], pts_w[..., 1], pts_w[..., 2], cfg)


def sample_color_xyz(m: MapState, px, py, pz, cfg: TsdfConfig):
    """Nearest-voxel packed color sample; returns (r, g, b) floats."""
    inv_v = 1.0 / cfg.voxel_size_m
    vx = jnp.floor(px * inv_v).astype(jnp.int32)
    vy = jnp.floor(py * inv_v).astype(jnp.int32)
    vz = jnp.floor(pz * inv_v).astype(jnp.int32)
    bx = vx >> 3
    by = vy >> 3
    bz = vz >> 3
    keys = vhash.pack_xyz(bx, by, bz)
    shape = keys.shape
    slots = vhash.lookup_keys(m.table, keys.reshape(-1), cfg.probe_len)
    lx = vx - (bx << 3)
    ly = vy - (by << 3)
    lz = vz - (bz << 3)
    lidx = (lx + ly * BLOCK + lz * BLOCK * BLOCK).reshape(-1)
    safe = jnp.where(slots >= 0, slots, 0)
    packed = m.color.reshape(-1)[safe * BLOCK_VOL + lidx]
    packed = jnp.where(slots >= 0, packed, 0).reshape(shape)
    return unpack_rgb(packed)


def sample_tsdf_trilinear_xyz(m: MapState, px, py, pz, cfg: TsdfConfig):
    """Trilinear TSDF sample (8 nearest lookups); returns (sdf, min_w)."""
    vsz = cfg.voxel_size_m
    gx = px / vsz - 0.5
    gy = py / vsz - 0.5
    gz = pz / vsz - 0.5
    g0x = jnp.floor(gx)
    g0y = jnp.floor(gy)
    g0z = jnp.floor(gz)
    fx = gx - g0x
    fy = gy - g0y
    fz = gz - g0z
    acc = 0.0
    wmin = None
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                cx = (g0x + dx + 0.5) * vsz
                cy = (g0y + dy + 0.5) * vsz
                cz = (g0z + dz + 0.5) * vsz
                s, w = sample_tsdf_xyz(m, cx, cy, cz, cfg)
                wt = (
                    (fx if dx else 1 - fx)
                    * (fy if dy else 1 - fy)
                    * (fz if dz else 1 - fz)
                )
                acc = acc + s * wt
                wmin = w if wmin is None else jnp.minimum(wmin, w)
    return acc, wmin


def sample_tsdf_trilinear(m: MapState, pts_w: jax.Array, cfg: TsdfConfig):
    return sample_tsdf_trilinear_xyz(
        m, pts_w[..., 0], pts_w[..., 1], pts_w[..., 2], cfg
    )
