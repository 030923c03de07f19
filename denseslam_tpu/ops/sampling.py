"""Pallas tile-sampler: the TSDF-fusion image gather as a TPU kernel.

WHY: fusion's dominant cost is sampling the (H, W) depth/gray image at
every visible voxel's projected pixel — V x 512 computed-index gathers.
XLA lowers that to an element-granular gather that runs at a measured
~7-10 ns/element floor on this hardware (~32 ms/frame at KITTI scale, the
whole integrate budget — see ROADMAP.md "Measured cost laws"). The voxels
of one 8^3 block, however, project into a SMALL image footprint, so the
access pattern is tiled: this kernel DMAs each block's (TH, TW) image tile
HBM->VMEM (4-deep pipelined), then resolves per-voxel samples with dense
VPU/MXU ops instead of hardware gathers:

  * row select: one-hot(tv) @ tile — an MXU matmul. Exact because tile
    values are 16-bit integers split into separate depth/gray planes and
    f32 HIGHEST-precision matmul recovers <2^16 integers exactly (one
    nonzero term per output).
  * column select: mask-and-sum on the VPU.

Blocks whose footprint exceeds the tile (near-field: closer than
~8*voxel*fx/TW meters) are flagged; the caller falls back to the XLA
gather for a small compacted subset (ops/tsdf.py integrate).

The reference's equivalent work is the per-voxel projectAndSplit inside
ITM's CUDA integrate kernel (SURVEY.md section 2b, IntegrateLocalMap);
this file is its TPU re-design, not a port.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# 8^3 voxels per block (ops/tsdf.py BLOCK_VOL; kept local to avoid a
# circular import — tsdf.py imports this module for its fusion path).
BLOCK_VOL = 512

TILE_H = 64
TILE_W = 256
BCHUNK = 32    # blocks per grid step (large: amortises grid-step overhead)
NBUF = 4       # DMA pipeline depth

# Mosaic only lowers HBM->VMEM tile DMAs whose origin is aligned to the
# memref tiling — (8, 128) for i32 — so tile origins are snapped DOWN to
# (ALIGN_V, ALIGN_U) multiples. The tile is sized so that any footprint
# <= (TILE_H - ALIGN_V + 1, TILE_W - ALIGN_U + 1) px still fits after
# snapping (worst-case origin shift is ALIGN-1 px).
ALIGN_V = 8
ALIGN_U = 128


SUB = 4        # blocks per BATCHED select matmul (gray kernel)


def _kernel(orig_ref, tuv_ref, img_ref, out_ref, tiles, sems):
    """Grid step: sample BCHUNK blocks. orig_ref: (V,) i32 packed tile
    origins (u0 | v0<<16), scalar-prefetched. tuv_ref: (BCHUNK, 512) i32
    packed in-tile coords (tu | tv<<16), -1 when invalid. img_ref: padded
    (Hp, Wp) i32 packed image rows in HBM. out_ref: (BCHUNK, 512) i32
    packed samples (d_mm<<8 | gray), 0 where invalid.

    Structure: all BCHUNK tile DMAs are issued up front into per-block
    buffers (2 MB VMEM); compute then runs in SUB-sized batched-matmul
    groups — per-block single matmuls measured latency-bound (~1.9 us per
    (512,64)@(64,768) issue; roofline ~0.5 us)."""
    i = pl.program_id(0)

    def get_dma(b):
        # orig packs the origin PRE-DIVIDED by the DMA alignment; the
        # multiply here is how Mosaic *proves* the slice offsets are
        # divisible by the (8, 128) memref tiling (a masked/aligned
        # dynamic value is not statically provable, a multiple is).
        o = orig_ref[i * BCHUNK + b]
        u0 = (o & 0xFFFF) * ALIGN_U
        v0 = (o >> 16) * ALIGN_V
        return pltpu.make_async_copy(
            img_ref.at[pl.ds(v0, TILE_H), pl.ds(u0, TILE_W)],
            tiles.at[b],
            sems.at[b],
        )

    # issue ALL tile DMAs (skipping empty blocks: orig < 0) — the DMA
    # engine queues them and they overlap the batched computes below
    for b in range(BCHUNK):
        @pl.when(orig_ref[i * BCHUNK + b] >= 0)
        def _(b=b):
            get_dma(b).start()

    for g in range(BCHUNK // SUB):
        blocks = range(g * SUB, (g + 1) * SUB)
        any_live = orig_ref[i * BCHUNK + g * SUB] >= 0
        for b in blocks:
            if b != g * SUB:
                any_live = any_live | (orig_ref[i * BCHUNK + b] >= 0)
        for b in blocks:
            @pl.when(orig_ref[i * BCHUNK + b] >= 0)
            def _(b=b):
                get_dma(b).wait()

        @pl.when(any_live)
        def _compute(g=g):
            _sample_subbatch(tiles, tuv_ref, out_ref, g)

        @pl.when(jnp.logical_not(any_live))
        def _zero(g=g):
            out_ref[g * SUB:(g + 1) * SUB, :] = jnp.zeros(
                (SUB, BLOCK_VOL), jnp.int32)


def _sample_subbatch(tiles, tuv_ref, out_ref, g):
    raws = tiles[g * SUB:(g + 1) * SUB]                 # (SUB, TH, TW) i32
    # Split the packed 24-bit value into <2^8 planes: integers < 256
    # are exact in bf16, so the one-hot row-select matmul is exact on
    # the MXU in ONE native bf16 pass (each output has exactly one
    # nonzero product; f32 accumulation of exact products is exact).
    # Dead blocks in a live sub-batch carry garbage tiles, but their
    # tuv = -1 makes the one-hot all-zero and inb false — exact zeros out.
    t_hi = jnp.right_shift(raws, 16).astype(jnp.bfloat16)  # d_mm >> 8
    t_mid = (jnp.right_shift(raws, 8) & 0xFF).astype(jnp.bfloat16)
    t_lo = (raws & 0xFF).astype(jnp.bfloat16)              # gray
    cat = jnp.concatenate([t_hi, t_mid, t_lo], axis=2)     # (SUB, TH, 3*TW)

    tuv = tuv_ref[g * SUB:(g + 1) * SUB, :]             # (SUB, 512)
    tu = tuv & 0xFFFF
    tv = jnp.right_shift(tuv, 16)
    inb = (tuv >= 0) & (tu < TILE_W) & (tv < TILE_H)
    rows_i = jax.lax.broadcasted_iota(
        jnp.int32, (SUB, BLOCK_VOL, TILE_H), 2)
    onehot = (rows_i == tv[:, :, None]).astype(jnp.bfloat16)
    rows = jax.lax.dot_general(
        onehot, cat, (((2,), (1,)), ((0,), (0,))),
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32)             # (SUB, 512, 3*TW)
    cols_i = jax.lax.broadcasted_iota(
        jnp.int32, (SUB, BLOCK_VOL, TILE_W), 2)
    cmask = (cols_i == tu[:, :, None]).astype(jnp.float32)
    hi = jnp.sum(rows[:, :, :TILE_W] * cmask, axis=2)
    mid = jnp.sum(rows[:, :, TILE_W:2 * TILE_W] * cmask, axis=2)
    lo = jnp.sum(rows[:, :, 2 * TILE_W:] * cmask, axis=2)
    packed = hi * 65536.0 + mid * 256.0 + lo            # < 2^24: exact f32
    out_ref[g * SUB:(g + 1) * SUB, :] = jnp.where(
        inb, packed, 0.0).astype(jnp.int32)


SUB_RGB = 2    # blocks per batched matmul in the 5-plane RGB kernel
               # (rows scratch is (SUB, 512, 5*TW) f32 — VMEM-bound)


def _kernel_rgb(orig_ref, tuv_ref, img1_ref, img2_ref, out1_ref, out2_ref,
                tiles1, tiles2, sems):
    """True-RGB variant: img1 = d_mm | r<<16, img2 = g | b<<8. Outputs
    out1 = d_mm<<8 | r, out2 = g<<8 | b. Same exact-selection and
    all-DMAs-up-front + batched-matmul structure as _kernel, with five
    <2^8 planes."""
    i = pl.program_id(0)

    def get_dmas(b):
        o = orig_ref[i * BCHUNK + b]
        u0 = (o & 0xFFFF) * ALIGN_U        # pre-divided: see _kernel
        v0 = (o >> 16) * ALIGN_V
        src1 = img1_ref.at[pl.ds(v0, TILE_H), pl.ds(u0, TILE_W)]
        src2 = img2_ref.at[pl.ds(v0, TILE_H), pl.ds(u0, TILE_W)]
        return (pltpu.make_async_copy(src1, tiles1.at[b], sems.at[b, 0]),
                pltpu.make_async_copy(src2, tiles2.at[b], sems.at[b, 1]))

    for b in range(BCHUNK):
        @pl.when(orig_ref[i * BCHUNK + b] >= 0)
        def _(b=b):
            for d in get_dmas(b):
                d.start()

    for g in range(BCHUNK // SUB_RGB):
        blocks = range(g * SUB_RGB, (g + 1) * SUB_RGB)
        any_live = orig_ref[i * BCHUNK + g * SUB_RGB] >= 0
        for b in blocks:
            if b != g * SUB_RGB:
                any_live = any_live | (orig_ref[i * BCHUNK + b] >= 0)
        for b in blocks:
            @pl.when(orig_ref[i * BCHUNK + b] >= 0)
            def _(b=b):
                for d in get_dmas(b):
                    d.wait()

        @pl.when(any_live)
        def _compute(g=g):
            _sample_subbatch_rgb(tiles1, tiles2, tuv_ref, out1_ref,
                                 out2_ref, g)

        @pl.when(jnp.logical_not(any_live))
        def _zero(g=g):
            z = jnp.zeros((SUB_RGB, BLOCK_VOL), jnp.int32)
            out1_ref[g * SUB_RGB:(g + 1) * SUB_RGB, :] = z
            out2_ref[g * SUB_RGB:(g + 1) * SUB_RGB, :] = z


def _sample_subbatch_rgb(tiles1, tiles2, tuv_ref, out1_ref, out2_ref, g):
    sl = slice(g * SUB_RGB, (g + 1) * SUB_RGB)
    raw1 = tiles1[sl]                                   # (SUB, TH, TW) i32
    raw2 = tiles2[sl]
    d_lo = (raw1 & 0xFF).astype(jnp.bfloat16)
    d_hi = (jnp.right_shift(raw1, 8) & 0xFF).astype(jnp.bfloat16)
    r_ = (jnp.right_shift(raw1, 16) & 0xFF).astype(jnp.bfloat16)
    g_ = (raw2 & 0xFF).astype(jnp.bfloat16)
    b_ = (jnp.right_shift(raw2, 8) & 0xFF).astype(jnp.bfloat16)
    cat = jnp.concatenate([d_hi, d_lo, r_, g_, b_], axis=2)  # (SUB,TH,5*TW)

    tuv = tuv_ref[sl, :]                                # (SUB, 512)
    tu = tuv & 0xFFFF
    tv = jnp.right_shift(tuv, 16)
    inb = (tuv >= 0) & (tu < TILE_W) & (tv < TILE_H)
    rows_i = jax.lax.broadcasted_iota(
        jnp.int32, (SUB_RGB, BLOCK_VOL, TILE_H), 2)
    onehot = (rows_i == tv[:, :, None]).astype(jnp.bfloat16)
    rows = jax.lax.dot_general(
        onehot, cat, (((2,), (1,)), ((0,), (0,))),
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32)             # (SUB, 512, 5*TW)
    cols_i = jax.lax.broadcasted_iota(
        jnp.int32, (SUB_RGB, BLOCK_VOL, TILE_W), 2)
    cmask = (cols_i == tu[:, :, None]).astype(jnp.float32)

    def sel(k):
        return jnp.sum(rows[:, :, k * TILE_W:(k + 1) * TILE_W] * cmask,
                       axis=2)

    d_mm = sel(0) * 256.0 + sel(1)
    out1 = d_mm * 256.0 + sel(2)                         # < 2^24
    out2 = sel(3) * 256.0 + sel(4)                       # < 2^16
    out1_ref[sl, :] = jnp.where(inb, out1, 0.0).astype(jnp.int32)
    out2_ref[sl, :] = jnp.where(inb, out2, 0.0).astype(jnp.int32)



@functools.partial(jax.jit, static_argnames=("interpret",))
def _tile_sample_rgb_call(img1, img2, orig, tuv, *, interpret: bool):
    v = tuv.shape[0]
    blk = pl.BlockSpec((BCHUNK, BLOCK_VOL), lambda i, orig: (i, 0),
                       memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(v // BCHUNK,),
        in_specs=[
            blk,
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[blk, blk],
        scratch_shapes=[
            pltpu.VMEM((BCHUNK, TILE_H, TILE_W), jnp.int32),
            pltpu.VMEM((BCHUNK, TILE_H, TILE_W), jnp.int32),
            pltpu.SemaphoreType.DMA((BCHUNK, 2)),
        ],
    )
    return pl.pallas_call(
        _kernel_rgb,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((v, BLOCK_VOL), jnp.int32),
                   jax.ShapeDtypeStruct((v, BLOCK_VOL), jnp.int32)],
        interpret=interpret,
    )(orig, tuv, img1, img2)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _tile_sample_call(img_padded, orig, tuv, *, interpret: bool):
    v = tuv.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(v // BCHUNK,),
        in_specs=[
            pl.BlockSpec((BCHUNK, BLOCK_VOL), lambda i, orig: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((BCHUNK, BLOCK_VOL), lambda i, orig: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((BCHUNK, TILE_H, TILE_W), jnp.int32),
            pltpu.SemaphoreType.DMA((BCHUNK,)),
        ],
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((v, BLOCK_VOL), jnp.int32),
        interpret=interpret,
    )(orig, tuv, img_padded)


def _pad_image(combo: jax.Array) -> jax.Array:
    h, w = combo.shape
    hp = max(-(-h // ALIGN_V) * ALIGN_V, TILE_H)
    wp = max(-(-w // ALIGN_U) * ALIGN_U, TILE_W)
    if (hp, wp) != (h, w):
        combo = jnp.pad(combo, ((0, hp - h), (0, wp - w)))
    return combo


def tile_sample(
    combo: jax.Array,        # (H, W) i32 packed (depth_mm << 8 | gray)
    u: jax.Array,            # (V, 512) f32 projected pixel u
    v: jax.Array,            # (V, 512) f32 projected pixel v
    z: jax.Array,            # (V, 512) f32 camera depth (gates validity)
    width: int,
    height: int,
    *,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Nearest-pixel packed sample per voxel via per-block image tiles.

    Returns (d_mm_f32, gray_f32, sampled_ok, overflow) where overflow (V,)
    marks blocks whose projected footprint did not fit the (TILE_H, TILE_W)
    tile — the caller must resolve those voxels another way. d_mm is the
    EXACT integer mm value as f32 (same quantisation as the XLA packed
    path, so de-integration replays identically)."""
    nblk = u.shape[0]
    u, v, z = _pad_blocks(u, v, z)
    orig, tuv, fits, overflow, combo_p = _tiling(combo, u, v, z, width,
                                                 height)
    out = _tile_sample_call(combo_p, orig, tuv, interpret=interpret)
    d_mm = jnp.right_shift(out, 8).astype(jnp.float32)
    gray = (out & 0xFF).astype(jnp.float32)
    return d_mm[:nblk], gray[:nblk], fits[:nblk], overflow[:nblk]


def _pad_blocks(u, v, z):
    """Pad the block axis to a BCHUNK multiple (padded rows have z=0 so
    they tile as empty: orig=-1, skipped by the kernel)."""
    pad = (-u.shape[0]) % BCHUNK
    if pad:
        u = jnp.pad(u, ((0, pad), (0, 0)))
        v = jnp.pad(v, ((0, pad), (0, 0)))
        z = jnp.pad(z, ((0, pad), (0, 0)))
    return u, v, z


def _tiling(img, u, v, z, width, height):
    """Shared tiling pass: per-block tile origins, in-tile coords, overflow
    flags, padded image."""
    nblk = u.shape[0]
    assert nblk % BCHUNK == 0, nblk
    img_p = _pad_image(img)
    hp, wp = img_p.shape

    ui = jnp.round(u).astype(jnp.int32)
    vi = jnp.round(v).astype(jnp.int32)
    inb = (ui >= 0) & (ui < width) & (vi >= 0) & (vi < height) & (z > 1e-3)

    big = jnp.int32(1 << 28)
    u_min = jnp.min(jnp.where(inb, ui, big), axis=1)
    v_min = jnp.min(jnp.where(inb, vi, big), axis=1)
    u_max = jnp.max(jnp.where(inb, ui, -big), axis=1)
    v_max = jnp.max(jnp.where(inb, vi, -big), axis=1)
    any_in = u_min <= u_max
    # Tile origins snapped DOWN to the DMA alignment (Mosaic requires
    # slice offsets divisible by the (8, 128) memref tiling). The padded
    # extents hp/wp are ALIGN multiples, so the clipped origins stay
    # aligned. Overflow is judged against the ALIGNED origin: a footprint
    # that would fit unaligned but straddles the snapped window falls back
    # to the XLA gather like any other oversized block.
    u0 = jnp.clip(jnp.where(any_in, u_min, 0) & ~(ALIGN_U - 1),
                  0, wp - TILE_W)
    v0 = jnp.clip(jnp.where(any_in, v_min, 0) & ~(ALIGN_V - 1),
                  0, hp - TILE_H)
    overflow = any_in & (
        ((u_max - u0) >= TILE_W) | ((v_max - v0) >= TILE_H)
    )
    # packed PRE-DIVIDED by the alignment so the kernel reconstructs the
    # offsets as provable multiples (Mosaic divisibility analysis);
    # -1 marks a block with no in-bounds voxels — the kernel skips its
    # DMA and compute entirely
    orig = jnp.where(
        any_in,
        (u0 // ALIGN_U) | ((v0 // ALIGN_V) << 16),
        -1,
    ).astype(jnp.int32)

    tu = ui - u0[:, None]
    tv = vi - v0[:, None]
    fits = inb & (tu >= 0) & (tu < TILE_W) & (tv >= 0) & (tv < TILE_H)
    tuv = jnp.where(fits, tu | (tv << 16), -1).astype(jnp.int32)
    return orig, tuv, fits, overflow, img_p


def tile_sample_rgb(
    depth_r: jax.Array,      # (H, W) i32 packed (d_mm | r << 16)
    g_b: jax.Array,          # (H, W) i32 packed (g | b << 8)
    u: jax.Array,
    v: jax.Array,
    z: jax.Array,
    width: int,
    height: int,
    *,
    interpret: bool = False,
):
    """True-RGB variant of `tile_sample` (two packed images, two tile DMAs
    per block). Returns (d_mm, r, g, b, sampled_ok, overflow)."""
    nblk = u.shape[0]
    u, v, z = _pad_blocks(u, v, z)
    orig, tuv, fits, overflow, img1_p = _tiling(depth_r, u, v, z, width,
                                                height)
    img2_p = _pad_image(g_b)
    out1, out2 = _tile_sample_rgb_call(img1_p, img2_p, orig, tuv,
                                       interpret=interpret)
    d_mm = jnp.right_shift(out1, 8).astype(jnp.float32)
    r = (out1 & 0xFF).astype(jnp.float32)
    g = jnp.right_shift(out2, 8).astype(jnp.float32)
    b = (out2 & 0xFF).astype(jnp.float32)
    return (d_mm[:nblk], r[:nblk], g[:nblk], b[:nblk], fits[:nblk],
            overflow[:nblk])


def gather_fallback(
    combo: jax.Array,
    u: jax.Array,
    v: jax.Array,
    z: jax.Array,
    width: int,
    height: int,
    overflow: jax.Array,     # (V,) bool
    cap: int,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """XLA computed-index gather for up to `cap` overflow blocks, compacted
    so the gather is only cap x 512 elements. Returns (rows_idx, d_mm,
    gray, ok) for the selected rows; rows beyond the real overflow count
    are masked out."""
    nblk = u.shape[0]
    order = jnp.argsort(jnp.where(overflow, 0, 1).astype(jnp.int32))
    sel = order[:cap]                                     # (cap,)
    real = overflow[sel]
    ui = jnp.round(u[sel]).astype(jnp.int32)
    vi = jnp.round(v[sel]).astype(jnp.int32)
    ok = ((ui >= 0) & (ui < width) & (vi >= 0) & (vi < height)
          & (z[sel] > 1e-3) & real[:, None])
    uc = jnp.clip(ui, 0, width - 1)
    vc = jnp.clip(vi, 0, height - 1)
    got = combo.reshape(-1)[vc * width + uc]
    d_mm = jnp.where(ok, jnp.right_shift(got, 8), 0).astype(jnp.float32)
    gray = jnp.where(ok, got & 0xFF, 0).astype(jnp.float32)
    return sel, d_mm, gray, ok
