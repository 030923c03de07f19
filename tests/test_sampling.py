"""Pallas tile-sampler (ops/sampling.py): exactness vs the XLA gather path.

Runs in interpret mode on the CPU mesh; the kernel itself is exercised on
real TPU by bench/profile scripts."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from denseslam_tpu.config import tiny_test_config
from denseslam_tpu.io import synthetic
from denseslam_tpu.ops import sampling, tsdf as tsdf_ops


def test_tile_sample_matches_direct_indexing():
    rng = np.random.default_rng(0)
    H, W = 96, 200
    nblk = 16
    d_img = rng.integers(1, 60000, (H, W)).astype(np.int32)
    g_img = rng.integers(0, 256, (H, W)).astype(np.int32)
    combo = (d_img << 8) | g_img
    # clustered coords: per block a random origin + jitter inside the tile
    ou = rng.integers(0, W - 40, (nblk, 1))
    ov = rng.integers(0, H - 40, (nblk, 1))
    u = (ou + rng.uniform(0, 39, (nblk, 512))).astype(np.float32)
    v = (ov + rng.uniform(0, 39, (nblk, 512))).astype(np.float32)
    z = np.ones((nblk, 512), np.float32)
    z[3] = 0.0  # block fully gated out

    d_mm, gray, ok, over = sampling.tile_sample(
        jnp.asarray(combo), jnp.asarray(u), jnp.asarray(v), jnp.asarray(z),
        W, H, interpret=True)
    assert not np.asarray(over).any()
    ui = np.clip(np.round(u).astype(np.int64), 0, W - 1)
    vi = np.clip(np.round(v).astype(np.int64), 0, H - 1)
    ref = combo[vi, ui]
    ref_d = np.where(z > 0, ref >> 8, 0).astype(np.float32)
    ref_g = np.where(z > 0, ref & 0xFF, 0).astype(np.float32)
    assert np.array_equal(np.asarray(d_mm), ref_d)
    assert np.array_equal(np.asarray(gray), ref_g)
    assert not np.asarray(ok[3]).any()


def test_tile_sample_overflow_flag_and_fallback():
    rng = np.random.default_rng(1)
    H, W = 200, 2 * sampling.TILE_W
    nblk = 8
    combo = ((rng.integers(1, 60000, (H, W)) << 8)
             | rng.integers(0, 256, (H, W))).astype(np.int32)
    u = rng.uniform(0, 60, (nblk, 512)).astype(np.float32)
    v = rng.uniform(0, 40, (nblk, 512)).astype(np.float32)
    # block 2: footprint wider than TILE_W; block 5: taller than TILE_H
    u[2] = rng.uniform(0, sampling.TILE_W + 40, 512)
    v[5] = rng.uniform(0, sampling.TILE_H + 40, 512)
    z = np.ones((nblk, 512), np.float32)

    cj, uj, vj, zj = map(jnp.asarray, (combo, u, v, z))
    d_mm, gray, ok, over = sampling.tile_sample(
        cj, uj, vj, zj, W, H, interpret=True)
    over_np = np.asarray(over)
    assert over_np[2] and over_np[5] and over_np.sum() == 2

    sel, d_o, g_o, ok_o = sampling.gather_fallback(
        cj, uj, vj, zj, W, H, over, cap=4)
    sel_np = np.asarray(sel)
    assert set(sel_np[np.asarray(ok_o).any(axis=1)]) == {2, 5}
    # fallback rows reproduce direct indexing for the overflow blocks
    for r, blk in enumerate(sel_np):
        if not np.asarray(ok_o)[r].any():
            continue
        ui = np.round(u[blk]).astype(np.int64)
        vi = np.round(v[blk]).astype(np.int64)
        ref = combo[np.clip(vi, 0, H - 1), np.clip(ui, 0, W - 1)]
        assert np.array_equal(np.asarray(d_o)[r], (ref >> 8).astype(np.float32))


@pytest.fixture(scope="module")
def frame():
    cfg = tiny_test_config()
    T = jnp.eye(4, dtype=jnp.float32)
    gray, depth = synthetic.render_view(T, cfg.rig.intr)
    color = tsdf_ops.pack_gray(gray)
    return cfg, T, depth, color


def _fuse(cfg, depth, color, T):
    m = tsdf_ops.make_map(cfg.tsdf)
    m, slots, mask = tsdf_ops.allocate_for_frame(
        m, depth, T, cfg.rig.intr, cfg.tsdf)
    m = tsdf_ops.integrate(m, slots, mask, depth, color, T,
                           cfg.rig.intr, cfg.tsdf)
    return m


def test_integrate_pallas_matches_gather(frame):
    """sampler='pallas' reproduces the packed-gather fusion EXACTLY (both
    quantise depth to 1 mm and nearest-pixel sample); near-field blocks go
    through the compacted fallback and must also match."""
    cfg, T, depth, color = frame
    m_g = _fuse(cfg, depth, color, T)
    cfg_p = dataclasses.replace(
        cfg, tsdf=dataclasses.replace(cfg.tsdf, sampler="pallas"))
    m_p = _fuse(cfg_p, depth, color, T)
    np.testing.assert_array_equal(np.asarray(m_g.weight), np.asarray(m_p.weight))
    np.testing.assert_array_equal(np.asarray(m_g.tsdf), np.asarray(m_p.tsdf))
    np.testing.assert_array_equal(np.asarray(m_g.color), np.asarray(m_p.color))


def test_integrate_deintegrate_identity_pallas(frame):
    cfg, T, depth, color = frame
    cfg = dataclasses.replace(
        cfg, tsdf=dataclasses.replace(cfg.tsdf, sampler="pallas"))
    m0 = tsdf_ops.make_map(cfg.tsdf)
    m0, slots, mask = tsdf_ops.allocate_for_frame(
        m0, depth, T, cfg.rig.intr, cfg.tsdf)
    m1 = tsdf_ops.integrate(m0, slots, mask, depth, color, T,
                            cfg.rig.intr, cfg.tsdf)
    m2 = tsdf_ops.deintegrate(m1, slots, mask, depth, color, T,
                              cfg.rig.intr, cfg.tsdf)
    np.testing.assert_allclose(np.asarray(m2.weight), np.asarray(m0.weight),
                               atol=1e-5)
    w = np.asarray(m1.weight) > 0
    np.testing.assert_allclose(np.asarray(m2.tsdf)[~w.any(axis=1)],
                               np.asarray(m0.tsdf)[~w.any(axis=1)], atol=1e-5)


def test_integrate_pallas_rgb_matches_gather(frame):
    """True-RGB mode (gray_color_fusion=False): the five-plane RGB kernel
    must reproduce the XLA path's fused tsdf/weight exactly and color
    within rounding."""
    cfg, T, depth, _ = frame
    rng = np.random.default_rng(5)
    h, w = depth.shape
    r = rng.integers(0, 256, (h, w)).astype(np.float32)
    g = rng.integers(0, 256, (h, w)).astype(np.float32)
    b = rng.integers(0, 256, (h, w)).astype(np.float32)
    color = tsdf_ops.pack_rgb(jnp.asarray(r), jnp.asarray(g), jnp.asarray(b))

    t_g = dataclasses.replace(cfg.tsdf, gray_color_fusion=False)
    t_p = dataclasses.replace(t_g, sampler="pallas")
    cfg_g = dataclasses.replace(cfg, tsdf=t_g)
    cfg_p = dataclasses.replace(cfg, tsdf=t_p)
    m_g = _fuse(cfg_g, depth, color, T)
    m_p = _fuse(cfg_p, depth, color, T)
    # the RGB gather path samples RAW float depth; pallas quantises to
    # 1 mm, so update predicates may flip for a handful of voxels exactly
    # on a threshold, and tsdf differs by <= 1 mm / trunc_dist
    w_g = np.asarray(m_g.weight)
    w_p = np.asarray(m_p.weight)
    assert (w_g != w_p).mean() < 1e-5
    agree = w_g == w_p
    np.testing.assert_allclose(np.asarray(m_g.tsdf)[agree],
                               np.asarray(m_p.tsdf)[agree],
                               atol=2e-3 / cfg.tsdf.trunc_dist_m)
    # colors agree exactly where fused (same nearest pixel, same weights)
    cg_ = np.asarray(m_g.color)
    cp_ = np.asarray(m_p.color)
    fused = np.asarray(m_g.weight) > 0
    same = (cg_ == cp_) | ~fused
    assert same.mean() > 0.995, same.mean()


def test_fuse_sequence_pallas_matches_gather():
    """The pallas sampler inside the batched `fuse_sequence` scan (the
    bench/throughput path) matches the gather path."""
    from denseslam_tpu.io import synthetic as synth
    from denseslam_tpu.models.dense_slam import fuse_sequence, make_fusion_db

    cfg = tiny_test_config(width=120, height=90)
    n = 3
    poses = synth.make_trajectory(n, step_m=0.08, yaw_rate=0.0)
    grays, depths = synth.render_trajectory(poses, cfg.rig.intr)
    T_wcs = jnp.asarray(poses)
    fids = jnp.arange(n, dtype=jnp.int32)

    outs = {}
    for sampler in ("gather", "pallas"):
        c = dataclasses.replace(
            cfg, tsdf=dataclasses.replace(cfg.tsdf, sampler=sampler))
        m = tsdf_ops.make_map(c.tsdf)
        db = make_fusion_db(c)
        m, db = jax.jit(
            lambda m, db: fuse_sequence(m, db, depths, grays, T_wcs, fids, c)
        )(m, db)
        outs[sampler] = m
    np.testing.assert_array_equal(np.asarray(outs["gather"].weight),
                                  np.asarray(outs["pallas"].weight))
    np.testing.assert_array_equal(np.asarray(outs["gather"].tsdf),
                                  np.asarray(outs["pallas"].tsdf))
