"""Tail-strength splat-vs-oracle contract (VERDICT r1 item 9): the
production splat renderer must agree with the reference-exact sphere-trace
raycaster not just at the median but in the TAILS, with bounded coverage
loss, on a street-scale scene — so tuning splat for speed can't silently
drift production rendering.

Known, accepted tail: ~1% of pixels at occlusion silhouettes resolve to a
DIFFERENT (occluded) surface than the oracle's first ray crossing — a
splat+fill design cannot rank surfaces it has no splats for. The contract
bounds that fraction explicitly instead of pretending a p99 depth bound.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from denseslam_tpu.config import tiny_test_config
from denseslam_tpu.io import synthetic
from denseslam_tpu.ops import raycast as rc_ops
from denseslam_tpu.ops import splat as splat_ops
from denseslam_tpu.ops import tsdf as tsdf_ops
from denseslam_tpu.utils import lie


@pytest.fixture(scope="module")
def fused_street():
    # mid-res street frame: big enough for tail statistics, small enough
    # for the CPU oracle (the TPU-side full-res run lives in
    # scripts/tpu_measure_all.sh)
    cfg = tiny_test_config(width=480, height=160, baseline_m=0.5)
    cfg = dataclasses.replace(
        cfg, tsdf=dataclasses.replace(
            cfg.tsdf, table_slots=1 << 14, max_visible_blocks=1 << 12,
            max_alloc_per_frame=1 << 12, max_depth_m=20.0,
            raycast_steps=160))
    scene = synthetic.street_scene(length_m=40.0)

    @jax.jit
    def fuse(m, depth, gray, T):
        m, slots, mask = tsdf_ops.allocate_for_frame(
            m, depth, T, cfg.rig.intr, cfg.tsdf)
        m = tsdf_ops.integrate(m, slots, mask, depth,
                               tsdf_ops.pack_gray(gray), T,
                               cfg.rig.intr, cfg.tsdf)
        return tsdf_ops.advance_frame(m)

    m = tsdf_ops.make_map(cfg.tsdf)
    poses = synthetic.make_trajectory(5, step_m=1.0, yaw_rate=0.0)
    for i in range(5):
        T = jnp.asarray(poses[i])
        gray, depth = synthetic.render_view(T, cfg.rig.intr, scene)
        m = fuse(m, depth, gray, T)
    return cfg, scene, m, poses


def _sc(cfg):
    sp = cfg.splat
    return splat_ops.SplatConfig(max_blocks=sp.max_blocks,
                                 max_voxels=sp.max_voxels,
                                 surface_eta=sp.surface_eta,
                                 z_bits=sp.z_bits,
                                 fill_levels=sp.fill_levels)


def _contract(cfg, m, T, cov_min=0.95, p95_vox=4.0, bad_frac=0.03,
              refine=0):
    rc_s = splat_ops.splat_render(m, T, cfg.rig.intr, cfg.tsdf, _sc(cfg))
    d_s = rc_s.depth
    if refine:
        d_s = splat_ops.refine_depth(m, d_s, rc_s.mask, T, cfg.rig.intr,
                                     cfg.tsdf, steps=refine, prune_sdf=0.5)
    rc_m = rc_ops.raycast(m, T, cfg.rig.intr, cfg.tsdf)
    d_s = np.asarray(d_s)
    d_m = np.asarray(rc_m.depth)
    vox = cfg.tsdf.voxel_size_m

    oracle_hit = d_m > 0
    both = (d_s > 0) & oracle_hit
    cov = both.sum() / oracle_hit.sum()
    assert cov > cov_min, cov

    err = np.abs(d_s[both] - d_m[both])
    med, p95 = np.percentile(err, 50), np.percentile(err, 95)
    assert med < 1.0 * vox, med
    assert p95 < p95_vox * vox, p95
    # silhouette occlusion-order tail: bounded FRACTION, not magnitude
    frac_bad = (err > 4.0 * cfg.tsdf.trunc_dist_m).mean()
    assert frac_bad < bad_frac, frac_bad
    return cov, med, p95, frac_bad


def test_splat_vs_oracle_tails(fused_street):
    cfg, scene, m, poses = fused_street
    _contract(cfg, m, jnp.asarray(poses[2]))


def test_splat_vs_oracle_tails_offset_view(fused_street):
    """Same contract from a NON-fused viewpoint (free-cam offset) — the
    composite/freeview use case renders away from fusion poses."""
    cfg, scene, m, poses = fused_street
    off = np.asarray(lie.se3_exp_np(
        np.array([0.3, -0.15, 0.4, 0.02, 0.03, 0.0], np.float32)))
    _contract(cfg, m, jnp.asarray(poses[2] @ off), cov_min=0.9,
              p95_vox=4.5, bad_frac=0.03)


def test_splat_refine_prune_tightens_tail(fused_street):
    """refine_depth(prune_sdf=0.5) must tighten p95 vs the raw splat and
    keep coverage: the opt-in accuracy mode for eval/freeview rendering."""
    cfg, scene, m, poses = fused_street
    T = jnp.asarray(poses[2])
    _, _, p95_raw, _ = _contract(cfg, m, T)
    cov, med, p95_ref, frac = _contract(cfg, m, T, cov_min=0.9,
                                        bad_frac=0.02, refine=2)
    assert p95_ref < p95_raw * 0.8, (p95_ref, p95_raw)
    assert p95_ref < 3.0 * cfg.tsdf.voxel_size_m
