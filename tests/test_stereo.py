import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from denseslam_tpu.config import tiny_test_config, StereoConfig
from denseslam_tpu.io import synthetic
from denseslam_tpu.ops import stereo


@pytest.fixture(scope="module")
def pair():
    cfg = tiny_test_config(width=160, height=120, baseline_m=0.2)
    cfg = dataclasses.replace(cfg, stereo=StereoConfig(max_disparity=48))
    T = jnp.eye(4, dtype=jnp.float32)
    left, right, depth_gt = synthetic.render_stereo(T, cfg.rig)
    return cfg, left, right, depth_gt


def _eval(depth, valid, depth_gt, cfg):
    d = np.asarray(depth)
    v = np.asarray(valid)
    gt = np.asarray(depth_gt)
    # only evaluate where gt is in range the disparity sweep can see
    fB = cfg.rig.intr.fx * cfg.rig.baseline_m
    min_d = fB / (cfg.stereo.max_disparity - 1)
    ok = v & (gt > min_d) & (gt < 9.0)
    coverage = ok.sum() / ((gt > min_d) & (gt < 9.0)).sum()
    err = np.abs(d[ok] - gt[ok])
    rel = err / gt[ok]
    return coverage, np.median(rel), (rel < 0.05).mean()


def test_block_match_depth(pair):
    cfg, left, right, depth_gt = pair
    c = dataclasses.replace(cfg.stereo, use_sgm=False)
    depth, valid = stereo.compute_depth(left, right, cfg.rig, c)
    coverage, med_rel, frac5 = _eval(depth, valid, depth_gt, cfg)
    assert coverage > 0.5, coverage
    assert med_rel < 0.03, med_rel
    assert frac5 > 0.8, frac5


def test_sgm_improves_coverage(pair):
    cfg, left, right, depth_gt = pair
    bm = dataclasses.replace(cfg.stereo, use_sgm=False)
    d_bm, v_bm = stereo.compute_depth(left, right, cfg.rig, bm)
    d_sgm, v_sgm = stereo.compute_depth(left, right, cfg.rig, cfg.stereo)
    cov_bm, med_bm, _ = _eval(d_bm, v_bm, depth_gt, cfg)
    cov_sgm, med_sgm, frac5 = _eval(d_sgm, v_sgm, depth_gt, cfg)
    assert cov_sgm >= cov_bm * 0.95
    assert med_sgm < 0.03, med_sgm
    assert frac5 > 0.85, frac5


def test_stereo_jit(pair):
    cfg, left, right, depth_gt = pair
    f = jax.jit(lambda l, r: stereo.compute_depth(l, r, cfg.rig, cfg.stereo))
    depth, valid = f(left, right)
    assert bool(valid.any())


def test_lr_check_kills_occlusions(pair):
    """Pixels occluded in the right view must be invalidated, not hallucinated."""
    cfg, left, right, depth_gt = pair
    depth, valid = stereo.compute_depth(left, right, cfg.rig, cfg.stereo)
    d = np.asarray(depth)
    gt = np.asarray(depth_gt)
    v = np.asarray(valid)
    # gross outliers among valid pixels should be rare
    ok = v & (gt > 0)
    rel = np.abs(d[ok] - gt[ok]) / gt[ok]
    assert (rel > 0.2).mean() < 0.05, (rel > 0.2).mean()


def test_sgm_pallas_matches_xla():
    """The pallas SGM aggregation (ops/sgm_pallas.py) must reproduce the
    lax.scan path exactly on integer-valued costs (where f32 sums are
    exact and direction-sum association is irrelevant), for both an
    aligned and a pad-requiring width and both cost dtypes."""
    import dataclasses

    import numpy as np

    from denseslam_tpu.config import StereoConfig
    from denseslam_tpu.ops import stereo as st

    rng = np.random.default_rng(3)
    for w in (32, 27):          # aligned / needs WC padding
        for dt in ("float32", "bfloat16"):
            cost = rng.integers(0, 200, (20, w, 128)).astype(np.float32)
            c = jnp.asarray(cost)
            if dt == "bfloat16":
                c = c.astype(jnp.bfloat16)
            ref = st.sgm_aggregate(
                c, StereoConfig(sgm_backend="xla"))
            got = st.sgm_aggregate(
                c, StereoConfig(sgm_backend="pallas"))
            if dt == "float32":
                # integer costs < 2^24: f32 sums exact regardless of the
                # direction-sum association -> bitwise equal
                np.testing.assert_array_equal(
                    np.asarray(ref), np.asarray(got), err_msg=f"w={w}")
            else:
                # bf16 rounds at each add; the pallas path accumulates
                # directions left-to-right while XLA sums pairwise, so
                # results differ by association rounding only (~0.4% rel)
                np.testing.assert_allclose(
                    np.asarray(ref.astype(jnp.float32)),
                    np.asarray(got.astype(jnp.float32)),
                    rtol=1.5e-2, atol=2.0, err_msg=f"w={w}")
