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


def test_sgm_fused_pallas_matches_xla():
    """The fully fused pallas SGM+WTA backend (sgm_backend="pallas_fused")
    must reproduce the XLA volume path's disparity BITWISE on
    integer-valued f32 costs: same recurrence, same direction-sum values
    (integer sums are exact in f32 regardless of association), same
    argmin / subpixel-tap / right-argmin tie rules."""
    import numpy as np

    from denseslam_tpu.config import StereoConfig
    from denseslam_tpu.ops import stereo as st
    from denseslam_tpu.ops.sgm_pallas import sgm_wta_pallas

    rng = np.random.default_rng(7)
    # aligned width / pad-requiring width / non-128 disparity count
    for (h, w, d) in ((20, 160, 128), (20, 155, 128), (24, 64, 48)):
        cost = rng.integers(0, 200, (h, w, d)).astype(np.float32)
        c = jnp.asarray(cost)
        cfg = StereoConfig(max_disparity=d)
        agg = st.sgm_aggregate(c, cfg)
        disp_ref, val_ref = st.disparity_from_cost(agg, cfg)
        maps = sgm_wta_pallas(c, cfg.sgm_p1, cfg.sgm_p2, interpret=True)
        disp_f, val_f = st._disparity_from_maps(*maps, d, cfg)
        np.testing.assert_array_equal(
            np.asarray(disp_ref), np.asarray(disp_f), err_msg=f"{h}x{w}x{d}")
        np.testing.assert_array_equal(
            np.asarray(val_ref), np.asarray(val_f), err_msg=f"{h}x{w}x{d}")


def test_sgm_fused_pallas_bf16_matches_xla_tail(pair):
    """bf16 cost volume through the fused kernel — the only config where
    the f32-upcast tail, f32 rolling-min scratch and f32 BIG constants
    actually change behaviour (on f32 volumes the upcasts are no-ops),
    and the config bench_full runs. Under bf16 the two paths associate
    the direction sum differently, so on RANDOM volumes near-tie WTA
    winners flip pervasively (aggregates ~1e3 quantise to steps of 4-8);
    on a real cost volume minima are pronounced, so the comparison that
    matters is depth agreement + equal GT quality, not bit parity."""
    cfg, left, right, depth_gt = pair
    bf_xla = dataclasses.replace(cfg.stereo, cost_dtype="bfloat16",
                                 sgm_backend="xla")
    bf_fused = dataclasses.replace(cfg.stereo, cost_dtype="bfloat16",
                                   sgm_backend="pallas_fused")
    d_x, v_x = stereo.compute_depth(left, right, cfg.rig, bf_xla)
    d_f, v_f = stereo.compute_depth(left, right, cfg.rig, bf_fused)
    # same GT quality
    cov_x, med_x, frac_x = _eval(d_x, v_x, depth_gt, cfg)
    cov_f, med_f, frac_f = _eval(d_f, v_f, depth_gt, cfg)
    assert cov_f > cov_x - 0.02, (cov_f, cov_x)
    assert med_f < med_x * 1.2 + 1e-3, (med_f, med_x)
    assert frac_f > frac_x - 0.02, (frac_f, frac_x)
    # pixelwise: the overwhelming majority agree to within a disparity
    both = np.asarray(v_x) & np.asarray(v_f)
    assert both.mean() > 0.4
    dd = np.abs(np.asarray(d_x)[both] - np.asarray(d_f)[both])
    assert (dd < 0.1).mean() > 0.9, (dd < 0.1).mean()


def test_sgm_fused_backend_end_to_end(pair):
    """compute_depth(sgm_backend="pallas_fused") reaches the same depth
    quality as the XLA backend on the synthetic stereo pair."""
    cfg, left, right, depth_gt = pair
    fused = dataclasses.replace(cfg.stereo, sgm_backend="pallas_fused")
    d_f, v_f = stereo.compute_depth(left, right, cfg.rig, fused)
    cov, med_rel, frac5 = _eval(d_f, v_f, depth_gt, cfg)
    assert cov > 0.5, cov
    assert med_rel < 0.03, med_rel
    assert frac5 > 0.85, frac5


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
