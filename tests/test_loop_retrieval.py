"""Loop-retrieval discrimination: the signature must separate a true
revisit from plausible-but-wrong candidates, and verification must reject
wrong places (VERDICT r1 item 3 — the DBoW2-role contract).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from denseslam_tpu.config import tiny_test_config
from denseslam_tpu.io import synthetic
from denseslam_tpu.models import backend as be
from denseslam_tpu.ops import features
from denseslam_tpu.utils import lie


@pytest.fixture(scope="module")
def cfg():
    return tiny_test_config(width=320, height=240, baseline_m=0.25)


@pytest.fixture(scope="module")
def scene():
    # long corridor so widely separated poses see genuinely different
    # (world-anchored aperiodic) texture
    return synthetic.street_scene(length_m=60.0)


def _feats_at(cfg, scene, T):
    l, r, _ = synthetic.render_stereo(jnp.asarray(T), cfg.rig, scene)
    fl = features.detect(l, cfg.frontend)
    fr = features.detect(r, cfg.frontend)
    return fl, fr


def _pose(z, x=0.0, yaw=0.0):
    xi = np.array([x, 0, z, 0, yaw, 0], np.float32)
    return np.asarray(lie.se3_exp_np(xi))


def test_signature_separates_places(cfg, scene):
    """Same-place similarity must dominate different-place similarity by a
    clear margin (the mean-descriptor signature failed exactly this: any
    two scenes with similar gradient statistics scored ~1)."""
    spots = [_pose(z) for z in (0.0, 8.0, 16.0, 24.0, 32.0)]
    sigs = []
    for T in spots:
        fl, _ = _feats_at(cfg, scene, T)
        sigs.append(be._signature(fl))
    sigs = np.stack(sigs)
    # revisits: same spots, small pose jitter
    revisit_sims, cross_sims = [], []
    for i, T in enumerate(spots):
        Tj = T @ _pose(0.15, x=0.05, yaw=0.01)
        fl, _ = _feats_at(cfg, scene, Tj)
        scores = be._retrieval_scores(be._signature(fl), sigs)
        for j in range(len(spots)):
            (revisit_sims if j == i else cross_sims).append(float(scores[j]))
    assert min(revisit_sims) > 2.0 * max(cross_sims), (
        sorted(revisit_sims), sorted(cross_sims))
    assert min(revisit_sims) > 0.06   # clears the detect_loop default gate


def test_retrieval_picks_geometrically_consistent(cfg, scene):
    """Two similar-looking places (same geometry layout, approximate
    texture statistics): the query at place A must loop-close against A's
    keyframe, not B's — either the signature ranks A first or verification
    rejects B."""
    bk = be.Backend(cfg)
    # a trail of keyframes, two of which (A at z=4, B at z=28) share the
    # same LOCAL geometry (street corridor is self-similar by design)
    zs = [0.0, 4.0, 8.0, 12.0, 16.0, 20.0, 24.0, 28.0, 32.0, 36.0, 40.0,
          44.0]
    for i, z in enumerate(zs):
        T = _pose(z)
        fl, fr = _feats_at(cfg, scene, T)
        bk.add_keyframe(i, T, fl, fr)
    # query: revisit of A (z=4) with slight jitter
    Tq = _pose(4.0) @ _pose(0.1, x=0.03)
    fl, fr = _feats_at(cfg, scene, Tq)
    bk.add_keyframe(len(zs), np.asarray(Tq), fl, fr)
    hit = bk.detect_loop(min_gap=3, min_inliers=25)
    assert hit is not None, "revisit not detected"
    qi, ci = hit
    assert ci == 1, f"loop matched wrong place: candidate {ci}, expected 1"


def test_no_false_loop_on_novel_place(cfg, scene):
    """A query from a place never visited must not produce a verified
    loop, even though the corridor is visually self-similar."""
    bk = be.Backend(cfg)
    for i, z in enumerate((0.0, 4.0, 8.0, 12.0, 16.0)):
        T = _pose(z)
        fl, fr = _feats_at(cfg, scene, T)
        bk.add_keyframe(i, T, fl, fr)
    # novel place: far down the corridor, off-axis
    Tq = _pose(40.0, x=1.5, yaw=0.1)
    fl, fr = _feats_at(cfg, scene, Tq)
    bk.add_keyframe(5, np.asarray(Tq), fl, fr)
    assert bk.detect_loop(min_gap=2, min_inliers=25) is None


def test_signature_device_matches_host():
    """signature_device (the in-scan sketch) must agree with the host
    `_signature` (identical top-k selection + normalisation), so chunk
    registration and per-frame registration build the same retrieval
    database."""
    import jax.numpy as jnp
    import numpy as np

    from denseslam_tpu.models.backend import _signature, signature_device
    from denseslam_tpu.ops.features import Features

    rng = np.random.default_rng(3)
    n, d = 300, 32
    feats = Features(
        uv=jnp.asarray(rng.uniform(0, 100, (n, 2)).astype(np.float32)),
        cls=jnp.zeros((n,), jnp.int32),
        desc=jnp.asarray(rng.normal(size=(n, d)).astype(np.float32)),
        score=jnp.asarray(rng.uniform(0.1, 5.0, (n,)).astype(np.float32)),
        valid=jnp.asarray(rng.uniform(size=n) > 0.2),
    )
    host = _signature(feats)
    dev = np.asarray(signature_device(feats))
    assert host.shape == dev.shape
    # identical descriptor SETS (row order may differ on score ties)
    hs = host[np.lexsort(host.T)]
    ds = dev[np.lexsort(dev.T)]
    np.testing.assert_allclose(hs, ds, atol=1e-5)
