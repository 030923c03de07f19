import jax.numpy as jnp
import numpy as np
import pytest

from denseslam_tpu.config import tiny_test_config
from denseslam_tpu.io import synthetic
from denseslam_tpu.ops import orb


@pytest.fixture(scope="module")
def image():
    cfg = tiny_test_config(width=240, height=180)
    gray, _ = synthetic.render_view(jnp.eye(4, dtype=jnp.float32), cfg.rig.intr)
    return gray


def test_detect_basic(image):
    f = orb.detect(image, max_features=256)
    n = int(f.valid.sum())
    assert n > 60, n
    uv = np.asarray(f.uv)[np.asarray(f.valid)]
    h, w = image.shape
    assert uv[:, 0].min() >= 19 and uv[:, 0].max() <= w - 20
    # descriptors are non-degenerate (not all zero / all ones)
    d = np.asarray(f.desc)[np.asarray(f.valid)]
    pop = np.unpackbits(d.view(np.uint8), axis=1).sum(axis=1)
    assert 40 < pop.mean() < 216


def test_rotation_invariance(image):
    """Detect on the image and on its 180-deg rotation: matched descriptors
    must correspond to the same physical points."""
    img0 = image
    img1 = jnp.rot90(image, k=2)
    f0 = orb.detect(img0, max_features=256)
    f1 = orb.detect(img1, max_features=256)
    m = orb.match(f0, f1, max_dist=60)
    midx = np.asarray(m)
    ok = midx >= 0
    assert ok.sum() > 30, ok.sum()
    h, w = image.shape
    uv0 = np.asarray(f0.uv)[ok]
    uv1 = np.asarray(f1.uv)[np.maximum(midx[ok], 0)]
    # 180-deg rotation maps (u, v) -> (w-1-u, h-1-v)
    pred = np.stack([w - 1 - uv0[:, 0], h - 1 - uv0[:, 1]], axis=-1)
    err = np.linalg.norm(pred - uv1, axis=-1)
    assert np.median(err) < 2.0, np.median(err)
    assert (err < 3).mean() > 0.7


def test_translation_matching(image):
    """Shifted image: matches must follow the shift."""
    sh = 7
    img1 = jnp.roll(image, (0, sh), axis=(0, 1))
    f0 = orb.detect(image, max_features=256)
    f1 = orb.detect(img1, max_features=256)
    m = orb.match(f0, f1, max_dist=50)
    midx = np.asarray(m)
    ok = midx >= 0
    assert ok.sum() > 50
    du = np.asarray(f1.uv)[np.maximum(midx[ok], 0), 0] - np.asarray(f0.uv)[ok, 0]
    assert abs(np.median(du) - sh) < 1.0


def test_pyramid_detection(image):
    f = orb.detect_pyramid(image, max_features=384, levels=3)
    assert int(f.valid.sum()) > 80
    # coords live in level-0 frame
    uv = np.asarray(f.uv)[np.asarray(f.valid)]
    assert uv[:, 0].max() < image.shape[1]


def test_hamming_matrix_basics():
    a = jnp.asarray(np.array([[0] * 8, [0xFFFFFFFF] * 8], np.uint32))
    d = orb.hamming_matrix(a, a)
    assert int(d[0, 0]) == 0 and int(d[1, 1]) == 0
    assert int(d[0, 1]) == 256
