"""Native IO runtime tests: build the C++ lib, round-trip codecs, prefetch."""

import os

import numpy as np
import pytest

from denseslam_tpu.io import native


@pytest.fixture(scope="module", autouse=True)
def built():
    native.ensure_built()


def test_pfm_roundtrip_native(tmp_path, rng):
    img = rng.random((33, 47)).astype(np.float32)
    p = str(tmp_path / "x.pfm")
    native.write_pfm(p, img)
    back = native.read_pfm(p)
    np.testing.assert_allclose(back, img, rtol=1e-6)


def test_pfm_cross_compat_with_python(tmp_path, rng):
    """Native and python PFM implementations must interoperate."""
    from denseslam_tpu.io import pfm as pypfm

    img = rng.random((20, 30)).astype(np.float32)
    p1 = str(tmp_path / "a.pfm")
    p2 = str(tmp_path / "b.pfm")
    native.write_pfm(p1, img)
    np.testing.assert_allclose(pypfm.read_pfm(p1), img, rtol=1e-6)
    pypfm.write_pfm(p2, img)
    np.testing.assert_allclose(native.read_pfm(p2), img, rtol=1e-6)


def test_png_gray8_roundtrip(tmp_path, rng):
    img = rng.integers(0, 255, (40, 50), np.uint16)
    p = str(tmp_path / "g8.png")
    native.write_png(p, img, bitdepth=8)
    back = native.read_png(p)
    np.testing.assert_array_equal(back, img)


def test_png_gray16_roundtrip(tmp_path, rng):
    img = rng.integers(0, 65535, (40, 50), np.uint16)
    p = str(tmp_path / "g16.png")
    native.write_png(p, img, bitdepth=16)
    back = native.read_png(p)
    np.testing.assert_array_equal(back, img)


def test_png_rgb_roundtrip(tmp_path, rng):
    img = rng.integers(0, 255, (24, 31, 3), np.uint16)
    p = str(tmp_path / "rgb.png")
    native.write_png(p, img, bitdepth=8)
    back = native.read_png(p)
    np.testing.assert_array_equal(back, img)


def test_png_cross_compat_with_cv2(tmp_path, rng):
    """Our PNGs must decode with OpenCV and vice versa (filters incl.)."""
    import cv2

    img16 = rng.integers(0, 60000, (37, 53), np.uint16)
    p1 = str(tmp_path / "ours.png")
    native.write_png(p1, img16, bitdepth=16)
    cv_read = cv2.imread(p1, cv2.IMREAD_UNCHANGED)
    np.testing.assert_array_equal(cv_read, img16)

    p2 = str(tmp_path / "cv.png")
    cv2.imwrite(p2, img16.astype(np.uint16))
    np.testing.assert_array_equal(native.read_png(p2), img16)

    # cv2 uses varied row filters on natural-ish images: decode must match
    grad = np.tile(np.arange(64, dtype=np.uint8), (48, 1))
    noise = rng.integers(0, 30, grad.shape, np.uint8)
    nat = (grad + noise).astype(np.uint8)
    p3 = str(tmp_path / "nat.png")
    cv2.imwrite(p3, nat)
    np.testing.assert_array_equal(native.read_png(p3), nat.astype(np.uint16))


def test_prefetch_loader(tmp_path, rng):
    from denseslam_tpu.io import pfm as pypfm

    paths = []
    imgs = []
    for i in range(6):
        img = rng.random((16, 20)).astype(np.float32)
        p = str(tmp_path / f"{i}.pfm")
        pypfm.write_pfm(p, img)
        paths.append(p)
        imgs.append(img)
    with native.PrefetchLoader(paths, ahead=3, threads=2) as ld:
        out = list(ld)
    assert len(out) == 6
    for a, b in zip(out, imgs):
        np.testing.assert_allclose(a, b, rtol=1e-6)


def test_prefetch_loader_mixed_png(tmp_path, rng):
    import cv2

    paths = []
    for i in range(3):
        img = rng.integers(0, 255, (12, 14), np.uint8)
        p = str(tmp_path / f"{i}.png")
        cv2.imwrite(p, img)
        paths.append(p)
    with native.PrefetchLoader(paths) as ld:
        frames = list(ld)
    assert len(frames) == 3
    assert frames[0].shape == (12, 14)


def test_input_native_backend(tmp_path):
    """datasets.Input with io_backend='native' reads a KITTI-style layout."""
    from tests.test_io_eval import _make_kitti_dataset
    from denseslam_tpu.io import datasets

    root = str(tmp_path)
    cfg = _make_kitti_dataset(root)
    inp = datasets.Input(root, cfg, io_backend="native")
    frames = list(inp)
    assert len(frames) == 3
    np.testing.assert_allclose(frames[0]["depth"], 4.0, atol=1e-3)


def test_input_prefetch_iter_matches_regular(tmp_path):
    from tests.test_io_eval import _make_kitti_dataset
    from denseslam_tpu.io import datasets

    root = str(tmp_path)
    cfg = _make_kitti_dataset(root, n=4)
    a = list(datasets.Input(root, cfg))
    b = list(datasets.Input(root, cfg).prefetch_iter(ahead=2))
    assert len(a) == len(b) == 4
    for fa, fb in zip(a, b):
        np.testing.assert_allclose(fa["left"], fb["left"], atol=1e-3)
        np.testing.assert_allclose(fa["depth"], fb["depth"], atol=1e-3)
