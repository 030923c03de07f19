"""Image ops: sampling, pyramids, filters.

Covers the reference's ITMViewBuilder preprocessing (bilateral depth filter,
reference: src/DenseSLAM/InfiniTamDriver.cpp:280-288 `useBilateralFilter`)
plus the resampling used by Input's low-res mode
(reference: src/DenseSLAM/Input.cpp:117-138). All ops are jit-stable and
vectorised (no per-pixel Python).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bilinear_sample(img: jax.Array, uv: jax.Array, valid_fill: float = 0.0):
    """Sample img (H, W) or (H, W, C) at float pixel coords uv (..., 2).

    Returns (values, mask) where mask marks samples fully inside the image.
    """
    h, w = img.shape[:2]
    u = uv[..., 0]
    v = uv[..., 1]
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    du = u - u0
    dv = v - v0
    u0i = u0.astype(jnp.int32)
    v0i = v0.astype(jnp.int32)
    mask = (u0i >= 0) & (u0i < w - 1) & (v0i >= 0) & (v0i < h - 1)
    u0c = jnp.clip(u0i, 0, w - 2)
    v0c = jnp.clip(v0i, 0, h - 2)

    def gather(yy, xx):
        return img[yy, xx]

    p00 = gather(v0c, u0c)
    p01 = gather(v0c, u0c + 1)
    p10 = gather(v0c + 1, u0c)
    p11 = gather(v0c + 1, u0c + 1)
    if img.ndim == 3:
        du = du[..., None]
        dv = dv[..., None]
    out = (
        p00 * (1 - du) * (1 - dv)
        + p01 * du * (1 - dv)
        + p10 * (1 - du) * dv
        + p11 * du * dv
    )
    fill = jnp.asarray(valid_fill, dtype=out.dtype)
    mvec = mask[..., None] if img.ndim == 3 else mask
    return jnp.where(mvec, out, fill), mask


def nearest_sample(img: jax.Array, uv: jax.Array, valid_fill: float = 0.0):
    """Nearest-neighbour sample; returns (values, mask)."""
    h, w = img.shape[:2]
    ui = jnp.round(uv[..., 0]).astype(jnp.int32)
    vi = jnp.round(uv[..., 1]).astype(jnp.int32)
    mask = (ui >= 0) & (ui < w) & (vi >= 0) & (vi < h)
    uic = jnp.clip(ui, 0, w - 1)
    vic = jnp.clip(vi, 0, h - 1)
    out = img[vic, uic]
    fill = jnp.asarray(valid_fill, dtype=out.dtype)
    mvec = mask[..., None] if img.ndim == 3 else mask
    return jnp.where(mvec, out, fill), mask


def depth_bilinear_sample(depth: jax.Array, uv: jax.Array,
                          max_gap_m: float = 0.1):
    """Bilinear depth sampling that refuses to interpolate across edges.

    A depth sample is valid only if the four corners are all valid (> 0) and
    within max_gap_m of each other — otherwise falls back to nearest valid.
    """
    h, w = depth.shape
    u = uv[..., 0]
    v = uv[..., 1]
    u0i = jnp.floor(u).astype(jnp.int32)
    v0i = jnp.floor(v).astype(jnp.int32)
    inb = (u0i >= 0) & (u0i < w - 1) & (v0i >= 0) & (v0i < h - 1)
    u0c = jnp.clip(u0i, 0, w - 2)
    v0c = jnp.clip(v0i, 0, h - 2)
    p00 = depth[v0c, u0c]
    p01 = depth[v0c, u0c + 1]
    p10 = depth[v0c + 1, u0c]
    p11 = depth[v0c + 1, u0c + 1]
    corners = jnp.stack([p00, p01, p10, p11], axis=-1)
    all_valid = jnp.all(corners > 0, axis=-1)
    spread = jnp.max(corners, axis=-1) - jnp.min(corners, axis=-1)
    smooth = all_valid & (spread < max_gap_m)
    du = u - u0i
    dv = v - v0i
    bil = (
        p00 * (1 - du) * (1 - dv)
        + p01 * du * (1 - dv)
        + p10 * (1 - du) * dv
        + p11 * du * dv
    )
    nn = corners[..., 0]
    out = jnp.where(smooth, bil, nn)
    valid = inb & (out > 0)
    return jnp.where(valid, out, 0.0), valid


def bilateral_filter_depth(depth: jax.Array, radius: int = 2,
                           sigma_space: float = 1.5,
                           sigma_depth_m: float = 0.03) -> jax.Array:
    """Edge-preserving depth smoothing (ITMViewBuilder bilateral filter
    equivalent). Invalid (0) pixels stay invalid and don't contribute.
    Static (2r+1)^2 tap loop — unrolled at trace time, fuses into one kernel.
    """
    valid = depth > 0
    acc = jnp.zeros_like(depth)
    wacc = jnp.zeros_like(depth)
    inv2ss = 1.0 / (2.0 * sigma_space * sigma_space)
    inv2sd = 1.0 / (2.0 * sigma_depth_m * sigma_depth_m)
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            shifted = jnp.roll(depth, (dy, dx), axis=(0, 1))
            svalid = jnp.roll(valid, (dy, dx), axis=(0, 1))
            dd = shifted - depth
            wgt = jnp.where(
                svalid & valid,
                jnp.exp(-(dx * dx + dy * dy) * inv2ss - dd * dd * inv2sd),
                0.0,
            )
            acc = acc + wgt * shifted
            wacc = wacc + wgt
    out = jnp.where(wacc > 1e-6, acc / jnp.maximum(wacc, 1e-6), 0.0)
    return jnp.where(valid, out, 0.0)


def downsample2(img: jax.Array) -> jax.Array:
    """2x box downsample of (H, W) or (H, W, C); H, W must be even."""
    h, w = img.shape[:2]
    if img.ndim == 2:
        r = img.reshape(h // 2, 2, w // 2, 2)
        return r.mean(axis=(1, 3))
    r = img.reshape(h // 2, 2, w // 2, 2, img.shape[2])
    return r.mean(axis=(1, 3))


def downsample2_depth(depth: jax.Array) -> jax.Array:
    """2x depth downsample averaging only valid pixels."""
    h, w = depth.shape
    r = depth.reshape(h // 2, 2, w // 2, 2)
    v = (r > 0).astype(depth.dtype)
    s = (r * v).sum(axis=(1, 3))
    c = v.sum(axis=(1, 3))
    return jnp.where(c > 0, s / jnp.maximum(c, 1.0), 0.0)


def gradient_xy(img: jax.Array) -> jax.Array:
    """Central-difference gradients; returns (H, W, 2) [gx, gy]."""
    gx = 0.5 * (jnp.roll(img, -1, axis=1) - jnp.roll(img, 1, axis=1))
    gy = 0.5 * (jnp.roll(img, -1, axis=0) - jnp.roll(img, 1, axis=0))
    gx = gx.at[:, 0].set(0.0).at[:, -1].set(0.0)
    gy = gy.at[0, :].set(0.0).at[-1, :].set(0.0)
    return jnp.stack([gx, gy], axis=-1)


def rgb_to_gray(rgb: jax.Array) -> jax.Array:
    """(H, W, 3) float or uint8 -> (H, W) float32 grayscale."""
    rgbf = rgb.astype(jnp.float32)
    return rgbf[..., 0] * 0.299 + rgbf[..., 1] * 0.587 + rgbf[..., 2] * 0.114
