"""Pinhole camera model + projection utilities.

Equivalent surface to the reference's `ITMIntrinsics` / `ITMRGBDCalib`
(reference: src/DenseSLAM/InfiniTamDriver.cpp:55-81) and the disparity->depth
conversion in DepthProvider (reference: src/DenseSLAM/DepthProvider.h:42-98),
re-expressed as a static NamedTuple so it can ride through jit as a constant
or as traced scalars.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class Intrinsics(NamedTuple):
    fx: float
    fy: float
    cx: float
    cy: float
    width: int   # static python int — defines array shapes
    height: int  # static python int

    def k_matrix(self) -> jax.Array:
        return jnp.array(
            [[self.fx, 0.0, self.cx], [0.0, self.fy, self.cy], [0.0, 0.0, 1.0]],
            dtype=jnp.float32,
        )

    def scaled(self, s: float) -> "Intrinsics":
        """Intrinsics for an image resized by factor s (Input low-res mode,
        reference: src/DenseSLAM/Input.cpp:117-138)."""
        return Intrinsics(
            self.fx * s, self.fy * s, self.cx * s, self.cy * s,
            int(self.width * s), int(self.height * s),
        )


class StereoRig(NamedTuple):
    """Rectified stereo rig: intrinsics + baseline in meters."""
    intr: Intrinsics
    baseline_m: float


def backproject(depth: jax.Array, intr: Intrinsics) -> jax.Array:
    """Depth map (H, W) in meters -> camera-frame points (H, W, 3)."""
    h, w = depth.shape
    v = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    u = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    x = (u - intr.cx) / intr.fx * depth
    y = (v - intr.cy) / intr.fy * depth
    return jnp.stack([x, y, depth], axis=-1)


def project(pts: jax.Array, intr: Intrinsics) -> Tuple[jax.Array, jax.Array]:
    """Camera-frame points (..., 3) -> pixel coords (..., 2) and depth (...,).

    Pixels are (u, v). Depth <= 0 projects behind the camera; callers mask.
    """
    z = pts[..., 2]
    safe_z = jnp.where(jnp.abs(z) > 1e-9, z, 1e-9)
    u = pts[..., 0] / safe_z * intr.fx + intr.cx
    v = pts[..., 1] / safe_z * intr.fy + intr.cy
    return jnp.stack([u, v], axis=-1), z


def in_bounds(uv: jax.Array, intr: Intrinsics, margin: float = 0.0) -> jax.Array:
    """Mask of pixel coords inside the image."""
    u, v = uv[..., 0], uv[..., 1]
    return (
        (u >= margin)
        & (u <= intr.width - 1 - margin)
        & (v >= margin)
        & (v <= intr.height - 1 - margin)
    )


def disparity_to_depth(disp: jax.Array, rig: StereoRig,
                       min_depth_m: float = 0.05,
                       max_depth_m: float = 50.0) -> jax.Array:
    """d = f*B / disp with min/max clamping to 0 (invalid).

    Mirrors DepthProvider::DepthFromDisparity + the mm clamp semantics
    (reference: src/DenseSLAM/DepthProvider.h:46-98) but stays in float32
    meters; 0 marks invalid depth throughout this framework.
    """
    fb = rig.intr.fx * rig.baseline_m
    valid = disp > 1e-3
    depth = jnp.where(valid, fb / jnp.maximum(disp, 1e-3), 0.0)
    keep = valid & (depth >= min_depth_m) & (depth <= max_depth_m)
    return jnp.where(keep, depth, 0.0)


def depth_m_to_mm_i16(depth_m: jax.Array) -> jax.Array:
    """Float meters -> int16 millimeters, saturating (reference convention:
    src/DenseSLAM/DepthProvider.h:57-98)."""
    mm = jnp.round(depth_m * 1000.0)
    return jnp.clip(mm, 0, 32767).astype(jnp.int16)


def depth_mm_i16_to_m(depth_mm: jax.Array) -> jax.Array:
    return depth_mm.astype(jnp.float32) * 1e-3
