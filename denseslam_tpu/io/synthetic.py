"""Synthetic RGB-D/stereo sequence generator — the test fixture backbone.

The reference verifies end-to-end against a mini KITTI sequence
(reference: README.md:43-47); no dataset ships with this repo, so unit and
golden-trajectory tests render an analytic scene (spheres + ground plane +
back wall) with exact depth and poses. Stereo pairs are rendered from two
offset viewpoints so the stereo/VO stack can be tested against ground truth.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import lie
from ..utils.camera import Intrinsics, StereoRig, backproject


class Scene(NamedTuple):
    sphere_centers: jax.Array  # (S, 3) world frame
    sphere_radii: jax.Array    # (S,)
    plane_y: float             # ground plane y = plane_y (y down)
    wall_z: float              # back wall z = wall_z


def default_scene() -> Scene:
    centers = jnp.array(
        [
            [0.0, 0.0, 2.5],
            [-1.0, -0.3, 3.5],
            [1.2, 0.4, 4.0],
            [0.3, -0.8, 5.5],
        ],
        dtype=jnp.float32,
    )
    radii = jnp.array([0.6, 0.45, 0.7, 0.5], dtype=jnp.float32)
    return Scene(centers, radii, plane_y=1.2, wall_z=8.0)


def _ray_scene_depth(origins: jax.Array, dirs: jax.Array, scene: Scene) -> jax.Array:
    """Analytic ray-scene intersection; returns ray depth t (0 = miss)."""
    big = 1e9
    t_best = jnp.full(dirs.shape[:-1], big, dtype=jnp.float32)

    # Spheres. Dirs are z-normalised (not unit), so keep the |d|^2 term.
    a = jnp.sum(dirs * dirs, axis=-1)
    for i in range(scene.sphere_centers.shape[0]):
        c = scene.sphere_centers[i]
        r = scene.sphere_radii[i]
        oc = origins - c
        b = jnp.sum(oc * dirs, axis=-1)
        cc = jnp.sum(oc * oc, axis=-1) - r * r
        disc = b * b - a * cc
        hit = disc > 0
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t = (-b - sq) / a
        t = jnp.where(hit & (t > 1e-3), t, big)
        t_best = jnp.minimum(t_best, t)

    # Ground plane y = plane_y (normal pointing up = -y).
    denom = dirs[..., 1]
    tp = jnp.where(jnp.abs(denom) > 1e-6,
                   (scene.plane_y - origins[..., 1]) / jnp.where(jnp.abs(denom) > 1e-6, denom, 1.0),
                   big)
    tp = jnp.where(tp > 1e-3, tp, big)
    t_best = jnp.minimum(t_best, tp)

    # Back wall z = wall_z.
    denz = dirs[..., 2]
    tw = jnp.where(jnp.abs(denz) > 1e-6,
                   (scene.wall_z - origins[..., 2]) / jnp.where(jnp.abs(denz) > 1e-6, denz, 1.0),
                   big)
    tw = jnp.where(tw > 1e-3, tw, big)
    t_best = jnp.minimum(t_best, tw)

    return jnp.where(t_best < big * 0.5, t_best, 0.0)


def _value_noise(p: jax.Array, freq: float) -> jax.Array:
    """Hash-lattice value noise in [-1, 1]: aperiodic, world-anchored.

    Periodic (sinusoid) textures alias the feature matcher — descriptors
    lock onto the wrong lobe consistently and pass circular checks — so the
    fixture texture must be non-repeating.
    """
    g = p * freq
    g0 = jnp.floor(g).astype(jnp.int32)
    f = g - g0

    def hash3(c):
        h = c[..., 0] * 374761393 + c[..., 1] * 668265263 + c[..., 2] * 1274126177
        h = (h ^ (h >> 13)) * 1103515245
        h = h ^ (h >> 16)
        return ((h & 0x7FFF).astype(jnp.float32) / 16383.5) - 1.0

    # smoothstep interpolation weights
    w = f * f * (3.0 - 2.0 * f)
    acc = 0.0
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                corner = g0 + jnp.array([dx, dy, dz], dtype=jnp.int32)
                val = hash3(corner)
                wt = (
                    (w[..., 0] if dx else 1 - w[..., 0])
                    * (w[..., 1] if dy else 1 - w[..., 1])
                    * (w[..., 2] if dz else 1 - w[..., 2])
                )
                acc = acc + val * wt
    return acc


def _texture(pts_w: jax.Array) -> jax.Array:
    """Procedural world-anchored texture -> (..., ) float intensity [0,255].

    Multi-octave aperiodic value noise: high-frequency detail for feature
    detectors, no spatial repetition to alias the matcher.
    """
    v = (
        _value_noise(pts_w, 3.1)
        + 0.6 * _value_noise(pts_w, 7.7)
        + 0.35 * _value_noise(pts_w, 17.3)
        + 0.18 * _value_noise(pts_w, 39.9)
    )
    return jnp.clip(128.0 + 90.0 * v, 5.0, 250.0)


def render_view(T_wc: jax.Array, intr: Intrinsics,
                scene: Scene | None = None) -> Tuple[jax.Array, jax.Array]:
    """Render (gray_u8f, depth_m) from camera pose T_wc (camera-to-world)."""
    if scene is None:
        scene = default_scene()
    h, w = intr.height, intr.width
    ones = jnp.ones((h, w), dtype=jnp.float32)
    dirs_c = backproject(ones, intr)  # unit-z-normalised directions
    R = T_wc[:3, :3]
    t = T_wc[:3, 3]
    dirs_w = dirs_c @ R.T
    origins = jnp.broadcast_to(t, dirs_w.shape)
    tz = _ray_scene_depth(origins, dirs_w, scene)  # multiple of unit-z dir ⇒ z-depth
    pts_w = origins + dirs_w * tz[..., None]
    gray = jnp.where(tz > 0, _texture(pts_w), 0.0)
    return gray, tz


def render_stereo(T_wc: jax.Array, rig: StereoRig,
                  scene: Scene | None = None):
    """Render rectified stereo pair + left depth from left-camera pose."""
    right_offset = lie.make_T(jnp.eye(3, dtype=jnp.float32),
                              jnp.array([rig.baseline_m, 0.0, 0.0], jnp.float32))
    left_gray, left_depth = render_view(T_wc, rig.intr, scene)
    right_gray, _ = render_view(T_wc @ right_offset, rig.intr, scene)
    return left_gray, right_gray, left_depth


def make_trajectory(n_frames: int, step_m: float = 0.05,
                    yaw_rate: float = 0.004) -> np.ndarray:
    """Simple forward+turn trajectory of T_wc poses, (N, 4, 4) float32."""
    poses = []
    T = np.eye(4, dtype=np.float32)
    for _ in range(n_frames):
        poses.append(T.copy())
        xi = np.array([0.0, 0.0, step_m, 0.0, yaw_rate, 0.0], dtype=np.float32)
        dT = np.asarray(lie.se3_exp(jnp.asarray(xi)))
        T = T @ dT
    return np.stack(poses)
