"""Synthetic RGB-D/stereo sequence generator — the test fixture backbone.

The reference verifies end-to-end against a mini KITTI sequence
(reference: README.md:43-47); no dataset ships with this repo, so unit and
golden-trajectory tests render an analytic scene (spheres + ground plane +
back wall) with exact depth and poses. Stereo pairs are rendered from two
offset viewpoints so the stereo/VO stack can be tested against ground truth.

All rendering runs through ONE jitted program per (intrinsics, scene
geometry) pair — never eagerly. On the tunneled TPU backend a burst of
eager per-op dispatches (a 10-frame render loop used to issue thousands)
flips the remote runtime into a degraded mode that persists for minutes and
poisons every later measurement in the process. `render_trajectory`
renders a whole pose batch in a single dispatch. Internals are SoA
(separate x/y/z planes) — no (H, W, 3) minor-dim-3 intermediates, per the
TPU layout rule in ops/hash.py.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import lie
from ..utils.camera import Intrinsics, StereoRig


class Scene(NamedTuple):
    sphere_centers: jax.Array  # (S, 3) world frame
    sphere_radii: jax.Array    # (S,)
    plane_y: float             # ground plane y = plane_y (y down)
    wall_z: float              # back wall z = wall_z
    side_x: float = -1.0       # |x| = side_x street walls; <= 0 disables


@functools.lru_cache(maxsize=1)
def _default_scene_arrays():
    centers = np.array(
        [
            [0.0, 0.0, 2.5],
            [-1.0, -0.3, 3.5],
            [1.2, 0.4, 4.0],
            [0.3, -0.8, 5.5],
        ],
        dtype=np.float32,
    )
    radii = np.array([0.6, 0.45, 0.7, 0.5], dtype=np.float32)
    return centers, radii


def default_scene() -> Scene:
    centers, radii = _default_scene_arrays()
    return Scene(jnp.asarray(centers), jnp.asarray(radii),
                 plane_y=1.2, wall_z=8.0)


def street_scene(length_m: float = 80.0, width_m: float = 14.0,
                 seed: int = 7, n_spheres: int = 24) -> Scene:
    """KITTI-like street corridor: ground plane at camera height, building
    walls at x = +-width/2, parked-obstacle spheres along the path, far end
    wall. Use for full-pipeline drives where the camera travels tens of
    meters (the default scene's 8 m back wall is reached in a few frames at
    driving speed)."""
    rng = np.random.default_rng(seed)
    z = rng.uniform(4.0, length_m - 5.0, n_spheres)
    x = rng.uniform(-width_m / 2 + 1.0, width_m / 2 - 1.0, n_spheres)
    r = rng.uniform(0.3, 1.1, n_spheres)
    y = 1.65 - r  # resting on the ground plane
    centers = np.stack([x, y, z], -1).astype(np.float32)
    return Scene(jnp.asarray(centers), jnp.asarray(r.astype(np.float32)),
                 plane_y=1.65, wall_z=float(length_m),
                 side_x=float(width_m / 2))


def loop_scene(poses: np.ndarray, seed: int = 11,
               n_spheres: int = 48) -> Scene:
    """Open scene for LOOP drives: textured ground plane + sphere
    obstacles (occluders) scattered laterally around the given trajectory,
    no near walls — the loop-closure fixture a street corridor can't
    provide (a circular path revisits its start with the same heading)."""
    rng = np.random.default_rng(seed)
    r = rng.uniform(0.4, 1.3, n_spheres)
    idx = rng.integers(0, len(poses), n_spheres)
    lateral = rng.uniform(2.0, 7.0, n_spheres) * rng.choice(
        [-1.0, 1.0], n_spheres)
    ahead = rng.uniform(-2.0, 2.0, n_spheres)
    centers = np.empty((n_spheres, 3), np.float32)
    for k in range(n_spheres):
        T = poses[idx[k]]
        p = T[:3, 3] + T[:3, 0] * lateral[k] + T[:3, 2] * ahead[k]
        centers[k] = [p[0], 1.65 - r[k], p[2]]
    span = float(np.abs(poses[:, :3, 3]).max()) + 50.0
    return Scene(jnp.asarray(centers), jnp.asarray(r.astype(np.float32)),
                 plane_y=1.65, wall_z=span, side_x=-1.0)


def make_loop_trajectory(n_frames: int, radius_m: float = 15.0,
                         closure_frames: int = 0) -> np.ndarray:
    """Circular T_wc trajectory through the origin: the camera drives a
    full circle of `radius_m` in `n_frames` frames and then `closure_frames`
    more past the start — an exact revisit with identical heading (the
    loop-closure test workload). Pure numpy."""
    yaw = 2.0 * np.pi / n_frames
    step = yaw * radius_m
    xi = np.array([0.0, 0.0, step, 0.0, yaw, 0.0], dtype=np.float32)
    dT = np.asarray(lie.se3_exp_np(xi))
    poses = []
    T = np.eye(4, dtype=np.float32)
    for _ in range(n_frames + closure_frames):
        poses.append(T.copy())
        T = (T @ dT).astype(np.float32)
    return np.stack(poses)


def _ray_scene_depth_soa(ox, oy, oz, dx, dy, dz,
                         centers, radii, plane_y, wall_z, side_x=-1.0):
    """Analytic ray-scene intersection, SoA; returns ray depth t (0 = miss).

    `centers`/`radii` are traced arrays; sphere count is a static shape."""
    big = 1e9
    t_best = jnp.full(dx.shape, big, dtype=jnp.float32)

    # Spheres. Dirs are z-normalised (not unit), so keep the |d|^2 term.
    a = dx * dx + dy * dy + dz * dz
    for i in range(centers.shape[0]):
        ocx = ox - centers[i, 0]
        ocy = oy - centers[i, 1]
        ocz = oz - centers[i, 2]
        b = ocx * dx + ocy * dy + ocz * dz
        cc = ocx * ocx + ocy * ocy + ocz * ocz - radii[i] * radii[i]
        disc = b * b - a * cc
        hit = disc > 0
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t = (-b - sq) / a
        t = jnp.where(hit & (t > 1e-3), t, big)
        t_best = jnp.minimum(t_best, t)

    # Ground plane y = plane_y (normal pointing up = -y).
    safe_dy = jnp.where(jnp.abs(dy) > 1e-6, dy, 1.0)
    tp = jnp.where(jnp.abs(dy) > 1e-6, (plane_y - oy) / safe_dy, big)
    tp = jnp.where(tp > 1e-3, tp, big)
    t_best = jnp.minimum(t_best, tp)

    # Back wall z = wall_z.
    safe_dz = jnp.where(jnp.abs(dz) > 1e-6, dz, 1.0)
    tw = jnp.where(jnp.abs(dz) > 1e-6, (wall_z - oz) / safe_dz, big)
    tw = jnp.where(tw > 1e-3, tw, big)
    t_best = jnp.minimum(t_best, tw)

    # Street side walls x = +-side_x (building fronts).
    if side_x > 0:
        safe_dx = jnp.where(jnp.abs(dx) > 1e-6, dx, 1.0)
        for wx in (side_x, -side_x):
            ts = jnp.where(jnp.abs(dx) > 1e-6, (wx - ox) / safe_dx, big)
            ts = jnp.where(ts > 1e-3, ts, big)
            t_best = jnp.minimum(t_best, ts)

    return jnp.where(t_best < big * 0.5, t_best, 0.0)


def _value_noise_soa(px, py, pz, freq: float) -> jax.Array:
    """Hash-lattice value noise in [-1, 1]: aperiodic, world-anchored.

    Periodic (sinusoid) textures alias the feature matcher — descriptors
    lock onto the wrong lobe consistently and pass circular checks — so the
    fixture texture must be non-repeating.
    """
    gx, gy, gz = px * freq, py * freq, pz * freq
    g0x = jnp.floor(gx).astype(jnp.int32)
    g0y = jnp.floor(gy).astype(jnp.int32)
    g0z = jnp.floor(gz).astype(jnp.int32)
    fx, fy, fz = gx - g0x, gy - g0y, gz - g0z

    def hash3(cx, cy, cz):
        h = cx * 374761393 + cy * 668265263 + cz * 1274126177
        h = (h ^ (h >> 13)) * 1103515245
        h = h ^ (h >> 16)
        return ((h & 0x7FFF).astype(jnp.float32) / 16383.5) - 1.0

    # smoothstep interpolation weights
    wx = fx * fx * (3.0 - 2.0 * fx)
    wy = fy * fy * (3.0 - 2.0 * fy)
    wz = fz * fz * (3.0 - 2.0 * fz)
    acc = 0.0
    for dz_ in (0, 1):
        for dy_ in (0, 1):
            for dx_ in (0, 1):
                val = hash3(g0x + dx_, g0y + dy_, g0z + dz_)
                wt = (
                    (wx if dx_ else 1 - wx)
                    * (wy if dy_ else 1 - wy)
                    * (wz if dz_ else 1 - wz)
                )
                acc = acc + val * wt
    return acc


def _texture_soa(px, py, pz) -> jax.Array:
    """Procedural world-anchored texture -> float intensity [0,255].

    Multi-octave aperiodic value noise: high-frequency detail for feature
    detectors, no spatial repetition to alias the matcher.
    """
    v = (
        _value_noise_soa(px, py, pz, 3.1)
        + 0.6 * _value_noise_soa(px, py, pz, 7.7)
        + 0.35 * _value_noise_soa(px, py, pz, 17.3)
        + 0.18 * _value_noise_soa(px, py, pz, 39.9)
    )
    return jnp.clip(128.0 + 90.0 * v, 5.0, 250.0)


def _texture(pts_w: jax.Array) -> jax.Array:
    """(…, 3) AoS wrapper for tests/cold paths."""
    return _texture_soa(pts_w[..., 0], pts_w[..., 1], pts_w[..., 2])


def _render_one(T_wc, centers, radii, intr: Intrinsics,
                plane_y: float, wall_z: float, side_x: float = -1.0):
    """Render (gray, z-depth) for one pose — trace-time body, fully SoA."""
    h, w = intr.height, intr.width
    v = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    u = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    # z-normalised camera-frame ray directions
    dcx = (u - intr.cx) / intr.fx
    dcy = (v - intr.cy) / intr.fy
    R = T_wc[:3, :3]
    t = T_wc[:3, 3]
    dwx = R[0, 0] * dcx + R[0, 1] * dcy + R[0, 2]
    dwy = R[1, 0] * dcx + R[1, 1] * dcy + R[1, 2]
    dwz = R[2, 0] * dcx + R[2, 1] * dcy + R[2, 2]
    ox, oy, oz = t[0], t[1], t[2]
    tz = _ray_scene_depth_soa(ox, oy, oz, dwx, dwy, dwz,
                              centers, radii, plane_y, wall_z, side_x)
    px = ox + dwx * tz
    py = oy + dwy * tz
    pz = oz + dwz * tz
    gray = jnp.where(tz > 0, _texture_soa(px, py, pz), 0.0)
    return gray, tz


@functools.lru_cache(maxsize=16)
def _render_program(intr: Intrinsics, plane_y: float, wall_z: float,
                    batched: bool, side_x: float = -1.0):
    def one(T_wc, centers, radii):
        return _render_one(T_wc, centers, radii, intr, plane_y, wall_z,
                           side_x)

    f = jax.vmap(one, in_axes=(0, None, None)) if batched else one
    return jax.jit(f)


def render_view(T_wc: jax.Array, intr: Intrinsics,
                scene: Scene | None = None) -> Tuple[jax.Array, jax.Array]:
    """Render (gray_u8f, depth_m) from camera pose T_wc (camera-to-world).

    One jitted dispatch; depth is z-depth (ray param of z-normalised dirs).
    """
    if scene is None:
        scene = default_scene()
    f = _render_program(intr, float(scene.plane_y), float(scene.wall_z),
                        False, float(scene.side_x))
    return f(jnp.asarray(T_wc, jnp.float32),
             scene.sphere_centers, scene.sphere_radii)


def render_trajectory(poses, intr: Intrinsics,
                      scene: Scene | None = None) -> Tuple[jax.Array, jax.Array]:
    """Render a whole pose batch (N, 4, 4) -> ((N, H, W) gray, (N, H, W)
    depth) in ONE device dispatch — use this for multi-frame setup."""
    if scene is None:
        scene = default_scene()
    f = _render_program(intr, float(scene.plane_y), float(scene.wall_z),
                        True, float(scene.side_x))
    return f(jnp.asarray(poses, jnp.float32),
             scene.sphere_centers, scene.sphere_radii)


def render_stereo(T_wc: jax.Array, rig: StereoRig,
                  scene: Scene | None = None):
    """Render rectified stereo pair + left depth from left-camera pose."""
    right_offset = np.eye(4, dtype=np.float32)
    right_offset[0, 3] = rig.baseline_m
    T_wc = jnp.asarray(T_wc, jnp.float32)
    left_gray, left_depth = render_view(T_wc, rig.intr, scene)
    right_gray, _ = render_view(T_wc @ right_offset, rig.intr, scene)
    return left_gray, right_gray, left_depth


def render_stereo_trajectory(poses, rig: StereoRig,
                             scene: Scene | None = None):
    """Batched stereo render: (N,4,4) -> (lefts, rights, left_depths), two
    device dispatches total."""
    right_offset = np.eye(4, dtype=np.float32)
    right_offset[0, 3] = rig.baseline_m
    poses = jnp.asarray(poses, jnp.float32)
    lg, ld = render_trajectory(poses, rig.intr, scene)
    rg, _ = render_trajectory(poses @ right_offset, rig.intr, scene)
    return lg, rg, ld


def make_trajectory(n_frames: int, step_m: float = 0.05,
                    yaw_rate: float = 0.004) -> np.ndarray:
    """Simple forward+turn trajectory of T_wc poses, (N, 4, 4) float32.

    Pure numpy — no device dispatches during setup."""
    xi = np.array([0.0, 0.0, step_m, 0.0, yaw_rate, 0.0], dtype=np.float32)
    dT = np.asarray(lie.se3_exp_np(xi))
    poses = []
    T = np.eye(4, dtype=np.float32)
    for _ in range(n_frames):
        poses.append(T.copy())
        T = (T @ dT).astype(np.float32)
    return np.stack(poses)
