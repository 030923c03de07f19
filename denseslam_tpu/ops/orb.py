"""ORB-style features: oriented FAST + steered binary descriptors.

Capability target: ORB-SLAM2's feature stack (multi-scale oriented FAST,
rotation-steered BRIEF, Hamming matching) — the reference's keyframe
matching/relocalisation currency (reference surface: SURVEY.md section 2b,
`ORBextractor.nFeatures` read at DenseSlam.h:376-380). TPU re-design:

  * FAST segment test evaluated for ALL pixels at once — the 16 Bresenham
    taps are `jnp.roll` shifts, the contiguous-9 test is an OR over 16
    rotations of an unrolled AND window (pure VPU);
  * orientation by intensity centroid (two box-weighted convolutions);
  * the BRIEF pair pattern is generated from a fixed PRNG seed (classic
    BRIEF; self-consistent across the system) and steered per keypoint by
    its orientation — sampling is one gather per pair end;
  * descriptors pack to (N, 8) uint32; Hamming distance = XOR + vectorised
    popcount, contracted over the word axis for the (Na, Nb) cost matrix.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# 16-point Bresenham circle of radius 3 (dy, dx), clockwise.
_CIRCLE = np.array(
    [(-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
     (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1)],
    dtype=np.int32,
)

N_PAIRS = 256
_PATCH = 15  # descriptor patch half-size


def _brief_pattern() -> np.ndarray:
    """(256, 4) [ay, ax, by, bx] gaussian pairs, fixed seed."""
    rng = np.random.default_rng(42)
    p = rng.normal(0.0, _PATCH / 2.5, (N_PAIRS, 4))
    return np.clip(p, -_PATCH, _PATCH).astype(np.float32)


_PATTERN = _brief_pattern()


class OrbFeatures(NamedTuple):
    uv: jax.Array       # f32 (N, 2)
    angle: jax.Array    # f32 (N,) radians
    desc: jax.Array     # uint32 (N, 8) packed 256-bit descriptors
    score: jax.Array    # f32 (N,)
    valid: jax.Array    # bool (N,)


def fast_score(gray: jax.Array, thresh: float = 18.0,
               arc: int = 9) -> jax.Array:
    """FAST corner response: 0 where not a corner, else sum|taps - center|
    over the contiguous arc (a standard FAST score)."""
    taps = [jnp.roll(gray, (-int(dy), -int(dx)), axis=(0, 1))
            for dy, dx in _CIRCLE]
    t = jnp.stack(taps, axis=0)                   # (16, H, W)
    brighter = t > gray[None] + thresh
    darker = t < gray[None] - thresh

    def has_arc(m):
        ok = jnp.zeros_like(m[0])
        for start in range(16):
            run = m[start]
            for k in range(1, arc):
                run = run & m[(start + k) % 16]
            ok = ok | run
        return ok

    corner = has_arc(brighter) | has_arc(darker)
    strength = jnp.sum(jnp.abs(t - gray[None]), axis=0)
    return jnp.where(corner, strength, 0.0)


def orientation(gray: jax.Array, uv: jax.Array, radius: int = 7) -> jax.Array:
    """Intensity-centroid angle at integer keypoint locations."""
    h, w = gray.shape
    ui = jnp.clip(uv[:, 0].astype(jnp.int32), radius, w - 1 - radius)
    vi = jnp.clip(uv[:, 1].astype(jnp.int32), radius, h - 1 - radius)
    flat = gray.reshape(-1)
    m10 = 0.0
    m01 = 0.0
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            if dx * dx + dy * dy > radius * radius:
                continue
            val = flat[(vi + dy) * w + (ui + dx)]
            m10 = m10 + dx * val
            m01 = m01 + dy * val
    return jnp.arctan2(m01, m10)


def describe(gray: jax.Array, uv: jax.Array, angle: jax.Array) -> jax.Array:
    """Steered-BRIEF descriptors -> (N, 8) uint32."""
    h, w = gray.shape
    ca = jnp.cos(angle)[:, None]
    sa = jnp.sin(angle)[:, None]
    pat = jnp.asarray(_PATTERN)                    # (256, 4)
    ay, ax, by, bx = pat[:, 0][None], pat[:, 1][None], pat[:, 2][None], pat[:, 3][None]
    # rotate offsets by the keypoint angle
    rax = ca * ax - sa * ay
    ray = sa * ax + ca * ay
    rbx = ca * bx - sa * by
    rby = sa * bx + ca * by
    u = uv[:, 0][:, None]
    v = uv[:, 1][:, None]
    ua = jnp.clip(jnp.round(u + rax).astype(jnp.int32), 0, w - 1)
    va = jnp.clip(jnp.round(v + ray).astype(jnp.int32), 0, h - 1)
    ub = jnp.clip(jnp.round(u + rbx).astype(jnp.int32), 0, w - 1)
    vb = jnp.clip(jnp.round(v + rby).astype(jnp.int32), 0, h - 1)
    flat = gray.reshape(-1)
    bits = (flat[va * w + ua] < flat[vb * w + ub]).astype(jnp.uint32)  # (N, 256)
    words = bits.reshape(-1, 8, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)[None, None, :]
    return jnp.sum(words << shifts, axis=-1, dtype=jnp.uint32)         # (N, 8)


def detect(gray: jax.Array, max_features: int = 512,
           thresh: float = 18.0, nms_radius: int = 4,
           border: int = 19) -> OrbFeatures:
    """Single-scale oriented-FAST + steered-BRIEF extraction."""
    h, w = gray.shape
    score = fast_score(gray, thresh)
    mx = jax.lax.reduce_window(
        score, -jnp.inf, jax.lax.max,
        (2 * nms_radius + 1, 2 * nms_radius + 1), (1, 1), "SAME")
    inb = jnp.zeros((h, w), bool).at[border:h - border, border:w - border].set(True)
    ok = (score >= mx) & (score > 0) & inb
    flat_scores = jnp.where(ok, score, -jnp.inf).reshape(-1)
    top, idx = jax.lax.top_k(flat_scores, max_features)
    ui = idx % w
    vi = idx // w
    # Parabolic subpixel refinement on the FAST response map — matters at
    # coarse pyramid levels where integer coords quantise to 2^level px
    # after mapping back to level 0 (hurts BA reprojection residuals).
    uic = jnp.clip(ui, 1, w - 2)
    vic = jnp.clip(vi, 1, h - 2)
    rc = score[vic, uic]
    rl = score[vic, uic - 1]
    rr = score[vic, uic + 1]
    rt = score[vic - 1, uic]
    rb = score[vic + 1, uic]
    den_u = rl - 2.0 * rc + rr
    den_v = rt - 2.0 * rc + rb
    du_sub = jnp.where(jnp.abs(den_u) > 1e-6, 0.5 * (rl - rr) / den_u, 0.0)
    dv_sub = jnp.where(jnp.abs(den_v) > 1e-6, 0.5 * (rt - rb) / den_v, 0.0)
    u = ui.astype(jnp.float32) + jnp.clip(du_sub, -0.5, 0.5)
    v = vi.astype(jnp.float32) + jnp.clip(dv_sub, -0.5, 0.5)
    uv = jnp.stack([u, v], axis=-1)
    valid = jnp.isfinite(top) & (top > 0)
    ang = orientation(gray, uv)
    desc = describe(gray, uv, ang)
    return OrbFeatures(uv=uv, angle=ang, desc=desc,
                       score=jnp.where(valid, top, 0.0), valid=valid)


def detect_pyramid(gray: jax.Array, max_features: int = 512,
                   levels: int = 3, scale: float = 0.5,
                   thresh: float = 18.0) -> OrbFeatures:
    """Multi-scale detection: per-level extraction, coords mapped to level 0.

    Levels use exact 2x box downsampling (scale is fixed at 0.5; the
    argument is kept for API parity)."""
    from ..utils.image import downsample2

    per_level = max_features // levels
    feats = []
    img = gray
    factor = 1.0
    for lv in range(levels):
        f = detect(img, per_level, thresh)
        feats.append(f._replace(uv=f.uv * factor))
        if lv + 1 < levels:
            hh = (img.shape[0] // 2) * 2
            ww = (img.shape[1] // 2) * 2
            img = downsample2(img[:hh, :ww])
            factor *= 2.0
    return OrbFeatures(
        uv=jnp.concatenate([f.uv for f in feats]),
        angle=jnp.concatenate([f.angle for f in feats]),
        desc=jnp.concatenate([f.desc for f in feats]),
        score=jnp.concatenate([f.score for f in feats]),
        valid=jnp.concatenate([f.valid for f in feats]),
    )


def unpack_desc(desc: jax.Array) -> jax.Array:
    """(N, 8) uint32 packed bits -> (N, 256) float in {-1/16, +1/16}.

    The +-1/16 scaling makes every descriptor unit-norm, so the generic
    squared-L2 matmul cost (ops/matching._pair_cost) equals Hamming/64 —
    ORB plugs into the same MXU matching path as the gradient features."""
    shifts = jnp.arange(32, dtype=jnp.uint32)[None, None, :]
    bits = ((desc[:, :, None] >> shifts) & jnp.uint32(1)).astype(jnp.float32)
    return (bits * 2.0 - 1.0).reshape(desc.shape[0], 8 * 32) / 16.0


def to_common(f: OrbFeatures):
    """OrbFeatures -> the system-wide `Features` struct (single class 0).

    Downstream consumers (quad_match, build_window_problem, retrieval
    signatures) are descriptor-width agnostic; they see (N, 256) unit
    vectors whose distances are monotone in Hamming distance."""
    from .features import Features

    n = f.uv.shape[0]
    return Features(
        uv=f.uv,
        cls=jnp.zeros((n,), jnp.int32),
        desc=unpack_desc(f.desc),
        score=f.score,
        valid=f.valid,
    )


def _popcount32(x: jax.Array) -> jax.Array:
    x = x - ((x >> 1) & jnp.uint32(0x55555555))
    x = (x & jnp.uint32(0x33333333)) + ((x >> 2) & jnp.uint32(0x33333333))
    x = (x + (x >> 4)) & jnp.uint32(0x0F0F0F0F)
    return (x * jnp.uint32(0x01010101)) >> 24


def hamming_matrix(a: jax.Array, b: jax.Array) -> jax.Array:
    """(Na, 8) x (Nb, 8) uint32 -> (Na, Nb) int32 Hamming distances."""
    x = a[:, None, :] ^ b[None, :, :]
    return jnp.sum(_popcount32(x), axis=-1).astype(jnp.int32)


def match(fa: OrbFeatures, fb: OrbFeatures,
          max_dist: int = 64) -> jax.Array:
    """Mutual-NN Hamming matching: (Na,) index into b, -1 unmatched."""
    d = hamming_matrix(fa.desc, fb.desc)
    big = jnp.int32(10_000)
    d = jnp.where(fa.valid[:, None] & fb.valid[None, :], d, big)
    fwd = jnp.argmin(d, axis=1)
    bwd = jnp.argmin(d, axis=0)
    best = jnp.take_along_axis(d, fwd[:, None], axis=1)[:, 0]
    ok = (best <= max_dist) & (bwd[fwd] == jnp.arange(d.shape[0]))
    return jnp.where(ok, fwd, -1)
