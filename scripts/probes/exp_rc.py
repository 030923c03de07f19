"""Bisect the raycast march loop: which part of the step makes it
~1000x slower than the raw-gather microbench?  One variant per process:
    python scripts/exp_rc.py <variant> [steps]
Variants build a REAL populated map, then scan a stripped step body.
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np


def tiny_ms():
    x = jnp.ones((8, 128))
    f = jax.jit(lambda a: a * 2 + 1)
    f(x).block_until_ready()
    ts = []
    for _ in range(8):
        t = time.perf_counter()
        f(x).block_until_ready()
        ts.append(time.perf_counter() - t)
    return float(np.median(ts) * 1e3)


def bench(fn, *args, n=3):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    variant = sys.argv[1]
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 48
    from denseslam_tpu.config import SystemConfig, TsdfConfig
    from denseslam_tpu.io import synthetic
    from denseslam_tpu.models.dense_slam import fuse_keyframe, make_fusion_db
    from denseslam_tpu.ops import hash as vhash
    from denseslam_tpu.ops import tsdf as tsdf_ops
    from denseslam_tpu.utils.camera import Intrinsics, StereoRig

    w, h = 1226, 370
    intr = Intrinsics(fx=707.09, fy=707.09, cx=601.89, cy=183.11,
                      width=w, height=h)
    rig = StereoRig(intr=intr, baseline_m=0.537)
    tc = TsdfConfig(
        voxel_size_m=0.06, trunc_dist_m=0.24, table_slots=1 << 17,
        max_visible_blocks=1 << 14, max_alloc_per_frame=1 << 14,
        max_depth_m=50.0, raycast_steps=192,
    )
    cfg = SystemConfig(rig=rig, tsdf=tc)
    cfg = dataclasses.replace(
        cfg, pipeline=dataclasses.replace(cfg.pipeline, fusion_db_capacity=8))

    print("variant=%s steps=%d tiny: %.3f ms" % (variant, steps, tiny_ms()))

    n = 5
    poses = synthetic.make_trajectory(n, step_m=0.4, yaw_rate=0.003)
    grays, depths = synthetic.render_trajectory(poses, intr)
    Ts = jnp.asarray(poses)
    db = make_fusion_db(cfg)
    m = tsdf_ops.make_map(tc)
    fuse = jax.jit(lambda m, db, d, g, T, f: fuse_keyframe(m, db, d, g, T, f, cfg),
                   donate_argnums=(0, 1))
    for i in range(n):
        m, db = fuse(m, db, depths[i], grays[i], Ts[i], jnp.int32(i))
    jax.block_until_ready(m.tsdf)

    N = h * w
    mu = tc.trunc_dist_m
    block_m = tc.block_size_m

    def ray_setup(T_wc):
        vv = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0).reshape(-1)
        uu = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1).reshape(-1)
        dcx = (uu - intr.cx) / intr.fx
        dcy = (vv - intr.cy) / intr.fy
        R = T_wc[:3, :3]
        t = T_wc[:3, 3]
        dx = R[0, 0] * dcx + R[0, 1] * dcy + R[0, 2]
        dy = R[1, 0] * dcx + R[1, 1] * dcy + R[1, 2]
        dz = R[2, 0] * dcx + R[2, 1] * dcy + R[2, 2]
        norm = jnp.sqrt(dx * dx + dy * dy + dz * dz)
        inv_n = 1.0 / jnp.maximum(norm, 1e-9)
        return t, dx * inv_n, dy * inv_n, dz * inv_n

    inv_v = 1.0 / tc.voxel_size_m

    def march(m, T_wc, body_kind):
        t, ux, uy, uz = ray_setup(T_wc)
        t0v = jnp.full((N,), tc.min_depth_m, dtype=jnp.float32)

        def step(carry, _):
            t_cur = carry
            px = t[0] + ux * t_cur
            py = t[1] + uy * t_cur
            pz = t[2] + uz * t_cur
            vx = jnp.floor(px * inv_v).astype(jnp.int32)
            vy = jnp.floor(py * inv_v).astype(jnp.int32)
            vz = jnp.floor(pz * inv_v).astype(jnp.int32)
            bx, by, bz = vx >> 3, vy >> 3, vz >> 3
            if body_kind == "coords_only":
                adv = jnp.abs(jnp.sin(bx.astype(jnp.float32) + by.astype(jnp.float32))) * 0.1 + 0.2
                return t_cur + adv, None
            keys = vhash.pack_xyz(bx, by, bz)
            if body_kind == "pack_only":
                adv = (keys & 7).astype(jnp.float32) * 0.03 + 0.2
                return t_cur + adv, None
            slots = vhash.lookup_keys(m.table, keys, tc.probe_len)
            if body_kind == "lookup_only":
                adv = jnp.where(slots >= 0, 0.03, block_m * 0.8)
                return t_cur + adv, None
            lx = vx - (bx << 3)
            ly = vy - (by << 3)
            lz = vz - (bz << 3)
            lidx = lx + ly * 8 + lz * 64
            safe = jnp.where(slots >= 0, slots, 0)
            flat_idx = safe * 512 + lidx
            sdf = m.tsdf.reshape(-1)[flat_idx]
            if body_kind == "sdf_gather":
                adv = jnp.where(slots >= 0, jnp.maximum(sdf * mu, 0.03), block_m * 0.8)
                return t_cur + adv, None
            wgt = m.weight.reshape(-1)[flat_idx]
            adv = jnp.where((slots >= 0) & (wgt > 0),
                            jnp.maximum(sdf * mu, 0.03), block_m * 0.8)
            return t_cur + adv, None

        tf, _ = jax.lax.scan(step, t0v, None, length=steps)
        return tf.sum()

    f = jax.jit(lambda m, T: march(m, T, variant))
    dt = bench(f, m, Ts[0])
    print("%s: %.2f ms total, %.3f ms/step" % (variant, dt * 1e3, dt * 1e3 / steps))
    print("tiny after: %.3f ms" % tiny_ms())


if __name__ == "__main__":
    main()
