"""Second raycast bisect: real rc_ops.raycast at varying step counts vs the
stripped march at 192 — separates loop-body cost from tail cost.
    python scripts/exp_rc2.py <variant>
variants: real4 real48 real192 tail0  (tail0 = real raycast with steps=4 and
no trilinear/color/normals tail — edit-free approximation via tiny steps)
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
    from denseslam_tpu.config import SystemConfig, TsdfConfig
    from denseslam_tpu.io import synthetic
    from denseslam_tpu.models.dense_slam import fuse_keyframe, make_fusion_db
    from denseslam_tpu.ops import raycast as rc_ops
    from denseslam_tpu.ops import tsdf as tsdf_ops
    from denseslam_tpu.utils.camera import Intrinsics, StereoRig

    w, h = 1226, 370
    intr = Intrinsics(fx=707.09, fy=707.09, cx=601.89, cy=183.11,
                      width=w, height=h)
    rig = StereoRig(intr=intr, baseline_m=0.537)
    steps = {"real4": 4, "real48": 48, "real192": 192}[variant]
    tc = TsdfConfig(
        voxel_size_m=0.06, trunc_dist_m=0.24, table_slots=1 << 17,
        max_visible_blocks=1 << 14, max_alloc_per_frame=1 << 14,
        max_depth_m=50.0, raycast_steps=steps,
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

    f = jax.jit(lambda m, T: rc_ops.raycast(m, T, intr, tc).depth)
    out = f(m, Ts[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(1, n):
        out = f(m, Ts[i])
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / (n - 1)
    print("%s: %.2f ms/frame (varying pose)" % (variant, dt * 1e3))
    print("depth mean %.3f nonzero %.3f" % (
        float(out.mean()), float((out > 0).mean())))
    print("tiny after: %.3f ms" % tiny_ms())


if __name__ == "__main__":
    main()
