"""Raycast + stereo + VO + ICP timing, one dispatch per frame with varying
inputs (scan-of-10 raycast crashed the device with a TPU device error;
per-dispatch is also the shape the pipeline uses)."""

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


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    from denseslam_tpu.config import SystemConfig, TsdfConfig
    from denseslam_tpu.io import synthetic
    from denseslam_tpu.models.dense_slam import fuse_keyframe, make_fusion_db
    from denseslam_tpu.models import frontend as fe
    from denseslam_tpu.ops import icp as icp_ops
    from denseslam_tpu.ops import raycast as rc_ops
    from denseslam_tpu.ops import stereo as stereo_ops
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

    print("tiny: %.3f ms" % tiny_ms())

    n = 10
    poses = synthetic.make_trajectory(n, step_m=0.4, yaw_rate=0.003)
    lefts, rights, depths = synthetic.render_stereo_trajectory(poses, rig)
    Ts = jnp.asarray(poses)
    jax.block_until_ready(depths)

    db = make_fusion_db(cfg)
    m = tsdf_ops.make_map(tc)
    fuse = jax.jit(lambda m, db, d, g, T, f: fuse_keyframe(m, db, d, g, T, f, cfg),
                   donate_argnums=(0, 1))
    for i in range(n):
        m, db = fuse(m, db, depths[i], lefts[i], Ts[i], jnp.int32(i))
    jax.block_until_ready(m.tsdf)
    print("map blocks: %d" % int(tsdf_ops.num_allocated_blocks(m)))

    def per_dispatch(name, f, inputs):
        # warmup on first input
        out = f(*inputs[0])
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for args in inputs[1:]:
            out = f(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / (len(inputs) - 1)
        print("%-24s %8.2f ms/frame  (%6.1f fps)" % (name, dt * 1e3, 1.0 / dt))

    if which in ("all", "raycast"):
        f = jax.jit(lambda m, T: rc_ops.raycast(m, T, intr, tc).depth)
        per_dispatch("raycast 1226x370", f, [(m, Ts[i]) for i in range(n)])
        print("tiny: %.3f ms" % tiny_ms())

    if which in ("all", "stereo"):
        f = jax.jit(lambda l, r: stereo_ops.compute_depth(l, r, rig, cfg.stereo)[0])
        per_dispatch("stereo depth", f, [(lefts[i], rights[i]) for i in range(n)])
        print("tiny: %.3f ms" % tiny_ms())

    if which in ("all", "vo"):
        st = fe.init_frontend(cfg, seed=0)
        f = jax.jit(lambda st, l, r: fe.vo_step(st, l, r, cfg))
        st2, vo = f(st, lefts[0], rights[0])
        jax.block_until_ready(vo.T_wc)
        t0 = time.perf_counter()
        for i in range(1, n):
            st2, vo = f(st2, lefts[i], rights[i])
        jax.block_until_ready(vo.T_wc)
        dt = (time.perf_counter() - t0) / (n - 1)
        print("%-24s %8.2f ms/frame  (%6.1f fps)" % ("sparse VO", dt * 1e3, 1.0 / dt))
        print("tiny: %.3f ms" % tiny_ms())

    if which in ("all", "icp"):
        frc = jax.jit(lambda m, T: rc_ops.raycast(m, T, intr, tc))
        rc = frc(m, Ts[0])
        jax.block_until_ready(rc.depth)
        f = jax.jit(lambda d, rc, T: icp_ops.track(
            d, rc.points, rc.normals, rc.mask, T, T, intr))
        per_dispatch("ICP track", f, [(depths[i], rc, Ts[i]) for i in range(n)])
        print("tiny: %.3f ms" % tiny_ms())


if __name__ == "__main__":
    main()
