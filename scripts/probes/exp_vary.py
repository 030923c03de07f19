"""Isolate the degraded-mode trigger: varying inputs vs feedback vs scalar
uploads."""

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
    from denseslam_tpu.config import SystemConfig, TsdfConfig
    from denseslam_tpu.io import synthetic
    from denseslam_tpu.models.dense_slam import fuse_keyframe, make_fusion_db
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
        cfg,
        decay=dataclasses.replace(cfg.decay, enabled=True,
                                  min_decay_age=30, max_decay_weight=2),
        slide_window=dataclasses.replace(cfg.slide_window, enabled=True,
                                        max_age=60),
        pipeline=dataclasses.replace(cfg.pipeline, fusion_db_capacity=8),
    )

    chunk = 10
    poses = synthetic.make_trajectory(chunk, step_m=0.8, yaw_rate=0.003)
    gs, ds = [], []
    for i in range(chunk):
        g2, d2 = synthetic.render_view(jnp.asarray(poses[i]), intr)
        gs.append(g2)
        ds.append(d2)
    dlist = [jax.device_put(d) for d in ds]
    glist = [jax.device_put(g) for g in gs]
    Tlist = [jax.device_put(jnp.asarray(p)) for p in poses]
    fids = [jax.device_put(jnp.int32(i)) for i in range(40)]
    jax.block_until_ready(dlist)

    m0 = tsdf_ops.make_map(tc)
    db0 = make_fusion_db(cfg)

    f = jax.jit(lambda m, db, d, g, T, fr: fuse_keyframe(m, db, d, g, T, fr, cfg))
    out = f(m0, db0, dlist[0], glist[0], Tlist[0], fids[0])
    jax.block_until_ready(out[0].tsdf)
    print("tiny start: %.3f" % tiny_ms())

    # A: fixed frame, feedback, fresh host scalar each iter
    m, db = out
    for i in range(4):
        t0 = time.perf_counter()
        m, db = f(m, db, dlist[0], glist[0], Tlist[0], jnp.int32(i))
        jax.block_until_ready(m.tsdf)
        print("A(feedback+hostscalar) rep %d: %.2f ms" % (i, (time.perf_counter() - t0) * 1e3))
    print("tiny after A: %.3f" % tiny_ms())

    # B: varying frames, outputs DISCARDED (always m0/db0 in)
    for i in range(6):
        j = i % chunk
        t0 = time.perf_counter()
        out = f(m0, db0, dlist[j], glist[j], Tlist[j], fids[j])
        jax.block_until_ready(out[0].tsdf)
        print("B(vary,discard) rep %d: %.2f ms" % (i, (time.perf_counter() - t0) * 1e3))
    print("tiny after B: %.3f" % tiny_ms())

    # C: varying frames + feedback (device-resident fids)
    m, db = m0, db0
    for i in range(10):
        j = i % chunk
        t0 = time.perf_counter()
        m, db = f(m, db, dlist[j], glist[j], Tlist[j], fids[j])
        jax.block_until_ready(m.tsdf)
        print("C(vary+feedback) rep %d: %.2f ms" % (i, (time.perf_counter() - t0) * 1e3))
    print("tiny after C: %.3f" % tiny_ms())

    # D: fixed frame feedback again — recovered?
    m, db = m0, db0
    for i in range(4):
        t0 = time.perf_counter()
        m, db = f(m, db, dlist[0], glist[0], Tlist[0], fids[0])
        jax.block_until_ready(m.tsdf)
        print("D(fixed+feedback) rep %d: %.2f ms" % (i, (time.perf_counter() - t0) * 1e3))
    print("tiny after D: %.3f" % tiny_ms())


if __name__ == "__main__":
    main()
