"""Pin down the degraded-mode trigger: same-args repeat vs sliced inputs vs
output feedback, one process, tiny-dispatch checks between phases."""

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

    T0 = jnp.eye(4, dtype=jnp.float32)
    gray, depth = synthetic.render_view(T0, intr)
    m0 = tsdf_ops.make_map(tc)
    db0 = make_fusion_db(cfg)
    fid0 = jnp.int32(0)

    f = jax.jit(lambda m, db, d, g, T, fr: fuse_keyframe(m, db, d, g, T, fr, cfg))

    print("tiny start: %.3f" % tiny_ms())

    # Phase A: repeat same args, discard outputs
    out = f(m0, db0, depth, gray, T0, fid0)
    jax.block_until_ready(out[0].tsdf)
    for i in range(3):
        t0 = time.perf_counter()
        out = f(m0, db0, depth, gray, T0, fid0)
        jax.block_until_ready(out[0].tsdf)
        print("A rep %d: %.2f ms" % (i, (time.perf_counter() - t0) * 1e3))
    print("tiny after A: %.3f" % tiny_ms())

    # Phase B: sliced image inputs, same m0 each time, discard outputs
    ds = jnp.stack([depth, depth])
    gs = jnp.stack([gray, gray])
    d1, g1 = ds[0], gs[0]
    jax.block_until_ready(d1)
    for i in range(3):
        t0 = time.perf_counter()
        out = f(m0, db0, d1, g1, T0, fid0)
        jax.block_until_ready(out[0].tsdf)
        print("B rep %d: %.2f ms" % (i, (time.perf_counter() - t0) * 1e3))
    print("tiny after B: %.3f" % tiny_ms())

    # Phase C: output feedback, fixed frame args
    m, db = f(m0, db0, depth, gray, T0, fid0)
    jax.block_until_ready(m.tsdf)
    for i in range(4):
        t0 = time.perf_counter()
        m, db = f(m, db, depth, gray, T0, fid0)
        jax.block_until_ready(m.tsdf)
        print("C rep %d: %.2f ms" % (i, (time.perf_counter() - t0) * 1e3))
    print("tiny after C: %.3f" % tiny_ms())

    # Phase D: back to same-args repeat — is the process now stuck slow?
    for i in range(3):
        t0 = time.perf_counter()
        out = f(m0, db0, depth, gray, T0, fid0)
        jax.block_until_ready(out[0].tsdf)
        print("D rep %d: %.2f ms" % (i, (time.perf_counter() - t0) * 1e3))
    print("tiny after D: %.3f" % tiny_ms())

    # Phase E: wait 60 s — does degraded mode decay with time?
    time.sleep(60)
    print("tiny after 60s sleep: %.3f" % tiny_ms())
    for i in range(2):
        t0 = time.perf_counter()
        out = f(m0, db0, depth, gray, T0, fid0)
        jax.block_until_ready(out[0].tsdf)
        print("E rep %d: %.2f ms" % (i, (time.perf_counter() - t0) * 1e3))


if __name__ == "__main__":
    main()
