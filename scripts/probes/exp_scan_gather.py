"""Experiment: is the 8.4M computed-index gather still serialized inside
lax.scan after the module-constant fix, and how fast is per-frame dispatch
(no scan) with donated map state?"""

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


def tiny_dispatch_ms():
    x = jnp.ones((8, 128))
    f = jax.jit(lambda a: a * 2 + 1)
    f(x).block_until_ready()
    ts = []
    for _ in range(10):
        t = time.perf_counter()
        f(x).block_until_ready()
        ts.append(time.perf_counter() - t)
    return float(np.median(ts) * 1e3)


def bench(fn, *args, n=5):
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
    print("tiny dispatch: %.3f ms" % tiny_dispatch_ms())

    # Raw gather truth: 8.4M computed indices into a 453K-element image.
    V, B = 16384, 512
    HW = 1226 * 370
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (V, B), 0, HW, dtype=jnp.int32)
    img = jax.random.uniform(jax.random.PRNGKey(1), (HW,))

    @jax.jit
    def g_out(img, idx):
        return img[idx.reshape(-1)].sum()

    dt = bench(g_out, img, idx)
    print("gather outside scan:        %.3f ms" % (dt * 1e3))

    @jax.jit
    def g_scan(img, idxs):
        def body(acc, i):
            return acc + img[i.reshape(-1)].sum(), None
        acc, _ = jax.lax.scan(body, 0.0, idxs)
        return acc

    idxs = jnp.stack([idx] * 10)
    dt = bench(g_scan, img, idxs)
    print("gather inside scan (x10):   %.3f ms/iter" % (dt * 1e3 / 10))

    # Row gather truth: (V,512) rows from a (131072,512) pool.
    pool = jax.random.uniform(jax.random.PRNGKey(2), (1 << 17, B))
    rows = jax.random.randint(key, (V,), 0, 1 << 17, dtype=jnp.int32)

    @jax.jit
    def r_out(pool, rows):
        return pool[rows].sum()

    dt = bench(r_out, pool, rows)
    print("row gather outside scan:    %.3f ms" % (dt * 1e3))

    @jax.jit
    def r_scan(pool, rowss):
        def body(acc, r):
            return acc + pool[r].sum(), None
        acc, _ = jax.lax.scan(body, 0.0, rowss)
        return acc

    rowss = jnp.stack([rows] * 10)
    dt = bench(r_scan, pool, rowss)
    print("row gather inside scan:     %.3f ms/iter" % (dt * 1e3 / 10))

    # Scatter truth inside scan
    @jax.jit
    def s_scan(pool, rowss):
        def body(p, r):
            return p.at[r].set(p[r] * 1.001), None
        p, _ = jax.lax.scan(body, pool, rowss)
        return p

    dt = bench(s_scan, pool, rowss)
    print("row gather+scatter in scan: %.3f ms/iter" % (dt * 1e3 / 10))

    print("tiny dispatch: %.3f ms" % tiny_dispatch_ms())

    # Per-frame dispatch (no scan), donated carry: the real fuse_keyframe.
    from denseslam_tpu.config import (
        SlideWindowParams, SystemConfig, TsdfConfig, VoxelDecayParams,
    )
    from denseslam_tpu.io import synthetic
    from denseslam_tpu.models.dense_slam import fuse_keyframe, make_fusion_db
    from denseslam_tpu.ops import tsdf as tsdf_ops
    from denseslam_tpu.utils.camera import Intrinsics, StereoRig

    w, h = 1226, 370
    intr = Intrinsics(fx=707.09, fy=707.09, cx=601.89, cy=183.11,
                      width=w, height=h)
    rig = StereoRig(intr=intr, baseline_m=0.537)
    tsdf = TsdfConfig(
        voxel_size_m=0.06, trunc_dist_m=0.24, table_slots=1 << 17,
        max_visible_blocks=1 << 14, max_alloc_per_frame=1 << 14,
        max_depth_m=50.0, raycast_steps=192,
    )
    cfg = SystemConfig(
        rig=rig, tsdf=tsdf,
        decay=VoxelDecayParams(enabled=True, min_decay_age=30, max_decay_weight=2),
        slide_window=SlideWindowParams(enabled=True, max_age=60),
    )
    cfg = dataclasses.replace(
        cfg, pipeline=dataclasses.replace(cfg.pipeline, fusion_db_capacity=8))

    chunk = 10
    poses = synthetic.make_trajectory(chunk, step_m=0.8, yaw_rate=0.003)
    grays, depths = [], []
    for i in range(chunk):
        g, d = synthetic.render_view(jnp.asarray(poses[i]), intr)
        grays.append(g)
        depths.append(d)
    depths = jax.device_put(jnp.stack(depths))
    grays = jax.device_put(jnp.stack(grays))
    T_wcs = jax.device_put(jnp.asarray(poses))

    fuse1 = jax.jit(
        lambda m, db, d, g, T, f: fuse_keyframe(m, db, d, g, T, f, cfg),
        donate_argnums=(0, 1),
    )

    m = tsdf_ops.make_map(cfg.tsdf)
    db = make_fusion_db(cfg)
    # warmup (also populates the map)
    for i in range(chunk):
        m, db = fuse1(m, db, depths[i], grays[i], T_wcs[i], jnp.int32(i))
    jax.block_until_ready(m.tsdf)

    t0 = time.perf_counter()
    nfr = 30
    for i in range(nfr):
        j = i % chunk
        m, db = fuse1(m, db, depths[j], grays[j], T_wcs[j], jnp.int32(chunk + i))
    jax.block_until_ready(m.tsdf)
    dt = time.perf_counter() - t0
    print("per-frame fuse_keyframe (donated, no scan): %.2f ms/frame (%.1f fps)"
          % (dt / nfr * 1e3, nfr / dt))

    print("tiny dispatch: %.3f ms" % tiny_dispatch_ms())


if __name__ == "__main__":
    main()
