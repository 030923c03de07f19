"""Bisect which op inside fuse_keyframe flips the axon runtime into
degraded-dispatch mode. Run ONE candidate per process:

    python scripts/exp_bisect.py <stage>

Prints tiny-op dispatch before, candidate time, tiny-op dispatch after.
Degradation signature: tiny dispatch 0.05 ms -> ~30 ms.
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


def bench(fn, *args, n=4):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts), [round(t * 1e3, 2) for t in ts]


def main():
    stage = sys.argv[1]
    print("stage:", stage)
    print("tiny before: %.3f ms" % tiny_dispatch_ms())

    from denseslam_tpu.config import SystemConfig, TsdfConfig
    from denseslam_tpu.io import synthetic
    from denseslam_tpu.ops import tsdf as tsdf_ops
    from denseslam_tpu.ops import hash as vhash
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

    T = jnp.eye(4, dtype=jnp.float32)
    gray, depth = synthetic.render_view(T, intr)
    m = tsdf_ops.make_map(tc)

    S = tc.table_slots
    V = tc.max_visible_blocks
    B = 512
    key = jax.random.PRNGKey(0)

    if stage == "touched_keys":
        f = jax.jit(lambda d, T: tsdf_ops.touched_block_keys(d, T, intr, tc))
        dt, ts = bench(f, depth, T)
    elif stage == "alloc":
        f = jax.jit(lambda m, d, T: tsdf_ops.allocate_for_frame(m, d, T, intr, tc))
        dt, ts = bench(f, m, depth, T)
    elif stage == "unique":
        keys = jax.random.randint(key, (3 * h * w,), 0, 1 << 20, jnp.int32)
        f = jax.jit(lambda k: vhash.unique_keys(k, V))
        dt, ts = bench(f, keys)
    elif stage == "integrate":
        m2, slots, mask = jax.jit(
            lambda m, d, T: tsdf_ops.allocate_for_frame(m, d, T, intr, tc))(m, depth, T)
        jax.block_until_ready(m2.tsdf)
        print("tiny after alloc: %.3f ms" % tiny_dispatch_ms())
        f = jax.jit(lambda m, s, k, d, g, T: tsdf_ops.integrate(
            m, s, k, d, tsdf_ops.pack_gray(g), T, intr, tc))
        dt, ts = bench(f, m2, slots, mask, depth, gray, T)
    elif stage == "integrate_nocolor":
        m2, slots, mask = jax.jit(
            lambda m, d, T: tsdf_ops.allocate_for_frame(m, d, T, intr, tc))(m, depth, T)
        jax.block_until_ready(m2.tsdf)
        print("tiny after alloc: %.3f ms" % tiny_dispatch_ms())
        f = jax.jit(lambda m, s, k, d, T: tsdf_ops.integrate(
            m, s, k, d, None, T, intr, tc))
        dt, ts = bench(f, m2, slots, mask, depth, T)
    elif stage == "geometry":
        slots = jax.random.randint(key, (V,), 0, S, jnp.int32)
        mask = jnp.ones((V,), bool)
        f = jax.jit(lambda m, s, k, T: tsdf_ops._fusion_geometry(m, s, k, T, intr, tc))
        dt, ts = bench(f, m, slots, mask, T)
    elif stage == "drop_scatter":
        pool = jax.random.uniform(key, (S, B))
        vals = jax.random.uniform(jax.random.PRNGKey(1), (V, B))
        widx = jax.random.randint(key, (V,), 0, S + 100, jnp.int32)  # some OOB
        f = jax.jit(lambda p, i, v: p.at[i].set(v, mode="drop"))
        dt, ts = bench(f, pool, widx, vals)
    elif stage == "drop_scatter_donated":
        pool = jax.random.uniform(key, (S, B))
        vals = jax.random.uniform(jax.random.PRNGKey(1), (V, B))
        widx = jax.random.randint(key, (V,), 0, S + 100, jnp.int32)
        f = jax.jit(lambda p, i, v: p.at[i].set(v, mode="drop"),
                    donate_argnums=(0,))
        # donation consumes pool; re-feed output
        out = f(pool, widx, vals)
        jax.block_until_ready(out)
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            out = f(out, widx, vals)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        dt, ts = min(ts), [round(t * 1e3, 2) for t in ts]
    elif stage == "decay":
        f = jax.jit(lambda m: tsdf_ops.decay(m, 2.0, 30))
        dt, ts = bench(f, m)
    elif stage == "slide":
        f = jax.jit(lambda m: tsdf_ops.slide_window(m, 60))
        dt, ts = bench(f, m)
    elif stage == "image_gather":
        # the in-integrate image sample: 8.4M computed idx into 453K image
        u = jax.random.uniform(key, (V, B), minval=0, maxval=w - 1)
        v = jax.random.uniform(jax.random.PRNGKey(1), (V, B), minval=0, maxval=h - 1)
        f = jax.jit(lambda d, u, v: tsdf_ops._depth_sample_soA(d, u, v, 0.24)[0].sum())
        dt, ts = bench(f, depth, u, v)
    elif stage in ("combo_ai", "combo_aid", "combo_aidb", "combo_full"):
        from denseslam_tpu.models.dense_slam import (
            db_push, fuse_keyframe, make_fusion_db,
        )
        cfg2 = dataclasses.replace(
            cfg,
            decay=dataclasses.replace(cfg.decay, enabled=True,
                                      min_decay_age=30, max_decay_weight=2),
            slide_window=dataclasses.replace(cfg.slide_window, enabled=True,
                                            max_age=60),
        )
        cfg2 = dataclasses.replace(
            cfg2, pipeline=dataclasses.replace(cfg2.pipeline, fusion_db_capacity=8))
        db = make_fusion_db(cfg2)

        def ai(m, db, d, g, T):
            m, slots, mask = tsdf_ops.allocate_for_frame(m, d, T, intr, tc)
            m = tsdf_ops.integrate(m, slots, mask, d, tsdf_ops.pack_gray(g),
                                   T, intr, tc)
            return tsdf_ops.advance_frame(m), db

        def aid(m, db, d, g, T):
            m, db = ai(m, db, d, g, T)
            m = tsdf_ops.slide_window(m, 60)
            m = tsdf_ops.decay(m, 2.0, 30)
            return m, db

        def aidb(m, db, d, g, T):
            m, slots, mask = tsdf_ops.allocate_for_frame(m, d, T, intr, tc)
            m = tsdf_ops.integrate(m, slots, mask, d, tsdf_ops.pack_gray(g),
                                   T, intr, tc)
            db = db_push(db, d, g, T, jnp.int32(0))
            return tsdf_ops.advance_frame(m), db

        def full(m, db, d, g, T):
            return fuse_keyframe(m, db, d, g, T, jnp.int32(0), cfg2)

        fn = {"combo_ai": ai, "combo_aid": aid, "combo_aidb": aidb,
              "combo_full": full}[stage]
        f = jax.jit(fn)
        dt, ts = bench(f, m, db, depth, gray, T)
    elif stage.startswith("loop"):
        # loop[_nodonate][_samefr]: 30 per-frame dispatches, per-rep times,
        # tiny-dispatch checks along the way.
        from denseslam_tpu.models.dense_slam import fuse_keyframe, make_fusion_db
        cfg2 = dataclasses.replace(
            cfg,
            decay=dataclasses.replace(cfg.decay, enabled=True,
                                      min_decay_age=30, max_decay_weight=2),
            slide_window=dataclasses.replace(cfg.slide_window, enabled=True,
                                            max_age=60),
        )
        cfg2 = dataclasses.replace(
            cfg2, pipeline=dataclasses.replace(cfg2.pipeline, fusion_db_capacity=8))
        db = make_fusion_db(cfg2)
        donate = "nodonate" not in stage
        same_frame = "samefr" in stage

        chunk = 10
        poses = synthetic.make_trajectory(chunk, step_m=0.8, yaw_rate=0.003)
        gs, ds = [], []
        for i in range(chunk):
            g2, d2 = synthetic.render_view(jnp.asarray(poses[i]), intr)
            gs.append(g2)
            ds.append(d2)
        ds = jax.device_put(jnp.stack(ds))
        gs = jax.device_put(jnp.stack(gs))
        Ts = jax.device_put(jnp.asarray(poses))

        kw = dict(donate_argnums=(0, 1)) if donate else {}
        f = jax.jit(lambda m, db, d, g, T, fr: fuse_keyframe(m, db, d, g, T, fr, cfg2), **kw)
        m2, db2 = f(m, db, ds[0], gs[0], Ts[0], jnp.int32(0))
        jax.block_until_ready(m2.tsdf)
        print("tiny after compile+1st: %.3f ms" % tiny_dispatch_ms())
        for i in range(1, 31):
            j = 0 if same_frame else (i % chunk)
            fid = jnp.int32(0 if same_frame else i)
            t0 = time.perf_counter()
            m2, db2 = f(m2, db2, ds[j], gs[j], Ts[j], fid)
            jax.block_until_ready(m2.tsdf)
            el = (time.perf_counter() - t0) * 1e3
            if i <= 5 or i % 5 == 0:
                print("  rep %2d: %8.2f ms" % (i, el))
            if i % 10 == 0:
                print("  tiny @%d: %.3f ms" % (i, tiny_dispatch_ms()))
        dt, ts = 0.0, []
    else:
        raise SystemExit("unknown stage " + stage)

    print("%s: min %.2f ms  reps %s" % (stage, dt * 1e3, ts))
    print("tiny after: %.3f ms" % tiny_dispatch_ms())


if __name__ == "__main__":
    main()
