"""Per-stage timing of the fusion keyframe path on the real TPU.

Each stage is timed as a 10-frame `lax.scan` batch (one dispatch), the
methodology from CLAUDE.md: per-op truth inside scan, tiny-op dispatch
checked before/after to detect compile-service contamination.

CAVEAT: repeated calls with IDENTICAL input buffers can report ~10x
faster than physically possible (the remote runtime appears to
short-circuit repeat dispatches). Trust relative stage ordering only;
for absolute truth, chain evolving state with donation like bench.py.
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


def timeit(fn, *args, n=3, donate=False):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


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


def main():
    from denseslam_tpu.config import (
        SlideWindowParams, SystemConfig, TsdfConfig, VoxelDecayParams,
    )
    from denseslam_tpu.io import synthetic
    from denseslam_tpu.models.dense_slam import (
        db_push, fuse_sequence, make_fusion_db,
    )
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

    print("tiny dispatch before: %.3f ms" % tiny_dispatch_ms())

    chunk = 10
    poses = synthetic.make_trajectory(chunk, step_m=0.8, yaw_rate=0.003)
    grays, depths = synthetic.render_trajectory(poses, intr)
    depths = jax.device_put(depths)
    grays = jax.device_put(grays)
    T_wcs = jax.device_put(jnp.asarray(poses))
    fids = jnp.arange(chunk, dtype=jnp.int32)

    def scan_over_frames(per_frame):
        """Wrap per_frame(m, db, d, g, T, fid)->(m, db) in a scan + jit."""
        def seq(m, db, ds, gs, Ts, fs):
            def body(carry, fr):
                m, db = carry
                return per_frame(m, db, *fr), None
            (m, db), _ = jax.lax.scan(body, (m, db), (ds, gs, Ts, fs))
            return m, db
        return jax.jit(seq)

    def prep():
        m = tsdf_ops.make_map(cfg.tsdf)
        db = make_fusion_db(cfg)
        # Pre-populate with one chunk so tables are warm/realistic
        full = scan_over_frames(lambda m, db, d, g, T, f: _full(m, db, d, g, T, f))
        m, db = full(m, db, depths, grays, T_wcs, fids)
        jax.block_until_ready(m.tsdf)
        return m, db

    intrc = cfg.rig.intr
    tc = cfg.tsdf

    def _alloc_only(m, db, d, g, T, f):
        m, slots, mask = tsdf_ops.allocate_for_frame(m, d, T, intrc, tc)
        m = tsdf_ops.advance_frame(m)
        return m, db

    def _alloc_integrate(m, db, d, g, T, f):
        color = tsdf_ops.pack_gray(g) if tc.fuse_color else None
        m, slots, mask = tsdf_ops.allocate_for_frame(m, d, T, intrc, tc)
        m = tsdf_ops.integrate(m, slots, mask, d, color, T, intrc, tc)
        m = tsdf_ops.advance_frame(m)
        return m, db

    def _alloc_integrate_nocolor(m, db, d, g, T, f):
        m, slots, mask = tsdf_ops.allocate_for_frame(m, d, T, intrc, tc)
        m = tsdf_ops.integrate(m, slots, mask, d, None, T, intrc, tc)
        m = tsdf_ops.advance_frame(m)
        return m, db

    def _full(m, db, d, g, T, f):
        from denseslam_tpu.models.dense_slam import fuse_keyframe
        return fuse_keyframe(m, db, d, g, T, f, cfg)

    def _no_maintenance(m, db, d, g, T, f):
        color = tsdf_ops.pack_gray(g) if tc.fuse_color else None
        m, slots, mask = tsdf_ops.allocate_for_frame(m, d, T, intrc, tc)
        m = tsdf_ops.integrate(m, slots, mask, d, color, T, intrc, tc)
        db = db_push(db, d, g, T, f)
        m = tsdf_ops.advance_frame(m)
        return m, db

    stages = [
        ("alloc_only", _alloc_only),
        ("alloc+integrate(nocolor)", _alloc_integrate_nocolor),
        ("alloc+integrate(color)", _alloc_integrate),
        ("alloc+integrate+db", _no_maintenance),
        ("full fuse_keyframe", _full),
    ]

    m0, db0 = prep()
    for name, fn in stages:
        sfn = scan_over_frames(fn)
        dt = timeit(sfn, m0, db0, depths, grays, T_wcs, fids)
        print("%-28s %7.2f ms/frame  (%5.1f fps)" % (name, dt / chunk * 1e3, chunk / dt))

    print("tiny dispatch after: %.3f ms" % tiny_dispatch_ms())


if __name__ == "__main__":
    main()
