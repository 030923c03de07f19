"""Clean per-stage timing of the non-fusion pipeline stages on the real TPU:
raycast, stereo depth, sparse VO, ICP. Each stage is timed as a scan over 10
DISTINCT frames (one dispatch, varying inputs — repeat-identical dispatches
can be short-circuited by the remote runtime and report fake numbers)."""

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


def bench_scan(name, fn, xs, n_iters, reps=3, carry_in=None):
    """fn: (carry_in, x_slice) -> scalar; xs stacked along axis 0.

    carry_in (e.g. the map state) is passed as a traced ARGUMENT — closing
    over big device arrays embeds them as constants in the HLO and blows
    the remote compile service's request-size limit (HTTP 413)."""
    @jax.jit
    def run(c, xs):
        def body(acc, x):
            return acc + fn(c, x), None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), xs)
        return acc

    # Sync by fetching the scalar (block_until_ready can return before the
    # tunneled remote execution completes — verify SKILL.md methodology).
    float(jax.device_get(run(carry_in, xs)))
    ts = []
    for r in range(reps):
        # vary the input each rep: the runtime dedupes identical dispatches
        xs_r = xs + jnp.asarray(r * 1e-6, dtype=xs.dtype)
        t0 = time.perf_counter()
        out = run(carry_in, xs_r)
        float(jax.device_get(out))
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    print("%-24s %8.2f ms/frame  (%6.1f fps)" % (name, dt / n_iters * 1e3, n_iters / dt))


def main():
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

    # Build a populated map for raycast/ICP
    db = make_fusion_db(cfg)
    m = tsdf_ops.make_map(tc)
    fuse = jax.jit(lambda m, db, d, g, T, f: fuse_keyframe(m, db, d, g, T, f, cfg),
                   donate_argnums=(0, 1))
    for i in range(n):
        m, db = fuse(m, db, depths[i], lefts[i], Ts[i], jnp.int32(i))
    jax.block_until_ready(m.tsdf)
    print("map blocks: %d" % int(tsdf_ops.num_allocated_blocks(m)))

    # 1) raycast at full KITTI res, varying pose
    bench_scan(
        "raycast 1226x370",
        lambda m, T: rc_ops.raycast(m, T, intr, tc).depth.sum(),
        Ts, n, carry_in=m,
    )

    # 2) sparse VO step: full vo_step over consecutive pairs
    st0 = fe.init_frontend(cfg, seed=0)

    @jax.jit
    def vo_scan(st, ls, rs):
        def body(st, fr):
            st, vo = fe.vo_step(st, fr[0], fr[1], cfg)
            return st, vo.T_wc
        st, Touts = jax.lax.scan(body, st, (ls, rs))
        return Touts.sum()

    float(jax.device_get(vo_scan(st0, lefts, rights)))
    ts = []
    for r in range(3):
        t0 = time.perf_counter()
        out = vo_scan(st0, lefts + jnp.float32(r * 1e-6), rights)
        float(jax.device_get(out))
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    print("%-24s %8.2f ms/frame  (%6.1f fps)" % ("sparse VO", dt / n * 1e3, n / dt))

    # 4) ICP against raycast model, varying frame
    rc = jax.jit(lambda m, T: rc_ops.raycast(m, T, intr, tc))(m, Ts[0])
    jax.block_until_ready(rc.depth)

    @jax.jit
    def icp_scan(rc, ds, Ts):
        def body(acc, fr):
            d, T = fr
            res = icp_ops.track(d, rc.points, rc.normals, rc.mask, T, T, intr)
            return acc + res.rmse, None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), (ds, Ts))
        return acc

    float(jax.device_get(icp_scan(rc, depths, Ts)))
    ts = []
    for r in range(3):
        t0 = time.perf_counter()
        out = icp_scan(rc, depths + jnp.float32(r * 1e-6), Ts)
        float(jax.device_get(out))
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    print("%-24s %8.2f ms/frame  (%6.1f fps)" % ("ICP track", dt / n * 1e3, n / dt))

    # LAST (standalone SGM scan has OOMed at compile before — ROADMAP):
    # stereo depth varying frames
    bench_scan(
        "stereo depth",
        lambda _, lr: stereo_ops.compute_depth(lr[0], lr[1], rig, cfg.stereo)[0].sum(),
        jnp.stack([lefts, rights], axis=1), n,
    )

    print("tiny: %.3f ms" % tiny_ms())


if __name__ == "__main__":
    main()
