"""Multi-host scaling bench: fused frames/s/chip on a global sharded map.

Run one process per host (BASELINE.md target: >=0.7 scaling efficiency at
2 hosts = fps/chip(N) / fps/chip(1)):

    # host 0                                   # host 1
    python scripts/bench_scaling.py \\
        --coordinator=host0:8476 --num-processes=2 --process-id=0   # ... =1

Single-process (all local chips, or the 8-device virtual CPU mesh with
JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8):

    python scripts/bench_scaling.py

Prints one JSON line from process 0.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--cpu", action="store_true",
                    help="force the virtual CPU platform (test mode)")
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from denseslam_tpu.parallel import launch

    launch.init_distributed(args.coordinator, args.num_processes,
                            args.process_id)

    import jax.numpy as jnp

    from denseslam_tpu.config import (
        SlideWindowParams, SystemConfig, TsdfConfig, VoxelDecayParams)
    from denseslam_tpu.io import synthetic
    from denseslam_tpu.parallel.sharded_map import ShardedTsdf
    from denseslam_tpu.utils.camera import Intrinsics, StereoRig

    mesh = launch.global_map_mesh()
    n_chips = mesh.devices.size

    w, h = 1226, 370
    intr = Intrinsics(fx=707.09, fy=707.09, cx=601.89, cy=183.11,
                      width=w, height=h)
    rig = StereoRig(intr=intr, baseline_m=0.537)
    tsdf = TsdfConfig(
        voxel_size_m=0.06, trunc_dist_m=0.24, table_slots=1 << 17,
        max_visible_blocks=1 << 13, max_alloc_per_frame=1 << 13,
        max_depth_m=50.0, raycast_steps=192,
    )
    cfg = SystemConfig(
        rig=rig, tsdf=tsdf,
        decay=VoxelDecayParams(enabled=True, min_decay_age=30,
                               max_decay_weight=2),
        slide_window=SlideWindowParams(enabled=True, max_age=60),
    )

    st = ShardedTsdf(cfg, mesh)
    m = st.make_map()

    n = 10
    poses = synthetic.make_trajectory(n, step_m=0.8, yaw_rate=0.003)
    grays, depths = synthetic.render_trajectory(poses, intr)
    Ts = jnp.asarray(poses)

    # warmup / compile
    m = st.fuse(m, depths[0], grays[0], Ts[0])
    blocks = st.num_blocks(m)  # scalar readback = real execution barrier

    t0 = time.perf_counter()
    for i in range(args.frames):
        m = st.fuse(m, depths[i % n], grays[i % n], Ts[i % n])
    blocks = st.num_blocks(m)
    dt = time.perf_counter() - t0
    fps = args.frames / dt

    if launch.is_coordinator():
        print(json.dumps({
            "metric": "sharded_fused_frames_per_s_per_chip",
            "value": round(fps / n_chips, 3),
            "unit": "frames/s/chip",
            "n_chips": n_chips,
            "n_processes": jax.process_count(),
            "total_fps": round(fps, 3),
            "blocks": int(blocks),
        }))


if __name__ == "__main__":
    main()
