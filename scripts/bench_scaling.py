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
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run_matrix_cpu(frames: int, out_json: str) -> None:
    """Localhost scaling matrix on virtual CPU devices (no TPU pod needed).

    Runs three configurations of THIS script as subprocesses and records
    fused-frames/s/chip for each, plus two efficiency ratios:

      * ``eff_fixed_total`` — 2 procs x 4 dev vs 1 proc x 8 dev (constant
        total devices): isolates the cost of the `jax.distributed` runtime
        + Gloo collectives relative to a single-process mesh.
      * ``eff_weak`` — 2 procs x 4 dev vs 1 proc x 4 dev: the BASELINE.md
        "fps/chip at N hosts / fps/chip at 1 host" methodology. On virtual
        CPU devices every "chip" shares the same physical cores, so this
        ratio is a LOWER BOUND only; re-run on real multi-host TPU for the
        >=0.7 target.
    """
    me = os.path.abspath(__file__)

    def one(env_devices: int, extra: list, log: str) -> dict:
        env = dict(os.environ)
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={env_devices}"
        ).strip()
        cmd = [sys.executable, me, "--cpu", f"--frames={frames}"] + extra
        out = subprocess.run(cmd, env=env, capture_output=True, text=True,
                             timeout=900)
        with open(log, "w") as f:
            f.write(out.stdout + out.stderr)
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        return json.loads(line)

    def two_proc() -> dict:
        env = dict(os.environ)
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=4").strip()
        base = [sys.executable, me, "--cpu", f"--frames={frames}",
                "--coordinator=localhost:8476", "--num-processes=2"]
        p1 = subprocess.Popen(base + ["--process-id=1"], env=env,
                              stdout=subprocess.DEVNULL,
                              stderr=subprocess.DEVNULL)
        out = subprocess.run(base + ["--process-id=0"], env=env,
                             capture_output=True, text=True, timeout=900)
        p1.wait(timeout=60)
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        return json.loads(line)

    r1x4 = one(4, [], "/tmp/scale_1x4.log")
    r1x8 = one(8, [], "/tmp/scale_1x8.log")
    r2x4 = two_proc()
    rec = {
        "metric": "cpu_mesh_scaling_matrix",
        "frames": frames,
        "fps_per_chip_1proc_4dev": r1x4["value"],
        "fps_per_chip_1proc_8dev": r1x8["value"],
        "fps_per_chip_2proc_4dev": r2x4["value"],
        "blocks_agree": (r1x4["blocks"] == r1x8["blocks"] ==
                         r2x4["blocks"]),
        "eff_fixed_total": round(r2x4["value"] / r1x8["value"], 3),
        "eff_weak": round(r2x4["value"] / r1x4["value"], 3),
        "note": "virtual CPU devices share physical cores; eff_weak is a "
                "lower bound — re-run per-host on real TPU hosts for the "
                "BASELINE.md >=0.7 target",
    }
    print(json.dumps(rec))
    with open(out_json, "w") as f:
        json.dump(rec, f, indent=1)


def run_matrix_pinned(frames: int, out_json: str) -> None:
    """Core-PINNED localhost scaling matrix (VERDICT r2 item 6): every
    process gets a DISJOINT physical core set via taskset, so virtual
    devices in different processes no longer share compute — the
    cleanest weak-scaling proxy this single-host environment admits.

    On a 4-core host:
      * A = 1 proc x 2 dev, cores {0,1}          (per-process baseline)
      * B = 2 proc x 2 dev, cores {0,1} | {2,3}  (adds a process with its
        OWN cores: weak scaling — per-process resources constant)
      * C = 1 proc x 4 dev, cores {0,1,2,3}      (same TOTAL resources as
        B in one process: isolates the jax.distributed + Gloo cost)

      eff_weak_pinned  = fps/chip(B) / fps/chip(A)  -> BASELINE >=0.7
      eff_fixed_pinned = fps/chip(B) / fps/chip(C)
    """
    me = os.path.abspath(__file__)

    def one(cores: str, ndev: int, extra: list, log: str) -> dict:
        env = dict(os.environ)
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={ndev}").strip()
        cmd = (["taskset", "-c", cores, sys.executable, me, "--cpu",
                f"--frames={frames}"] + extra)
        out = subprocess.run(cmd, env=env, capture_output=True, text=True,
                             timeout=1200)
        with open(log, "w") as f:
            f.write(out.stdout + out.stderr)
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        return json.loads(line)

    def two_proc_pinned() -> dict:
        env = dict(os.environ)
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=2").strip()
        base = [sys.executable, me, "--cpu", f"--frames={frames}",
                "--coordinator=localhost:8477", "--num-processes=2"]
        p1 = subprocess.Popen(
            ["taskset", "-c", "2,3"] + base + ["--process-id=1"], env=env,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        out = subprocess.run(
            ["taskset", "-c", "0,1"] + base + ["--process-id=0"], env=env,
            capture_output=True, text=True, timeout=1200)
        p1.wait(timeout=120)
        with open("/tmp/scale_2x2_pinned.log", "w") as f:
            f.write(out.stdout + out.stderr)
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        return json.loads(line)

    rA = one("0,1", 2, [], "/tmp/scale_1x2_pinned.log")
    rC = one("0-3", 4, [], "/tmp/scale_1x4_pinned.log")
    rB = two_proc_pinned()
    rec = {
        "metric": "cpu_mesh_scaling_pinned",
        "frames": frames,
        "methodology": "taskset-pinned disjoint core sets per process "
                       "(4 physical cores): A=1procx2dev@{0,1}, "
                       "B=2procx2dev@{0,1}|{2,3}, C=1procx4dev@{0-3}; "
                       "weak = B/A (per-process resources constant), "
                       "fixed = B/C (same total resources, multi-process "
                       "runtime cost)",
        "fps_per_chip_A_1proc_2dev": rA["value"],
        "fps_per_chip_B_2proc_2dev": rB["value"],
        "fps_per_chip_C_1proc_4dev": rC["value"],
        "blocks_agree": (rA["blocks"] == rC["blocks"] == rB["blocks"]),
        "eff_weak_pinned": round(rB["value"] / rA["value"], 3),
        "eff_fixed_pinned": round(rB["value"] / rC["value"], 3),
    }
    print(json.dumps(rec))
    with open(out_json, "w") as f:
        json.dump(rec, f, indent=1)


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
    ap.add_argument("--matrix-cpu", action="store_true",
                    help="run the localhost 1x4 / 1x8 / 2x4 matrix and "
                         "write --json")
    ap.add_argument("--matrix-pinned", action="store_true",
                    help="run the taskset-pinned disjoint-core matrix "
                         "(clean weak-scaling proxy) and write --json")
    ap.add_argument("--json", default="SCALING.json")
    args = ap.parse_args()

    if args.matrix_cpu:
        run_matrix_cpu(args.frames, args.json)
        return
    if args.matrix_pinned:
        run_matrix_pinned(args.frames, args.json)
        return

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
