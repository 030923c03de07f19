#!/usr/bin/env python
"""Probe: where does the ~5.6 s per 16-frame chunk go in the COMPLETE
system (scan vs stats fetch vs per-keyframe backend tick components)?

Monkeypatches timing wrappers around the host-side phases of
SLAMSystem.process_chunk and its backend calls, runs the long-drive
workload for a few chunks on the real TPU, and prints a per-phase table.
"""

from __future__ import annotations

import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

from denseslam_tpu.config import (OnlineCorrectionParams, PipelineConfig,
                                  SlideWindowParams, StereoConfig,
                                  SystemConfig, TsdfConfig, VoxelDecayParams)
from denseslam_tpu.io import synthetic
from denseslam_tpu.models import backend as backend_mod
from denseslam_tpu.models import system as system_mod
from denseslam_tpu.models.system import SLAMSystem
from denseslam_tpu.utils.camera import Intrinsics, StereoRig

ACC = defaultdict(float)
CNT = defaultdict(int)


def timed(name, fn):
    def wrap(*a, **kw):
        t0 = time.perf_counter()
        out = fn(*a, **kw)
        ACC[name] += time.perf_counter() - t0
        CNT[name] += 1
        return out
    return wrap


def main():
    w, h = 1226, 370
    intr = Intrinsics(fx=707.09, fy=707.09, cx=(w - 1) / 2.0,
                      cy=(h - 1) / 2.0, width=w, height=h)
    rig = StereoRig(intr=intr, baseline_m=0.537)
    cfg = SystemConfig(
        rig=rig,
        tsdf=TsdfConfig(voxel_size_m=0.06, trunc_dist_m=0.24,
                        table_slots=1 << 17, max_visible_blocks=1 << 13,
                        max_alloc_per_frame=1 << 13, max_depth_m=40.0,
                        sampler="pallas"),
        stereo=StereoConfig(cost_dtype="bfloat16"),
        decay=VoxelDecayParams(enabled=True, min_decay_age=30,
                               max_decay_weight=2),
        slide_window=SlideWindowParams(enabled=True, max_age=60),
        correction=OnlineCorrectionParams(enabled=True, correction_num=5,
                                          start_correction_num=4,
                                          min_error=0.01),
        pipeline=PipelineConfig(keyframe_every=4, fusion_db_capacity=64),
    )
    system = SLAMSystem(cfg, ba_every=4, loop_every=2)

    # wrap backend phases
    be = system.backend
    be.local_ba = timed("local_ba", be.local_ba)
    be.detect_loop = timed("detect_loop", be.detect_loop)
    be.add_keyframe = timed("add_keyframe", be.add_keyframe)
    be.optimize_graph = timed("optimize_graph", be.optimize_graph)
    be.cull_redundant = timed("cull_redundant", be.cull_redundant)
    system.slam.apply_pose_updates = timed(
        "apply_pose_updates", system.slam.apply_pose_updates)
    backend_mod._signature = timed("signature", backend_mod._signature)

    # wrap scan: time dispatch vs the stats fetch separately
    orig_get = jax.device_get

    def traced_get(x):
        t0 = time.perf_counter()
        out = orig_get(x)
        ACC["device_get"] += time.perf_counter() - t0
        CNT["device_get"] += 1
        return out
    jax.device_get = traced_get

    n_chunks = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    n_total = n_chunks * 16
    gt = synthetic.make_loop_trajectory(max(120, n_total), radius_m=18.0,
                                        closure_frames=0)
    scene = synthetic.loop_scene(gt)

    @jax.jit
    def _nuisance(lg, rg, t0_idx, key):
        tt = t0_idx + jnp.arange(lg.shape[0], dtype=jnp.float32)
        g = 1.0 + 0.15 * jnp.sin(2 * jnp.pi * tt / 150.0)
        kl, kr = jax.random.split(key)
        nl = 2.0 * jax.random.normal(kl, lg.shape, jnp.float32)
        nr = 2.0 * jax.random.normal(kr, rg.shape, jnp.float32)
        g = g[:, None, None]
        return (jnp.clip(lg * g + nl, 0, 255), jnp.clip(rg * g + nr, 0, 255))

    key0 = jax.random.PRNGKey(0)
    chunk_times = []
    for base in range(0, n_total, 16):
        lg, rgs, _ = synthetic.render_stereo_trajectory(
            gt[base:base + 16], rig, scene)
        lefts, rights = _nuisance(lg, rgs, jnp.float32(base),
                                  jax.random.fold_in(key0, base))
        rights.block_until_ready()
        snap = dict(ACC)
        t0 = time.perf_counter()
        system.process_chunk(lefts, rights)
        dt = time.perf_counter() - t0
        chunk_times.append(dt)
        if base >= 32:  # steady state
            pass
        print(f"chunk @{base}: {dt*1000:7.1f} ms  "
              f"({', '.join(f'{k}+{(ACC[k]-snap.get(k,0))*1000:.0f}' for k in sorted(ACC) if ACC[k]-snap.get(k,0) > 0.005)})",
              flush=True)

    print("\n=== steady-state totals (chunks 2..) ===")
    steady = sum(chunk_times[2:])
    print(f"total {steady:.2f} s over {len(chunk_times)-2} chunks "
          f"-> {16*(len(chunk_times)-2)/steady:.2f} fps")
    for k in sorted(ACC, key=lambda k: -ACC[k]):
        print(f"  {k:>20}: {ACC[k]*1000:8.1f} ms total  ({CNT[k]} calls)")


if __name__ == "__main__":
    main()
