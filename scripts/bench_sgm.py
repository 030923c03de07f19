"""Standalone stereo-depth benchmark: XLA vs fused-pallas SGM backends.

Times the full compute_depth (cost volume + aggregation + WTA tail) at
KITTI geometry inside one lax.scan batch per backend (single dispatch —
per-call timing is unreliable on the tunneled runtime; see
.claude/skills/verify/SKILL.md). Frames are salted so the runtime cannot
dedupe dispatches; sync is a fetched scalar derived from the outputs.

Usage: python scripts/bench_sgm.py [--frames 20] [--dtype bfloat16]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--backends", default="xla,pallas_fused")
    args = ap.parse_args()

    from denseslam_tpu.config import StereoConfig
    from denseslam_tpu.io import synthetic
    from denseslam_tpu.ops import stereo
    from denseslam_tpu.utils.camera import Intrinsics, StereoRig

    w, h = 1226, 370
    intr = Intrinsics(fx=707.09, fy=707.09, cx=601.89, cy=183.11,
                      width=w, height=h)
    rig = StereoRig(intr=intr, baseline_m=0.537)

    # one synthetic stereo pair; the scan salt shifts brightness per frame
    # (keeps the matching structure, defeats dispatch dedupe)
    T = jnp.eye(4, dtype=jnp.float32)
    left, right, _ = synthetic.render_stereo(T, rig)

    n = args.frames
    for backend in args.backends.split(","):
        cfg = StereoConfig(cost_dtype=args.dtype, sgm_backend=backend)

        def batch(salts, left=left, right=right, cfg=cfg):
            def step(_, s):
                d, v = stereo.compute_depth(left + s, right + s, rig, cfg)
                return 0.0, (jnp.sum(d) + jnp.sum(v))
            _, outs = jax.lax.scan(step, 0.0, salts)
            return jnp.sum(outs)

        f = jax.jit(batch)
        salts = jnp.linspace(0.0, 0.01, n, dtype=jnp.float32)
        float(jax.device_get(f(salts)))             # compile + warm
        float(jax.device_get(f(salts + 1e-4)))      # steady state
        t0 = time.perf_counter()
        float(jax.device_get(f(salts + 2e-4)))
        dt = time.perf_counter() - t0
        print(f"{backend:14s} {args.dtype:9s}: "
              f"{dt * 1e3 / n:7.2f} ms/frame  ({n / dt:6.1f} fps)")


if __name__ == "__main__":
    main()
