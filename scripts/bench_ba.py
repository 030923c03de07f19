#!/usr/bin/env python
"""BA solve time per keyframe window on the real TPU — a first-class
metric (BASELINE.md: "BA solve time (ms) per keyframe window").

Builds a realistic window problem (K keyframes of tracked synthetic
features at the configured caps) and times the jitted Schur-complement
solve with salted inputs + fetch-synced readback (see
.claude/skills/verify/SKILL.md). Prints one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np


def main() -> None:
    import functools

    from denseslam_tpu.config import tiny_test_config
    from denseslam_tpu.io import synthetic
    from denseslam_tpu.models import frontend as fe
    from denseslam_tpu.models.backend import build_window_problem
    from denseslam_tpu.ops import ba

    cfg = tiny_test_config(width=320, height=240, baseline_m=0.25)
    K = cfg.backend.window_keyframes
    poses = synthetic.make_trajectory(K, step_m=0.1, yaw_rate=0.01)

    st = fe.init_frontend(cfg)
    step = jax.jit(lambda s, l, r: fe.vo_step(s, l, r, cfg))
    feats = []
    for i in range(K):
        l, r, _ = synthetic.render_stereo(jnp.asarray(poses[i]), cfg.rig)
        st, _vo = step(st, l, r)
        feats.append((st.feats_l, st.feats_r))

    from denseslam_tpu.models.backend import _stack_features
    fl = _stack_features([f[0] for f in feats])
    fr = _stack_features([f[1] for f in feats])
    T = jnp.asarray(poses)
    fixed = jnp.arange(K) == 0
    build = jax.jit(functools.partial(build_window_problem, cfg=cfg))
    problem = build(fl, fr, T, fixed=fixed)
    solve = jax.jit(functools.partial(ba.solve, rig=cfg.rig, cfg=cfg.backend))

    res = solve(problem)                       # warm + compile
    float(jax.device_get(res.final_cost))

    n = 10
    t0 = time.perf_counter()
    for i in range(1, n + 1):
        # salt: jitter observations so dispatches are never identical
        p = problem._replace(obs=problem.obs + jnp.float32(i) * 1e-4)
        res = solve(p)
    float(jax.device_get(res.final_cost))
    ms = (time.perf_counter() - t0) / n * 1000.0

    print(json.dumps({
        "metric": "ba_solve_ms_per_window",
        "value": round(ms, 3),
        "unit": "ms",
        "window_keyframes": K,
        "landmarks_cap": int(problem.points_w.shape[0]),
        "initial_cost": float(res.initial_cost),
        "final_cost": float(res.final_cost),
    }))


if __name__ == "__main__":
    main()
