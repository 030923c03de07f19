"""Bisect the SETUP sequence that flips the runtime into degraded mode:
renders at varying poses vs device_puts vs block_until_ready-on-list."""

from __future__ import annotations

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
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    from denseslam_tpu.io import synthetic
    from denseslam_tpu.utils.camera import Intrinsics

    w, h = 1226, 370
    intr = Intrinsics(fx=707.09, fy=707.09, cx=601.89, cy=183.11,
                      width=w, height=h)

    print("tiny start: %.3f" % tiny_ms())

    if which in ("all", "render1"):
        g, d = synthetic.render_view(jnp.eye(4, dtype=jnp.float32), intr)
        jax.block_until_ready(d)
        print("tiny after 1 render: %.3f" % tiny_ms())

    if which in ("all", "render10"):
        poses = synthetic.make_trajectory(10, step_m=0.8, yaw_rate=0.003)
        outs = []
        for i in range(10):
            g, d = synthetic.render_view(jnp.asarray(poses[i]), intr)
            outs.append((g, d))
        jax.block_until_ready(outs[-1][1])
        print("tiny after 10 renders: %.3f" % tiny_ms())

    if which in ("all", "puts"):
        arrs = [jax.device_put(np.random.rand(h, w).astype(np.float32))
                for _ in range(20)]
        jax.block_until_ready(arrs)
        print("tiny after 20 device_puts: %.3f" % tiny_ms())

    if which in ("all", "stackput"):
        big = jax.device_put(jnp.stack([jnp.zeros((h, w))] * 10))
        jax.block_until_ready(big)
        print("tiny after stack+put: %.3f" % tiny_ms())


if __name__ == "__main__":
    main()
