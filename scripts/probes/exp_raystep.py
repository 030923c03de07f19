"""Microbench: why is the 192-step raycast scan catastrophically slow?

Variants of: scan N steps, each gathering 453K elements, indices either
carry-dependent (like ray marching) or scan-input-driven; pool either
268 MB (tsdf) or 0.5 MB (hash table). Run ONE variant per process:
    python scripts/exp_raystep.py <variant> [steps]
"""

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


def bench(fn, *args, n=3):
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
    variant = sys.argv[1]
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 192
    N = 453620  # rays
    print("variant=%s steps=%d  tiny before: %.3f ms" % (variant, steps, tiny_ms()))

    key = jax.random.PRNGKey(0)
    big = jax.random.uniform(key, (1 << 17, 512))          # 268 MB
    bigflat_len = (1 << 17) * 512
    small = jax.random.randint(key, (1 << 17,), 0, 1 << 20, jnp.int32)  # 0.5 MB
    t0s = jax.random.uniform(jax.random.PRNGKey(1), (N,)) * 100

    if variant == "dep_big":
        @jax.jit
        def run(big, t0):
            def step(t, _):
                idx = (t * 83777.0).astype(jnp.int32) % bigflat_len
                s = big.reshape(-1)[idx]
                return t + 0.5 + 0.01 * s, None
            t, _ = jax.lax.scan(step, t0, None, length=steps)
            return t.sum()
        dt = bench(run, big, t0s)
    elif variant == "dep_small":
        @jax.jit
        def run(small, t0):
            def step(t, _):
                idx = (t * 83777.0).astype(jnp.int32) % (1 << 17)
                s = small[idx]
                return t + 0.5 + 0.0000001 * s.astype(jnp.float32), None
            t, _ = jax.lax.scan(step, t0, None, length=steps)
            return t.sum()
        dt = bench(run, small, t0s)
    elif variant == "indep_big":
        @jax.jit
        def run(big, t0):
            def step(acc, i):
                idx = ((t0 + i * 13.7) * 83777.0).astype(jnp.int32) % bigflat_len
                s = big.reshape(-1)[idx]
                return acc + s.sum(), None
            acc, _ = jax.lax.scan(step, jnp.float32(0.0),
                                  jnp.arange(steps, dtype=jnp.float32))
            return acc
        dt = bench(run, big, t0s)
    elif variant == "dep_big_while":
        @jax.jit
        def run(big, t0):
            def cond(c):
                i, t = c
                return i < steps
            def body(c):
                i, t = c
                idx = (t * 83777.0).astype(jnp.int32) % bigflat_len
                s = big.reshape(-1)[idx]
                return i + 1, t + 0.5 + 0.01 * s
            _, t = jax.lax.while_loop(cond, body, (jnp.int32(0), t0))
            return t.sum()
        dt = bench(run, big, t0s)
    elif variant == "dep_big3":
        # 3 gathers per step (tsdf+weight+probe), like the real sampler
        @jax.jit
        def run(big, t0):
            def step(t, _):
                idx = (t * 83777.0).astype(jnp.int32) % bigflat_len
                s1 = big.reshape(-1)[idx]
                s2 = big.reshape(-1)[(idx + 7919) % bigflat_len]
                s3 = big.reshape(-1)[(idx + 104729) % bigflat_len]
                return t + 0.5 + 0.01 * (s1 + s2 + s3), None
            t, _ = jax.lax.scan(step, t0, None, length=steps)
            return t.sum()
        dt = bench(run, big, t0s)
    else:
        raise SystemExit("unknown variant")

    print("%s: %.2f ms total, %.3f ms/step" % (variant, dt * 1e3, dt * 1e3 / steps))
    print("tiny after: %.3f ms" % tiny_ms())


if __name__ == "__main__":
    main()
