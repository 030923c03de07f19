"""Primitive cost laws on the axon TPU — dedupe-proof methodology.

The remote runtime dedupes identical (executable, args) dispatches, so every
timed dispatch gets a fresh `salt` argument that perturbs the indices/keys.
Each program unrolls K copies of the op so true cost >> RPC noise; per-op
time is t_dispatch / K. Run one variant per process:
    python scripts/exp_prims.py <variant>
variants:
    gather_rand      K=64 x (453k random gathers from 268MB)
    gather_sorted    K=64 x (453k ascending-index gathers from 268MB)
    gather_small     K=64 x (453k random gathers from 2MB)
    gather_coh       K=64 x (453k gathers, 453 unique addresses)
    scan_gather      scan of 192 steps, scan-input-driven 453k gathers
    scatter_min      K=16 x (1.2M in-bounds scatter-min into 453k)
    sort_u32         K=16 x (sort of 1M uint32)
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

M = 453_620


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


def timed(f, args_fn, n=3):
    """Dispatch f(*args_fn(salt)) with fresh salt each time; min wall.

    Syncs by FETCHING the scalar output to host — on this tunneled runtime
    block_until_ready can return before remote execution completes, so a
    device-to-host readback is the only trustworthy barrier. AOT-compiles
    first and prints phase timestamps so compile-service congestion is
    distinguishable from slow execution."""
    t0 = time.perf_counter()
    compiled = f.lower(*args_fn(0)).compile()
    print("  compile: %.1f s" % (time.perf_counter() - t0), flush=True)
    ts = []
    for s in range(1, n + 1):
        args = args_fn(s)
        jax.block_until_ready(args)
        t0 = time.perf_counter()
        out = float(jax.device_get(compiled(*args)))
        dt = time.perf_counter() - t0
        print("  dispatch %d: %.1f ms" % (s, dt * 1e3), flush=True)
        ts.append(dt)
    del out
    return min(ts)


def main():
    variant = sys.argv[1]
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    print("variant=%s K=%d tiny: %.3f ms" % (variant, K, tiny_ms()))
    rng = np.random.default_rng(0)
    pool_len = 1 << 26                      # 67M f32 = 268 MB
    pool = jnp.tile(jnp.asarray(rng.standard_normal(pool_len // 64,
                                                    np.float32)), 64)
    jax.block_until_ready(pool)

    if variant.startswith("gather"):
        if variant == "gather_small":
            src = pool[: 1 << 19]
            mask = (1 << 19) - 1
        else:
            src = pool
            mask = pool_len - 1
        if variant == "gather_sorted":
            base = np.sort(rng.integers(0, mask, (K, M)).astype(np.int32), 1)
        elif variant == "gather_coh":
            uniq = rng.integers(0, mask, (K, 453)).astype(np.int32)
            base = np.repeat(uniq, 1002, axis=1)[:, :M]
        else:
            base = rng.integers(0, mask, (K, M)).astype(np.int32)
        idxs = jnp.asarray(base & (mask & ~np.int32(63)))

        @jax.jit
        def f(src, idxs, salt):
            acc = jnp.float32(0)
            for k in range(K):
                acc = acc + src[idxs[k] | salt].sum()
            return acc

        dt = timed(f, lambda s: (src, idxs, jnp.int32(s & 63)))
        per = dt / K
        print("%s: %.3f ms/op  (%.2f ns/elem)" % (variant, per * 1e3,
                                                  per * 1e9 / M))
    elif variant == "scan_gather":
        steps = 192
        base = rng.integers(0, pool_len - 64, (steps, M)).astype(np.int32)
        idxs = jnp.asarray(base & ~np.int32(63))

        @jax.jit
        def f(src, idxs, salt):
            def step(acc, idx):
                return acc + src[idx | salt].sum(), None
            acc, _ = jax.lax.scan(step, jnp.float32(0), idxs)
            return acc

        dt = timed(f, lambda s: (pool, idxs, jnp.int32(s & 63)))
        per = dt / steps
        print("%s: %.3f ms/step  (%.2f ns/elem)" % (variant, per * 1e3,
                                                    per * 1e9 / M))
    elif variant == "scatter_min":
        Msc = 1_200_000
        NB = 453_621
        base = rng.integers(0, NB - 64, (K, Msc)).astype(np.int32)
        idxs = jnp.asarray(base)
        vals = jnp.asarray(rng.standard_normal((K, Msc)).astype(np.float32))

        @jax.jit
        def f(idxs, vals, salt):
            acc = jnp.float32(0)
            for k in range(K):
                buf = jnp.full((NB,), 1e9, jnp.float32)
                buf = buf.at[idxs[k] + salt].min(
                    vals[k], mode="promise_in_bounds")
                acc = acc + buf[0]
            return acc

        dt = timed(f, lambda s: (idxs, vals, jnp.int32(s & 63)))
        per = dt / K
        print("%s: %.3f ms/op  (%.2f ns/elem)" % (variant, per * 1e3,
                                                  per * 1e9 / Msc))
    elif variant == "sort_u32":
        Ms = 1_000_000
        keys = jnp.asarray(rng.integers(0, 1 << 31, (K, Ms)).astype(np.uint32))

        @jax.jit
        def f(keys, salt):
            acc = jnp.uint32(0)
            for k in range(K):
                acc = acc + jnp.sort(keys[k] ^ salt)[0]
            return acc

        dt = timed(f, lambda s: (keys, jnp.uint32(s)))
        per = dt / K
        print("%s: %.3f ms/op" % (variant, per * 1e3))
    else:
        raise SystemExit("unknown variant")
    print("tiny after: %.3f ms" % tiny_ms())


if __name__ == "__main__":
    main()
