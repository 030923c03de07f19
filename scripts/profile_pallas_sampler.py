"""Exactness + timing of the pallas tile-sampler (ops/sampling.py) on the
real TPU vs the XLA computed-index gather, at the bench access pattern
(V blocks x 512 voxels, KITTI-sized image).

Run on TPU: python scripts/profile_pallas_sampler.py
CPU check:  python scripts/profile_pallas_sampler.py cpu  (interpret mode)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

import jax.numpy as jnp
import numpy as np


def main(on_tpu: bool) -> None:
    if not on_tpu:
        jax.config.update("jax_platforms", "cpu")
    from denseslam_tpu.ops import sampling

    rng = np.random.default_rng(0)
    H, W = 370, 1226
    V = 8192 if on_tpu else 64   # interpret mode is slow; small CPU check
    d_img = rng.integers(1, 60000, (H, W)).astype(np.int32)
    g_img = rng.integers(0, 256, (H, W)).astype(np.int32)
    combo = (d_img << 8) | g_img
    # clustered coords, a few overflow blocks
    ou = rng.uniform(0, W - 60, (V, 1))
    ov = rng.uniform(0, H - 50, (V, 1))
    u = (ou + rng.uniform(0, 59, (V, 512))).astype(np.float32)
    v = (ov + rng.uniform(0, 49, (V, 512))).astype(np.float32)
    u[::101] = rng.uniform(0, W - 1, (len(u[::101]), 512))  # overflow rows
    z = np.ones((V, 512), np.float32)

    cj, uj, vj, zj = map(jnp.asarray, (combo, u, v, z))
    d_mm, gray, ok, over = sampling.tile_sample(
        cj, uj, vj, zj, W, H, interpret=not on_tpu)
    d_mm, ok, over = map(np.asarray, (d_mm, ok, over))
    ui = np.clip(np.round(u).astype(np.int64), 0, W - 1)
    vi = np.clip(np.round(v).astype(np.int64), 0, H - 1)
    ref = (combo[vi, ui] >> 8).astype(np.float32)
    good = np.array_equal(d_mm[ok], ref[ok])
    print(f"exact on sampled voxels: {good}; overflow blocks: {over.sum()}; "
          f"in-tile coverage: {ok.mean():.3f}")
    assert good

    if not on_tpu:
        return

    def run_pallas(salt):
        d, g, okk, ov = sampling.tile_sample(cj, uj + salt, vj, zj, W, H)
        return jnp.sum(d)

    def run_gather(salt):
        ui = jnp.clip(jnp.round(uj + salt).astype(jnp.int32), 0, W - 1)
        vi = jnp.clip(jnp.round(vj).astype(jnp.int32), 0, H - 1)
        got = cj.reshape(-1)[vi * W + ui]
        return jnp.sum(jnp.right_shift(got, 8).astype(jnp.float32))

    for name, fn in [("pallas", run_pallas), ("xla-gather", run_gather)]:
        f = jax.jit(fn)
        float(jax.device_get(f(jnp.float32(0.0))))
        t0 = time.perf_counter()
        n = 5
        for i in range(1, n + 1):
            s = f(jnp.float32(i) * 0.25)
        float(jax.device_get(s))
        dt = (time.perf_counter() - t0) / n
        print(f"{name:12s} {dt * 1e3:8.2f} ms  "
              f"({dt / (V * 512) * 1e9:5.2f} ns/elem)")


if __name__ == "__main__":
    main(not (len(sys.argv) > 1 and sys.argv[1] == "cpu"))
