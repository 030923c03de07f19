"""Probe: pallas tile-sample kernel vs XLA computed-index gather.

Samples an (H, W) int32 image at per-voxel integer pixel coords, organised
as V blocks x 512 voxels whose coords cluster inside a (TH, TW) tile per
block (the TSDF-fusion access pattern). Pallas: DMA the tile to VMEM,
select rows with a one-hot matmul (exact for <2^16 values at HIGHEST),
select columns with a masked VPU sum.
"""
import functools
import sys, time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TH, TW = 64, 128
BCHUNK = 8


def kernel(u0_ref, v0_ref, tu_ref, tv_ref, img_ref, d_out, g_out, tile, sem):
    i = pl.program_id(0)
    for b in range(BCHUNK):
        u0 = u0_ref[i * BCHUNK + b]
        v0 = v0_ref[i * BCHUNK + b]
        cp = pltpu.make_async_copy(
            img_ref.at[pl.ds(v0, TH), pl.ds(u0, TW)], tile, sem)
        cp.start()
        cp.wait()
        raw = tile[:]
        td = (raw >> 8).astype(jnp.float32)          # depth mm (<= 65535)
        tg = (raw & 0xFF).astype(jnp.float32)        # gray (<= 255)
        cat = jnp.concatenate([td, tg], axis=1)      # (TH, 2*TW)
        tu = tu_ref[b, :]                            # (512,)
        tv = tv_ref[b, :]
        rows_i = jax.lax.broadcasted_iota(jnp.int32, (512, TH), 1)
        onehot = (rows_i == tv[:, None]).astype(jnp.float32)
        rows = jax.lax.dot(onehot, cat,
                           precision=jax.lax.Precision.HIGHEST,
                           preferred_element_type=jnp.float32)  # (512, 2TW)
        cols_i = jax.lax.broadcasted_iota(jnp.int32, (512, TW), 1)
        cmask = (cols_i == tu[:, None]).astype(jnp.float32)
        d = jnp.sum(rows[:, :TW] * cmask, axis=1)
        g = jnp.sum(rows[:, TW:] * cmask, axis=1)
        inb = (tu >= 0) & (tu < TW) & (tv >= 0) & (tv < TH)
        d_out[b, :] = jnp.where(inb, d, 0.0)
        g_out[b, :] = jnp.where(inb, g, 0.0)


def tile_sample(img, u0, v0, tu, tv, interpret=False):
    V = tu.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(V // BCHUNK,),
        in_specs=[
            pl.BlockSpec((BCHUNK, 512), lambda i, u0, v0: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BCHUNK, 512), lambda i, u0, v0: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((BCHUNK, 512), lambda i, u0, v0: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BCHUNK, 512), lambda i, u0, v0: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((TH, TW), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((V, 512), jnp.float32),
                   jax.ShapeDtypeStruct((V, 512), jnp.float32)],
        interpret=interpret,
    )(u0, v0, tu, tv, img)


def main(on_tpu):
    rng = np.random.default_rng(0)
    H, W = 370, 1280
    V = 4096
    d_img = rng.integers(0, 60000, (H, W)).astype(np.int32)
    g_img = rng.integers(0, 256, (H, W)).astype(np.int32)
    img = (d_img << 8) | g_img
    u0 = rng.integers(0, W - TW, (V,)).astype(np.int32)
    v0 = rng.integers(0, H - TH, (V,)).astype(np.int32)
    tu = rng.integers(-4, TW + 4, (V, 512)).astype(np.int32)  # some OOB
    tv = rng.integers(-4, TH + 4, (V, 512)).astype(np.int32)

    img_j = jnp.asarray(img)
    args = tuple(map(jnp.asarray, (u0, v0, tu, tv)))

    # reference: XLA gather
    ui = u0[:, None] + tu
    vi = v0[:, None] + tv
    inb = (tu >= 0) & (tu < TW) & (tv >= 0) & (tv < TH)
    ref = img[np.clip(vi, 0, H - 1), np.clip(ui, 0, W - 1)]
    ref_d = np.where(inb, ref >> 8, 0).astype(np.float32)
    ref_g = np.where(inb, ref & 0xFF, 0).astype(np.float32)

    f = jax.jit(functools.partial(tile_sample, interpret=not on_tpu))
    d, g = f(img_j, *args)
    d, g = np.asarray(d), np.asarray(g)
    ok_d = np.array_equal(d, ref_d)
    ok_g = np.array_equal(g, ref_g)
    print("exact d:", ok_d, " exact g:", ok_g)
    if not ok_d:
        bad = np.argwhere(d != ref_d)
        print("mismatches:", len(bad), bad[:5], d[tuple(bad[0])], ref_d[tuple(bad[0])])
    if on_tpu:
        # timing: salt coords each iter, fetch-sync scalar
        def run(salt):
            tu2 = (args[2] + salt) % TW
            d, g = tile_sample(img_j, args[0], args[1], tu2, args[3])
            return jnp.sum(d)
        run_j = jax.jit(run)
        float(jax.device_get(run_j(jnp.int32(0))))
        t0 = time.perf_counter()
        for i in range(1, 6):
            s = run_j(jnp.int32(i))
        float(jax.device_get(s))
        dt = (time.perf_counter() - t0) / 5
        print(f"pallas tile_sample {V}x512: {dt*1e3:.2f} ms "
              f"({dt/ (V*512) * 1e9:.2f} ns/elem)")

        def run_x(salt):
            tu2 = (args[2] + salt) % TW
            ui = args[0][:, None] + tu2
            vi = args[1][:, None] + args[3]
            uc = jnp.clip(ui, 0, W - 1)
            vc = jnp.clip(vi, 0, H - 1)
            got = img_j.reshape(-1)[vc * W + uc]
            return jnp.sum((got >> 8).astype(jnp.float32))
        run_xj = jax.jit(run_x)
        float(jax.device_get(run_xj(jnp.int32(0))))
        t0 = time.perf_counter()
        for i in range(1, 6):
            s = run_xj(jnp.int32(i))
        float(jax.device_get(s))
        dt = (time.perf_counter() - t0) / 5
        print(f"XLA gather          {V}x512: {dt*1e3:.2f} ms "
              f"({dt/ (V*512) * 1e9:.2f} ns/elem)")


if __name__ == "__main__":
    on_tpu = len(sys.argv) > 1 and sys.argv[1] == "tpu"
    if not on_tpu:
        jax.config.update("jax_platforms", "cpu")
    main(on_tpu)
