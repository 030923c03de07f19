"""Bisect the Mosaic relayout failure in sgm_pallas._final_h_kernel on the
real TPU (fails: "Non-singleton logical dimension is replicated in
destination but not in source for 'vector<370x128xi1>'").

Compiles progressively larger subsets of the final fused kernel's body at
real KITTI shapes (H=370, D=128, WC=16) until one fails.

Usage: python scripts/probes/exp_fused_sgm.py [stage ...]
"""

from __future__ import annotations

import functools
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from denseslam_tpu.ops.sgm_pallas import _step, WC

H, D = 370, 128
N = 4            # grid chunks
_BIG = 1e4


def make_kernel(stage: str):
    def kern(cost_ref, acc_ref, best_ref, cmin_ref, c0_ref, c2_ref,
             bestr_ref, carry, mval, marg):
        dt = cost_ref.dtype
        hp, wc, d = cost_ref.shape
        big = jnp.asarray(_BIG, dt)

        @pl.when(pl.program_id(0) == 0)
        def _():
            carry[...] = jnp.zeros_like(carry)
            mval[...] = jnp.full_like(mval, big)
            marg[...] = jnp.zeros_like(marg)

        p1c = jnp.asarray(10.0, dt)
        p2c = jnp.asarray(120.0, dt)
        lane = jax.lax.broadcasted_iota(jnp.int32, (hp, d), 1)
        base = (N - 1 - pl.program_id(0)) * wc
        zero = jnp.zeros((), dt)
        prev = carry[...]
        mv = mval[...]
        ma = marg[...]
        for w in range(wc - 1, -1, -1):
            new = _step(prev, cost_ref[:, w, :], p1c, p2c)
            prev = new
            final = new + acc_ref[:, w, :]
            cmin = jnp.min(final, axis=-1, keepdims=True)
            if stage == "recur":
                best_ref[w, :] = jnp.zeros((hp,), jnp.int32)
                cmin_ref[w, :] = cmin[:, 0].astype(jnp.float32)
                c0_ref[w, :] = jnp.zeros((hp,), jnp.float32)
                c2_ref[w, :] = jnp.zeros((hp,), jnp.float32)
                bestr_ref[w, :] = jnp.zeros((hp,), jnp.int32)
                continue
            is_min = (final - cmin) <= zero
            best = jnp.min(jnp.where(is_min, lane, jnp.int32(d)),
                           axis=-1, keepdims=True)
            if stage == "wta":
                best_ref[w, :] = best[:, 0]
                cmin_ref[w, :] = cmin[:, 0].astype(jnp.float32)
                c0_ref[w, :] = jnp.zeros((hp,), jnp.float32)
                c2_ref[w, :] = jnp.zeros((hp,), jnp.float32)
                bestr_ref[w, :] = jnp.zeros((hp,), jnp.int32)
                continue
            ld = lane - best
            c0 = jnp.sum(jnp.where(ld == -1, final, zero), axis=-1,
                         dtype=jnp.float32)
            c2 = jnp.sum(jnp.where(ld == 1, final, zero), axis=-1,
                         dtype=jnp.float32)
            if stage == "taps":
                best_ref[w, :] = best[:, 0]
                cmin_ref[w, :] = cmin[:, 0].astype(jnp.float32)
                c0_ref[w, :] = c0
                c2_ref[w, :] = c2
                bestr_ref[w, :] = jnp.zeros((hp,), jnp.int32)
                continue
            best_ref[w, :] = best[:, 0]
            cmin_ref[w, :] = cmin[:, 0].astype(jnp.float32)
            c0_ref[w, :] = c0
            c2_ref[w, :] = c2
            cand = jnp.where(base + w < WC * N - 2, final, big)
            mv = jnp.concatenate([mv[:, 1:], jnp.full((hp, 1), big, dt)],
                                 axis=1)
            ma = jnp.concatenate(
                [ma[:, 1:], jnp.zeros((hp, 1), jnp.int32)], axis=1)
            better = cand <= mv
            mv = jnp.where(better, cand, mv)
            ma = jnp.where(better, lane, ma)
            bestr_ref[w, :] = ma[:, 0]
        carry[...] = prev
        mval[...] = mv
        marg[...] = ma
    return kern


def run(stage: str) -> None:
    wp = N * WC
    cost = jnp.ones((H, wp, D), jnp.float32)
    acc = jnp.ones((H, wp, D), jnp.float32)
    blk3 = pl.BlockSpec((H, WC, D), lambda j: (0, N - 1 - j, 0),
                        memory_space=pltpu.VMEM)

    def map_spec():
        return pl.BlockSpec((WC, H), lambda j: (N - 1 - j, 0),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        make_kernel(stage),
        grid=(N,),
        in_specs=[blk3, blk3],
        out_specs=(map_spec(),) * 5,
        out_shape=(
            jax.ShapeDtypeStruct((wp, H), jnp.int32),
            jax.ShapeDtypeStruct((wp, H), jnp.float32),
            jax.ShapeDtypeStruct((wp, H), jnp.float32),
            jax.ShapeDtypeStruct((wp, H), jnp.float32),
            jax.ShapeDtypeStruct((wp, H), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((H, D), cost.dtype),
            pltpu.VMEM((H, D), cost.dtype),
            pltpu.VMEM((H, D), jnp.int32),
        ],
    )(cost, acc)
    s = sum(float(jnp.sum(o.astype(jnp.float32))) for o in out)
    print(f"stage {stage}: OK (checksum {s:.1f})")


if __name__ == "__main__":
    stages = sys.argv[1:] or ["recur", "wta", "taps", "full"]
    for st in stages:
        try:
            run(st)
        except Exception as e:  # noqa: BLE001
            msg = str(e).split("\n")[0][:200]
            print(f"stage {st}: FAIL {msg}")
