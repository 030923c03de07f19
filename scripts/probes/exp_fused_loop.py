"""Probe: the fused SGM final kernel with a lax.fori_loop body.

Hypothesis (ROADMAP 2026-08-18 bisect): every individual pattern of
`sgm_pallas._final_h_kernel` compiles in isolation, but the COMBINATION
crashes the Mosaic compile helper even at wc=8 bf16 — consistent with the
16x-unrolled kernel body (16 columns x {recurrence, WTA, taps, two rolling
lane-shift buffers, 5 map writes}) blowing a compile-time resource, not a
lowering bug. This probe re-expresses the column sweep as a
`lax.fori_loop` with dynamic ref loads/stores: the program is ~wc times
smaller and the rolling buffers become loop carries.

Stages:
  * loop_recur : fori_loop over columns, recurrence + cmin only
  * loop_full  : the complete production tail inside the loop
Usage: python scripts/probes/exp_fused_loop.py [--dtype bf16|f32]
           [--wc N] [stage ...]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from denseslam_tpu.ops.sgm_pallas import _step

H, D = 370, 128
N = 4
_BIG = 1e4


def make_kernel(stage: str, wc_arg: int, w_real: int):
    def kern(cost_ref, acc_ref, best_ref, cmin_ref, c0_ref, c2_ref,
             bestr_ref, carry, mval, marg):
        dt = cost_ref.dtype
        hp, wc, d = cost_ref.shape
        big = jnp.float32(_BIG)

        @pl.when(pl.program_id(0) == 0)
        def _():
            carry[...] = jnp.zeros_like(carry)
            mval[...] = jnp.full_like(mval, big)
            marg[...] = jnp.zeros_like(marg)

        p1c = jnp.asarray(10.0, dt)
        p2c = jnp.asarray(120.0, dt)
        lane = jax.lax.broadcasted_iota(jnp.int32, (hp, d), 1)
        base = (N - 1 - pl.program_id(0)) * wc
        zero = jnp.float32(0)

        def body(i, st):
            prev, mv, ma = st
            w = wc - 1 - i           # right-to-left
            cur = cost_ref[:, pl.ds(w, 1), :][:, 0, :]
            new = _step(prev, cur, p1c, p2c)
            accw = acc_ref[:, pl.ds(w, 1), :][:, 0, :]
            final = (new + accw).astype(jnp.float32)
            cmin = jnp.min(final, axis=-1, keepdims=True)
            if stage == "loop_recur":
                best_ref[pl.ds(w, 1), :] = jnp.zeros((1, hp), jnp.int32)
                cmin_ref[pl.ds(w, 1), :] = cmin[:, 0][None]
                c0_ref[pl.ds(w, 1), :] = jnp.zeros((1, hp), jnp.float32)
                c2_ref[pl.ds(w, 1), :] = jnp.zeros((1, hp), jnp.float32)
                bestr_ref[pl.ds(w, 1), :] = jnp.zeros((1, hp), jnp.int32)
                return new, mv, ma
            is_min = (final - cmin) <= zero
            best = jnp.min(jnp.where(is_min, lane, jnp.int32(d)),
                           axis=-1, keepdims=True)
            ld = lane - best
            c0 = jnp.sum(jnp.where(ld == -1, final, zero), axis=-1,
                         dtype=jnp.float32)
            c2 = jnp.sum(jnp.where(ld == 1, final, zero), axis=-1,
                         dtype=jnp.float32)
            cand = jnp.where(base + w < w_real, final, big)
            mv = jnp.concatenate(
                [mv[:, 1:], jnp.full((hp, 1), big, jnp.float32)], axis=1)
            ma = jnp.concatenate(
                [ma[:, 1:], jnp.zeros((hp, 1), jnp.int32)], axis=1)
            better = cand <= mv
            mv = jnp.where(better, cand, mv)
            ma = jnp.where(better, lane, ma)
            best_ref[pl.ds(w, 1), :] = best[:, 0][None]
            cmin_ref[pl.ds(w, 1), :] = cmin[:, 0][None]
            c0_ref[pl.ds(w, 1), :] = c0[None]
            c2_ref[pl.ds(w, 1), :] = c2[None]
            bestr_ref[pl.ds(w, 1), :] = ma[:, 0][None]
            return new, mv, ma

        prev, mv, ma = jax.lax.fori_loop(
            0, wc, body, (carry[...], mval[...], marg[...]))
        carry[...] = prev
        mval[...] = mv
        marg[...] = ma
    return kern


def run(stage: str, dtype, wc: int) -> None:
    wp = N * wc
    cost = jnp.ones((H, wp, D), dtype)
    acc = jnp.ones((H, wp, D), dtype)
    blk3 = pl.BlockSpec((H, wc, D), lambda j: (0, N - 1 - j, 0),
                        memory_space=pltpu.VMEM)

    def map_spec():
        return pl.BlockSpec((wc, H), lambda j: (N - 1 - j, 0),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        make_kernel(stage, wc, wp - 2),
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
            pltpu.VMEM((H, D), jnp.float32),
            pltpu.VMEM((H, D), jnp.int32),
        ],
    )(cost, acc)
    s = sum(float(jnp.sum(o.astype(jnp.float32))) for o in out)
    print(f"stage {stage} ({cost.dtype}, wc={wc}): OK (checksum {s:.1f})")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--wc", type=int, default=16)
    ap.add_argument("stages", nargs="*", default=["loop_recur", "loop_full"])
    args = ap.parse_args()
    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    for st in args.stages:
        try:
            run(st, dt, args.wc)
        except Exception as e:  # noqa: BLE001
            msg = str(e).split("\n")[0][:200]
            print(f"stage {st}: FAIL {msg}")
