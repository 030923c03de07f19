"""Bisect the Mosaic failure in sgm_pallas._final_h_kernel on the real TPU
(historical failure: "Non-singleton logical dimension is replicated in
destination but not in source for 'vector<370x128xi1>'"; separately, f32
blocks that exceed VMEM once double-buffered crash the remote compile
helper outright).

Compiles progressively larger subsets of the final fused kernel's body at
real KITTI shapes (H=370, D=128) until one fails. Dtype and chunk width are
CLI-selectable so the two failure modes don't conflate:

  * --dtype bf16 --wc 16  -> the relayout bisect (bf16-born i1 masks, the
    production bench config; blocks fit VMEM comfortably)
  * --dtype f32 --wc 8    -> the production f32 config (_wc halves f32)
  * --dtype f32 --wc 16   -> EXPECTED to crash the helper (VMEM overflow
    control — two 3 MB input blocks double-buffered)

The tail mirrors the production kernel: f32 upcast before the WTA/taps/
right-argmin reductions, f32 rolling-min scratch, f32 BIG constants.

Usage: python scripts/probes/exp_fused_sgm.py [--dtype bf16|f32] [--wc N]
           [stage ...]        # stages: recur wta taps full
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
N = 4            # grid chunks
_BIG = 1e4


def make_kernel(stage: str, wc_arg: int):
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
        prev = carry[...]
        mv = mval[...]
        ma = marg[...]
        for w in range(wc - 1, -1, -1):
            new = _step(prev, cost_ref[:, w, :], p1c, p2c)
            prev = new
            # production tail: f32 regardless of the volume dtype
            final = (new + acc_ref[:, w, :]).astype(jnp.float32)
            cmin = jnp.min(final, axis=-1, keepdims=True)
            if stage == "recur":
                best_ref[w, :] = jnp.zeros((hp,), jnp.int32)
                cmin_ref[w, :] = cmin[:, 0]
                c0_ref[w, :] = jnp.zeros((hp,), jnp.float32)
                c2_ref[w, :] = jnp.zeros((hp,), jnp.float32)
                bestr_ref[w, :] = jnp.zeros((hp,), jnp.int32)
                continue
            if stage == "rargmin_roll":
                # rolling buffers via the hardware lane rotate instead of
                # concat-shift; vacated lane re-seeded by a scalar compare
                from jax.experimental.pallas import tpu as _pt
                cand = jnp.where(base + w < wc_arg * N - 2, final, big)
                mv = _pt.roll(mv, d - 1, 1)
                ma = _pt.roll(ma, d - 1, 1)
                last = lane == jnp.int32(d - 1)
                mv = jnp.where(last, big, mv)
                ma = jnp.where(last, jnp.int32(0), ma)
                better = cand <= mv
                mv = jnp.where(better, cand, mv)
                ma = jnp.where(better, lane, ma)
                best_ref[w, :] = jnp.zeros((hp,), jnp.int32)
                cmin_ref[w, :] = cmin[:, 0]
                c0_ref[w, :] = jnp.zeros((hp,), jnp.float32)
                c2_ref[w, :] = jnp.zeros((hp,), jnp.float32)
                bestr_ref[w, :] = ma[:, 0]
                continue
            if stage == "rargmin":
                # recurrence + rolling right-argmin ONLY (the F2 kernel of
                # the split-final design): no WTA, no taps
                cand = jnp.where(base + w < wc_arg * N - 2, final, big)
                mv = jnp.concatenate(
                    [mv[:, 1:], jnp.full((hp, 1), big, jnp.float32)], axis=1)
                ma = jnp.concatenate(
                    [ma[:, 1:], jnp.zeros((hp, 1), jnp.int32)], axis=1)
                better = cand <= mv
                mv = jnp.where(better, cand, mv)
                ma = jnp.where(better, lane, ma)
                best_ref[w, :] = jnp.zeros((hp,), jnp.int32)
                cmin_ref[w, :] = cmin[:, 0]
                c0_ref[w, :] = jnp.zeros((hp,), jnp.float32)
                c2_ref[w, :] = jnp.zeros((hp,), jnp.float32)
                bestr_ref[w, :] = ma[:, 0]
                continue
            is_min = (final - cmin) <= zero
            best = jnp.min(jnp.where(is_min, lane, jnp.int32(d)),
                           axis=-1, keepdims=True)
            if stage == "wta":
                best_ref[w, :] = best[:, 0]
                cmin_ref[w, :] = cmin[:, 0]
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
                cmin_ref[w, :] = cmin[:, 0]
                c0_ref[w, :] = c0
                c2_ref[w, :] = c2
                bestr_ref[w, :] = jnp.zeros((hp,), jnp.int32)
                continue
            best_ref[w, :] = best[:, 0]
            cmin_ref[w, :] = cmin[:, 0]
            c0_ref[w, :] = c0
            c2_ref[w, :] = c2
            cand = jnp.where(base + w < wc_arg * N - 2, final, big)
            mv = jnp.concatenate(
                [mv[:, 1:], jnp.full((hp, 1), big, jnp.float32)], axis=1)
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
        make_kernel(stage, wc),
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
            pltpu.VMEM((H, D), cost.dtype),      # SGM carry (volume dtype)
            pltpu.VMEM((H, D), jnp.float32),     # rolling right-min values
            pltpu.VMEM((H, D), jnp.int32),       # rolling right-min argmin
        ],
    )(cost, acc)
    s = sum(float(jnp.sum(o.astype(jnp.float32))) for o in out)
    print(f"stage {stage} ({cost.dtype}, wc={wc}): OK (checksum {s:.1f})")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--wc", type=int, default=16)
    ap.add_argument("stages", nargs="*",
                    default=["recur", "wta", "taps", "full"])
    args = ap.parse_args()
    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    for st in args.stages:
        try:
            run(st, dt, args.wc)
        except Exception as e:  # noqa: BLE001
            msg = str(e).split("\n")[0][:200]
            print(f"stage {st}: FAIL {msg}")
