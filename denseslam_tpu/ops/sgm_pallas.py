"""SGM path aggregation as pallas TPU kernels.

Each direction is one pallas call whose GRID iterates the scan chunks —
pallas auto-pipelines the chunk DMAs, the path carry lives in VMEM
scratch that persists across sequentially-executed grid steps, and each
pass after the first accumulates onto the previous result so the final
direction sum never materialises separately. Same recurrence, same
per-element op order as the XLA path (out = cur + min(prev, prev<<1 + p1,
prev>>1 + p1, min(prev) + p2) - min(prev); zero carry = identity on the
first slab).

MEASURED TRADE (2026-08-18, v5e): standalone on an argument volume this
wins — 33.5 ms vs the lax.scan path's 44 ms (bf16 KITTI volume, incl.
consumer reduce). INSIDE the full pipeline it LOSES ~3x (bench_full 20.8
-> 6.1 fps): the pallas call boundaries force the 232 MB cost volume (and
each intermediate aggregate) to fully materialise in HBM, where XLA fuses
the cost-volume producer and the WTA consumer into the scan dataflow.
Default is therefore sgm_backend="xla"; this backend remains for
standalone aggregation workloads.

A fully fused aggregation+WTA kernel (sgm_backend="pallas_fused") was
built, validated bitwise in interpret mode, and REMOVED (round 3): its
rolling right-argmin construct (per-column lane-shift min buffers on
(H, D) tiles, unrolled) crashes the TPU Mosaic compiler in every
formulation tried — concat-shift AND pltpu.roll — independent of program
size (probe: scripts/probes/exp_fused_sgm.py). A future fused kernel
must obtain the right-argmin differently (packed value-lane keys
min-reduced per sheared block, or out-of-kernel); with SGM only ~4 ms
amortized per frame at keyframe-rate gating, the residual prize did not
justify carrying a backend that refuses to run on the target hardware.

Reference semantics target: classic 4-path SGM cost aggregation (the
reference consumes precomputed ELAS/DispNet disparity from disk —
src/DenseSLAM/PrecomputedDepthProvider.cpp:30-68 — so on-device stereo is
this framework's own, TPU-native addition).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e4   # matches ops/stereo.py invalid-cost marker

# chunk sizes: W chunks must be sublane-tile multiples (16 covers bf16 and
# f32); H chunks just need to divide H.
WC = 16


def _wc(dtype) -> int:
    """Horizontal chunk width. Two f32 (H, WC=16, D) input blocks exceed
    VMEM once pallas double-buffers them (the compile helper subprocess
    crashes, poisoning the shared remote-compile service) — halve the
    chunk for 4-byte volumes; 2-byte volumes keep WC=16."""
    return WC if jnp.dtype(dtype).itemsize <= 2 else WC // 2


def _step(prev, cur, p1, p2):
    """One SGM recurrence step on a (S, D) slab; D on lanes."""
    prev_min = jnp.min(prev, axis=-1, keepdims=True)
    shift_p = jnp.concatenate([prev[:, :1], prev[:, :-1]], axis=1)
    shift_n = jnp.concatenate([prev[:, 1:], prev[:, -1:]], axis=1)
    best = jnp.minimum(
        jnp.minimum(prev, shift_p + p1),
        jnp.minimum(shift_n + p1, prev_min + p2),
    )
    return cur + best - prev_min


def _h_kernel(*refs, p1, p2, rev, acc, wc):
    """Horizontal pass. Block (H, WC, D); carry scratch (H, D).

    Grid steps run sequentially on the core, so the carry persists across
    chunks; chunk j of a reversed pass maps to chunk n-1-j via the
    BlockSpec index_map, and the in-chunk loop runs right-to-left."""
    if acc:
        cost_ref, acc_ref, out_ref, carry = refs
    else:
        cost_ref, out_ref, carry = refs
        acc_ref = None

    @pl.when(pl.program_id(0) == 0)
    def _():
        carry[...] = jnp.zeros_like(carry)

    dt = cost_ref.dtype
    p1c = jnp.asarray(p1, dt)
    p2c = jnp.asarray(p2, dt)
    prev = carry[...]
    order = range(wc - 1, -1, -1) if rev else range(wc)
    for w in order:
        new = _step(prev, cost_ref[:, w, :], p1c, p2c)
        if acc_ref is None:
            out_ref[:, w, :] = new
        else:
            out_ref[:, w, :] = new + acc_ref[:, w, :]
        prev = new
    carry[...] = prev


def _v_kernel(*refs, p1, p2, rev, acc, hc):
    """Vertical pass. Block (HC, W, D); carry scratch (W, D)."""
    if acc:
        cost_ref, acc_ref, out_ref, carry = refs
    else:
        cost_ref, out_ref, carry = refs
        acc_ref = None

    @pl.when(pl.program_id(0) == 0)
    def _():
        carry[...] = jnp.zeros_like(carry)

    dt = cost_ref.dtype
    p1c = jnp.asarray(p1, dt)
    p2c = jnp.asarray(p2, dt)
    prev = carry[...]
    order = range(hc - 1, -1, -1) if rev else range(hc)
    for h in order:
        new = _step(prev, cost_ref[h], p1c, p2c)
        if acc_ref is None:
            out_ref[h] = new
        else:
            out_ref[h] = new + acc_ref[h]
        prev = new
    carry[...] = prev


def _pick_hc(h: int, dtype) -> int:
    """Vertical chunk height, dtype-bounded like _wc: a 4-byte volume gets
    half the rows so the (hc, W, D) block bytes match the known-good bf16
    footprint (hc=10 f32 blocks at KITTI width are ~6.3 MB each — over
    VMEM once double-buffered, same crash mode as the horizontal case)."""
    limit = 10 if jnp.dtype(dtype).itemsize <= 2 else 5
    for hc in (10, 8, 5, 4, 2):
        if hc <= limit and h % hc == 0:
            return hc
    return 1


def _direction_call(cost, acc, *, axis, rev, p1, p2, interpret):
    hp, wp, d = cost.shape
    if axis == 1:                                  # horizontal
        wc = _wc(cost.dtype)
        n = wp // wc
        blk = pl.BlockSpec(
            (hp, wc, d),
            (lambda j: (0, n - 1 - j, 0)) if rev else (lambda j: (0, j, 0)),
            memory_space=pltpu.VMEM)
        kern = functools.partial(_h_kernel, p1=p1, p2=p2, rev=rev,
                                 acc=acc is not None, wc=wc)
        carry_shape = (hp, d)
    else:                                          # vertical
        hc = _pick_hc(hp, cost.dtype)
        n = hp // hc
        blk = pl.BlockSpec(
            (hc, wp, d),
            (lambda j: (n - 1 - j, 0, 0)) if rev else (lambda j: (j, 0, 0)),
            memory_space=pltpu.VMEM)
        kern = functools.partial(_v_kernel, p1=p1, p2=p2, rev=rev,
                                 acc=acc is not None, hc=hc)
        carry_shape = (wp, d)

    in_specs = [blk] if acc is None else [blk, blk]
    args = (cost,) if acc is None else (cost, acc)
    return pl.pallas_call(
        kern,
        grid=(n,),
        in_specs=in_specs,
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct(cost.shape, cost.dtype),
        scratch_shapes=[pltpu.VMEM(carry_shape, cost.dtype)],
        interpret=interpret,
    )(*args)


def sgm_aggregate_pallas(cost: jax.Array, p1: float, p2: float,
                         *, interpret: bool = False) -> jax.Array:
    """4-path SGM aggregation. cost: (H, W, D) -> same-shape sum of the
    four directional aggregates. Numerically the same recurrence as the
    XLA path; the direction sum associates as ((v_fwd + v_bwd) + h_fwd)
    + h_bwd (exact for integer-valued costs; within f32 rounding of the
    XLA path's (v+v) + (h+h) otherwise)."""
    h, w, d = cost.shape
    wp = -(-w // _wc(cost.dtype)) * _wc(cost.dtype)
    if wp != w:
        # ZERO-pad: a zero carry stays zero through zero-cost slabs
        # (out = 0 + min(0, p1, p2) - 0 = 0), so the right-to-left pass
        # enters the real columns with the exact zero-carry identity —
        # BIG-valued pads would round the first real slab in bf16
        # (cur + BIG - BIG). Pads are sliced off at the end.
        cost = jnp.pad(cost, ((0, 0), (0, wp - w), (0, 0)))
    run = functools.partial(_direction_call, p1=p1, p2=p2,
                            interpret=interpret)
    a = run(cost, None, axis=0, rev=False)
    a = run(cost, a, axis=0, rev=True)
    a = run(cost, a, axis=1, rev=False)
    a = run(cost, a, axis=1, rev=True)
    return a[:, :w, :]
