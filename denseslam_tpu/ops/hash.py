"""Voxel-block hash table over PACKED int32 keys, TPU-native layout.

The reference's ITMLib voxel hash (chained CUDA hash over 3-int block
coords; surface reconstructed in SURVEY.md section 2b) is replaced by an
open-addressing table whose key is a single packed int32 (10 bits per axis,
two's-complement offset) — structure-of-arrays end to end.

LAYOUT RULE (load-bearing on this TPU runtime): never materialise (N, 3)
coordinate tensors in hot programs. An int32 (N, 3) intermediate tiles as
(8, 128) with the minor dimension padded 3 -> 128 (42x memory), which both
explodes compile time (minutes) and drags execution; the packed-key form
keeps every hot array 1-D. (Measured: the AoS variant of `pack` took 290 s
to compile and left the runtime degraded; the SoA variant compiles in
seconds and runs in ~2 ms at 1.4M elements.)

Probing stays fully vectorised: hash + linear probe candidates as a static
(N, P) gather; insertion resolves conflicts with scatter-min claim rounds
(P static rounds) instead of CUDA atomics.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import numpy as np
import jax.numpy as jnp

# Packed-key coordinate range: each axis in [-PACK_HALF, PACK_HALF); at the
# default 0.48 m blocks that bounds a submap to ~±245 m from its origin —
# long trajectories re-anchor via submaps (SubmapManager), exactly as the
# reference's multi-local-map machinery intends.
PACK_BITS = 10
PACK_HALF = 1 << (PACK_BITS - 1)
_PACK_MASK = (1 << PACK_BITS) - 1

# Sentinels. EMPTY_KEY marks a free slot; EMPTY_COORD is the legacy
# coordinate-space sentinel used by callers/tests.
#
# MUST be numpy scalars, NOT jnp device arrays: a module-level jnp constant
# is a committed device buffer, and any sufficiently large jitted program
# that captures one flips this runtime's dispatch into a degraded mode for
# the REST OF THE PROCESS (~100x on every subsequent dispatch, measured
# 0.04 ms -> 62 ms on an 8.4M gather; reproduced deterministically).
# numpy scalars bake into the HLO as literals and are immune.
EMPTY_KEY = np.int32(2 ** 30)
EMPTY_COORD = np.int32(-(2 ** 30))


def pack_xyz(x: jax.Array, y: jax.Array, z: jax.Array,
             mask: jax.Array | bool = True) -> jax.Array:
    """SoA coords -> packed key; out-of-range or masked -> EMPTY_KEY."""
    xs = x + PACK_HALF
    ys = y + PACK_HALF
    zs = z + PACK_HALF
    lim = 1 << PACK_BITS
    ok = (
        (xs >= 0) & (xs < lim) & (ys >= 0) & (ys < lim)
        & (zs >= 0) & (zs < lim) & mask
    )
    key = xs | (ys << PACK_BITS) | (zs << (2 * PACK_BITS))
    return jnp.where(ok, key, EMPTY_KEY)


def pack_coords(coords: jax.Array, mask: jax.Array | bool = True) -> jax.Array:
    """(..., 3) coords -> packed keys. Column-sliced (SoA inside)."""
    return pack_xyz(coords[..., 0], coords[..., 1], coords[..., 2], mask)


def unpack_xyz(keys: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    x = (keys & _PACK_MASK) - PACK_HALF
    y = ((keys >> PACK_BITS) & _PACK_MASK) - PACK_HALF
    z = ((keys >> (2 * PACK_BITS)) & _PACK_MASK) - PACK_HALF
    return x, y, z


def unpack_coords(keys: jax.Array) -> jax.Array:
    """Packed keys -> (..., 3) coords (only for small/cold outputs)."""
    x, y, z = unpack_xyz(keys)
    return jnp.stack([x, y, z], axis=-1)


def hash_key(keys: jax.Array, num_slots: int) -> jax.Array:
    """Murmur-style finalizer over the packed key -> slot index."""
    assert num_slots & (num_slots - 1) == 0, "table size must be a power of 2"
    h = keys * jnp.int32(-2048144789)        # 0x85ebca6b
    h = h ^ (h >> 13)
    h = h * jnp.int32(-1028477387)           # 0xc2b2ae35
    h = h ^ (h >> 16)
    return h & jnp.int32(num_slots - 1)


class HashTable(NamedTuple):
    """Slot-indexed packed-key table. Shardable along the slot axis."""
    keys: jax.Array    # int32 (S,); EMPTY_KEY marks a free slot

    @property
    def num_slots(self) -> int:
        return self.keys.shape[0]

    @property
    def valid(self) -> jax.Array:
        return self.keys != EMPTY_KEY

    @property
    def coords(self) -> jax.Array:
        """(S, 3) coords view — for export/debug paths only."""
        c = unpack_coords(self.keys)
        return jnp.where((self.keys != EMPTY_KEY)[:, None], c, EMPTY_COORD)


def make_table(num_slots: int) -> HashTable:
    return HashTable(keys=jnp.full((num_slots,), EMPTY_KEY, dtype=jnp.int32))


def lookup_keys(table: HashTable, qkeys: jax.Array, probe_len: int) -> jax.Array:
    """Find slots for (N,) packed keys. Returns int32 (N,), -1 when absent.

    Probe rounds are a python loop of (N,) gathers — NEVER a single (N, P)
    2D gather: a minor-dim-P intermediate tiles with 128/P-x lane padding
    and was measured to make the raycast sampling loop ~1000x slower
    (15 s/frame -> ms-scale after this change). Same structure as
    insert_keys' probe loop."""
    s = table.num_slots
    h = hash_key(qkeys, s)
    valid = qkeys != EMPTY_KEY
    slot = jnp.full(qkeys.shape, -1, dtype=jnp.int32)
    found = jnp.zeros(qkeys.shape, dtype=bool)
    for r in range(probe_len):
        cand = (h + r) & jnp.int32(s - 1)
        ck = table.keys[cand]
        hit = ~found & valid & (ck == qkeys)
        slot = jnp.where(hit, cand, slot)
        found = found | hit
    return slot


def lookup(table: HashTable, queries: jax.Array, probe_len: int) -> jax.Array:
    """Coord-space wrapper: (N, 3) queries -> slots."""
    return lookup_keys(table, pack_coords(queries), probe_len)


def insert_keys(
    table: HashTable,
    qkeys: jax.Array,          # (N,) packed keys — MUST be deduplicated
    qmask: jax.Array,          # (N,) bool
    probe_len: int,
) -> Tuple[HashTable, jax.Array, jax.Array]:
    """Insert deduplicated keys; find-or-allocate semantics.

    Returns (table, slots (N,), newly_allocated (N,) bool). slots == -1 for
    masked-out queries and for overflow (no free slot within probe_len).

    Conflict resolution: per probe round, every still-pending query tries to
    claim its candidate slot via a scatter-min of its query id; the unique
    winner writes its key. The round re-reads the (updated) table so losers
    converge on match-or-next-probe.
    """
    n = qkeys.shape[0]
    s = table.num_slots
    qmask = qmask & (qkeys != EMPTY_KEY)
    h = hash_key(qkeys, s)
    ids = jnp.arange(n, dtype=jnp.int32)
    big = jnp.int32(n + 1)

    keys = table.keys
    slots = jnp.full((n,), -1, dtype=jnp.int32)
    fresh = jnp.zeros((n,), dtype=bool)
    pending = qmask

    for r in range(probe_len):
        cand = (h + r) & jnp.int32(s - 1)
        ck = keys[cand]
        is_match = pending & (ck == qkeys)
        slots = jnp.where(is_match, cand, slots)
        pending = pending & ~is_match

        can_claim = pending & (ck == EMPTY_KEY)
        claim = jnp.full((s,), big, dtype=jnp.int32)
        claim = claim.at[cand].min(jnp.where(can_claim, ids, big))
        won = can_claim & (claim[cand] == ids)
        # Only winners write: losers get an out-of-range index -> dropped.
        widx = jnp.where(won, cand, s)
        keys = keys.at[widx].set(qkeys, mode="drop")
        slots = jnp.where(won, cand, slots)
        fresh = fresh | won
        pending = pending & ~won

    return HashTable(keys=keys), slots, fresh


def insert(
    table: HashTable,
    queries: jax.Array,        # (N, 3) int32 — deduplicated coords
    qmask: jax.Array,
    probe_len: int,
) -> Tuple[HashTable, jax.Array, jax.Array]:
    """Coord-space wrapper around insert_keys."""
    return insert_keys(table, pack_coords(queries, qmask), qmask, probe_len)


def free_slots(table: HashTable, slot_idx: jax.Array, mask: jax.Array) -> HashTable:
    """Free the given slots. Safe with full-window (non-early-exit) lookup."""
    idx = jnp.where(mask, slot_idx, table.num_slots)
    return HashTable(keys=table.keys.at[idx].set(EMPTY_KEY, mode="drop"))


def free_mask(table: HashTable, slot_mask: jax.Array) -> HashTable:
    """Free every slot where slot_mask (S,) is True."""
    return HashTable(keys=jnp.where(slot_mask, EMPTY_KEY, table.keys))


def unique_keys(
    keys: jax.Array,     # (N,) packed keys (EMPTY_KEY = invalid)
    cap: int,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Deduplicate packed keys under a static cap using ONLY single-operand
    sorts: sort, neighbour-diff, then a second sort as the compaction
    (non-firsts become EMPTY_KEY and sort to the back). No scatter/gather.

    Returns (keys (cap,), mask (cap,), total_unique)."""
    s1 = jnp.sort(keys)
    prev = jnp.concatenate([jnp.full((1,), -1, dtype=s1.dtype), s1[:-1]])
    is_first = (s1 != prev) & (s1 != EMPTY_KEY)
    firsts = jnp.where(is_first, s1, EMPTY_KEY)
    s2 = jnp.sort(firsts)
    out = s2[:cap]
    umask = out != EMPTY_KEY
    total = jnp.sum(is_first.astype(jnp.int32))
    return out, umask, total


def unique_coords(
    coords: jax.Array,   # (N, 3) int32
    mask: jax.Array,     # (N,) bool
    cap: int,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Coord-space wrapper: dedupe (N, 3) coords under a static cap.

    Returns (unique (cap, 3), umask (cap,), total_unique)."""
    keys, umask, total = unique_keys(pack_coords(coords, mask), cap)
    out = jnp.where(umask[:, None], unpack_coords(keys), EMPTY_COORD)
    return out, umask, total
