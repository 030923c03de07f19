"""Open-addressing voxel-block hash table, fully vectorised for TPU.

The reference's ITMLib voxel hash (excess-list chained hash over
`ITMVoxelIndex`, CUDA; API surface reconstructed in SURVEY.md section 2b) is
replaced by a TPU-idiomatic open-addressing table:

  * keys are int32 block coordinates (N, 3);
  * `hash * linear-probe` candidates are materialised as a static (N, P)
    gather — no pointer chasing, no excess lists;
  * insertion resolves write conflicts with `scatter-min` claim rounds —
    P static rounds, each a pure data-parallel step, instead of CUDA atomics.

All functions are jit-stable: fixed capacities, masks for validity, `-1` for
"no slot". The table itself is just two arrays (coords, valid) so callers
can shard them along the slot axis (parallel/sharded_map.py).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

# Sentinel for unoccupied slots / invalid queries.
EMPTY_COORD = jnp.int32(-(2 ** 30))

_P1 = jnp.int32(73856093)
_P2 = jnp.int32(19349669)
_P3 = jnp.int32(83492791)


def hash_coords(coords: jax.Array, num_slots: int) -> jax.Array:
    """Spatial hash of int32 block coords (..., 3) -> slot in [0, num_slots).

    num_slots must be a power of two; `& (S-1)` of the wrapped int32 product
    is non-negative for any sign.
    """
    assert num_slots & (num_slots - 1) == 0, "table size must be a power of 2"
    h = (coords[..., 0] * _P1) ^ (coords[..., 1] * _P2) ^ (coords[..., 2] * _P3)
    return h & jnp.int32(num_slots - 1)


class HashTable(NamedTuple):
    """Slot-indexed coord table. Shardable along the slot axis."""
    coords: jax.Array  # int32 (S, 3); EMPTY_COORD in x marks a free slot
    valid: jax.Array   # bool  (S,)

    @property
    def num_slots(self) -> int:
        return self.coords.shape[0]


def make_table(num_slots: int) -> HashTable:
    return HashTable(
        coords=jnp.full((num_slots, 3), EMPTY_COORD, dtype=jnp.int32),
        valid=jnp.zeros((num_slots,), dtype=bool),
    )


def lookup(table: HashTable, queries: jax.Array, probe_len: int) -> jax.Array:
    """Find slots for (N, 3) queries. Returns int32 (N,), -1 when absent."""
    s = table.num_slots
    h = hash_coords(queries, s)
    offs = jnp.arange(probe_len, dtype=jnp.int32)
    cand = (h[:, None] + offs[None, :]) & jnp.int32(s - 1)       # (N, P)
    cand_coords = table.coords[cand]                              # (N, P, 3)
    cand_valid = table.valid[cand]                                # (N, P)
    match = cand_valid & jnp.all(cand_coords == queries[:, None, :], axis=-1)
    found = jnp.any(match, axis=-1)
    first = jnp.argmax(match, axis=-1)
    slot = jnp.take_along_axis(cand, first[:, None], axis=1)[:, 0]
    return jnp.where(found, slot, -1)


def insert(
    table: HashTable,
    queries: jax.Array,        # (N, 3) int32 — MUST be deduplicated
    qmask: jax.Array,          # (N,) bool — which queries are live
    probe_len: int,
) -> Tuple[HashTable, jax.Array, jax.Array]:
    """Insert deduplicated coords; find-or-allocate semantics.

    Returns (table, slots (N,), newly_allocated (N,) bool). slots == -1 for
    masked-out queries and for overflow (no free slot within probe_len).

    Conflict resolution: per probe round, every still-pending query tries to
    claim its candidate slot via a scatter-min of its query id; the unique
    winner writes its key. The round re-reads the (updated) table so losers
    converge on match-or-next-probe. With deduplicated queries this is
    linearisable: each key ends in exactly one slot.
    """
    n = queries.shape[0]
    s = table.num_slots
    h = hash_coords(queries, s)
    ids = jnp.arange(n, dtype=jnp.int32)
    big = jnp.int32(n + 1)

    coords = table.coords
    valid = table.valid
    slots = jnp.full((n,), -1, dtype=jnp.int32)
    fresh = jnp.zeros((n,), dtype=bool)
    pending = qmask

    for r in range(probe_len):
        cand = (h + r) & jnp.int32(s - 1)
        cand_coords = coords[cand]
        cand_valid = valid[cand]
        is_match = pending & cand_valid & jnp.all(cand_coords == queries, axis=-1)
        slots = jnp.where(is_match, cand, slots)
        pending = pending & ~is_match

        can_claim = pending & ~cand_valid
        claim = jnp.full((s,), big, dtype=jnp.int32)
        claim = claim.at[cand].min(jnp.where(can_claim, ids, big))
        won = can_claim & (claim[cand] == ids)
        # Only winners write: losers get an out-of-range index -> dropped.
        widx = jnp.where(won, cand, s)
        coords = coords.at[widx].set(queries, mode="drop")
        valid = valid.at[widx].set(True, mode="drop")
        slots = jnp.where(won, cand, slots)
        fresh = fresh | won
        pending = pending & ~won

    return HashTable(coords=coords, valid=valid), slots, fresh


def free_slots(table: HashTable, slot_idx: jax.Array, mask: jax.Array) -> HashTable:
    """Free the given slots (mask selects live entries).

    NOTE: with plain linear probing, deleting a slot can break probe chains
    that pass through it. We therefore free by *re-keying to a tombstone* that
    still counts as occupied=False but lookups of other keys walk past empty
    slots anyway because `lookup` scans the full probe window regardless of
    gaps. (lookup doesn't early-terminate on empty slots — it checks all P
    candidates — so plain clearing is safe here.)
    """
    idx = jnp.where(mask, slot_idx, table.num_slots)
    coords = table.coords.at[idx].set(EMPTY_COORD, mode="drop")
    valid = table.valid.at[idx].set(False, mode="drop")
    return HashTable(coords=coords, valid=valid)


def free_mask(table: HashTable, slot_mask: jax.Array) -> HashTable:
    """Free every slot where slot_mask (S,) is True."""
    coords = jnp.where(slot_mask[:, None], EMPTY_COORD, table.coords)
    valid = table.valid & ~slot_mask
    return HashTable(coords=coords, valid=valid)


def _dedup_hash(coords: jax.Array, mask_bits: int) -> jax.Array:
    """Well-mixed hash for dedupe buckets — decorrelated from the slot hash
    (murmur-style finalizer) so bucket collisions don't alias table probes."""
    h = (coords[..., 0] * _P2) ^ (coords[..., 1] * _P3) ^ (coords[..., 2] * _P1)
    h = h ^ (h >> 16)
    h = h * jnp.int32(-2048144789)   # 0x85ebca6b
    h = h ^ (h >> 13)
    return h & jnp.int32(mask_bits - 1)


def unique_coords(
    coords: jax.Array,   # (N, 3) int32
    mask: jax.Array,     # (N,) bool
    cap: int,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Deduplicate coords under a static cap, sort-free.

    Returns (unique (cap, 3), umask (cap,), total_unique scalar).

    Design: one scatter-min claim into a bucket table (the TPU answer to the
    reference's atomic-insert dedup inside CUDA hash allocation), then a
    cumsum compaction — no sorts. Distinct coords whose buckets collide are
    dropped for this call (bucket table is 16x the cap, so ~1% at full
    load); for frame allocation that's self-healing, the block is simply
    allocated on a later frame.

    (An earlier lexsort+argsort implementation was functionally fine but
    triggered a pathological slow mode in the TPU runtime after the first
    execution; the scatter/cumsum form is also simply faster.)
    """
    n = coords.shape[0]
    m = 1 << max(16 * cap - 1, 1).bit_length()   # >= 16*cap, power of two
    h = _dedup_hash(coords, m)
    big = jnp.int32(n)
    ids = jnp.arange(n, dtype=jnp.int32)
    scatter_idx = jnp.where(mask, h, m)
    claim = jnp.full((m,), big, dtype=jnp.int32).at[scatter_idx].min(
        ids, mode="drop"
    )
    have = claim < big
    wc = coords[jnp.minimum(claim, jnp.int32(n - 1))]
    wc = jnp.where(have[:, None], wc, EMPTY_COORD)
    pos = jnp.cumsum(have.astype(jnp.int32)) - 1
    idx = jnp.where(have & (pos < cap), pos, cap)
    out = jnp.full((cap + 1, 3), EMPTY_COORD, dtype=jnp.int32).at[idx].set(
        wc, mode="drop"
    )[:cap]
    umask = jnp.zeros((cap + 1,), bool).at[idx].set(have, mode="drop")[:cap]
    total = jnp.sum(have.astype(jnp.int32))
    return out, umask, total
