"""Sharded voxel-block TSDF map: SPMD over a `map` device axis.

Distribution design (SURVEY.md section 2c P3/P5, BASELINE.json north star):
the slot axis of every MapState array is sharded across devices; each device
runs an INDEPENDENT local hash table over the blocks it owns. Ownership is a
pure function of the block coordinate — a hash of the block's supertile
(blocks grouped 4^3 to keep surface crossings off ownership boundaries) —
so:

  * allocation/integration need NO communication: every device computes the
    frame's touched-block set (replicated elementwise math), keeps its owned
    subset, and fuses locally;
  * raycast: each device marches rays through its local map only; the true
    surface is recovered with one `pmin` over per-device hit depths (a miss
    = +inf). Crossings are only detected between two *observed* samples
    (ops/raycast.py), so a shard can never report a phantom in front of
    another shard's surface;
  * decay / sliding window are purely local elementwise passes;
  * telemetry (block counts, memory) is a `psum`.

This mirrors how the reference's single-GPU hash table would scale: spatial
partitioning of the block table, not replication.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Tuple

import jax
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import SystemConfig, TsdfConfig
from ..ops import raycast as rc_ops
from ..ops import tsdf as tsdf_ops
from ..utils.camera import Intrinsics
from .mesh import MAP_AXIS

SUPER_SHIFT = 2  # supertile = 4x4x4 blocks (~2 m at 6 cm voxels)

# numpy, not jnp: module-level device constants poison this runtime's
# dispatch path for the whole process (see ops/hash.py sentinel comment).
_OWNER_P1 = np.int32(-1640531527)  # 2654435761 as wrapped int32
_OWNER_P2 = np.int32(40503)
_OWNER_P3 = np.int32(1597334677)


def owner_of_keys(keys: jax.Array, n_devices: int) -> jax.Array:
    """Device owning a packed block key — supertile hash, NOT the slot hash
    (decorrelated so shards stay load-balanced). SoA throughout."""
    from ..ops.hash import unpack_xyz
    x, y, z = unpack_xyz(keys)
    h = ((x >> SUPER_SHIFT) * _OWNER_P1) ^ ((y >> SUPER_SHIFT) * _OWNER_P2) \
        ^ ((z >> SUPER_SHIFT) * _OWNER_P3)
    h = h ^ (h >> 8)
    return (h & jnp.int32(2 ** 30 - 1)) % jnp.int32(n_devices)


def owner_of(bcoords: jax.Array, n_devices: int) -> jax.Array:
    """Coord-space wrapper (tests/debug)."""
    from ..ops.hash import pack_coords
    return owner_of_keys(pack_coords(bcoords), n_devices)


def local_tsdf_config(cfg: TsdfConfig, n_devices: int) -> TsdfConfig:
    """Per-device table config: slots divided across devices."""
    assert cfg.table_slots % n_devices == 0
    return dataclasses.replace(cfg, table_slots=cfg.table_slots // n_devices)


def make_sharded_map(cfg: TsdfConfig, mesh: Mesh) -> tsdf_ops.MapState:
    """Global MapState whose slot axis is sharded over the mesh. Scalar
    fields (frame, counters) are replicated."""
    n = mesh.devices.size
    m = tsdf_ops.make_map(cfg)
    shard = NamedSharding(mesh, P(MAP_AXIS))
    repl = NamedSharding(mesh, P())

    def place(x):
        if x.ndim >= 1 and x.shape[0] == cfg.table_slots:
            return jax.device_put(x, shard)
        return jax.device_put(x, repl)

    return jax.tree.map(place, m)


def _owner_filter(n_devices: int):
    """keys -> keys ownership filter for THIS device (under shard_map)."""
    from ..ops import hash as vhash
    dev = jax.lax.axis_index(MAP_AXIS)

    def kf(keys):
        return jnp.where(owner_of_keys(keys, n_devices) == dev,
                         keys, vhash.EMPTY_KEY)

    return kf


def _psum_counters(m, old_overflow, old_decayed):
    """Counters accumulate per-device deltas; psum them so the scalars stay
    replicated (their out_spec is P())."""
    return m._replace(
        overflow=old_overflow
        + jax.lax.psum(m.overflow - old_overflow, MAP_AXIS),
        decayed_blocks=old_decayed
        + jax.lax.psum(m.decayed_blocks - old_decayed, MAP_AXIS),
    )


def _alloc_exchange(m, depth, T_wc, *, local_cfg: TsdfConfig,
                    intr: Intrinsics, n_devices: int):
    """Owner-routed sharded allocation (runs under shard_map).

    The "replicated" alloc repeats the FULL frame's key-gen and dedupe
    sorts on every shard — with zero-comm ownership filtering, N shards
    divide only the integrate/pool phases (measured eff_weak 0.635,
    SCALING_pinned.json). Here each shard instead:

      1. key-gens its own row slab of the subsampled depth (1/N work;
         slabs overlap at the ragged tail — duplicates dedupe away),
      2. dedupes the slab's keys locally (1/N-sized sort),
      3. routes the unique keys to their owners with ONE (N, cap) int32
         `all_to_all` (~N*32 KB — rides ICI, dwarfed by the sorts saved),
      4. dedupes the received keys (N*cap ≪ k*H*W/s² full key list) and
         inserts into its local table.

    Produces exactly the owned block set of the replicated path: every
    generated key reaches its owner; the final dedupe collapses
    cross-slab duplicates."""
    from ..ops import hash as vhash
    dev = jax.lax.axis_index(MAP_AXIS)
    s = local_cfg.alloc_subsample
    dsub = depth[::s, ::s] if s > 1 else depth
    hs = dsub.shape[0]
    slab = max(1, -(-hs // n_devices))
    row0 = jnp.minimum(dev * slab, hs - slab).astype(jnp.int32)
    dslab = jax.lax.dynamic_slice_in_dim(dsub, row0, slab, axis=0)
    keys = tsdf_ops.touched_block_keys(dslab, T_wc, intr, local_cfg,
                                       row0=row0)
    cap = local_cfg.max_visible_blocks
    uniq, umask, _ = vhash.unique_keys(keys, cap)
    owner = owner_of_keys(uniq, n_devices)
    buckets = jnp.stack([
        jnp.where(umask & (owner == d), uniq, vhash.EMPTY_KEY)
        for d in range(n_devices)])
    recv = jax.lax.all_to_all(buckets, MAP_AXIS, split_axis=0,
                              concat_axis=0)
    uniq2, umask2, total2 = vhash.unique_keys(recv.reshape(-1), cap)
    return tsdf_ops.allocate_keys(m, uniq2, umask2, total2, local_cfg)


def _fuse_local(m, depth, gray, T_wc, *, local_cfg: TsdfConfig,
                intr: Intrinsics, n_devices: int,
                decay_params=None, slide_params=None,
                alloc_mode: str = "exchange"):
    """Per-device fusion body (runs under shard_map)."""
    old_overflow = m.overflow
    old_decayed = m.decayed_blocks
    if alloc_mode == "exchange" and n_devices > 1:
        m, slots, live = _alloc_exchange(
            m, depth, T_wc, local_cfg=local_cfg, intr=intr,
            n_devices=n_devices)
    else:
        m, slots, live = tsdf_ops.allocate_for_frame(
            m, depth, T_wc, intr, local_cfg,
            key_filter=_owner_filter(n_devices))
    color = tsdf_ops.pack_gray(gray)
    m = tsdf_ops.integrate(m, slots, live, depth, color, T_wc, intr,
                           local_cfg)
    if slide_params is not None and slide_params.enabled:
        m = tsdf_ops.slide_window(m, slide_params.max_age)
    if decay_params is not None and decay_params.enabled:
        m = tsdf_ops.decay(m, decay_params.max_decay_weight,
                           decay_params.min_decay_age)
    m = _psum_counters(m, old_overflow, old_decayed)
    return tsdf_ops.advance_frame(m)


def _correct_local(m, db, opt_T, opt_valid, *, cfg: SystemConfig,
                   local_cfg: TsdfConfig, n_devices: int):
    """Per-device online correction (runs under shard_map).

    De-fusion replay is OWNERSHIP-LOCAL: the drift scoring reads only the
    replicated fusion DB (every shard independently agrees on which frames
    to correct), and each shard de-fuses / re-fuses exactly the blocks it
    owns — no communication beyond the counter psum. This shards the
    reference's core novelty (OnlineCorrection, DenseSlam.cpp:298-432)."""
    from ..models.dense_slam import online_correction
    old_overflow = m.overflow
    old_decayed = m.decayed_blocks
    m, db, num = online_correction(
        m, db, opt_T, opt_valid, cfg,
        key_filter=_owner_filter(n_devices), tsdf_cfg=local_cfg)
    m = _psum_counters(m, old_overflow, old_decayed)
    return m, db, num


def _purge_local(m, db, culled, *, cfg: SystemConfig,
                 local_cfg: TsdfConfig, n_devices: int):
    """Per-device culled-keyframe purge (runs under shard_map)."""
    from ..models.dense_slam import purge_culled
    old_overflow = m.overflow
    old_decayed = m.decayed_blocks
    m, db = purge_culled(
        m, db, culled, cfg,
        key_filter=_owner_filter(n_devices), tsdf_cfg=local_cfg)
    m = _psum_counters(m, old_overflow, old_decayed)
    return m, db


def _decay_local(m, max_decay_weight, *, force_all: bool,
                 min_decay_age: int):
    """Per-device decay pass (runs under shard_map). Decay is per-slot —
    no probing, so it shards with zero communication beyond the freed-
    block counter psum."""
    old = m.decayed_blocks
    m = tsdf_ops.decay(m, max_decay_weight, min_decay_age,
                       force_all=force_all)
    return m._replace(
        decayed_blocks=old + jax.lax.psum(m.decayed_blocks - old, MAP_AXIS))


def _raycast_local(m, T_wc, *, local_cfg: TsdfConfig, intr: Intrinsics,
                   splat_params=None):
    """Per-device render + cross-shard min-depth combine (under shard_map).

    Each shard renders only the blocks it owns (splat fast path when
    configured, else the marching raycast); the cross-shard `pmin` of hit
    depths recovers the true nearest surface, exactly as with marching."""
    if splat_params is not None:
        from ..ops import splat as splat_ops
        sc = splat_ops.SplatConfig(
            max_blocks=splat_params.max_blocks,
            max_voxels=splat_params.max_voxels,
            surface_eta=splat_params.surface_eta,
            z_bits=splat_params.z_bits,
            fill_levels=splat_params.fill_levels,
            # NOTE: per-shard bleed suppression would also suppress
            # legitimate cross-shard occlusions (each shard sees only its
            # owned blocks; the true foreground may live on another
            # shard). The pmin combine across shards already keeps the
            # nearest hit, which kills most cross-surface bleed — leave
            # the in-shard override off.
        )
        rc = splat_ops.splat_render(m, T_wc, intr, local_cfg, sc)
    else:
        rc = rc_ops.raycast(m, T_wc, intr, local_cfg)
    big = jnp.float32(1e9)
    d = jnp.where(rc.mask, rc.depth, big)
    d_min = jax.lax.pmin(d, MAP_AXIS)
    hit = d_min < big * 0.5
    depth = jnp.where(hit, d_min, 0.0)
    # winner's color: keep color where this shard won, then pmax-combine
    # (exactly one shard wins each pixel; others contribute zeros)
    mine = hit & (jnp.abs(d - d_min) < 1e-6)
    color = jnp.where(mine[..., None], rc.color, 0.0)
    color = jax.lax.pmax(color, MAP_AXIS)
    # geometry from the combined depth (replicated SoA math on every device)
    h, w = depth.shape
    vv = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    uu = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    cx = (uu - intr.cx) / intr.fx * depth
    cy = (vv - intr.cy) / intr.fy * depth
    R = T_wc[:3, :3]
    t = T_wc[:3, 3]
    px = R[0, 0] * cx + R[0, 1] * cy + R[0, 2] * depth + t[0]
    py = R[1, 0] * cx + R[1, 1] * cy + R[1, 2] * depth + t[1]
    pz = R[2, 0] * cx + R[2, 1] * cy + R[2, 2] * depth + t[2]
    z0 = jnp.zeros_like(px)
    px = jnp.where(hit, px, z0)
    py = jnp.where(hit, py, z0)
    pz = jnp.where(hit, pz, z0)
    nx, ny, nz, _ = rc_ops._normals_soA(px, py, pz, hit)
    points = jnp.stack([px, py, pz], axis=-1)
    normals = jnp.stack([nx, ny, nz], axis=-1)
    return rc_ops.Raycast(depth=depth, points=points, normals=normals,
                          mask=hit, color=color)


class ShardedTsdf:
    """Sharded-map facade mirroring the single-chip MapState ops."""

    def __init__(self, cfg: SystemConfig, mesh: Mesh):
        self.cfg = cfg
        self.mesh = mesh
        self.n = mesh.devices.size
        self.local_cfg = local_tsdf_config(cfg.tsdf, self.n)
        intr = cfg.rig.intr

        mspec = jax.tree.map(
            lambda _: P(MAP_AXIS), tsdf_ops.make_map(self.local_cfg)
        )
        # scalar / replicated fields
        mspec = mspec._replace(
            frame=P(), decayed_blocks=P(), overflow=P()
        )
        self._map_spec = mspec

        fuse = functools.partial(
            _fuse_local, local_cfg=self.local_cfg, intr=intr, n_devices=self.n,
            decay_params=cfg.decay, slide_params=cfg.slide_window,
            alloc_mode=cfg.pipeline.parallel_alloc,
        )
        self.fuse = jax.jit(
            jax.shard_map(
                fuse, mesh=mesh,
                in_specs=(mspec, P(), P(), P()),
                out_specs=mspec,
                # vma checking can't see through pallas_call (the tile
                # sampler); correctness is covered by the equivalence tests
                check_vma=False,
            )
        )
        rc = functools.partial(
            _raycast_local, local_cfg=self.local_cfg, intr=intr,
            splat_params=(cfg.splat if cfg.pipeline.renderer == "splat"
                          else None))
        self.raycast = jax.jit(
            jax.shard_map(
                rc, mesh=mesh,
                in_specs=(mspec, P()),
                out_specs=jax.tree.map(lambda _: P(), rc_ops.Raycast(0, 0, 0, 0, 0)),
                check_vma=False,
            )
        )

        # sharded online correction + culled-keyframe purge: the fusion DB
        # (images + poses) is REPLICATED (P()) — replay work is what shards
        from ..models.dense_slam import FusionDB
        dbspec = FusionDB(depth=P(), gray=P(), T_fused=P(),
                          frame_id=P(), valid=P(), head=P())
        correct = functools.partial(
            _correct_local, cfg=cfg, local_cfg=self.local_cfg,
            n_devices=self.n)
        self.correct = jax.jit(
            jax.shard_map(
                correct, mesh=mesh,
                in_specs=(mspec, dbspec, P(), P()),
                out_specs=(mspec, dbspec, P()),
                check_vma=False,
            )
        )
        purge = functools.partial(
            _purge_local, cfg=cfg, local_cfg=self.local_cfg,
            n_devices=self.n)
        self.purge = jax.jit(
            jax.shard_map(
                purge, mesh=mesh,
                in_specs=(mspec, dbspec, P()),
                out_specs=(mspec, dbspec),
                check_vma=False,
            )
        )
        # sequence-end decay catch-up (DecayCatchup semantics: age gate off)
        self.decay_catchup_step = jax.jit(
            jax.shard_map(
                functools.partial(_decay_local, force_all=True,
                                  min_decay_age=0),
                mesh=mesh,
                in_specs=(mspec, P()),
                out_specs=mspec,
                check_vma=False,
            )
        )

    def make_map(self) -> tsdf_ops.MapState:
        return make_sharded_map(
            dataclasses.replace(self.cfg.tsdf), self.mesh
        )

    def gather_to_single(self, m: tsdf_ops.MapState,
                         as_numpy: bool = False) -> tsdf_ops.MapState:
        """Repack the sharded map into a probe-consistent SINGLE-CHIP
        MapState. The gathered table cannot be used directly: each shard
        hashes keys modulo its LOCAL slot count, so slot positions are
        wrong for global probing. Cold export path (mesh export, composite
        render of a sharded submap) — host-gathers the valid blocks and
        re-inserts their keys into a fresh full-size table with numpy
        (no device scatter program: large drop-mode scatters take
        minutes to compile on the shared TPU compile service)."""
        from ..ops import hash as vhash

        host = jax.device_get(m)
        tab_keys = np.asarray(host.table.keys)
        idx = np.flatnonzero(tab_keys != vhash.EMPTY_KEY)
        cfg = self.cfg.tsdf
        S = cfg.table_slots
        keys = tab_keys[idx]
        # exact slot hash via the op itself (one tiny eager dispatch)
        h = np.asarray(vhash.hash_key(jnp.asarray(keys), S)).astype(np.int64)

        new_keys = np.full(S, vhash.EMPTY_KEY, np.int32)
        slot_of = np.full(len(idx), -1, np.int64)
        pending = np.ones(len(idx), bool)
        for r in range(cfg.probe_len):
            ids = np.flatnonzero(pending)
            if ids.size == 0:
                break
            cand = (h[ids] + r) & (S - 1)
            free = new_keys[cand] == vhash.EMPTY_KEY
            ids, cand = ids[free], cand[free]
            # first pending query per free slot wins this round (keys are
            # globally unique: ownership partitioning admits no duplicates)
            _, first = np.unique(cand, return_index=True)
            win, wc = ids[first], cand[first]
            new_keys[wc] = keys[win]
            slot_of[win] = wc
            pending[win] = False
        dropped = int(pending.sum())
        if dropped:
            import warnings
            warnings.warn(f"gather_to_single: {dropped} blocks exceeded "
                          f"probe_len={cfg.probe_len} and were dropped",
                          stacklevel=2)
        ok = slot_of >= 0
        src, dst = idx[ok], slot_of[ok]

        # as_numpy: keep the repacked map HOST-side (submap demotion on
        # spawn — the demoted map starts life spilled, see
        # DenseSLAM.maybe_spawn_submap)
        conv = (lambda a: np.asarray(a)) if as_numpy else jnp.asarray

        def scat(init, hostarr):
            out = np.asarray(init)
            out[dst] = np.asarray(hostarr)[src]
            return conv(out)

        # host.tsdf already carries the configured storage dtype
        one = np.ones((S, tsdf_ops.BLOCK_VOL), np.asarray(host.tsdf).dtype)
        return tsdf_ops.MapState(
            table=vhash.HashTable(keys=conv(new_keys)),
            tsdf=scat(one, host.tsdf),
            weight=scat(np.zeros_like(one), host.weight),
            color=scat(np.zeros((S, tsdf_ops.BLOCK_VOL), np.int32),
                       host.color),
            alloc_frame=scat(np.zeros((S,), np.int32), host.alloc_frame),
            last_seen=scat(np.zeros((S,), np.int32), host.last_seen),
            frame=conv(np.asarray(host.frame)),
            decayed_blocks=conv(np.asarray(host.decayed_blocks)),
            overflow=conv(np.asarray(host.overflow)),
        )

    def num_blocks(self, m) -> int:
        return int(jnp.sum(m.table.valid.astype(jnp.int32)))

    def memory_bytes(self, m, voxel_bytes: int = 16) -> int:
        return self.num_blocks(m) * voxel_bytes * tsdf_ops.BLOCK_VOL
