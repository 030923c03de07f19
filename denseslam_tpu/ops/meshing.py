"""Mesh extraction from the voxel-hashed TSDF: marching tetrahedra + OBJ.

Equivalent capability to the reference's ITMMeshingEngine behind
`SaveCurrSceneToMesh` (reference use site: src/DenseSLAM/DenseSlam.cpp:
638-643 — marching-cubes OBJ export of the scene).

Design: marching TETRAHEDRA instead of cubes — the 16-case tet table is
derived from first principles in code (1-vs-3 -> one triangle, 2-vs-2 ->
two), so there is no 256-entry magic table to get wrong, and the per-cell
work is uniform (6 tets x <=2 triangles), which suits fixed-shape TPU
batches. Blocks are processed in jitted chunks; triangle soup is compacted
on host and written as OBJ.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TsdfConfig
from . import tsdf as tsdf_ops

# 6-tetrahedra decomposition of the unit cube (indices into the 8 cube
# corners, all sharing the main diagonal 0-7). Corner i has offsets
# ((i>>0)&1, (i>>1)&1, (i>>2)&1) in (x, y, z).
_TETS = np.array(
    [
        [0, 5, 1, 7],
        [0, 1, 3, 7],
        [0, 3, 2, 7],
        [0, 2, 6, 7],
        [0, 6, 4, 7],
        [0, 4, 5, 7],
    ],
    dtype=np.int32,
)

_CUBE_OFFSETS = np.array(
    [[(i >> 0) & 1, (i >> 1) & 1, (i >> 2) & 1] for i in range(8)],
    dtype=np.int32,
)

# Per 4-bit sign case (bit i set = corner i inside, sdf < 0): up to 2
# triangles, each as 3 edges; an edge is a pair (a, b) of tet-corner ids.
# Derived from first principles:
#   1 inside  -> tri over the 3 edges from that corner (a=inside corner)
#   3 inside  -> same as 1 outside, winding flipped
#   2 inside  -> quad over the 4 crossing edges -> 2 triangles
_EDGE_TABLE = np.full((16, 2, 3, 2), -1, dtype=np.int32)


def _build_tet_table() -> None:
    def edges_from(corner, others):
        return [(corner, o) for o in others]

    for case in range(1, 15):
        inside = [i for i in range(4) if case & (1 << i)]
        outside = [i for i in range(4) if not case & (1 << i)]
        if len(inside) == 1:
            a = inside[0]
            e = edges_from(a, outside)
            _EDGE_TABLE[case, 0] = np.array(e)
        elif len(inside) == 3:
            a = outside[0]
            e = edges_from(a, inside)
            # flip winding relative to the 1-inside case
            _EDGE_TABLE[case, 0] = np.array([e[0], e[2], e[1]])
        else:  # 2 vs 2
            a, b = inside
            c, d = outside
            # crossing edges: (a,c) (a,d) (b,c) (b,d); quad a-c, a-d, b-d, b-c
            _EDGE_TABLE[case, 0] = np.array([(a, c), (a, d), (b, d)])
            _EDGE_TABLE[case, 1] = np.array([(a, c), (b, d), (b, c)])


_build_tet_table()


def _mesh_blocks(
    m: tsdf_ops.MapState,
    block_slots: jax.Array,      # (B,) slot ids
    block_mask: jax.Array,       # (B,)
    cfg: TsdfConfig,
):
    """Triangles for a chunk of blocks.

    Returns (verts (B, 512, 6, 2, 3, 3), valid (B, 512, 6, 2)). Cell corners
    are voxel centers; cells on block +faces read neighbour blocks through
    the hash (uniform sample path).
    """
    vsz = cfg.voxel_size_m
    safe = jnp.where(block_mask, block_slots, 0)
    bcoords = m.table.coords[safe]                       # (B, 3)
    offs = tsdf_ops._voxel_offsets()                     # (512, 3)
    # cell base voxel = block voxel coords; corner k at +_CUBE_OFFSETS[k]
    base = bcoords[:, None, :] * tsdf_ops.BLOCK + offs[None]     # (B, 512, 3)
    corners = base[:, :, None, :] + jnp.asarray(_CUBE_OFFSETS)[None, None]
    cpos = (corners.astype(jnp.float32) + 0.5) * vsz     # (B, 512, 8, 3)
    sdf, wgt = tsdf_ops.sample_tsdf_nearest(m, cpos, cfg)
    observed = wgt > 0

    tets = jnp.asarray(_TETS)                            # (6, 4)
    t_sdf = sdf[:, :, tets]                              # (B, 512, 6, 4)
    t_pos = cpos[:, :, tets, :]                          # (B, 512, 6, 4, 3)
    t_obs = jnp.all(observed[:, :, tets], axis=-1)       # (B, 512, 6)

    inside = (t_sdf < 0.0).astype(jnp.int32)
    case = (
        inside[..., 0] + 2 * inside[..., 1]
        + 4 * inside[..., 2] + 8 * inside[..., 3]
    )                                                    # (B, 512, 6)

    table = jnp.asarray(_EDGE_TABLE)                     # (16, 2, 3, 2)
    tri_edges = table[case]                              # (B, 512, 6, 2, 3, 2)
    tri_valid = tri_edges[..., 0, 0] >= 0                # (B, 512, 6, 2)
    ea = jnp.maximum(tri_edges[..., 0], 0)               # (B, 512, 6, 2, 3)
    eb = jnp.maximum(tri_edges[..., 1], 0)

    sa = jnp.take_along_axis(t_sdf[:, :, :, None, :], ea, axis=4)
    sb = jnp.take_along_axis(t_sdf[:, :, :, None, :], eb, axis=4)
    pa = jnp.take_along_axis(
        t_pos[:, :, :, None, :, :], ea[..., None].repeat(3, -1), axis=4
    )
    pb = jnp.take_along_axis(
        t_pos[:, :, :, None, :, :], eb[..., None].repeat(3, -1), axis=4
    )
    denom = sa - sb
    t = jnp.where(jnp.abs(denom) > 1e-9, sa / jnp.where(jnp.abs(denom) > 1e-9, denom, 1.0), 0.5)
    t = jnp.clip(t, 0.0, 1.0)[..., None]
    verts = pa + (pb - pa) * t                           # (B, 512, 6, 2, 3, 3)

    valid = (
        tri_valid
        & t_obs[..., None]
        & block_mask[:, None, None, None]
    )
    return verts, valid


def extract_mesh(m: tsdf_ops.MapState, cfg: TsdfConfig,
                 chunk: int = 512) -> np.ndarray:
    """Extract the full scene mesh as a triangle soup (T, 3, 3) float32."""
    valid_slots = np.flatnonzero(np.asarray(m.table.valid))
    mesh_fn = jax.jit(lambda m, s, k: _mesh_blocks(m, s, k, cfg))
    tris = []
    for i in range(0, len(valid_slots), chunk):
        sl = valid_slots[i : i + chunk]
        pad = chunk - len(sl)
        slots = jnp.asarray(np.pad(sl, (0, pad)), dtype=jnp.int32)
        mask = jnp.asarray(np.pad(np.ones(len(sl), bool), (0, pad)))
        verts, valid = mesh_fn(m, slots, mask)
        v = np.asarray(verts).reshape(-1, 3, 3)
        ok = np.asarray(valid).reshape(-1)
        tris.append(v[ok])
    if not tris:
        return np.zeros((0, 3, 3), np.float32)
    return np.concatenate(tris, axis=0)


def save_obj(path: str, tris: np.ndarray) -> None:
    """Write a triangle soup as OBJ (vertices deduplicated on a 0.1mm grid)."""
    if tris.size == 0:
        with open(path, "w") as f:
            f.write("# empty mesh\n")
        return
    flat = tris.reshape(-1, 3)
    keys = np.round(flat * 1e4).astype(np.int64)
    _, uniq_idx, inv = np.unique(
        keys, axis=0, return_index=True, return_inverse=True
    )
    verts = flat[uniq_idx]
    faces = inv.reshape(-1, 3)
    with open(path, "w") as f:
        f.write(f"# denseslam_tpu mesh: {len(verts)} verts, {len(faces)} tris\n")
        for v in verts:
            f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for a, b, c in faces + 1:
            f.write(f"f {a} {b} {c}\n")
