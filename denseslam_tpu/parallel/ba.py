"""Distributed Schur-complement bundle adjustment over a device mesh.

Landmarks (and their observations) shard across the `map` axis; camera-side
aggregates — U blocks, the Schur complement S = U - W V^-1 W^T, gradients,
costs — ride the interconnect as `psum`s of (6K, 6K)-sized tensors, while
every landmark block (V, V^-1, dx_p) stays device-local. The reduced camera
solve is replicated. See ops/ba.py `axis_name` for where the collectives
land. This realises BASELINE.json's "distributed bundle adjustment via
Schur-complement reduction of the camera-point system over ICI/DCN
collectives".
"""

from __future__ import annotations

import functools

import jax
from jax.sharding import Mesh, PartitionSpec as P

from ..config import BackendConfig
from ..ops import ba
from ..utils.camera import StereoRig
from .mesh import MAP_AXIS


def make_sharded_solver(mesh: Mesh, rig: StereoRig, cfg: BackendConfig):
    """Returns a jitted solver taking a BAProblem whose landmark-indexed
    arrays are sharded over the `map` axis (L must divide the mesh size)."""
    in_spec = ba.BAProblem(
        T_wc=P(),
        points_w=P(MAP_AXIS),
        obs=P(MAP_AXIS),
        obs_mask=P(MAP_AXIS),
        fixed=P(),
        point_valid=P(MAP_AXIS),
    )
    out_spec = ba.BAResult(
        T_wc=P(),
        points_w=P(MAP_AXIS),
        initial_cost=P(),
        final_cost=P(),
        num_obs=P(),
    )
    body = functools.partial(ba.solve, rig=rig, cfg=cfg, axis_name=MAP_AXIS)
    return jax.jit(
        jax.shard_map(body, mesh=mesh, in_specs=(in_spec,), out_specs=out_spec)
    )
