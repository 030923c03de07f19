"""System checkpoint/resume.

The reference has NO state checkpointing (SURVEY.md section 5 — the closest
thing is the GPU->host swapping engine); this is a new capability: the whole
SLAM state (map pytree, fusion DB, frontend state, pose history) serialises
to one .npz and restores bit-exact.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _flatten_with_paths(tree: Any, prefix: str) -> Dict[str, np.ndarray]:
    flat = {}
    leaves, treedef = jax.tree.flatten(tree)
    for i, leaf in enumerate(leaves):
        arr = np.asarray(leaf)
        key = f"{prefix}/{i}"
        if arr.dtype.name == "bfloat16":
            # npz can't serialise ml_dtypes; store raw bits under a marked
            # key so load can't misread them as integer data.
            arr = arr.view(np.uint16)
            key += ":bf16"
        flat[key] = arr
    return flat


def _unflatten_like(template: Any, data: Dict[str, np.ndarray],
                    prefix: str) -> Any:
    leaves, treedef = jax.tree.flatten(template)
    new_leaves = []
    for i, leaf in enumerate(leaves):
        key = f"{prefix}/{i}"
        if key in data:
            arr = data[key]
        elif key + ":bf16" in data:
            import ml_dtypes
            arr = data[key + ":bf16"].view(ml_dtypes.bfloat16)
        else:
            raise KeyError(f"checkpoint missing leaf {key}")
        if hasattr(leaf, "dtype") and arr.dtype != leaf.dtype:
            # checkpoint written under a different storage_dtype: convert
            # through float (values, not bits) so the map stays valid
            arr = arr.astype(leaf.dtype)
        new_leaves.append(jnp.asarray(arr) if isinstance(leaf, jax.Array) else arr)
    return jax.tree.unflatten(treedef, new_leaves)


def save_slam_checkpoint(path: str, slam) -> None:
    """Serialise a DenseSLAM instance's dynamic state — EVERY submap with
    its fusion DB and alignment poses, plus frontend state and history."""
    flat: Dict[str, np.ndarray] = {}
    sm = slam.submaps
    s = sm.num_local_maps
    flat["meta/num_submaps"] = np.asarray(s)
    flat["meta/global_poses"] = np.stack(sm.global_poses)
    flat["meta/spawn_poses"] = np.stack(sm.spawn_poses)
    flat["meta/anchor_frames"] = np.asarray(sm.anchor_frames)
    for si in range(s):
        # "map"/"db" (no index) = submap 0 keeps the legacy layout
        sfx = "" if si == 0 else str(si)
        flat.update(_flatten_with_paths(sm.maps[si], "map" + sfx))
        flat.update(_flatten_with_paths(sm.dbs[si], "db" + sfx))
        pend = sm.pending_corrections[si]
        if pend:  # corrections deferred while spilled must survive resume
            flat[f"meta/pend_frames{si}"] = np.asarray(
                sorted(pend.keys()), np.int64)
            flat[f"meta/pend_poses{si}"] = np.stack(
                [pend[f][0] for f in sorted(pend.keys())])
            flat[f"meta/pend_errs{si}"] = np.asarray(
                [pend[f][1] for f in sorted(pend.keys())], np.float64)
    flat.update(_flatten_with_paths(slam.fe_state, "fe"))
    flat["meta/frame"] = np.asarray(slam.frame)
    flat["meta/keyframes"] = np.asarray(slam.current_keyframes)
    if slam.pose_history:
        flat["meta/pose_frames"] = np.asarray([p[0] for p in slam.pose_history])
        flat["meta/pose_mats"] = np.stack([p[1] for p in slam.pose_history])
    np.savez_compressed(path, **flat)


def load_slam_checkpoint(path: str, slam) -> None:
    """Restore into a freshly-constructed DenseSLAM with the same config."""
    data = dict(np.load(path, allow_pickle=False))
    sm = slam.submaps
    s = int(data.get("meta/num_submaps", 1))
    while sm.num_local_maps < s:
        sm.create_new(np.eye(4, dtype=np.float32))
    for si in range(s):
        sfx = "" if si == 0 else str(si)
        sm.maps[si] = _unflatten_like(sm.maps[si], data, "map" + sfx)
        sm.dbs[si] = _unflatten_like(sm.dbs[si], data, "db" + sfx)
        if f"meta/pend_frames{si}" in data:
            fids = data[f"meta/pend_frames{si}"]
            Ts = data[f"meta/pend_poses{si}"]
            # pre-r5 checkpoints carry no stash errors: treat as large so
            # the replay trigger fires (the conservative direction)
            errs = data.get(f"meta/pend_errs{si}",
                            np.full(len(fids), np.inf))
            sm.pending_corrections[si] = {
                int(f): (T, float(e)) for f, T, e in zip(fids, Ts, errs)}
        else:
            sm.pending_corrections[si] = {}
    if "meta/global_poses" in data:
        sm.global_poses = list(data["meta/global_poses"])
        sm.spawn_poses = list(data["meta/spawn_poses"])
        sm.anchor_frames = [int(a) for a in data["meta/anchor_frames"]]
    slam.fe_state = _unflatten_like(slam.fe_state, data, "fe")
    slam.frame = int(data["meta/frame"])
    slam.current_keyframes = int(data["meta/keyframes"])
    slam.pose_history = []
    if "meta/pose_frames" in data:
        for f, T in zip(data["meta/pose_frames"], data["meta/pose_mats"]):
            slam.pose_history.append((int(f), T))
