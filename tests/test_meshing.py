import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from denseslam_tpu.config import tiny_test_config
from denseslam_tpu.io import synthetic
from denseslam_tpu.ops import meshing, tsdf as tsdf_ops


@pytest.fixture(scope="module")
def fused():
    cfg = tiny_test_config()
    m = tsdf_ops.make_map(cfg.tsdf)
    poses = synthetic.make_trajectory(4, step_m=0.06, yaw_rate=0.0)

    @jax.jit
    def fuse(m, depth, T):
        m, slots, mask = tsdf_ops.allocate_for_frame(m, depth, T, cfg.rig.intr, cfg.tsdf)
        m = tsdf_ops.integrate(m, slots, mask, depth, None, T, cfg.rig.intr, cfg.tsdf)
        return tsdf_ops.advance_frame(m)

    for i in range(4):
        T = jnp.asarray(poses[i])
        _, depth = synthetic.render_view(T, cfg.rig.intr)
        m = fuse(m, depth, T)
    return cfg, m


def test_mesh_on_surface(fused):
    cfg, m = fused
    tris = meshing.extract_mesh(m, cfg.tsdf)
    assert tris.shape[0] > 500, tris.shape
    # vertices must lie near a scene surface
    scene = synthetic.default_scene()
    centers = np.asarray(scene.sphere_centers)
    radii = np.asarray(scene.sphere_radii)
    v = tris.reshape(-1, 3)
    dists = [np.abs(np.linalg.norm(v - c, axis=-1) - r) for c, r in zip(centers, radii)]
    dists.append(np.abs(v[:, 1] - scene.plane_y))
    dists.append(np.abs(v[:, 2] - scene.wall_z))
    d = np.min(np.stack(dists), axis=0)
    # within ~1.5 voxels for the vast majority
    assert np.median(d) < 0.05, np.median(d)
    assert np.quantile(d, 0.95) < 0.12, np.quantile(d, 0.95)
    # triangle edge lengths bounded by cell size
    e = np.linalg.norm(tris[:, [1, 2, 0]] - tris, axis=-1)
    assert e.max() < cfg.tsdf.voxel_size_m * 2.0


def test_mesh_empty_map():
    cfg = tiny_test_config()
    m = tsdf_ops.make_map(cfg.tsdf)
    tris = meshing.extract_mesh(m, cfg.tsdf)
    assert tris.shape[0] == 0


def test_save_obj(fused, tmp_path):
    cfg, m = fused
    tris = meshing.extract_mesh(m, cfg.tsdf)
    p = str(tmp_path / "scene.obj")
    meshing.save_obj(p, tris)
    text = open(p).read().splitlines()
    nv = sum(1 for l in text if l.startswith("v "))
    nf = sum(1 for l in text if l.startswith("f "))
    assert nf == tris.shape[0]
    assert 0 < nv <= 3 * nf
    # faces index valid vertices
    for l in text[:50]:
        if l.startswith("f "):
            idx = [int(x) for x in l.split()[1:]]
            assert all(1 <= i <= nv for i in idx)
