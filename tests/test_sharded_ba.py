import jax
import jax.numpy as jnp
import numpy as np

from denseslam_tpu.config import tiny_test_config
from denseslam_tpu.ops import ba
from denseslam_tpu.parallel import ba as pba
from denseslam_tpu.parallel import mesh as mesh_lib
from denseslam_tpu.utils import lie
from tests.test_backend_ops import make_ba_problem


def test_sharded_ba_matches_single(rng):
    """Distributed Schur BA must produce the same result as the single-device
    solve — same math, landmark contributions psum'ed."""
    cfg = tiny_test_config(width=320, height=240, baseline_m=0.2)
    problem, T_gt, pts_gt = make_ba_problem(rng, K=4, L=64, rig=cfg.rig)

    res_single = ba.solve(problem, cfg.rig, cfg.backend)

    mesh = mesh_lib.make_map_mesh(8)
    solver = pba.make_sharded_solver(mesh, cfg.rig, cfg.backend)
    res_sharded = solver(problem)

    np.testing.assert_allclose(
        np.asarray(res_sharded.T_wc), np.asarray(res_single.T_wc), atol=5e-4
    )
    np.testing.assert_allclose(
        float(res_sharded.final_cost), float(res_single.final_cost),
        rtol=0.05, atol=1.0,
    )
    assert int(res_sharded.num_obs) == int(res_single.num_obs)
    # and it actually solves the problem
    for k in range(T_gt.shape[0]):
        err = float(lie.pose_error_weighted(res_sharded.T_wc[k], jnp.asarray(T_gt[k])))
        assert err < 3e-3, (k, err)
