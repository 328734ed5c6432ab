"""Multi-chip layer: sharded batched solves on the virtual 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np

import __graft_entry__ as ge
from ic_gvins_tpu.parallel import mesh as pmesh
from ic_gvins_tpu.solver import lm
from ic_gvins_tpu.solver.problem import WindowConfig


def test_sharded_matches_single():
    n_dev = len(jax.devices())
    assert n_dev == 8, f"conftest should give 8 virtual cpu devices, got {n_dev}"
    cfg = WindowConfig(N=4, L=16, G=4, R=32, with_earth=False)
    params_b, tables_b = ge._make_problem(cfg, batch=n_dev)

    m = pmesh.make_mesh()
    jitted, place = pmesh.sharded_two_pass(m, cfg, num_iterations=4)
    out_params, _ = jitted(place(params_b), place(tables_b))

    from ic_gvins_tpu.solver.problem import total_cost

    # _make_problem(batch=n) builds a DISTINCT problem per element
    # (identical broadcast shards cannot catch cross-device indexing bugs):
    # each shard must match ITS OWN single-device solve
    for k in range(n_dev):
        p1, t1 = ge._make_problem(cfg, seed=k)
        ref, _, _ = lm.solve_two_pass(p1, t1, cfg, 4)
        np.testing.assert_allclose(
            # f32 rounding in the mixed-precision assembly (one-hot MXU
            # contractions) differs between the vmapped and single paths;
            # LM's accept/reject branching amplifies the bit-divergence to
            # ~1e-5 on the poses after a few iterations
            np.asarray(out_params.poses[k]), np.asarray(ref.poses), atol=2e-4
        )
        # both paths land in the same optimum basin: after only 4 LM
        # iterations the accept/reject branching can diverge by one step
        # between the vmapped and single paths (observed rel diff ~1.4e-3,
        # the sharded solve slightly AHEAD), so the cost check is a basin
        # check, not a bitwise one
        c_ref = float(total_cost(ref, t1, cfg))
        p_k = jax.tree_util.tree_map(lambda a: a[k], out_params)
        c_shard = float(total_cost(p_k, t1, cfg))
        np.testing.assert_allclose(c_shard, c_ref, rtol=5e-3, atol=1e-9)
    # actually sharded over the mesh
    assert len(out_params.poses.sharding.device_set) == n_dev
