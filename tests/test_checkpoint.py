"""Checkpoint/resume: estimator state round-trips bit-for-bit."""

import numpy as np
import jax.numpy as jnp

import synthetic as syn
from ic_gvins_tpu.core import quaternion as quat
from ic_gvins_tpu.core.types import NavState
from ic_gvins_tpu.engine.checkpoint import load_checkpoint, save_checkpoint
from ic_gvins_tpu.engine.estimator import SlidingWindowEstimator
from ic_gvins_tpu.solver.problem import WindowConfig


def build_estimator(seed=0):
    wcfg = WindowConfig(N=6, L=8, G=6, R=8, with_earth=False)
    est = SlidingWindowEstimator(wcfg, syn.default_params(), preint_samples=128,
                                 antlever=np.array([0.1, 0.0, 0.2]))
    rng = np.random.default_rng(seed)
    imu = syn.smooth_imu(201, 0.005, seed=seed)
    st0 = NavState.identity()._replace(v=jnp.asarray(rng.normal(0, 1, 3)))
    est.reset_first_node(0.0, st0)
    est.set_prior(np.concatenate([np.asarray(st0.p), np.asarray(st0.q)]),
                  np.full(6, 0.1), np.zeros(9), np.full(9, 0.1))
    for k in range(3):
        a, b = k * 60, (k + 1) * 60
        series = {f: np.asarray(getattr(imu, f))[a:b + 1] for f in imu._fields}
        est.add_time_node(float(imu.time[b]), series)
        est.add_gnss(float(imu.time[b]), est.poses[est.n_nodes - 1, :3], np.full(3, 0.1))
    return est, wcfg


def test_roundtrip(tmp_path):
    est, wcfg = build_estimator()
    est.optimize(num_iterations=10)
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, est, extra=dict(stream_cursor=1234))

    est2 = SlidingWindowEstimator(wcfg, syn.default_params(), preint_samples=128,
                                  antlever=np.array([0.1, 0.0, 0.2]))
    extra = load_checkpoint(path, est2)
    assert int(extra["stream_cursor"]) == 1234
    assert est2.n_nodes == est.n_nodes
    np.testing.assert_array_equal(est2.poses, est.poses)
    np.testing.assert_array_equal(est2.mixes, est.mixes)
    np.testing.assert_array_equal(
        np.asarray(est2.preint_table.summ.dp), np.asarray(est.preint_table.summ.dp)
    )
    assert len(est2.gnss_entries) == len(est.gnss_entries)

    # resumed estimator continues identically: one more optimize on both
    p1, _, s1 = est.optimize(num_iterations=5)
    p2, _, s2 = est2.optimize(num_iterations=5)
    np.testing.assert_allclose(np.asarray(p1.poses), np.asarray(p2.poses), atol=0)
    assert float(s1.final_cost) == float(s2.final_cost)
