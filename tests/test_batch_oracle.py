"""Chained-estimator accuracy oracle: sliding window + marginalization vs
the full-history batch optimum.

The strongest Ceres-parity check available offline (VERDICT round 4 #6):
replay a synthetic GNSS/INS world through the GINS model with a SMALL
window (several marginalization events — gvinsMarginalization,
ic_gvins.cc:1412-1678), then re-solve the SAME measurement history (all
nodes, all GNSS factors, all preintegrations re-linearized at the replay's
estimates, the same init priors) as ONE batch problem with no
marginalization, in f64 on CPU. The final window's node states — which
have seen every measurement, with older information carried only through
the chain of marginalization priors — must match the batch MAP estimate to
within the priors' linearization error, i.e. millimetres, not the
decimetre-level e2e gates.

This pins the marginalization CHAIN (Schur reduction, prior remapping on
window shifts, c0/gradient bookkeeping over many events), which the
single-event gates in test_marginalization.py cannot see.
"""

import numpy as np
import pytest

from gins_data import make_gins_dataset

from ic_gvins_tpu.engine.config import parse_config
from ic_gvins_tpu.engine.estimator import SlidingWindowEstimator
from ic_gvins_tpu.engine.replay import ImuStream
from ic_gvins_tpu.models.gins import GinsModel
from ic_gvins_tpu.solver.problem import WindowConfig


@pytest.mark.slow
def test_sliding_window_matches_batch_optimum():
    imu_data, gnss_data, truth = make_gins_dataset(with_earth=False)
    # 16 s: alignment at t=4, ~11 estimation nodes, window N=7 -> ~7
    # marginalization events before the replay ends
    cut = int(16.0 * 200)
    imu_data = {k: np.asarray(v)[:cut] for k, v in imu_data.items()}
    gnss_data = {k: np.asarray(v)[:15] for k, v in gnss_data.items()}

    cfg = parse_config(dict(
        initlength=3, imudatarate=200, iswithearth=False,
        antlever=list(truth["lever"]),
        imumodel=dict(arw=0.1, vrw=0.1, gbstd=400.0, abstd=400.0, corrtime=1.0),
        gnssthreshold=20, optimize_windows_size=5,
    ))

    model = GinsModel(cfg, window_nodes=7)

    # capture: every node time ever created, the per-node IMU series key,
    # and the init prior (cleared from the estimator when absorbed)
    node_times = []
    captured = {}

    def run_with_capture():
        orig_add = SlidingWindowEstimator.add_time_node
        orig_reset = SlidingWindowEstimator.reset_first_node
        orig_prior = SlidingWindowEstimator.set_prior

        def add_time_node(est, time, series):
            node_times.append(float(time))
            return orig_add(est, time, series)

        def reset_first_node(est, time, state):
            node_times.append(float(time))
            captured["state0"] = state
            captured["t0"] = float(time)
            return orig_reset(est, time, state)

        def set_prior(est, pose_prior, pose_std, mix_prior, mix_std):
            captured["prior"] = (np.array(pose_prior), np.array(pose_std),
                                 np.array(mix_prior), np.array(mix_std))
            return orig_prior(est, pose_prior, pose_std, mix_prior, mix_std)

        SlidingWindowEstimator.add_time_node = add_time_node
        SlidingWindowEstimator.reset_first_node = reset_first_node
        SlidingWindowEstimator.set_prior = set_prior
        try:
            model.run(imu_data, gnss_data)
        finally:
            SlidingWindowEstimator.add_time_node = orig_add
            SlidingWindowEstimator.reset_first_node = orig_reset
            SlidingWindowEstimator.set_prior = orig_prior

    run_with_capture()
    est = model.est
    assert est is not None and est.n_nodes >= 5
    n_margs = len(node_times) - est.n_nodes
    assert n_margs >= 4, f"want several marginalizations, got {n_margs}"

    # ---- batch problem over the FULL history ----
    n_all = len(node_times)
    wcfg_b = WindowConfig(N=n_all + 1, L=8, G=n_all + 1, R=8,
                          with_earth=False, with_odo=False)
    batch = SlidingWindowEstimator(
        wcfg_b, model.int_params, preint_samples=cfg.preint_samples,
        antlever=cfg.antlever, origin=model.origin)
    batch.reset_first_node(captured["t0"], captured["state0"])
    batch.set_prior(*captured["prior"])

    stream = ImuStream(imu_data)
    for t in node_times[1:]:
        batch.add_time_node(
            t, stream.series(batch.times[batch.n_nodes - 1], t))

    # the replay's GNSS history: every fix at a node time (the first fix
    # defined the origin, so global2local maps it to ~zeros exactly as the
    # model's ingest did)
    from ic_gvins_tpu.core import earth_np
    node_set = {round(x, 6) for x in node_times}
    for k in range(len(gnss_data["time"])):
        t = float(gnss_data["time"][k])
        if t < captured["t0"] - 1e-9 or round(t, 6) not in node_set:
            continue
        blh_local = earth_np.global2local(model.origin, gnss_data["blh"][k])
        batch.add_gnss(t, blh_local, gnss_data["std"][k])

    # seed the batch at the replay's final estimates where available (the
    # final window), propagated states elsewhere; then re-linearize the
    # preintegrations at the seeded biases and solve to convergence
    for k in range(est.n_nodes):
        t = est.times[k]
        j = int(np.argmin(np.abs(np.asarray(batch.times[:batch.n_nodes]) - t)))
        if abs(batch.times[j] - t) < 1e-6:
            batch.poses[j] = est.poses[k]
            batch.mixes[j] = est.mixes[k]
    batch.reintegrate_if_needed()
    batch.optimize(num_iterations=120)
    batch.reintegrate_if_needed()
    batch.optimize(num_iterations=120)

    # ---- compare the final window against the batch optimum ----
    errs_p, errs_v = [], []
    for k in range(1, est.n_nodes):  # node 0 of the window is prior-pinned
        t = est.times[k]
        j = int(np.argmin(np.abs(np.asarray(batch.times[:batch.n_nodes]) - t)))
        assert abs(batch.times[j] - t) < 1e-6
        errs_p.append(np.linalg.norm(est.poses[k, :3] - batch.poses[j, :3]))
        errs_v.append(np.linalg.norm(est.mixes[k, :3] - batch.mixes[j, :3]))
    errs_p = np.asarray(errs_p)
    errs_v = np.asarray(errs_v)

    # linearization-error bound: the prior chain carries ~7 first-order
    # re-linearizations; measured headroom ~2x below the gates
    assert errs_p.max() < 5e-3, f"pos err vs batch optimum {errs_p}"
    assert errs_v.max() < 5e-3, f"vel err vs batch optimum {errs_v}"

    # bias agreement at the newest node. Gyro-z and the accel biases are
    # only weakly observable in this near-planar trajectory (the cost
    # valley along them is nearly flat), so the batch optimum can sit
    # ~1e-3 away while every strongly-observed quantity (pos/vel above,
    # gyro-xy here) agrees to its linearization error; measured ~9e-4 on
    # the weak components, ~3e-6 on gyro-xy, invariant (to 1e-8) under
    # marginalization solver details (one vs two Newton correction steps).
    dbias = np.abs(est.mixes[est.n_nodes - 1, 3:9]
                   - batch.mixes[j, 3:9])
    assert dbias[:2].max() < 2e-5, f"gyro-xy err vs batch {dbias}"
    assert dbias.max() < 1.5e-3, f"bias err vs batch {dbias}"
