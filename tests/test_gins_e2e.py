"""End-to-end GNSS/INS replay: initialization + sliding-window estimation."""

import numpy as np
import pytest

from gins_data import make_gins_dataset
from ic_gvins_tpu.engine.config import GvinsConfig, parse_config
from ic_gvins_tpu.models.gins import GinsModel


@pytest.fixture(scope="module")
def gins_run(tmp_path_factory):
    imu_data, gnss_data, truth = make_gins_dataset()
    outdir = str(tmp_path_factory.mktemp("gins_out"))
    cfg = parse_config(
        dict(
            initlength=3,
            imudatarate=200,
            iswithearth=False,
            antlever=list(truth["lever"]),
            imumodel=dict(arw=0.1, vrw=0.1, gbstd=400.0, abstd=400.0, corrtime=1.0),
            gnssthreshold=20,
            optimize_windows_size=10,
        )
    )
    model = GinsModel(cfg, outdir=outdir)
    traj = model.run(imu_data, gnss_data)
    return model, traj, truth, outdir


def test_initializes(gins_run):
    model, traj, truth, _ = gins_run
    assert model.state == "INITIALIZING_INS"
    assert len(traj) > 10


def test_trajectory_accuracy(gins_run):
    """Node position estimates track ground truth to GNSS-noise level."""
    model, traj, truth, _ = gins_run
    rate = 200.0
    # the model's local frame is anchored at the first GNSS antenna fix;
    # truth positions are in the generator's frame -> constant offset
    offset = truth["gnss_local"][0]
    errs = []
    for row in traj[2:]:
        t, p = row[0], row[1:4]
        i = int(round(t * rate)) - 1
        errs.append(np.linalg.norm(p + offset - truth["p"][i]))
    errs = np.asarray(errs)
    assert errs.mean() < 0.08, f"mean pos err {errs.mean():.3f} m"
    assert errs.max() < 0.30, f"max pos err {errs.max():.3f} m"


def test_bias_estimation(gins_run):
    """Gyro bias converges toward the injected truth. The z component is
    only weakly observable in GNSS/INS-only mode on this near-planar
    trajectory (heading couples to it), so it gets a looser gate."""
    model, traj, truth, _ = gins_run
    bg_est = model.est.mixes[model.est.n_nodes - 1, 3:6]
    np.testing.assert_allclose(bg_est[:2], [0.002, -0.001], atol=1e-3)
    np.testing.assert_allclose(bg_est[2], 0.0005, atol=4e-3)


def test_output_files(gins_run):
    model, traj, truth, outdir = gins_run
    import os

    nav = np.loadtxt(os.path.join(outdir, "gvins.nav"))
    assert nav.shape[1] == 11
    assert len(nav) > 100
    trajcsv = np.loadtxt(os.path.join(outdir, "trajectory.csv"))
    assert trajcsv.shape[1] == 8
    # IMU_ERR.bin: 8 doubles per record
    raw = np.fromfile(os.path.join(outdir, "IMU_ERR.bin"), dtype=np.float64)
    assert len(raw) % 8 == 0 and len(raw) > 0
    # nav latitude deg near origin
    assert abs(nav[0, 2] - 30.5) < 0.01


def test_long_gnss_gap_chains_nodes():
    """A GNSS gap longer than the fixed preintegration segment capacity must
    chain intermediate time nodes (the reference bounds preintegration spans
    via MAXIMUM_PREINTEGRATION_LENGTH, ic_gvins.h:134-136) and keep the
    estimate healthy once fixes resume."""
    imu_data, gnss_data, truth = make_gins_dataset()
    cfg = parse_config(
        dict(
            initlength=3,
            imudatarate=200,
            iswithearth=False,
            antlever=list(truth["lever"]),
            imumodel=dict(arw=0.1, vrw=0.1, gbstd=400.0, abstd=400.0, corrtime=1.0),
            gnssthreshold=20,
            optimize_windows_size=10,
        )
    )
    # drop fixes in (8 s, 16 s): an 8 s gap = 1600 samples > 512-slot segment
    g = {k: np.array(v, copy=True) for k, v in gnss_data.items()}
    keep = ~((g["time"] > 8.0) & (g["time"] < 16.0))
    g = {k: v[keep] for k, v in g.items()}

    model = GinsModel(cfg)
    traj = model.run(imu_data, g)
    assert model.state == "INITIALIZING_INS"

    rate, offset = 200.0, truth["gnss_local"][0]
    errs = []
    for row in traj:
        t, p = row[0], row[1:4]
        i = int(round(t * rate)) - 1
        if t > 17.0 and 0 <= i < len(truth["p"]):
            errs.append(np.linalg.norm(p + offset - truth["p"][i]))
    errs = np.asarray(errs)
    assert len(errs) >= 4
    # after re-acquisition the solution recovers to GNSS-noise level
    assert errs[-4:].mean() < 0.15, f"post-outage err {errs[-4:].mean():.3f} m"


def test_odo_replay_converges():
    """GNSS/INS + wheel odometer replay (ODO preintegration variant): the
    19-res factors and the 10-dim mix block (sodo) are live in the window
    solve (preintegration.h:32-119, preintegration_odo.cc:27-305) and the
    wheel-scale error is estimated."""
    scale_err = 0.01
    imu_data, gnss_data, truth = make_gins_dataset(
        with_odo=True, odo_scale_err=scale_err)
    cfg = parse_config(
        dict(
            initlength=3,
            imudatarate=200,
            iswithearth=False,
            antlever=list(truth["lever"]),
            imumodel=dict(arw=0.1, vrw=0.1, gbstd=400.0, abstd=400.0, corrtime=1.0),
            gnssthreshold=20,
            optimize_windows_size=10,
            isuseodo=True,
            # tight forward, loose lateral/vertical: the synthetic world has
            # real sideslip (~0.1 m/s) the wheel cannot observe
            odometer=dict(std=[0.02, 0.5, 0.5], srw=1000.0,
                          abv=[0.0, 0.0, 0.0], lodo=[0.0, 0.0, 0.0]),
        )
    )
    model = GinsModel(cfg)
    traj = model.run(imu_data, gnss_data)
    assert model.est is not None and model.est.wcfg.with_odo
    assert model.est.mixes.shape[1] == 10

    rate = 200.0
    offset = truth["gnss_local"][0]
    errs = []
    for row in traj[2:]:
        t, p = row[0], row[1:4]
        i = int(round(t * rate)) - 1
        errs.append(np.linalg.norm(p + offset - truth["p"][i]))
    errs = np.asarray(errs)
    assert errs.mean() < 0.08, f"mean pos err {errs.mean():.3f} m"

    # wheel-scale estimate moves toward the injected error (sodo prior std
    # is 0.005 — ic_gvins.cc:1917 — so full recovery isn't expected in 24 s)
    sodo = float(model.est.mixes[model.est.n_nodes - 1, 9])
    assert 0.2 * scale_err < sodo < 3.0 * scale_err, f"sodo {sodo:.5f}"


def test_earth_enabled_replay():
    """iswithearth=true is the reference's SHIPPED configuration
    (/root/reference/config/gvins.yaml:18): the earth-aware preintegration
    (preintegration_earth.cc:205-324) and the iewn feedback loop
    (ic_gvins.cc:673-691 + mechanization) run through the full estimator —
    initialization, window solves, marginalization — on an earth-consistent
    synthetic world, with the same accuracy bounds as the earth-free replay."""
    imu_data, gnss_data, truth = make_gins_dataset(with_earth=True)
    cfg = parse_config(
        dict(
            initlength=3,
            imudatarate=200,
            iswithearth=True,
            antlever=list(truth["lever"]),
            imumodel=dict(arw=0.1, vrw=0.1, gbstd=400.0, abstd=400.0, corrtime=1.0),
            gnssthreshold=20,
            optimize_windows_size=10,
        )
    )
    model = GinsModel(cfg)
    traj = model.run(imu_data, gnss_data)
    assert model.state == "INITIALIZING_INS"
    assert model.est.wcfg.with_earth

    rate, offset = 200.0, truth["gnss_local"][0]
    errs = []
    for row in traj[2:]:
        t, p = row[0], row[1:4]
        i = int(round(t * rate)) - 1
        errs.append(np.linalg.norm(p + offset - truth["p"][i]))
    errs = np.asarray(errs)
    assert errs.mean() < 0.08, f"mean pos err {errs.mean():.3f} m"
    assert errs.max() < 0.30, f"max pos err {errs.max():.3f} m"

    bg_est = model.est.mixes[model.est.n_nodes - 1, 3:6]
    np.testing.assert_allclose(bg_est[:2], [0.002, -0.001], atol=1e-3)


def test_earth_odo_replay():
    """EARTH_ODO: the combined variant (preintegration_earth_odo.cc:240-291)
    solves in the window — 19-res factors with earth-rate compensation and a
    live sodo column — on an earth-consistent world with wheel increments."""
    scale_err = 0.01
    imu_data, gnss_data, truth = make_gins_dataset(
        with_earth=True, with_odo=True, odo_scale_err=scale_err)
    cfg = parse_config(
        dict(
            initlength=3,
            imudatarate=200,
            iswithearth=True,
            antlever=list(truth["lever"]),
            imumodel=dict(arw=0.1, vrw=0.1, gbstd=400.0, abstd=400.0, corrtime=1.0),
            gnssthreshold=20,
            optimize_windows_size=10,
            isuseodo=True,
            odometer=dict(std=[0.02, 0.5, 0.5], srw=1000.0,
                          abv=[0.0, 0.0, 0.0], lodo=[0.0, 0.0, 0.0]),
        )
    )
    model = GinsModel(cfg)
    traj = model.run(imu_data, gnss_data)
    assert model.est.wcfg.with_earth and model.est.wcfg.with_odo
    assert model.est.mixes.shape[1] == 10

    rate, offset = 200.0, truth["gnss_local"][0]
    errs = []
    for row in traj[2:]:
        t, p = row[0], row[1:4]
        i = int(round(t * rate)) - 1
        errs.append(np.linalg.norm(p + offset - truth["p"][i]))
    errs = np.asarray(errs)
    assert errs.mean() < 0.08, f"mean pos err {errs.mean():.3f} m"

    sodo = float(model.est.mixes[model.est.n_nodes - 1, 9])
    assert 0.2 * scale_err < sodo < 3.0 * scale_err, f"sodo {sodo:.5f}"


def test_dual_antenna_yaw_initialization():
    """With isyawvalid set, the init heading comes from the GNSS yaw field
    (ic_gvins.cc:631-633), not from the velocity direction."""
    imu_data, gnss_data, truth = make_gins_dataset()
    cfg = parse_config(
        dict(
            initlength=3,
            imudatarate=200,
            iswithearth=False,
            antlever=list(truth["lever"]),
            imumodel=dict(arw=0.1, vrw=0.1, gbstd=400.0, abstd=400.0, corrtime=1.0),
            gnssthreshold=20,
            optimize_windows_size=10,
        )
    )
    g = {k: np.array(v, copy=True) for k, v in gnss_data.items()}
    n = len(g["time"])
    yaw_injected = 0.17
    g["yaw"] = np.full(n, yaw_injected)
    g["isyawvalid"] = np.ones(n, bool)

    model = GinsModel(cfg)
    model.run(imu_data, g)
    assert model.est is not None, "did not initialize"
    assert abs(model._initatt[2] - yaw_injected) < 1e-12

    # control: without the yaw columns the heading comes from velocity
    model2 = GinsModel(cfg)
    model2.run(imu_data, gnss_data)
    assert model2.est is not None
    assert abs(model2._initatt[2] - yaw_injected) > 0.01
