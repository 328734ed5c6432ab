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
