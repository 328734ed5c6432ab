"""Native + fallback dataset loaders: parsing, gap-fill, unit conversion."""

import numpy as np
import pytest

from ic_gvins_tpu.io import dataset


@pytest.fixture
def imu_file(tmp_path):
    rows = []
    t = 0.0
    for k in range(100):
        t += 0.005
        if k == 50:
            t += 0.02  # 4 lost samples
        rows.append([t, 0.001, -0.002, 0.0005, 0.01, -0.049, -0.049])
    p = tmp_path / "imu.txt"
    np.savetxt(p, rows, fmt="%.9f")
    return str(p)


def _check_imu(imu):
    assert len(imu["time"]) == 104  # gap filled at nominal dt
    assert np.diff(imu["time"]).max() < 0.0075
    assert imu["dtheta"].shape[1] == 3
    np.testing.assert_allclose(imu["dtheta"][0], [0.001, -0.002, 0.0005])


def test_imu_native(imu_file):
    if not dataset._find_lib():
        pytest.skip("native loader not built")
    _check_imu(dataset.load_imu(imu_file, 200.0))


def test_imu_fallback(imu_file):
    arr = dataset._numpy_imu(imu_file, 200.0, 0)
    imu = dict(time=arr[:, 0], dt=arr[:, 1], dtheta=arr[:, 2:5], dvel=arr[:, 5:8])
    _check_imu(imu)


def test_native_matches_fallback(imu_file):
    if not dataset._find_lib():
        pytest.skip("native loader not built")
    native = dataset.load_imu(imu_file, 200.0)
    arr = dataset._numpy_imu(imu_file, 200.0, 0)
    np.testing.assert_allclose(native["time"], arr[:, 0], atol=1e-12)
    np.testing.assert_allclose(native["dtheta"], arr[:, 2:5], atol=1e-15)


def test_rate_mode(tmp_path):
    p = tmp_path / "imu_rate.txt"
    np.savetxt(p, [[0.005, 0.2, -0.4, 0.1, 2.0, -9.8, -9.8], [0.010, 0.2, -0.4, 0.1, 2.0, -9.8, -9.8]], fmt="%.9f")
    imu = dataset.load_imu(str(p), 200.0, mode="rate")
    np.testing.assert_allclose(imu["dtheta"][1], np.array([0.2, -0.4, 0.1]) * 0.005, atol=1e-12)


def test_gnss(tmp_path):
    p = tmp_path / "gnss.txt"
    np.savetxt(p, [[1.0, 30.5, 114.3, 40.0, 0.05, 0.05, 0.1]], fmt="%.9f")
    g = dataset.load_gnss(str(p))
    np.testing.assert_allclose(g["blh"][0, 0], np.deg2rad(30.5), atol=1e-12)
    np.testing.assert_allclose(g["std"][0], [0.05, 0.05, 0.1], atol=1e-12)


def test_gnss_dual_antenna_yaw(tmp_path):
    p = tmp_path / "gnss_yaw.txt"
    np.savetxt(
        p,
        [
            [1.0, 30.5, 114.3, 40.0, 0.05, 0.05, 0.1, 95.0, 1.0],
            [2.0, 30.5, 114.3, 40.0, 0.05, 0.05, 0.1, 0.0, 0.0],
        ],
        fmt="%.9f",
    )
    g = dataset.load_gnss(str(p))
    assert bool(g["isyawvalid"][0]) and not bool(g["isyawvalid"][1])
    np.testing.assert_allclose(g["yaw"][0], np.deg2rad(95.0), atol=1e-12)
    # 7-column files stay yaw-invalid
    p2 = tmp_path / "gnss_plain.txt"
    np.savetxt(p2, [[1.0, 30.5, 114.3, 40.0, 0.05, 0.05, 0.1]], fmt="%.9f")
    g2 = dataset.load_gnss(str(p2))
    assert not g2["isyawvalid"].any()
