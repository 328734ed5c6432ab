"""KAIST Complex Urban raw-log converter (scripts/convert_kaist.py) on a
tiny synthetic fixture: axis remap to front-right-down, ns->s stamps,
duplicate-stamp culling, GNSS std clamping, frame-index filtering, and
round-trip through io.dataset loaders (the formats the replay consumes)."""

import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

import convert_kaist as ck  # noqa: E402


def _write_fixture(root):
    sd = os.path.join(root, "sensor_data")
    os.makedirs(sd)
    t0 = 1544582648000000000  # ns, urban38-era epoch
    step = 10_000_000  # 100 Hz
    rows = []
    for i in range(10):
        t = t0 + i * step
        gyro = [0.01 * i, 0.02, -0.03]
        accel = [0.1, -0.2, 9.81]
        rows.append([t, 0, 0, 0, 1, 0, 0, 0, *gyro, *accel, 0, 0, 0])
    rows.append(rows[-1][:])  # duplicate stamp -> must be culled
    with open(os.path.join(sd, "xsens_imu.csv"), "w") as f:
        for r in rows:
            f.write(",".join(str(v) for v in r) + "\n")

    with open(os.path.join(sd, "vrs_gps.csv"), "w") as f:
        for i in range(3):
            t = t0 + i * 1_000_000_000
            lat, lon, alt = 36.5 + 1e-5 * i, 127.3, 60.0 + 0.1 * i
            # fix/n_sat/h_prec then lat/lon/alt std (alt std 0 -> clamped)
            f.write(f"{t},{lat},{lon},351512.0,4026839.0,{alt},2,11,1.2,"
                    f"0.02,0.03,0.0,0,0.0,0.0,0.0,A\n")

    img_dir = os.path.join(root, "image", "stereo_left")
    os.makedirs(img_dir)
    stamps = [t0 + i * 100_000_000 for i in range(4)]
    with open(os.path.join(sd, "data_stamp.csv"), "w") as f:
        for s in stamps:
            f.write(f"{s},stereo\n")
        f.write(f"{t0},imu\n")  # non-stereo rows must be ignored
    for s in stamps[:3]:  # last stereo frame has no image -> filtered out
        open(os.path.join(img_dir, f"{s}.png"), "wb").close()
    return t0, stamps


def test_convert_kaist_roundtrip(tmp_path):
    seq = tmp_path / "seq"
    out = tmp_path / "out"
    os.makedirs(out)
    t0, stamps = _write_fixture(str(seq))

    axes = ck.parse_axes("+x,-y,-z")
    np.testing.assert_array_equal(
        axes, [[1, 0, 0], [0, -1, 0], [0, 0, -1]])

    imu = ck.convert_imu(str(seq / "sensor_data" / "xsens_imu.csv"),
                         axes, str(out / "imu.txt"))
    assert imu.shape == (10, 7)  # duplicate stamp culled
    np.testing.assert_allclose(imu[0, 0], t0 * 1e-9)
    # y/z axes flipped to front-right-down
    np.testing.assert_allclose(imu[3, 1:4], [0.03, -0.02, 0.03], atol=1e-12)
    np.testing.assert_allclose(imu[0, 4:7], [0.1, 0.2, -9.81], atol=1e-12)

    gnss = ck.convert_gnss(str(seq / "sensor_data" / "vrs_gps.csv"),
                           str(out / "gnss.txt"))
    assert gnss.shape == (3, 7)
    np.testing.assert_allclose(gnss[1, 1], 36.5 + 1e-5)
    assert gnss[0, 6] == 0.01  # zero alt std clamped

    frames = ck.convert_frames(str(seq / "sensor_data" / "data_stamp.csv"),
                               str(seq), str(out / "frames.txt"))
    assert len(frames) == 3  # missing image filtered, imu row ignored
    assert frames[0][1].endswith(f"{stamps[0]}.png")

    # round-trip through the io loaders the replay actually uses
    from ic_gvins_tpu.io import dataset

    imu_rt = dataset.load_imu(str(out / "imu.txt"), rate=100, mode="rate")
    assert imu_rt["dtheta"].shape[1] == 3
    # rate -> increment: dtheta = gyro * dt at the 100 Hz nominal dt
    # (atol bounded by float64 eps at epoch-scale stamps: dt jitter ~2e-7 s
    # x gyro 0.03 rad/s ~ 7e-9 — the reference's ROS double stamps carry the
    # identical quantization)
    np.testing.assert_allclose(imu_rt["dtheta"][3, 0], 0.03 * 0.01, atol=1e-8)
    gnss_rt = dataset.load_gnss(str(out / "gnss.txt"))
    np.testing.assert_allclose(gnss_rt["blh"][0, 0], np.deg2rad(36.5))
    times, _provider = dataset.load_frame_index(
        str(out / "frames.txt"), image_dir=str(seq))
    assert len(times) == 3

    # CLI end-to-end (skip frames exercised via the flag)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "convert_kaist.py"),
         "--seq", str(seq), "--out", str(tmp_path / "cli_out")],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    assert "imu: 10 rows" in r.stdout
