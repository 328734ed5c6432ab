"""KAIST real-data recipe dry-run: raw-layout fixture -> convert_kaist ->
io.dataset loaders -> scripts/run_gvins.py replay, end to end.

The KAIST urban38 logs are not available in this environment, so this test
proves the ENTIRE real-data path executes before real data ever arrives: a
synthetic world (tests/gins_data) is written to disk in the raw KAIST layout
(ns stamps, x-forward/y-left/z-up xsens axes, vrs_gps.csv columns, PNG
frames — README.md:92-150 of the reference describes the same ingest), the
converter CLI produces the text logs, and the run_gvins.py CLI replays them
through the full GVINS model with images loaded from the PNG files via the
dataset provider (fusion_ros.cc:123-234 ingest parity).

Pass criteria: both CLIs exit 0, the replay reaches a tracking state with a
nonempty trajectory, and the standard output files are written.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from gins_data import make_gins_dataset  # noqa: E402
from test_gvins_e2e import FX, H, W, render_frame  # noqa: E402

EPOCH_NS = 1544582648_000_000_000  # urban38-era epoch
FRAME_DT = 0.25                    # 4 Hz keeps the CPU replay short


def _write_kaist_fixture(root, imu, gnss, truth, frame_times, camera):
    """Lay the synthetic world out exactly like a raw KAIST sequence."""
    import jax.numpy as jnp
    from PIL import Image

    from ic_gvins_tpu.core import quaternion as quat

    sd = os.path.join(root, "sensor_data")
    img_dir = os.path.join(root, "image", "stereo_left")
    os.makedirs(sd)
    os.makedirs(img_dir)

    # xsens_imu.csv: ns stamps; rates in the raw x-fwd/y-left/z-up mount,
    # i.e. the inverse of the converter's default (+x,-y,-z) FRD map (the
    # map is an involution, so applying it again restores FRD)
    t_ns = EPOCH_NS + np.round(np.asarray(imu["time"]) * 1e9).astype(np.int64)
    dt = np.asarray(imu["dt"])
    gyro_frd = np.asarray(imu["dtheta"]) / dt[:, None]
    acc_frd = np.asarray(imu["dvel"]) / dt[:, None]
    flip = np.array([1.0, -1.0, -1.0])
    with open(os.path.join(sd, "xsens_imu.csv"), "w") as f:
        for k in range(len(t_ns)):
            g = gyro_frd[k] * flip
            a = acc_frd[k] * flip
            f.write(f"{t_ns[k]},0,0,0,1,0,0,0,"
                    f"{g[0]:.9f},{g[1]:.9f},{g[2]:.9f},"
                    f"{a[0]:.9f},{a[1]:.9f},{a[2]:.9f},0,0,0\n")

    # vrs_gps.csv: lat/lon deg, alt m, stds in columns 9-11
    with open(os.path.join(sd, "vrs_gps.csv"), "w") as f:
        for k in range(len(gnss["time"])):
            tg = EPOCH_NS + int(round(gnss["time"][k] * 1e9))
            lat, lon = np.rad2deg(gnss["blh"][k][:2])
            alt = gnss["blh"][k][2]
            sn, se, sd_ = gnss["std"][k]
            f.write(f"{tg},{lat:.12f},{lon:.12f},0.0,0.0,{alt:.6f},2,11,1.0,"
                    f"{sn:.4f},{se:.4f},{sd_:.4f},0,0.0,0.0,0.0,A\n")

    # frames: data_stamp.csv + rendered PNGs
    rng = np.random.default_rng(7)
    n_pts = 600
    pts_w = np.stack([rng.uniform(-10, 55, n_pts), rng.uniform(-25, 25, n_pts),
                      rng.uniform(9, 13, n_pts)], axis=1)
    rate = 200.0
    with open(os.path.join(sd, "data_stamp.csv"), "w") as f:
        for tf in frame_times:
            s = EPOCH_NS + int(round(tf * 1e9))
            f.write(f"{s},stereo\n")
            i = min(int(round(tf * rate)) - 1, len(truth["p"]) - 1)
            Rwb = np.asarray(quat.to_matrix(jnp.asarray(truth["q"][i])))
            img = render_frame(camera, pts_w, Rwb, truth["p"][i])
            Image.fromarray(img.astype(np.uint8), "L").save(
                os.path.join(img_dir, f"{s}.png"))


@pytest.mark.slow
def test_kaist_recipe_end_to_end(tmp_path):
    from ic_gvins_tpu.vision import camera as vcam

    imu, gnss, truth = make_gins_dataset(with_earth=True)
    cut = int(11.0 * 200)
    imu = {k: np.asarray(v)[:cut] for k, v in imu.items()}
    gnss = {k: np.asarray(v)[:10] for k, v in gnss.items()}
    camera = vcam.PinholeCamera.from_config(
        [FX, FX, 160.0, 120.0], [-0.05, 0.01, 0.0, 0.0], [W, H])
    frame_times = np.arange(0.25, imu["time"][-1] - 0.3, FRAME_DT)

    seq = str(tmp_path / "seq")
    out = str(tmp_path / "txt")
    os.makedirs(out)
    _write_kaist_fixture(seq, imu, gnss, truth, frame_times, camera)

    # 1) converter CLI (the README recipe's first step)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "convert_kaist.py"),
         "--seq", seq, "--out", out],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr
    n_frames = len(frame_times)
    assert f"frames: {n_frames}" in r.stdout

    # 2) gvins.yaml in raw (reference) units
    cfgpath = str(tmp_path / "gvins.yaml")
    lever = truth["lever"]
    with open(cfgpath, "w") as f:
        f.write(f"""
outputpath: {tmp_path / 'outdir'}
is_make_outputdir: false
initlength: 3
imudatarate: 200
iswithearth: true
antlever: [{lever[0]}, {lever[1]}, {lever[2]}]
gnssthreshold: 20
imumodel: {{arw: 0.1, vrw: 0.1, gbstd: 400.0, abstd: 400.0, corrtime: 1.0}}
optimize_windows_size: 8
optimize_num_iterations: 15
optimize_estimate_extrinsic: false
optimize_estimate_td: false
track_min_parallax: 20
track_max_interval: 0.5
track_max_features: 120
reprojection_error_std: 1.5
node_slots: 14
landmark_slots: 256
gnss_slots: 16
reproj_slots: 1024
cam0:
  intrinsic: [{FX}, {FX}, 160.0, 120.0]
  distortion: [-0.05, 0.01, 0.0, 0.0]
  resolution: [{W}, {H}]
  q_b_c: [0.0, 0.0, 0.0, 1.0]
  t_b_c: [0.0, 0.0, 0.0]
  td_b_c: 0.0
""")

    # 3) replay CLI exactly as the converter's printed recipe says
    outdir = str(tmp_path / "outdir")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "run_gvins.py"),
         "--config", cfgpath, "--cpu",
         "--imu", os.path.join(out, "imu.txt"), "--imu-mode", "rate",
         "--gnss", os.path.join(out, "gnss.txt"),
         "--frames", os.path.join(out, "frames.txt"), "--imagedir", seq,
         "--output", outdir],
        capture_output=True, text=True, timeout=1500)
    assert r.returncode == 0, r.stderr[-4000:]

    log = r.stderr + r.stdout
    assert "replay finished" in log
    # the replay must actually have initialized and produced trajectory nodes
    import re

    m = re.search(r"replay finished: (\d+) trajectory nodes, state=(\S+)", log)
    assert m, log[-2000:]
    assert int(m.group(1)) > 0
    assert m.group(2) in ("TRACKING_NORMAL", "TRACKING_INITIALIZING")

    for fname in ("gvins.yaml", "ic_gvins_tpu.log", "trajectory.csv"):
        assert os.path.exists(os.path.join(outdir, fname)), fname
