"""End-to-end GVINS: full GNSS-Visual-Inertial replay on a rendered world."""

import jax.numpy as jnp
import numpy as np
import pytest

from gins_data import make_gins_dataset
from ic_gvins_tpu.core import quaternion as quat
from ic_gvins_tpu.engine.config import parse_config
from ic_gvins_tpu.models.gvins import GvinsModel
from ic_gvins_tpu.vision import camera as vcam

W, H = 320, 240
FX = 250.0


def render_frame(camera, pts_w, Rcw, tcw, seed=1):
    """Gaussian blobs at distorted projections over a FLAT background.

    The background must be featureless: any image-fixed texture would track
    as phantom zero-flow features with no consistent 3D interpretation and
    corrupt the bundle adjustment."""
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
    img = np.full((H, W), 90.0)
    pc = (pts_w - tcw) @ Rcw
    valid = pc[:, 2] > 1.0
    if valid.any():
        und = np.asarray(vcam.cam2pixel(camera, jnp.asarray(pc[valid])))
        dis = np.asarray(vcam.distort_points(camera, jnp.asarray(und)))
        amps = 80.0 * np.where(np.arange(len(pts_w)) % 2 == 0, 1.0, -1.0)[valid]
        inb = (dis[:, 0] > -5) & (dis[:, 0] < W + 5) & (dis[:, 1] > -5) & (dis[:, 1] < H + 5)
        for (x, y), a in zip(dis[inb], amps[inb]):
            x0, x1 = max(int(x) - 6, 0), min(int(x) + 7, W)
            y0, y1 = max(int(y) - 6, 0), min(int(y) + 7, H)
            if x1 > x0 and y1 > y0:
                img[y0:y1, x0:x1] += a * np.exp(
                    -((xx[y0:y1, x0:x1] - x) ** 2 + (yy[y0:y1, x0:x1] - y) ** 2) / (2 * 1.8**2)
                )
    return np.clip(img, 0, 255)


@pytest.fixture(scope="module")
def gvins_run(tmp_path_factory):
    imu_data, gnss_data, truth = make_gins_dataset()
    outdir = str(tmp_path_factory.mktemp("gvins_out"))

    cfg = parse_config(
        dict(
            initlength=3,
            imudatarate=200,
            iswithearth=False,
            antlever=list(truth["lever"]),
            imumodel=dict(arw=0.1, vrw=0.1, gbstd=400.0, abstd=400.0, corrtime=1.0),
            gnssthreshold=20,
            optimize_windows_size=8,
            optimize_num_iterations=20,
            # extrinsic estimation is exercised by its own unit test; this
            # planar+yaw synthetic trajectory gives it weak observability and
            # the free extrinsic can destabilize the whole window
            optimize_estimate_extrinsic=False,
            optimize_estimate_td=False,
            is_use_visualization=True,
            track_min_parallax=20,
            track_max_interval=0.5,
            track_max_features=120,
            reprojection_error_std=1.5,
            node_slots=20,
            landmark_slots=256,
            gnss_slots=20,
            reproj_slots=1024,
            cam0=dict(
                intrinsic=[FX, FX, 160.0, 120.0],
                distortion=[-0.05, 0.01, 0.0, 0.0],
                resolution=[W, H],
                # camera = body (FRD body, camera z down at the ground scene)
                q_b_c=[0.0, 0.0, 0.0, 1.0],
                t_b_c=[0.0, 0.0, 0.0],
                td_b_c=0.0,
            ),
        )
    )

    # ground scene 10 m below the trajectory (body z = down = camera z)
    rng = np.random.default_rng(42)
    n_pts = 800
    pts_w = np.stack(
        [
            rng.uniform(-10, 55, n_pts),
            rng.uniform(-25, 25, n_pts),
            rng.uniform(9, 13, n_pts),
        ],
        axis=1,
    )

    camera = vcam.PinholeCamera.from_config([FX, FX, 160.0, 120.0], [-0.05, 0.01, 0.0, 0.0], [W, H])
    frame_times = np.arange(0.05, imu_data["time"][-1] - 0.2, 0.1)
    rate = 200.0
    # model local frame offset vs truth frame
    offset = truth["gnss_local"][0]

    def image_provider(k):
        t = frame_times[k]
        i = min(int(round(t * rate)) - 1, len(truth["p"]) - 1)
        Rwb = np.asarray(quat.to_matrix(jnp.asarray(truth["q"][i])))
        return render_frame(camera, pts_w, Rwb, truth["p"][i])

    model = GvinsModel(cfg, outdir=outdir)
    traj = model.run(imu_data, gnss_data, frame_times, image_provider)
    return model, traj, truth, offset, outdir


def test_reaches_tracking(gvins_run):
    model, traj, truth, offset, outdir = gvins_run
    assert model.state in ("TRACKING_INITIALIZING", "TRACKING_NORMAL"), model.state
    assert len(traj) > 10


def test_trajectory_accuracy(gvins_run):
    model, traj, truth, offset, outdir = gvins_run
    rate = 200.0
    errs = []
    for row in traj:
        t, p = row[0], row[1:4]
        i = int(round(t * rate)) - 1
        if 0 <= i < len(truth["p"]):
            errs.append(np.linalg.norm(p + offset - truth["p"][i]))
    errs = np.asarray(errs)
    assert errs.mean() < 0.12, f"mean pos err {errs.mean():.3f} m"
    assert errs.max() < 0.4, f"max pos err {errs.max():.3f} m"


def test_landmarks_and_map(gvins_run):
    model, traj, truth, offset, outdir = gvins_run
    assert len(model.vmap.landmarks) >= 10
    assert 2 <= len(model.vmap.keyframes) <= model.cfg.optimize_windows_size + 1


def test_statistics_output(gvins_run):
    import os

    model, traj, truth, offset, outdir = gvins_run
    stats = np.loadtxt(os.path.join(outdir, "statistics.txt"))
    if stats.ndim == 1:
        stats = stats[None]
    assert stats.shape[1] == 15
    assert len(stats) >= 3
    # mean reprojection errors should be subpixel-ish
    assert np.median(stats[:, 6]) < 3.0


def test_timecosts_are_measured(gvins_run):
    """Cols 10-12 of statistics.txt carry measured pass-1/pass-2/marg wall
    times and tracking.txt col 7 the tracker wall time (ic_gvins.cc:1019-1022,
    tracking.cc:309-315) — all real perf_counter measurements, no modeling."""
    import os

    model, traj, truth, offset, outdir = gvins_run
    stats = np.loadtxt(os.path.join(outdir, "statistics.txt"))
    if stats.ndim == 1:
        stats = stats[None]
    t1, t2, tm = stats[:, 10], stats[:, 11], stats[:, 12]
    assert (t1 > 0).all() and (t2 > 0).all()
    # pass 2 runs 3x the iterations of pass 1 — identical columns would mean
    # the old x500 fudge is back
    assert not np.allclose(t1, t2)
    assert (tm > 0).any()  # marginalization fires once the window fills

    trk = np.loadtxt(os.path.join(outdir, "tracking.txt"))
    if trk.ndim == 1:
        trk = trk[None]
    assert (trk[:, 6] > 0).all()


def test_visualization_artifacts(gvins_run):
    """is_use_visualization wires the OfflineDrawer into the replay:
    tracking overlays during the run, fixed-mappoint cloud at
    marginalization, and the path figure at the end (drawer.cc:25-69,
    ic_gvins.cc:1665, drawer_rviz.cc:100-195)."""
    import glob
    import os

    model, traj, truth, offset, outdir = gvins_run
    assert model.drawer is not None
    pngs = glob.glob(os.path.join(outdir, "tracking", "frame_*.png"))
    assert len(pngs) >= 2
    assert os.path.exists(os.path.join(outdir, "path.png"))
    assert len(model.drawer.fixed_points) > 0


def test_dual_antenna_yaw_through_gvins():
    """GvinsModel.run forwards yaw/isyawvalid into its gnss events so the
    shared initialization (ic_gvins.cc:630-647) can use the dual-antenna
    heading; replay with no frames exercises just the INITIALIZING stage."""
    imu_data, gnss_data, truth = make_gins_dataset()
    cfg = parse_config(
        dict(
            initlength=3,
            imudatarate=200,
            iswithearth=False,
            antlever=list(truth["lever"]),
            imumodel=dict(arw=0.1, vrw=0.1, gbstd=400.0, abstd=400.0, corrtime=1.0),
            gnssthreshold=20,
            optimize_windows_size=8,
            node_slots=20,
            landmark_slots=64,
            gnss_slots=20,
            reproj_slots=256,
            cam0=dict(
                intrinsic=[FX, FX, 160.0, 120.0],
                distortion=[-0.05, 0.01, 0.0, 0.0],
                resolution=[W, H],
                q_b_c=[0.0, 0.0, 0.0, 1.0],
                t_b_c=[0.0, 0.0, 0.0],
                td_b_c=0.0,
            ),
        )
    )
    g = {k: np.array(v, copy=True) for k, v in gnss_data.items()}
    n = len(g["time"])
    yaw_injected = 0.17
    g["yaw"] = np.full(n, yaw_injected)
    g["isyawvalid"] = np.ones(n, bool)

    model = GvinsModel(cfg)
    model.run(imu_data, g, np.zeros(0), lambda k: None)
    assert model.est is not None, "did not initialize"
    assert abs(model._initatt[2] - yaw_injected) < 1e-12
