"""Long-horizon GVINS stability: a 300 s hard-cadence replay.

urban38 runs 2154 s / ~21k frames (/root/reference/README.md:129-132) with
hundreds of sliding-window marginalizations; the shorter e2e tests exercise
~10-20 window slides, which cannot catch slow degradations of the prior
conditioning, td/extrinsic random walk, or node-slot bookkeeping. This test
replays 300 s (~3000 frames, hundreds of marginalizations) with a keyframe
policy tuned HARDER than the reference default (track_min_parallax=8: a
keyframe on most parallax-bearing frames — an urban-like cadence) and gates

  - the estimator stays in TRACKING_NORMAL to the end,
  - bounded position error outside the injected GNSS outage,
  - bounded td and extrinsic drift over hundreds of adoption gates,
  - estimator.check_time_consistency clean after EVERY optimization episode
    (the invariant every structural edit must preserve),
  - the measured keyframe/marginalization cadences stay at or below the 0.5
    floors bench.py assumes (bench.py would overstate fps if a hard world
    ever exceeded them — this is the gate the bench docstring points at).

Runtime: dominated by CPU jit dispatch of the per-frame device stages;
marked slow. Set ICGVINS_STAB_DURATION to shorten locally (default 300).
"""

import os

import numpy as np
import pytest

from gins_data import make_gins_dataset
from ic_gvins_tpu.core import quaternion as quat
from ic_gvins_tpu.engine.config import parse_config
from ic_gvins_tpu.models.gvins import GvinsModel
from ic_gvins_tpu.vision import camera as vcam

import jax.numpy as jnp

W, H, FX = 160, 120, 125.0

DURATION = float(os.environ.get("ICGVINS_STAB_DURATION", "300"))
OUTAGE = (0.45 * DURATION, 0.45 * DURATION + 20.0)  # 20 s GNSS outage

pytestmark = pytest.mark.slow


def _render(camera, pts_w, Rcw, tcw):
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
            x0, x1 = max(int(x) - 5, 0), min(int(x) + 6, W)
            y0, y1 = max(int(y) - 5, 0), min(int(y) + 6, H)
            if x1 > x0 and y1 > y0:
                img[y0:y1, x0:x1] += a * np.exp(
                    -((xx[y0:y1, x0:x1] - x) ** 2 + (yy[y0:y1, x0:x1] - y) ** 2)
                    / (2 * 1.6**2))
    return np.clip(img, 0, 255)


@pytest.fixture(scope="module")
def stab_run(tmp_path_factory):
    imu_data, gnss_data, truth = make_gins_dataset(turn_duration=DURATION - 6.0)
    assert imu_data["time"][-1] >= DURATION - 0.1
    outdir = str(tmp_path_factory.mktemp("gvins_stab"))

    keep = ~((gnss_data["time"] >= OUTAGE[0]) & (gnss_data["time"] < OUTAGE[1]))
    gnss_data = {k: np.asarray(v)[keep] for k, v in gnss_data.items()}

    cfg = parse_config(
        dict(
            initlength=3,
            imudatarate=200,
            iswithearth=False,
            antlever=list(truth["lever"]),
            imumodel=dict(arw=0.1, vrw=0.1, gbstd=400.0, abstd=400.0, corrtime=1.0),
            gnssthreshold=20,
            optimize_windows_size=10,
            optimize_num_iterations=20,
            optimize_estimate_extrinsic=True,
            optimize_estimate_td=True,
            # HARD keyframe cadence: most parallax-bearing frames promote
            track_min_parallax=8,
            track_max_interval=0.5,
            track_max_features=80,
            reprojection_error_std=1.5,
            node_slots=20,
            landmark_slots=256,
            gnss_slots=20,
            reproj_slots=1024,
            cam0=dict(
                intrinsic=[FX, FX, 80.0, 60.0],
                distortion=[-0.05, 0.01, 0.0, 0.0],
                resolution=[W, H],
                q_b_c=[0.0, 0.0, 0.0, 1.0],
                t_b_c=[0.0, 0.0, 0.0],
                td_b_c=0.0,
            ),
        )
    )

    rng = np.random.default_rng(11)
    n_pts = 9000
    pts_w = np.stack(
        [rng.uniform(-90, 150, n_pts), rng.uniform(-90, 150, n_pts),
         rng.uniform(9, 13, n_pts)], axis=1)
    camera = vcam.PinholeCamera.from_config(
        [FX, FX, 80.0, 60.0], [-0.05, 0.01, 0.0, 0.0], [W, H])
    frame_times = np.arange(0.05, imu_data["time"][-1] - 0.2, 0.1)
    rate = 200.0

    def image_provider(k):
        t = frame_times[k]
        i = min(int(round(t * rate)) - 1, len(truth["p"]) - 1)
        Rwb = np.asarray(quat.to_matrix(jnp.asarray(truth["q"][i])))
        return _render(camera, pts_w, Rwb, truth["p"][i])

    model = GvinsModel(cfg, outdir=outdir)

    # counters + per-episode invariant check (wrapping, not subclassing: the
    # production class runs unmodified)
    counts = dict(frames=0, episodes=0, margs=0)
    consistency_failures = []

    orig_frame = model._process_frame
    orig_opt = model._optimize_visual
    orig_marg = model._marginalize_visual_impl

    def counting_frame(stream, stamp, image):
        counts["frames"] += 1
        return orig_frame(stream, stamp, image)

    def checking_opt():
        counts["episodes"] += 1
        r = orig_opt()
        msgs = model.est.check_time_consistency(where=f"episode {counts['episodes']}")
        if msgs:
            consistency_failures.append(msgs)
        return r

    def counting_marg():
        counts["margs"] += 1
        return orig_marg()

    model._process_frame = counting_frame
    model._optimize_visual = checking_opt
    model._marginalize_visual_impl = counting_marg

    traj = model.run(imu_data, gnss_data, frame_times, image_provider)
    return model, traj, truth, counts, consistency_failures


def _errs(traj, truth, t_lo=0.0, t_hi=1e9, exclude=()):
    rate = 200.0
    offset = truth["gnss_local"][0]
    errs = []
    for row in traj:
        t, p = row[0], np.asarray(row[1:4])
        if not (t_lo <= t <= t_hi):
            continue
        if any(lo - 2.0 <= t <= hi + 3.0 for lo, hi in exclude):
            continue
        i = int(round(t * rate)) - 1
        if 0 <= i < len(truth["p"]):
            errs.append(np.linalg.norm(p + offset - truth["p"][i]))
    return np.asarray(errs)


def test_survives_full_horizon(stab_run):
    model, traj, truth, counts, _ = stab_run
    assert model.state == "TRACKING_NORMAL", model.state
    assert traj[-1][0] > DURATION - 5.0, f"replay died at t={traj[-1][0]:.1f}"


def test_hundreds_of_window_slides(stab_run):
    model, traj, truth, counts, _ = stab_run
    # urban-scale structural churn actually happened (scales with DURATION)
    expect = DURATION / 300.0
    assert counts["episodes"] >= 400 * expect, counts
    assert counts["margs"] >= 100 * expect, counts


def test_bounded_error_over_horizon(stab_run):
    model, traj, truth, counts, _ = stab_run
    errs = _errs(traj, truth, t_lo=8.0, exclude=(OUTAGE,))
    assert len(errs) > 100
    assert errs.mean() < 0.3, f"mean pos err {errs.mean():.3f} m"
    # no end-of-run blowup: the last tenth is as good as the whole
    tail = _errs(traj, truth, t_lo=0.9 * DURATION)
    assert tail.mean() < 0.3, f"tail pos err {tail.mean():.3f} m"


def test_outage_bridged(stab_run):
    model, traj, truth, counts, _ = stab_run
    bridge = _errs(traj, truth, t_lo=OUTAGE[0], t_hi=OUTAGE[1] + 2.0)
    assert len(bridge) > 3
    assert bridge.max() < 3.0, f"outage drift {bridge.max():.2f} m"


def test_td_extrinsic_drift_bounded(stab_run):
    """Hundreds of gated td/extrinsic adoptions must not random-walk away
    (ic_gvins.cc:1299-1389 adopts unconditionally; our gates bound it)."""
    model, traj, truth, counts, _ = stab_run
    assert abs(model.td_b_c) <= 0.081, model.td_b_c
    assert np.linalg.norm(model.pose_b_c_t) < 0.5, model.pose_b_c_t
    # rotation extrinsic: identity in truth; drift stays under 5 deg
    cosang = 0.5 * (np.trace(model.pose_b_c_R) - 1.0)
    assert np.degrees(np.arccos(np.clip(cosang, -1, 1))) < 5.0


def test_time_consistency_every_episode(stab_run):
    model, traj, truth, counts, failures = stab_run
    assert not failures, failures[:3]


def test_cadence_floors_hold(stab_run):
    """bench.py floors kf_ratio/marg_ratio at 0.5; this hard-cadence world
    must measure AT OR BELOW the floor or the bench fps is optimistic."""
    model, traj, truth, counts, _ = stab_run
    kf_ratio = counts["episodes"] / counts["frames"]
    marg_ratio = counts["margs"] / counts["frames"]
    assert kf_ratio <= 0.5, f"kf_ratio {kf_ratio:.3f} exceeds bench floor"
    assert marg_ratio <= 0.5, f"marg_ratio {marg_ratio:.3f} exceeds bench floor"
