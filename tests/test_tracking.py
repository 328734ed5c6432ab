"""Frontend integration: track a rendered 3D scene with known camera poses."""

import jax.numpy as jnp
import numpy as np
import pytest

from ic_gvins_tpu.engine.config import parse_config
from ic_gvins_tpu.vision import camera as cam
from ic_gvins_tpu.vision.map import VisualMap, VFrame
from ic_gvins_tpu.vision.tracking import Tracker, TRACK_FIRST_FRAME, TRACK_TRACKING


W, H = 320, 240


def small_camera():
    return cam.PinholeCamera.from_config(
        [250.0, 250.0, 160.0, 120.0], [-0.05, 0.01, 0.0, 0.0], [W, H]
    )


def make_scene(n_pts=120, seed=0):
    rng = np.random.default_rng(seed)
    # points in front of the camera path (z forward), spread wide
    pts = np.stack(
        [
            rng.uniform(-6, 6, n_pts),
            rng.uniform(-4.5, 4.5, n_pts),
            rng.uniform(6, 14, n_pts),
        ],
        axis=1,
    )
    return pts


def render(camera, pts_w, R, t, seed=1):
    """Render gaussian blobs at the DISTORTED projections (physical image)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
    img = 90.0 + 15.0 * np.sin(xx / 29.0) * np.sin(yy / 31.0)
    pc = (pts_w - t) @ R  # R^T (pw - t)
    valid = pc[:, 2] > 0.5
    und = np.asarray(cam.cam2pixel(camera, jnp.asarray(pc[valid])))
    dis = np.asarray(cam.distort_points(camera, jnp.asarray(und)))
    amps = 80.0 * np.where(np.arange(len(pts_w)) % 2 == 0, 1.0, -1.0)[valid]
    for (x, y), a in zip(dis, amps):
        if -5 <= x < W + 5 and -5 <= y < H + 5:
            img += a * np.exp(-((xx - x) ** 2 + (yy - y) ** 2) / (2 * 1.8**2))
    return np.clip(img, 0, 255)


@pytest.fixture(scope="module")
def tracked_sequence():
    camera = small_camera()
    pts = make_scene()
    cfg = parse_config(
        dict(
            track_check_histogram=False,
            track_min_parallax=20,
            track_max_interval=0.5,
            track_max_features=120,
            reprojection_error_std=1.5,
            optimize_windows_size=8,
        )
    )
    vmap = VisualMap(cfg.optimize_windows_size)
    tracker = Tracker(camera, vmap, cfg, F_MAX=256)

    states = []
    frames = []
    for k in range(14):
        t = np.array([1.5 * 0.1 * k, 0.0, 0.0])  # 1.5 m/s sideways
        R = np.eye(3)
        img = render(camera, pts, R, t)
        frame = VFrame(stamp=0.1 * k)
        frame.R, frame.t = R, t.copy()
        st = tracker.track(frame, img)
        # the engine layer inserts tracker keyframes into the map
        # (GVINS::addNewKeyFrameTimeNode, ic_gvins.cc:724-752)
        if tracker.is_new_keyframe or st == TRACK_FIRST_FRAME:
            if frame.kf_id is None:
                frame.set_keyframe(2)
            vmap.insert_keyframe(frame)
        states.append(st)
        frames.append(frame)
    return tracker, vmap, states, frames, pts


def test_first_frame_and_tracking(tracked_sequence):
    tracker, vmap, states, frames, pts = tracked_sequence
    assert states[0] == TRACK_FIRST_FRAME
    assert TRACK_TRACKING in states
    assert not tracker.initializing


def test_keyframes_created(tracked_sequence):
    tracker, vmap, states, frames, pts = tracked_sequence
    assert len(vmap.keyframes) >= 2
    # keyframe cadence: ~20 px parallax at 47 px/s -> roughly every 3-6 frames
    assert len(vmap.keyframes) <= 8


def test_landmarks_triangulated_near_truth(tracked_sequence):
    tracker, vmap, states, frames, pts = tracked_sequence
    assert len(vmap.landmarks) >= 20, f"only {len(vmap.landmarks)} landmarks"
    errs = []
    for lm in vmap.landmarks.values():
        d = np.linalg.norm(pts - lm.pos, axis=1).min()
        errs.append(d)
    errs = np.asarray(errs)
    assert np.median(errs) < 0.6, f"median landmark error {np.median(errs):.3f} m"
    assert np.percentile(errs, 25) < 0.3


def test_features_tracked_across_frames(tracked_sequence):
    tracker, vmap, states, frames, pts = tracked_sequence
    # current frame should carry landmark observations
    n_obs = len(tracker.frame_cur.features)
    assert n_obs >= 15, f"only {n_obs} tracked landmark features"
