"""Attribute the replay loop's host time to pipeline sections.

Same world/config as bench_replay_host.py, but every interesting method is
wrapped with an EXCLUSIVE-time section timer (a section's children are
subtracted), and every module-level jit is a leaf section — so the printout
separates python orchestration per stage from device-call wall time.

Prints a JSON dict {section: {total_ms_per_frame, calls_per_frame}} sorted
by exclusive time, plus wall/frame totals.
"""

import json
import os
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))


class SectionProf:
    def __init__(self):
        self.stack = []
        self.excl = {}
        self.calls = {}
        self.enabled = False

    def wrap_fn(self, fn, label, block=False):
        def w(*a, **k):
            if not self.enabled:
                return fn(*a, **k)
            t0 = time.perf_counter()
            self.stack.append([label, 0.0])
            try:
                r = fn(*a, **k)
                if block:
                    r = jax.block_until_ready(r)
                return r
            finally:
                dt = time.perf_counter() - t0
                _, child = self.stack.pop()
                self.excl[label] = self.excl.get(label, 0.0) + dt - child
                self.calls[label] = self.calls.get(label, 0) + 1
                if self.stack:
                    self.stack[-1][1] += dt
        return w

    def wrap(self, obj, name, label=None, block=False):
        setattr(obj, name, self.wrap_fn(getattr(obj, name), label or name, block=block))


def main():
    import numpy as np
    import jax.numpy as jnp

    from gins_data import make_gins_dataset
    from test_gvins_e2e import render_frame, W, H, FX
    from ic_gvins_tpu.core import quaternion as quat
    from ic_gvins_tpu.engine.config import parse_config
    from ic_gvins_tpu.models.gvins import GvinsModel
    from ic_gvins_tpu.vision import camera as vcam

    with_earth = os.environ.get("PROF_EARTH", "1") == "1"
    imu_data, gnss_data, truth = make_gins_dataset(with_earth=with_earth)
    rate_cut = int(15.2 * 200)
    imu_data = {k: np.asarray(v)[:rate_cut] for k, v in imu_data.items()}
    gnss_data = {k: np.asarray(v)[:14] for k, v in gnss_data.items()}
    cfg = parse_config(
        dict(
            initlength=3,
            imudatarate=200,
            iswithearth=with_earth,
            antlever=list(truth["lever"]),
            imumodel=dict(arw=0.1, vrw=0.1, gbstd=400.0, abstd=400.0, corrtime=1.0),
            gnssthreshold=20,
            optimize_windows_size=10,
            optimize_num_iterations=20,
            optimize_estimate_extrinsic=False,
            optimize_estimate_td=False,
            track_min_parallax=20,
            track_max_interval=0.5,
            track_max_features=200,
            reprojection_error_std=1.5,
            node_slots=20,
            landmark_slots=512,
            gnss_slots=24,
            reproj_slots=2048,
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

    rng = np.random.default_rng(42)
    n_pts = 800
    pts_w = np.stack(
        [rng.uniform(-10, 55, n_pts), rng.uniform(-25, 25, n_pts), rng.uniform(9, 13, n_pts)],
        axis=1,
    )
    camera = vcam.PinholeCamera.from_config(
        [FX, FX, 160.0, 120.0], [-0.05, 0.01, 0.0, 0.0], [W, H])
    frame_times = np.arange(0.05, imu_data["time"][-1] - 0.2, 0.1)
    rate = 200.0

    prof = SectionProf()

    def image_provider(k):
        t0 = time.perf_counter()
        t = frame_times[k]
        i = min(int(round(t * rate)) - 1, len(truth["p"]) - 1)
        Rwb = np.asarray(quat.to_matrix(jnp.asarray(truth["q"][i])))
        img = render_frame(camera, pts_w, Rwb, truth["p"][i])
        if prof.stack:
            prof.stack[-1][1] += time.perf_counter() - t0  # exclude render
        return img

    # --- leaf sections: module-level jits (device dispatch + wait) ---
    from ic_gvins_tpu.engine import estimator as est_mod
    from ic_gvins_tpu.engine import replay as replay_mod
    from ic_gvins_tpu.vision import tracking as trk_mod

    for mod, names in (
        (est_mod, ["_solve_jit", "_surgery_jit", "_marg_jit", "_preint_jit",
                   "_tables_dev_jit", "_drop_node_jit"]),
        (replay_mod, ["_prop_chunk_jit", "_peek_interp_jit"]),
        (trk_mod, ["_pyr_jit", "_lk_jit", "_ransac_jit", "_tri_jit",
                   "_detect_jit", "_detect_nomask_jit"]),
    ):
        for n in names:
            setattr(mod, n, prof.wrap_fn(getattr(mod, n), f"dev:{n}", block=True))

    model = GvinsModel(cfg)

    frames = [0]
    orig_track = model.tracker.track

    def track(frame, image):
        frames[0] += 1
        return orig_track(frame, image)
    model.tracker.track = track

    # --- host sections ---
    m = model
    for name in ["_process_frame", "_add_keyframe_nodes", "_drain_pending_gnss",
                 "_optimize_visual", "_build_reproj_table", "_assign_landmark_slots",
                 "_update_from_optimizer", "_visual_outlier_culling",
                 "_remove_second_new_frames", "_marginalize_visual",
                 "_write_statistics", "_merge_unused_nodes", "_fresh_tables_and_params"]:
        prof.wrap(m, name, f"gvins.{name}")
    tr = m.tracker
    for name in ["_track_impl", "_lk_fused", "features_detection", "triangulation",
                 "_prepare_mappoint_tracking", "_finish_mappoint_tracking",
                 "_prepare_reference_tracking", "_finish_reference_tracking",
                 "check_keyframe_state", "_keypoint_parallax", "_undis", "_dis",
                 "_pixel2cam"]:
        prof.wrap(tr, name, f"trk.{name}")
    def wrap_late():
        """est/prop are created during GNSS initialization — wrap on first frame."""
        for name in ["build_tables", "build_params", "optimize", "add_time_node",
                     "marginalize", "reintegrate_if_needed", "merge_node",
                     "node_state", "_pad_segment"]:
            prof.wrap(m.est, name, f"est.{name}")
        for name in ["propagate_to", "pose_interpolated"]:
            prof.wrap(m.prop, name, f"prop.{name}")

    # prop created during init: hook after first event loop via model.run wrap
    # Simplest: run warm first (prop exists after), then wrap for measured run.

    # warm replay: fills jit caches
    warm = GvinsModel(cfg)
    warm.run(imu_data, gnss_data, frame_times, image_provider)

    # measured replay
    wrap_done = [False]
    orig_pf = m._process_frame

    def pf_hook(stream, stamp, image):
        if not wrap_done[0] and m.prop is not None and m.est is not None:
            wrap_late()
            wrap_done[0] = True
        return orig_pf(stream, stamp, image)
    m._process_frame = pf_hook

    prof.enabled = True
    t0 = time.perf_counter()
    m.run(imu_data, gnss_data, frame_times, image_provider)
    wall = time.perf_counter() - t0
    prof.enabled = False

    nf = max(frames[0], 1)
    rows = sorted(prof.excl.items(), key=lambda kv: -kv[1])
    out = {
        "frames": frames[0],
        "wall_ms_per_frame": round(wall / nf * 1000, 3),
        "sections_ms_per_frame": {
            k: {"excl_ms": round(v / nf * 1000, 3),
                "calls": round(prof.calls[k] / nf, 2)}
            for k, v in rows if v / nf * 1000 >= 0.005
        },
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
