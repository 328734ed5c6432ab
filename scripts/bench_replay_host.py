"""Host-path cost of the real replay loop, measured end-to-end on CPU.

Child process of bench.py (CPU-pinned: the frame path's host bookkeeping —
map/window management, table building, python orchestration — is what this
measures, and it is resolution- and backend-independent). Runs a full
synthetic GVINS replay with PRODUCTION table sizing (20 node slots, 512
landmark slots, 2048 reprojection slots, 20 LM iterations) at reduced
image resolution, then subtracts chained-kernel device time measured at the
SAME sizing on the SAME backend. What remains is the host cost per frame a
co-located TPU deployment pays on top of the chip kernels:

  host_s = (wall - sum of directly-timed device calls) / frames

Every device entry point (pyramid/LK/RANSAC/triangulation/detection,
solves, marginalization, preintegration, mechanization) is wrapped with a
block_until_ready timer, so host_s is a direct measurement of the python
orchestration cost; kf = optimization episodes / frames and
mr = marginalizations / frames are counted from the run itself. Image
rendering is excluded via a timed provider.

Prints ONE JSON line:
  {"host_s": ..., "kf_ratio": ..., "marg_ratio": ..., "fps_cpu_e2e": ...,
   "frames": N, "episodes": N, "margs": N}
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


def main():
    import numpy as np
    import jax.numpy as jnp

    from gins_data import make_gins_dataset
    from test_gvins_e2e import render_frame, W, H, FX
    from ic_gvins_tpu.core import quaternion as quat
    from ic_gvins_tpu.engine.config import parse_config
    from ic_gvins_tpu.models.gvins import GvinsModel
    from ic_gvins_tpu.vision import camera as vcam

    # iswithearth=true: the reference's shipped configuration — the host
    # cost under test includes the per-frame iewn feedback
    imu_data, gnss_data, truth = make_gins_dataset(with_earth=True)
    # 15 s slice: long enough for TRACKING_NORMAL + sliding-window
    # marginalizations (stable per-frame host cost), short enough that the
    # warm + measured replays fit a bench budget
    rate_cut = int(15.2 * 200)
    imu_data = {k: np.asarray(v)[:rate_cut] for k, v in imu_data.items()}
    gnss_data = {k: np.asarray(v)[:14] for k, v in gnss_data.items()}
    cfg = parse_config(
        dict(
            initlength=3,
            imudatarate=200,
            iswithearth=True,
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
            # production table sizing — the host bookkeeping cost under test
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

    render_s = [0.0]

    def image_provider(k):
        t0 = time.perf_counter()
        t = frame_times[k]
        i = min(int(round(t * rate)) - 1, len(truth["p"]) - 1)
        Rwb = np.asarray(quat.to_matrix(jnp.asarray(truth["q"][i])))
        img = render_frame(camera, pts_w, Rwb, truth["p"][i])
        render_s[0] += time.perf_counter() - t0
        return img

    # time every device entry point directly (module-level jits wrapped
    # before model construction): host_s is then wall minus MEASURED device
    # time — no proxy mismatch. block_until_ready forfeits no overlap (the
    # replay converts results to numpy immediately anyway).
    import jax as _jax
    from ic_gvins_tpu.engine import estimator as est_mod
    from ic_gvins_tpu.engine import replay as replay_mod
    from ic_gvins_tpu.vision import tracking as trk_mod

    dev = dict(frontend=0.0, solve=0.0, marg=0.0, preint=0.0, mech=0.0)
    ncalls = dict(frontend=0, solve=0, marg=0, preint=0, mech=0)

    def timed(fn, cat):
        def w(*a, **k):
            t0 = time.perf_counter()
            r = _jax.block_until_ready(fn(*a, **k))
            dev[cat] += time.perf_counter() - t0
            ncalls[cat] += 1
            return r
        return w

    est_mod._solve_jit = timed(est_mod._solve_jit, "solve")
    est_mod._surgery_jit = timed(est_mod._surgery_jit, "solve")
    est_mod._marg_jit = timed(est_mod._marg_jit, "marg")
    est_mod._drop_node_jit = timed(est_mod._drop_node_jit, "marg")
    est_mod._preint_jit = timed(est_mod._preint_jit, "preint")
    # table unpacking is a real device dispatch on the episode path — left
    # unwrapped it executes on the CPU backend inside the "host" residual
    # and overstates host_s by ~0.5 ms/frame
    est_mod._tables_dev_jit = timed(est_mod._tables_dev_jit, "solve")
    replay_mod._prop_chunk_jit = timed(replay_mod._prop_chunk_jit, "mech")
    replay_mod._peek_interp_jit = timed(replay_mod._peek_interp_jit, "mech")
    for name in ("_pyr_jit", "_lk_jit", "_ransac_jit", "_tri_jit",
                 "_detect_jit", "_detect_nomask_jit"):
        setattr(trk_mod, name, timed(getattr(trk_mod, name), "frontend"))

    model = GvinsModel(cfg)

    # count frames / episodes / marginalizations from the run itself
    counts = dict(frames=0, episodes=0, margs=0)
    orig_track = model.tracker.track
    orig_opt = model._optimize_visual
    orig_marg = model._marginalize_visual

    def track(frame, image):
        counts["frames"] += 1
        return orig_track(frame, image)

    def optimize():
        counts["episodes"] += 1
        return orig_opt()

    def marginalize():
        counts["margs"] += 1
        return orig_marg()

    model.tracker.track = track
    model._optimize_visual = optimize
    model._marginalize_visual = marginalize

    # warm the jit caches with a FULL replay (reaches TRACKING_NORMAL,
    # marginalization and every solver variant) so the measured run is
    # compile-free — compiles are one-time costs a deployment amortizes
    warm = GvinsModel(cfg)
    warm.run(imu_data, gnss_data, frame_times, image_provider)
    render_s[0] = 0.0
    for k in dev:
        dev[k] = 0.0
        ncalls[k] = 0

    t0 = time.perf_counter()
    model.run(imu_data, gnss_data, frame_times, image_provider)
    wall = time.perf_counter() - t0 - render_s[0]

    frames = max(counts["frames"], 1)
    kf = counts["episodes"] / frames
    mr = counts["margs"] / frames

    t_device = sum(dev.values())
    host_s = max((wall - t_device) / frames, 0.0)
    print(
        json.dumps(
            dict(
                host_s=round(host_s, 6),
                kf_ratio=round(kf, 4),
                marg_ratio=round(mr, 4),
                fps_cpu_e2e=round(frames / wall, 2),
                frames=counts["frames"],
                episodes=counts["episodes"],
                margs=counts["margs"],
                device_s_cpu={k: round(v, 3) for k, v in dev.items()},
                device_calls_per_frame={
                    k: round(n / frames, 3) for k, n in ncalls.items()},
                solver_tiers=dict(model.tier_counts),
                marg_tiers=dict(model.tier_counts_marg),
            )
        )
    )


if __name__ == "__main__":
    main()
