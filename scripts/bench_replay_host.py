"""Host-path cost of the real replay loop, measured end-to-end on CPU.

Child process of bench.py (CPU-pinned: the frame path's host bookkeeping —
map/window management, table building, python orchestration — is what this
measures, and it is resolution- and backend-independent). Runs a full
synthetic GVINS replay with PRODUCTION table sizing (20 node slots, 512
landmark slots, 2048 reprojection slots, 20 LM iterations) at reduced
image resolution, then subtracts chained-kernel device time measured at the
SAME sizing on the SAME backend. What remains is the host cost per frame a
co-located TPU deployment pays on top of the chip kernels:

  host_s = wall/frame - t_fe_cpu - kf * t_be_cpu - mr * t_marg_cpu

Every term is measured (no modeling): wall from model.run (image rendering
excluded via a timed provider), kf = optimization episodes / frames and
mr = marginalizations / frames counted from the run itself.

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

    imu_data, gnss_data, truth = make_gins_dataset()
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

    t0 = time.perf_counter()
    model.run(imu_data, gnss_data, frame_times, image_provider)
    wall = time.perf_counter() - t0 - render_s[0]

    frames = max(counts["frames"], 1)
    kf = counts["episodes"] / frames
    mr = counts["margs"] / frames

    # chained device-kernel baselines at the same sizing on the same backend
    t_fe = _bench_frontend_cpu()
    t_be, t_marg = _bench_backend_cpu()

    host_s = max(wall / frames - t_fe - kf * t_be - mr * t_marg, 0.0)
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
                t_fe_cpu=round(t_fe, 4),
                t_be_cpu=round(t_be, 4),
                t_marg_cpu=round(t_marg, 4),
            )
        )
    )


def _bench_frontend_cpu(k=20):
    """Chained frontend kernels at the replay's 320x240 / 256-slot sizing."""
    import numpy as np
    import jax.numpy as jnp

    from test_gvins_e2e import W, H
    from ic_gvins_tpu.vision import features, lk, pyramid, ransac

    F = 256

    def frame(carry):
        img, pyr_prev, pts = carry
        img = jnp.roll(img, (2, 3), axis=(0, 1))
        pyr_cur = pyramid.build_pyramid(pyramid.clahe(img), lk.PYRAMID_LEVELS)
        valid = jnp.ones(F, bool)
        nxt, ok = lk.track_bidirectional(pyr_prev, pyr_cur, pts, pts, valid)
        inl, _ = ransac.fundamental_ransac(pts, nxt, ok.astype(jnp.float64), 1.5)
        mask = features.occupancy_mask(nxt, (ok & inl).astype(jnp.float32), (H, W), 15)
        corners, resp, cvalid = features.detect_blockwise(
            pyr_cur[0], mask, jnp.zeros(12, jnp.int32),
            block_rows=3, block_cols=4, per_block=7, min_distance=15)
        corners = features.corner_subpix(pyr_cur[0], corners.astype(jnp.float32), cvalid)
        pts = jnp.clip(nxt, 20.0, 200.0)
        return (img, pyr_cur, pts)

    import jax as _jax

    run = _jax.jit(lambda c, n: _jax.lax.fori_loop(0, n, lambda i, cc: frame(cc), c))
    r = np.random.default_rng(0)
    img = jnp.asarray(r.uniform(0, 255, (H, W)), jnp.float32)
    pyr = [jnp.asarray(x) for x in
           _jax.jit(lambda im: pyramid.build_pyramid(pyramid.clahe(im), lk.PYRAMID_LEVELS))(img)]
    pts = jnp.asarray(r.uniform(20, 200, (F, 2)), jnp.float32)
    carry = (img, pyr, pts)
    _jax.block_until_ready(run(carry, jnp.int32(1)))
    t0 = time.perf_counter()
    _jax.block_until_ready(run(carry, jnp.int32(k)))
    t1 = time.perf_counter()
    _jax.block_until_ready(run(carry, jnp.int32(1)))
    t2 = time.perf_counter()
    return max(((t1 - t0) - (t2 - t1)) / (k - 1), 1e-9)


def _bench_backend_cpu(k=4):
    """Chained two-pass solve + marginalization at production window sizing."""
    import jax as _jax
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from ic_gvins_tpu.factors import marginalization as marg
    from ic_gvins_tpu.solver import lm
    from ic_gvins_tpu.solver.problem import WindowConfig

    cfg = WindowConfig(N=20, L=512, G=24, R=2048, with_earth=False)
    params0, tables = ge._make_problem(cfg)

    solve = _jax.jit(
        lambda p, n: _jax.lax.fori_loop(
            0, n,
            lambda i, pp: lm.solve_two_pass(pp, tables, cfg, 20)[0]._replace(
                poses=pp.poses.at[:, :3].add(1e-4)),
            p))
    _jax.block_until_ready(solve(params0, jnp.int32(1)))
    t0 = time.perf_counter()
    _jax.block_until_ready(solve(params0, jnp.int32(k)))
    t1 = time.perf_counter()
    _jax.block_until_ready(solve(params0, jnp.int32(1)))
    t2 = time.perf_counter()
    t_be = max(((t1 - t0) - (t2 - t1)) / (k - 1), 1e-9)

    def marg_once(i, t):
        mt, mask, _ = marg.select_marg_factors(t, cfg, 1, 0)
        prior = marg.shift_prior(
            marg.marginalize(params0, mt, mask, cfg), cfg, 1)
        return t._replace(marg=prior)

    mrun = _jax.jit(lambda t, n: _jax.lax.fori_loop(0, n, marg_once, t))
    _jax.block_until_ready(mrun(tables, jnp.int32(1)))
    t0 = time.perf_counter()
    _jax.block_until_ready(mrun(tables, jnp.int32(k)))
    t1 = time.perf_counter()
    _jax.block_until_ready(mrun(tables, jnp.int32(1)))
    t2 = time.perf_counter()
    t_marg = max(((t1 - t0) - (t2 - t1)) / (k - 1), 1e-9)
    return t_be, t_marg


if __name__ == "__main__":
    main()
