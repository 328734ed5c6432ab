"""Production-envelope replay: full-resolution frames through the REAL model.

KAIST urban38 operating regime (/root/reference/README.md:117-133):
1278x1022 imagery at 10 Hz, 200 Hz IMU, 1 Hz GNSS, minutes of driving —
the first harness where the actual GvinsModel.run path (tracker cadence,
map growth, marginalization pressure, memory) executes full-resolution
frames end to end, instead of kernel-level proxies. A synthetic ground
scene is laid out as a corridor of textured points along the whole
trajectory so the frontend sees realistic feature turnover at the real
image size.

Asserts trajectory accuracy and records throughput + peak RSS into
PRODUCTION.json (committed artifact — VERDICT r2 "Next round" #4).

CPU by default (host behavior is backend-independent; the chip only
shrinks the kernel terms). Duration via PROD_DURATION_S (default 300 s);
use a small value for a smoke run.
"""

import json
import os
import resource
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))

W, H = 1278, 1022
FX = 700.0


def _render(camera, pts_w, Rwb, twb, xx, yy):
    """Gaussian blobs at distorted projections over a flat background
    (same construction as tests/test_gvins_e2e.render_frame, full-res)."""
    import numpy as np
    import jax.numpy as jnp

    from ic_gvins_tpu.vision import camera as vcam

    img = np.full((H, W), 90.0)
    pc = (pts_w - twb) @ Rwb
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
                    -((xx[y0:y1, x0:x1] - x) ** 2 + (yy[y0:y1, x0:x1] - y) ** 2)
                    / (2 * 2.2**2))
    return np.clip(img, 0, 255)


def main():
    import numpy as np
    import jax.numpy as jnp

    from gins_data import make_gins_dataset
    from ic_gvins_tpu.core import quaternion as quat
    from ic_gvins_tpu.engine.config import parse_config
    from ic_gvins_tpu.models.gvins import GvinsModel
    from ic_gvins_tpu.vision import camera as vcam

    duration = float(os.environ.get("PROD_DURATION_S", "300"))
    imu_data, gnss_data, truth = make_gins_dataset(
        turn_duration=duration - 6.0, with_earth=True)

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
            node_slots=20,
            landmark_slots=512,
            gnss_slots=24,
            reproj_slots=2048,
            cam0=dict(
                intrinsic=[FX, FX, W / 2.0, H / 2.0],
                distortion=[-0.05, 0.01, 0.0, 0.0],
                resolution=[W, H],
                q_b_c=[0.0, 0.0, 0.0, 1.0],
                t_b_c=[0.0, 0.0, 0.0],
                td_b_c=0.0,
            ),
        )
    )

    # ground-scene corridor: textured points scattered +-20 m around the
    # whole trajectory, 10-13 m below it, dense enough that every full-res
    # frame sees ~100+ candidate features
    rng = np.random.default_rng(7)
    rate = 200.0
    anchors = truth["p"][:: int(rate)]  # one per second (~2.6 m apart)
    per_anchor = 120
    pts = []
    for a in anchors:
        off = np.stack(
            [rng.uniform(-22, 22, per_anchor), rng.uniform(-22, 22, per_anchor),
             rng.uniform(9, 13, per_anchor)], axis=1)
        # anchor xy + scatter, ground plane 9-13 m below the (planar) path
        pts.append(a * np.array([1.0, 1.0, 0.0]) + off)
    pts_w = np.concatenate(pts)

    camera = vcam.PinholeCamera.from_config(
        [FX, FX, W / 2.0, H / 2.0], [-0.05, 0.01, 0.0, 0.0], [W, H])
    frame_times = np.arange(0.05, imu_data["time"][-1] - 0.2, 0.1)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)

    # cell index over the scene so each frame only projects nearby points
    cell = 30.0
    keys = np.floor(pts_w[:, :2] / cell).astype(np.int64)
    from collections import defaultdict

    grid = defaultdict(list)
    for i, (cx, cy) in enumerate(keys):
        grid[(cx, cy)].append(i)
    grid = {k: np.asarray(v) for k, v in grid.items()}

    render_s = [0.0]

    def image_provider(k):
        t0 = time.perf_counter()
        t = frame_times[k]
        i = min(int(round(t * rate)) - 1, len(truth["p"]) - 1)
        Rwb = np.asarray(quat.to_matrix(jnp.asarray(truth["q"][i])))
        p = truth["p"][i]
        cx, cy = int(np.floor(p[0] / cell)), int(np.floor(p[1] / cell))
        idx = [grid[(cx + dx, cy + dy)] for dx in (-1, 0, 1) for dy in (-1, 0, 1)
               if (cx + dx, cy + dy) in grid]
        local = pts_w[np.concatenate(idx)] if idx else pts_w[:0]
        img = _render(camera, local, Rwb, p, xx, yy)
        render_s[0] += time.perf_counter() - t0
        return img

    model = GvinsModel(cfg)
    t0 = time.perf_counter()
    traj = model.run(imu_data, gnss_data, frame_times, image_provider)
    wall = time.perf_counter() - t0 - render_s[0]

    # accuracy: node positions vs truth (constant local-frame offset)
    offset = truth["gnss_local"][0]
    errs = []
    for row in traj:
        t, p = row[0], row[1:4]
        i = int(round(t * rate)) - 1
        if 0 <= i < len(truth["p"]):
            errs.append(np.linalg.norm(p + offset - truth["p"][i]))
    errs = np.asarray(errs)
    ate_rmse = float(np.sqrt(np.mean(errs**2)))
    n_frames = len(frame_times)

    result = dict(
        regime="urban38-envelope synthetic",
        resolution=[W, H],
        duration_s=round(float(imu_data["time"][-1]), 1),
        frames=n_frames,
        imu_rate_hz=200,
        cam_rate_hz=10,
        gnss_rate_hz=1,
        wall_s=round(wall, 1),
        fps=round(n_frames / wall, 3),
        ate_rmse_m=round(ate_rmse, 4),
        ate_max_m=round(float(errs.max()), 4),
        final_state=model.state,
        nodes=len(traj),
        peak_rss_mb=round(resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0, 1),
        backend=jax.devices()[0].platform,
        ts=time.strftime("%Y-%m-%dT%H:%M:%S"),
    )
    print(json.dumps(result))

    assert model.state == "TRACKING_NORMAL", model.state
    assert ate_rmse < 0.25, f"ATE RMSE {ate_rmse:.3f} m"

    with open(os.path.join(_REPO, "PRODUCTION.json"), "w") as f:
        json.dump(result, f, indent=1)
        f.write("\n")


if __name__ == "__main__":
    main()
