"""Benchmark: urban38-scale replay throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures the two dominating per-frame costs at KAIST urban38 scale
(1278x1022 imagery, 10 Hz camera, ~200 features, 20-node window with 512
landmarks / 2048 reprojection factors, 20 LM iterations split 5+15):

  frontend step: CLAHE + 4-level pyramid + two bidirectional pyramidal LK
                 batches (landmark + reference tracks, 512-slot tables)
                 + blockwise Shi-Tomasi detection
  backend step:  full two-pass sliding-window solve with chi2 surgery

frames/sec = 1 / (t_frontend + kf_ratio * t_backend), kf_ratio = 0.5
(the reference triggers an optimization roughly every other frame on
urban38's 10 Hz stream).

vs_baseline = frames_per_sec / 100: the north star is >=10x real-time on the
10 Hz urban38 stream (BASELINE.md), i.e. 100 frames/sec. >1.0 beats target.
"""

import json
import time

import jax

jax.config.update("jax_enable_x64", True)

W, H = 1278, 1022
F_MAX = 512


def bench_frontend():
    import jax.numpy as jnp
    import numpy as np

    from ic_gvins_tpu.vision import features, lk, pyramid

    rng = np.random.default_rng(0)
    img_np = rng.uniform(0, 255, (H, W))

    block_rows, block_cols, per_block = 5, 6, 7  # 200-px blocks for 1278x1022

    # separately-jitted kernels (smaller compiles than one megakernel; the
    # tunnel dispatch latency after warmup is sub-ms so per-kernel timing
    # reflects steady-state throughput)
    preprocess = jax.jit(lambda img: pyramid.build_pyramid(pyramid.clahe(img), lk.PYRAMID_LEVELS))
    occupancy = jax.jit(
        lambda pts, v: features.occupancy_mask(pts, v.astype(jnp.float32), (H, W), 15)
    )

    img = jnp.asarray(img_np, jnp.float32)
    pts = jnp.asarray(rng.uniform(30, 900, (F_MAX, 2)), jnp.float32)
    valid = jnp.ones(F_MAX, bool)
    zero_counts = jnp.zeros(block_rows * block_cols, jnp.int32)

    def frame_step(pyr_prev):
        pyr_cur = preprocess(img)
        nxt1, ok1 = lk.track_bidirectional(pyr_prev, pyr_cur, pts, pts, valid)
        nxt2, ok2 = lk.track_bidirectional(pyr_prev, pyr_cur, pts, pts, valid)
        mask = occupancy(nxt2, ok2)
        corners, resp, cvalid = features.detect_blockwise(
            pyr_cur[0], mask, zero_counts,
            block_rows=block_rows, block_cols=block_cols, per_block=per_block,
            min_distance=15,
        )
        return pyr_cur, corners

    pyr0 = preprocess(img)
    pyr, corners = frame_step(pyr0)  # warmup/compile
    jax.block_until_ready(corners)

    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        pyr, corners = frame_step(pyr)
    jax.block_until_ready(corners)
    return (time.perf_counter() - t0) / n


def bench_backend():
    import jax.numpy as jnp
    import numpy as np

    import __graft_entry__ as ge
    from ic_gvins_tpu.solver import lm
    from ic_gvins_tpu.solver.problem import WindowConfig

    cfg = WindowConfig(N=20, L=512, G=24, R=2048, with_earth=False)
    params, tables = ge._make_problem(cfg)
    rng = np.random.default_rng(0)
    params = params._replace(
        poses=params.poses.at[:, :3].add(jnp.asarray(rng.normal(0, 0.05, (cfg.N, 3)))),
        invdepths=params.invdepths + jnp.asarray(rng.normal(0, 0.01, cfg.L)),
    )
    step = jax.jit(lambda p, t: lm.solve_two_pass(p, t, cfg, 20)[0])
    out = step(params, tables)
    jax.block_until_ready(out)

    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        out = step(params, tables)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    # backend first: on the tunneled axon TPU, running the image kernels
    # first evicts the solver's device-resident tables and every timed call
    # then re-uploads ~13 MB through the tunnel (~2 s artifact); measured
    # alone the two-pass solve is ~0.1-1 ms
    t_backend = bench_backend()
    t_frontend = bench_frontend()
    kf_ratio = 0.5
    frame_time = t_frontend + kf_ratio * t_backend
    fps = 1.0 / frame_time
    print(
        json.dumps(
            {
                "metric": "urban38-scale replay frames/sec (frontend track + 0.5x two-pass BA) per chip",
                "value": round(fps, 2),
                "unit": "frames/sec",
                "vs_baseline": round(fps / 100.0, 4),
                "detail": {
                    "frontend_ms": round(t_frontend * 1000, 2),
                    "backend_ms": round(t_backend * 1000, 2),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
