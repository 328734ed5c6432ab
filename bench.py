"""Benchmark: urban38-scale replay throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures the two dominating per-frame costs at KAIST urban38 scale
(1278x1022 imagery, 10 Hz camera, ~200 features in 256-slot tables, 20-node window with 512
landmarks / 2048 reprojection factors, 20 LM iterations split 5+15):

  frontend step: CLAHE + 4-level pyramid + ONE fused bidirectional
                 pyramidal LK batch (landmark + reference tracks share the
                 256-slot table, as in vision/tracking.py), fundamental
                 RANSAC, occupancy mask + blockwise Shi-Tomasi detection +
                 subpixel corner refinement
  backend step:  full two-pass sliding-window solve with chi2 surgery

Methodology: the tunneled TPU used in this environment has a large and
noisy per-dispatch round-trip latency AND caches repeated identical
dispatches, so per-call host timing measures the tunnel, not the chip.
Instead each step is chained K times ON DEVICE inside one jitted
lax.fori_loop (consecutive frames differ by a synthetic 2-3 px shift, the
typical inter-frame motion residual after the INS prediction; the feature
table is fed from the previous frame's tracks so nothing hoists), and the
per-frame time is (t(K) - t(1)) / (K - 1) over fresh inputs — one tunnel
round trip cancels and caching never triggers. This is the number a
co-located production deployment sees.

frames/sec = 1 / (t_frontend + kf * t_backend + mr * t_marg + host):
every term measured — chip-chained kernels for frontend/backend/
marginalization, and the host term + keyframe/marg ratios from a REAL
end-to-end GvinsModel.run replay (scripts/bench_replay_host.py, CPU
subprocess at production table sizing; host bookkeeping cost is backend-
independent). The keyframe/marg ratios are floored at 0.5 (the reference
optimizes roughly every other frame on urban38) so a gentle synthetic
world cannot flatter the number.

vs_baseline = frames_per_sec / 100: the north star is >=10x real-time on the
10 Hz urban38 stream (BASELINE.md), i.e. 100 frames/sec. >1.0 beats target.
"""

import json
import time


import jax

jax.config.update("jax_enable_x64", True)

W, H = 1278, 1022
F_MAX = 256  # track_max_features=200 rounded to the slot table size


def _timed_loop(run, make_init, k, reps=3):
    """(min_r t(k) - min_r t(1)) / (k - 1), with distinct inputs per call so
    the tunnel cache never hits. The trip count is TRACED so the k-frame and
    1-frame runs share one executable; k must be large enough that k * t_step
    dwarfs the tunnel's ~20-200 ms round-trip jitter, and min-of-reps is
    taken SEPARATELY for t(k) and t(1) (subtracting a same-rep pair keeps
    the jitter; independent minima approach the noise floor)."""
    import jax.numpy as jnp

    kk = jnp.int32(k)
    one = jnp.int32(1)
    jax.block_until_ready(run(make_init(0), kk))  # compile once
    jax.block_until_ready(run(make_init(1), one))
    tks, t1s = [], []
    for r in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run(make_init(10 + 2 * r), kk))
        tks.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        jax.block_until_ready(run(make_init(11 + 2 * r), one))
        t1s.append(time.perf_counter() - t0)
    return max((min(tks) - min(t1s)) / (k - 1), 1e-9)


def bench_frontend():
    import jax.numpy as jnp
    import numpy as np

    from ic_gvins_tpu.vision import features, lk, pyramid, ransac

    block_rows, block_cols, per_block = 5, 6, 7  # 200-px blocks for 1278x1022

    def frame(carry):
        img, pyr_prev, pts = carry
        img = jnp.roll(img, (2, 3), axis=(0, 1))
        pyr_cur = pyramid.build_pyramid(pyramid.clahe(img), lk.PYRAMID_LEVELS)
        valid = jnp.ones(F_MAX, bool)
        # landmark + reference tracks share one padded table (tracking.py
        # packs both into a single bidirectional batch)
        nxt, ok = lk.track_bidirectional(pyr_prev, pyr_cur, pts, pts, valid)
        inl, _ = ransac.fundamental_ransac(pts, nxt, ok.astype(jnp.float64), 1.5)
        ok = ok & inl
        mask = features.occupancy_mask(nxt, ok.astype(jnp.float32), (H, W), 15)
        corners, resp, cvalid = features.detect_blockwise(
            pyr_cur[0], mask, jnp.zeros(block_rows * block_cols, jnp.int32),
            block_rows=block_rows, block_cols=block_cols, per_block=per_block,
            min_distance=15,
        )
        corners = features.corner_subpix(pyr_cur[0], corners.astype(jnp.float32), cvalid)
        pts = jnp.clip(nxt, 30.0, 900.0)
        pts = pts.at[: block_rows * block_cols * per_block].set(
            jnp.clip(corners.astype(jnp.float32), 30.0, 900.0))
        return (img, pyr_cur, pts)

    @jax.jit
    def run(carry, n):
        return jax.lax.fori_loop(0, n, lambda i, c: frame(c), carry)

    def make_init(seed):
        r = np.random.default_rng(seed)
        img = jnp.asarray(r.uniform(0, 255, (H, W)), jnp.float32)
        pyr = [jnp.asarray(x) for x in
               jax.jit(lambda im: pyramid.build_pyramid(pyramid.clahe(im), lk.PYRAMID_LEVELS))(img)]
        pts = jnp.asarray(r.uniform(30, 900, (F_MAX, 2)), jnp.float32)
        return (img, pyr, pts)

    return _timed_loop(run, make_init, k=150)


def bench_backend():
    import jax.numpy as jnp
    import numpy as np

    import __graft_entry__ as ge
    from ic_gvins_tpu.solver import lm
    from ic_gvins_tpu.solver.problem import WindowConfig

    cfg = WindowConfig(N=20, L=512, G=24, R=2048, with_earth=False)
    params0, tables = ge._make_problem(cfg)

    @jax.jit
    def run(params, n):
        def body(i, p):
            out, _, _ = lm.solve_two_pass(p, tables, cfg, 20)
            # re-perturb (i-dependent) so successive solves do real work
            return out._replace(
                poses=out.poses.at[:, :3].add(1e-3 * (1.0 + (i % 3))))
        return jax.lax.fori_loop(0, n, body, params)

    def make_init(seed):
        r = np.random.default_rng(seed)
        return params0._replace(
            poses=params0.poses.at[:, :3].add(jnp.asarray(r.normal(0, 0.05, (cfg.N, 3)))),
            invdepths=params0.invdepths + jnp.asarray(r.normal(0, 0.01, cfg.L)),
        )

    return _timed_loop(run, make_init, k=40)


def bench_marg():
    """Chained marginalization (select + Schur + shift) at production sizing:
    the D=819 double-eigh pipeline the replay runs once per window slide."""
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from ic_gvins_tpu.factors import marginalization as marg
    from ic_gvins_tpu.solver.problem import WindowConfig

    cfg = WindowConfig(N=20, L=512, G=24, R=2048, with_earth=False)
    params0, tables0 = ge._make_problem(cfg)

    def marg_once(i, t):
        mt, mask, _ = marg.select_marg_factors(t, cfg, 1, 0)
        prior = marg.shift_prior(marg.marginalize(params0, mt, mask, cfg), cfg, 1)
        return t._replace(marg=prior)

    @jax.jit
    def run(t, n):
        return jax.lax.fori_loop(0, n, marg_once, t)

    def make_init(seed):
        import numpy as np

        r = np.random.default_rng(seed)
        g = tables0.gnss
        return tables0._replace(gnss=g._replace(
            blh=g.blh + jnp.asarray(r.normal(0, 0.01, g.blh.shape))))

    return _timed_loop(run, make_init, k=20)


def bench_preint():
    """Chained IMU preintegration (512-sample fused scan, the per-keyframe
    cost of addNewTimeNode)."""
    import jax.numpy as jnp
    import numpy as np

    from ic_gvins_tpu.core.types import ImuBatch, IntegrationParams, NavState
    from ic_gvins_tpu.ins import preintegration as pre

    S = 512
    params = IntegrationParams.default()

    def step(i, st):
        imu = ImuBatch(
            time=jnp.arange(1, S + 1) * 0.005,
            dt=jnp.full(S, 0.005).at[0].set(0.0),
            dtheta=jnp.full((S, 3), 1e-4) * (1.0 + i),
            dvel=jnp.full((S, 3), 0.005 * 9.8 / 3),
            odovel=jnp.zeros(S),
        )
        summ = pre.preintegrate(params, imu, st, with_earth=False)
        return st._replace(p=summ.end_p, q=summ.end_q, v=summ.end_v)

    @jax.jit
    def run(st, n):
        return jax.lax.fori_loop(0, n, step, st)

    def make_init(seed):
        import numpy as np

        r = np.random.default_rng(seed)
        return NavState.identity()._replace(p=jnp.asarray(r.normal(0, 1, 3)))

    return _timed_loop(run, make_init, k=50)


def bench_mech():
    """Chained INS mechanization (256-sample chunk, the per-frame
    propagate_to cost)."""
    import jax.numpy as jnp

    from ic_gvins_tpu.core.types import ImuBatch, NavState
    from ic_gvins_tpu.ins import mechanization as mech

    S = 256
    cfg = mech.MechConfig(gravity=jnp.array([0.0, 0, 9.8]), iewn=jnp.zeros(3),
                          iswithearth=False)

    def step(i, st):
        imu = ImuBatch(
            time=jnp.arange(1, S + 1) * 0.005,
            dt=jnp.full(S, 0.005),
            dtheta=jnp.full((S, 3), 1e-4) * (1.0 + i),
            dvel=jnp.full((S, 3), 0.005 * 9.8 / 3),
            odovel=jnp.zeros(S),
        )
        out, _ = mech.mechanize_scan(cfg, st, imu)
        return out

    @jax.jit
    def run(st, n):
        return jax.lax.fori_loop(0, n, step, st)

    def make_init(seed):
        import numpy as np

        r = np.random.default_rng(seed)
        return NavState.identity()._replace(p=jnp.asarray(r.normal(0, 1, 3)))

    return _timed_loop(run, make_init, k=100)


def _replay_host_stats():
    """Run scripts/bench_replay_host.py (CPU subprocess): measured host-side
    cost per frame of the REAL model.run loop plus the run's own keyframe /
    marginalization ratios. See that file's docstring for the methodology."""
    import os
    import subprocess
    import sys

    script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "scripts", "bench_replay_host.py")
    out = subprocess.run([sys.executable, script], capture_output=True,
                         text=True, timeout=1800)
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def _probe_device(timeout_s=180):
    """The tunneled TPU backend can be unreachable (jax.devices() then hangs
    forever, holding the backend-init lock). Probe from a SUBPROCESS; on
    timeout pin this process to CPU before it ever touches a device, so the
    bench still reports an honest (clearly labeled) number."""
    import subprocess
    import sys

    code = ("import jax, jax.numpy as jnp;"
            "jax.block_until_ready(jnp.zeros(8) + 1.0);"
            "print(jax.devices()[0].platform)")
    try:
        out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                             text=True, timeout=timeout_s)
        lines = out.stdout.strip().splitlines()
        if lines:
            return lines[-1]
    except subprocess.TimeoutExpired:
        pass
    jax.config.update("jax_platforms", "cpu")
    return None


def main():
    platform = _probe_device()
    host = _replay_host_stats()
    t_backend = bench_backend()
    t_marg = bench_marg()
    t_preint = bench_preint()
    t_mech = bench_mech()
    t_frontend = bench_frontend()
    # measured ratios from the real replay, floored at the reference's
    # urban38 behavior (optimization + marginalization roughly every other
    # frame) so a gentle synthetic world cannot flatter the number
    cpf = host["device_calls_per_frame"]
    kf_ratio = max(host["kf_ratio"], 0.5)
    marg_ratio = max(host["marg_ratio"], 0.5)
    preint_pf = max(cpf.get("preint", 0.0), kf_ratio)
    mech_pf = max(cpf.get("mech", 0.0), 1.0)
    frame_time = (t_frontend + kf_ratio * t_backend + marg_ratio * t_marg
                  + preint_pf * t_preint + mech_pf * t_mech + host["host_s"])
    fps = 1.0 / frame_time
    print(
        json.dumps(
            {
                "metric": "urban38-scale replay frames/sec (frontend + kf*two-pass BA + marg + preint + mech + measured host cost) per chip",
                "value": round(fps, 2),
                "unit": "frames/sec",
                "vs_baseline": round(fps / 100.0, 4),
                "detail": {
                    "backend": platform or "cpu (TPU tunnel unreachable at bench time)",
                    "frontend_ms": round(t_frontend * 1000, 3),
                    "backend_ms": round(t_backend * 1000, 3),
                    "marg_ms": round(t_marg * 1000, 3),
                    "preint_ms": round(t_preint * 1000, 3),
                    "mech_ms": round(t_mech * 1000, 3),
                    "host_ms": round(host["host_s"] * 1000, 3),
                    "kf_ratio": kf_ratio,
                    "marg_ratio": marg_ratio,
                    "replay_cpu_e2e": host,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
