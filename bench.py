"""Benchmark: urban38-scale replay throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} — ALWAYS,
inside a hard deadline, no matter what the TPU tunnel or the stages do.

Architecture (survivability first — round 2's run was killed at the driver
budget before printing anything):

  parent process (this file, no jax import): computes a global deadline
      (env BENCH_DEADLINE_S, default 840 s), spawns the child, streams
      `STAGE {...}` result lines as they complete, kills the child at the
      deadline, merges fresh results over the committed PERF.json stale
      values, and prints the single JSON line. rc is 0 even if every stage
      died — skipped/failed terms fall back to the last recorded value and
      are listed under detail.stale.
  child process (`bench.py --child`): probes the device in a sub-subprocess
      (the tunnel can hang jax.devices() forever), enables the persistent
      XLA compile cache (.jax_cache/ — driver re-runs skip the ~2 min/stage
      tunnel compiles), runs the host-replay stage (cached in PERF.json
      keyed by a source-tree hash; refreshed only when the tree changed),
      then the five device stages in descending fps-impact order, emitting
      each as soon as it finishes. Device stages only run when the probe
      says the real TPU is reachable — a CPU fallback would chain full-res
      frames for minutes and says nothing about the chip.

Measured terms at KAIST urban38 scale (1278x1022 imagery, 10 Hz camera,
~200 features in 256-slot tables, 20-node window with 512 landmarks / 2048
reprojection factors, 20 LM iterations split 5+15, iswithearth=true as the
reference ships it — /root/reference/config/gvins.yaml:18):

  frontend: CLAHE + 4-level pyramid + ONE fused bidirectional pyramidal LK
            batch + fundamental RANSAC + occupancy mask + blockwise
            Shi-Tomasi detection + subpixel refinement
  backend:  full two-pass sliding-window solve with chi2 surgery
  marg:     select + Schur + shift of the marginalization prior
  preint:   512-sample fused preintegration scan
  mech:     256-sample mechanization chunk

Methodology: the tunneled TPU has large noisy per-dispatch round-trip
latency AND caches repeated identical dispatches, so per-call host timing
measures the tunnel, not the chip. Each stage is chained K times ON DEVICE
inside one jitted lax.fori_loop with fresh inputs per call, and the
per-frame time is (t(K) - t(1)) / (K - 1) — one tunnel round trip cancels
and caching never triggers. This is the number a co-located production
deployment sees.

frames/sec = 1 / (t_frontend + kf * t_backend + mr * t_marg
                  + preint_pf * t_preint + mech_pf * t_mech + host):
host cost and the keyframe/marg ratios come from a REAL end-to-end
GvinsModel.run replay (scripts/bench_replay_host.py, CPU subprocess at
production table sizing; host bookkeeping cost is backend-independent).
Ratios are floored at 0.5 (the reference optimizes roughly every other
frame on urban38) so a gentle synthetic world cannot flatter the number.

Ratio provenance: the replay world above measures kf_ratio ~ 0.24 /
marg_ratio ~ 0.11 (PERF.json replay_cpu_e2e), and the 300 s hard-cadence
world (tests/test_gvins_stability_e2e.py, track_min_parallax=8 — an
urban-like keyframe-on-most-parallax cadence) measures both below 0.5 as
well; its gate fails if either measured cadence ever EXCEEDS the floor, so
0.5 stays a conservative upper bound, never an optimistic one.

vs_baseline = frames_per_sec / 100: the north star is >=10x real-time on
the 10 Hz urban38 stream (BASELINE.md), i.e. 100 frames/sec.
"""

import hashlib
import json
import os
import subprocess
import sys
import threading
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
_PERF_PATH = os.path.join(_HERE, "PERF.json")
_CACHE_DIR = os.path.join(_HERE, ".jax_cache")
_CHILD_LOG = os.path.join(_HERE, ".bench_child.log")

# fps-impact order; est = conservative first-run seconds over the tunnel
# (compile + timed loops) used by the child to skip stages it cannot finish
_DEVICE_STAGES = (
    ("frontend", 300),
    ("backend", 300),
    ("backend_small", 240),
    ("marg", 180),
    ("marg_small", 150),
    ("preint", 120),
    ("mech", 90),
)

# absolute last resort when a term exists neither fresh nor in PERF.json:
# round-1/2 measurements (BENCH_r01.json + committed round-2 kernel wins)
_FALLBACK = {
    "frontend": 0.0194,
    "backend": 0.0222,
    "backend_small": 0.0222,
    "marg": 0.008,
    "marg_small": 0.008,
    "preint": 0.003,
    "mech": 0.003,
    "host": {"host_s": 0.0116, "kf_ratio": 0.5, "marg_ratio": 0.5,
             "device_calls_per_frame": {}},
}


def _load_perf():
    try:
        with open(_PERF_PATH) as f:
            return json.load(f)
    except Exception:
        return {}


def _save_perf(perf):
    try:
        with open(_PERF_PATH, "w") as f:
            json.dump(perf, f, indent=1, sort_keys=True)
            f.write("\n")
    except Exception:
        pass


def _tree_hash():
    """Cache key for the host-replay stage: hash of every source the replay
    loop executes. The host cost only changes when the code does."""
    files = []
    for sub in ("ic_gvins_tpu",):
        for root, _dirs, names in os.walk(os.path.join(_HERE, sub)):
            files += [os.path.join(root, n) for n in names if n.endswith(".py")]
    files += [
        os.path.join(_HERE, "scripts", "bench_replay_host.py"),
        os.path.join(_HERE, "tests", "gins_data.py"),
        os.path.join(_HERE, "tests", "synthetic.py"),
        os.path.join(_HERE, "tests", "test_gvins_e2e.py"),
    ]
    h = hashlib.sha256()
    for f in sorted(files):
        try:
            with open(f, "rb") as fh:
                h.update(f.encode())
                h.update(fh.read())
        except OSError:
            pass
    return h.hexdigest()[:16]


# ---------------------------------------------------------------------------
# child: the actual measurements
# ---------------------------------------------------------------------------


def _timed_loop(run, make_init, k, reps=3):
    """(min_r t(k) - min_r t(1)) / (k - 1), with distinct inputs per call so
    the tunnel cache never hits. The trip count is TRACED so the k-frame and
    1-frame runs share one executable; k must be large enough that k * t_step
    dwarfs the tunnel's ~20-200 ms round-trip jitter, and min-of-reps is
    taken SEPARATELY for t(k) and t(1) (subtracting a same-rep pair keeps
    the jitter; independent minima approach the noise floor)."""
    import jax
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
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ic_gvins_tpu.vision import features, lk, pyramid, ransac

    W, H = 1278, 1022
    F_MAX = 256  # track_max_features=200 rounded to the slot table size
    block_rows, block_cols, per_block = 5, 6, 7  # 200-px blocks for 1278x1022
    # camera pan: each frame is a (H, W) window sliding (2, 3) px over a
    # larger static world texture. The previous jnp.roll world had a
    # WRAPPING SEAM — an artificial teleporting edge whose extreme gradient
    # out-ranked every real corner in the blocks it crossed, so detection
    # re-seeded features onto it every frame and each burned the full
    # 30-iteration LK budget at every level (~1.5-2 ms/frame of systematic
    # artifact no real camera produces). urban38 is a moving vehicle: flow
    # everywhere, no discontinuity. k frames need (H + 2k, W + 3k) world.
    SY, SX, K = 2, 3, 150

    def frame(i, carry):
        world, pyr_prev, pts = carry
        img = jax.lax.dynamic_slice(world, (SY * i, SX * i), (H, W))
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
        return (world, pyr_cur, pts)

    @jax.jit
    def run(carry, n):
        return jax.lax.fori_loop(0, n, frame, carry)

    def make_init(seed):
        # band-limited texture: 60% 5x5-box-smoothed + 40% raw noise. Pure
        # white noise is maximally adversarial for the ITERATIVE stages —
        # every neighbourhood is equally "cornery", so the subpix centroid
        # update never drops below its EPS and burns all 20 iterations on
        # every corner, and LK converges slowly (measured +2.9 ms/frame vs
        # this mix). Natural imagery is ~1/f^2 low-pass; keeping 40% raw
        # noise leaves far MORE high-frequency energy than any real camera
        # frame, so this world remains conservative.
        r = np.random.default_rng(seed)
        HW, WW = H + SY * K, W + SX * K
        raw = r.uniform(0, 255, (HW + 4, WW + 4))
        sm = np.zeros((HW, WW))
        for a in range(5):
            for b in range(5):
                sm += raw[a : a + HW, b : b + WW]
        world = jnp.asarray(0.6 * (sm / 25.0) + 0.4 * raw[2 : 2 + HW, 2 : 2 + WW],
                            jnp.float32)
        pyr = [jnp.asarray(x) for x in
               jax.jit(lambda im: pyramid.build_pyramid(pyramid.clahe(im), lk.PYRAMID_LEVELS))(world[:H, :W])]
        pts = jnp.asarray(r.uniform(30, 900, (F_MAX, 2)), jnp.float32)
        return (world, pyr, pts)

    return _timed_loop(run, make_init, k=K)


def bench_backend(tier="full"):
    import jax
    import jax.numpy as jnp
    import numpy as np

    import __graft_entry__ as ge
    from ic_gvins_tpu.solver import lm
    from ic_gvins_tpu.solver.problem import WindowConfig

    # iswithearth=true is the reference's shipped configuration
    # (/root/reference/config/gvins.yaml:18) — measure that variant.
    # "small" is the fill-scaled tier the replay selects when the measured
    # table fill fits half-size L/R (engine/estimator.py wcfg_small).
    cfg = WindowConfig(N=20, L=512, G=24, R=2048, with_earth=True)
    if tier == "small":
        cfg = cfg._replace(L=256, R=1024)
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


def bench_marg(tier="full"):
    """Chained marginalization (select + Schur + shift) at production sizing.
    "small" is the fill-scaled tier the replay selects when the live
    landmark/reprojection rows fit half-size L/R (the prior's NP x NP
    support is tier-independent — engine/estimator.marginalize)."""
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from ic_gvins_tpu.factors import marginalization as marg
    from ic_gvins_tpu.solver.problem import WindowConfig

    cfg = WindowConfig(N=20, L=512, G=24, R=2048, with_earth=True)
    if tier == "small":
        cfg = cfg._replace(L=256, R=1024)
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
    import jax
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
        summ = pre.preintegrate(params, imu, st, with_earth=True)
        return st._replace(p=summ.end_p, q=summ.end_q, v=summ.end_v)

    @jax.jit
    def run(st, n):
        return jax.lax.fori_loop(0, n, step, st)

    def make_init(seed):
        r = np.random.default_rng(seed)
        return NavState.identity()._replace(p=jnp.asarray(r.normal(0, 1, 3)))

    return _timed_loop(run, make_init, k=50)


def bench_mech():
    """Chained INS mechanization (256-sample chunk, the per-frame
    propagate_to cost)."""
    import jax
    import jax.numpy as jnp

    from ic_gvins_tpu.core.types import ImuBatch, NavState
    from ic_gvins_tpu.ins import mechanization as mech

    S = 256
    cfg = mech.MechConfig(gravity=jnp.array([0.0, 0, 9.8]), iewn=jnp.zeros(3),
                          iswithearth=True)

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


_BENCH_FNS = {
    "frontend": bench_frontend,
    "backend": bench_backend,
    "backend_small": lambda: bench_backend("small"),
    "marg": bench_marg,
    "marg_small": lambda: bench_marg("small"),
    "preint": bench_preint,
    "mech": bench_mech,
}


def _replay_host_stats(timeout):
    """Run scripts/bench_replay_host.py (CPU subprocess): measured host-side
    cost per frame of the REAL model.run loop plus the run's own keyframe /
    marginalization ratios. See that file's docstring for the methodology."""
    script = os.path.join(_HERE, "scripts", "bench_replay_host.py")
    out = subprocess.run([sys.executable, script], capture_output=True,
                         text=True, timeout=timeout)
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def _probe_device(timeout_s=150):
    """The tunneled TPU backend can be unreachable (jax.devices() then hangs
    forever, holding the backend-init lock). Probe from a SUBPROCESS; on
    timeout pin this process to CPU before it ever touches a device."""
    import jax

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


def child_main():
    deadline = float(os.environ.get("BENCH_CHILD_DEADLINE", time.time() + 820))

    def emit(name, entry):
        print("STAGE " + json.dumps({"name": name, **entry}), flush=True)

    os.makedirs(_CACHE_DIR, exist_ok=True)
    import jax

    jax.config.update("jax_enable_x64", True)
    # persistent compile cache: driver re-runs skip the ~2 min/stage tunnel
    # compiles (VERDICT round 2 root cause of the rc=124 kill)
    try:
        jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass

    platform = _probe_device()
    emit("probe", {"backend": platform or "unreachable"})

    # ---- host stage: cached in PERF.json keyed by the source-tree hash ----
    key = _tree_hash()
    perf = _load_perf()
    hostent = (perf.get("stages") or {}).get("host")
    if hostent and hostent.get("key") == key:
        emit("host", dict(hostent, cached=True))
    else:
        budget = min(1500.0, deadline - time.time() - 240.0)
        if budget > 240.0:
            try:
                host = _replay_host_stats(timeout=budget)
                emit("host", dict(host, key=key))
            except Exception as e:  # timeout / crash -> stale fallback
                emit("host_error", {"error": repr(e)[:200]})
        else:
            emit("host_skipped", {"reason": "deadline", "budget_s": budget})

    # ---- device stages: only on the real chip (a CPU chain of full-res
    # frames is unbounded and measures nothing about the TPU) ----
    if platform != "tpu":
        emit("device_skipped", {"reason": f"platform={platform}"})
        return
    for name, est in _DEVICE_STAGES:
        if time.time() + est > deadline:
            emit(name + "_skipped", {"reason": "deadline"})
            continue
        try:
            t0 = time.time()
            v = _BENCH_FNS[name]()
            emit(name, {"value_s": v, "backend": platform,
                        "wall_s": round(time.time() - t0, 1)})
        except Exception as e:
            emit(name + "_error", {"error": repr(e)[:200]})


# ---------------------------------------------------------------------------
# parent: deadline enforcement + merge + the one JSON line
# ---------------------------------------------------------------------------


def _merge_and_print(results, perf):
    stages_old = perf.get("stages") or {}
    stale = []
    vals = {}
    for name in ("frontend", "backend", "backend_small", "marg", "marg_small",
                 "preint", "mech"):
        if name in results and "value_s" in results[name]:
            vals[name] = float(results[name]["value_s"])
        elif name in stages_old and "value_s" in stages_old[name]:
            vals[name] = float(stages_old[name]["value_s"])
            stale.append(name)
        else:
            vals[name] = float(_FALLBACK[name])
            stale.append(name + "(default)")
    if "host" in results and "host_s" in results["host"]:
        host = results["host"]
        if host.get("cached"):
            pass  # cached == still valid for this tree, not stale
    elif "host" in stages_old and "host_s" in stages_old["host"]:
        host = stages_old["host"]
        stale.append("host")
    else:
        host = _FALLBACK["host"]
        stale.append("host(default)")

    # measured ratios from the real replay, floored at the reference's
    # urban38 behavior (optimization + marginalization roughly every other
    # frame) so a gentle synthetic world cannot flatter the number
    cpf = host.get("device_calls_per_frame", {})
    kf_meas = float(host.get("kf_ratio", 0.5))
    mr_meas = float(host.get("marg_ratio", 0.5))
    kf_ratio = max(kf_meas, 0.5)
    marg_ratio = max(mr_meas, 0.5)
    preint_pf = max(float(cpf.get("preint", 0.0)), kf_ratio)
    mech_pf = max(float(cpf.get("mech", 0.0)), 1.0)
    host_s = float(host["host_s"])

    # backend cost = tier-share-weighted mix of the full and fill-scaled
    # solver variants (the replay selects the half-size tier host-side when
    # the measured table fill fits — engine/estimator.py wcfg_small; the
    # share comes from the SAME replay that provides the cadences)
    tiers = host.get("solver_tiers") or {}
    n_small = float(tiers.get("small", 0.0))
    n_full = float(tiers.get("full", 0.0))
    small_share = n_small / (n_small + n_full) if (n_small + n_full) else 0.0
    backend_eff = (small_share * vals["backend_small"]
                   + (1.0 - small_share) * vals["backend"])
    mtiers = host.get("marg_tiers") or {}
    mn_small = float(mtiers.get("small", 0.0))
    mn_full = float(mtiers.get("full", 0.0))
    marg_small_share = (mn_small / (mn_small + mn_full)
                        if (mn_small + mn_full) else 0.0)
    marg_eff = (marg_small_share * vals["marg_small"]
                + (1.0 - marg_small_share) * vals["marg"])

    def frame_time(kf, mr):
        return (vals["frontend"] + kf * backend_eff + mr * marg_eff
                + max(float(cpf.get("preint", 0.0)), kf) * vals["preint"]
                + mech_pf * vals["mech"] + host_s)

    fps = 1.0 / frame_time(kf_ratio, marg_ratio)
    # secondary lines (not the headline): the same composite at the
    # REPLAY-MEASURED cadences (PERF.json replay_cpu_e2e), and the thread-
    # pipeline bound — the reference overlaps tracking and optimization in
    # threads (ic_gvins.cc:156-164), so a deployment that dispatches frame
    # k's solve async while prepping frame k+1 on host pays
    # max(device, host) instead of their sum. Both carry provenance; the
    # headline stays the serial floored-cadence number (conservative).
    fps_measured = 1.0 / frame_time(kf_meas, mr_meas)
    device_s = frame_time(kf_ratio, marg_ratio) - host_s
    fps_pipelined = 1.0 / max(device_s, host_s)

    backend = (results.get("probe") or {}).get("backend", "unknown")
    detail = {
        "backend": backend,
        "frontend_ms": round(vals["frontend"] * 1000, 3),
        "backend_ms": round(backend_eff * 1000, 3),
        "backend_full_ms": round(vals["backend"] * 1000, 3),
        "backend_small_ms": round(vals["backend_small"] * 1000, 3),
        "backend_small_share": round(small_share, 4),
        "marg_ms": round(marg_eff * 1000, 3),
        "marg_full_ms": round(vals["marg"] * 1000, 3),
        "marg_small_ms": round(vals["marg_small"] * 1000, 3),
        "marg_small_share": round(marg_small_share, 4),
        "preint_ms": round(vals["preint"] * 1000, 3),
        "mech_ms": round(vals["mech"] * 1000, 3),
        "host_ms": round(host_s * 1000, 3),
        "kf_ratio": kf_ratio,
        "marg_ratio": marg_ratio,
        "stale": stale,
        "fps_measured_cadence": {
            "value": round(fps_measured, 2),
            "kf_ratio": round(kf_meas, 4), "marg_ratio": round(mr_meas, 4),
            "provenance": "replay-measured cadences (PERF.json "
                          "replay_cpu_e2e), no 0.5 floor"},
        "fps_pipelined_bound": {
            "value": round(fps_pipelined, 2),
            "provenance": "1/max(device,host): full host/device overlap as "
                          "the reference's tracking/optimization thread "
                          "pipeline (ic_gvins.cc:156-164); modeled, not "
                          "measured — no co-located measurement exists on "
                          "the tunneled backend"},
        "replay_cpu_e2e": {k: host[k] for k in
                           ("host_s", "kf_ratio", "marg_ratio", "fps_cpu_e2e",
                            "frames", "episodes", "margs")
                           if k in host},
    }
    fes = perf.get("frontend_stages")
    if fes:
        detail["frontend_stages"] = fes
    print(json.dumps({
        "metric": ("urban38-scale replay frames/sec (frontend + kf*two-pass "
                   "BA + marg + preint + mech + measured host cost) per chip"),
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / 100.0, 4),
        "detail": detail,
    }))

    # persist fresh stage results for the next run's stale fallback
    stages_new = dict(stages_old)
    for name, entry in results.items():
        if name in ("frontend", "backend", "backend_small", "marg",
                    "marg_small", "preint", "mech", "host"):
            e = dict(entry)
            e.pop("cached", None)
            e["ts"] = time.strftime("%Y-%m-%dT%H:%M:%S")
            stages_new[name] = e
    perf["stages"] = stages_new
    perf["last_fps"] = round(fps, 2)
    _save_perf(perf)


def main():
    t0 = time.time()
    deadline = t0 + float(os.environ.get("BENCH_DEADLINE_S", "840"))
    perf = _load_perf()
    results = {}

    env = dict(os.environ)
    env["BENCH_CHILD_DEADLINE"] = str(deadline - 25.0)
    lines = []
    with open(_CHILD_LOG, "w") as logf:
        proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--child"],
            stdout=subprocess.PIPE, stderr=logf, text=True,
            cwd=_HERE, env=env)

        def reader():
            for line in proc.stdout:
                lines.append(line)

        th = threading.Thread(target=reader, daemon=True)
        th.start()
        while time.time() < deadline - 15.0 and proc.poll() is None:
            time.sleep(0.5)
        if proc.poll() is None:
            proc.terminate()
            for _ in range(10):
                if proc.poll() is not None:
                    break
                time.sleep(0.5)
            if proc.poll() is None:
                proc.kill()
        th.join(timeout=10)

    for line in lines:
        if line.startswith("STAGE "):
            try:
                d = json.loads(line[6:])
                results[d.pop("name")] = d
            except Exception:
                pass

    _merge_and_print(results, perf)


if __name__ == "__main__":
    if "--child" in sys.argv[1:]:
        child_main()
    else:
        main()
