"""Per-stage frontend timing on the live backend (TPU or CPU).

Breaks bench.py's frontend frame into its device stages, each chained K
times on device in one jit (same methodology as bench.py's _timed_loop) so
the tunnel round trip cancels:

  clahe   CLAHE alone
  pyr     CLAHE + 4-level pyramid
  lk      ONE bidirectional LK batch (fwd+bwd x 4 levels)
  ransac  fundamental RANSAC
  detect  occupancy mask + blockwise Shi-Tomasi + subpixel refinement

Round-5 lessons baked in (the round-4 numbers were wrong on two counts):
  * every stage output is consumed with full-shape adds — consuming only
    one element lets XLA dead-code-eliminate most of the stage (the pyr
    stage measured 1.76 ms while the real cost was ~7 ms);
  * the LK world must be pyramid-CONSISTENT: rolling each level by the
    same pixel offset gives level-0 guesses ~14 px off after the coarse
    cascade, inflating iteration counts ~2x.

CAVEAT (round 5): stage numbers are RELATIVE A/B probes, not additive
budget terms — bench.py's composite is the budget. Two reasons stages
under-read: (a) loop-invariant subgraphs hoist out of the fori_loop (the
detect stage's response+NMS depend only on the FIXED pyr0, so only the
pts-dependent mask/topk/subpix part is timed per iteration — use the
resp/nms substages, which feed the image carry, for those); (b) iterative
stages self-converge in a static world (the lk stage's points land on the
true match after one frame and later frames exit in ~2 iterations, while
the live composite re-seeds ~210 fresh corners per frame). The pyramid of the shifted
    level-0 image is used instead (what bench.py's composite frame does).

Usage: python scripts/bench_frontend_stages.py [--cpu] [--stage NAME]
                                               [--save]
Prints one JSON line {stage: ms}. ``--stage`` runs ONE stage and exits:
cross-stage in-process timing contamination has been observed on the
tunneled TPU (a stage measured alongside others can read 10-300x its
one-stage-per-process value), so for trustworthy numbers run each stage in
its own process. ``--save`` merges the result into PERF.json under
"frontend_stages" (the committed per-stage budget the bench reports).
"""

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax

jax.config.update("jax_enable_x64", True)
if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
# persistent compile cache (same as bench.py): tunnel compiles of the LK
# stage can run many minutes; cached re-runs skip them entirely
jax.config.update("jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp
import numpy as np

W, H = 1278, 1022
F_MAX = 256
BR, BC, PB = 5, 6, 7


def timed_loop(run, make_init, k, reps=3):
    kk = jnp.int32(k)
    one = jnp.int32(1)
    jax.block_until_ready(run(make_init(0), kk))
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


def _consume_pyr(img, p):
    """Full-shape consumption of every level (defeats DCE)."""
    out = img + 1e-12 * p[0][: img.shape[0], : img.shape[1]]
    for lvl in p[1:]:
        out = out + 1e-12 * jnp.sum(lvl)
    return out


def main():
    from ic_gvins_tpu.vision import features, lk, pyramid, ransac

    r = np.random.default_rng(0)
    # band-limited texture matching bench.py's composite world (pure white
    # noise never lets the iterative stages' EPS tests trigger — see
    # bench.py make_init)
    raw = r.uniform(0, 255, (H + 4, W + 4))
    sm = np.zeros((H, W))
    for a in range(5):
        for b in range(5):
            sm += raw[a : a + H, b : b + W]
    img0 = jnp.asarray(0.6 * (sm / 25.0) + 0.4 * raw[2 : 2 + H, 2 : 2 + W],
                       jnp.float32)
    img1 = jnp.roll(img0, (1, 2), axis=(0, 1))
    mkpyr = jax.jit(lambda im: pyramid.build_pyramid(pyramid.clahe(im),
                                                     lk.PYRAMID_LEVELS))
    pyr0 = [jnp.asarray(x) for x in mkpyr(img0)]
    pyr1 = [jnp.asarray(x) for x in mkpyr(img1)]
    pts0 = jnp.asarray(r.uniform(30, 900, (F_MAX, 2)), jnp.float32)

    only = None
    if "--stage" in sys.argv:
        only = sys.argv[sys.argv.index("--stage") + 1]

    out = {}

    # ---- clahe alone
    def clahe_step(i, img):
        c = pyramid.clahe(img)
        return jnp.roll(img + 1e-12 * c, (2, 3), axis=(0, 1))

    if only in (None, "clahe"):
        run = jax.jit(lambda c, n: jax.lax.fori_loop(0, n, clahe_step, c))
        out["clahe_ms"] = timed_loop(
            run, lambda s: img0 + np.float32(s), k=100) * 1000

    # ---- pyr: CLAHE + pyramid
    def pyr_step(i, img):
        p = pyramid.build_pyramid(pyramid.clahe(img), lk.PYRAMID_LEVELS)
        return jnp.roll(_consume_pyr(img, p), (2, 3), axis=(0, 1))

    if only in (None, "pyr"):
        run = jax.jit(lambda c, n: jax.lax.fori_loop(0, n, pyr_step, c))
        out["pyr_ms"] = timed_loop(
            run, lambda s: img0 + np.float32(s), k=100) * 1000

    # ---- lk: one bidirectional batch between CONSISTENT pyramids
    def lk_step(i, pts):
        nxt, ok = lk.track_bidirectional(pyr0, pyr1, pts, pts,
                                         jnp.ones(F_MAX, bool))
        return jnp.clip(nxt, 30.0, 900.0)

    if only in (None, "lk"):
        run = jax.jit(lambda c, n: jax.lax.fori_loop(0, n, lk_step, c))
        out["lk_ms"] = timed_loop(
            run, lambda s: pts0 + np.float32(s % 7), k=100) * 1000

    # ---- ransac
    def ransac_step(i, pts):
        inl, _ = ransac.fundamental_ransac(
            pts, pts + 2.0, jnp.ones(F_MAX, jnp.float64), 1.5)
        return pts + inl[:, None] * 1e-6

    if only in (None, "ransac"):
        run = jax.jit(lambda c, n: jax.lax.fori_loop(0, n, ransac_step, c))
        out["ransac_ms"] = timed_loop(
            run, lambda s: pts0 + np.float32(s % 7), k=100) * 1000

    # ---- detect substages: response / NMS / block top-k / subpix / mask
    if only in ("resp", "nms", "topk", "subpix", "occ"):
        from ic_gvins_tpu.vision.features import min_eig_response

        if only == "resp":
            def sub_step(i, img):
                r2 = min_eig_response(img)
                return jnp.roll(img + 1e-12 * r2, (2, 3), axis=(0, 1))

            run = jax.jit(lambda c, n: jax.lax.fori_loop(0, n, sub_step, c))
            out["resp_ms"] = timed_loop(
                run, lambda s: img0 + np.float32(s), k=100) * 1000
        if only == "nms":
            def sub_step(i, img):
                r2 = min_eig_response(img)
                k2 = 15
                dil = jax.lax.reduce_window(
                    r2, -jnp.inf, jax.lax.max, (k2, 1), (1, 1), "SAME")
                dil = jax.lax.reduce_window(
                    dil, -jnp.inf, jax.lax.max, (1, k2), (1, 1), "SAME")
                is_max = ((r2 >= dil) & (r2 > 0)).astype(jnp.float32)
                return jnp.roll(img + 1e-12 * is_max, (2, 3), axis=(0, 1))

            run = jax.jit(lambda c, n: jax.lax.fori_loop(0, n, sub_step, c))
            out["nms_ms"] = timed_loop(
                run, lambda s: img0 + np.float32(s), k=100) * 1000
        if only == "topk":
            def sub_step(i, img):
                corners, resp2, cvalid = features.detect_blockwise(
                    img, jnp.ones((H, W)), jnp.zeros(BR * BC, jnp.int32),
                    block_rows=BR, block_cols=BC, per_block=PB,
                    min_distance=15)
                return jnp.roll(
                    img + 1e-12 * (jnp.sum(corners) + jnp.sum(resp2)),
                    (2, 3), axis=(0, 1))

            run = jax.jit(lambda c, n: jax.lax.fori_loop(0, n, sub_step, c))
            out["topk_ms"] = timed_loop(
                run, lambda s: img0 + np.float32(s), k=100) * 1000
        if only == "subpix":
            def sub_step(i, pts):
                c = features.corner_subpix(
                    pyr0[0], pts[: BR * BC * PB],
                    jnp.ones(BR * BC * PB, bool))
                return pts.at[: BR * BC * PB].set(
                    jnp.clip(c, 30.0, 900.0))

            run = jax.jit(lambda c, n: jax.lax.fori_loop(0, n, sub_step, c))
            out["subpix_ms"] = timed_loop(
                run, lambda s: pts0 + np.float32(s % 7), k=100) * 1000
        if only == "occ":
            def sub_step(i, pts):
                m = features.occupancy_mask(
                    pts, jnp.ones(F_MAX, jnp.float32), (H, W), 15)
                return pts + 1e-12 * jnp.sum(m)

            run = jax.jit(lambda c, n: jax.lax.fori_loop(0, n, sub_step, c))
            out["occ_ms"] = timed_loop(
                run, lambda s: pts0 + np.float32(s % 7), k=100) * 1000

    # ---- detect: occupancy mask + blockwise + subpix
    def detect_step(i, pts):
        mask = features.occupancy_mask(pts, jnp.ones(F_MAX, jnp.float32),
                                       (H, W), 15)
        corners, resp, cvalid = features.detect_blockwise(
            pyr0[0], mask, jnp.zeros(BR * BC, jnp.int32),
            block_rows=BR, block_cols=BC, per_block=PB, min_distance=15)
        corners = features.corner_subpix(
            pyr0[0], corners.astype(jnp.float32), cvalid)
        return pts.at[: BR * BC * PB].set(
            jnp.clip(corners.astype(jnp.float32), 30.0, 900.0))

    if only in (None, "detect"):
        run = jax.jit(lambda c, n: jax.lax.fori_loop(0, n, detect_step, c))
        out["detect_ms"] = timed_loop(
            run, lambda s: pts0 + np.float32(s % 7), k=100) * 1000

    out = {k: round(v, 3) for k, v in out.items()}
    out["backend"] = jax.default_backend()
    print(json.dumps(out))

    if "--save" in sys.argv:
        perf_path = os.path.join(_REPO, "PERF.json")
        try:
            with open(perf_path) as f:
                perf = json.load(f)
        except Exception:
            perf = {}
        entry = perf.setdefault("frontend_stages", {})
        entry.update({k: v for k, v in out.items() if k.endswith("_ms")})
        entry["backend"] = out["backend"]
        entry["ts"] = time.strftime("%Y-%m-%dT%H:%M:%S")
        with open(perf_path, "w") as f:
            json.dump(perf, f, indent=1, sort_keys=True)
            f.write("\n")


if __name__ == "__main__":
    main()
