"""Per-stage chained-loop profiling on the real TPU (dev tool).

Each stage is timed with the bench.py methodology: K iterations chained in
one jitted fori_loop, (t(K)-t(1))/(K-1), min over reps, fresh inputs.
Usage: python scripts/dev/prof_stages.py [frontend|backend|all]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

W, H = 1278, 1022
F_MAX = 256


def timed(run, make_init, k, reps=3):
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


def prof_frontend():
    from ic_gvins_tpu.vision import features, lk, pyramid

    r = np.random.default_rng(0)
    img0 = jnp.asarray(r.uniform(0, 255, (H, W)), jnp.float32)

    def mk_img(seed):
        rr = np.random.default_rng(seed)
        return jnp.asarray(rr.uniform(0, 255, (H, W)), jnp.float32)

    # --- clahe ---
    @jax.jit
    def run_clahe(img, n):
        def body(i, im):
            out = pyramid.clahe(im)
            return out * jnp.float32(0.999) + jnp.float32(0.1)
        return jax.lax.fori_loop(0, n, body, img)

    t = timed(run_clahe, mk_img, 60)
    print(f"clahe            {t*1e3:8.3f} ms")

    # --- pyramid ---
    @jax.jit
    def run_pyr(img, n):
        def body(i, im):
            p = pyramid.build_pyramid(im, lk.PYRAMID_LEVELS)
            return im + p[3].mean() * jnp.float32(1e-6)
        return jax.lax.fori_loop(0, n, body, img)

    t = timed(run_pyr, mk_img, 100)
    print(f"pyramid          {t*1e3:8.3f} ms")

    # --- one bidirectional LK batch (256 slots) ---
    def mk_lk(seed):
        rr = np.random.default_rng(seed)
        img = jnp.asarray(rr.uniform(0, 255, (H, W)), jnp.float32)
        pyr = [jnp.asarray(x) for x in jax.jit(
            lambda im: pyramid.build_pyramid(pyramid.clahe(im), lk.PYRAMID_LEVELS))(img)]
        pts = jnp.asarray(rr.uniform(30, 900, (F_MAX, 2)), jnp.float32)
        return (pyr, pts)

    @jax.jit
    def run_lk(carry, n):
        pyr, pts = carry
        def body(i, c):
            pyr, pts = c
            pyr2 = [jnp.roll(x, 2, axis=0) for x in pyr]
            valid = jnp.ones(F_MAX, bool)
            nxt, ok = lk.track_bidirectional(pyr, pyr2, pts, pts, valid)
            return (pyr, jnp.clip(nxt, 30.0, 900.0))
        return jax.lax.fori_loop(0, n, body, carry)

    t = timed(run_lk, mk_lk, 60)
    print(f"lk bidi x1       {t*1e3:8.3f} ms")

    # --- detection: occupancy + blockwise + (subpix separately) ---
    block_rows, block_cols, per_block = 5, 6, 7

    def mk_det(seed):
        rr = np.random.default_rng(seed)
        img = jnp.asarray(rr.uniform(0, 255, (H, W)), jnp.float32)
        pts = jnp.asarray(rr.uniform(30, 900, (F_MAX, 2)), jnp.float32)
        return (img, pts)

    @jax.jit
    def run_det(carry, n):
        img, pts = carry
        def body(i, c):
            img, pts = c
            mask = features.occupancy_mask(pts, jnp.ones(F_MAX, jnp.float32), (H, W), 15)
            corners, resp, cvalid = features.detect_blockwise(
                img, mask, jnp.zeros(block_rows * block_cols, jnp.int32),
                block_rows=block_rows, block_cols=block_cols, per_block=per_block,
                min_distance=15)
            pts2 = pts.at[: block_rows * block_cols * per_block].set(
                jnp.clip(corners.astype(jnp.float32), 30.0, 900.0))
            return (img + jnp.float32(0.01), pts2)
        return jax.lax.fori_loop(0, n, body, carry)

    t = timed(run_det, mk_det, 60)
    print(f"occ+detect       {t*1e3:8.3f} ms")

    @jax.jit
    def run_subpix(carry, n):
        img, pts = carry
        def body(i, c):
            img, pts = c
            out = features.corner_subpix(img, pts, jnp.ones(F_MAX, bool))
            return (img + jnp.float32(0.01), jnp.clip(out, 30.0, 900.0))
        return jax.lax.fori_loop(0, n, body, carry)

    t = timed(run_subpix, mk_det, 60)
    print(f"corner_subpix    {t*1e3:8.3f} ms")


def prof_backend():
    import __graft_entry__ as ge
    from ic_gvins_tpu.solver import lm
    from ic_gvins_tpu.solver.problem import (
        WindowConfig, apply_gauge_blocks, build_normal_blocks, total_cost)
    from ic_gvins_tpu.solver.lm import _schur_solve

    cfg = WindowConfig(N=20, L=512, G=24, R=2048, with_earth=False)
    params0, tables = ge._make_problem(cfg)

    def mk(seed):
        rr = np.random.default_rng(seed)
        return params0._replace(
            poses=params0.poses.at[:, :3].add(jnp.asarray(rr.normal(0, 0.05, (cfg.N, 3)))),
            invdepths=params0.invdepths + jnp.asarray(rr.normal(0, 0.01, cfg.L)),
        )

    # --- assembly ---
    @jax.jit
    def run_asm(params, n):
        def body(i, p):
            Hss, Hsl, hll, b, act = build_normal_blocks(p, tables, cfg)
            return p._replace(poses=p.poses.at[:, :3].add(b[:3] * 1e-12 + 1e-5))
        return jax.lax.fori_loop(0, n, body, params)

    t = timed(run_asm, mk, 100)
    print(f"assembly         {t*1e3:8.3f} ms")

    # --- schur solve ---
    Hss0, Hsl0, hll0, b0, act0 = jax.jit(
        lambda p: build_normal_blocks(p, tables, cfg))(mk(0))
    Hss0, Hsl0, hll0, b0 = jax.jit(
        lambda *a: apply_gauge_blocks(*a, act0, cfg))(Hss0, Hsl0, hll0, b0)

    def mk_sch(seed):
        rr = np.random.default_rng(seed)
        return (Hss0 + 1e-9 * jnp.asarray(rr.normal(size=Hss0.shape)), b0)

    @jax.jit
    def run_sch(carry, n):
        Hss, b = carry
        diagH = jnp.clip(jnp.concatenate([jnp.diag(Hss), hll0]), 1e-6, 1e32)
        def body(i, c):
            Hss, b = c
            dx = _schur_solve(Hss, Hsl0, hll0, b, 1e-4 * diagH, cfg)
            return (Hss, b + dx * 1e-9)
        return jax.lax.fori_loop(0, n, body, carry)

    t = timed(run_sch, mk_sch, 100)
    print(f"schur_solve      {t*1e3:8.3f} ms")

    # --- total_cost ---
    @jax.jit
    def run_cost(params, n):
        def body(i, p):
            c = total_cost(p, tables, cfg)
            return p._replace(td=p.td + c * 1e-30)
        return jax.lax.fori_loop(0, n, body, params)

    t = timed(run_cost, mk, 200)
    print(f"total_cost       {t*1e3:8.3f} ms")

    # --- full two-pass ---
    @jax.jit
    def run_tp(params, n):
        def body(i, p):
            out, _, _ = lm.solve_two_pass(p, tables, cfg, 20)
            return out._replace(poses=out.poses.at[:, :3].add(1e-3 * (1.0 + (i % 3))))
        return jax.lax.fori_loop(0, n, body, params)

    t = timed(run_tp, mk, 40)
    print(f"two-pass (20 it) {t*1e3:8.3f} ms")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("backend", "all"):
        prof_backend()
    if which in ("frontend", "all"):
        prof_frontend()
