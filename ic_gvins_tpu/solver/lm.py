"""Levenberg-Marquardt trust-region solver with Schur landmark elimination.

Replaces Ceres (LEVENBERG_MARQUARDT + DENSE_SCHUR, ic_gvins.cc:1136-1146)
with a fully-jitted fixed-shape solver: the whole iteration loop runs as ONE
device program (``lax.while_loop``), including normal-equation assembly,
Schur reduction of the landmark block (diagonal — each reprojection factor
touches one landmark), a dense Cholesky solve of the reduced state system,
step-quality trust-region control (radius update matching Ceres'
LevenbergMarquardtStrategy), and manifold retraction.

The two-pass optimization with in-between chi2 outlier surgery
(ic_gvins.cc:1180-1222) is `solve_two_pass`: pass 1 (robust kernels) →
GNSS chi2 reweighting + reprojection chi2 masking (pure array ops, shapes
static) → pass 2 (GNSS de-robustified), still a single device call.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .problem import (
    FactorTables,
    WindowConfig,
    WindowParams,
    apply_gauge_blocks,
    block_matvec,
    build_normal_blocks,
    chi2_blocks,
    total_cost,
)

# chi2 thresholds (ic_gvins.cc:1199, 1243)
GNSS_CHI2 = 7.815
REPROJ_CHI2 = 5.991


class SolveStats(NamedTuple):
    iterations: jnp.ndarray      # () int32 — successful steps
    initial_cost: jnp.ndarray
    final_cost: jnp.ndarray


def _schur_solve(Hss, Hsl, hll, b, mu_diag, cfg: WindowConfig, f64: bool = False):
    """Solve (H + diag(mu_diag)) dx = b by eliminating the landmark block
    (diagonal by construction), on the block form of H.

    Mixed precision: f64 matmuls are software-emulated on TPU (no f64 MXU)
    and dominated the whole backend, so the damped system is Jacobi-
    equilibrated (unit diagonal — condition number collapses, and the
    landmark block becomes exactly the identity), reduced and Cholesky-
    factorized in f32 on the MXU, then ONE f64 iterative-refinement pass
    (a pair of f64 GEMVs) restores double-precision step accuracy.

    ``f64``: factor the reduced system in f64 with a ~eps-level ridge —
    the solver-oracle mode. The f32 factorization resolves directions down
    to curvature ratio ~1/(kappa*eps32): beyond that (undamped window
    problems reach kappa ~ 1e8) refinement against the 1e-6-ridged factor
    stalls and LM creeps. Production never needs those last ~1e-8 of cost;
    the oracle comparison does."""
    Ds = cfg.lm_off
    Hss = Hss + jnp.diag(mu_diag[:Ds])
    hll = hll + mu_diag[Ds:]
    dscale = jnp.sqrt(jnp.clip(jnp.concatenate([jnp.diag(Hss), hll]), 1e-12, None))
    dinv = 1.0 / dscale
    dS, dL = dinv[:Ds], dinv[Ds:]
    Hssn = Hss * (dS[:, None] * dS[None, :])
    Hsln = Hsl * (dS[:, None] * dL[None, :])
    bn = b * dinv

    ft = jnp.float64 if f64 else jnp.float32
    ridge = 1e-13 if f64 else 1e-6
    H32ss = Hssn.astype(ft)
    H32sl = Hsln.astype(ft)
    L = jnp.linalg.cholesky(
        (H32ss - H32sl @ H32sl.T) + ft(ridge) * jnp.eye(Ds, dtype=ft)
    )

    def inner(r):
        rs = r[:Ds].astype(ft)
        rl = r[Ds:].astype(ft)
        ys = jax.scipy.linalg.cho_solve((L, True), rs - H32sl @ rl)
        yl = rl - H32sl.T @ ys
        return jnp.concatenate([ys, yl]).astype(jnp.float64)

    y = inner(bn)
    # refinement: f64 block residual (landmark diag is identity), f32 re-solve
    ys, yl = y[:Ds], y[Ds:]
    resid = bn - jnp.concatenate([Hssn @ ys + Hsln @ yl, Hsln.T @ ys + yl])
    y = y + inner(resid)
    dx = dinv * y
    return jnp.where(jnp.all(jnp.isfinite(dx)), dx, jnp.zeros_like(dx))


def solve(params: WindowParams, tables: FactorTables, cfg: WindowConfig, max_iterations: int,
          radius0=1e4, ftol=1e-6, precise: bool = False):
    """Run up to ``max_iterations`` LM steps; returns (params, stats, radius).

    ``ftol`` is Ceres' function_tolerance (default 1e-6, Ceres' default —
    solver.cc uses the same relative-decrease stop); the solver-oracle test
    drives it to ~0 for machine-precision optima. ``precise`` runs cost and
    assembly with f64 reprojection blocks AND factors the reduced system in
    f64 (oracle test only — the production path keeps the measured-faster
    f32+refinement design). jit-safe; call under jit with cfg/precise
    static."""

    init_cost = total_cost(params, tables, cfg, precise)

    def cond(carry):
        it, accepted, params, cost, radius, done = carry
        return (it < max_iterations) & (~done)

    def body(carry):
        it, accepted, params, cost, radius, done = carry
        Hss, Hsl, hll, b, act = build_normal_blocks(params, tables, cfg,
                                                    reproj_f64=precise)
        Hss, Hsl, hll, b = apply_gauge_blocks(Hss, Hsl, hll, b, act, cfg)
        # Ceres: damping with the scaled diagonal, clamped
        diagH = jnp.clip(jnp.concatenate([jnp.diag(Hss), hll]), 1e-6, 1e32)
        mu = 1.0 / radius
        dx = _schur_solve(Hss, Hsl, hll, b, mu * diagH, cfg, f64=precise)
        dx = dx * act

        candidate = params.boxplus(cfg, dx)
        new_cost = total_cost(candidate, tables, cfg, precise)
        model_change = jnp.dot(dx, b) - 0.5 * jnp.dot(dx, block_matvec(Hss, Hsl, hll, dx, cfg))
        rho = (cost - new_cost) / jnp.where(model_change > 0, model_change, 1e-300)

        ok = (rho > 1e-3) & (model_change > 0) & jnp.isfinite(new_cost)
        old_cost = cost
        params = jax.tree_util.tree_map(lambda a, b_: jnp.where(ok, b_, a), params, candidate)
        cost = jnp.where(ok, new_cost, cost)
        # trust-region update (Ceres LevenbergMarquardtStrategy)
        grow = radius / jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
        radius = jnp.where(ok, jnp.minimum(grow, 1e16), jnp.maximum(radius / 2.0, 1e-32))
        accepted = accepted + ok.astype(jnp.int32)

        # convergence: tiny step or tiny relative decrease (Ceres
        # function_tolerance-style, default 1e-6)
        step_small = jnp.max(jnp.abs(dx)) < 1e-12
        decrease_small = ok & ((old_cost - new_cost) <= ftol * old_cost)
        done = step_small | decrease_small
        return (it + 1, accepted, params, cost, radius, done)

    carry = (jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32), params, init_cost,
             jnp.asarray(radius0), jnp.zeros((), bool))
    it, accepted, params, cost, radius, _ = jax.lax.while_loop(cond, body, carry)
    return params, SolveStats(iterations=accepted, initial_cost=init_cost, final_cost=cost), radius


def outlier_surgery(params: WindowParams, tables: FactorTables, cfg: WindowConfig):
    """Between-pass chi2 surgery (ic_gvins.cc:1190-1208):
      - GNSS blocks with chi2 > 7.815 get their std inflated by
        sqrt(chi2/7.815) (reweighting, not removal)
      - reprojection blocks with chi2 > 5.991 are masked out
      - GNSS loses its robust kernel for pass 2
    Returns updated tables + (gnss_outliers, reproj_outliers) counts."""
    chi_g, chi_r = chi2_blocks(params, tables, cfg)

    g = tables.gnss
    bad_g = (chi_g > GNSS_CHI2) & (g.valid > 0)
    scale = jnp.sqrt(jnp.maximum(chi_g / GNSS_CHI2, 1.0))
    std = jnp.where(bad_g[:, None], g.std * scale[:, None], g.std)
    gnss = g._replace(std=std, robust=jnp.zeros(()))

    r = tables.reproj
    bad_r = (chi_r > REPROJ_CHI2) & (r.valid > 0)
    reproj = r._replace(valid=jnp.where(bad_r, 0.0, r.valid))

    n_g = jnp.sum(bad_g.astype(jnp.int32))
    n_r = jnp.sum(bad_r.astype(jnp.int32))
    return tables._replace(gnss=gnss, reproj=reproj), n_g, n_r


def solve_two_pass(params: WindowParams, tables: FactorTables, cfg: WindowConfig,
                   num_iterations: int):
    """The reference's two-step optimization (ic_gvins.cc:1130-1239):
    pass 1 with robust kernels for 1/4 of the iterations, chi2 surgery,
    pass 2 de-robustified GNSS for the rest. One jittable program."""
    n1 = max(num_iterations // 4, 1)
    n2 = max(num_iterations - n1, 1)

    params, stats1, _ = solve(params, tables, cfg, n1)
    tables2, n_gnss_out, n_reproj_out = outlier_surgery(params, tables, cfg)
    params, stats2, _ = solve(params, tables2, cfg, n2)
    return params, tables2, (stats1, stats2, n_gnss_out, n_reproj_out)
