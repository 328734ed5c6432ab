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
    apply_gauge,
    build_normal_equations,
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


def _schur_solve(H, b, mu_diag, cfg: WindowConfig):
    """Solve (H + diag(mu_diag)) dx = b by eliminating the landmark block.

    The landmark-landmark block of H is diagonal by construction."""
    Ds = cfg.lm_off
    Hd = H + jnp.diag(mu_diag)
    Hss = Hd[:Ds, :Ds]
    Hsl = Hd[:Ds, Ds:]
    hll = jnp.diag(Hd)[Ds:]
    bs, bl = b[:Ds], b[Ds:]

    hll_inv = 1.0 / jnp.maximum(hll, 1e-12)
    Hred = Hss - (Hsl * hll_inv[None, :]) @ Hsl.T
    bred = bs - Hsl @ (hll_inv * bl)

    # dense cholesky with jitter fallback
    L = jnp.linalg.cholesky(Hred + 1e-12 * jnp.eye(Ds))
    dxs = jax.scipy.linalg.cho_solve((L, True), bred)
    dxs = jnp.where(jnp.all(jnp.isfinite(dxs)), dxs, jnp.zeros_like(dxs))
    dxl = hll_inv * (bl - Hsl.T @ dxs)
    return jnp.concatenate([dxs, dxl])


def solve(params: WindowParams, tables: FactorTables, cfg: WindowConfig, max_iterations: int,
          radius0=1e4):
    """Run up to ``max_iterations`` LM steps; returns (params, stats, radius).

    jit-safe; call under jit with cfg static."""

    init_cost = total_cost(params, tables, cfg)

    def cond(carry):
        it, accepted, params, cost, radius, done = carry
        return (it < max_iterations) & (~done)

    def body(carry):
        it, accepted, params, cost, radius, done = carry
        H, b, act = build_normal_equations(params, tables, cfg)
        H, b = apply_gauge(H, b, act)
        # Ceres: damping with the scaled diagonal, clamped
        diagH = jnp.clip(jnp.diag(H), 1e-6, 1e32)
        mu = 1.0 / radius
        dx = _schur_solve(H, b, mu * diagH, cfg)
        dx = dx * act

        candidate = params.boxplus(cfg, dx)
        new_cost = total_cost(candidate, tables, cfg)
        model_change = jnp.dot(dx, b) - 0.5 * jnp.dot(dx, H @ dx)
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
        decrease_small = ok & ((old_cost - new_cost) <= 1e-6 * old_cost)
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
