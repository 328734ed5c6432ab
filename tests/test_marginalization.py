"""Marginalization: algebraic consistency + sliding-window equivalence."""

import jax
import jax.numpy as jnp
import numpy as np

import synthetic as syn
from ic_gvins_tpu.core import quaternion as quat
from ic_gvins_tpu.core.types import NavState
from ic_gvins_tpu.factors import marginalization as marg
from ic_gvins_tpu.solver import lm
from ic_gvins_tpu.solver.problem import (
    FactorTables,
    WindowConfig,
    WindowParams,
    build_normal_equations,
)

CFG = WindowConfig(N=8, L=16, G=8, R=64, with_earth=False)
N_NODES = 8
STEPS = 60
LEVER = jnp.array([-0.3, 0.01, 0.35])


def build_world(seed=0, noise=0.02):
    rng = np.random.default_rng(seed)
    imu = syn.smooth_imu(STEPS * (N_NODES - 1) + 1, 0.005, seed=seed)
    st0 = NavState.identity()._replace(v=jnp.asarray(rng.normal(0, 1, 3)))
    node_steps = [k * STEPS for k in range(N_NODES)]
    states = syn.propagate_nodes(imu, st0, node_steps)
    summs = syn.preint_segments(syn.default_params(), imu, states, node_steps)
    gnss_pos = np.stack(
        [np.asarray(s.p + quat.rotate(s.q, LEVER)) for s in states]
    ) + rng.normal(0, noise, (N_NODES, 3))
    truth = WindowParams.zeros(CFG)
    for k, s in enumerate(states):
        truth = truth._replace(
            poses=truth.poses.at[k].set(jnp.concatenate([s.p, s.q])),
            mixes=truth.mixes.at[k].set(jnp.concatenate([s.v, s.bg, s.ba])),
        )
    return states, summs, gnss_pos, truth


def make_tables(states, summs, gnss_pos, n_active, truth):
    """Factor tables over nodes [0, n_active)."""
    tables = FactorTables.empty(CFG)
    g = tables.gnss
    for k in range(n_active):
        g = g._replace(
            idx=g.idx.at[k].set(k),
            blh=g.blh.at[k].set(jnp.asarray(gnss_pos[k])),
            std=g.std.at[k].set(0.1),
            valid=g.valid.at[k].set(1.0),
        )
    p = tables.preint._replace(
        summ=syn.stack_summaries(summs, pad_to=CFG.P),
        idx0=jnp.arange(CFG.P, dtype=jnp.int32),
        valid=(jnp.arange(CFG.P) < n_active - 1).astype(jnp.float64),
    )
    pose0 = truth.poses[0]
    mix0 = truth.mixes[0]
    pr = tables.prior._replace(
        pose_prior=pose0,
        pose_prior_std=jnp.array([0.1, 0.1, 0.1, 0.01, 0.01, 0.03]),
        mix_prior=mix0,
        mix_prior_std=jnp.concatenate(
            [jnp.full(3, 0.1), jnp.full(3, 1e-4), jnp.full(3, 0.2)]
        ),
        valid=jnp.ones(()),
        imuerr_idx=jnp.asarray(n_active - 1, jnp.int32),
    )
    return tables._replace(
        gnss=g, preint=p, prior=pr, antlever=LEVER,
        node_valid=(jnp.arange(CFG.N) < n_active).astype(jnp.float64),
    )


def test_prior_matches_schur_complement():
    """At the linearization point, J0^T J0 == Hp and J0^T e0 == -bp."""
    states, summs, gnss_pos, truth = build_world()
    tables = make_tables(states, summs, gnss_pos, N_NODES, truth)
    params, stats, _ = jax.jit(lambda p, t: lm.solve(p, t, CFG, 30))(truth, tables)

    num_marg = 2
    marg_tables, mask, lm_m = marg.select_marg_factors(tables, CFG, num_marg, oldest_kf_node=0)
    prior = marg.marginalize(params, marg_tables, mask, CFG)

    H, b, act = build_normal_equations(params, marg_tables, CFG)
    m = np.asarray(mask)
    r = (1 - m) * np.asarray(act)
    Hn, bn = np.asarray(H), np.asarray(b)
    Hmm = Hn * np.outer(m, m)
    Hrm = Hn * np.outer(r, m)
    Hrr = Hn * np.outer(r, r)
    w, V = np.linalg.eigh(0.5 * (Hmm + Hmm.T))
    winv = np.where(w > 1e-8, 1 / np.where(w > 1e-8, w, 1), 0)
    Hmm_inv = (V * winv) @ V.T
    Hp = Hrr - Hrm @ Hmm_inv @ Hrm.T
    bp = (b * r) - Hrm @ (Hmm_inv @ (b * m))

    scale = max(np.abs(Hp).max(), 1.0)
    # the prior lives on its (NP,NP) node/ext/td support; the landmark
    # rows/cols of the dense-path Schur complement must be empty
    NP = CFG.lm_off
    assert np.abs(Hp[NP:, :]).max() <= 1e-9 * scale
    assert np.abs(np.asarray(bp)[NP:]).max() <= 1e-9
    np.testing.assert_allclose(np.asarray(prior.H0), Hp[:NP, :NP], atol=1e-6 * scale)
    np.testing.assert_allclose(np.asarray(prior.Jte0), -np.asarray(bp)[:NP], atol=1e-6)


def test_sliding_window_equivalence():
    """Marginalize-and-continue ~ full batch solve on the retained nodes."""
    states, summs, gnss_pos, truth = build_world(seed=3)

    # full batch solve over all 8 nodes
    tables_full = make_tables(states, summs, gnss_pos, N_NODES, truth)
    params_full, _, _ = jax.jit(lambda p, t: lm.solve(p, t, CFG, 40))(truth, tables_full)

    # stage 1: solve over first 6 nodes
    tables6 = make_tables(states, summs, gnss_pos, 6, truth)
    params6, _, _ = jax.jit(lambda p, t: lm.solve(p, t, CFG, 40))(truth, tables6)

    # marginalize nodes 0-1
    num_marg = 2
    marg_tables, mask, _ = marg.select_marg_factors(tables6, CFG, num_marg, oldest_kf_node=0)
    prior = marg.marginalize(params6, marg_tables, mask, CFG)
    prior = marg.shift_prior(prior, CFG, num_marg)

    # shift window state left by 2, drop marged factors, add nodes 6,7
    def shift_params(params, k):
        return params._replace(
            poses=jnp.roll(params.poses, -k, axis=0),
            mixes=jnp.roll(params.mixes, -k, axis=0),
        )

    params_s = shift_params(params6, num_marg)
    # seed the two new nodes from truth (as the engine would from INS)
    for k in range(6 - num_marg, N_NODES - num_marg):
        params_s = params_s._replace(
            poses=params_s.poses.at[k].set(truth.poses[k + num_marg]),
            mixes=params_s.mixes.at[k].set(truth.mixes[k + num_marg]),
        )

    tables_s = make_tables(states, summs, gnss_pos, N_NODES, truth)
    # shift factor indexing: drop gnss at marged nodes, shift indices
    g = tables_s.gnss
    keep = np.arange(CFG.G) >= num_marg
    g = g._replace(
        idx=jnp.where(jnp.asarray(keep), g.idx - num_marg, 0).astype(jnp.int32),
        valid=g.valid * jnp.asarray(keep, jnp.float64),
    )
    p = tables_s.preint
    p = p._replace(
        summ=syn.stack_summaries(summs[num_marg:], pad_to=CFG.P),
        idx0=jnp.arange(CFG.P, dtype=jnp.int32),
        valid=(jnp.arange(CFG.P) < (N_NODES - 1 - num_marg)).astype(jnp.float64),
    )
    pr = tables_s.prior._replace(
        valid=jnp.zeros(()),  # init priors were absorbed into the marg prior
        imuerr_idx=jnp.asarray(N_NODES - num_marg - 1, jnp.int32),
    )
    tables_s = tables_s._replace(
        gnss=g, preint=p, prior=pr, marg=prior,
        node_valid=(jnp.arange(CFG.N) < N_NODES - num_marg).astype(jnp.float64),
    )

    params_w, _, _ = jax.jit(lambda p, t: lm.solve(p, t, CFG, 40))(params_s, tables_s)

    # retained nodes should match the full batch solution closely
    for k in range(N_NODES - num_marg):
        err = np.linalg.norm(
            np.asarray(params_w.poses[k, :3] - params_full.poses[k + num_marg, :3])
        )
        assert err < 5e-3, f"node {k}: {err}"


def test_replayed_prior_gradient_consistent_and_cost_bounded():
    """Two regression gates on the replayed prior:

    1. |e0|^2 stays at residual scale. The absolute 1e-8 eigenvalue cut of
       the reference let eigh rounding junk (~1e-6 on a ~1e9-scale H) pass
       as real information; 1/sqrt(s) then amplified gradient junk into a
       prior with a huge CONSTANT cost, which broke LM's relative
       convergence test and made run outcomes depend on rounding.
    2. The assembled gradient b matches autodiff of total_cost even with a
       rotated-away linearization point: the prior's derivative must chain
       through d(boxminus)/d(tangent) (Jr^{-1} on every rotation block) —
       dropping it (as the reference's MarginalizationFactor does) leaves a
       gradient error of O(|J0^T r| * |dtheta|) that exceeds the true
       gradient near convergence and stalls the solver off-optimum.
    """
    from ic_gvins_tpu.solver.problem import apply_gauge, total_cost

    states, summs, gnss_pos, truth = build_world(seed=5)
    tables = make_tables(states, summs, gnss_pos, 6, truth)
    params, _, _ = jax.jit(lambda p, t: lm.solve(p, t, CFG, 40))(truth, tables)

    num_marg = 2
    marg_tables, mask, _ = marg.select_marg_factors(tables, CFG, num_marg, oldest_kf_node=0)
    prior = marg.marginalize(params, marg_tables, mask, CFG)

    # gate 1: constant prior cost at the linearization point is bounded by
    # the (small) converged residual cost of the absorbed factors
    # (c0 = bp^T Hp^+ bp, the |e0|^2 of the reference's sqrt factorization)
    e0_sq = float(prior.c0)
    pre_cost = float(total_cost(params, marg_tables, CFG))
    assert e0_sq < 10.0 * pre_cost + 1.0, f"c0 = {e0_sq} vs marg-factor cost {pre_cost}"

    # keep indexing unshifted: deactivate absorbed factors, install the prior
    g = tables.gnss
    keepg = jnp.arange(CFG.G) >= num_marg
    tables2 = tables._replace(
        gnss=g._replace(valid=g.valid * keepg.astype(jnp.float64)),
        preint=tables.preint._replace(
            valid=tables.preint.valid * (tables.preint.idx0 >= num_marg)),
        prior=tables.prior._replace(valid=jnp.zeros(())),
        marg=prior,
    )

    # gate 2: perturb (rotations included) so dx0 has a nonzero angle, then
    # b must equal -grad(total_cost)
    rng = np.random.default_rng(7)
    p2 = params
    for k in range(6):
        dq = quat.from_rotvec(jnp.asarray(rng.normal(0, 0.02, 3)))
        p2 = p2._replace(
            poses=p2.poses.at[k, 3:7].set(quat.mul(p2.poses[k, 3:7], dq))
                        .at[k, :3].add(jnp.asarray(rng.normal(0, 0.05, 3))))

    H, b, act = jax.jit(lambda p, t: build_normal_equations(p, t, CFG))(p2, tables2)
    _, b = apply_gauge(H, b, act)
    g_auto = jax.jit(jax.grad(lambda dx: total_cost(p2.boxplus(CFG, dx), tables2, CFG)))(
        jnp.zeros(CFG.D)) * act
    gmax = float(jnp.abs(g_auto).max())
    err = float(jnp.abs(b + g_auto).max())
    assert err < 0.02 * max(gmax, 1e-3), f"gradient mismatch {err} vs |g|max {gmax}"


def test_drop_node_from_prior_preserves_marginal():
    """Removing an interior node from the prior (merge_node path) must be the
    Schur marginal of that node's 15 coordinates, with the columns above it
    compacted one slot left. Regression: before this existed, the prior kept
    its old columns after second-new-node merges and applied meters-level
    constraints to the WRONG nodes, which (through persistent GNSS chi2
    reweighting) sent the GVINS e2e off by hundreds of meters."""
    states, summs, gnss_pos, truth = build_world(seed=9)
    tables = make_tables(states, summs, gnss_pos, 6, truth)
    params, _, _ = jax.jit(lambda p, t: lm.solve(p, t, CFG, 40))(truth, tables)
    marg_tables, mask, _ = marg.select_marg_factors(tables, CFG, 2, oldest_kf_node=0)
    prior = marg.marginalize(params, marg_tables, mask, CFG)

    k = 3
    pr2 = marg.drop_node_from_prior(prior, CFG, k)

    # last node's columns vacated, x0 compacted
    nd = CFG.N * 15
    assert float(jnp.abs(pr2.H0[:, nd - 15 : nd]).max()) == 0.0
    np.testing.assert_allclose(np.asarray(pr2.x0.poses[k]), np.asarray(prior.x0.poses[k + 1]))

    # the information-form quadratic Q(dx) = c0 + 2 dx^T g + dx^T H dx
    # (= |e0 + J0 dx|^2) of the compacted prior must equal the original
    # quadratic minimized over node k's 15 coordinates
    H = np.asarray(prior.H0)
    g = np.asarray(prior.Jte0)
    c0 = float(prior.c0)
    NP = CFG.lm_off
    sk = slice(k * 15, (k + 1) * 15)
    Hkk = H[sk, sk]
    rng = np.random.default_rng(11)
    for _ in range(3):
        # random step on the compacted coordinates, embedded into the
        # original layout with node k minimized out
        dxc = rng.normal(0, 0.05, NP)
        dxo = np.zeros(NP)
        dxo[: k * 15] = dxc[: k * 15]
        dxo[(k + 1) * 15 : nd] = dxc[k * 15 : nd - 15]
        dxo[nd:] = dxc[nd:]
        # minimize Q over xk: grad_k = g_k + (H dxo)_k + Hkk xk = 0
        rhs = g[sk] + (H @ dxo)[sk]
        xk = -np.linalg.pinv(Hkk, rcond=1e-10, hermitian=True) @ rhs
        dxf = dxo.copy()
        dxf[sk] = xk
        cost_min = 0.5 * (c0 + 2.0 * dxf @ g + dxf @ H @ dxf)
        cost_comp = 0.5 * (float(pr2.c0) + 2.0 * dxc @ np.asarray(pr2.Jte0)
                           + dxc @ np.asarray(pr2.H0) @ dxc)
        np.testing.assert_allclose(cost_comp, cost_min, rtol=1e-6,
                                   atol=1e-6 * max(abs(cost_min), 1.0))
