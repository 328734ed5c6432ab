"""Schur-complement marginalization as full-layout masked dense linalgebra.

Parity target: MarginalizationInfo (factors/marginalization_info.h:73-253):
evaluate the factors touching the marginalized parameters, assemble H/b,
Schur-eliminate the marginalized block with an eigen pseudo-inverse, and
sqrt-factorize the reduced system into a linearized prior (J0, e0) replayed
as e = e0 + J0 (x ⊟ x0). Unlike the reference's absolute 1e-8 eigenvalue
cut, both eigendecompositions run on Jacobi-equilibrated matrices with a
RELATIVE cut — see _equilibrated_eigh for why the absolute cut is unstable
at preintegration information scales.

TPU-native design: instead of the reference's pointer-keyed index maps and
marg-first reordering, everything stays in the FULL fixed window layout (D
columns). The marginalized set is a 0/1 mask; the Schur complement is
computed with masked blocks and a clamped eigendecomposition, and parameters
absent from the collected factors simply have zero rows/columns — their J0
columns come out zero, which is exactly equivalent to the reference keeping
only "remained" blocks. No dynamic shapes, no per-event recompilation.

Window shifts after marginalization are a column roll of J0 / x0
(`shift_prior`), replacing the reference's parameter-block remapping
(ic_gvins.cc:1616-1627).
"""

import jax
import jax.numpy as jnp

from ..core import quaternion as quat
from ..solver.problem import (
    POSE_LOCAL,
    FactorTables,
    MargPrior,
    WindowConfig,
    WindowParams,
    build_normal_equations,
)

EPS = 1e-10  # RELATIVE eigenvalue cut on the Jacobi-equilibrated matrices


def _equilibrated_eigh(A):
    """eigh of D^{-1/2} A D^{-1/2} with D = clip(diag(A)).

    The reference thresholds raw eigenvalues at an ABSOLUTE 1e-8
    (marginalization_info.h:180-187). With whitened preintegration info the
    Hessian reaches ~1e9, so eigh's rounding junk on exact-null (gauge /
    untouched-parameter) directions lands anywhere up to ~1e-6 — randomly
    above or below an absolute cut. Junk directions that survive get
    1/sqrt(s) amplification in e0, inflating the prior's constant cost by
    orders of magnitude, which wrecks LM's relative convergence test and
    turns run outcomes chaotic. Equilibrating first collapses the scale
    spread: real information maps to O(1) eigenvalues, junk stays at
    ~D*eps_f64 ~ 1e-13, and a relative cut separates them cleanly.

    Returns (w, V, d) with A = d[:,None]*d[None,:] * (V w V^T)."""
    dg = jnp.diag(A)
    dmax = jnp.maximum(jnp.max(dg), 1.0)  # floor 1: zero/empty blocks stay finite
    d = jnp.sqrt(jnp.clip(dg, dmax * 1e-30, None))
    An = A / (d[:, None] * d[None, :])
    w, V = jnp.linalg.eigh(0.5 * (An + An.T))
    return w, V, d


def marginalize(params: WindowParams, marg_tables: FactorTables, marg_mask, cfg: WindowConfig):
    """Compute the linearized prior from the factors in ``marg_tables``.

    marg_tables: a FactorTables where ONLY the factors touching marginalized
    parameters are valid (the caller selects them: old prior, GNSS at marged
    nodes, preintegrations below the cut, init priors, oldest-keyframe
    reprojections — ic_gvins.cc:1482-1610). Robust flags: Huber on the
    reprojection blocks only.
    marg_mask: (D,) 0/1 — 1 for marginalized local coordinates.

    Returns a MargPrior linearized at ``params``.
    """
    H, b, act = build_normal_equations(params, marg_tables, cfg)
    # the prior inside marg_tables is evaluated at its own x0; H/b from
    # build_normal_equations already include it.

    J0, e0 = _schur_sqrt(H, b, marg_mask, (1.0 - marg_mask) * act)

    H0 = J0.T @ J0
    Jte0 = J0.T @ e0
    return MargPrior(J0=J0, H0=H0, e0=e0, Jte0=Jte0, x0=params, valid=jnp.ones(()))


def _schur_sqrt(H, b, m, r):
    """Schur-eliminate the masked coordinates and sqrt-factorize the result.

    m: (D,) 0/1 marginalized mask; r: (D,) 0/1 remained mask.
    Returns (J0, e0) with J0^T J0 = Hp and J0^T e0 = -bp."""
    Hmm = H * m[:, None] * m[None, :]
    Hrm = H * r[:, None] * m[None, :]
    Hrr = H * r[:, None] * r[None, :]
    bm = b * m
    br = b * r

    # eigen pseudo-inverse of the marginalized block
    # (marginalization_info.h:180-187, equilibrated — see _equilibrated_eigh)
    w, V, dm = _equilibrated_eigh(Hmm)
    keep = w > EPS * jnp.maximum(w[-1], 1.0)
    w_inv = jnp.where(keep, 1.0 / jnp.where(keep, w, 1.0), 0.0)
    Hmm_inv = ((V * w_inv[None, :]) @ V.T) / (dm[:, None] * dm[None, :])

    Hp = Hrr - Hrm @ Hmm_inv @ Hrm.T
    bp = br - Hrm @ (Hmm_inv @ bm)

    # sqrt factorization (marginalization_info.h:153-167, equilibrated:
    # Hp = Dp^1/2 (U s U^T) Dp^1/2  =>  J0 = sqrt(s) U^T Dp^1/2 and
    # e0 = -sqrt(s)^-1 U^T Dp^-1/2 bp, so H0 = J0^T J0 and J0^T e0 = -P bp)
    w, U, dp = _equilibrated_eigh(Hp)
    keep = w > EPS * jnp.maximum(w[-1], 1.0)
    s_clamped = jnp.where(keep, w, 0.0)
    s_inv = jnp.where(keep, 1.0 / jnp.where(keep, w, 1.0), 0.0)
    J0 = jnp.sqrt(s_clamped)[:, None] * (U.T * dp[None, :])
    e0 = -(jnp.sqrt(s_inv)[:, None] * U.T) @ (bp / dp)
    return J0, e0


def drop_node_from_prior(prior: MargPrior, cfg: WindowConfig, k: int):
    """Remove interior node ``k`` from the prior after a node merge.

    When a second-new keyframe's time node is merged away
    (removeUnusedTimeNode, ic_gvins.cc:754-789), every node above it shifts
    one slot left. The reference's prior follows implicitly — its parameter
    pointers alias the shifted deque storage — but with fixed slot columns
    the prior must be remapped explicitly, or it keeps applying its
    constraints to the WRONG nodes (meters-level |J0 dx0| that poisons every
    subsequent solve and, through chi2 reweighting, permanently disables
    GNSS). Statistically the right operation is to Schur-marginalize the
    merged node's 15 coordinates out of the prior, then compact columns.
    ``k`` is a host int."""
    D = cfg.D
    ND = cfg.node_dim
    idx = k * ND + jnp.arange(ND)
    m = jnp.zeros(D).at[idx].set(1.0)
    # restrict to coordinates the prior actually constrains (zero J0
    # columns stay zero through the Schur complement)
    act = (jnp.abs(prior.J0).max(axis=0) > 0).astype(jnp.float64)
    J0, e0 = _schur_sqrt(prior.H0, -prior.Jte0, m, (1.0 - m) * act)

    # compact: node columns > k move one slot left, last node zeroed
    nd = cfg.N * ND
    lo, hi = k * ND, (k + 1) * ND
    J0 = jnp.concatenate(
        [J0[:, :lo], J0[:, hi:nd], jnp.zeros((D, ND)), J0[:, nd:]], axis=1)
    poses0 = jnp.concatenate(
        [prior.x0.poses[:k], prior.x0.poses[k + 1:],
         jnp.zeros((1, 7)).at[0, 6].set(1.0)], axis=0)
    mixes0 = jnp.concatenate(
        [prior.x0.mixes[:k], prior.x0.mixes[k + 1:], jnp.zeros((1, cfg.mix_dim))], axis=0)
    x0 = prior.x0._replace(poses=poses0, mixes=mixes0)
    return prior._replace(J0=J0, H0=J0.T @ J0, e0=e0, Jte0=J0.T @ e0, x0=x0)


def shift_prior(prior: MargPrior, cfg: WindowConfig, shift):
    """Shift node slots left by ``shift`` after the window slides.

    Node-block columns of J0 (and the node entries of x0) roll left by
    shift*NODE_DIM; vacated tail columns are zeroed. ext/td/landmark columns
    are unchanged. ``shift`` may be a traced integer."""
    N = cfg.N
    ND = cfg.node_dim
    nd = N * ND

    keep = (jnp.arange(N) < (N - shift)).astype(prior.J0.dtype)
    keep_cols = jnp.repeat(keep, ND)

    Jn = jnp.roll(prior.J0[:, :nd], -shift * ND, axis=1) * keep_cols[None, :]
    J0 = jnp.concatenate([Jn, prior.J0[:, nd:]], axis=1)

    poses0 = jnp.roll(prior.x0.poses, -shift, axis=0)
    poses0 = jnp.where(keep[:, None] > 0, poses0, jnp.zeros_like(poses0).at[:, 6].set(1.0))
    mixes0 = jnp.roll(prior.x0.mixes, -shift, axis=0) * keep[:, None]
    x0 = prior.x0._replace(poses=poses0, mixes=mixes0)

    H0 = J0.T @ J0
    Jte0 = J0.T @ prior.e0
    return prior._replace(J0=J0, H0=H0, Jte0=Jte0, x0=x0)


def insert_node_slot_into_prior(prior: MargPrior, cfg: WindowConfig, k: int):
    """Shift node columns >= k one slot RIGHT after a node insertion at slot
    ``k`` (insertNewGnssTimeNode's mid-interval case truncates the tail and
    re-adds it after the new GNSS node, ic_gvins.cc:864-876 — every tail
    node moves up one slot). The new slot's columns are zero: the prior
    carries no constraint on the inserted node. Counterpart of
    ``drop_node_from_prior``; without it the prior constrains the wrong
    nodes after every mid-interval GNSS insertion. ``k`` is a host int.
    Insertion only happens with free slots (capacity is ensured first), so
    no information falls off the tail."""
    D = cfg.D
    ND = cfg.node_dim
    nd = cfg.N * ND
    lo = k * ND
    if __debug__:
        # callers must guarantee the last node slot is free — otherwise the
        # shift silently discards prior information on it (host-side eager
        # check; mid-interval insertions are rare so the cost is negligible)
        tail = float(jnp.abs(prior.J0[:, nd - ND : nd]).max())
        assert tail == 0.0, (
            f"insert_node_slot_into_prior would drop nonzero prior columns "
            f"on the last node slot (max |J0|={tail:g}); caller must ensure "
            f"free capacity before inserting")
    J0 = jnp.concatenate(
        [prior.J0[:, :lo], jnp.zeros((prior.J0.shape[0], ND)),
         prior.J0[:, lo : nd - ND], prior.J0[:, nd:]], axis=1)
    poses0 = jnp.concatenate(
        [prior.x0.poses[:k], jnp.zeros((1, 7)).at[0, 6].set(1.0),
         prior.x0.poses[k : cfg.N - 1]], axis=0)
    mixes0 = jnp.concatenate(
        [prior.x0.mixes[:k], jnp.zeros((1, cfg.mix_dim)),
         prior.x0.mixes[k : cfg.N - 1]], axis=0)
    x0 = prior.x0._replace(poses=poses0, mixes=mixes0)
    return prior._replace(J0=J0, H0=J0.T @ J0, Jte0=J0.T @ prior.e0, x0=x0)


def select_marg_factors(tables: FactorTables, cfg: WindowConfig, num_marg, oldest_kf_node):
    """Build the marg_tables + marg mask for marginalizing nodes
    [0, num_marg) and the landmarks referenced by the oldest keyframe
    (ic_gvins.cc:1482-1610). Pure array ops; num_marg/oldest_kf_node may be
    traced.

    Marginalized coordinates: all node blocks below the cut + the inverse
    depths whose reprojection reference node is the oldest keyframe node.
    """
    t = tables

    # GNSS factors at marged nodes only
    g_valid = t.gnss.valid * (t.gnss.idx < num_marg)
    gnss = t.gnss._replace(valid=g_valid, robust=jnp.zeros(()))

    # preintegration factors below the cut
    p_valid = t.preint.valid * (t.preint.idx0 < num_marg)
    preint = t.preint._replace(valid=p_valid)

    # reprojections whose landmark reference frame is the oldest keyframe
    r = t.reproj
    r_valid = r.valid * (r.ref_idx == oldest_kf_node)
    reproj = r._replace(valid=r_valid, robust=jnp.ones(()))

    # init priors pass through (valid flag already set/cleared by the engine);
    # the ImuErrorFactor is NEVER part of marginalization
    prior = t.prior._replace(imuerr_valid=jnp.zeros(()))

    marg_tables = t._replace(gnss=gnss, preint=preint, reproj=reproj, prior=prior)

    # marg mask over columns
    node_m = (jnp.arange(cfg.N) < num_marg).astype(jnp.float64)
    lm_m = jnp.zeros(cfg.L)
    # landmarks whose reference node is marginalized
    ref_is_old = (r.ref_idx == oldest_kf_node) & (r.valid > 0)
    lm_m = lm_m.at[r.lm_idx].max(ref_is_old.astype(jnp.float64))
    mask = jnp.concatenate(
        [
            jnp.repeat(node_m, cfg.node_dim),
            jnp.zeros(POSE_LOCAL),  # extrinsic always remains
            jnp.zeros(1),           # td always remains
            lm_m,
        ]
    )
    return marg_tables, mask, lm_m
