"""Schur-complement marginalization as full-layout masked dense linalgebra.

Parity target: MarginalizationInfo (factors/marginalization_info.h:73-253):
evaluate the factors touching the marginalized parameters, assemble H/b,
Schur-eliminate the marginalized block with an eigen pseudo-inverse, and
carry the reduced system forward as a prior on the remained parameters.
Unlike the reference's absolute 1e-8 eigenvalue cut, the factorizations run
on Jacobi-equilibrated matrices with RELATIVE thresholds — see
_equilibrated_chol32 for why the absolute cut is unstable at preintegration
information scales — and exploit the factor-graph structure (diagonal
landmark block, small marged-node block, landmark-free prior) so no full-D
factorization is ever needed.

TPU-native design, two key departures from the reference:

* INFORMATION form, not sqrt form. The reference sqrt-factorizes the
  reduced system into (J0, e0) and replays e = e0 + J0 (x ⊟ x0)
  (marginalization_info.h:153-167). Every downstream consumer only needs
  the Gram quantities H0 = J0ᵀJ0, g0 = J0ᵀe0 and the constant c0 = |e0|²
  (cost: |e|² = c0 + 2 dxᵀg0 + dxᵀH0dx; gradient/Hessian likewise), so the
  prior is stored as (H0, Jte0, c0) directly and the sqrt factorization —
  whose f64 Cholesky XLA:TPU serializes into a measured ~16 ms at NP=307
  (scripts/dev/prof_marg6.py) — is never performed at all.

* No f64 lax.linalg anywhere: the only factorizations are f32 Cholesky
  seeds (+ f64 matmul Newton/iterative refinement), the production pattern
  of solver/lm.py. f64 MATMULS are fast on the MXU (96 MFLOP in ~0.8 ms
  measured); f64 cholesky/triangular_solve are the serialized kernels this
  module must avoid.

Assembly stays in the fixed window layout (D local columns) and the
RESULTING PRIOR lives on its true fixed (NP = lm_off) node/ext/td support —
marginalization removes every landmark its factors touch, so landmark
columns are identically zero and never stored. The marginalized set is a
0/1 mask; parameters absent from the collected factors have zero rows/
columns — equivalent to the reference keeping only "remained" blocks. No
dynamic shapes, no per-event recompilation.

Window shifts after marginalization are a row+column roll of H0 / x0
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
    build_normal_blocks,
)

RIDGE = 1e-9       # prior null-direction pin (relative, equilibrated scale)
RIDGE_FACT = 1e-6  # factorization ridge: the Cholesky seeds run in f32, so
                   # the ridge must dominate f32 rounding (~1e-7); the
                   # pseudo-inverse correction steps in _schur_reduce remove
                   # its bias double-exponentially ((ridge/w)^4 after two)


def _equilibrated_chol32(A, ridge=RIDGE_FACT):
    """f32 Cholesky seed of the Jacobi-equilibrated, ridged ``A``.

    Returns (L32, d, An, ridge_used): An = A/(d dᵀ) symmetrized (f64),
    L32 = chol_f32(An + ridge·I), with a lax.cond retry at 1e3x the ridge
    if rounding made the nominal factorization non-PD.

    Equilibration lesson (hard-won, round 1): the reference thresholds raw
    eigenvalues at an ABSOLUTE 1e-8 (marginalization_info.h:180-187). With
    whitened preintegration info the Hessian reaches ~1e9, so factorization
    junk on exact-null (gauge / untouched-parameter) directions lands
    anywhere up to ~1e-6 — randomly above or below an absolute threshold,
    making run outcomes depend on process-level rounding. Equilibrating
    first collapses the scale spread: real information maps to O(1), junk
    stays tiny, and a RELATIVE ridge regularizes cleanly.

    f32 lesson (round 4): XLA:TPU serializes f64 cholesky/triangular_solve
    into a minutes-to-compile, ~16 ms-to-run path (n=307), while the f32
    kernels take ~0.1 ms; _refined_solve restores f64 solution accuracy
    with f64 residual GEMMs."""
    dg = jnp.diag(A)
    dmax = jnp.maximum(jnp.max(dg), 1.0)  # floor 1: zero/empty blocks stay finite
    d = jnp.sqrt(jnp.clip(dg, dmax * 1e-30, None))
    An = A / (d[:, None] * d[None, :])
    An = 0.5 * (An + An.T)
    eye32 = jnp.eye(A.shape[0], dtype=jnp.float32)
    A32 = An.astype(jnp.float32)
    L = jnp.linalg.cholesky(A32 + jnp.float32(ridge) * eye32)
    ok = jnp.all(jnp.isfinite(L))
    L = jax.lax.cond(
        ok,
        lambda: L,
        lambda: jnp.linalg.cholesky(A32 + jnp.float32(ridge * 1e3) * eye32),
    )
    ridge_used = jnp.where(ok, ridge, ridge * 1e3)
    return L, d, An, ridge_used


def _refined_solve(L32, An, rhs, iters=2):
    """Solve (An + ridge·I) y = rhs to ~f64 accuracy: f32 cho_solve seed +
    ``iters`` f64 residual refinement passes (each one f64 GEMM + one f32
    re-solve — solver/lm.py's production pattern, matrix-rhs form).

    An/rhs are f64 on the equilibrated scale; L32 is the f32 factor of the
    ridged An. Refinement against the UNRIDGED An: the iteration matrix
    eigenvalue on a direction of strength w is ridge/(w+ridge) (< 1), so
    determined directions converge to the exact solution and ridge bias
    survives only within ~a decade of the ridge; null components of rhs are
    rounding-level for least-squares inputs (b ∈ range(H))."""
    def solve32(r):
        return jax.scipy.linalg.cho_solve(
            (L32, True), r.astype(jnp.float32)).astype(jnp.float64)

    y = solve32(rhs)
    for _ in range(iters):
        y = y + solve32(rhs - An @ y)
    return y


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
    # block form: the full (D,D) dense H is never materialized — the
    # landmark block is diagonal by construction (build_normal_blocks).
    # reproj_f64: here H becomes the prior itself (not just an LM
    # preconditioner), so the reprojection blocks are assembled in f64 —
    # f32 assembly noise (~1e-7 relative) would exceed the 1e-9 relative
    # prior pin; marginalization is rare (~0.1/frame) so the cost is small.
    Hss, Hsl, hll, b, act = build_normal_blocks(params, marg_tables, cfg,
                                                reproj_f64=True)
    # the prior inside marg_tables is evaluated at its own x0 and already
    # included in the assembled blocks.

    node_idx = jnp.arange(cfg.marg_cap * cfg.node_dim, dtype=jnp.int32)
    H0, bp, c0 = _schur_reduce(Hss, Hsl, hll, b, marg_mask,
                               (1.0 - marg_mask) * act, node_idx, cfg)
    return MargPrior(H0=H0, Jte0=-bp, c0=c0, x0=params, valid=jnp.ones(()))


def _schur_reduce(Hss, Hsl, hll, b, m, r, node_idx, cfg):
    """Schur-eliminate the masked coordinates; return the reduced system in
    information form.

    Inputs are the BLOCK normal equations (build_normal_blocks): Hss
    (NP,NP) over node/ext/td coords, Hsl (NP,L) node-landmark coupling,
    hll (L,) the diagonal landmark block, b (D,). m: (D,) 0/1 marginalized
    mask; r: (D,) 0/1 remained mask. Returns (H0, bp, c0) on the prior's
    TRUE (NP,NP) support — remained support never includes landmark columns
    (see below) — with H0 = Hp + ridge pin, and c0 = bpᵀHp⁺bp the constant
    the reference's sqrt factorization would produce as |e0|²
    (e0 = Λ^{-1/2}Vᵀbp ⇒ |e0|² = bpᵀHp⁺bp, marginalization_info.h:153-167).

    Exploits the problem's structure instead of factoring the full D x D
    system (819 at production sizing) like the reference does:

    * marged NON-landmark coords all lie inside the static candidate set
      ``node_idx`` (the leading ``marg_cap`` node blocks for a window slide;
      one interior node block for a merge) — the caller guarantees this;
    * landmark coords couple to each other only diagonally (two inverse
      depths never share a factor), so their elimination is a diagonal
      scaling;
    * remained support never includes landmark columns: the prior carries
      node/extrinsic/td information only (select_marg_factors marginalizes
      every landmark its collected factors touch, matching
      ic_gvins.cc:1569-1610, and priors chain inductively).

    The marged-node block S (≤ 90) is applied as a PSEUDO-inverse operator:
    f32-Cholesky-seeded refined solves of the RIDGE_FACT-ridged system, then
    two Newton pseudo-inverse correction steps X ← X(2I − SX) applied in
    solve form — the elimination error on a direction of strength w falls as
    (ridge/(w+ridge))^(2^k), i.e. ~(1e-3)^4 = 1e-12 at w=1e-3 — matching the
    old f64 path's (1e-9/w)^2 while never touching XLA:TPU's serialized f64
    factorization kernels (measured ~6 ms at n=90, ~16 ms at n=307; this
    path is ~0.5 ms). Rank-deficient directions (gauge / untouched params)
    are pinned instead of cut: for least-squares H,b we have b ∈ range(H),
    so null components of bp are rounding-level and c0 stays at residual
    scale (gates in tests/test_marginalization.py).
    """
    NP = cfg.lm_off
    lo = cfg.lm_off
    m_n = m[node_idx]
    m_l = m[lo:]
    rN = r[:NP]

    # masked marg blocks: A (node x node), B (node x landmark), c (lm diag)
    A = Hss[node_idx][:, node_idx] * (m_n[:, None] * m_n[None, :])
    B = Hsl[node_idx] * (m_n[:, None] * m_l[None, :])
    c = hll * m_l
    c_inv = jnp.where(c > jnp.maximum(jnp.max(c), 1.0) * 1e-30,
                      1.0 / jnp.where(c > 0, c, 1.0), 0.0)

    # landmark-eliminated marged node block (the reference's eigen
    # pseudo-inverse target, marginalization_info.h:180-187; joint null
    # vectors with landmark components project into S's null space, where
    # the equilibrated relative ridge takes over the rank handling)
    S = A - (B * c_inv[None, :]) @ B.T

    # remained (rows, <= NP) x marged (cols) coupling blocks
    Un = Hss[:, node_idx] * (rN[:, None] * m_n[None, :])
    Ul = Hsl * (rN[:, None] * m_l[None, :])
    Ulc = Ul * c_inv[None, :]
    W = Un - Ulc @ B.T

    bm = b * m
    bl = bm[lo:]
    u = bm[:NP][node_idx] - B @ (c_inv * bl)

    # apply S⁺ to [Wᵀ | u] in solve form (equilibrated scale throughout)
    Ls, dS, Sn, _ = _equilibrated_chol32(S)
    rhs = jnp.concatenate([W.T, u[:, None]], axis=1) / dS[:, None]

    def x0_apply(Z):
        return _refined_solve(Ls, Sn, Z)

    def x1_apply(Z):  # one Newton pseudo-inverse step: X1 = X0(2I - Sn X0)
        Y = x0_apply(Z)
        return 2.0 * Y - x0_apply(Sn @ Y)

    # ONE Newton correction: elimination error on a direction of strength w
    # falls as (ridge/(w+ridge))^2 = 1e-12 at w=1 equilibrated — already
    # below the 1e-9 relative pin. A second step ((..)^4) was measured
    # indistinguishable at every tests/test_marginalization.py gate AND on
    # the chained 7-marginalization batch oracle (test_batch_oracle: final
    # biases differ by ~1e-8 between one and two steps) while costing 2
    # extra refined solves + 2 (90,307) f64 GEMMs per event.
    Y2 = x1_apply(rhs)
    # undo equilibration: S⁺ = dS⁻¹ Sn⁺ dS⁻¹, rhs was already right-scaled
    Yu = Y2 / dS[:, None]
    G = Yu[:, :NP]        # (|node_idx|, NP) = S⁺ Wᵀ
    x_n = Yu[:, NP]       # (|node_idx|,)   = S⁺ u

    Hrr = Hss * (rN[:, None] * rN[None, :])
    Hp = Hrr - Ulc @ Ul.T - W @ G
    Hp = 0.5 * (Hp + Hp.T)
    bp = (b * r)[:NP] - W @ x_n - Ul @ (c_inv * bl)

    # prior pin + constant. c0 = bpᵀHp⁺bp via one more f32-seeded refined
    # solve; its ridge bias is ≤ ~1e-6 relative — c0 is a COST CONSTANT
    # (affects only LM's relative-decrease test), not an estimate.
    dgp = jnp.diag(Hp)
    dpmax = jnp.maximum(jnp.max(dgp), 1.0)
    dp = jnp.sqrt(jnp.clip(dgp, dpmax * 1e-30, None))
    H0 = Hp + jnp.diag(RIDGE * dp * dp)
    Lp, dpe, Hn, _ = _equilibrated_chol32(Hp)
    yhat = _refined_solve(Lp, Hn, (bp / dpe)[:, None])[:, 0]
    c0 = jnp.maximum(jnp.dot(bp / dpe, yhat), 0.0)
    c0 = jnp.where(jnp.isfinite(c0), c0, 0.0)
    return H0, bp, c0


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
    NP = cfg.lm_off
    ND = cfg.node_dim
    idx = k * ND + jnp.arange(ND)
    m = jnp.zeros(D).at[idx].set(1.0)
    # restrict to coordinates the prior actually constrains (the threshold
    # is RELATIVE: pin-level null diagonals sit many orders below real ones;
    # diag(H0) is the squared column scale of the implicit sqrt factor)
    dg = jnp.diag(prior.H0)
    act = (dg > 1e-24 * jnp.maximum(jnp.max(dg), 1e-30)).astype(jnp.float64)
    # the prior is landmark-free by construction: pad zero landmark blocks
    H0, bp, c0 = _schur_reduce(
        prior.H0, jnp.zeros((NP, cfg.L)), jnp.zeros(cfg.L),
        jnp.concatenate([-prior.Jte0, jnp.zeros(cfg.L)]),
        m, (1.0 - m) * jnp.concatenate([act, jnp.zeros(cfg.L)]),
        jnp.asarray(idx, jnp.int32), cfg)

    # compact: node columns > k move one slot left, last node zeroed — a
    # pure permutation of H0's rows+cols and Jte0's entries (c0 unchanged).
    nd = cfg.N * ND
    lo, hi = k * ND, (k + 1) * ND

    def comp_cols(M):
        return jnp.concatenate(
            [M[:, :lo], M[:, hi:nd], jnp.zeros((M.shape[0], ND), M.dtype),
             M[:, nd:]], axis=1)

    H0 = comp_cols(comp_cols(H0).T)
    nbp = -bp
    Jte0 = jnp.concatenate([nbp[:lo], nbp[hi:nd], jnp.zeros(ND), nbp[nd:]])
    poses0 = jnp.concatenate(
        [prior.x0.poses[:k], prior.x0.poses[k + 1:],
         jnp.zeros((1, 7)).at[0, 6].set(1.0)], axis=0)
    mixes0 = jnp.concatenate(
        [prior.x0.mixes[:k], prior.x0.mixes[k + 1:], jnp.zeros((1, cfg.mix_dim))], axis=0)
    x0 = prior.x0._replace(poses=poses0, mixes=mixes0)
    return prior._replace(H0=H0, Jte0=Jte0, c0=c0, x0=x0)


def shift_prior(prior: MargPrior, cfg: WindowConfig, shift):
    """Shift node slots left by ``shift`` after the window slides.

    Node-block rows+columns of H0 (and the node entries of Jte0/x0) roll
    left by shift*NODE_DIM; vacated tail rows/columns are zeroed. ext/td
    are unchanged; c0 is invariant under relabeling. ``shift`` may be a
    traced integer. A pure permutation — the former sqrt-factor recompute
    (an NP³, previously 819³, software-f64 matmul per window slide) was
    pure waste."""
    N = cfg.N
    ND = cfg.node_dim
    nd = N * ND

    keep = (jnp.arange(N) < (N - shift)).astype(prior.H0.dtype)
    keep_cols = jnp.repeat(keep, ND)

    def roll_cols(M):
        Mn = jnp.roll(M[:, :nd], -shift * ND, axis=1) * keep_cols[None, :]
        return jnp.concatenate([Mn, M[:, nd:]], axis=1)

    H0 = roll_cols(roll_cols(prior.H0).T)
    Jte0 = jnp.concatenate(
        [jnp.roll(prior.Jte0[:nd], -shift * ND) * keep_cols, prior.Jte0[nd:]])

    poses0 = jnp.roll(prior.x0.poses, -shift, axis=0)
    poses0 = jnp.where(keep[:, None] > 0, poses0, jnp.zeros_like(poses0).at[:, 6].set(1.0))
    mixes0 = jnp.roll(prior.x0.mixes, -shift, axis=0) * keep[:, None]
    x0 = prior.x0._replace(poses=poses0, mixes=mixes0)

    return prior._replace(H0=H0, Jte0=Jte0, x0=x0)


def check_insert_capacity(prior: MargPrior, cfg: WindowConfig):
    """Callers of ``insert_node_slot_into_prior`` must guarantee the last
    node slot is free — otherwise the shift silently discards prior
    information on it. The threshold is RELATIVE: a freshly marginalized
    prior carries pin/d-floor junk (~1e-15 of the leading scale) in
    inactive tail columns, ~6+ orders below any real constraint (cf. the
    1e-24-relative diagonal activity cut in drop_node_from_prior). Host-
    side eager check, kept OUT of the (jitted) permutation — as a traced
    op it could neither raise nor stay cheap."""
    ND = cfg.node_dim
    nd = cfg.N * ND
    tail = float(jnp.abs(prior.H0[:, nd - ND : nd]).max())
    scale = float(jnp.abs(prior.H0).max())
    if tail > 1e-9 * max(scale, 1e-30):
        raise RuntimeError(
            f"insert_node_slot_into_prior would drop nonzero prior columns "
            f"on the last node slot (max |H0|={tail:g} vs scale {scale:g}); "
            f"caller must ensure free capacity before inserting")


def insert_node_slot_into_prior(prior: MargPrior, cfg: WindowConfig, k: int):
    """Shift node columns >= k one slot RIGHT after a node insertion at slot
    ``k`` (insertNewGnssTimeNode's mid-interval case truncates the tail and
    re-adds it after the new GNSS node, ic_gvins.cc:864-876 — every tail
    node moves up one slot). The new slot's columns are zero: the prior
    carries no constraint on the inserted node. Counterpart of
    ``drop_node_from_prior``; without it the prior constrains the wrong
    nodes after every mid-interval GNSS insertion. ``k`` is a host int.
    Callers run ``check_insert_capacity`` first (free tail slot) and
    dispatch through estimator._insert_node_jit — eager, the ~40-op
    permutation costs ~10 ms of pure CPU dispatch per insertion."""
    D = cfg.D
    ND = cfg.node_dim
    nd = cfg.N * ND
    lo = k * ND

    def ins_cols(M):
        return jnp.concatenate(
            [M[:, :lo], jnp.zeros((M.shape[0], ND), M.dtype),
             M[:, lo : nd - ND], M[:, nd:]], axis=1)

    # permutation on H0 rows+cols / Jte0 entries: exact, matmul-free
    H0 = ins_cols(ins_cols(prior.H0).T)
    Jte0 = jnp.concatenate(
        [prior.Jte0[:lo], jnp.zeros(ND), prior.Jte0[lo : nd - ND],
         prior.Jte0[nd:]])
    poses0 = jnp.concatenate(
        [prior.x0.poses[:k], jnp.zeros((1, 7)).at[0, 6].set(1.0),
         prior.x0.poses[k : cfg.N - 1]], axis=0)
    mixes0 = jnp.concatenate(
        [prior.x0.mixes[:k], jnp.zeros((1, cfg.mix_dim)),
         prior.x0.mixes[k : cfg.N - 1]], axis=0)
    x0 = prior.x0._replace(poses=poses0, mixes=mixes0)
    return prior._replace(H0=H0, Jte0=Jte0, x0=x0)


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
