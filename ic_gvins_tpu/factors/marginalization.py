"""Schur-complement marginalization as full-layout masked dense linalgebra.

Parity target: MarginalizationInfo (factors/marginalization_info.h:73-253):
evaluate the factors touching the marginalized parameters, assemble H/b,
Schur-eliminate the marginalized block with an eigen pseudo-inverse, and
sqrt-factorize the reduced system into a linearized prior (J0, e0) replayed
as e = e0 + J0 (x ⊟ x0). Unlike the reference's absolute 1e-8 eigenvalue
cut, the factorizations run on Jacobi-equilibrated matrices with RELATIVE
thresholds — see _equilibrated_eigh for why the absolute cut is unstable at
preintegration information scales — and exploit the factor-graph structure
(diagonal landmark block, small marged-node block, landmark-free prior) so
no full-D spectral decomposition is ever needed (see _schur_sqrt /
_ridge_chol_sqrt for the TPU compile-time numbers that forced this).

TPU-native design: instead of the reference's pointer-keyed index maps and
marg-first reordering, assembly stays in the fixed window layout (D local
columns) and the RESULTING PRIOR lives on its true fixed (NP = lm_off)
node/ext/td support — marginalization removes every landmark its factors
touch, so landmark columns are identically zero and never stored. The
marginalized set is a 0/1 mask; the Schur complement is computed with masked
blocks, and parameters absent from the collected factors simply have zero
rows/columns — their J0 columns come out zero, which is exactly equivalent
to the reference keeping only "remained" blocks. No dynamic shapes, no
per-event recompilation.

Window shifts after marginalization are a column roll of J0 / x0
(`shift_prior`), replacing the reference's parameter-block remapping
(ic_gvins.cc:1616-1627).
"""

import jax
import jax.numpy as jnp

from ..core import quaternion as quat
from ..core.linalg64 import chol_inv_blocked
from ..solver.problem import (
    POSE_LOCAL,
    FactorTables,
    MargPrior,
    WindowConfig,
    WindowParams,
    build_normal_blocks,
)

RIDGE = 1e-9  # relative ridge pinning null directions, on equilibrated scale


def _equilibrated_chol_inv(A):
    """(L, W=L^{-1}, d, ridge) of the Jacobi-equilibrated, RIDGE-regularized
    ``A``: A + ridge*diag(d^2) = d[:,None]*d[None,:] * (L @ L.T), W = L^{-1}.

    Equilibration lesson (hard-won, round 1): the reference thresholds raw
    eigenvalues at an ABSOLUTE 1e-8 (marginalization_info.h:180-187). With
    whitened preintegration info the Hessian reaches ~1e9, so factorization
    junk on exact-null (gauge / untouched-parameter) directions lands
    anywhere up to ~1e-6 — randomly above or below an absolute threshold,
    making run outcomes depend on process-level rounding. Equilibrating
    first collapses the scale spread: real information maps to O(1), junk
    stays at ~D*eps_f64 ~ 1e-13, and a RELATIVE ridge (1e-9 >> junk,
    << real) regularizes cleanly. If assembly noise ever exceeds the ridge
    (non-PD → NaN factor), retry once with a 1e5-stronger pin — under
    lax.cond so the rare fallback factorization never runs on the healthy
    path (it used to double every marginalization's runtime)."""
    dg = jnp.diag(A)
    dmax = jnp.maximum(jnp.max(dg), 1.0)  # floor 1: zero/empty blocks stay finite
    d = jnp.sqrt(jnp.clip(dg, dmax * 1e-30, None))
    An = A / (d[:, None] * d[None, :])
    An = 0.5 * (An + An.T)
    eye = jnp.eye(A.shape[0], dtype=A.dtype)
    L, W = chol_inv_blocked(An + RIDGE * eye)
    ok = jnp.all(jnp.isfinite(L)) & jnp.all(jnp.isfinite(W))
    L, W = jax.lax.cond(
        ok,
        lambda: (L, W),
        lambda: chol_inv_blocked(An + (RIDGE * 1e5) * eye),
    )
    ridge = jnp.where(ok, RIDGE, RIDGE * 1e5)
    return L, W, d, ridge


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
    # ridge; marginalization is rare (~0.1/frame) so the cost is negligible.
    Hss, Hsl, hll, b, act = build_normal_blocks(params, marg_tables, cfg,
                                                reproj_f64=True)
    # the prior inside marg_tables is evaluated at its own x0 and already
    # included in the assembled blocks.

    node_idx = jnp.arange(cfg.marg_cap * cfg.node_dim, dtype=jnp.int32)
    J0, e0, H0, bp = _schur_sqrt(Hss, Hsl, hll, b, marg_mask,
                                 (1.0 - marg_mask) * act, node_idx, cfg)
    # H0 = J0^T J0 and Jte0 = -bp hold BY CONSTRUCTION of the Cholesky sqrt
    # (_ridge_chol_sqrt) — recomputing the Gram product here was a D^3=819^3
    # software-emulated-f64 matmul doing 19x the work of the prior's true
    # NP^2 support, per marginalization.
    return MargPrior(J0=J0, H0=H0, e0=e0, Jte0=-bp, x0=params, valid=jnp.ones(()))


def _ridge_chol_sqrt(Hp, bp):
    """sqrt-factorize ``Hp`` into (J0p, e0p, H0p) with J0p^T J0p = H0p =
    Hp + ridge*diag(d^2) and J0p^T e0p = -bp EXACTLY, via Jacobi-equilibrated
    Cholesky (H0p is returned so callers never need the Gram product).

    Replaces the reference's eigendecomposition sqrt
    (marginalization_info.h:153-167). Two reasons:
    (a) XLA:TPU compiles f64 eigh above ~256 through a QDWH expansion that
        takes MINUTES (measured on chip: 135 s at D=307, 387 s at D=512 —
        round 2's bench died on exactly this); Cholesky compiles in seconds;
    (b) at runtime the triangular factorization is ~10x cheaper than the
        spectral one on every backend.
    Semantics: instead of CUTTING null-space (gauge / untouched-parameter)
    directions, each direction is pinned to x0 with RIDGE-relative strength
    (~1e-9 of the diagonal scale) — statistically negligible information.
    For least-squares H,b we have b in range(H), so the null components of
    bp are rounding-level and e0 stays at residual scale: the |e0|^2 and
    gradient-consistency gates in tests/test_marginalization.py still hold.
    """
    L, W, d, ridge = _equilibrated_chol_inv(Hp)
    J0p = L.T * d[None, :]
    e0p = -(W @ (bp / d))
    H0p = Hp + jnp.diag(ridge * d * d)
    return J0p, e0p, H0p


def _schur_sqrt(Hss, Hsl, hll, b, m, r, node_idx, cfg):
    """Schur-eliminate the masked coordinates and sqrt-factorize the result.

    Inputs are the BLOCK normal equations (build_normal_blocks): Hss
    (NP,NP) over node/ext/td coords, Hsl (NP,L) node-landmark coupling,
    hll (L,) the diagonal landmark block, b (D,). m: (D,) 0/1 marginalized
    mask; r: (D,) 0/1 remained mask. Returns (J0, e0, H0, bp) on the prior's
    TRUE (NP,NP) support — remained support never includes landmark columns
    (see below) so nothing outside the leading NP block is ever nonzero —
    with J0^T J0 = H0 = Hp (+ relative ridge) and J0^T e0 = -bp exactly.

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

    Net: the diagonal landmark elimination + one |node_idx| (<= 90) and one
    leading-block (N*node_dim+7) blocked f64 Cholesky (core/linalg64.py)
    replace the reference's full-D eigendecompositions, whose XLA:TPU
    compile alone takes minutes and whose runtime is ~50x this path.
    Rank-deficient directions (gauge / untouched params) are pinned with a
    RIDGE-relative (~1e-9) weight instead of being cut: for least-squares
    H,b we have b in range(H), so null components of bp are rounding-level
    and e0 stays at residual scale (gates in tests/test_marginalization.py).
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

    # inverse of the landmark-eliminated marged node block (the reference's
    # eigen pseudo-inverse, marginalization_info.h:180-187; joint null
    # vectors with landmark components project into S's null space, where
    # the equilibrated relative ridge takes over the rank handling)
    S = A - (B * c_inv[None, :]) @ B.T
    Ls, Ws, dm, _ = _equilibrated_chol_inv(S)
    S1 = (Ws.T @ Ws) / (dm[:, None] * dm[None, :])
    # one Newton step toward the true pseudo-inverse: the plain ridged
    # inverse underweights weakly-determined directions by ridge/w (~1e-6
    # relative at w ~ 1e-3); refinement squares that to ~1e-12 while null
    # junk stays range-consistent (contribution ~eps^2/ridge ~ 1e-17)
    S_inv = 2.0 * S1 - S1 @ S @ S1

    # remained (rows, <= NP) x marged (cols) coupling blocks
    Un = Hss[:, node_idx] * (rN[:, None] * m_n[None, :])
    Ul = Hsl * (rN[:, None] * m_l[None, :])
    Ulc = Ul * c_inv[None, :]
    W = Un - Ulc @ B.T

    Hrr = Hss * (rN[:, None] * rN[None, :])
    Hp = Hrr - Ulc @ Ul.T - (W @ S_inv) @ W.T

    bm = b * m
    bl = bm[lo:]
    x_n = S_inv @ (bm[:NP][node_idx] - B @ (c_inv * bl))
    bp = (b * r)[:NP] - W @ x_n - Ul @ (c_inv * bl)

    J0p, e0p, H0p = _ridge_chol_sqrt(0.5 * (Hp + Hp.T), bp)
    return J0p, e0p, H0p, bp


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
    # is RELATIVE: ridge-pinned null columns sit ~15 orders below real ones)
    amax = jnp.abs(prior.J0).max()
    act = (jnp.abs(prior.J0).max(axis=0)
           > 1e-12 * jnp.maximum(amax, 1e-30)).astype(jnp.float64)
    # the prior is landmark-free by construction: pad zero landmark blocks
    J0, e0, H0, bp = _schur_sqrt(
        prior.H0, jnp.zeros((NP, cfg.L)), jnp.zeros(cfg.L),
        jnp.concatenate([-prior.Jte0, jnp.zeros(cfg.L)]),
        m, (1.0 - m) * jnp.concatenate([act, jnp.zeros(cfg.L)]),
        jnp.asarray(idx, jnp.int32), cfg)

    # compact: node columns > k move one slot left, last node zeroed. The
    # same permutation applied to H0's rows+cols and Jte0's entries updates
    # the cached Gram products EXACTLY — no matmul.
    nd = cfg.N * ND
    lo, hi = k * ND, (k + 1) * ND

    def comp_cols(M):
        return jnp.concatenate(
            [M[:, :lo], M[:, hi:nd], jnp.zeros((M.shape[0], ND), M.dtype),
             M[:, nd:]], axis=1)

    J0 = comp_cols(J0)
    H0 = comp_cols(comp_cols(H0).T)
    nbp = -bp
    Jte0 = jnp.concatenate([nbp[:lo], nbp[hi:nd], jnp.zeros(ND), nbp[nd:]])
    poses0 = jnp.concatenate(
        [prior.x0.poses[:k], prior.x0.poses[k + 1:],
         jnp.zeros((1, 7)).at[0, 6].set(1.0)], axis=0)
    mixes0 = jnp.concatenate(
        [prior.x0.mixes[:k], prior.x0.mixes[k + 1:], jnp.zeros((1, cfg.mix_dim))], axis=0)
    x0 = prior.x0._replace(poses=poses0, mixes=mixes0)
    return prior._replace(J0=J0, H0=H0, e0=e0, Jte0=Jte0, x0=x0)


def shift_prior(prior: MargPrior, cfg: WindowConfig, shift):
    """Shift node slots left by ``shift`` after the window slides.

    Node-block columns of J0 (and the node entries of x0) roll left by
    shift*NODE_DIM; vacated tail columns are zeroed. ext/td columns are
    unchanged. ``shift`` may be a traced integer. H0/Jte0 follow by the SAME
    roll applied to H0's rows+cols and Jte0's entries — a column permutation
    of J0 permutes the Gram matrix exactly, so the former J0ᵀJ0 recompute
    (an NP³, previously 819³, software-f64 matmul per window slide) is
    pure waste."""
    N = cfg.N
    ND = cfg.node_dim
    nd = N * ND

    keep = (jnp.arange(N) < (N - shift)).astype(prior.J0.dtype)
    keep_cols = jnp.repeat(keep, ND)

    def roll_cols(M):
        Mn = jnp.roll(M[:, :nd], -shift * ND, axis=1) * keep_cols[None, :]
        return jnp.concatenate([Mn, M[:, nd:]], axis=1)

    J0 = roll_cols(prior.J0)
    H0 = roll_cols(roll_cols(prior.H0).T)
    Jte0 = jnp.concatenate(
        [jnp.roll(prior.Jte0[:nd], -shift * ND) * keep_cols, prior.Jte0[nd:]])

    poses0 = jnp.roll(prior.x0.poses, -shift, axis=0)
    poses0 = jnp.where(keep[:, None] > 0, poses0, jnp.zeros_like(poses0).at[:, 6].set(1.0))
    mixes0 = jnp.roll(prior.x0.mixes, -shift, axis=0) * keep[:, None]
    x0 = prior.x0._replace(poses=poses0, mixes=mixes0)

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
    def ins_cols(M):
        return jnp.concatenate(
            [M[:, :lo], jnp.zeros((M.shape[0], ND), M.dtype),
             M[:, lo : nd - ND], M[:, nd:]], axis=1)

    # same permutation on H0 rows+cols / Jte0 entries: exact, matmul-free
    J0 = ins_cols(prior.J0)
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
    return prior._replace(J0=J0, H0=H0, Jte0=Jte0, x0=x0)


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
