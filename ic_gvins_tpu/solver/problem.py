"""Fixed-shape sliding-window problem: parameter layout + batched assembly.

Replaces the reference's ceres::Problem construction (ic_gvins.cc:1130-1239,
1697-1936) with a TPU-native design: every parameter and factor lives in a
fixed-size padded table with validity masks, residuals/jacobians evaluate
under vmap in one fused call, and the Gauss-Newton normal equations are
assembled with batched scatter-adds into a dense H — no pointers, no
dynamic shapes, no recompilation as the window slides.

Local parameter layout (D = N*15 + 7 + L columns):
  node k: [k*15, k*15+6)  pose tangent (dp, dtheta)
          [k*15+6, k*15+15) mix (v, bg, ba)
  ext:    [N*15, N*15+6)  camera-IMU extrinsic pose tangent
  td:     N*15+6          camera-IMU time delay
  lm j:   N*15+7+j        inverse depth
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import quaternion as quat
from ..factors import basic, preint_factor, reprojection
from ..factors.robust import correct_block, correct_blocks, huber_rho
from ..ins.preintegration import PreintSummary

NODE_DIM = 15
POSE_LOCAL = 6
MIX_DIM = 9


class WindowConfig(NamedTuple):
    """Static table sizes (python ints — part of the jit cache key)."""

    N: int = 20     # time-node slots
    L: int = 512    # landmark slots
    G: int = 24     # GNSS factor slots
    R: int = 2048   # reprojection factor slots
    with_earth: bool = True
    with_odo: bool = False  # wheel odometer: mix gains sodo, preint 19-res

    @property
    def P(self):
        return self.N - 1  # preintegration factor slots (consecutive nodes)

    @property
    def node_dim(self):
        """Per-node local dim: pose(6) + mix. The mix block grows to 10
        (v, bg, ba, sodo) with the odometer, as the reference sizes its
        parameter blocks through numMixParameter
        (preintegration/preintegration.h:32-119, integration_state.h:59-63)."""
        return NODE_DIM + 1 if self.with_odo else NODE_DIM

    @property
    def mix_dim(self):
        return MIX_DIM + 1 if self.with_odo else MIX_DIM

    @property
    def preint_res(self):
        """Preintegration residual dim: 15, or 19 with odometer
        (dp, dv, dq, dbg, dba, ds, dsodo — preintegration_odo.cc:27-305)."""
        return 19 if self.with_odo else 15

    @property
    def marg_cap(self):
        """Static bound on nodes marginalized per window slide (at most the
        second-oldest keyframe's node; GNSS 1 Hz vs keyframes ~2 Hz keeps the
        real count at 1-3). Sizes the small marged-node block factored by
        marginalization._schur_reduce; the estimator asserts num_marg stays
        under it."""
        return min(6, self.N)

    @property
    def ext_off(self):
        return self.N * self.node_dim

    @property
    def td_off(self):
        return self.ext_off + POSE_LOCAL

    @property
    def lm_off(self):
        return self.ext_off + POSE_LOCAL + 1

    @property
    def D(self):
        return self.lm_off + self.L


class WindowParams(NamedTuple):
    """Optimizable parameters (device pytree)."""

    poses: jnp.ndarray      # (N,7) [p, q_xyzw]
    mixes: jnp.ndarray      # (N,9) [v, bg, ba]
    ext: jnp.ndarray        # (7,)  camera-IMU extrinsic
    td: jnp.ndarray         # ()    time delay
    invdepths: jnp.ndarray  # (L,)

    @staticmethod
    def zeros(cfg: WindowConfig):
        poses = jnp.zeros((cfg.N, 7)).at[:, 6].set(1.0)
        return WindowParams(
            poses=poses,
            mixes=jnp.zeros((cfg.N, cfg.mix_dim)),
            ext=jnp.zeros(7).at[6].set(1.0),
            td=jnp.zeros(()),
            invdepths=jnp.full((cfg.L,), 0.1),
        )

    def boxplus(self, cfg: WindowConfig, dx):
        """Retract a local step dx (D,) onto the parameters."""
        dnodes = dx[: cfg.ext_off].reshape(cfg.N, cfg.node_dim)
        poses = jax.vmap(quat.boxplus_pose)(self.poses, dnodes[:, :POSE_LOCAL])
        mixes = self.mixes + dnodes[:, POSE_LOCAL:]
        ext = quat.boxplus_pose(self.ext, dx[cfg.ext_off : cfg.ext_off + POSE_LOCAL])
        td = self.td + dx[cfg.td_off]
        inv = self.invdepths + dx[cfg.lm_off :]
        return WindowParams(poses, mixes, ext, td, inv)

    def boxminus(self, cfg: WindowConfig, other):
        """Local difference self ⊟ other → (D,) (for the marg prior)."""
        dposes = jax.vmap(quat.boxminus_pose)(self.poses, other.poses)
        dmix = self.mixes - other.mixes
        dnodes = jnp.concatenate([dposes, dmix], axis=-1).reshape(-1)
        dext = quat.boxminus_pose(self.ext, other.ext)
        dtd = (self.td - other.td)[None]
        dlm = self.invdepths - other.invdepths
        return jnp.concatenate([dnodes, dext, dtd, dlm])


class GnssTable(NamedTuple):
    idx: jnp.ndarray     # (G,) int32 node index
    blh: jnp.ndarray     # (G,3) local-frame position observation
    std: jnp.ndarray     # (G,3)
    valid: jnp.ndarray   # (G,) 0/1
    robust: jnp.ndarray  # () 0/1 — Huber on/off (pass 1 vs pass 2)

    @staticmethod
    def empty(cfg):
        return GnssTable(
            idx=jnp.zeros(cfg.G, jnp.int32),
            blh=jnp.zeros((cfg.G, 3)),
            std=jnp.ones((cfg.G, 3)),
            valid=jnp.zeros(cfg.G),
            robust=jnp.ones(()),
        )


class PreintTable(NamedTuple):
    summ: PreintSummary   # batched (P, ...); PreintOdoSummary when cfg.with_odo
    idx0: jnp.ndarray     # (P,) int32 — factor connects idx0, idx0+1
    valid: jnp.ndarray    # (P,)

    @staticmethod
    def empty(cfg):
        z3 = jnp.zeros((cfg.P, 3))
        z33 = jnp.zeros((cfg.P, 3, 3))
        qid = jnp.tile(jnp.array([0.0, 0, 0, 1.0]), (cfg.P, 1))
        nres = cfg.preint_res
        common = dict(
            dt=jnp.ones(cfg.P), dp=z3, dv=z3, dq=qid,
            bg0=z3, ba0=z3,
            dp_dbg=z33, dp_dba=z33, dv_dbg=z33, dv_dba=z33, dq_dbg=z33,
            sqrt_info=jnp.tile(jnp.eye(nres), (cfg.P, 1, 1)),
            cov=jnp.tile(jnp.eye(nres), (cfg.P, 1, 1)),
            gravity=z3, iewn=z3, sum_dtpn=z3,
            end_p=z3, end_q=qid, end_v=z3, end_time=jnp.zeros(cfg.P),
        )
        if cfg.with_odo:
            from ..ins.preintegration_odo import PreintOdoSummary

            summ = PreintOdoSummary(
                ds=z3, sodo0=jnp.zeros(cfg.P), ds_dbg=z33,
                ds_dsodo=z3, **common)
        else:
            summ = PreintSummary(**common)
        return PreintTable(summ=summ, idx0=jnp.zeros(cfg.P, jnp.int32), valid=jnp.zeros(cfg.P))


class ReprojTable(NamedTuple):
    ref_idx: jnp.ndarray   # (R,) node of the landmark's reference keyframe
    obs_idx: jnp.ndarray   # (R,) node of the observing keyframe
    lm_idx: jnp.ndarray    # (R,) landmark slot
    pts0: jnp.ndarray      # (R,3) normalized-plane point in ref frame
    pts1: jnp.ndarray      # (R,3) in obs frame
    vel0: jnp.ndarray      # (R,3) pixel velocity (normalized plane)
    vel1: jnp.ndarray      # (R,3)
    td0: jnp.ndarray       # (R,)
    td1: jnp.ndarray       # (R,)
    valid: jnp.ndarray     # (R,)
    sqrt_info: jnp.ndarray # () scalar 1/std in normalized plane
    robust: jnp.ndarray    # () 0/1

    @staticmethod
    def empty(cfg):
        z3 = jnp.zeros((cfg.R, 3))
        pts = z3.at[:, 2].set(1.0)
        return ReprojTable(
            ref_idx=jnp.zeros(cfg.R, jnp.int32),
            obs_idx=jnp.ones(cfg.R, jnp.int32),
            lm_idx=jnp.zeros(cfg.R, jnp.int32),
            pts0=pts, pts1=pts, vel0=z3, vel1=z3,
            td0=jnp.zeros(cfg.R), td1=jnp.zeros(cfg.R),
            valid=jnp.zeros(cfg.R),
            sqrt_info=jnp.ones(()),
            robust=jnp.ones(()),
        )


class PriorTable(NamedTuple):
    """Initialization priors on node 0 (constructPrior, ic_gvins.cc:1911-1936)
    + the bias-bounding ImuErrorFactor on the newest mix block."""

    pose_prior: jnp.ndarray      # (7,)
    pose_prior_std: jnp.ndarray  # (6,)
    mix_prior: jnp.ndarray       # (9,)
    mix_prior_std: jnp.ndarray   # (9,)
    valid: jnp.ndarray           # () 0/1
    imuerr_idx: jnp.ndarray      # () int32 node of the newest mix
    imuerr_valid: jnp.ndarray    # () 0/1 (off inside marginalization)

    @staticmethod
    def empty(cfg):
        return PriorTable(
            pose_prior=jnp.zeros(7).at[6].set(1.0),
            pose_prior_std=jnp.ones(6),
            mix_prior=jnp.zeros(cfg.mix_dim),
            mix_prior_std=jnp.ones(cfg.mix_dim),
            valid=jnp.zeros(()),
            imuerr_idx=jnp.zeros((), jnp.int32),
            imuerr_valid=jnp.ones(()),
        )


class MargPrior(NamedTuple):
    """Marginalization prior in INFORMATION form.

    Equivalent to the reference's linearized sqrt factor e = e0 + J0·dx
    (marginalization_factor.h:47-101) with dx = (x ⊟ x0)[:NP], but stored as
    the Gram quantities every consumer actually needs:

        cost     = ½·(c0 + 2 dxᵀ·Jte0 + dxᵀ·H0·dx)     (≡ ½|e0 + J0 dx|²)
        gradient = Jte0 + H0·dx                          (≡ J0ᵀe)
        Hessian  = H0                                    (≡ J0ᵀJ0)

    so the sqrt factorization (an f64 Cholesky XLA:TPU serializes into a
    measured ~16 ms at NP=307) is never performed — see
    factors/marginalization.py.

    Stored on its TRUE (NP = lm_off) support — node/ext/td columns only.
    Marginalization removes every landmark its collected factors touch
    (marginalization.select_marg_factors, matching ic_gvins.cc:1569-1610,
    and priors chain inductively), so landmark columns are identically zero
    and are never materialized; the former full-(D,D) storage made every
    prior product a D³=819³ software-f64 matmul doing 19x the useful work.
    Rows/columns of non-landmark parameters absent from the prior are zero
    (equivalent to the reference keeping only 'remained' blocks)."""

    H0: jnp.ndarray        # (NP,NP) prior information (J0ᵀJ0)
    Jte0: jnp.ndarray      # (NP,)   prior gradient at x0 (J0ᵀe0)
    c0: jnp.ndarray        # ()      prior constant |e0|² = bpᵀHp⁺bp
    x0: WindowParams       # linearization point
    valid: jnp.ndarray     # ()

    @staticmethod
    def empty(cfg):
        NP = cfg.lm_off
        return MargPrior(
            H0=jnp.zeros((NP, NP)),
            Jte0=jnp.zeros(NP),
            c0=jnp.zeros(()),
            x0=WindowParams.zeros(cfg),
            valid=jnp.zeros(()),
        )


class FactorTables(NamedTuple):
    gnss: GnssTable
    preint: PreintTable
    reproj: ReprojTable
    prior: PriorTable
    marg: MargPrior
    antlever: jnp.ndarray    # (3,)
    node_valid: jnp.ndarray  # (N,)
    lm_valid: jnp.ndarray    # (L,)
    ext_active: jnp.ndarray  # () 0/1 — estimate extrinsic
    td_active: jnp.ndarray   # () 0/1 — estimate time delay

    @staticmethod
    def empty(cfg):
        return FactorTables(
            gnss=GnssTable.empty(cfg),
            preint=PreintTable.empty(cfg),
            reproj=ReprojTable.empty(cfg),
            prior=PriorTable.empty(cfg),
            marg=MargPrior.empty(cfg),
            antlever=jnp.zeros(3),
            node_valid=jnp.zeros(cfg.N),
            lm_valid=jnp.zeros(cfg.L),
            ext_active=jnp.zeros(()),
            td_active=jnp.zeros(()),
        )


# ---------------------------------------------------------------------------
# residual / chi2 evaluation
# ---------------------------------------------------------------------------


def _gnss_residuals(params, t: GnssTable, antlever):
    poses = params.poses[t.idx]
    r = jax.vmap(basic.gnss_residual, in_axes=(0, 0, 0, None))(poses, t.blh, t.std, antlever)
    return r  # (G,3) whitened, uncorrected


def _preint_fns(cfg: WindowConfig):
    """Variant dispatch, the reference's Preintegration factory
    (preintegration/preintegration.h:32-119): NORMAL/EARTH use the 15-res
    factor, ODO/EARTH_ODO the 19-res odometer factor."""
    if cfg.with_odo:
        from ..factors import preint_odo_factor as pf
    else:
        pf = preint_factor
    return pf.residual, pf.jacobians


def _preint_residuals(params, t: PreintTable, cfg: WindowConfig):
    pose0 = params.poses[t.idx0]
    mix0 = params.mixes[t.idx0]
    pose1 = params.poses[t.idx0 + 1]
    mix1 = params.mixes[t.idx0 + 1]
    res_fn, _ = _preint_fns(cfg)
    fn = lambda s, a, b, c, d: res_fn(s, a, b, c, d, with_earth=cfg.with_earth)
    return jax.vmap(fn)(t.summ, pose0, mix0, pose1, mix1)  # (P, preint_res)


def _imu_error_fns(cfg: WindowConfig):
    """6-res bias prior, or 7-res with the sodo leg
    (imu_error_factor.h:45-92)."""
    if cfg.with_odo:
        return basic.imu_error_residual_odo, basic.imu_error_jacobian_odo
    return basic.imu_error_residual, basic.imu_error_jacobian


def _reproj_inputs32(params, t: ReprojTable, dtype=jnp.float32):
    """Translation-re-centered f32 inputs for the reprojection factor.

    The factor is invariant to a common translation of both poses, so the
    meter-scale baseline p0 - p1 is formed in f64 FIRST (at urban38 scale
    positions reach ~1e4 m and a direct f32 subtraction would eat the mm
    digits), then everything runs in f32: whitened reprojection residuals
    are O(1 px) with pixel-level noise, f32 keeps them to ~1e-6 px, and f64
    vector math is software-emulated on the TPU VPU — the factor table is
    the largest per-iteration evaluation in the backend.

    ``dtype=jnp.float64`` keeps the whole evaluation in f64 — used by the
    marginalization path, where the assembled H becomes the prior itself and
    f32 noise would exceed the relative ridge (see marginalize())."""
    f32 = dtype
    pose0 = params.poses[t.ref_idx]
    pose1 = params.poses[t.obs_idx]
    dp = (pose0[:, :3] - pose1[:, :3]).astype(f32)
    pose0_32 = jnp.concatenate([dp, pose0[:, 3:7].astype(f32)], axis=1)
    pose1_32 = jnp.concatenate([jnp.zeros_like(dp), pose1[:, 3:7].astype(f32)], axis=1)
    inv = params.invdepths[t.lm_idx].astype(f32)
    ext = params.ext.astype(f32)
    td = params.td.astype(f32)
    obs = tuple(x.astype(f32) for x in (t.pts0, t.pts1, t.vel0, t.vel1, t.td0, t.td1))
    return pose0_32, pose1_32, inv, ext, td, obs, jnp.asarray(t.sqrt_info, f32)


def _reproj_residuals(params, t: ReprojTable, dtype=jnp.float32):
    pose0, pose1, inv, ext, td, obs, sqi = _reproj_inputs32(params, t, dtype)
    fn = lambda p0, p1, iv, a, b, c, d, e, f: reprojection.residual(
        p0, p1, ext, iv, td, a, b, c, d, e, f, sqi
    )
    return jax.vmap(fn)(pose0, pose1, inv, *obs)  # (R,2) in ``dtype``


def _reproj_blocks(params, t: ReprojTable, ext_active, td_active,
                   dtype=jnp.float32):
    """Robust-corrected (r (R,2), Jcat (R,2,20)) for the reprojection
    table; column order [pose_ref 6, pose_obs 6, ext 6, invdepth 1, td 1]."""
    pose0, pose1, inv, ext, td, obs, sqi = _reproj_inputs32(params, t, dtype)
    rr = jax.vmap(
        lambda p0, p1, iv, a, b, c, d, e, f: reprojection.residual(
            p0, p1, ext, iv, td, a, b, c, d, e, f, sqi)
    )(pose0, pose1, inv, *obs)
    J0r, J1r, Jer, Jidr, Jtdr = jax.vmap(
        lambda p0, p1, iv, a, b, c, d, e, f: reprojection.jacobians(
            p0, p1, ext, iv, td, a, b, c, d, e, f, sqi)
    )(pose0, pose1, inv, *obs)
    # column gating for fixed extrinsic/td
    Jer = Jer * ext_active.astype(dtype)
    Jtdr = Jtdr * td_active.astype(dtype)
    Jcat = jnp.concatenate([J0r, J1r, Jer, Jidr, Jtdr], axis=-1)  # (R,2,20)
    return correct_blocks(rr, Jcat, t.robust > 0)


def chi2_blocks(params, tables: FactorTables, cfg: WindowConfig):
    """Per-factor chi2 (squared whitened residual norm) for outlier logic
    (gnssOutlierCullingByChi2 / removeReprojectionFactorsByChi2,
    ic_gvins.cc:1241-1297)."""
    rg = _gnss_residuals(params, tables.gnss, tables.antlever)
    rr = _reproj_residuals(params, tables.reproj)
    return jnp.sum(rg * rg, axis=-1), jnp.sum(rr * rr, axis=-1)


def total_cost(params, tables: FactorTables, cfg: WindowConfig,
               reproj_f64: bool = False):
    """Robustified total cost 0.5 * sum rho(|r|^2) over valid factors.

    ``reproj_f64``: evaluate the reprojection residuals in f64 instead of
    the production f32 (used by the solver-oracle test to compare optima at
    machine precision; see _reproj_inputs32 for why f32 is the default)."""
    rg = _gnss_residuals(params, tables.gnss, tables.antlever)
    sg = jnp.sum(rg * rg, axis=-1)
    rho_g, _, _ = huber_rho(sg)
    rho_g = jnp.where(tables.gnss.robust > 0, rho_g, sg)
    cost = 0.5 * jnp.sum(rho_g * tables.gnss.valid)

    rp = _preint_residuals(params, tables.preint, cfg)
    cost += 0.5 * jnp.sum(jnp.sum(rp * rp, axis=-1) * tables.preint.valid)

    rr = _reproj_residuals(params, tables.reproj,
                           jnp.float64 if reproj_f64 else jnp.float32)
    sr = jnp.sum(rr * rr, axis=-1)
    rho_r, _, _ = huber_rho(sr)
    rho_r = jnp.where(tables.reproj.robust > 0, rho_r, sr)
    cost += 0.5 * jnp.sum(rho_r * tables.reproj.valid)

    # imu error factor on newest mix
    imuerr_res, _ = _imu_error_fns(cfg)
    re = imuerr_res(params.mixes[tables.prior.imuerr_idx])
    cost += 0.5 * tables.prior.imuerr_valid * jnp.sum(re * re)

    # init priors
    rpp = basic.pose_prior_residual(params.poses[0], tables.prior.pose_prior, tables.prior.pose_prior_std)
    rmp = basic.mix_prior_residual(params.mixes[0], tables.prior.mix_prior, tables.prior.mix_prior_std)
    cost += 0.5 * tables.prior.valid * (jnp.sum(rpp * rpp) + jnp.sum(rmp * rmp))

    # marginalization prior (landmark-free: NP support only), in
    # information form: ½|e0 + J0 dx|² = ½(c0 + 2 dxᵀJte0 + dxᵀH0dx). The
    # clamp guards the ~1e-6-relative approximation in c0 (a solve, see
    # marginalization._schur_reduce) from dipping the quadratic negative.
    dx = params.boxminus(cfg, tables.marg.x0)[: cfg.lm_off]
    quad = tables.marg.c0 + 2.0 * jnp.dot(dx, tables.marg.Jte0) + jnp.dot(
        dx, tables.marg.H0 @ dx)
    cost += 0.5 * tables.marg.valid * jnp.maximum(quad, 0.0)
    return cost


# ---------------------------------------------------------------------------
# normal-equation assembly
# ---------------------------------------------------------------------------


def _so3_jr_inv(rv):
    """Inverse right Jacobian of the SO(3) exponential at rotation vector rv:
    d/dδ log(exp(rv)·exp(δ)) |_{δ=0} = Jr(rv)^{-1}
                              = I + ½[rv]× + c·[rv]×²,
    c = 1/θ² − (1+cosθ)/(2θ·sinθ), Taylor 1/12 + θ²/720 for small θ."""
    th2 = jnp.sum(rv * rv, axis=-1)
    th = jnp.sqrt(jnp.maximum(th2, 1e-300))
    K = quat.skew(rv)
    small = th2 < 1e-8
    th2s = jnp.where(small, 1.0, th2)  # avoid 0/0 in the dead branch
    c = jnp.where(
        small,
        1.0 / 12.0 + th2 / 720.0,
        1.0 / th2s - (1.0 + jnp.cos(th)) / jnp.maximum(2.0 * th * jnp.sin(th), 1e-300),
    )
    return jnp.eye(3) + 0.5 * K + c[..., None, None] * (K @ K)


def _marg_rot_correction(dx0, cfg: WindowConfig):
    """Tangent-map correction for the marginalization prior.

    The prior cost is 0.5‖e0 + J0·(x ⊟ x0)‖²; its exact derivative wrt the
    local step δ chains through D = ∂(boxminus)/∂δ, which is identity except
    a 3×3 Jr⁻¹(δθ) block on every rotation tangent (nodes + extrinsic).
    Dropping D (as the reference's MarginalizationFactor does,
    marginalization_factor.h:47-101) makes the assembled gradient disagree
    with the true cost by O(|J0ᵀr|·|δθ|) — with preintegration-scale sqrt
    info in J0 that error exceeds the true gradient near convergence and
    stalls LM at a non-optimum.  Returns (rc (N+1,3) int32 rotation column
    indices, C (N+1,3,3) Jr⁻¹ blocks)."""
    node_rc = (jnp.arange(cfg.N, dtype=jnp.int32) * cfg.node_dim)[:, None] + jnp.asarray(
        [3, 4, 5], jnp.int32)[None, :]
    ext_rc = cfg.ext_off + jnp.asarray([[3, 4, 5]], jnp.int32)
    rc = jnp.concatenate([node_rc, ext_rc], axis=0)  # (N+1, 3)
    C = _so3_jr_inv(dx0[rc])                         # (N+1, 3, 3)
    return rc, C


def _dx_cols(M, rc, C):
    """M @ D — rescale rotation columns: M[:, rc[k]] ← M[:, rc[k]] @ C[k]."""
    new = jnp.einsum("dni,nij->dnj", M[:, rc], C)
    return M.at[:, rc].set(new)


def _dxT_rows(M, rc, C):
    """Dᵀ @ M — rescale rotation rows: M[rc[k], :] ← C[k]ᵀ @ M[rc[k], :]."""
    new = jnp.einsum("nij,nid->njd", C, M[rc, :])
    return M.at[rc, :].set(new)


def _dxT_vec(v, rc, C):
    """Dᵀ @ v on a (D,) vector."""
    new = jnp.einsum("nij,ni->nj", C, v[rc])
    return v.at[rc].set(new)


def _jtj(Ja, Jb, w=None):
    """sum_c Ja[:,c,:] x Jb[:,c,:] -> (B, i, j), optionally weighted.

    Broadcast form on purpose: the einsum 'bci,bcj->bij' lowers as B tiny
    batched matmuls that XLA:TPU pads onto (128,128) MXU tiles — orders of
    magnitude slower than this fused VPU multiply-reduce."""
    P = jnp.sum(Ja[:, :, :, None] * Jb[:, :, None, :], axis=1)
    return P if w is None else P * w[:, None, None]


def _jtr(J, r, w=None):
    """sum_c J[:,c,:] * r[:,c] -> (B, i), optionally weighted (see _jtj)."""
    P = jnp.sum(J * r[..., None], axis=1)
    return P if w is None else P * w[:, None]


def build_normal_equations(params, tables: FactorTables, cfg: WindowConfig):
    """Assemble H (D,D), b (D,) = -J^T r with robust correction and masks.

    Batched per-type evaluation + scatter-add; one XLA program, MXU-friendly
    einsum contractions for the outer products."""
    D = cfg.D
    H = jnp.zeros((D, D))
    b = jnp.zeros(D)

    # ---- GNSS (3 res, 6 cols) ----
    t = tables.gnss
    poses = params.poses[t.idx]
    rg = jax.vmap(basic.gnss_residual, in_axes=(0, 0, 0, None))(poses, t.blh, t.std, tables.antlever)
    Jg = jax.vmap(basic.gnss_jacobian, in_axes=(0, 0, None))(poses, t.std, tables.antlever)
    rg, Jg = correct_blocks(rg, Jg, t.robust > 0)
    w = t.valid
    cols = (t.idx * cfg.node_dim)[:, None] + jnp.arange(POSE_LOCAL, dtype=jnp.int32)[None, :]  # (G,6)
    JtJ = _jtj(Jg, Jg, w)
    Jtr = _jtr(Jg, rg, w)
    H = H.at[cols[:, :, None], cols[:, None, :]].add(JtJ)
    b = b.at[cols].add(-Jtr)

    # ---- preintegration (15 res, 30 cols over consecutive nodes) ----
    t = tables.preint
    pose0, mix0 = params.poses[t.idx0], params.mixes[t.idx0]
    pose1, mix1 = params.poses[t.idx0 + 1], params.mixes[t.idx0 + 1]
    pre_res, pre_jac = _preint_fns(cfg)
    rp = jax.vmap(lambda s, a, b_, c, d: pre_res(s, a, b_, c, d, with_earth=cfg.with_earth))(
        t.summ, pose0, mix0, pose1, mix1
    )
    Jp0, Jm0, Jp1, Jm1 = jax.vmap(
        lambda s, a, b_, c, d: pre_jac(s, a, b_, c, d, with_earth=cfg.with_earth)
    )(t.summ, pose0, mix0, pose1, mix1)
    Jcat = jnp.concatenate([Jp0, Jm0, Jp1, Jm1], axis=-1)  # (P, res, 2*node_dim)
    w = t.valid
    cols = (t.idx0 * cfg.node_dim)[:, None] + jnp.arange(2 * cfg.node_dim, dtype=jnp.int32)[None, :]
    JtJ = _jtj(Jcat, Jcat, w)
    Jtr = _jtr(Jcat, rp, w)
    H = H.at[cols[:, :, None], cols[:, None, :]].add(JtJ)
    b = b.at[cols].add(-Jtr)

    # ---- reprojection (2 res, 20 cols) — f32 evaluation with f64
    # re-centered baseline (see _reproj_inputs32) ----
    t = tables.reproj
    rr, Jcat = _reproj_blocks(params, t, tables.ext_active, tables.td_active)
    w = t.valid
    cols = jnp.concatenate(
        [
            (t.ref_idx * cfg.node_dim)[:, None] + jnp.arange(POSE_LOCAL, dtype=jnp.int32)[None, :],
            (t.obs_idx * cfg.node_dim)[:, None] + jnp.arange(POSE_LOCAL, dtype=jnp.int32)[None, :],
            jnp.tile(cfg.ext_off + jnp.arange(POSE_LOCAL, dtype=jnp.int32), (cfg.R, 1)),
            (cfg.lm_off + t.lm_idx)[:, None],
            jnp.full((cfg.R, 1), cfg.td_off, dtype=jnp.int32),
        ],
        axis=-1,
    )  # (R,20) — [pose_ref, pose_obs, ext, lm, td], matching Jcat's block order
    JtJ = _jtj(Jcat, Jcat, w)
    Jtr = _jtr(Jcat, rr, w)
    H = H.at[cols[:, :, None], cols[:, None, :]].add(JtJ)
    b = b.at[cols].add(-Jtr)

    # ---- imu error factor (6 res, 9 mix cols of the newest node) ----
    kmix = tables.prior.imuerr_idx
    ev = tables.prior.imuerr_valid
    imuerr_res, imuerr_jac = _imu_error_fns(cfg)
    re = imuerr_res(params.mixes[kmix])
    Je = imuerr_jac()
    cols_e = kmix * cfg.node_dim + POSE_LOCAL + jnp.arange(cfg.mix_dim, dtype=jnp.int32)
    H = H.at[cols_e[:, None], cols_e[None, :]].add(ev * (Je.T @ Je))
    b = b.at[cols_e].add(-ev * (Je.T @ re))

    # ---- init priors on node 0 ----
    pv = tables.prior.valid
    rpp = basic.pose_prior_residual(params.poses[0], tables.prior.pose_prior, tables.prior.pose_prior_std)
    Jpp = basic.pose_prior_jacobian(params.poses[0], tables.prior.pose_prior, tables.prior.pose_prior_std)
    H = H.at[:POSE_LOCAL, :POSE_LOCAL].add(pv * (Jpp.T @ Jpp))
    b = b.at[:POSE_LOCAL].add(-pv * (Jpp.T @ rpp))
    rmp = basic.mix_prior_residual(params.mixes[0], tables.prior.mix_prior, tables.prior.mix_prior_std)
    Jmp = basic.mix_prior_jacobian(tables.prior.mix_prior_std)
    sl = slice(POSE_LOCAL, cfg.node_dim)
    H = H.at[sl, sl].add(pv * (Jmp.T @ Jmp))
    b = b.at[sl].add(-pv * (Jmp.T @ rmp))

    # ---- marginalization prior (exact tangent chaining, see
    # _marg_rot_correction; landmark-free — NP support only) ----
    mv = tables.marg.valid
    NP = cfg.lm_off
    dx0 = params.boxminus(cfg, tables.marg.x0)[:NP]
    rc, C = _marg_rot_correction(dx0, cfg)
    grad_lin = tables.marg.Jte0 + tables.marg.H0 @ dx0
    H = H.at[:NP, :NP].add(mv * _dxT_rows(_dx_cols(tables.marg.H0, rc, C), rc, C))
    b = b.at[:NP].add(-mv * _dxT_vec(grad_lin, rc, C))

    return H, b, column_activity(tables, cfg)


def build_normal_blocks(params, tables: FactorTables, cfg: WindowConfig,
                        reproj_f64: bool = False):
    """Assemble the normal equations in BLOCK form for the LM hot loop:
    returns (Hss (Ds,Ds), Hsl (Ds,L), hll (L,), b (D,), act (D,)).

    ``reproj_f64``: evaluate + contract the reprojection blocks in f64 —
    used by the marginalization path only, where H becomes the prior itself
    and f32 assembly noise (~1e-7 relative) would exceed the 1e-9 relative
    ridge (see marginalization.marginalize). The LM hot loop keeps f32: H
    only preconditions the step and the loop re-evaluates the true f64 cost.

    Same math as ``build_normal_equations`` but sized for the solver's Schur
    structure and assembled WITHOUT any data-dependent scatter: XLA:TPU
    lowers scatter-add to a serialized per-index loop, and the (P,30,30)
    preintegration window scatter plus the (R,6)-row reprojection scatters
    alone cost ~8 ms/iteration at production sizing. Instead
      - preintegration places its four 15x15 blocks on the static node band
        (slot k always couples nodes k,k+1 — engine/estimator.py:188) via
        shifted-eye mask embeds;
      - reprojection/GNSS contributions are segment-summed with one-hot
        matmuls on the MXU (f32 — H only preconditions the LM step; the LM
        loop re-evaluates the true f64 cost for every candidate step, and
        the reprojection factor pipeline is f32 by design);
      - the final Hss/Hsl/b are pure concatenations of the node-block
        tensor, the ext/td tail, and the landmark column.
    The landmark-landmark block is diagonal by construction (each factor
    touches one landmark; the marginalization prior's landmark block is
    diagonal too — marginalized landmarks leave the prior entirely, as in
    the reference where dropped inverse-depths are never 'remained' blocks,
    ic_gvins.cc:1629-1676)."""
    Ds = cfg.lm_off
    N, L, R = cfg.N, cfg.L, cfg.R
    ND = cfg.node_dim
    f32, f64 = jnp.float32, jnp.float64

    Hnodes = jnp.zeros((N, ND, N, ND))   # node-block accumulator
    Hcross = jnp.zeros((N, ND, 7))       # node x [ext(6), td(1)]
    Htail = jnp.zeros((7, 7))
    Hsl_nodes = jnp.zeros((N, ND, L))
    Hsl_tail = jnp.zeros((7, L))
    hll = jnp.zeros(L)
    b_nodes = jnp.zeros((N, ND))
    b_tail = jnp.zeros(7)
    b_lm = jnp.zeros(L)

    eyeN = jnp.eye(N)

    def _band_embed(mask, D):
        """Place per-node (ND,ND) blocks D along the band selected by mask
        ((N,N) shifted eye) -> (N,ND,N,ND). Broadcast multiply + transpose:
        an einsum here lowers to an emulated-f64 dot_general (~0.3 ms each at
        production sizing); the mask product is a 90k-element VPU op."""
        k = D.shape[-1]
        if k != ND:
            D = jnp.pad(D, ((0, 0), (0, ND - k), (0, ND - k)))
        return (mask[:, :, None, None] * D[:, None, :, :]).transpose(0, 2, 1, 3)

    def _diag_embed(D):
        return _band_embed(eyeN, D)

    # ---- GNSS (3 res, 6 pose cols) — one-hot over nodes ----
    t = tables.gnss
    poses = params.poses[t.idx]
    rg = jax.vmap(basic.gnss_residual, in_axes=(0, 0, 0, None))(poses, t.blh, t.std, tables.antlever)
    Jg = jax.vmap(basic.gnss_jacobian, in_axes=(0, 0, None))(poses, t.std, tables.antlever)
    rg, Jg = correct_blocks(rg, Jg, t.robust > 0)
    w = t.valid
    oh_g = (t.idx[:, None] == jnp.arange(N)).astype(jnp.float64)  # (G,N) tiny
    Hnodes = Hnodes + _diag_embed(
        jnp.einsum("gn,gij->nij", oh_g, _jtj(Jg, Jg, w)))
    b_nodes = b_nodes - jnp.pad(oh_g.T @ _jtr(Jg, rg, w), ((0, 0), (0, ND - POSE_LOCAL)))

    # ---- preintegration (15 res, 30 cols) — static node band ----
    t = tables.preint
    pose0, mix0 = params.poses[t.idx0], params.mixes[t.idx0]
    pose1, mix1 = params.poses[t.idx0 + 1], params.mixes[t.idx0 + 1]
    pre_res, pre_jac = _preint_fns(cfg)
    rp = jax.vmap(lambda s, a, b_, c, d: pre_res(s, a, b_, c, d, with_earth=cfg.with_earth))(
        t.summ, pose0, mix0, pose1, mix1
    )
    Jp0, Jm0, Jp1, Jm1 = jax.vmap(
        lambda s, a, b_, c, d: pre_jac(s, a, b_, c, d, with_earth=cfg.with_earth)
    )(t.summ, pose0, mix0, pose1, mix1)
    Jcat = jnp.concatenate([Jp0, Jm0, Jp1, Jm1], axis=-1)
    w = t.valid
    JtJ = _jtj(Jcat, Jcat, w)  # (P,30,30)
    z1 = jnp.zeros((1, ND, ND))
    Hnodes = Hnodes + _diag_embed(
        jnp.concatenate([JtJ[:, :ND, :ND], z1]) + jnp.concatenate([z1, JtJ[:, ND:, ND:]]))
    W01 = jnp.concatenate([JtJ[:, :ND, ND:], z1])           # row k -> block (k,k+1)
    W10 = jnp.concatenate([z1, JtJ[:, ND:, :ND]])           # row k -> block (k,k-1)
    Hnodes = Hnodes + _band_embed(jnp.eye(N, k=1), W01)
    Hnodes = Hnodes + _band_embed(jnp.eye(N, k=-1), W10)
    Jtr = _jtr(Jcat, rp, w)  # (P,30)
    z1r = jnp.zeros((1, ND))
    b_nodes = b_nodes - (
        jnp.concatenate([Jtr[:, :ND], z1r]) + jnp.concatenate([z1r, Jtr[:, ND:]]))

    # ---- reprojection (2 res, 20 cols) — f32 evaluation (see
    # _reproj_inputs32; f64 on the marg path) + one-hot MXU contractions ----
    ft = f64 if reproj_f64 else f32
    t = tables.reproj
    rr, Jcat = _reproj_blocks(params, t, tables.ext_active, tables.td_active,
                              dtype=ft)
    w = t.valid  # binary mask
    w32 = w.astype(ft)

    JA = Jcat[:, :, 0:6] * w32[:, None, None]          # ref pose (weighted side)
    JB = Jcat[:, :, 6:12]                              # obs pose
    JC = jnp.concatenate([Jcat[:, :, 12:18], Jcat[:, :, 19:20]], axis=2)  # ext+td (7)
    JL = Jcat[:, :, 18]                                # (R,2) landmark invdepth
    JBw = JB * w32[:, None, None]
    JCw = JC * w32[:, None, None]

    oh_ref = (t.ref_idx[:, None] == jnp.arange(N)).astype(ft)   # (R,N)
    oh_obs = (t.obs_idx[:, None] == jnp.arange(N)).astype(ft)
    oh_pair = ((t.ref_idx * N + t.obs_idx)[:, None] == jnp.arange(N * N)).astype(ft)
    oh_lm = (t.lm_idx[:, None] == jnp.arange(L)).astype(ft)     # (R,L)

    P_AA = _jtj(JA, Jcat[:, :, 0:6]).reshape(R, 36).astype(ft)
    P_BB = _jtj(JBw, JB).reshape(R, 36).astype(ft)
    P_AB = _jtj(JA, JB).reshape(R, 36).astype(ft)
    P_AC = _jtj(JA, JC).reshape(R, 42).astype(ft)
    P_BC = _jtj(JBw, JC).reshape(R, 42).astype(ft)
    CC = jnp.sum(JCw[:, :, :, None] * JC[:, :, None, :], axis=(0, 1)).astype(f64)

    AA = (oh_ref.T @ P_AA).reshape(N, 6, 6).astype(f64)
    BB = (oh_obs.T @ P_BB).reshape(N, 6, 6).astype(f64)
    AB = (oh_pair.T @ P_AB).reshape(N, N, 6, 6).astype(f64)
    AC = (oh_ref.T @ P_AC).reshape(N, 6, 7).astype(f64)
    BC = (oh_obs.T @ P_BC).reshape(N, 6, 7).astype(f64)

    Hnodes = Hnodes + _diag_embed(AA + BB)
    ABs = AB + AB.transpose(1, 0, 3, 2)
    Hnodes = Hnodes + jnp.pad(ABs, ((0, 0), (0, 0), (0, ND - 6), (0, ND - 6))).transpose(0, 2, 1, 3)
    Hcross = Hcross + jnp.pad(AC + BC, ((0, 0), (0, ND - 6), (0, 0)))
    Htail = Htail + CC

    # landmark cross + diagonal: (node, lm) placement as two f32 matmuls
    P_AL = _jtr(JA, JL)            # (R,6)
    P_BL = _jtr(JBw, JL)
    P_CL = _jtr(JCw, JL)           # (R,7)
    M_ref = (oh_ref[:, :, None] * P_AL[:, None, :]).reshape(R, N * 6)
    M_obs = (oh_obs[:, :, None] * P_BL[:, None, :]).reshape(R, N * 6)
    Hsl_pose = ((M_ref + M_obs).T @ oh_lm).reshape(N, 6, L).astype(f64)
    Hsl_nodes = Hsl_nodes + jnp.pad(Hsl_pose, ((0, 0), (0, ND - 6), (0, 0)))
    Hsl_tail = Hsl_tail + (oh_lm.T @ P_CL).T.astype(f64)
    hll = hll + (oh_lm.T @ (jnp.sum(JL * JL, axis=1) * w32)).astype(f64)

    # gradient (w already folded into rw; w is binary)
    rw = rr * w32[:, None]
    gA = _jtr(Jcat[:, :, 0:6], rw)
    gB = _jtr(JB, rw)
    gC = _jtr(JC, rw)
    gL = jnp.sum(JL * rw, axis=1)
    b_nodes = b_nodes - jnp.pad(
        (oh_ref.T @ gA + oh_obs.T @ gB).astype(f64), ((0, 0), (0, ND - 6)))
    b_tail = b_tail - jnp.sum(gC, axis=0).astype(f64)
    b_lm = b_lm - (oh_lm.T @ gL).astype(f64)

    # ---- imu error factor on newest mix ----
    kmix = tables.prior.imuerr_idx
    ev = tables.prior.imuerr_valid
    imuerr_res, imuerr_jac = _imu_error_fns(cfg)
    re = imuerr_res(params.mixes[kmix])
    Je = imuerr_jac()
    oh_e = (jnp.arange(N) == kmix).astype(jnp.float64) * ev
    Ee = jnp.pad(Je.T @ Je, ((POSE_LOCAL, 0), (POSE_LOCAL, 0)))
    Hnodes = Hnodes + _band_embed(jnp.diag(oh_e), jnp.broadcast_to(Ee, (N, ND, ND)))
    b_nodes = b_nodes - oh_e[:, None] * jnp.pad(Je.T @ re, (POSE_LOCAL, 0))[None, :]

    # ---- init priors on node 0 (static slices) ----
    pv = tables.prior.valid
    rpp = basic.pose_prior_residual(params.poses[0], tables.prior.pose_prior, tables.prior.pose_prior_std)
    Jpp = basic.pose_prior_jacobian(params.poses[0], tables.prior.pose_prior, tables.prior.pose_prior_std)
    Hnodes = Hnodes.at[0, :POSE_LOCAL, 0, :POSE_LOCAL].add(pv * (Jpp.T @ Jpp))
    b_nodes = b_nodes.at[0, :POSE_LOCAL].add(-pv * (Jpp.T @ rpp))
    rmp = basic.mix_prior_residual(params.mixes[0], tables.prior.mix_prior, tables.prior.mix_prior_std)
    Jmp = basic.mix_prior_jacobian(tables.prior.mix_prior_std)
    Hnodes = Hnodes.at[0, POSE_LOCAL:, 0, POSE_LOCAL:].add(pv * (Jmp.T @ Jmp))
    b_nodes = b_nodes.at[0, POSE_LOCAL:].add(-pv * (Jmp.T @ rmp))

    # ---- assemble the block form by concatenation ----
    Hn = Hnodes.reshape(N * ND, N * ND)
    Hc = Hcross.reshape(N * ND, 7)
    Hss = jnp.concatenate(
        [jnp.concatenate([Hn, Hc], axis=1),
         jnp.concatenate([Hc.T, Htail], axis=1)], axis=0)
    Hsl = jnp.concatenate([Hsl_nodes.reshape(N * ND, L), Hsl_tail], axis=0)
    b = jnp.concatenate([b_nodes.reshape(-1), b_tail, b_lm])

    # ---- marginalization prior (exact tangent chaining, see
    # _marg_rot_correction; all rotation tangents live in the state block,
    # and the prior is landmark-free — it lands entirely in Hss/b[:Ds]) ----
    mv = tables.marg.valid
    dx0 = params.boxminus(cfg, tables.marg.x0)[:Ds]
    rc, C = _marg_rot_correction(dx0, cfg)
    grad_lin = tables.marg.Jte0 + tables.marg.H0 @ dx0
    Hss = Hss + mv * _dxT_rows(_dx_cols(tables.marg.H0, rc, C), rc, C)
    b = b - mv * jnp.concatenate([_dxT_vec(grad_lin, rc, C), jnp.zeros(L)])

    return Hss, Hsl, hll, b, column_activity(tables, cfg)


def apply_gauge_blocks(Hss, Hsl, hll, b, act, cfg: WindowConfig):
    """Freeze inactive columns on the block form (unit diagonal, zero rows)."""
    acts, actl = act[: cfg.lm_off], act[cfg.lm_off :]
    Hss = Hss * acts[:, None] * acts[None, :] + jnp.diag(1.0 - acts)
    Hsl = Hsl * acts[:, None] * actl[None, :]
    hll = hll * actl + (1.0 - actl)
    return Hss, Hsl, hll, b * act


def block_matvec(Hss, Hsl, hll, x, cfg: WindowConfig):
    """H @ x on the block form."""
    xs, xl = x[: cfg.lm_off], x[cfg.lm_off :]
    return jnp.concatenate([Hss @ xs + Hsl @ xl, Hsl.T @ xs + hll * xl])


def column_activity(tables: FactorTables, cfg: WindowConfig):
    """(D,) 0/1 mask of optimizable columns."""
    node_act = jnp.repeat(tables.node_valid, cfg.node_dim)
    return jnp.concatenate(
        [
            node_act,
            jnp.full(POSE_LOCAL, 1.0) * tables.ext_active,
            tables.td_active[None],
            tables.lm_valid,
        ]
    )


def apply_gauge(H, b, act):
    """Freeze inactive columns: unit diagonal, zero gradient -> dx = 0."""
    H = H * act[:, None] * act[None, :] + jnp.diag(1.0 - act)
    b = b * act
    return H, b
