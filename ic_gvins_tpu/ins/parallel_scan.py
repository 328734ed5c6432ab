"""Log-depth prefix-scan primitives for INS recurrences.

The reference integrates IMU windows sample-by-sample in C++ loops
(misc.cc:151-261, preintegration_base.cc:39-70). A straight `lax.scan`
translation keeps that serial dependency chain: 256-512 sequential steps,
each a string of small f64 ops (f64 is software-emulated on TPU), which
measured 40-80 ms per window on chip — the single largest cost in the
replay frame budget.

The TPU-native formulation exploits that every INS recurrence is an
associative composition:

  attitude   q_k   = q_{k-1} (X) dq_k                    -> quaternion
             (earth: q_k = qnn_k (X) q_{k-1} (X) dq_k)      prefix products
  velocity   v_k   = A_k v_{k-1} + b_k                   -> affine prefix
             (A_k = I - 2 dt_k [iewn]x coriolis, I else)    (matrix, vector)
  position   p_k   = p_{k-1} + 0.5 dt_k (v_{k-1}+v_k)    -> plain cumsum
  covariance P_k   = Phi_k P_{k-1} Phi_k^T + Q_k         -> (Phi, Q) pair
  bias jac   J_k   = Phi_k J_{k-1}                          composition

so the whole window runs as a handful of `lax.associative_scan` calls:
log2(S) levels of BATCHED (S, ...) einsums instead of S serial steps. All
prefixes come out, so per-sample trajectories (mechanization output) are
free. Padded samples (dt=0) contribute exact identities.

Results match the sequential scan up to floating-point reassociation
(~1e-13 relative in f64); regression tests assert parallel == sequential
on random windows (tests/test_mechanization.py, test_preintegration.py).
"""

import jax
import jax.numpy as jnp

from ..core import quaternion as quat


def quat_prefix(dqs):
    """Prefix products P_k = dq_0 (X) ... (X) dq_k of (S,4) quaternions
    (right-accumulating, matching q_new = mul(q, dq))."""
    return jax.lax.associative_scan(quat.mul, dqs)


def quat_sandwich_prefix(lqs, rqs):
    """Prefix composition of maps T_k(x) = l_k (X) x (X) r_k.

    (T_b o T_a)(x) = (l_b l_a) x (r_a r_b); returns (L_k, R_k) with
    q_k = L_k (X) q_0 (X) R_k. Used by the earth-rotation attitude update
    q_k = qnn_k (X) q_{k-1} (X) dq_k (misc.cc:186-189)."""

    def combine(a, b):
        la, ra = a
        lb, rb = b
        return quat.mul(lb, la), quat.mul(ra, rb)

    return jax.lax.associative_scan(combine, (lqs, rqs))


def affine_prefix(A, b):
    """Prefix composition of x -> A_k x + b_k over (S,3,3)/(S,3).

    Returns (P_k, c_k) with v_k = P_k v_0 + c_k."""

    def combine(first, second):
        A1, b1 = first
        A2, b2 = second
        return (
            jnp.einsum("...ij,...jk->...ik", A2, A1),
            jnp.einsum("...ij,...j->...i", A2, b1) + b2,
        )

    return jax.lax.associative_scan(combine, (A, b))


def phi_cov_reduce(phi, qk):
    """Final (J, P) of J_k = Phi_k J_{k-1} (J_0 = I) and
    P_k = Phi_k P_{k-1} Phi_k^T + Q_k (P_0 = 0) over (S,D,D) inputs.

    The pair (Phi, Q) composes associatively:
      (Phi2, Q2) o (Phi1, Q1) = (Phi2 Phi1, Phi2 Q1 Phi2^T + Q2).
    """

    def combine(first, second):
        p1, q1 = first
        p2, q2 = second
        p = jnp.einsum("...ij,...jk->...ik", p2, p1)
        q = (
            jnp.einsum(
                "...ij,...jk,...lk->...il", p2, q1, p2
            )
            + q2
        )
        return p, q

    P, Q = jax.lax.associative_scan(combine, (phi, qk))
    return P[-1], Q[-1]


def shift_prev(arr, first):
    """arr[k-1] with arr[-1] := first — the dual-sample history chain
    (imu_pre in misc.cc:160-168) as a shifted array."""
    return jnp.concatenate([first[None], arr[:-1]], axis=0)


def dual_sample(dth, dvl, dth_pre, dvl_pre):
    """Batched dual-sample coning/sculling compensation
    (misc.cc:160-173, preintegration_base.cc:44-56)."""
    dvfb = (
        dvl
        + 0.5 * jnp.cross(dth, dvl)
        + (jnp.cross(dth_pre, dvl) + jnp.cross(dvl_pre, dth)) / 12.0
    )
    dtheta = dth + jnp.cross(dth_pre, dth) / 12.0
    return dvfb, dtheta
