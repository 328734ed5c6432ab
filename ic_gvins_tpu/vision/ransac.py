"""Fundamental-matrix RANSAC + two-view triangulation, fully batched.

Replaces cv::findFundamentalMat(FM_RANSAC, thresh, 0.99) culling
(tracking.cc:547-555) and the per-point SVD DLT triangulation
(tracking.cc:800-811).

TPU-native: a fixed budget of hypotheses is evaluated simultaneously — each
hypothesis solves the normalized 8-point system by SVD under vmap, Sampson
distances for all correspondences x all hypotheses come from one batched
einsum, and the best hypothesis is an argmax. Deterministic: the sampling
uses a counter-based PRNG key derived from a fixed seed.
"""

from functools import partial

import jax
import jax.numpy as jnp


def _normalize(pts, valid):
    n = jnp.maximum(jnp.sum(valid), 1.0)
    mean = jnp.sum(pts * valid[:, None], axis=0) / n
    d = jnp.linalg.norm(pts - mean, axis=1) * valid
    scale = jnp.sqrt(2.0) / jnp.maximum(jnp.sum(d) / n, 1e-9)
    T = jnp.array(
        [[scale, 0.0, -scale * mean[0]], [0.0, scale, -scale * mean[1]], [0.0, 0.0, 1.0]]
    )
    return (pts - mean) * scale, T


def _gauss_jordan_solve(B, n):
    """Reduce the batched augmented system B (..., n, n+1) to
    [I | x] by Gauss-Jordan elimination with partial pivoting (one-hot row
    selection — no gathers/swap scatters). Returns x (..., n).

    Replaces jnp.linalg.svd nullspace extraction: XLA:TPU lowers small
    batched SVDs to serialized one-sided Jacobi loops (~23 ms for 256
    8-point hypotheses per frame); this is n unrolled steps of batched
    elementwise work. Singular pivots produce garbage rows that score
    few inliers and lose the RANSAC argmax (cv behaves the same way for
    degenerate samples)."""
    M = B
    rows = jnp.arange(n)
    for k in range(n):
        col = jnp.abs(M[..., :, k])
        col = jnp.where(rows >= k, col, -1.0)          # pivot among rows k..
        p = jnp.argmax(col, axis=-1)
        oh = (rows == p[..., None]).astype(M.dtype)    # (..., n)
        prow = jnp.sum(M * oh[..., None], axis=-2)     # (..., n+1)
        # virtual swap: row p := row k, then row k := pivot row
        rowk = M[..., k, :]
        M = M - oh[..., None] * (prow - rowk)[..., None, :]
        piv = prow[..., k]
        prow = prow / jnp.where(jnp.abs(piv) > 1e-30, piv, 1.0)[..., None]
        # eliminate the k-th column from every other row
        fac = jnp.where(rows != k, M[..., :, k], 0.0)
        M = M - fac[..., None] * prow[..., None, :]
        M = M.at[..., k, :].set(prow)
    return M[..., :, n]


def _sym3_smallest_eigvec(M):
    """Closed-form unit eigenvector of the smallest eigenvalue of a
    symmetric (..., 3, 3) matrix (trigonometric eigenvalue formula + row
    cross products), elementwise throughout."""
    m00, m11, m22 = M[..., 0, 0], M[..., 1, 1], M[..., 2, 2]
    m01, m02, m12 = M[..., 0, 1], M[..., 0, 2], M[..., 1, 2]
    tiny = jnp.finfo(M.dtype).tiny  # dtype-safe floor (1e-300 flushes to 0 in f32)
    q = (m00 + m11 + m22) / 3.0
    p1 = m01 * m01 + m02 * m02 + m12 * m12
    p2 = (m00 - q) ** 2 + (m11 - q) ** 2 + (m22 - q) ** 2 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, tiny))
    d0, d1, d2 = (m00 - q) / p, (m11 - q) / p, (m22 - q) / p
    b01, b02, b12 = m01 / p, m02 / p, m12 / p
    detB = (
        d0 * (d1 * d2 - b12 * b12)
        - b01 * (b01 * d2 - b12 * b02)
        + b02 * (b01 * b12 - d1 * b02)
    )
    r = jnp.clip(detB / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    lmin = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    C = M - lmin[..., None, None] * jnp.eye(3, dtype=M.dtype)
    c01 = jnp.cross(C[..., 0, :], C[..., 1, :])
    c02 = jnp.cross(C[..., 0, :], C[..., 2, :])
    c12 = jnp.cross(C[..., 1, :], C[..., 2, :])
    cands = jnp.stack([c01, c02, c12], axis=-2)
    norms = jnp.linalg.norm(cands, axis=-1)
    best = jnp.argmax(norms, axis=-1)
    oh = (jnp.arange(3) == best[..., None]).astype(M.dtype)
    v = jnp.sum(cands * oh[..., None], axis=-2)
    nv = jnp.linalg.norm(v, axis=-1, keepdims=True)
    # isotropic fallback (p ~ 0): any direction is an eigenvector
    e0 = jnp.zeros_like(v).at[..., 0].set(1.0)
    return jnp.where(nv > 1e-30, v / jnp.maximum(nv, tiny), e0)


def _eight_point(p0, p1):
    """F from 8 correspondences (already normalized): exact nullspace via
    the f33=1 parameterization (Gauss-Jordan on the 8x8 system — the
    stacked constraints have an exact one-dimensional nullspace, so this
    equals the SVD null vector up to scale except when f33=0, a degenerate
    hypothesis that loses the vote) + closed-form rank-2 projection."""
    x0, y0 = p0[:, 0], p0[:, 1]
    x1, y1 = p1[:, 0], p1[:, 1]
    A = jnp.stack(
        [x1 * x0, x1 * y0, x1, y1 * x0, y1 * y0, y1, x0, y0, jnp.ones_like(x0)], axis=1
    )
    B = jnp.concatenate([A[:, :8], -A[:, 8:]], axis=1)
    f8 = _gauss_jordan_solve(B, 8)
    F = jnp.concatenate([f8, jnp.ones_like(f8[:1])]).reshape(3, 3)
    # rank-2 enforcement: subtract the smallest singular triplet
    # (F v3 = s3 u3, so F - (F v3) v3^T truncates the SVD at rank 2)
    v3 = _sym3_smallest_eigvec(F.T @ F)
    return F - jnp.outer(F @ v3, v3)


def _sampson(F, p0h, p1h):
    """Sampson distance for all correspondences (N,3) x hypothesis F."""
    Fx0 = p0h @ F.T          # (N,3) = F @ x0
    Ftx1 = p1h @ F           # (N,3) = F^T @ x1
    num = jnp.sum(p1h * Fx0, axis=1) ** 2
    den = Fx0[:, 0] ** 2 + Fx0[:, 1] ** 2 + Ftx1[:, 0] ** 2 + Ftx1[:, 1] ** 2
    return num / jnp.maximum(den, 1e-12)


@partial(jax.jit, static_argnames=("num_hyp",))
def fundamental_ransac(pts0, pts1, valid, threshold, num_hyp=256, seed=0):
    """RANSAC F-matrix inlier mask over a padded correspondence table.

    pts0/pts1: (N,2) undistorted pixels; valid: (N,) 0/1;
    threshold: inlier threshold in pixels (reprojection_error_std).
    Returns (inlier_mask (N,) bool, best_inlier_count).

    Everything after Hartley normalization runs in f32: normalized
    coordinates are O(1), the vote only compares Sampson distances against
    a pixel-scale threshold, and the argmax winner needs no more than ~3
    significant digits — while f64 vector math is software-emulated on the
    TPU VPU (the f64 einsum/Gauss-Jordan pipeline was the most expensive
    part of the frontend frame after LK)."""
    N = pts0.shape[0]
    validb = valid > 0

    n0, T0 = _normalize(pts0, valid)
    n1, T1 = _normalize(pts1, valid)
    n0 = n0.astype(jnp.float32)
    n1 = n1.astype(jnp.float32)

    key = jax.random.PRNGKey(seed)
    # sample hypothesis index sets biased to valid entries: draw from the
    # valid indices with replacement (deterministic given table layout)
    probs = valid / jnp.maximum(jnp.sum(valid), 1.0)
    samples = jax.random.choice(key, N, shape=(num_hyp, 8), p=probs)

    def hyp(idx):
        return _eight_point(n0[idx], n1[idx])

    Fs = jax.vmap(hyp)(samples)

    p0h = jnp.concatenate([n0, jnp.ones((N, 1), n0.dtype)], axis=1)
    p1h = jnp.concatenate([n1, jnp.ones((N, 1), n1.dtype)], axis=1)
    d = jax.vmap(lambda F: _sampson(F, p0h, p1h))(Fs)  # (num_hyp, N)

    # threshold in normalized coords: scale by the normalization factor
    s = T0[0, 0] * T1[0, 0]
    thr2 = ((threshold**2) * s).astype(d.dtype)
    inliers = (d < thr2) & validb[None, :]
    counts = jnp.sum(inliers, axis=1)
    best = jnp.argmax(counts)
    return inliers[best] | ~validb, counts[best]


def triangulate(Rcw0, tcw0, Rcw1, tcw1, pc0, pc1):
    """DLT triangulation of one point from two views (tracking.cc:800-811).

    Rcw/tcw: world->camera (Tcw) rotation/translation; pc: normalized plane
    coords (3,) with z=1. Returns pw (3,). vmap over points."""
    P0 = jnp.concatenate([Rcw0, tcw0[:, None]], axis=1)
    P1 = jnp.concatenate([Rcw1, tcw1[:, None]], axis=1)
    A = jnp.stack(
        [
            pc0[0] * P0[2] - P0[0],
            pc0[1] * P0[2] - P0[1],
            pc1[0] * P1[2] - P1[0],
            pc1[1] * P1[2] - P1[1],
        ]
    )
    # least squares with the X4=1 homogeneous gauge: 3x3 normal equations
    # solved in closed form (adjugate/Cramer) — batched SVD is a serialized
    # Jacobi loop on TPU. Points near infinity (X4 ~ 0) come out with huge
    # depths and are culled by the depth gates, as with the SVD path.
    A3 = A[:, :3]
    Nm = A3.T @ A3
    b = -(A3.T @ A[:, 3])
    c0 = jnp.cross(Nm[:, 1], Nm[:, 2])
    det = jnp.dot(Nm[:, 0], c0)
    adjT = jnp.stack([c0, jnp.cross(Nm[:, 2], Nm[:, 0]), jnp.cross(Nm[:, 0], Nm[:, 1])], axis=1)
    X3 = adjT @ b / jnp.where(jnp.abs(det) > 1e-300, det, 1.0)
    return X3


def triangulate_batch(pose0_R, pose0_t, pose1_R, pose1_t, pc0, pc1):
    """Batched triangulation; poses are camera->world (frame poses); converts
    to Tcw internally. All args lead with the point axis except pose1
    (shared current frame) which may be unbatched."""
    Rcw0 = jnp.swapaxes(pose0_R, -1, -2)
    tcw0 = -jnp.einsum("...ij,...j->...i", Rcw0, pose0_t)
    Rcw1 = jnp.swapaxes(pose1_R, -1, -2)
    tcw1 = -jnp.einsum("...ij,...j->...i", Rcw1, pose1_t)
    if Rcw1.ndim == 2:
        fn = lambda R0, t0, p0, p1: triangulate(R0, t0, Rcw1, tcw1, p0, p1)
        return jax.vmap(fn)(Rcw0, tcw0, pc0, pc1)
    return jax.vmap(triangulate)(Rcw0, tcw0, Rcw1, tcw1, pc0, pc1)
