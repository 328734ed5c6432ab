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


def _eight_point(p0, p1):
    """F from 8 correspondences (already normalized), via SVD."""
    x0, y0 = p0[:, 0], p0[:, 1]
    x1, y1 = p1[:, 0], p1[:, 1]
    A = jnp.stack(
        [x1 * x0, x1 * y0, x1, y1 * x0, y1 * y0, y1, x0, y0, jnp.ones_like(x0)], axis=1
    )
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    F = Vt[-1].reshape(3, 3)
    # enforce rank 2
    U, S, Vt2 = jnp.linalg.svd(F)
    S = S.at[2].set(0.0)
    return U @ jnp.diag(S) @ Vt2


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
    Returns (inlier_mask (N,) bool, best_inlier_count)."""
    N = pts0.shape[0]
    validb = valid > 0

    n0, T0 = _normalize(pts0, valid)
    n1, T1 = _normalize(pts1, valid)

    key = jax.random.PRNGKey(seed)
    # sample hypothesis index sets biased to valid entries: draw from the
    # valid indices with replacement (deterministic given table layout)
    probs = valid / jnp.maximum(jnp.sum(valid), 1.0)
    samples = jax.random.choice(key, N, shape=(num_hyp, 8), p=probs)

    def hyp(idx):
        return _eight_point(n0[idx], n1[idx])

    Fs = jax.vmap(hyp)(samples)

    p0h = jnp.concatenate([n0, jnp.ones((N, 1))], axis=1)
    p1h = jnp.concatenate([n1, jnp.ones((N, 1))], axis=1)
    d = jax.vmap(lambda F: _sampson(F, p0h, p1h))(Fs)  # (num_hyp, N)

    # threshold in normalized coords: scale by the normalization factor
    s = T0[0, 0] * T1[0, 0]
    thr2 = (threshold**2) * s
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
    _, _, Vt = jnp.linalg.svd(A)
    X = Vt[-1]
    return X[:3] / X[3]


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
