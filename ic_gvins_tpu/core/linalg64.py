"""f64 dense factorizations built from TPU fast-path primitives.

XLA:TPU lowers f64 ``cholesky`` / ``triangular_solve`` above a small size
threshold (~64-90) to a serialized path measured at 13-33 ms per call on
chip, and f64 ``eigh`` above ~256 takes MINUTES to COMPILE (QDWH expansion:
135 s at D=307, 387 s at D=512 — the root cause of round 2's bench death).
Below the threshold both ops stay on an unrolled fast path (0.005-0.04 ms),
and f64 matmuls are cheap (3-pass f32 split on the MXU).

``chol_inv_blocked`` therefore runs a right-looking blocked Cholesky with
64-wide diagonal blocks: the O(n^3) bulk is f64 matmuls, and only 64x64
factorizations/solves touch the lax.linalg kernels. It returns both L and
L^{-1} (block back-substitution, matmuls again) so callers never need a
large triangular solve either.

Used by factors/marginalization.py; the LM solver keeps its own
mixed-precision f32-Cholesky + f64-refinement route (solver/lm.py) which is
even cheaper when only a SOLVE (not the factor itself) is needed.
"""

import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

BLK = 64


def chol_inv_blocked(A):
    """(L, W) with A = L L^T and W = L^{-1}, both lower-triangular, f64.

    ``A`` must be symmetric positive definite (callers equilibrate + ridge).
    On a non-PD input the 64x64 diagonal factorizations produce NaNs that
    propagate to the output — callers check ``isfinite`` and retry with a
    stronger ridge. n is static; the block loop unrolls at trace time.
    """
    n = A.shape[0]
    nb = max(-(-n // BLK), 1)
    npad = nb * BLK
    T = jnp.zeros((npad, npad), A.dtype).at[:n, :n].set(A)
    if npad > n:
        di = jnp.arange(n, npad)
        T = T.at[di, di].set(1.0)  # pad block stays SPD
    eye = jnp.eye(BLK, dtype=A.dtype)

    Lb = [[None] * nb for _ in range(nb)]
    Wb = [[None] * nb for _ in range(nb)]
    for j in range(nb):
        Ljj = jnp.linalg.cholesky(T[:BLK, :BLK])
        Wb[j][j] = solve_triangular(Ljj, eye, lower=True)
        Lb[j][j] = Ljj
        if j + 1 < nb:
            Lr = T[BLK:, :BLK] @ Wb[j][j].T
            for i in range(j + 1, nb):
                Lb[i][j] = Lr[(i - j - 1) * BLK : (i - j) * BLK]
            T = T[BLK:, BLK:] - Lr @ Lr.T

    # inverse blocks: W_ij = -W_ii (sum_k L_ik W_kj), increasing i
    for i in range(1, nb):
        for j in range(i):
            acc = Lb[i][j] @ Wb[j][j]
            for k in range(j + 1, i):
                acc = acc + Lb[i][k] @ Wb[k][j]
            Wb[i][j] = -(Wb[i][i] @ acc)

    L = jnp.zeros((npad, npad), A.dtype)
    W = jnp.zeros((npad, npad), A.dtype)
    for i in range(nb):
        for j in range(i + 1):
            sl_i = slice(i * BLK, (i + 1) * BLK)
            sl_j = slice(j * BLK, (j + 1) * BLK)
            L = L.at[sl_i, sl_j].set(Lb[i][j])
            W = W.at[sl_i, sl_j].set(Wb[i][j])
    return L[:n, :n], W[:n, :n]
