"""IC-GVINS-TPU: a TPU-native GNSS-Visual-Inertial navigation framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of IC-GVINS
(i2Nav-WHU): a tightly-coupled, INS-centric GNSS + camera + IMU state
estimator run as a deterministic replay pipeline.

Design principles (TPU-first, not a port):
  - everything fixed-shape: padded arrays + validity masks replace the
    reference's deques/hash maps
  - IMU recurrences (mechanization, preintegration) are ``lax.scan`` kernels,
    ``vmap``-ed over intervals
  - the Ceres sliding-window optimizer is replaced by a fixed-shape
    Levenberg-Marquardt solver with Schur-complement landmark elimination
  - marginalization is structured masked Schur (diagonal landmark
    elimination + small-block eigh) + equilibrated Cholesky
    sqrt-factorization (dense linear algebra on the MXU, no dynamic shapes)
  - the frontend (pyramids, Shi-Tomasi, pyramidal LK, triangulation) is
    batched image kernels in f32; the estimator runs in f64

Reference behavior documented against /root/reference (IC-GVINS, GPLv3);
file:line citations in docstrings point there for parity checking.
"""

import jax

# The estimator needs f64: cm-level accuracy over 10+ km trajectories.
# Image kernels explicitly cast down to f32/bf16.
jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"
