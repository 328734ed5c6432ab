"""Tiny-matrix products as broadcast multiply-reduce (VPU), not dot_general.

XLA:TPU lowers every ``@``/einsum to a dot_general; for the factor library's
3x3/15x15 f64 blocks that means software-emulated f64 MXU matmuls with
per-op dispatch overhead that dwarfs the actual FLOPs (measured ~0.7 ms for
the 19-factor preintegration evaluation, dominated by ~a dozen tiny dots).
These helpers expand the product explicitly so it fuses into neighboring
elementwise work on the VPU. Batch dims broadcast like numpy matmul.
"""

import jax.numpy as jnp


def mm(a, b):
    """a (..., m, k) @ b (..., k, n) via broadcast multiply-reduce."""
    return jnp.sum(a[..., :, :, None] * b[..., None, :, :], axis=-2)


def mv(a, x):
    """a (..., m, k) @ x (..., k) via broadcast multiply-reduce."""
    return jnp.sum(a * x[..., None, :], axis=-1)
