"""Robust-kernel correction of whitened residual blocks.

Implements the Triggs corrector (the math spelled out in the reference's
marginalization path, factors/residual_block_info.h:59-87, and applied by
Ceres internally during solves): given the robust loss rho evaluated at the
squared norm of a whitened residual block, rescale the residual and jacobians
so that the Gauss-Newton approximation of the robustified cost is exact to
first order.

All functions operate on one factor block and vmap over factor tables.
"""

import jax.numpy as jnp


def huber_rho(s, delta=1.0):
    """Huber loss on squared norm s: rho, rho', rho'' (Ceres HuberLoss)."""
    d2 = delta * delta
    r = jnp.sqrt(jnp.maximum(s, 1e-300))
    out = jnp.where(s > d2, 2.0 * delta * r - d2, s)
    drho = jnp.where(s > d2, delta / r, 1.0)
    ddrho = jnp.where(s > d2, -0.5 * delta / (s * r), 0.0)
    return out, drho, ddrho


def corrector_scales(s, drho, ddrho):
    """(residual_scaling, alpha/s) for the Triggs corrector."""
    sqrt_rho1 = jnp.sqrt(drho)
    trivial = (s == 0.0) | (ddrho <= 0.0)
    D = jnp.maximum(1.0 + 2.0 * s * ddrho / jnp.maximum(drho, 1e-300), 0.0)
    alpha = 1.0 - jnp.sqrt(D)
    residual_scaling = jnp.where(trivial, sqrt_rho1, sqrt_rho1 / (1.0 - alpha))
    alpha_sq_norm = jnp.where(trivial, 0.0, alpha / jnp.maximum(s, 1e-300))
    return residual_scaling, alpha_sq_norm, sqrt_rho1


def correct_blocks(r, J, use_kernel, delta=1.0):
    """Batched Triggs corrector over a factor table: r (B, R), J (B, R, C).

    Pure broadcast arithmetic — the per-block form under vmap emits tiny
    batched matvecs/outers that XLA:TPU pads onto MXU tiles (orders of
    magnitude slower than the VPU broadcast form)."""
    s = jnp.sum(r * r, axis=-1)
    _, drho, ddrho = huber_rho(s, delta)
    scale_r, alpha_sq, sqrt_rho1 = corrector_scales(s, drho, ddrho)
    rJ = jnp.sum(r[..., :, None] * J, axis=-2)                       # (B, C)
    J_corr = sqrt_rho1[:, None, None] * (
        J - alpha_sq[:, None, None] * (r[..., :, None] * rJ[..., None, :])
    )
    r_corr = scale_r[:, None] * r
    use = jnp.asarray(use_kernel, r.dtype)
    return use * r_corr + (1 - use) * r, use * J_corr + (1 - use) * J


def correct_block(r, J, use_kernel, delta=1.0):
    """Apply the Huber corrector to one whitened residual block.

    r: (R,) whitened residual; J: (R, C) whitened jacobian (any packed column
    layout); use_kernel: bool/0-1 — when 0 the block passes through unchanged.
    Returns (r_corrected, J_corrected)."""
    s = jnp.dot(r, r)
    _, drho, ddrho = huber_rho(s, delta)
    scale_r, alpha_sq, sqrt_rho1 = corrector_scales(s, drho, ddrho)
    rJ = r @ J
    J_corr = sqrt_rho1 * (J - alpha_sq * jnp.outer(r, rJ))
    r_corr = scale_r * r
    use = jnp.asarray(use_kernel, r.dtype)
    return use * r_corr + (1 - use) * r, use * J_corr + (1 - use) * J
