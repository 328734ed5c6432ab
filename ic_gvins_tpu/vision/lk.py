"""Pyramidal Lucas-Kanade optical flow, batched over features.

Replaces cv::calcOpticalFlowPyrLK (21x21 window, 3+1 pyramid levels, 30
iterations, eps 0.01, OPTFLOW_USE_INITIAL_FLOW — tracking.cc:385-393).

TPU-native design: all features' patches are gathered and iterated together
(vmap over the feature table), each pyramid level is one fused jit region;
the inner refinement is a ``fori_loop`` with converged features masked to
no-ops. Forward/backward consistency culling (0.5 px) mirrors
tracking.cc:396-403.
"""

from functools import partial

import jax
import jax.numpy as jnp

from .pyramid import extract_patch

WIN_HALF = 10          # 21x21 window
PYRAMID_LEVELS = 4     # TRACK_PYRAMID_LEVEL=3 + base
MAX_ITERS = 30
EPS = 0.01
MIN_EIG_THRESHOLD = 1e-4


def _patch_and_grads(img, center):
    """Patch (21x21) and its Scharr-style gradients at center (x,y)."""
    p = extract_patch(img, center, WIN_HALF + 1)  # 23x23
    patch = p[1:-1, 1:-1]
    gx = 0.5 * (p[1:-1, 2:] - p[1:-1, :-2])
    gy = 0.5 * (p[2:, 1:-1] - p[:-2, 1:-1])
    return patch, gx, gy


_PAD = WIN_HALF + 2


def _track_level(img_prev, img_next, pts_prev, pts_next, valid):
    """One pyramid level of LK for all features. Returns updated pts_next and
    per-feature status (spatial-gradient conditioning).

    Levels are edge-padded by the window radius so the dynamic-slice patch
    extraction never shifts for in-image centers (cv LK's border behavior)."""
    img_prev = jnp.pad(img_prev, _PAD, mode="edge")
    img_next = jnp.pad(img_next, _PAD, mode="edge")
    pts_prev = pts_prev + _PAD
    pts_next = pts_next + _PAD

    def one(pp, pn, v):
        tpl, gx, gy = _patch_and_grads(img_prev, pp)
        gxx = jnp.sum(gx * gx)
        gyy = jnp.sum(gy * gy)
        gxy = jnp.sum(gx * gy)
        det = gxx * gyy - gxy * gxy
        n_px = (2 * WIN_HALF + 1) ** 2
        min_eig = 0.5 * ((gxx + gyy) - jnp.sqrt((gxx - gyy) ** 2 + 4 * gxy * gxy)) / n_px
        ok = (min_eig > MIN_EIG_THRESHOLD) & (jnp.abs(det) > 1e-12) & v

        inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)

        def body(_, carry):
            pos, active = carry
            cur = extract_patch(img_next, pos, WIN_HALF)
            diff = cur - tpl
            bx = jnp.sum(diff * gx)
            by = jnp.sum(diff * gy)
            dx = -(gyy * bx - gxy * by) * inv_det
            dy = -(gxx * by - gxy * bx) * inv_det
            step = jnp.stack([dx, dy])
            # cv semantics: apply the step, THEN stop once it fell below EPS
            pos = pos + step * (active & ok)
            active = active & (jnp.linalg.norm(step) >= EPS)
            return pos, active

        out, _ = jax.lax.fori_loop(0, MAX_ITERS, body, (pn, jnp.bool_(True)))
        return out, ok

    out, ok = jax.vmap(one)(pts_prev, pts_next, valid)
    return out - _PAD, ok


def _use_pallas():
    """The Pallas LK kernel runs on TPU backends; the XLA gather path is the
    CPU/interpret fallback."""
    import os

    if os.environ.get("ICGVINS_DISABLE_PALLAS_LK"):
        return False
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


@partial(jax.jit, static_argnames=("levels",))
def pyr_lk(pyr_prev, pyr_next, pts_prev, pts_init, valid, levels=PYRAMID_LEVELS):
    """Track pts_prev from pyr_prev into pyr_next starting at pts_init
    (USE_INITIAL_FLOW). pyramids: lists of (H/2^l, W/2^l) images.

    Returns (pts_next, status)."""
    if _use_pallas():
        from ..ops.pallas_lk import lk_level_pallas as level_fn
    else:
        level_fn = _track_level
    pts_prev = pts_prev.astype(pyr_prev[0].dtype)
    pts_init = pts_init.astype(pyr_prev[0].dtype)
    scale = 2.0 ** (levels - 1)
    guess = pts_init / scale
    status = valid
    for lvl in range(levels - 1, -1, -1):
        s = 2.0**lvl
        pp = pts_prev / s
        guess, ok = level_fn(pyr_prev[lvl], pyr_next[lvl], pp, guess, valid)
        status = status & ok
        if lvl > 0:
            guess = guess * 2.0
    H, W = pyr_next[0].shape
    inb = (
        (guess[:, 0] >= 0) & (guess[:, 0] <= W - 1)
        & (guess[:, 1] >= 0) & (guess[:, 1] <= H - 1)
    )
    return guess, status & inb


@partial(jax.jit, static_argnames=("levels",))
def track_bidirectional(pyr_prev, pyr_next, pts_prev, pts_pred, valid,
                        levels=PYRAMID_LEVELS, fb_threshold=0.5, border=5):
    """Forward + backward LK with consistency check (tracking.cc:380-403).

    Returns (pts_next, ok) where ok requires: both tracks succeed, the
    backward track returns within fb_threshold px of the start, and the
    forward point is inside the 5-px border."""
    fwd, st_f = pyr_lk(pyr_prev, pyr_next, pts_prev, pts_pred, valid, levels)
    bwd, st_b = pyr_lk(pyr_next, pyr_prev, fwd, pts_prev, valid, levels)
    H, W = pyr_next[0].shape
    dist = jnp.linalg.norm(bwd - pts_prev, axis=-1)
    on_border = (
        (fwd[:, 0] < border) | (fwd[:, 1] < border)
        | (fwd[:, 0] > W - border) | (fwd[:, 1] > H - border)
    )
    ok = st_f & st_b & (dist < fb_threshold) & ~on_border & valid
    return fwd, ok
