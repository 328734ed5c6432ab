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


# batched-MXU level tracker -------------------------------------------------
#
# One neighbourhood block per feature is gathered ONCE per level, and every
# LK iteration re-samples the 21x21 bilinear window for ALL features with two
# batched banded matmuls ("sandwich"): crop = Sy @ block @ Sx, where Sy/Sx
# are 2-banded interpolation matrices built from the current sub-pixel
# position. The per-feature serial op chain of the pallas kernel (~5 us *
# 8k programs/frame, latency-bound on the VPU) becomes a handful of large
# batched einsums on the MXU; the while_loop exits when EVERY feature has
# converged (cv's per-feature criteria are kept via active masks).

BLK_ROWS = 48     # gathered block: 21+2 window rows + +-12 drift margin
BLK_COLS = 128    # one lane tile: +-52 px horizontal drift margin
CROP = 24         # rows/cols sampled per iteration (23 used + 1 pad)


def _bands(local, size):
    """(F, CROP, size) 2-banded bilinear interpolation matrix: row r samples
    the block axis at local - (WIN_HALF+1) + r + frac."""
    i0 = jnp.floor(local).astype(jnp.int32) - (WIN_HALF + 1)
    frac = (local - jnp.floor(local)).astype(jnp.float32)
    rows = i0[:, None] + jnp.arange(CROP, dtype=jnp.int32)[None, :]      # (F, CROP)
    grid = jnp.arange(size, dtype=jnp.int32)[None, None, :]
    lo = (rows[..., None] == grid).astype(jnp.float32)
    hi = (rows[..., None] + 1 == grid).astype(jnp.float32)
    return lo * (1.0 - frac)[:, None, None] + hi * frac[:, None, None]


def _sample_crops(blocks, ly, lx):
    """Bilinear (F, CROP, CROP) windows at local positions (ly, lx)."""
    Sy = _bands(ly, BLK_ROWS)                       # (F, CROP, BR)
    Sx = _bands(lx, BLK_COLS)                       # (F, CROP, BC)
    tmp = jnp.einsum("frk,fkc->frc", Sy, blocks)    # (F, CROP, BC)
    return jnp.einsum("frc,fwc->frw", tmp, Sx)      # (F, CROP, CROP)


def _gather_blocks(img, pts):
    H, W = img.shape
    iy = jnp.floor(pts[:, 1]).astype(jnp.int32)
    ix = jnp.floor(pts[:, 0]).astype(jnp.int32)
    y0 = jnp.clip(iy - BLK_ROWS // 2, 0, max(H - BLK_ROWS, 0))
    x0 = jnp.clip(ix - BLK_COLS // 2, 0, max(W - BLK_COLS, 0))
    blk = jax.vmap(
        lambda yy, xx: jax.lax.dynamic_slice(img, (yy, xx), (BLK_ROWS, BLK_COLS))
    )(y0, x0)
    return blk, y0, x0


def _track_level_batched(img_prev, img_next, pts_prev, pts_next, valid):
    """Batched-MXU equivalent of ``_track_level`` (same cv semantics)."""
    # edge-pad by the window radius so border features sample clamped pixels
    # (cv border behavior, as in _track_level), and up to the block size for
    # tiny top pyramid levels
    H0, W0 = img_prev.shape
    pr = max(BLK_ROWS - (H0 + 2 * _PAD), 0) + _PAD
    pc = max(BLK_COLS - (W0 + 2 * _PAD), 0) + _PAD
    img_prev = jnp.pad(img_prev, ((_PAD, pr), (_PAD, pc)), mode="edge")
    img_next = jnp.pad(img_next, ((_PAD, pr), (_PAD, pc)), mode="edge")

    img_prev = img_prev.astype(jnp.float32)
    img_next = img_next.astype(jnp.float32)
    pts_prev = pts_prev.astype(jnp.float32) + _PAD
    pts_next = pts_next.astype(jnp.float32) + _PAD

    pblk, py0, px0 = _gather_blocks(img_prev, pts_prev)
    nblk, ny0, nx0 = _gather_blocks(img_next, pts_next)

    # template + gradients (once)
    tpl24 = _sample_crops(pblk, pts_prev[:, 1] - py0, pts_prev[:, 0] - px0)
    tpl = tpl24[:, 1:-2, 1:-2]                               # (F, 21, 21)
    gx = 0.5 * (tpl24[:, 1:-2, 2:-1] - tpl24[:, 1:-2, 0:-3])
    gy = 0.5 * (tpl24[:, 2:-1, 1:-2] - tpl24[:, 0:-3, 1:-2])
    gxx = jnp.sum(gx * gx, axis=(1, 2))
    gyy = jnp.sum(gy * gy, axis=(1, 2))
    gxy = jnp.sum(gx * gy, axis=(1, 2))
    det = gxx * gyy - gxy * gxy
    n_px = (2 * WIN_HALF + 1) ** 2
    min_eig = 0.5 * ((gxx + gyy) - jnp.sqrt((gxx - gyy) ** 2 + 4 * gxy * gxy)) / n_px
    ok = (min_eig > MIN_EIG_THRESHOLD) & (jnp.abs(det) > 1e-12) & valid
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)

    ny0f = ny0.astype(jnp.float32)
    nx0f = nx0.astype(jnp.float32)

    def cond(carry):
        i, pos, active = carry
        return (i < MAX_ITERS) & jnp.any(active)

    def body(carry):
        i, pos, active = carry
        cur24 = _sample_crops(nblk, pos[:, 1] - ny0f, pos[:, 0] - nx0f)
        diff = cur24[:, 1:-2, 1:-2] - tpl
        bx = jnp.sum(diff * gx, axis=(1, 2))
        by = jnp.sum(diff * gy, axis=(1, 2))
        dx = -(gyy * bx - gxy * by) * inv_det
        dy = -(gxx * by - gxy * bx) * inv_det
        step = jnp.stack([dx, dy], axis=1)
        # cv semantics: apply the step, THEN stop once it fell below EPS
        pos = pos + step * (active & ok)[:, None]
        active = active & (jnp.linalg.norm(step, axis=1) >= EPS)
        return (i + 1, pos, active)

    _, out, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), pts_next, jnp.asarray(valid))
    )

    # fail tracks whose window would leave the gathered block
    ly = out[:, 1] - ny0f
    lx = out[:, 0] - nx0f
    inside = (
        (ly >= WIN_HALF + 1.0) & (ly <= BLK_ROWS - WIN_HALF - 2.0)
        & (lx >= WIN_HALF + 1.0) & (lx <= BLK_COLS - WIN_HALF - 2.0)
    )
    return out - _PAD, ok & inside


def _level_fn():
    """Pick the per-level tracker implementation.

    Default ("auto"): the VMEM-resident pallas kernel on TPU (fastest
    measured — the batched-matmul formulation pads its small operands onto
    128x128 MXU tiles and loses), the batched sandwich tracker on CPU
    (vectorized over features; much faster than the per-feature gather
    reference under vmap). Overridable for A/B:
    ICGVINS_LK=pallas | gather | batched | auto."""
    import os

    choice = os.environ.get("ICGVINS_LK", "auto")
    on_tpu = False
    try:
        on_tpu = jax.default_backend() not in ("cpu",)
    except Exception:
        pass
    if choice == "auto":
        choice = "pallas" if on_tpu else "batched"
    if choice == "pallas" and on_tpu:
        from ..ops.pallas_lk import lk_level_pallas

        return lk_level_pallas
    if choice == "gather":
        return _track_level
    return _track_level_batched


@partial(jax.jit, static_argnames=("levels",))
def pyr_lk(pyr_prev, pyr_next, pts_prev, pts_init, valid, levels=PYRAMID_LEVELS):
    """Track pts_prev from pyr_prev into pyr_next starting at pts_init
    (USE_INITIAL_FLOW). pyramids: lists of (H/2^l, W/2^l) images.

    Returns (pts_next, status)."""
    level_fn = _level_fn()
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
    # gate the backward track by forward success: a failed-forward feature
    # is culled either way (ok requires st_f below), and the gate lets the
    # pallas kernel's per-feature while_loops exit immediately
    bwd, st_b = pyr_lk(pyr_next, pyr_prev, fwd, pts_prev, valid & st_f, levels)
    H, W = pyr_next[0].shape
    dist = jnp.linalg.norm(bwd - pts_prev, axis=-1)
    on_border = (
        (fwd[:, 0] < border) | (fwd[:, 1] < border)
        | (fwd[:, 0] > W - border) | (fwd[:, 1] > H - border)
    )
    ok = st_f & st_b & (dist < fb_threshold) & ~on_border & valid
    return fwd, ok
