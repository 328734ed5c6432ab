"""Pallas TPU kernel for subpixel corner refinement (cv::cornerSubPix).

Same behavior as vision/features.py:corner_subpix (the jnp reference used on
CPU): 20 iterations of the gradient-structure centroid equation on an 11x11
Gaussian-weighted window, steps clipped to +-1 px, refinement kept only if
the total move stays under the window half — but per-corner on the VPU with
the LK kernel's VMEM-resident image + roll-align-crop machinery
(ops/pallas_lk.py). The vmapped jnp formulation re-gathers a 13x13 patch
from HBM per corner per iteration and measured ~8 ms in the frame
composite; this kernel runs the whole 210-corner refinement in the
sub-millisecond range.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_lk import (
    BLK_C,
    BLK_R,
    COL_OFF,
    CROP_C,
    CROP_R,
    CCX,
    CCY,
    FPP,
    ROW_OFF,
    _INTERLEAVE,
    _align_crop,
    _roll,
)

HALF = 5          # 11x11 window (cv::Size(5,5))
ITERS = 20        # cv::TermCriteria(COUNT + EPS, 20, 0.01) — tracking.cc:625
EPS = 0.01


def _weights_and_grids():
    """Static Gaussian window weights + dx/dy grids on the (CROP_R, CROP_C)
    working crop, centered at (CCY, CCX); zero outside the 11x11 window."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (CROP_R, CROP_C), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (CROP_R, CROP_C), 1)
    dy = (rows - CCY).astype(jnp.float32)
    dx = (cols - CCX).astype(jnp.float32)
    inside = (
        (rows >= CCY - HALF) & (rows <= CCY + HALF)
        & (cols >= CCX - HALF) & (cols <= CCX + HALF)
    )
    h = jnp.float32(HALF)
    wgt = jnp.exp(-((dx / h) ** 2)) * jnp.exp(-((dy / h) ** 2))
    wgt = jnp.where(inside, wgt, jnp.float32(0.0))
    return wgt, dx, dy


def _kernel(corners_ref, feat_ref, img_ref, out_ref):
    g = pl.program_id(0)
    if _INTERLEAVE:
        _refine_group(corners_ref, feat_ref, img_ref, out_ref, g)
        return
    for b in range(FPP):
        _refine_one(corners_ref, feat_ref, img_ref, out_ref, g * FPP + jnp.int32(b))


def _refine_group(corners_ref, feat_ref, img_ref, out_ref, g):
    """All FPP corners of program ``g`` in one joint while_loop — the same
    latency-bound scalar->vector chain pipelining as pallas_lk._track_group
    (per-corner convergence via active masks; iterates until the slowest
    member converges, frozen members gated to no-ops)."""
    wgt, dxg, dyg = _weights_and_grids()
    fs, blks, y0fs, x0fs, cxs0, cys0, vs = [], [], [], [], [], [], []
    for b in range(FPP):
        f = g * FPP + jnp.int32(b)
        y0 = pl.multiple_of(corners_ref[0, f], 8)
        x0 = pl.multiple_of(corners_ref[1, f], 128)
        fs.append(f)
        blks.append(img_ref[pl.ds(y0, BLK_R), pl.ds(x0, BLK_C)])
        y0fs.append(y0.astype(jnp.float32))
        x0fs.append(x0.astype(jnp.float32))
        cxs0.append(feat_ref[0, f])
        cys0.append(feat_ref[1, f])
        vs.append(feat_ref[2, f])

    def cond(carry):
        i, actives = carry[0], carry[1]
        any_active = actives[0]
        for a in actives[1:]:
            any_active = any_active | a
        return (i < ITERS) & any_active

    def body(carry):
        i, actives, pxs, pys = carry
        nxs, nys, nas = [], [], []
        for b in range(FPP):
            cur = _align_crop(blks[b], pys[b] - y0fs[b], pxs[b] - x0fs[b])
            gx = 0.5 * (_roll(cur, -1, 1) - _roll(cur, 1, 1))
            gy = 0.5 * (_roll(cur, -1, 0) - _roll(cur, 1, 0))
            wxx = wgt * gx * gx
            wyy = wgt * gy * gy
            wxy = wgt * gx * gy
            gxx = jnp.sum(wxx)
            gyy = jnp.sum(wyy)
            gxy = jnp.sum(wxy)
            bx = jnp.sum(wxx * dxg) + jnp.sum(wxy * dyg)
            by = jnp.sum(wxy * dxg) + jnp.sum(wyy * dyg)
            det = gxx * gyy - gxy * gxy
            safe = jnp.abs(det) > jnp.float32(1e-12)
            inv = jnp.where(safe,
                            jnp.float32(1.0) / jnp.where(safe, det, jnp.float32(1.0)),
                            jnp.float32(0.0))
            ddx = jnp.clip((gyy * bx - gxy * by) * inv, -1.0, 1.0)
            ddy = jnp.clip((gxx * by - gxy * bx) * inv, -1.0, 1.0)
            gate = jnp.where(actives[b], jnp.float32(1.0), jnp.float32(0.0))
            nxs.append(pxs[b] + ddx * gate)
            nys.append(pys[b] + ddy * gate)
            nas.append(actives[b]
                       & (jnp.sqrt(ddx * ddx + ddy * ddy) >= jnp.float32(EPS)))
        return (i + 1, tuple(nas), tuple(nxs), tuple(nys))

    _, _, fxs, fys = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), tuple(v > 0 for v in vs), tuple(cxs0), tuple(cys0)))

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    for b in range(FPP):
        px, py = fxs[b], fys[b]
        moved = jnp.sqrt((px - cxs0[b]) ** 2 + (py - cys0[b]) ** 2)
        ly = py - y0fs[b]
        lx = px - x0fs[b]
        inside = (
            (ly >= HALF + 2.0) & (ly <= BLK_R - HALF - 3.0)
            & (lx >= HALF + 2.0) & (lx <= BLK_C - HALF - 3.0)
        )
        ok = (moved < jnp.float32(HALF)) & inside & (vs[b] > 0)
        px = jnp.where(ok, px, cxs0[b])
        py = jnp.where(ok, py, cys0[b])
        row = jnp.where(lane == 0, px, py)
        out_ref[fs[b], :] = row[0, :]


def _refine_one(corners_ref, feat_ref, img_ref, out_ref, f):
    y0 = pl.multiple_of(corners_ref[0, f], 8)
    x0 = pl.multiple_of(corners_ref[1, f], 128)
    cx0 = feat_ref[0, f]
    cy0 = feat_ref[1, f]
    v = feat_ref[2, f]

    blk = img_ref[pl.ds(y0, BLK_R), pl.ds(x0, BLK_C)]
    y0f = y0.astype(jnp.float32)
    x0f = x0.astype(jnp.float32)
    wgt, dxg, dyg = _weights_and_grids()

    def cond(carry):
        i, _, _, active = carry
        return (i < ITERS) & active

    def body(carry):
        i, px, py, _ = carry
        cur = _align_crop(blk, py - y0f, px - x0f)
        gx = 0.5 * (_roll(cur, -1, 1) - _roll(cur, 1, 1))
        gy = 0.5 * (_roll(cur, -1, 0) - _roll(cur, 1, 0))
        wxx = wgt * gx * gx
        wyy = wgt * gy * gy
        wxy = wgt * gx * gy
        gxx = jnp.sum(wxx)
        gyy = jnp.sum(wyy)
        gxy = jnp.sum(wxy)
        bx = jnp.sum(wxx * dxg) + jnp.sum(wxy * dyg)
        by = jnp.sum(wxy * dxg) + jnp.sum(wyy * dyg)
        det = gxx * gyy - gxy * gxy
        safe = jnp.abs(det) > jnp.float32(1e-12)
        inv = jnp.where(safe, jnp.float32(1.0) / jnp.where(safe, det, jnp.float32(1.0)),
                        jnp.float32(0.0))
        ddx = jnp.clip((gyy * bx - gxy * by) * inv, -1.0, 1.0)
        ddy = jnp.clip((gxx * by - gxy * bx) * inv, -1.0, 1.0)
        # cv semantics: apply the step, then stop once it fell below EPS
        keep_going = jnp.sqrt(ddx * ddx + ddy * ddy) >= jnp.float32(EPS)
        return (i + 1, px + ddx, py + ddy, keep_going)

    _, px, py, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), cx0, cy0, v > 0))

    # keep refinement only if it stayed close (guards divergence) and the
    # window never left the gathered block
    moved = jnp.sqrt((px - cx0) ** 2 + (py - cy0) ** 2)
    ly = py - y0f
    lx = px - x0f
    inside = (
        (ly >= HALF + 2.0) & (ly <= BLK_R - HALF - 3.0)
        & (lx >= HALF + 2.0) & (lx <= BLK_C - HALF - 3.0)
    )
    ok = (moved < jnp.float32(HALF)) & inside & (v > 0)
    px = jnp.where(ok, px, cx0)
    py = jnp.where(ok, py, cy0)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    row = jnp.where(lane == 0, px, py)
    out_ref[f, :] = row[0, :]


@functools.partial(jax.jit, static_argnames=("interpret",))
def subpix_pallas(img, pts, valid, interpret=False):
    """Refine corners (N,2) f32 xy on img (H,W) f32. Returns (N,2) f32."""
    H0, W0 = img.shape
    N = pts.shape[0]
    img = img.astype(jnp.float32)
    pts = pts.astype(jnp.float32)

    H = max(-(-H0 // 8) * 8, BLK_R + 8)
    W = max(-(-W0 // 128) * 128, BLK_C + 128)
    if (H, W) != (H0, W0):
        img = jnp.pad(img, ((0, H - H0), (0, W - W0)), mode="edge")

    iy = jnp.floor(pts[:, 1]).astype(jnp.int32)
    ix = jnp.floor(pts[:, 0]).astype(jnp.int32)
    y0 = jnp.clip(((iy - ROW_OFF) // 8) * 8, 0, H - BLK_R)
    x0 = jnp.clip(((ix - COL_OFF) // 128) * 128, 0, W - BLK_C)
    corners_packed = jnp.stack([y0, x0], axis=0)  # (2, N)
    feat_packed = jnp.concatenate(
        [pts.T, valid.astype(jnp.float32)[None, :], jnp.zeros((1, N), jnp.float32)],
        axis=0,
    )  # (4, N)

    Np = -(-N // FPP) * FPP
    if Np != N:
        corners_packed = jnp.pad(corners_packed, ((0, 0), (0, Np - N)))
        feat_packed = jnp.pad(feat_packed, ((0, 0), (0, Np - N)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Np // FPP,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )

    with jax.enable_x64(False):
        out = pl.pallas_call(
            _kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((Np, 128), jnp.float32),
            interpret=interpret,
        )(corners_packed, feat_packed, img)

    return out[:N, :2]
