"""Pallas TPU kernel for one pyramidal-LK level over a feature batch.

The LK inner loop is the hottest op in the replay pipeline (2 tracker calls
x fwd/bwd x 4 levels x up-to-30 iterations per frame). Design notes from
measured iterations of this kernel (see CLAUDE.md):

  - the XLA fallback (vision/lk.py:_track_level) re-gathers a 22x22 patch
    from HBM every iteration — orders of magnitude slower;
  - a batched-matmul formulation (banded interpolation sandwiches over all
    features) wastes the MXU: 24x48 operands pad to 128x128 tiles (~20x
    idle FLOPs) and measured SLOWER than this kernel;
  - a first version of this kernel DMA'd one (64,256) block per feature
    from HBM with a prefetch ring. Per-feature compute is only ~1 us, but
    2 DMAs x 8192 programs/frame at ~2 us issue/semaphore overhead each
    dominated everything (a stripped kernel with no compute still took
    ~30 ms/frame). The fix here: the WHOLE level image is staged into VMEM
    ONCE per pallas_call (pipeline-managed input block), and each program
    reads its (64,256) neighbourhood with plain vector loads at a
    tile-aligned dynamic offset — zero per-feature DMAs.

Per-feature body:
  - alignment of a float position onto the window center uses two dynamic
    rolls of the block (integer part, mosaic dynamic_rotate), then a STATIC
    lane-aligned crop to (32,128), then a 4-shift bilinear blend (fraction)
    on the crop — everything gather-free
  - template gradients and the 2x2 normal matrix are computed once under a
    static 21x21 mask; each iteration is a handful of masked reductions and
    a 2x2 solve, with per-feature early exit (lax.while_loop) once the step
    drops below EPS — cv::calcOpticalFlowPyrLK's termination criteria
    (tracking.cc:387-388)

Grid: one program per feature; corners arrive via scalar prefetch.

Round-5 negative results (a fully fused bidirectional multi-level kernel —
one pallas_call instead of 8 — was built and measured SLOWER, then removed):
  - call fusion bought nothing: per-call staging/grid overhead is small
    against the serial per-feature while_loops that dominate;
  - replacing the per-iteration full-block rolls with a (32,256) VMEM load
    at the current integer row (dynamic 8-aligned sublane offset) was ~2x
    SLOWER per iteration — dynamic-offset vector loads cost more than
    register rotates on this target;
  - shrinking the rolled array (lane-aligning once into a (48,128) register
    crop, then rolling only the drift) did not help either: the body is
    LATENCY-bound on the scalar->vector dependency chain, not
    vreg-count-bound, so halving the rolled bytes left the time unchanged.
Benchmark worlds must keep the pyramid CONSISTENT (build both pyramids from
level-0 images): rolling each level by the same pixel offset puts the
coarse-cascade guess ~14 px off at level 0 and inflates LK ~2x.
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WIN_HALF = 10           # 21x21 window (tracking.cc:386)
BLK_R, BLK_C = 64, 256  # per-feature neighbourhood (rows, lanes)
CY, CX = 32, 64         # alignment target center inside the block
ROW_OFF, COL_OFF = 28, 32  # corner offsets before tile alignment
CROP_R0, CROP_C0 = 16, 0   # static crop origin (sublane/lane aligned)
CROP_R, CROP_C = 32, 128   # per-iteration working window
CCY, CCX = CY - CROP_R0, CX - CROP_C0  # center within the crop (16, 64)
MAX_ITERS = 30
EPS = 0.01
MIN_EIG_THRESHOLD = 1e-4
FPP = int(os.environ.get("ICGVINS_LK_FPP", "4"))
                        # features per grid program: the mosaic grid-step
                        # overhead (~us) dominates the ~1 us per-feature
                        # body, so features are processed in groups; with
                        # the interleaved kernel FPP is also the number of
                        # independent chains the scheduler can overlap


def _roll(block, shift, axis):
    """Circular shift that lowers on mosaic for traced shifts. Mosaic's
    dynamic_rotate wants a NON-NEGATIVE i32 amount, and x64 mode would
    promote python ints to i64 — normalize modulo the dimension size."""
    size = block.shape[axis]
    shift = jnp.asarray(shift, jnp.int32) % jnp.int32(size)
    try:
        return pltpu.roll(block, shift, axis)
    except Exception:  # interpret mode / older API
        return jnp.roll(block, shift, axis)


def _align_crop(block, ly, lx):
    """Roll the full block so the integer part of (ly, lx) lands on
    (CY, CX), statically crop to (CROP_R, CROP_C), then blend the (shared)
    fractional offset with three more unit shifts on the crop. Wrap
    artifacts live on the crop's last row/column, outside the masked
    window."""
    di_y = jnp.floor(ly).astype(jnp.int32) - CY
    di_x = jnp.floor(lx).astype(jnp.int32) - CX
    fy = (ly - jnp.floor(ly)).astype(block.dtype)
    fx = (lx - jnp.floor(lx)).astype(block.dtype)
    full = _roll(_roll(block, -di_y, 0), -di_x, 1)
    a = full[CROP_R0 : CROP_R0 + CROP_R, CROP_C0 : CROP_C0 + CROP_C]
    b = _roll(a, -1, 1)
    c = _roll(a, -1, 0)
    d = _roll(c, -1, 1)
    return (1 - fy) * (1 - fx) * a + (1 - fy) * fx * b + fy * (1 - fx) * c + fy * fx * d


def _window_mask(dtype):
    rows = jax.lax.broadcasted_iota(jnp.int32, (CROP_R, CROP_C), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (CROP_R, CROP_C), 1)
    m = (
        (rows >= CCY - WIN_HALF) & (rows <= CCY + WIN_HALF)
        & (cols >= CCX - WIN_HALF) & (cols <= CCX + WIN_HALF)
    )
    return m.astype(dtype)


# The per-feature body is LATENCY-bound on its scalar->vector dependency
# chain (reduction -> step scalars -> dynamic roll amounts -> next
# reduction), leaving the VPU idle between links. Interleaving the FPP
# features of a grid program into ONE while_loop gives the scheduler FPP
# independent chains to overlap. Cost: the group iterates until its
# SLOWEST member converges (converged members are frozen by their active
# mask) — wasted lanes the idle units absorb. A/B: ICGVINS_LK_INTERLEAVE=0
# restores the serial per-feature loops.
_INTERLEAVE = os.environ.get("ICGVINS_LK_INTERLEAVE", "1") != "0"


def _kernel(corners_ref, feat_ref,
            img_prev_ref, img_next_ref,
            out_ref):
    # corners_ref: (4, N) i32 [py0, px0, ny0, nx0]; feat_ref: (8, N) f32
    # [ppx, ppy, gx0, gy0, valid, ...] — transposed layout keeps the SMEM
    # footprint at KBs (an (N,2) SMEM array is padded to 128 lanes per row)
    g = pl.program_id(0)
    if _INTERLEAVE:
        _track_group(corners_ref, feat_ref, img_prev_ref, img_next_ref,
                     out_ref, g)
        return
    for b in range(FPP):
        _track_one(corners_ref, feat_ref, img_prev_ref, img_next_ref,
                   out_ref, g * FPP + jnp.int32(b))


def _track_group(corners_ref, feat_ref, img_prev_ref, img_next_ref,
                 out_ref, g):
    """All FPP features of program ``g`` in one joint while_loop (same cv
    semantics as _track_one; per-feature convergence via active masks)."""
    mask = _window_mask(jnp.float32)
    fs, nbs, tpls, gxs, gys = [], [], [], [], []
    gxxs, gyys, gxys, inv_dets, oks = [], [], [], [], []
    ny0fs, nx0fs, xs0, ys0 = [], [], [], []
    for b in range(FPP):
        f = g * FPP + jnp.int32(b)
        py0 = pl.multiple_of(corners_ref[0, f], 8)
        px0 = pl.multiple_of(corners_ref[1, f], 128)
        ny0 = pl.multiple_of(corners_ref[2, f], 8)
        nx0 = pl.multiple_of(corners_ref[3, f], 128)
        ppx = feat_ref[0, f]
        ppy = feat_ref[1, f]
        v = feat_ref[4, f]
        pb = img_prev_ref[pl.ds(py0, BLK_R), pl.ds(px0, BLK_C)]
        nb = img_next_ref[pl.ds(ny0, BLK_R), pl.ds(nx0, BLK_C)]
        tpl = _align_crop(pb, ppy - py0.astype(jnp.float32),
                          ppx - px0.astype(jnp.float32))
        gx = 0.5 * (_roll(tpl, -1, 1) - _roll(tpl, 1, 1)) * mask
        gy = 0.5 * (_roll(tpl, -1, 0) - _roll(tpl, 1, 0)) * mask
        gxx = jnp.sum(gx * gx)
        gyy = jnp.sum(gy * gy)
        gxy = jnp.sum(gx * gy)
        det = gxx * gyy - gxy * gxy
        n_px = jnp.float32((2 * WIN_HALF + 1) ** 2)
        min_eig = 0.5 * ((gxx + gyy)
                         - jnp.sqrt((gxx - gyy) ** 2 + 4 * gxy * gxy)) / n_px
        ok = (min_eig > MIN_EIG_THRESHOLD) & (jnp.abs(det) > 1e-12) & (v > 0)
        inv_det = jnp.where(jnp.abs(det) > jnp.float32(1e-12),
                            jnp.float32(1.0) / det, jnp.float32(0.0))
        fs.append(f)
        nbs.append(nb)
        tpls.append(tpl)
        gxs.append(gx)
        gys.append(gy)
        gxxs.append(gxx)
        gyys.append(gyy)
        gxys.append(gxy)
        inv_dets.append(inv_det)
        oks.append(ok)
        ny0fs.append(ny0.astype(jnp.float32))
        nx0fs.append(nx0.astype(jnp.float32))
        xs0.append(feat_ref[2, f])
        ys0.append(feat_ref[3, f])

    def cond(carry):
        i, actives = carry[0], carry[1]
        any_active = actives[0]
        for a in actives[1:]:
            any_active = any_active | a
        return (i < MAX_ITERS) & any_active

    def body(carry):
        i, actives, cxs, cys = carry
        nxs, nys, nas = [], [], []
        for b in range(FPP):
            cur = _align_crop(nbs[b], cys[b] - ny0fs[b], cxs[b] - nx0fs[b])
            diff = cur - tpls[b]
            bx = jnp.sum(diff * gxs[b])
            by = jnp.sum(diff * gys[b])
            dx = -(gyys[b] * bx - gxys[b] * by) * inv_dets[b]
            dy = -(gxxs[b] * by - gxys[b] * bx) * inv_dets[b]
            gate = jnp.where(actives[b], jnp.float32(1.0), jnp.float32(0.0))
            nxs.append(cxs[b] + dx * gate)
            nys.append(cys[b] + dy * gate)
            nas.append(actives[b]
                       & (jnp.sqrt(dx * dx + dy * dy) >= jnp.float32(EPS)))
        return (i + 1, tuple(nas), tuple(nxs), tuple(nys))

    _, _, fxs, fys = jax.lax.while_loop(
        cond, body, (jnp.int32(0), tuple(oks), tuple(xs0), tuple(ys0)))

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    for b in range(FPP):
        gx_f = jnp.where(oks[b], fxs[b], xs0[b])
        gy_f = jnp.where(oks[b], fys[b], ys0[b])
        ly = gy_f - ny0fs[b]
        lx = gx_f - nx0fs[b]
        inside = (
            (ly >= WIN_HALF + 1.0) & (ly <= BLK_R - WIN_HALF - 2.0)
            & (lx >= WIN_HALF + 1.0) & (lx <= BLK_C - WIN_HALF - 2.0)
        )
        okf = jnp.where(oks[b] & inside, jnp.float32(1.0), jnp.float32(0.0))
        row = jnp.where(lane == 0, gx_f, jnp.where(lane == 1, gy_f, okf))
        out_ref[fs[b], :] = row[0, :]


def _track_one(corners_ref, feat_ref, img_prev_ref, img_next_ref, out_ref, f):
    py0 = pl.multiple_of(corners_ref[0, f], 8)
    px0 = pl.multiple_of(corners_ref[1, f], 128)
    ny0 = pl.multiple_of(corners_ref[2, f], 8)
    nx0 = pl.multiple_of(corners_ref[3, f], 128)

    ppx = feat_ref[0, f]
    ppy = feat_ref[1, f]
    gx0 = feat_ref[2, f]
    gy0 = feat_ref[3, f]
    v = feat_ref[4, f]

    # neighbourhoods: plain vector loads from the VMEM-resident level image
    pb = img_prev_ref[pl.ds(py0, BLK_R), pl.ds(px0, BLK_C)]
    nb = img_next_ref[pl.ds(ny0, BLK_R), pl.ds(nx0, BLK_C)]

    mask = _window_mask(jnp.float32)

    tpl = _align_crop(pb, ppy - py0.astype(jnp.float32),
                      ppx - px0.astype(jnp.float32))
    gx = 0.5 * (_roll(tpl, -1, 1) - _roll(tpl, 1, 1))
    gy = 0.5 * (_roll(tpl, -1, 0) - _roll(tpl, 1, 0))
    gx = gx * mask
    gy = gy * mask
    gxx = jnp.sum(gx * gx)
    gyy = jnp.sum(gy * gy)
    gxy = jnp.sum(gx * gy)
    det = gxx * gyy - gxy * gxy
    n_px = jnp.float32((2 * WIN_HALF + 1) ** 2)
    min_eig = 0.5 * ((gxx + gyy) - jnp.sqrt((gxx - gyy) ** 2 + 4 * gxy * gxy)) / n_px
    ok = (min_eig > MIN_EIG_THRESHOLD) & (jnp.abs(det) > 1e-12) & (v > 0)
    inv_det = jnp.where(jnp.abs(det) > jnp.float32(1e-12), jnp.float32(1.0) / det, jnp.float32(0.0))

    ny0f = ny0.astype(jnp.float32)
    nx0f = nx0.astype(jnp.float32)

    def cond(carry):
        i, _, _, active = carry
        return (i < MAX_ITERS) & active

    def body(carry):
        i, gx_cur, gy_cur, _ = carry
        cur = _align_crop(nb, gy_cur - ny0f, gx_cur - nx0f)
        diff = (cur - tpl) * mask
        bx = jnp.sum(diff * gx)
        by = jnp.sum(diff * gy)
        dx = -(gyy * bx - gxy * by) * inv_det
        dy = -(gxx * by - gxy * bx) * inv_det
        # f32 constants: python floats are weak f64 under x64 and mosaic has
        # no f64 select
        keep_going = jnp.sqrt(dx * dx + dy * dy) >= jnp.float32(EPS)
        return (i + 1, gx_cur + dx, gy_cur + dy, keep_going)

    _, gx_f, gy_f, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), gx0, gy0, ok))
    gx_f = jnp.where(ok, gx_f, gx0)
    gy_f = jnp.where(ok, gy_f, gy0)

    # fail tracks whose 21x21 window would wrap around the block edges
    ly = gy_f - ny0f
    lx = gx_f - nx0f
    inside = (
        (ly >= WIN_HALF + 1.0) & (ly <= BLK_R - WIN_HALF - 2.0)
        & (lx >= WIN_HALF + 1.0) & (lx <= BLK_C - WIN_HALF - 2.0)
    )

    # mosaic cannot store scalars to VMEM: emit one 128-lane row per feature
    # with [x, y, ok] in the first three lanes
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    okf = jnp.where(ok & inside, jnp.float32(1.0), jnp.float32(0.0))
    row = jnp.where(lane == 0, gx_f, jnp.where(lane == 1, gy_f, okf))
    out_ref[f, :] = row[0, :]


@functools.partial(jax.jit, static_argnames=("interpret",))
def lk_level_pallas(img_prev, img_next, pts_prev, pts_guess, valid, interpret=False):
    """Track one pyramid level. Images (H,W) f32; pts (N,2) level coords.

    Returns (pts_next (N,2) f32, ok (N,) bool)."""
    H0, W0 = img_prev.shape
    N = pts_prev.shape[0]
    img_prev = img_prev.astype(jnp.float32)
    img_next = img_next.astype(jnp.float32)
    pts_prev = pts_prev.astype(jnp.float32)
    pts_guess = pts_guess.astype(jnp.float32)

    # pad to the tile grid and the minimum block size (edge padding keeps
    # the cv border behavior closely enough; border tracks are culled)
    H = max(-(-H0 // 8) * 8, BLK_R + 8)
    W = max(-(-W0 // 128) * 128, BLK_C + 128)
    if (H, W) != (H0, W0):
        img_prev = jnp.pad(img_prev, ((0, H - H0), (0, W - W0)), mode="edge")
        img_next = jnp.pad(img_next, ((0, H - H0), (0, W - W0)), mode="edge")

    def corners(pts):
        iy = jnp.floor(pts[:, 1]).astype(jnp.int32)
        ix = jnp.floor(pts[:, 0]).astype(jnp.int32)
        y0 = jnp.clip(((iy - ROW_OFF) // 8) * 8, 0, H - BLK_R)
        x0 = jnp.clip(((ix - COL_OFF) // 128) * 128, 0, W - BLK_C)
        return jnp.stack([y0, x0], axis=1)

    corner_prev = corners(pts_prev)
    corner_next = corners(pts_guess)
    corners_packed = jnp.concatenate([corner_prev.T, corner_next.T], axis=0)  # (4, N)
    feat_packed = jnp.concatenate(
        [
            pts_prev.T, pts_guess.T,
            valid.astype(jnp.float32)[None, :],
            jnp.zeros((3, N), jnp.float32),
        ],
        axis=0,
    )  # (8, N)

    Np = -(-N // FPP) * FPP
    if Np != N:
        corners_packed = jnp.pad(corners_packed, ((0, 0), (0, Np - N)))
        feat_packed = jnp.pad(feat_packed, ((0, 0), (0, Np - N)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Np // FPP,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # feat_packed (scalar reads)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # whole level image resident
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )

    # trace the pallas_call with x64 disabled: under jax_enable_x64 the
    # auto-generated block index maps emit i64 literals, which mosaic
    # cannot legalize ('func.func' / transform_N failures)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            _kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((Np, 128), jnp.float32),
            interpret=interpret,
        )(corners_packed, feat_packed, img_prev, img_next)

    return out[:N, :2], out[:N, 2] > 0
