"""Shi-Tomasi corner detection: blockwise masked top-k + subpixel refinement.

Replaces the reference's TBB-parallel per-block cv::goodFeaturesToTrack +
cv::cornerSubPix (tracking.cc:576-688). TPU-native: the min-eigenvalue
response is one fused convolution pipeline over the whole image; per-block
quality gating, NMS and top-k are a reshape + batched top_k; the circular
feature mask becomes a max-pooled occupancy image. Output is a fixed-size
padded corner table with a validity mask.
"""

from functools import partial

import jax
import jax.numpy as jnp

TRACK_BLOCK_SIZE = 300.0  # tracking.h block size (pixels)


def _sobel(img):
    """3x3 Sobel gradients with cv-compatible scale (aperture 3)."""
    img = img.astype(jnp.float32)
    p = jnp.pad(img, 1, mode="edge")
    # separable: d = [-1,0,1], s = [1,2,1]
    dx = (p[:, 2:] - p[:, :-2])
    gx = dx[:-2, :] + 2.0 * dx[1:-1, :] + dx[2:, :]
    dy = (p[2:, :] - p[:-2, :])
    gy = dy[:, :-2] + 2.0 * dy[:, 1:-1] + dy[:, 2:]
    return gx, gy


def min_eig_response(img, block_size=3):
    """Per-pixel smaller eigenvalue of the gradient covariance (the
    cv::goodFeaturesToTrack response)."""
    gx, gy = _sobel(img)
    xx, yy, xy = gx * gx, gy * gy, gx * gy

    k = block_size // 2

    def box(a):
        p = jnp.pad(a, k, mode="edge")
        out = jnp.zeros_like(a)
        for i in range(block_size):
            for j in range(block_size):
                out = out + p[i : i + a.shape[0], j : j + a.shape[1]]
        return out / (block_size * block_size)

    sxx, syy, sxy = box(xx), box(yy), box(xy)
    tr = sxx + syy
    det = jnp.sqrt(jnp.maximum((sxx - syy) ** 2 + 4.0 * sxy * sxy, 0.0))
    return 0.5 * (tr - det)


def occupancy_mask(points_xy, valid, shape, radius):
    """0/1 image that is 0 within ``radius`` (square window) of any valid
    point — the feature-distance mask (tracking.cc:609-620, circles
    approximated by squares of the same radius)."""
    H, W = shape
    occ = jnp.zeros((H, W), jnp.float32)
    xi = jnp.clip(points_xy[:, 0].astype(jnp.int32), 0, W - 1)
    yi = jnp.clip(points_xy[:, 1].astype(jnp.int32), 0, H - 1)
    occ = occ.at[yi, xi].max(valid.astype(jnp.float32))
    k = int(2 * radius + 1)
    # max is separable: two 1-D window passes instead of one kxk pass
    occ = jax.lax.reduce_window(occ, -jnp.inf, jax.lax.max, (k, 1), (1, 1), "SAME")
    occ = jax.lax.reduce_window(occ, -jnp.inf, jax.lax.max, (1, k), (1, 1), "SAME")
    return 1.0 - jnp.maximum(occ, 0.0)


@partial(jax.jit, static_argnames=("block_rows", "block_cols", "per_block", "min_distance", "border"))
def detect_blockwise(
    img,
    mask,
    block_counts,
    *,
    block_rows,
    block_cols,
    per_block,
    min_distance=15,
    quality_level=0.01,
    border=5,
):
    """Blockwise Shi-Tomasi detection.

    img: (H,W) f32 (CLAHE'd); mask: (H,W) 0/1 allowed regions;
    block_counts: (block_rows*block_cols,) already-present features per block
    (detection fills each block up to ``per_block``).

    Returns (corners (B*per_block, 2) xy, response, valid) padded tables.
    Parity: per-block quality gate at 0.01 * block max (each block was an
    independent goodFeaturesToTrack call in the reference), NMS at
    min_distance, 5-px borders between blocks (tracking.cc:639-642).
    """
    H, W = img.shape
    bh, bw = H // block_rows, W // block_cols

    resp = min_eig_response(img)

    # NMS: strict local maxima within the min-distance window (separable max)
    k = int(min_distance) | 1
    dil = jax.lax.reduce_window(resp, -jnp.inf, jax.lax.max, (k, 1), (1, 1), "SAME")
    dil = jax.lax.reduce_window(dil, -jnp.inf, jax.lax.max, (1, k), (1, 1), "SAME")
    is_max = (resp >= dil) & (resp > 0)

    # border suppression: global image border + inter-block seams (the
    # reference shrinks each block by 5 px except the last)
    yy = jnp.arange(H)[:, None]
    xx = jnp.arange(W)[None, :]
    inb = (yy >= border) & (yy < H - border) & (xx >= border) & (xx < W - border)
    seam_y = (yy % bh) >= (bh - border)
    seam_x = (xx % bw) >= (bw - border)
    inb = inb & ~seam_y & ~seam_x

    resp_m = jnp.where(is_max & inb & (mask > 0), resp, 0.0)

    # crop to whole blocks, reshape to (B, bh*bw)
    crop = resp_m[: block_rows * bh, : block_cols * bw]
    blocks = crop.reshape(block_rows, bh, block_cols, bw).transpose(0, 2, 1, 3)
    blocks = blocks.reshape(block_rows * block_cols, bh * bw)

    # per-block quality gate
    bmax = jnp.max(blocks, axis=1, keepdims=True)
    blocks = jnp.where(blocks >= quality_level * bmax, blocks, 0.0)

    # top-k by per_block rounds of (max, argmax, knock out): after NMS the
    # candidates are sparse and per_block is tiny (~7), so k linear passes
    # beat lax.top_k's sort-based lowering on the ~40k-element blocks
    col = jnp.arange(blocks.shape[1], dtype=jnp.int32)[None, :]
    vals, idxs = [], []
    work = blocks
    for _ in range(per_block):
        v = jnp.max(work, axis=1)
        i = jnp.argmax(work, axis=1).astype(jnp.int32)
        vals.append(v)
        idxs.append(i)
        work = jnp.where(col == i[:, None], 0.0, work)
    top_val = jnp.stack(vals, axis=1)
    top_idx = jnp.stack(idxs, axis=1)

    # slot budget per block: per_block - existing features
    budget = jnp.maximum(per_block - block_counts, 0)
    rank = jnp.arange(per_block)[None, :]
    valid = (top_val > 0) & (rank < budget[:, None])

    by = top_idx // bw
    bx = top_idx % bw
    block_ids = jnp.arange(block_rows * block_cols)
    brow = (block_ids // block_cols)[:, None]
    bcol = (block_ids % block_cols)[:, None]
    x = (bcol * bw + bx).astype(jnp.float32)
    y = (brow * bh + by).astype(jnp.float32)

    corners = jnp.stack([x.reshape(-1), y.reshape(-1)], axis=-1)
    return corners, top_val.reshape(-1), valid.reshape(-1)


def corner_subpix(img, corners, valid, half=5, iters=20):
    """Subpixel refinement (cv::cornerSubPix, 5x5 window): iterate the
    gradient-structure centroid equation on an 11x11 neighbourhood.

    On TPU (and default parameters) this dispatches to the VMEM-resident
    pallas kernel (ops/pallas_subpix.py) — the vmapped per-corner gather
    formulation below costs ~8 ms/frame in the composite; the kernel is
    sub-millisecond. The jnp path remains the CPU/test reference."""
    import jax as _jax

    on_tpu = False
    try:
        on_tpu = _jax.default_backend() not in ("cpu",)
    except Exception:
        pass
    if on_tpu and half == 5 and iters == 20:
        from ..ops.pallas_subpix import subpix_pallas

        return subpix_pallas(img, corners.astype(jnp.float32), valid)

    from .pyramid import extract_patch

    size = 2 * half + 1
    dy = jnp.arange(size, dtype=jnp.float32) - half
    dx = jnp.arange(size, dtype=jnp.float32) - half
    # cv uses a separable weighting exp(-(d/half)^2 * 2)? it uses a box*gauss;
    # plain gaussian weights give equivalent sub-pixel behavior
    wx = jnp.exp(-((dx / half) ** 2))
    wy = jnp.exp(-((dy / half) ** 2))
    wgt = wy[:, None] * wx[None, :]

    def refine(c):
        def cond(carry):
            i, _, active = carry
            return (i < iters) & active

        def body(carry):
            i, pos, _ = carry
            patch = extract_patch(img, pos, half + 1)  # (size+2)^2 for grads
            gx = 0.5 * (patch[1:-1, 2:] - patch[1:-1, :-2])
            gy = 0.5 * (patch[2:, 1:-1] - patch[:-2, 1:-1])
            gxx = jnp.sum(wgt * gx * gx)
            gyy = jnp.sum(wgt * gy * gy)
            gxy = jnp.sum(wgt * gx * gy)
            bx = jnp.sum(wgt * gx * gx * dx[None, :]) + jnp.sum(wgt * gx * gy * dy[:, None])
            by = jnp.sum(wgt * gx * gy * dx[None, :]) + jnp.sum(wgt * gy * gy * dy[:, None])
            det = gxx * gyy - gxy * gxy
            safe = jnp.abs(det) > 1e-12
            ddx = jnp.where(safe, (gyy * bx - gxy * by) / jnp.where(safe, det, 1.0), 0.0)
            ddy = jnp.where(safe, (gxx * by - gxy * bx) / jnp.where(safe, det, 1.0), 0.0)
            step = jnp.clip(jnp.stack([ddx, ddy]), -1.0, 1.0)
            # cv TermCriteria(COUNT + EPS, 20, 0.01): apply the step, stop
            # once it fell below eps (tracking.cc:625)
            return (i + 1, pos + step, jnp.linalg.norm(step) >= 0.01)

        _, out, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), c, jnp.bool_(True)))
        return out

    refined = jax.vmap(refine)(corners)
    # keep refinement only if it stayed close (guards divergence)
    moved = jnp.linalg.norm(refined - corners, axis=-1)
    out = jnp.where((moved < half)[:, None], refined, corners)
    return jnp.where(valid[:, None], out, corners)
