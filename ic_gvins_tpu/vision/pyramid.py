"""Image preprocessing kernels: CLAHE, Gaussian pyramid, bilinear sampling.

Replaces cv::createCLAHE(3.0, 21x21) (tracking.cc:63, 139) and the implicit
pyramid construction inside cv::calcOpticalFlowPyrLK / cv::pyrDown. All ops
are f32 batched jnp running on the VPU; sampling is gather-based and vmaps
over feature sets.
"""

import jax
import jax.numpy as jnp

# cv::pyrDown 5-tap kernel
_PYR_K = jnp.array([1.0, 4.0, 6.0, 4.0, 1.0], jnp.float32) / 16.0


from functools import lru_cache


@lru_cache(maxsize=None)
def _decim_matrix(n, n2):
    """(n+4, n2) banded decimating-blur operator: column j holds the 5-tap
    cv::pyrDown kernel centered at source index 2j (in the 2-padded frame).
    Cached as NUMPY (a cached device array leaks tracers when the first
    call happens inside a trace); the jnp conversion at the use site folds
    into a compile-time constant."""
    import numpy as np

    M = np.zeros((n + 4, n2), np.float32)
    k = np.asarray(_PYR_K)
    for j in range(n2):
        M[2 * j : 2 * j + 5, j] = k
    return M


def pyr_down(img):
    """One pyramid level down: 5x5 Gaussian (separable) + 2x decimation.

    Written as two banded-matrix MXU matmuls (rows then columns): the
    round-4 strided-slice form (p[k::2] multiply-adds) forces five
    lane-strided relayouts per axis on TPU — measured as the bulk of a
    ~5 ms/frame pyramid cost once DCE-proof benchmarks landed (round 5).
    The dense banded operator is ~1 GFLOP at 1278x1022, trivial on the
    MXU, and numerically identical modulo f32 summation order."""
    img = img.astype(jnp.float32)
    H, W = img.shape
    H2, W2 = (H - 1) // 2 + 1, (W - 1) // 2 + 1
    p = jnp.pad(img, ((2, 2), (2, 2)), mode="edge")
    v = jnp.asarray(_decim_matrix(H, H2)).T @ p   # (H2, W+4)
    return v @ jnp.asarray(_decim_matrix(W, W2))  # (H2, W2)


def build_pyramid(img, levels=4):
    """[level0 (full res), level1, ...] — levels fixed at trace time."""
    pyr = [img.astype(jnp.float32)]
    for _ in range(levels - 1):
        pyr.append(pyr_down(pyr[-1]))
    return pyr


def bilinear_sample(img, xy):
    """Sample img (H,W) at float coords xy (...,2) [x, y], edge-clamped."""
    H, W = img.shape
    x = jnp.clip(xy[..., 0], 0.0, W - 1.000001)
    y = jnp.clip(xy[..., 1], 0.0, H - 1.000001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    fx = (x - x0).astype(img.dtype)
    fy = (y - y0).astype(img.dtype)
    v00 = img[y0, x0]
    v01 = img[y0, x1]
    v10 = img[y1, x0]
    v11 = img[y1, x1]
    return (
        v00 * (1 - fy) * (1 - fx)
        + v01 * (1 - fy) * fx
        + v10 * fy * (1 - fx)
        + v11 * fy * fx
    )


def extract_patch(img, center_xy, half):
    """(2*half+1)^2 bilinear patch around center (x, y). vmap over centers.

    TPU-native formulation: ONE dynamic_slice of a (size+1)^2 block at the
    integer corner + a 4-way shifted blend at the (shared) fractional offset
    — dense contiguous loads instead of a 529-index gather per patch. Near
    the image border the slice window shifts inward (features there are
    culled by the LK border status anyway)."""
    size = 2 * half + 1
    H, W = img.shape
    x, y = center_xy[0], center_xy[1]
    ix = jnp.floor(x)
    iy = jnp.floor(y)
    fx = (x - ix).astype(img.dtype)
    fy = (y - iy).astype(img.dtype)
    x0 = jnp.clip(ix.astype(jnp.int32) - half, 0, W - (size + 1))
    y0 = jnp.clip(iy.astype(jnp.int32) - half, 0, H - (size + 1))
    raw = jax.lax.dynamic_slice(img, (y0, x0), (size + 1, size + 1))
    p00 = raw[:-1, :-1]
    p01 = raw[:-1, 1:]
    p10 = raw[1:, :-1]
    p11 = raw[1:, 1:]
    return (
        (1 - fy) * (1 - fx) * p00
        + (1 - fy) * fx * p01
        + fy * (1 - fx) * p10
        + fy * fx * p11
    )


def _tile_offset_weights(n, tn, tsize):
    """(n, 3) bilinear LUT-blend weights over tile offsets {-1, 0, +1}
    relative to each pixel's own tile (separable row/col factor)."""
    yy = jnp.arange(n, dtype=jnp.float32)
    tf = jnp.clip((yy - tsize / 2.0 + 0.5) / tsize, 0.0, tn - 1.000001)
    y0 = jnp.floor(tf).astype(jnp.int32)
    f = tf - y0
    own = (jnp.arange(n) // tsize).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, tn - 1)
    w = jnp.zeros((n, 3), jnp.float32)
    for yi, wi in ((y0, 1.0 - f), (y1, f)):
        off = jnp.clip(yi - own, -1, 1) + 1
        w = w.at[jnp.arange(n), off].add(wi.astype(jnp.float32))
    return w


def clahe(img, clip_limit=3.0, tile=21, nbins=256):
    """Contrast-limited adaptive histogram equalization.

    Equivalent behavior to cv::CLAHE(clipLimit=3.0, tileGrid=(21,21)) —
    per-tile clipped histogram equalization with bilinear interpolation of
    the per-tile transfer functions (tracking.cc:63, 139). Input
    uint8-valued (0..255) image (any float/int dtype); output f32 in
    [0, 255], accurate to ±0.5 gray level (the reference's uint8 rounding).

    TPU-native formulation — no gathers anywhere, and every per-pixel array
    keeps PIXELS ON THE MINOR (lane) AXIS. Pixel values are split into
    16x16 (hi, lo) nibbles: the histogram is the batched outer-product
    contraction of the two transposed one-hots on the MXU
    (hist2d[t,h,l] = #pixels with value 16h+l, exact in f32), and the
    9-neighbor LUT lookup contracts hi on the MXU then lo as a fused
    broadcast-multiply reduce. Round-5 lesson: the previous form
    materialized a (T, P, 256) bf16 one-hot (~675 MB x 3 HBM passes at
    1278x1022, ~2.5 ms), and an intermediate (T, P, 16, 9) rewrite was no
    better — minor dims of 9/16 pad to 128 lanes, so one einsum alone cost
    ~4.6 ms. The transposed (…, P) layout removes both (~4x total).
    """
    img = jnp.clip(img.astype(jnp.float32), 0.0, 255.0)
    H, W = img.shape
    ty, tx = tile, tile
    th, tw = -(-H // ty), -(-W // tx)  # tile size (ceil)
    Hp, Wp = th * ty, tw * tx
    padded = jnp.pad(img, ((0, Hp - H), (0, Wp - W)), mode="edge")

    v = jnp.clip(padded.astype(jnp.int32), 0, nbins - 1)
    v = v.reshape(ty, th, tx, tw).transpose(0, 2, 1, 3).reshape(ty * tx, th * tw)
    nib = jax.lax.broadcasted_iota(jnp.int32, (1, 16, 1), 1)
    a_hi = ((v[:, None, :] >> 4) == nib).astype(jnp.bfloat16)  # (T, 16, P)
    a_lo = ((v[:, None, :] & 15) == nib).astype(jnp.bfloat16)  # (T, 16, P)
    hist2d = jax.lax.dot_general(
        a_hi, a_lo, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                    # (T, 16, 16)
    hist = hist2d.reshape(ty * tx, nbins)

    # clip + redistribute (cv semantics: clipLimit scaled by tile area / bins)
    limit = jnp.maximum(clip_limit * (th * tw) / nbins, 1.0)
    excess = jnp.sum(jnp.maximum(hist - limit, 0.0), axis=1, keepdims=True)
    hist = jnp.minimum(hist, limit) + excess / nbins

    cdf = jnp.cumsum(hist, axis=1)
    # normalize to [0, 255]
    lut = (cdf - cdf[:, :1]) / jnp.maximum(cdf[:, -1:] - cdf[:, :1], 1.0) * 255.0
    lut = lut.reshape(ty, tx, nbins)

    # all 9 neighbor-LUT lookups per pixel via the nibble split: one
    # hi-nibble MXU matmul against the (T, 16, 16*9) LUT stack (bf16 — the
    # same quantization cv's uint8 LUT carries, ~+-0.5 gray), then the
    # lo-nibble reduce as a fused multiply over the SECOND-minor axis —
    # the (T, 16, 9, P) product never hits HBM at lane width.
    lutp = jnp.pad(lut, ((1, 1), (1, 1), (0, 0)), mode="edge")
    lut9 = jnp.stack(
        [
            jax.lax.dynamic_slice(lutp, (dy, dx, 0), (ty, tx, nbins)).reshape(ty * tx, nbins)
            for dy in range(3)
            for dx in range(3)
        ],
        axis=-1,
    ).astype(jnp.bfloat16)                                     # (T, 256, 9)
    lut_hl = lut9.reshape(ty * tx, 16, 16 * 9)                 # bin = 16*hi + lo
    # lo-select + separable bilinear blend. On TPU this runs as a Pallas
    # kernel (ops/pallas_clahe.py): every XLA formulation of the
    # select+blend measured 2.5-5 ms at 1278x1022 (reduce/einsum forms
    # materialize a (T,16,9,P) or lane-padded (T,P,16,9) intermediate; a
    # fully unrolled 144-term select chain was 3x worse again). The jnp
    # fallback below keeps CPU/tests exact.
    wrow = _tile_offset_weights(Hp, ty, th).reshape(ty, th, 3)
    wcol = _tile_offset_weights(Wp, tx, tw).reshape(tx, tw, 3)
    w9 = (wrow.transpose(0, 2, 1).reshape(ty, 1, 3, 1, th, 1)
          * wcol.transpose(0, 2, 1).reshape(1, tx, 1, 3, 1, tw))
    w9 = w9.reshape(ty * tx, 9, th * tw)                       # (T, 9, P) f32

    on_tpu = False
    try:
        on_tpu = jax.default_backend() not in ("cpu",)
    except Exception:
        pass
    if on_tpu:
        from ..ops.pallas_clahe import clahe_apply_pallas

        # rows n*16+lo, cols hi — the kernel's per-n blocks are contiguous
        lut_nl = (lut9.reshape(ty * tx, 16, 16, 9)
                  .transpose(0, 3, 2, 1).reshape(ty * tx, 144, 16))
        out = clahe_apply_pallas(v, lut_nl, w9)
    else:
        g = jax.lax.dot_general(
            lut_hl, a_hi, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.bfloat16)               # (T, 16*9, P)
        g4 = g.reshape(ty * tx, 16, 9, th * tw)                # [t, lo, n, p]
        a_lo = ((v[:, None, :] & 15) == nib).astype(jnp.bfloat16)
        out = jnp.sum(
            g4.astype(jnp.float32) * a_lo[:, :, None, :].astype(jnp.float32)
            * w9[:, None, :, :],
            axis=(1, 2))                                       # (T, P)
    out = out.reshape(ty, tx, th, tw)
    return out.transpose(0, 2, 1, 3).reshape(Hp, Wp)[:H, :W]
