"""Pallas TPU kernel for the CLAHE per-pixel LUT apply + bilinear blend.

CLAHE's apply stage evaluates, for every pixel p of tile t, the 9
neighbor-tile transfer functions at the pixel's gray value and blends them
with separable bilinear weights:

    out[p] = sum_n w9[t, n, p] * LUT_n[t, v[p]]        (n over the 3x3)

The histogram/LUT build is cheap in XLA (~0.1 ms via the 16x16 nibble
outer-product — vision/pyramid.py), but EVERY XLA formulation of this
apply measured 2.5-5 ms at 1278x1022: the per-pixel table lookup only
vectorizes as a one-hot contraction, and its intermediates either carry a
small minor dim (lane-padded 8-14x) or a (T, 16, 9, P) reduce operand that
XLA materializes in HBM. Here the lookup never leaves VMEM:

  per grid step (a group of tiles), per tile:
    - build the hi/lo nibble one-hots (16, P) by broadcast compare;
    - ONE small MXU matmul (144, 16) @ (16, P) evaluates all 9 LUTs at all
      pixels' hi nibble -> g (144, P) f32 in VMEM (the only >1 MB
      intermediate, never written to HBM);
    - the lo nibble selects within each contiguous 16-row block of g by a
      masked sublane reduce, and the 9 selected rows blend with w9.

HBM traffic: v (i32) + w9 (f32) in, image out — ~70 MB/frame vs the
~0.8-1.6 GB the XLA forms moved.

Parity: bf16 LUT entries (cv's CLAHE LUT is uint8 — the ~+-0.5 gray bf16
quantization is the same budget), f32 blend. Matches the jnp fallback in
vision/pyramid.py to ~1e-2 gray (tests/test_vision_kernels.py runs the
full-precision fallback on CPU against the direct gather formulation).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TPG = 24  # tiles per grid step — must be a multiple of 8 (the (TPG, P)
          # blocks' sublane dim); 441 tiles pad to 456 = 19 steps


def _kernel(v_ref, lut_ref, w9_ref, out_ref):
    nib16 = jax.lax.broadcasted_iota(jnp.int32, (16, 1), 0)
    for i in range(TPG):
        v = v_ref[i, :][None, :]                       # (1, P) i32
        oh_hi = ((v >> 4) == nib16).astype(jnp.bfloat16)   # (16, P)
        oh_lo = ((v & 15) == nib16).astype(jnp.float32)

        g = jax.lax.dot_general(
            lut_ref[i], oh_hi, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # (144, P)

        acc = jnp.zeros((1, v.shape[1]), jnp.float32)
        for n in range(9):
            sel = jnp.sum(g[n * 16:(n + 1) * 16, :] * oh_lo,
                          axis=0, keepdims=True)       # (1, P)
            acc = acc + w9_ref[i, n, :][None, :] * sel
        out_ref[i, :] = acc[0, :]


@functools.partial(jax.jit, static_argnames=("interpret",))
def clahe_apply_pallas(v_t, lut_nl, w9, interpret=False):
    """v_t: (T, P) i32 tile-major pixel values; lut_nl: (T, 144, 16) bf16
    with rows n*16+lo and columns hi; w9: (T, 9, P) f32 blend weights.
    Returns (T, P) f32 equalized pixels. T must be a multiple of TPG."""
    T, P = v_t.shape
    Pp = -(-P // 128) * 128
    if Pp != P:
        v_t = jnp.pad(v_t, ((0, 0), (0, Pp - P)))
        w9 = jnp.pad(w9, ((0, 0), (0, 0), (0, Pp - P)))
    Tp = -(-T // TPG) * TPG
    if Tp != T:  # pad to the tile-group grid; padded tiles are sliced away
        v_t = jnp.pad(v_t, ((0, Tp - T), (0, 0)))
        lut_nl = jnp.pad(lut_nl, ((0, Tp - T), (0, 0), (0, 0)))
        w9 = jnp.pad(w9, ((0, Tp - T), (0, 0), (0, 0)))

    grid_spec = pl.GridSpec(
        grid=(Tp // TPG,),
        in_specs=[
            pl.BlockSpec((TPG, Pp), lambda t: (t, 0)),
            pl.BlockSpec((TPG, 144, 16), lambda t: (t, 0, 0)),
            pl.BlockSpec((TPG, 9, Pp), lambda t: (t, 0, 0)),
        ],
        out_specs=pl.BlockSpec((TPG, Pp), lambda t: (t, 0)),
    )

    # trace with x64 disabled: block index maps otherwise emit i64 literals
    # that mosaic cannot legalize (see ops/pallas_lk.py)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            _kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((Tp, Pp), jnp.float32),
            interpret=interpret,
        )(v_t.astype(jnp.int32), lut_nl.astype(jnp.bfloat16),
          w9.astype(jnp.float32))

    return out[:T, :P]
