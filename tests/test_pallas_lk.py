"""Pallas LK kernel vs the XLA gather path (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from test_vision_kernels import synth_image, shift_image
from ic_gvins_tpu.vision import features
from ic_gvins_tpu.vision.lk import _track_level
from ic_gvins_tpu.ops.pallas_lk import lk_level_pallas


def test_pallas_matches_xla_level():
    img0 = synth_image(H=240, W=320, seed=7)
    dx, dy = 3.37, -2.21
    img1 = shift_image(img0, dx, dy)

    corners, _, valid = features.detect_blockwise(
        jnp.asarray(img0), jnp.ones((240, 320)), jnp.zeros(4, jnp.int32),
        block_rows=2, block_cols=2, per_block=20, min_distance=9,
    )
    inb = (
        (corners[:, 0] > 25) & (corners[:, 0] < 295)
        & (corners[:, 1] > 25) & (corners[:, 1] < 215)
    )
    valid = valid & inb
    N = 128
    pts = jnp.zeros((N, 2), jnp.float32).at[: corners.shape[0]].set(corners.astype(jnp.float32))
    v = jnp.zeros(N, bool).at[: corners.shape[0]].set(valid)

    i0 = jnp.asarray(img0, jnp.float32)
    i1 = jnp.asarray(img1, jnp.float32)
    out_p, ok_p = lk_level_pallas(i0, i1, pts, pts, v, interpret=True)
    out_x, ok_x = _track_level(i0, i1, pts, pts, v)

    both = np.asarray(ok_p) & np.asarray(ok_x)
    assert both.sum() >= 20
    d = np.linalg.norm(np.asarray(out_p)[both] - np.asarray(out_x)[both], axis=1)
    assert np.median(d) < 1e-3, f"median endpoint diff {np.median(d)}"

    flow = np.asarray(out_p)[both] - np.asarray(pts)[both]
    err = np.linalg.norm(flow - [dx, dy], axis=1)
    assert np.median(err) < 0.1, f"median flow err {np.median(err)}"


def test_batched_matches_xla_level():
    """The batched-MXU sandwich tracker must agree with the per-feature
    gather reference on interior features."""
    from ic_gvins_tpu.vision.lk import _track_level_batched

    img0 = synth_image(H=240, W=320, seed=3)
    dx, dy = 2.6, -1.4
    img1 = shift_image(img0, dx, dy)

    corners, _, valid = features.detect_blockwise(
        jnp.asarray(img0), jnp.ones((240, 320)), jnp.zeros(4, jnp.int32),
        block_rows=2, block_cols=2, per_block=20, min_distance=9,
    )
    inb = (
        (corners[:, 0] > 25) & (corners[:, 0] < 295)
        & (corners[:, 1] > 25) & (corners[:, 1] < 215)
    )
    valid = valid & inb
    N = 128
    pts = jnp.zeros((N, 2), jnp.float32).at[: corners.shape[0]].set(corners.astype(jnp.float32))
    v = jnp.zeros(N, bool).at[: corners.shape[0]].set(valid)

    i0 = jnp.asarray(img0, jnp.float32)
    i1 = jnp.asarray(img1, jnp.float32)
    out_b, ok_b = _track_level_batched(i0, i1, pts, pts, v)
    out_x, ok_x = _track_level(i0, i1, pts, pts, v)

    both = np.asarray(ok_b) & np.asarray(ok_x)
    assert both.sum() >= 20
    d = np.linalg.norm(np.asarray(out_b)[both] - np.asarray(out_x)[both], axis=1)
    assert np.median(d) < 1e-2, f"median endpoint diff {np.median(d)}"
    flow = np.asarray(out_b)[both] - np.asarray(pts)[both]
    err = np.linalg.norm(flow - np.array([dx, dy]), axis=1)
    assert np.median(err) < 0.15, f"median flow err {np.median(err)}"


def test_subpix_pallas_matches_jnp():
    """pallas subpixel refinement (interpret mode) vs the jnp reference."""
    from ic_gvins_tpu.ops.pallas_subpix import subpix_pallas

    img0 = synth_image(H=240, W=320, seed=3)
    corners, _, valid = features.detect_blockwise(
        jnp.asarray(img0), jnp.ones((240, 320)), jnp.zeros(4, jnp.int32),
        block_rows=2, block_cols=2, per_block=20, min_distance=9,
    )
    inb = (
        (corners[:, 0] > 25) & (corners[:, 0] < 295)
        & (corners[:, 1] > 25) & (corners[:, 1] < 215)
    )
    valid = valid & inb
    img = jnp.asarray(img0, jnp.float32)
    pts = corners.astype(jnp.float32)

    ref = features.corner_subpix(img, pts, valid)  # jnp path on CPU
    out = subpix_pallas(img, pts, valid, interpret=True)

    vb = np.asarray(valid)
    d = np.linalg.norm(np.asarray(out)[vb] - np.asarray(ref)[vb], axis=1)
    # both refine off the integer corner; they must agree to a small
    # fraction of a pixel (different border/sampling details)
    assert np.median(d) < 0.05, f"median subpix diff {np.median(d)}"
    moved = np.linalg.norm(np.asarray(out)[vb] - np.asarray(pts)[vb], axis=1)
    assert (moved < 5.0).all()
