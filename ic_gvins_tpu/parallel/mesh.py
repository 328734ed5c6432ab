"""Multi-chip scaling: shard batches of independent estimation problems.

The reference's concurrency is pthreads on one CPU (SURVEY.md §2.9); the
TPU-native scaling axis is data parallelism over independent sequences /
windows / configurations: a batch of sliding-window problems is sharded over
a 1-D device mesh and each chip runs the full fixed-shape two-pass LM on its
shard — no cross-chip collectives on the critical path (the problems are
independent), so scaling is linear in chips and rides ICI only for the
initial shard placement.

This is the layer the fleet bench and `dryrun_multichip` exercise.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..solver import lm
from ..solver.problem import WindowConfig


def make_mesh(devices=None, axis="seq"):
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices).reshape(-1), (axis,))


def batched_two_pass(cfg: WindowConfig, num_iterations: int):
    """vmapped two-pass solve over a leading batch axis of problems."""

    def step(params_b, tables_b):
        out_params, out_tables, _ = jax.vmap(
            lambda p, t: lm.solve_two_pass(p, t, cfg, num_iterations)
        )(params_b, tables_b)
        return out_params, out_tables

    return step


def sharded_two_pass(mesh: Mesh, cfg: WindowConfig, num_iterations: int, axis="seq"):
    """jit the batched solve with the batch axis sharded over the mesh.

    Leading axis of every leaf is sharded; each device solves its shard's
    windows entirely locally."""
    step = batched_two_pass(cfg, num_iterations)
    shard = NamedSharding(mesh, P(axis))

    def place(tree):
        return jax.tree_util.tree_map(lambda a: jax.device_put(a, shard), tree)

    jitted = jax.jit(step, in_shardings=(shard, shard), out_shardings=(shard, shard))
    return jitted, place


def _placer(mesh: Mesh, axis: str):
    shard = NamedSharding(mesh, P(axis))

    def place(tree):
        return jax.tree_util.tree_map(lambda a: jax.device_put(a, shard), tree)

    return shard, place


def frontend_frame_fn(shape, levels=4, block=(2, 2, 4), min_distance=5,
                      ransac_thr=1.5):
    """One COMPLETE frontend frame (CLAHE + pyramid x2 + bidirectional LK +
    fundamental RANSAC + occupancy mask + blockwise Shi-Tomasi + subpixel)
    as a pure function of (img_prev, img_cur, pts, valid) — the device side
    of Tracker.track (vision/tracking.py) without the host bookkeeping.
    Batchable: vmap over a leading world axis, shard over the mesh
    (sharded_frontend). Replaces the reference's per-sequence process
    parallelism (one IC-GVINS process per KAIST sequence) with SPMD."""
    H, W = shape
    br, bc, pb = block

    from ..vision import features, lk as lkm, pyramid, ransac

    def frame(img_prev, img_cur, pts, valid):
        pyr_p = pyramid.build_pyramid(pyramid.clahe(img_prev), levels)
        pyr_c = pyramid.build_pyramid(pyramid.clahe(img_cur), levels)
        nxt, ok = lkm.track_bidirectional(pyr_p, pyr_c, pts, pts, valid,
                                          levels=levels)
        inl, _ = ransac.fundamental_ransac(pts, nxt, ok.astype(jnp.float64),
                                           ransac_thr)
        ok = ok & inl
        mask = features.occupancy_mask(nxt, ok.astype(jnp.float32), (H, W),
                                       min_distance)
        corners, _resp, cvalid = features.detect_blockwise(
            pyr_c[0], mask, jnp.zeros(br * bc, jnp.int32), block_rows=br,
            block_cols=bc, per_block=pb, min_distance=min_distance)
        corners = features.corner_subpix(
            pyr_c[0], corners.astype(jnp.float32), cvalid)
        return nxt, ok, corners, cvalid

    return frame


def sharded_frontend(mesh: Mesh, shape, axis="seq", **kw):
    """(jitted, place): the full frontend frame vmapped over worlds with the
    world axis sharded over the mesh — each device tracks its own camera
    stream end to end, no collectives."""
    frame = frontend_frame_fn(shape, **kw)
    shard, place = _placer(mesh, axis)
    jitted = jax.jit(jax.vmap(frame), in_shardings=shard, out_shardings=shard)
    return jitted, place


def sharded_marg_step(mesh: Mesh, cfg: WindowConfig, axis="seq"):
    """(jitted, place): one full marginalization event (factor selection +
    structured Schur + prior shift — engine/estimator._marg_jit) per world,
    worlds sharded over the mesh."""
    from ..factors import marginalization as marg

    def one(params, tables):
        mt, mask, _lm_m = marg.select_marg_factors(tables, cfg, 1, 0)
        return marg.shift_prior(marg.marginalize(params, mt, mask, cfg), cfg, 1)

    shard, place = _placer(mesh, axis)
    jitted = jax.jit(jax.vmap(one), in_shardings=(shard, shard),
                     out_shardings=shard)
    return jitted, place


def sharded_ins_step(mesh: Mesh, int_params, with_earth=True, axis="seq"):
    """(jitted, place): per-world INS work — one fused preintegration scan +
    one mechanization chunk — worlds sharded over the mesh."""
    from ..ins import mechanization as mech
    from ..ins import preintegration as pre

    def one(imu, st, gravity, iewn):
        summ = pre.preintegrate(int_params, imu, st, with_earth=with_earth)
        mcfg = mech.MechConfig(gravity=gravity, iewn=iewn,
                               iswithearth=with_earth)
        out, _ = mech.mechanize_scan(mcfg, st, imu)
        return summ, out

    shard, place = _placer(mesh, axis)
    jitted = jax.jit(jax.vmap(one), in_shardings=shard, out_shardings=shard)
    return jitted, place
