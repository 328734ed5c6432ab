"""Checkpoint/resume of the sliding-window estimator state.

The reference has no state serialization (SURVEY.md §5.4); here the whole
window is a fixed-shape pytree + small host mirrors, so checkpointing is one
npz file: node states/times, GNSS entries, IMU segments, preintegration
summaries, marginalization prior, extrinsics. Restoring reproduces the
estimator mid-run bit-for-bit (deterministic replay can resume from the
checkpoint's stream position).
"""

import numpy as np

import jax
import jax.numpy as jnp

from ..core.types import ImuBatch
from ..ins.preintegration import PreintSummary
from ..solver.problem import MargPrior, PreintTable, WindowParams
from .estimator import GnssEntry, SlidingWindowEstimator


def _flatten_tree(prefix, tree, out):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    for i, leaf in enumerate(leaves):
        out[f"{prefix}{i}"] = np.asarray(leaf)
    return treedef


def save_checkpoint(path, est: SlidingWindowEstimator, extra=None):
    out = dict(
        n_nodes=np.asarray(est.n_nodes),
        times=est.times,
        poses=est.poses,
        mixes=est.mixes,
        ext=est.ext,
        td=np.asarray(est.td),
        gnss=np.asarray(
            [[e.time, *e.blh, *e.std] for e in est.gnss_entries], np.float64
        ).reshape(-1, 7),
        has_prior_cfg=np.asarray(1 if est.prior_cfg is not None else 0),
        has_marg=np.asarray(1 if est.marg_prior is not None else 0),
    )
    if est.prior_cfg is not None:
        for k, v in est.prior_cfg.items():
            out[f"prior_{k}"] = np.asarray(v)
    _flatten_tree("preint_", est.preint_table, out)
    _flatten_tree("segs_", est.seg_store, out)
    if est.marg_prior is not None:
        _flatten_tree("marg_", est.marg_prior, out)
    # host numpy segment list (object array via lengths + concat)
    seg_valid = np.asarray([1 if s is not None else 0 for s in est.segments_np])
    out["seg_valid"] = seg_valid
    if extra:
        for k, v in extra.items():
            out[f"extra_{k}"] = np.asarray(v)
    np.savez_compressed(path, **out)


def _unflatten(prefix, template, data, numpy_leaves=False):
    leaves, treedef = jax.tree_util.tree_flatten(template)
    conv = np.array if numpy_leaves else jnp.asarray
    new = [conv(data[f"{prefix}{i}"]) for i in range(len(leaves))]
    return jax.tree_util.tree_unflatten(treedef, new)


def load_checkpoint(path, est: SlidingWindowEstimator):
    """Restore a checkpoint into an estimator constructed with the SAME
    WindowConfig/params. Returns the dict of `extra_` entries."""
    data = np.load(path)
    est.n_nodes = int(data["n_nodes"])
    est.times = data["times"].copy()
    est.poses = data["poses"].copy()
    est.mixes = data["mixes"].copy()
    est.ext = data["ext"].copy()
    est.td = float(data["td"])
    est.gnss_entries = [GnssEntry(r[0], r[1:4], r[4:7]) for r in data["gnss"]]
    # interval tables are writable numpy host mirrors (see estimator)
    est.preint_table = _unflatten(
        "preint_", PreintTable.empty(est.wcfg), data, numpy_leaves=True)
    est.seg_store = _unflatten(
        "segs_", ImuBatch.zeros((est.wcfg.P, est.S)), data, numpy_leaves=True)
    if int(data["has_marg"]):
        est.marg_prior = _unflatten("marg_", MargPrior.empty(est.wcfg), data)
    else:
        est.marg_prior = None
    if int(data["has_prior_cfg"]):
        est.prior_cfg = {
            k: data[f"prior_{k}"].copy()
            for k in ("pose_prior", "pose_prior_std", "mix_prior", "mix_prior_std")
        }
    else:
        est.prior_cfg = None
    # reconstruct host segment mirrors from the device store
    seg_valid = data["seg_valid"]
    segs = {f: np.asarray(getattr(est.seg_store, f)) for f in ImuBatch._fields}
    est.segments_np = [
        ({f: segs[f][k].copy() for f in ImuBatch._fields} if seg_valid[k] else None)
        for k in range(est.wcfg.P)
    ]
    return {k[6:]: data[k] for k in data.files if k.startswith("extra_")}
