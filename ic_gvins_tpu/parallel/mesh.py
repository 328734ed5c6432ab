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
