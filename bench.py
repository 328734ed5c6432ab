"""Benchmark: sliding-window optimization throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric (current proxy for "urban38 replay frames/sec (track+BA) per chip"):
full two-pass sliding-window solves per second at the production VIO shape
(20 nodes, 512 landmarks, 2048 reprojection factors, 20 LM iterations split
5+15 — the reference's optimization budget, config/gvins.yaml:56-57).

vs_baseline: the replay target is >=10x real-time on urban38; at the
reference's ~4 keyframe-triggered optimizations per second of data, 10x
real-time needs ~40 solves/s. vs_baseline = solves_per_sec / 40.
(Will be replaced by the full track+BA frames/sec once the visual frontend
is wired into the bench.)
"""

import json
import time

import jax

jax.config.update("jax_enable_x64", True)


def main():
    import __graft_entry__ as ge
    from ic_gvins_tpu.solver import lm
    from ic_gvins_tpu.solver.problem import WindowConfig

    import jax.numpy as jnp
    import numpy as np

    cfg = WindowConfig(N=20, L=512, G=24, R=2048, with_earth=False)
    params, tables = ge._make_problem(cfg)
    # perturb away from the optimum so every solve does the full LM work
    rng = np.random.default_rng(0)
    params = params._replace(
        poses=params.poses.at[:, :3].add(jnp.asarray(rng.normal(0, 0.05, (cfg.N, 3)))),
        invdepths=params.invdepths + jnp.asarray(rng.normal(0, 0.01, cfg.L)),
    )

    step = jax.jit(lambda p, t: lm.solve_two_pass(p, t, cfg, 20)[0])

    # warmup/compile
    out = step(params, tables)
    jax.block_until_ready(out)

    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        out = step(params, tables)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n

    solves_per_sec = 1.0 / dt
    print(
        json.dumps(
            {
                "metric": "sliding-window two-pass solves/sec (20 nodes, 512 lm, 2048 reproj, 20 LM iters)",
                "value": round(solves_per_sec, 3),
                "unit": "solves/sec",
                "vs_baseline": round(solves_per_sec / 40.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
