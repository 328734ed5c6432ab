"""Isolate marginalization._schur_reduce internals on the live backend.

Methodology notes (hard-won on the tunneled TPU):
  * ONE stage per process — cross-stage in-process timing contamination has
    been observed (a stage measured alongside others can read 10-300x its
    one-stage-per-process value);
  * fresh inputs per timed call (make_init(seed)) — repeated dispatches
    with IDENTICAL (executable, args) are served from a tunnel cache
    (~0.02 ms, fake);
  * cost = (t(k) - t(1)) / (k - 1) with the k iterations chained ON DEVICE
    in one fori_loop so the ~20 ms host round trip cancels.

Usage: python scripts/dev/prof_marg6.py <stage> [--cpu]
Stages: gathers, s_chain, w_chain, full
Historical numbers (2026-08, TPU v5 lite, pre-information-form refactor):
the old sqrt path measured full=24.2 ms — s_chain (f64 blocked chol at 90)
7.5 ms + _ridge_chol_sqrt (f64 blocked chol at 307) ~16 ms; f64 MATMULS
were never the problem (w_chain, 96 MFLOP, 0.8 ms).
"""

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, _REPO)

import jax

jax.config.update("jax_enable_x64", True)
if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp
import numpy as np

from ic_gvins_tpu.factors import marginalization as marg
from ic_gvins_tpu.solver.problem import WindowConfig

cfg = WindowConfig(N=20, L=512, G=24, R=2048, with_earth=True)
NP, L, D = cfg.lm_off, cfg.L, cfg.D
node_idx = jnp.arange(cfg.marg_cap * cfg.node_dim, dtype=jnp.int32)
MC = cfg.marg_cap * cfg.node_dim  # 90


def timed_loop(run, make_init, k, reps=3):
    kk = jnp.int32(k)
    one = jnp.int32(1)
    jax.block_until_ready(run(make_init(0), kk))
    jax.block_until_ready(run(make_init(1), one))
    tks, t1s = [], []
    for r in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run(make_init(10 + 2 * r), kk))
        tks.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        jax.block_until_ready(run(make_init(11 + 2 * r), one))
        t1s.append(time.perf_counter() - t0)
    return max((min(tks) - min(t1s)) / (k - 1), 1e-9)


def mk(seed):
    r = np.random.default_rng(seed)
    J = r.normal(0, 1, (NP + L, NP))
    Hss = jnp.asarray(J.T @ J + NP * np.eye(NP))
    Hsl = jnp.asarray(r.normal(0, 1, (NP, L)))
    hll = jnp.asarray(r.uniform(1.0, 2.0, L))
    b = jnp.asarray(r.normal(0, 1, D))
    m = np.zeros(D)
    m[: cfg.node_dim] = 1.0
    m[NP : NP + 40] = 1.0
    rmask = np.zeros(D)
    rmask[cfg.node_dim : NP] = 1.0
    return (Hss, Hsl, hll, b, jnp.asarray(m), jnp.asarray(rmask))


def feed(c, *outs):
    Hss = c[0]
    for o in outs:
        Hss = Hss + 1e-18 * jnp.sum(o)
    return (Hss, *c[1:])


def gathers(i, c):
    Hss, Hsl, hll, b, m, r = c
    Hss = Hss + 1e-9 * i * jnp.eye(NP)
    A = Hss[node_idx][:, node_idx]
    B = Hsl[node_idx]
    Un = Hss[:, node_idx]
    xb = b[:NP][node_idx]
    return feed(c, A, B, Un, xb)


def s_chain(i, c):
    """Marged-block pseudo-inverse application (f32 chol seed + refined
    solves + two Newton correction steps), as in _schur_reduce."""
    Hss, Hsl, hll, b, m, r = c
    Hss = Hss + 1e-9 * i * jnp.eye(NP)
    m_n = m[node_idx]
    m_l = m[NP:]
    rN = r[:NP]
    A = Hss[node_idx][:, node_idx] * (m_n[:, None] * m_n[None, :])
    B = Hsl[node_idx] * (m_n[:, None] * m_l[None, :])
    cdiag = hll * m_l
    c_inv = jnp.where(cdiag > jnp.maximum(jnp.max(cdiag), 1.0) * 1e-30,
                      1.0 / jnp.where(cdiag > 0, cdiag, 1.0), 0.0)
    S = A - (B * c_inv[None, :]) @ B.T
    Un = Hss[:, node_idx] * (rN[:, None] * m_n[None, :])
    Ul = Hsl * (rN[:, None] * m_l[None, :])
    W = Un - (Ul * c_inv[None, :]) @ B.T
    Ls, dS, Sn, _ = marg._equilibrated_chol32(S)
    rhs = W.T / dS[:, None]

    def x1_apply(Z):
        Y = marg._refined_solve(Ls, Sn, Z)
        return 2.0 * Y - marg._refined_solve(Ls, Sn, Sn @ Y)

    Y1 = x1_apply(rhs)
    Y2 = x1_apply(2.0 * rhs - Sn @ Y1)
    return feed(c, Y2)


def w_chain(i, c):
    Hss, Hsl, hll, b, m, r = c
    Hss = Hss + 1e-9 * i * jnp.eye(NP)
    rN = r[:NP]
    m_n = m[node_idx]
    m_l = m[NP:]
    B = Hsl[node_idx] * (m_n[:, None] * m_l[None, :])
    cdiag = hll * m_l
    c_inv = jnp.where(cdiag > jnp.maximum(jnp.max(cdiag), 1.0) * 1e-30,
                      1.0 / jnp.where(cdiag > 0, cdiag, 1.0), 0.0)
    Un = Hss[:, node_idx] * (rN[:, None] * m_n[None, :])
    Ul = Hsl * (rN[:, None] * m_l[None, :])
    Ulc = Ul * c_inv[None, :]
    W = Un - Ulc @ B.T
    Hrr = Hss * (rN[:, None] * rN[None, :])
    G = W.T * (1.0 + 1e-12 * i)
    Hp = Hrr - Ulc @ Ul.T - W @ G
    return feed(c, Hp)


def full(i, c):
    Hss, Hsl, hll, b, m, r = c
    H0, bp, c0 = marg._schur_reduce(Hss + 1e-9 * i * jnp.eye(NP), Hsl,
                                    hll, b, m, r, node_idx, cfg)
    return feed(c, H0, bp, c0)


STAGES = {"gathers": gathers, "s_chain": s_chain, "w_chain": w_chain, "full": full}


def main():
    name = sys.argv[1]
    body = STAGES[name]
    v = timed_loop(jax.jit(lambda c, n: jax.lax.fori_loop(0, n, body, c)), mk, 30)
    print(json.dumps({name: round(v * 1000, 3)}))


if __name__ == "__main__":
    main()
