"""Isolate _schur_sqrt internals; ONE stage per process (cross-stage
in-process timing contamination observed on the tunnel).
Usage: python scripts/dev/prof_marg6.py <stage> [--cpu]"""

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
    Hss, Hsl, hll, b, m, r = c
    Hss = Hss + 1e-9 * i * jnp.eye(NP)
    m_n = m[node_idx]
    m_l = m[NP:]
    A = Hss[node_idx][:, node_idx] * (m_n[:, None] * m_n[None, :])
    B = Hsl[node_idx] * (m_n[:, None] * m_l[None, :])
    cdiag = hll * m_l
    c_inv = jnp.where(cdiag > jnp.maximum(jnp.max(cdiag), 1.0) * 1e-30,
                      1.0 / jnp.where(cdiag > 0, cdiag, 1.0), 0.0)
    S = A - (B * c_inv[None, :]) @ B.T
    Ls, Ws, dm, _ = marg._equilibrated_chol_inv(S)
    S1 = (Ws.T @ Ws) / (dm[:, None] * dm[None, :])
    S_inv = 2.0 * S1 - S1 @ S @ S1
    return feed(c, S_inv)


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
    S_inv = jnp.eye(MC) * (1.0 + 1e-12 * i)
    Hp = Hrr - Ulc @ Ul.T - (W @ S_inv) @ W.T
    return feed(c, Hp)


def full(i, c):
    Hss, Hsl, hll, b, m, r = c
    J0, e0, H0, bp = marg._schur_sqrt(Hss + 1e-9 * i * jnp.eye(NP), Hsl,
                                      hll, b, m, r, node_idx, cfg)
    return feed(c, H0, e0)


STAGES = {"gathers": gathers, "s_chain": s_chain, "w_chain": w_chain, "full": full}


def main():
    name = sys.argv[1]
    body = STAGES[name]
    v = timed_loop(jax.jit(lambda c, n: jax.lax.fori_loop(0, n, body, c)), mk, 30)
    print(json.dumps({name: round(v * 1000, 3)}))


if __name__ == "__main__":
    main()
