"""Bisect build_normal_blocks cost on the TPU (dev tool)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

import __graft_entry__ as ge
from ic_gvins_tpu.factors import basic, preint_factor
from ic_gvins_tpu.factors.robust import correct_blocks
from ic_gvins_tpu.solver.problem import (
    MIX_DIM, NODE_DIM, POSE_LOCAL, WindowConfig, _jtj, _jtr,
    _marg_rot_correction, _dx_cols, _dxT_rows, _dxT_vec, _reproj_blocks,
)

cfg = WindowConfig(N=20, L=512, G=24, R=2048, with_earth=False)
params0, tables = ge._make_problem(cfg)


def timed(run, make_init, k=100, reps=3):
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
    rr = np.random.default_rng(seed)
    return params0._replace(
        poses=params0.poses.at[:, :3].add(jnp.asarray(rr.normal(0, 0.05, (cfg.N, 3)))),
        invdepths=params0.invdepths + jnp.asarray(rr.normal(0, 0.01, cfg.L)),
    )


def loop(stage):
    @jax.jit
    def run(params, n):
        def body(i, p):
            out = stage(p)
            return p._replace(td=p.td + out * 1e-30)
        return jax.lax.fori_loop(0, n, body, params)
    return run


def gnss_stage(params):
    t = tables.gnss
    poses = params.poses[t.idx]
    rg = jax.vmap(basic.gnss_residual, in_axes=(0, 0, 0, None))(poses, t.blh, t.std, tables.antlever)
    Jg = jax.vmap(basic.gnss_jacobian, in_axes=(0, 0, None))(poses, t.std, tables.antlever)
    rg, Jg = correct_blocks(rg, Jg, t.robust > 0)
    w = t.valid
    Ds = cfg.lm_off
    Hss = jnp.zeros((Ds, Ds))
    b = jnp.zeros(cfg.D)
    cols = (t.idx * NODE_DIM)[:, None] + jnp.arange(POSE_LOCAL, dtype=jnp.int32)[None, :]
    Hss = Hss.at[cols[:, :, None], cols[:, None, :]].add(_jtj(Jg, Jg, w))
    b = b.at[cols].add(-_jtr(Jg, rg, w))
    return jnp.sum(Hss) + jnp.sum(b)


def preint_stage(params):
    t = tables.preint
    pose0, mix0 = params.poses[t.idx0], params.mixes[t.idx0]
    pose1, mix1 = params.poses[t.idx0 + 1], params.mixes[t.idx0 + 1]
    rp = jax.vmap(lambda s, a, b_, c, d: preint_factor.residual(s, a, b_, c, d, with_earth=cfg.with_earth))(
        t.summ, pose0, mix0, pose1, mix1)
    Jp0, Jm0, Jp1, Jm1 = jax.vmap(
        lambda s, a, b_, c, d: preint_factor.jacobians(s, a, b_, c, d, with_earth=cfg.with_earth)
    )(t.summ, pose0, mix0, pose1, mix1)
    Jcat = jnp.concatenate([Jp0, Jm0, Jp1, Jm1], axis=-1)
    w = t.valid
    Ds = cfg.lm_off
    Hss = jnp.zeros((Ds, Ds))
    b = jnp.zeros(cfg.D)
    cols = (t.idx0 * NODE_DIM)[:, None] + jnp.arange(2 * NODE_DIM, dtype=jnp.int32)[None, :]
    Hss = Hss.at[cols[:, :, None], cols[:, None, :]].add(_jtj(Jcat, Jcat, w))
    b = b.at[cols].add(-_jtr(Jcat, rp, w))
    return jnp.sum(Hss) + jnp.sum(b)


def reproj_eval_stage(params):
    rr, Jcat = _reproj_blocks(params, tables.reproj, tables.ext_active, tables.td_active)
    return jnp.sum(rr.astype(jnp.float64)) + jnp.sum(Jcat.astype(jnp.float64))


def reproj_contract_stage(params):
    t = tables.reproj
    rr, Jcat = _reproj_blocks(params, t, tables.ext_active, tables.td_active)
    w = t.valid
    w32 = w.astype(jnp.float32)
    N, L, R = cfg.N, cfg.L, cfg.R
    Ds = cfg.lm_off
    Hss = jnp.zeros((Ds, Ds))
    Hsl = jnp.zeros((Ds, L))
    hll = jnp.zeros(L)
    b = jnp.zeros(cfg.D)

    JA = Jcat[:, :, 0:6] * w32[:, None, None]
    JB = Jcat[:, :, 6:12]
    JC = jnp.concatenate([Jcat[:, :, 12:18], Jcat[:, :, 19:20]], axis=2)
    JL = Jcat[:, :, 18]
    JBw = JB * w32[:, None, None]
    JCw = JC * w32[:, None, None]

    oh_ref = (t.ref_idx[:, None] == jnp.arange(N)).astype(jnp.float32)
    oh_obs = (t.obs_idx[:, None] == jnp.arange(N)).astype(jnp.float32)
    oh_pair = ((t.ref_idx * N + t.obs_idx)[:, None] == jnp.arange(N * N)).astype(jnp.float32)
    oh_lm = (t.lm_idx[:, None] == jnp.arange(L)).astype(jnp.float32)

    pc = (jnp.arange(N, dtype=jnp.int32) * NODE_DIM)[:, None] + jnp.arange(
        POSE_LOCAL, dtype=jnp.int32)[None, :]
    csl = slice(Ds - 7, Ds)

    P_AA = _jtj(JA, Jcat[:, :, 0:6]).reshape(R, 36).astype(jnp.float32)
    P_BB = _jtj(JBw, JB).reshape(R, 36).astype(jnp.float32)
    P_AB = _jtj(JA, JB).reshape(R, 36).astype(jnp.float32)
    P_AC = _jtj(JA, JC).reshape(R, 42).astype(jnp.float32)
    P_BC = _jtj(JBw, JC).reshape(R, 42).astype(jnp.float32)
    CC = jnp.sum(JCw[:, :, :, None] * JC[:, :, None, :], axis=(0, 1)).astype(jnp.float64)

    AA = (oh_ref.T @ P_AA).reshape(N, 6, 6).astype(jnp.float64)
    BB = (oh_obs.T @ P_BB).reshape(N, 6, 6).astype(jnp.float64)
    AB = (oh_pair.T @ P_AB).reshape(N, N, 6, 6).astype(jnp.float64)
    AC = (oh_ref.T @ P_AC).reshape(N, 6, 7).astype(jnp.float64)
    BC = (oh_obs.T @ P_BC).reshape(N, 6, 7).astype(jnp.float64)

    carr = jnp.arange(Ds - 7, Ds, dtype=jnp.int32)
    Hss = Hss.at[pc[:, :, None], pc[:, None, :]].add(AA + BB)
    Hss = Hss.at[pc[:, None, :, None], pc[None, :, None, :]].add(AB + AB.transpose(1, 0, 3, 2))
    Hss = Hss.at[pc[:, :, None], carr[None, None, :]].add(AC + BC)
    Hss = Hss.at[carr[:, None], pc.reshape(-1)[None, :]].add((AC + BC).reshape(N * 6, 7).T)
    Hss = Hss.at[csl, csl].add(CC)

    P_AL = _jtr(JA, JL)
    P_BL = _jtr(JBw, JL)
    P_CL = _jtr(JCw, JL)
    rows_ref = (t.ref_idx * NODE_DIM)[:, None] + jnp.arange(POSE_LOCAL, dtype=jnp.int32)[None, :]
    rows_obs = (t.obs_idx * NODE_DIM)[:, None] + jnp.arange(POSE_LOCAL, dtype=jnp.int32)[None, :]
    Hsl = Hsl.at[rows_ref, t.lm_idx[:, None]].add(P_AL.astype(jnp.float64))
    Hsl = Hsl.at[rows_obs, t.lm_idx[:, None]].add(P_BL.astype(jnp.float64))
    Hsl = Hsl.at[csl, :].add((oh_lm.T @ P_CL).T.astype(jnp.float64))
    hll = hll.at[t.lm_idx].add(jnp.sum(JL * JL, axis=1) * w)

    rw = rr * w[:, None]
    gA = _jtr(Jcat[:, :, 0:6], rw)
    gB = _jtr(JB, rw)
    gC = _jtr(JC, rw)
    gL = jnp.sum(JL * rw, axis=1)
    b = b.at[rows_ref].add(-gA)
    b = b.at[rows_obs].add(-gB)
    b = b.at[csl].add(-jnp.sum(gC, axis=0))
    b = b.at[cfg.lm_off + t.lm_idx].add(-gL)
    return jnp.sum(Hss) + jnp.sum(Hsl) + jnp.sum(hll) + jnp.sum(b)


def marg_stage(params):
    Ds = cfg.lm_off
    Hss = jnp.zeros((Ds, Ds))
    Hsl = jnp.zeros((Ds, cfg.L))
    hll = jnp.zeros(cfg.L)
    b = jnp.zeros(cfg.D)
    mv = tables.marg.valid
    dx0 = params.boxminus(cfg, tables.marg.x0)[:Ds]
    rc, C = _marg_rot_correction(dx0, cfg)
    grad_lin = tables.marg.Jte0 + tables.marg.H0 @ dx0
    Hss = Hss + mv * _dxT_rows(_dx_cols(tables.marg.H0, rc, C), rc, C)
    b = b - mv * jnp.concatenate([_dxT_vec(grad_lin, rc, C), jnp.zeros(cfg.L)])
    return jnp.sum(Hss) + jnp.sum(Hsl) + jnp.sum(hll) + jnp.sum(b)


for name, stage in [
    ("gnss", gnss_stage),
    ("preint", preint_stage),
    ("reproj eval", reproj_eval_stage),
    ("reproj full", reproj_contract_stage),
    ("marg prior", marg_stage),
]:
    t = timed(loop(stage), mk)
    print(f"{name:14s} {t*1e3:8.3f} ms")
