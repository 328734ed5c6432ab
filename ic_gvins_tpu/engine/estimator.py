"""Sliding-window estimator: host bookkeeping + fixed-shape device kernels.

This is the TPU-native re-design of the GVINS orchestrator's state/window
management (ic_gvins.cc:724-928, 1412-1695): the host keeps an authoritative
mirror of the window structure (node times, GNSS entries, IMU segments) in
numpy; all numerics — preintegration, the two-pass LM solve, reintegration,
marginalization — run as fixed-shape jitted device programs operating on
padded tables. Structure edits (append node, merge segments, window shift)
are cheap host-array updates + device slot writes; there is no per-event
recompilation because every device program has static shapes.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..core import quaternion as quat
from ..core.types import ImuBatch, NavState
from ..factors import marginalization as marg
from ..ins import preintegration as pre
from ..solver import lm
from ..solver.problem import (
    FactorTables,
    GnssTable,
    PreintTable,
    ReprojTable,
    WindowConfig,
    WindowParams,
)

MINIMUM_TIME_INTERVAL = 1.0e-4

import functools as _functools


@_functools.partial(jax.jit, static_argnums=(4, 5))
def _preint_jit(int_params, imu, st, iewn, with_odo, with_earth):
    if with_odo:
        from ..ins import preintegration_odo as pre_odo

        return pre_odo.preintegrate_odo(int_params, imu, st,
                                        with_earth=with_earth, iewn=iewn)
    return pre.preintegrate(int_params, imu, st, with_earth=with_earth, iewn=iewn)


@_functools.partial(jax.jit, static_argnums=(2, 3))
def _solve_jit(p, t, wc, iters):
    return lm.solve(p, t, wc, iters)[:2]


@_functools.partial(jax.jit, static_argnums=(2,))
def _surgery_jit(p, t, wc):
    return lm.outlier_surgery(p, t, wc)


@_functools.partial(jax.jit, static_argnums=(4,))
def _marg_jit(params, tables, num_marg, oldest, wc):
    marg_tables, mask, lm_m = marg.select_marg_factors(tables, wc, num_marg, oldest)
    prior = marg.marginalize(params, marg_tables, mask, wc)
    prior = marg.shift_prior(prior, wc, num_marg)
    return prior, lm_m


@_functools.partial(jax.jit, static_argnums=(1, 2))
def _insert_node_jit(prior, wc, k):
    # jitted for the same reason as _drop_node_jit below, plus dispatch
    # cost: the eager permutation measured ~10 ms/insertion of pure CPU
    # op dispatch (round-5 section profile). k is a host int < N.
    return marg.insert_node_slot_into_prior(prior, wc, k)


@_functools.partial(jax.jit, static_argnums=(1, 2))
def _drop_node_jit(prior, wc, k):
    # MUST run jitted: eager dispatch compiles the lax.cond retry inside
    # _equilibrated_chol32 as a standalone primitive, which segfaults
    # XLA:CPU's backend_compile (reproduced 2026-08; fine under jit). k is
    # a host int < N so the per-k executables stay in the compile cache.
    return marg.drop_node_from_prior(prior, wc, k)


def _np_tree(tree):
    """Writable numpy copy of a (device or numpy) pytree."""
    return jax.tree_util.tree_map(lambda a: np.array(a), tree)


def _pack_rows(tree):
    """Flatten a numpy pytree with a shared leading dim P into one (P, K)
    array (row-major per leaf, leaves in tree order). np.concatenate COPIES,
    so the result never aliases the in-place-mutated host mirrors."""
    leaves = jax.tree_util.tree_leaves(tree)
    P = leaves[0].shape[0]
    return np.concatenate(
        [np.asarray(l, np.float64).reshape(P, -1) for l in leaves], axis=1)


def _unpack_preint(packed, wc):
    """(P, K+2) packed rows -> PreintTable (device-side slicing)."""
    template = PreintTable.empty(wc)
    leaves, treedef = jax.tree_util.tree_flatten(template.summ)
    out, o = [], 0
    for l in leaves:
        k = 1
        for d in l.shape[1:]:
            k *= d
        out.append(packed[:, o:o + k].reshape(l.shape))
        o += k
    summ = jax.tree_util.tree_unflatten(treedef, out)
    idx0 = packed[:, o].astype(jnp.int32)
    valid = packed[:, o + 1]
    return PreintTable(summ=summ, idx0=idx0, valid=valid)


@_functools.partial(jax.jit, static_argnums=(2,))
def _tables_dev_jit(packed_preint, packed_gnss, wc, n_nodes, imuerr_idx,
                    ext_active, td_active, packed_reproj, reproj_sqrt_info):
    """Assemble the per-episode device tables from THREE packed host arrays
    in ONE dispatch: the per-leaf jnp.asarray churn (preint tree, gnss
    columns, reprojection columns, node_valid, flag scalars) cost ~3 ms of
    pure host dispatch per episode."""
    preint = _unpack_preint(packed_preint, wc)
    gnss = GnssTable(
        idx=packed_gnss[:, 0].astype(jnp.int32),
        blh=packed_gnss[:, 1:4],
        std=packed_gnss[:, 4:7],
        valid=packed_gnss[:, 7],
        robust=jnp.ones(()),
    )
    reproj = ReprojTable(
        ref_idx=packed_reproj[:, 0].astype(jnp.int32),
        obs_idx=packed_reproj[:, 1].astype(jnp.int32),
        lm_idx=packed_reproj[:, 2].astype(jnp.int32),
        pts0=packed_reproj[:, 3:6],
        pts1=packed_reproj[:, 6:9],
        vel0=packed_reproj[:, 9:12],
        vel1=packed_reproj[:, 12:15],
        td0=packed_reproj[:, 15],
        td1=packed_reproj[:, 16],
        valid=packed_reproj[:, 17],
        sqrt_info=jnp.asarray(reproj_sqrt_info),
        robust=jnp.ones(()),
    )
    node_valid = (jnp.arange(wc.N) < n_nodes).astype(jnp.float64)
    return (preint, gnss, reproj, node_valid, jnp.asarray(imuerr_idx, jnp.int32),
            jnp.asarray(ext_active, jnp.float64), jnp.asarray(td_active, jnp.float64))


def _np_set(tree, idx, leaf_tree):
    """In-place row write on a numpy pytree (host mirror edit)."""
    def setleaf(a, v):
        a[idx] = np.asarray(v)
        return a
    return jax.tree_util.tree_map(setleaf, tree, leaf_tree)


def _np_roll(tree, shift):
    """In-place roll-left on a numpy pytree."""
    def roll(a):
        a[:] = np.roll(a, -shift, axis=0)
        return a
    return jax.tree_util.tree_map(roll, tree)


class GnssEntry:
    __slots__ = ("time", "blh", "std")

    def __init__(self, time, blh, std):
        self.time = float(time)
        self.blh = np.asarray(blh, np.float64)
        self.std = np.asarray(std, np.float64)


class SlidingWindowEstimator:
    """Fixed-slot sliding window over time nodes, GNSS and preintegrations.

    Node slot k holds (time, pose, mix); interval slot k the IMU segment and
    preintegration summary linking node k -> k+1.
    """

    def __init__(self, wcfg: WindowConfig, int_params, *, preint_samples=512,
                 antlever=np.zeros(3), origin=None):
        self.wcfg = wcfg
        self.int_params = int_params
        self.S = preint_samples
        self.antlever = np.asarray(antlever, np.float64)
        self.origin = origin  # blh of world origin (for earth-rate per interval)

        # host mirrors
        self.n_nodes = 0
        self.times = np.zeros(wcfg.N)
        self.poses = np.zeros((wcfg.N, 7))
        self.poses[:, 6] = 1.0
        self.mixes = np.zeros((wcfg.N, wcfg.mix_dim))
        self.gnss_entries = []  # list[GnssEntry]
        self.segments_np = [None] * wcfg.P  # per-interval numpy ImuBatch dicts

        # interval tables: NUMPY host mirrors, mutated in place by the
        # window bookkeeping and converted (with copy — see build_params'
        # aliasing note) to device tables once per solver episode. Editing
        # them as device arrays compiled a fresh tiny XLA program for every
        # distinct slot index/shift (hundreds of compiles per replay).
        self.preint_table = _np_tree(PreintTable.empty(wcfg))
        self.seg_store = _np_tree(ImuBatch.zeros((wcfg.P, preint_samples)))
        # immutable empty templates, shared across episodes (FactorTables
        # .empty allocates the full (D,D) marg-prior zeros — rebuilding it
        # per episode cost ~30 ms of pure allocation on the frame path)
        self._empty_tables = {wcfg: FactorTables.empty(wcfg)}
        self._zero_params = {wcfg: WindowParams.zeros(wcfg)}
        # fill-scaled solver tier: the replay typically fills 10-30% of the
        # production reprojection/landmark slots, and the solver's one-hot
        # contractions are linear in R (solver/problem.py) — a half-size
        # compiled variant selected host-side by measured fill roughly
        # halves the per-episode solve. Node structure (N/G/P) is shared, so
        # everything outside the solve (preint tables, marginalization,
        # window bookkeeping) is tier-independent.
        self.wcfg_small = wcfg._replace(
            L=min(wcfg.L, max(64, wcfg.L // 2)),
            R=min(wcfg.R, max(256, wcfg.R // 2)))
        self.marg_prior = None  # MargPrior or None
        self.prior_cfg = None   # dict for init priors or None
        self._antlever_dev = None  # lazy device copy (constant per estimator)
        self.ext = np.concatenate([np.zeros(3), np.array([0, 0, 0, 1.0])])
        self.td = 0.0

        # jitted kernels: module-level with the (hashable) WindowConfig as a
        # static argument, so compile caches are shared across estimator
        # instances — per-instance jit lambdas recompiled the whole solver
        # for every new model in a process
        wc = wcfg
        self._jit_preint = lambda imu, st, iewn: _preint_jit(
            self.int_params, imu, st, iewn, wc.with_odo, wc.with_earth)
        self._jit_solve = lambda p, t, iters: _solve_jit(p, t, wc, iters)
        self._jit_surgery = lambda p, t: _surgery_jit(p, t, wc)
        self.last_solve_times = (0.0, 0.0)  # (pass1 s, pass2 s), set by optimize
        self._jit_marginalize = lambda params, tables, num_marg, oldest, wcm=wc: \
            _marg_jit(params, tables, num_marg, oldest, wcm)

    # ------------------------------------------------------------------
    # node management
    # ------------------------------------------------------------------

    def check_time_consistency(self, where="", raise_on_fail=False):
        """Debug/test invariant: every active preintegration interval must
        match the node-time structure (summ.dt == times[k+1]-times[k] and
        summ.end_time == times[k+1]). Structural edits (merge/truncate/
        marginalize/insert) that desynchronize the segment table from the
        node list produce silently-catastrophic factors; this catches them
        at the op that broke the invariant."""
        msgs = []
        dts = np.asarray(self.preint_table.summ.dt).ravel()
        ends = np.asarray(self.preint_table.summ.end_time).ravel()
        valid = np.asarray(self.preint_table.valid).ravel()
        for k in range(self.n_nodes - 1):
            gap = self.times[k + 1] - self.times[k]
            if valid[k] != 1.0:
                msgs.append(f"interval {k} invalid (nodes {self.times[k]:.3f}->{self.times[k+1]:.3f})")
            elif abs(dts[k] - gap) > 1e-6:
                msgs.append(f"interval {k}: summ.dt {dts[k]:.4f} != node gap {gap:.4f}")
            elif abs(ends[k] - self.times[k + 1]) > 1e-6:
                msgs.append(f"interval {k}: end_time {ends[k]:.4f} != times[k+1] {self.times[k+1]:.4f}")
        for k in range(max(self.n_nodes - 1, 0), self.wcfg.P):
            if valid[k] != 0.0:
                msgs.append(f"interval {k} beyond window still valid")
        if msgs and raise_on_fail:
            raise AssertionError(f"[{where}] " + "; ".join(msgs))
        return msgs

    def reset_first_node(self, time, state: NavState):
        """Seed node 0 (gvinsInitialization, ic_gvins.cc:652-671)."""
        self.n_nodes = 1
        self.times[0] = time
        self.poses[0] = np.concatenate([np.asarray(state.p), np.asarray(state.q)])
        parts = [np.asarray(state.v), np.asarray(state.bg), np.asarray(state.ba)]
        if self.wcfg.with_odo:
            parts.append(np.asarray(state.sodo)[None])
        self.mixes[0] = np.concatenate(parts)

    def node_state(self, k) -> NavState:
        # jnp.array: self.poses[k] is a VIEW into the in-place-mutated host
        # mirror (see build_params)
        # numpy NavState with copies: eager jnp ops here cost ~3 ms per
        # call on the frame path, and the host mirrors are mutated in place
        # (copies are the aliasing-race guard — see build_params)
        pose = self.poses[k]
        mix = self.mixes[k]
        sodo = np.float64(mix[9]) if self.wcfg.with_odo else np.float64(0.0)
        return NavState(
            time=np.float64(self.times[k]),
            p=pose[:3].copy(), q=pose[3:7].copy(),
            v=mix[:3].copy(), bg=mix[3:6].copy(), ba=mix[6:9].copy(),
            sodo=sodo, sg=np.zeros(3), sa=np.zeros(3),
        )

    def latest_state(self) -> NavState:
        return self.node_state(self.n_nodes - 1)

    def set_prior(self, pose_prior, pose_std, mix_prior, mix_std):
        """constructPrior (ic_gvins.cc:1911-1936)."""
        self.prior_cfg = dict(
            pose_prior=np.asarray(pose_prior),
            pose_prior_std=np.asarray(pose_std),
            mix_prior=np.asarray(mix_prior)[: self.wcfg.mix_dim],
            mix_prior_std=np.asarray(mix_std)[: self.wcfg.mix_dim],
        )

    def _segment_iewn(self, state0_p):
        # numpy: the eager-jnp version cost ~90 ms of per-op dispatch per
        # add_time_node/reintegrate call (round-3 host profile)
        if not self.wcfg.with_earth or self.origin is None:
            return np.zeros(3)
        from ..core import earth_np

        return earth_np.iewn(self.origin, state0_p)

    def add_time_node(self, time, imu_series: dict):
        """Append a node at ``time``; imu_series: numpy dict with keys
        time/dt/dtheta/dvel/odovel covering (times[-1], time], sample 0 being
        the anchor (addNewTimeNode, ic_gvins.cc:897-928). Returns the new
        node's NavState (from the preintegration's absolute end state)."""
        assert self.n_nodes >= 1 and self.n_nodes < self.wcfg.N, "window full"
        k = self.n_nodes - 1  # interval slot

        seg = self._pad_segment(imu_series)
        self.segments_np[k] = seg
        _np_set(self.seg_store, k, ImuBatch(**seg))

        st0 = self.node_state(k)
        iewn = self._segment_iewn(self.poses[k, :3])
        # numpy leaves straight into the jit (eager jnp.asarray costs ~120 us
        # per leaf); seg's arrays are fresh and never mutated in place after
        # this point, so zero-copy aliasing cannot race (build_params' note)
        summ = self._jit_preint(ImuBatch(**seg), st0, iewn)

        _np_set(self.preint_table.summ, k, _np_tree(summ))
        self.preint_table.idx0[k] = k
        self.preint_table.valid[k] = 1.0

        self.n_nodes += 1
        self.times[self.n_nodes - 1] = time
        self.poses[self.n_nodes - 1] = np.concatenate(
            [np.asarray(summ.end_p), np.asarray(summ.end_q)]
        )
        self.mixes[self.n_nodes - 1] = np.concatenate(
            [np.asarray(summ.end_v), self.mixes[k, 3:]]
        )
        return self.latest_state()

    def _pad_segment(self, series):
        S = self.S
        n = len(series["time"])
        assert n <= S, f"segment too long: {n} > {S}"
        out = {}
        for f in ImuBatch._fields:
            a = np.asarray(series[f], np.float64)
            pad_shape = (S - n,) + a.shape[1:]
            out[f] = np.concatenate([a, np.zeros(pad_shape)], axis=0)
        # anchor sample never integrates
        out["dt"][0] = 0.0
        return out

    def add_gnss(self, time, blh_local, std):
        self.gnss_entries.append(GnssEntry(time, blh_local, std))

    # ------------------------------------------------------------------
    # table assembly
    # ------------------------------------------------------------------

    def _node_index_of_time(self, time):
        diffs = np.abs(self.times[: self.n_nodes] - time)
        k = int(np.argmin(diffs))
        return k if diffs[k] < MINIMUM_TIME_INTERVAL else -1

    def build_tables(self, *, ext_active=False, td_active=False,
                     reproj_table=None, reproj_sqrt_info=1.0,
                     lm_valid=None, wc=None) -> FactorTables:
        """reproj_table: packed (R, 18) numpy array from the caller's
        reprojection-row assembly (see gvins._build_reproj_table for the
        column layout), unpacked device-side; None -> empty table.
        wc: table tier (self.wcfg or self.wcfg_small); reproj_table /
        lm_valid must be sized to it."""
        wc = wc or self.wcfg
        if wc not in self._empty_tables:
            self._empty_tables[wc] = FactorTables.empty(wc)
        tables = self._empty_tables[wc]

        # GNSS rows — assembled in numpy, converted with the packed tables
        # below (eager per-slot .at[].set compiled a distinct scatter program
        # per slot index; per-column asarray cost ~0.2 ms of dispatch)
        packed_gnss = np.zeros((wc.G, 8))
        packed_gnss[:, 4:7] = 1.0
        slot = 0
        for entry in self.gnss_entries:
            k = self._node_index_of_time(entry.time)
            if k < 0 or slot >= wc.G:
                continue
            packed_gnss[slot, 0] = k
            packed_gnss[slot, 1:4] = entry.blh
            packed_gnss[slot, 4:7] = entry.std
            packed_gnss[slot, 7] = 1.0
            slot += 1

        packed = np.concatenate(
            [_pack_rows(self.preint_table.summ),
             np.asarray(self.preint_table.idx0, np.float64)[:, None],
             np.asarray(self.preint_table.valid, np.float64)[:, None]], axis=1)
        if reproj_table is None:
            packed_reproj = np.zeros((wc.R, 18))
            packed_reproj[:, 1] = 1.0
            packed_reproj[:, 5] = 1.0
            packed_reproj[:, 8] = 1.0
        else:
            packed_reproj = reproj_table
        # packed arrays passed straight into the jit: all are FRESH
        # np.concatenate/np.zeros outputs (copies of the in-place-mutated
        # mirrors), so zero-copy aliasing cannot race — and the eager
        # per-array jnp.asarray churn cost ~0.4 ms per episode
        # (build_params' note)
        preint, g, reproj, node_valid, imuerr_idx, ext_a, td_a = _tables_dev_jit(
            packed, packed_gnss, wc,
            self.n_nodes, self.n_nodes - 1,
            1.0 if ext_active else 0.0, 1.0 if td_active else 0.0,
            packed_reproj, np.float64(reproj_sqrt_info))

        pr = tables.prior._replace(imuerr_idx=imuerr_idx)
        if self.prior_cfg is not None:
            pc = self.prior_cfg
            pr = pr._replace(
                pose_prior=jnp.asarray(pc["pose_prior"]),
                pose_prior_std=jnp.asarray(pc["pose_prior_std"]),
                mix_prior=jnp.asarray(pc["mix_prior"]),
                mix_prior_std=jnp.asarray(pc["mix_prior_std"]),
                valid=jnp.ones(()),
            )

        if self._antlever_dev is None:
            self._antlever_dev = jnp.asarray(self.antlever)
        tables = tables._replace(
            gnss=g,
            preint=preint,
            reproj=reproj,
            prior=pr,
            antlever=self._antlever_dev,
            node_valid=node_valid,
            ext_active=ext_a,
            td_active=td_a,
        )
        if self.marg_prior is not None:
            mp = self.marg_prior
            if mp.x0.invdepths.shape[0] != wc.L:
                # the prior is landmark-free (NP support only); x0's
                # invdepths leaf exists only for pytree shape and its
                # entries never reach the cost (problem.py slices the
                # boxminus to [:lm_off]) — resize to the tier
                mp = mp._replace(x0=mp.x0._replace(
                    invdepths=jnp.zeros(wc.L)))
            tables = tables._replace(marg=mp)
        if lm_valid is not None:
            tables = tables._replace(lm_valid=jnp.asarray(lm_valid))
        return tables

    def build_params(self, invdepths=None, wc=None) -> WindowParams:
        wc = wc or self.wcfg
        if wc not in self._zero_params:
            self._zero_params[wc] = WindowParams.zeros(wc)
        p = self._zero_params[wc]
        # jnp.array (copy=True), NOT jnp.asarray: asarray zero-copies the
        # numpy host mirrors on CPU backends, and the window bookkeeping
        # mutates poses/mixes IN PLACE (marginalize/merge shifts) while the
        # async device computation that captured the buffer may not have
        # read it yet — a host/device data race that silently hands the
        # solver/marginalization params from a DIFFERENT window state and
        # poisons the prior, with scheduling-dependent (chaotic) outcomes.
        p = p._replace(
            poses=jnp.array(self.poses),
            mixes=jnp.array(self.mixes),
            ext=jnp.array(self.ext),
            td=jnp.asarray(self.td),
        )
        if invdepths is not None:
            p = p._replace(invdepths=jnp.asarray(invdepths))
        return p

    # ------------------------------------------------------------------
    # optimize / reintegrate / marginalize
    # ------------------------------------------------------------------

    def _store_params(self, params: WindowParams):
        # np.array(): jax buffers alias as read-only views; host mirrors are
        # mutated in place by the window bookkeeping
        self.poses = np.array(params.poses)
        self.mixes = np.array(params.mixes)
        self.ext = np.array(params.ext)
        self.td = float(params.td)

    def optimize(self, num_iterations=50, *, two_pass=False, tables=None,
                 params=None, wc=None):
        """One optimization episode; updates host state. Returns stats.
        wc: the tier the tables/params were built at (default full)."""
        wc = wc or self.wcfg
        if tables is None:
            tables = self.build_tables(wc=wc)
        if params is None:
            params = self.build_params(wc=wc)

        if two_pass:
            # Dispatched as pass1 / surgery / pass2 so each pass's wall time is
            # a real measurement (statistics.txt cols 10-11, ic_gvins.cc:1019-
            # 1022), matching lm.solve_two_pass's split (n/4 robust, rest
            # de-robustified). Two extra dispatches per episode — negligible
            # co-located, and the bench measures the fused device program.
            import time as _time

            n1 = max(num_iterations // 4, 1)
            n2 = max(num_iterations - n1, 1)
            t0 = _time.perf_counter()
            params, s1 = jax.block_until_ready(
                _solve_jit(params, tables, wc, n1))
            t_pass1 = _time.perf_counter() - t0
            t0 = _time.perf_counter()
            tables2, n_gnss_out, n_reproj_out = _surgery_jit(params, tables, wc)
            params, s2 = jax.block_until_ready(
                _solve_jit(params, tables2, wc, n2))
            t_pass2 = _time.perf_counter() - t0
            self.last_solve_times = (t_pass1, t_pass2)
            stats = (s1, s2, n_gnss_out, n_reproj_out)
            # persist GNSS std reweighting (the reference mutates gnsslist_)
            self._absorb_gnss_stds(tables2.gnss)
        else:
            params, stats = _solve_jit(params, tables, wc, num_iterations)
            tables2 = tables
        self._store_params(params)
        return params, tables2, stats

    def _absorb_gnss_stds(self, gnss_table: GnssTable):
        stds = np.asarray(gnss_table.std)
        idxs = np.asarray(gnss_table.idx)
        valid = np.asarray(gnss_table.valid)
        slot = 0
        for entry in self.gnss_entries:
            k = self._node_index_of_time(entry.time)
            if k < 0 or slot >= self.wcfg.G:
                continue
            if valid[slot] > 0 and idxs[slot] == k:
                entry.std = stds[slot].copy()
            slot += 1

    def reintegrate_if_needed(self, sigma=6.0):
        """doReintegration (ic_gvins.cc:1680-1695): re-run preintegration for
        intervals whose linearization biases moved > sigma * bias std. One
        batched device call for all intervals."""
        P = self.wcfg.P
        n_int = self.n_nodes - 1
        if n_int <= 0:
            return 0
        bg_lin = self.preint_table.summ.bg0
        ba_lin = self.preint_table.summ.ba0
        dbg = np.linalg.norm(self.mixes[:P, 3:6] - bg_lin, axis=1)
        dba = np.linalg.norm(self.mixes[:P, 6:9] - ba_lin, axis=1)
        need = (
            (dbg > sigma * float(self.int_params.gyr_bias_std))
            | (dba > sigma * float(self.int_params.acc_bias_std))
        ) & (np.arange(P) < n_int)
        if not need.any():
            return 0
        for k in np.nonzero(need)[0]:
            # np.array row copies (fresh, aliasing-safe) passed straight to
            # the jit — eager per-leaf jnp.array cost ~0.6 ms per interval
            seg_dev = jax.tree_util.tree_map(
                lambda a: np.array(a[int(k)]), self.seg_store)
            st0 = self.node_state(int(k))
            iewn = self._segment_iewn(self.poses[int(k), :3])
            summ = self._jit_preint(seg_dev, st0, iewn)
            _np_set(self.preint_table.summ, int(k), _np_tree(summ))
        return int(need.sum())

    def marginalize(self, num_marg, oldest_kf_node=0, tables=None, params=None,
                    wc=None):
        """Marginalize nodes [0, num_marg); shift window left. Returns the
        landmark-marginalized mask for the caller's map bookkeeping.

        wc: the tier the tables/params were built at (default full). The
        prior's support (NP x NP) is tier-independent (lm_off depends only
        on N), so a small-tier marginalization — roughly half the f64
        reprojection assembly and landmark-elimination cost — produces the
        SAME prior whenever the live rows fit the tier; only x0's
        invdepths leaf carries the tier's L, and build_tables resizes it."""
        wc = wc or self.wcfg
        if num_marg <= 0:
            return None
        if num_marg > self.wcfg.marg_cap:
            # a real exception, NOT an assert: under python -O an assert
            # vanishes and _schur_reduce would silently neither eliminate nor
            # retain node blocks beyond marg_cap, producing a WRONG prior.
            # Callers keep the bound by construction (gvins pre-merges
            # surplus nodes before marginalizing — models/gvins.py).
            raise ValueError(
                f"num_marg={num_marg} exceeds marg_cap={self.wcfg.marg_cap}: "
                f"the structured Schur factors only the leading marg_cap "
                f"node blocks; pre-merge surplus nodes before marginalizing")
        if tables is None:
            tables = self.build_tables(wc=wc)
        if params is None:
            params = self.build_params(wc=wc)
        prior, lm_m = self._jit_marginalize(params, tables, num_marg,
                                            oldest_kf_node, wc)
        self.marg_prior = prior
        self.prior_cfg = None  # init priors absorbed (ic_gvins.cc:1537-1549)

        last_time = self.times[num_marg]
        # host shifts
        n = self.n_nodes
        self.times[: n - num_marg] = self.times[num_marg:n]
        self.poses[: n - num_marg] = self.poses[num_marg:n]
        self.mixes[: n - num_marg] = self.mixes[num_marg:n]
        self.n_nodes = n - num_marg
        self.segments_np = self.segments_np[num_marg:] + [None] * num_marg
        self.gnss_entries = [e for e in self.gnss_entries if e.time > last_time - MINIMUM_TIME_INTERVAL]

        # host shifts of the interval mirrors (slot k always links k->k+1,
        # so idx0 is untouched)
        _np_roll(self.preint_table.summ, num_marg)
        self.preint_table.valid[:] = np.roll(self.preint_table.valid, -num_marg)
        if num_marg > 0:
            self.preint_table.valid[self.wcfg.P - num_marg:] = 0.0
        _np_roll(self.seg_store, num_marg)
        return lm_m

    def insert_prior_slot(self, k):
        """Remap the marg prior after a mid-interval node insertion at slot
        ``k`` (see marg.insert_node_slot_into_prior)."""
        if self.marg_prior is None:
            return
        marg.check_insert_capacity(self.marg_prior, self.wcfg)
        self.marg_prior = _insert_node_jit(self.marg_prior, self.wcfg, int(k))

    def truncate_to(self, k):
        """Drop nodes [k, n_nodes) and their intervals (the node-removal leg
        of insertNewGnssTimeNode, ic_gvins.cc:864-876). Returns the dropped
        node times so the caller can re-add them."""
        assert 1 <= k <= self.n_nodes
        dropped = list(self.times[k : self.n_nodes])
        P = self.wcfg.P
        self.preint_table.valid[max(k - 1, 0):] = 0.0
        for j in range(max(k - 1, 0), P):
            self.segments_np[j] = None
        self.n_nodes = k
        return dropped

    def merge_node(self, k):
        """Remove interior node k by merging interval k-1 and k
        (removeUnusedTimeNode, ic_gvins.cc:754-789)."""
        assert 1 <= k < self.n_nodes - 1 or (k == self.n_nodes - 1 and k >= 1)
        a, b = self.segments_np[k - 1], self.segments_np[k]
        na = int(np.sum(a["dt"] > 0)) + 1
        nb = int(np.sum(b["dt"] > 0)) + 1
        merged = {
            f: np.concatenate([a[f][:na], b[f][1:nb]], axis=0) for f in ImuBatch._fields
        }
        seg = self._pad_segment(merged)
        self.segments_np[k - 1] = seg
        _np_set(self.seg_store, k - 1, ImuBatch(**seg))

        st0 = self.node_state(k - 1)
        iewn = self._segment_iewn(self.poses[k - 1, :3])
        summ = self._jit_preint(ImuBatch(**seg), st0, iewn)

        # shift host node arrays left over k
        n = self.n_nodes
        self.times[k : n - 1] = self.times[k + 1 : n]
        self.poses[k : n - 1] = self.poses[k + 1 : n]
        self.mixes[k : n - 1] = self.mixes[k + 1 : n]
        self.n_nodes = n - 1
        # shift interval storage left over interval k
        self.segments_np = (
            self.segments_np[: k - 1 + 1][: k] + self.segments_np[k + 1 :] + [None]
        )
        # roll interval mirrors > k left by one; slot k-1 gets the merge

        def roll_tail(a):
            tail = a[k + 1 :].copy()
            a[k : k + len(tail)] = tail
            a[k + len(tail) :] = 0
            return a

        jax.tree_util.tree_map(roll_tail, self.preint_table.summ)
        roll_tail(self.preint_table.valid)
        _np_set(self.preint_table.summ, k - 1, _np_tree(summ))
        self.preint_table.valid[k - 1] = 1.0
        jax.tree_util.tree_map(roll_tail, self.seg_store)

        # the prior's node columns must follow the slot compaction (see
        # marg.drop_node_from_prior) or it constrains the wrong nodes
        if self.marg_prior is not None:
            self.marg_prior = _drop_node_jit(self.marg_prior, self.wcfg, int(k))
