"""Deterministic replay substrate: IMU stream slicing + chunked mechanization.

Replaces the reference's thread/queue ingest (ic_gvins.cc:237-393) with a
deterministic replay loop: the full sensor streams are known up front; IMU
propagation between events runs as fixed-size padded ``lax.scan`` chunks
(one device call per event gap instead of one C++ call per sample).

Endpoint interpolation of the IMU stream at node times reproduces
MISC::getImuSeriesFromTo / imuInterpolation / isNeedInterpolation
(misc.cc:263-361).
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..core.types import ImuBatch, NavState
from ..ins import mechanization as mech

MINIMUM_TIME_INTERVAL = 1.0e-4


import functools as _functools


@_functools.partial(jax.jit, static_argnums=(5,))
def _mech_scan_jit(g, iw, st, imu, prev, iswithearth):
    return mech.mechanize_scan(
        mech.MechConfig(gravity=g, iewn=iw, iswithearth=iswithearth),
        st, imu, imu_prev=prev,
    )


def _chunk_inputs(sd: ImuBatch, st: NavState, j0, n, chunk):
    """Slice a masked `chunk`-sample window [j0, j0+n) out of the device-
    resident stream plus the bias-compensated previous sample (j0-1)."""
    import jax.lax as lax

    sl = lambda a: lax.dynamic_slice_in_dim(a, j0, chunk, axis=0)
    mask = jnp.arange(chunk) < n
    imu = ImuBatch(
        time=sl(sd.time),
        dt=jnp.where(mask, sl(sd.dt), 0.0),
        dtheta=jnp.where(mask[:, None], sl(sd.dtheta), 0.0),
        dvel=jnp.where(mask[:, None], sl(sd.dvel), 0.0),
        odovel=jnp.where(mask, sl(sd.odovel), 0.0),
    )
    jp = jnp.maximum(j0 - 1, 0)
    first = j0 <= 0
    pdt = jnp.where(first, 0.0, sd.dt[jp])
    pth = jnp.where(first, 0.0, sd.dtheta[jp] - pdt * st.bg)
    pdv = jnp.where(first, 0.0, sd.dvel[jp] - pdt * st.ba)
    return imu, (pdt, pth, pdv)


@_functools.partial(jax.jit, static_argnums=(6, 7, 8))
def _prop_chunk_jit(sd, st, j0, n, g, iw, iswithearth, chunk, want_traj):
    """One mechanization chunk over the device-resident stream: all slicing,
    masking and prev-sample bias compensation happen inside the jit (the
    eager per-chunk np.concatenate/jnp.asarray churn cost ~0.5 ms/chunk of
    pure host dispatch)."""
    imu, prev = _chunk_inputs(sd, st, j0, n, chunk)
    out, traj = mech.mechanize_scan(
        mech.MechConfig(gravity=g, iewn=iw, iswithearth=iswithearth),
        st, imu, imu_prev=prev,
    )
    return (out, traj) if want_traj else out


@_functools.partial(jax.jit, static_argnums=(6,))
def _peek_interp_jit(sd, st, j, t, g, iw, iswithearth):
    """Fused single-sample peek + pose interpolation (statePoseInterpolation,
    misc.cc:67-100): one device call per frame instead of a 1-sample scan
    dispatch plus ~15 eager quaternion primitives on the host."""
    imu, prev = _chunk_inputs(sd, st, j, jnp.int32(1), 1)
    st1, _ = mech.mechanize_scan(
        mech.MechConfig(gravity=g, iewn=iw, iswithearth=iswithearth),
        st, imu, imu_prev=prev,
    )
    return mech.interpolate_pose(st.p, st.q, st.time, st1.p, st1.q, st1.time, t)


class ImuStream:
    """Host-side random access into the replayed IMU stream.

    data: dict of numpy arrays — time (T,), dt (T,), dtheta (T,3),
    dvel (T,3), odovel (T,) distance increments. Samples are increment-form; time is the
    sample END time (reference convention)."""

    def __init__(self, data):
        self.time = np.asarray(data["time"], np.float64)
        self.dt = np.asarray(data["dt"], np.float64)
        self.dtheta = np.asarray(data["dtheta"], np.float64)
        self.dvel = np.asarray(data["dvel"], np.float64)
        self.odovel = np.asarray(data.get("odovel", np.zeros_like(self.time)), np.float64)
        self.T = len(self.time)

    def index_after(self, t):
        """First sample index with time > t."""
        return int(np.searchsorted(self.time, t, side="right"))

    def _sample(self, i):
        return dict(
            time=self.time[i], dt=self.dt[i], dtheta=self.dtheta[i].copy(),
            dvel=self.dvel[i].copy(), odovel=self.odovel[i],
        )

    def _split(self, i, t):
        """Split sample i at interior time t (imuInterpolation,
        misc.cc:288-305). Returns (first_part, second_part)."""
        s = self._sample(i)
        scale = (s["time"] - t) / s["dt"]
        first = dict(
            time=t,
            dt=s["dt"] - (s["time"] - t),
            dtheta=s["dtheta"] * (1 - scale),
            dvel=s["dvel"] * (1 - scale),
            odovel=s["odovel"] * (1 - scale),
        )
        second = dict(
            time=s["time"],
            dt=s["time"] - t,
            dtheta=s["dtheta"] * scale,
            dvel=s["dvel"] * scale,
            odovel=s["odovel"] * scale,
        )
        return first, second

    def series(self, start, end):
        """IMU samples covering (start, end] with interpolated endpoints;
        element 0 is the anchor sample (not integrated). Mirrors
        MISC::getImuSeriesFromTo (misc.cc:307-361)."""
        i_s = self.index_after(start)
        i_e = self.index_after(end)
        out = []

        # start boundary
        if i_s == 0:
            out.append(self._sample(0))
            i_mid = 1
        else:
            prev = self._sample(i_s - 1)
            cur = self._sample(i_s) if i_s < self.T else None
            if abs(prev["time"] - start) < MINIMUM_TIME_INTERVAL or cur is None:
                out.append(prev)
            elif abs(cur["time"] - start) < MINIMUM_TIME_INTERVAL:
                out.append(cur)
                i_s += 1
            else:
                first, second = self._split(i_s, start)
                out.append(first)
                out.append(second)
                i_s += 1
            i_mid = i_s

        # middle whole samples
        while i_mid < self.T and self.time[i_mid] < end - MINIMUM_TIME_INTERVAL:
            out.append(self._sample(i_mid))
            i_mid += 1

        # end boundary
        if i_mid < self.T:
            if abs(self.time[i_mid] - end) < MINIMUM_TIME_INTERVAL:
                out.append(self._sample(i_mid))
            else:
                first, _ = self._split(i_mid, end)
                out.append(first)
        out[-1]["time"] = end
        return {
            f: np.stack([np.asarray(s[f]) for s in out])
            for f in ("time", "dt", "dtheta", "dvel", "odovel")
        }


class InsPropagator:
    """Chunked INS mechanization over the replayed stream with per-sample
    trajectory output (replaces the fusion thread's per-sample loop,
    ic_gvins.cc:249-293 + MISC::writeNavResult)."""

    def __init__(self, stream: ImuStream, gravity, iewn, iswithearth, chunk=256):
        self.stream = stream
        self.chunk = chunk
        self.iswithearth = iswithearth
        self.gravity = jnp.asarray(gravity)
        self.iewn = jnp.asarray(iewn)
        # the WHOLE stream lives on device (one upload per episode); chunks
        # are sliced out inside the jits — see _prop_chunk_jit
        pad = chunk + 1
        self._dev = ImuBatch(
            time=jnp.asarray(np.concatenate([stream.time, np.zeros(pad)])),
            dt=jnp.asarray(np.concatenate([stream.dt, np.zeros(pad)])),
            dtheta=jnp.asarray(np.concatenate([stream.dtheta, np.zeros((pad, 3))])),
            dvel=jnp.asarray(np.concatenate([stream.dvel, np.zeros((pad, 3))])),
            odovel=jnp.asarray(np.concatenate([stream.odovel, np.zeros(pad)])),
        )
        self.state = None     # NavState (device-resident between episodes)
        self._time_host = 0.0  # host mirror of state.time (no device syncs)
        self.cursor = 0       # next sample index to process

    def set_state(self, state: NavState, restart_time=None):
        """Adopt an (optimized) state; the next propagate re-runs from its
        time (redoInsMechanization semantics, misc.cc:208-261)."""
        self.state = state
        t = float(state.time) if restart_time is None else restart_time
        self._time_host = t
        self.cursor = self.stream.index_after(t + MINIMUM_TIME_INTERVAL)

    def update_iewn(self, iewn):
        self.iewn = jnp.asarray(iewn)

    def propagate_to(self, t_end, sample_cb=None):
        """Mechanize through all whole samples with time <= t_end. Calls
        sample_cb(times, p, q, v) per chunk for output. The state ends at the
        last processed sample (node-exact states come from preintegration)."""
        end_idx = self.stream.index_after(t_end + MINIMUM_TIME_INTERVAL)
        s = self.stream
        want_traj = sample_cb is not None
        while self.cursor < end_idx:
            j0 = self.cursor
            j1 = min(j0 + self.chunk, end_idx)
            n = j1 - j0
            out = _prop_chunk_jit(self._dev, self.state, j0, n, self.gravity,
                                  self.iewn, self.iswithearth, self.chunk,
                                  want_traj)
            if want_traj:
                self.state, (p, q, v) = out
                sample_cb(s.time[j0:j1], np.asarray(p)[:n], np.asarray(q)[:n],
                          np.asarray(v)[:n])
            else:
                self.state = out
            self._time_host = s.time[j1 - 1]
            self.cursor = j1

    def pose_interpolated(self, t):
        """Interpolated (p, q) at time t (MISC::getCameraPoseFromInsWindow /
        statePoseInterpolation, misc.cc:67-100): propagate through samples
        <= t, then ONE fused peek+interpolate device call. Does not advance
        the cursor past t."""
        self.propagate_to(t)
        if self.cursor >= self.stream.T or abs(self._time_host - t) < MINIMUM_TIME_INTERVAL:
            return np.array(self.state.p), np.array(self.state.q)
        p, q = _peek_interp_jit(self._dev, self.state, self.cursor, t,
                                self.gravity, self.iewn, self.iswithearth)
        return np.array(p), np.array(q)
