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
        self.gravity = jnp.asarray(gravity)
        self.iewn = jnp.asarray(iewn)
        # module-level jit (shared compile cache across propagator
        # instances); iswithearth is a static argument
        self._jit_scan = lambda g, iw, st, imu, prev: _mech_scan_jit(
            g, iw, st, imu, prev, iswithearth)
        self.state = None     # NavState
        self.cursor = 0       # next sample index to process

    def set_state(self, state: NavState, restart_time=None):
        """Adopt an (optimized) state; the next propagate re-runs from its
        time (redoInsMechanization semantics, misc.cc:208-261)."""
        self.state = state
        t = float(state.time) if restart_time is None else restart_time
        self.cursor = self.stream.index_after(t + MINIMUM_TIME_INTERVAL)

    def update_iewn(self, iewn):
        self.iewn = jnp.asarray(iewn)

    def propagate_to(self, t_end, sample_cb=None):
        """Mechanize through all whole samples with time <= t_end. Calls
        sample_cb(times, p, q, v) per chunk for output. The state ends at the
        last processed sample (node-exact states come from preintegration)."""
        end_idx = self.stream.index_after(t_end + MINIMUM_TIME_INTERVAL)
        s = self.stream
        while self.cursor < end_idx:
            j0 = self.cursor
            j1 = min(j0 + self.chunk, end_idx)
            n = j1 - j0
            pad = self.chunk - n
            imu = ImuBatch(
                time=jnp.asarray(np.concatenate([s.time[j0:j1], np.zeros(pad)])),
                dt=jnp.asarray(np.concatenate([s.dt[j0:j1], np.zeros(pad)])),
                dtheta=jnp.asarray(np.concatenate([s.dtheta[j0:j1], np.zeros((pad, 3))])),
                dvel=jnp.asarray(np.concatenate([s.dvel[j0:j1], np.zeros((pad, 3))])),
                odovel=jnp.asarray(np.concatenate([s.odovel[j0:j1], np.zeros(pad)])),
            )
            # anchor: previous stream sample (split-correct at boundaries is
            # unnecessary for the dual-sample cross terms' 1/12 magnitude)
            if j0 > 0:
                bg, ba = self.state.bg, self.state.ba
                prev = (
                    jnp.asarray(s.dt[j0 - 1]),
                    jnp.asarray(s.dtheta[j0 - 1]) - s.dt[j0 - 1] * bg,
                    jnp.asarray(s.dvel[j0 - 1]) - s.dt[j0 - 1] * ba,
                )
            else:
                prev = (jnp.zeros(()), jnp.zeros(3), jnp.zeros(3))
            self.state, traj = self._jit_scan(self.gravity, self.iewn, self.state, imu, prev)
            if sample_cb is not None:
                p, q, v = traj
                sample_cb(s.time[j0:j1], np.asarray(p)[:n], np.asarray(q)[:n], np.asarray(v)[:n])
            self.cursor = j1

    def pose_interpolated(self, t):
        """Interpolated (p, q) at time t (MISC::getCameraPoseFromInsWindow /
        statePoseInterpolation, misc.cc:67-100): propagate through samples
        <= t, take one peek step to the next sample, interpolate. Does not
        advance the cursor past t."""
        import numpy as np

        self.propagate_to(t)
        st0 = self.state
        s = self.stream
        if self.cursor >= s.T or abs(float(st0.time) - t) < MINIMUM_TIME_INTERVAL:
            return np.array(st0.p), np.array(st0.q)
        j = self.cursor
        imu = ImuBatch(
            time=jnp.asarray(s.time[j : j + 1]),
            dt=jnp.asarray(s.dt[j : j + 1]),
            dtheta=jnp.asarray(s.dtheta[j : j + 1]),
            dvel=jnp.asarray(s.dvel[j : j + 1]),
            odovel=jnp.asarray(s.odovel[j : j + 1]),
        )
        bg, ba = st0.bg, st0.ba
        prev = (
            jnp.asarray(s.dt[j - 1]) if j > 0 else jnp.zeros(()),
            (jnp.asarray(s.dtheta[j - 1]) - s.dt[j - 1] * bg) if j > 0 else jnp.zeros(3),
            (jnp.asarray(s.dvel[j - 1]) - s.dt[j - 1] * ba) if j > 0 else jnp.zeros(3),
        )
        st1, _ = self._jit_scan(self.gravity, self.iewn, st0, imu, prev)

        from ..ins.mechanization import interpolate_pose

        p, q = interpolate_pose(st0.p, st0.q, float(st0.time), st1.p, st1.q, float(st1.time), t)
        return np.array(p), np.array(q)
