"""Synthetic world generation shared by solver/engine tests.

Generates IMU increment streams and self-consistent node states by running
the framework's own mechanization (so preintegration residuals vanish exactly
at the truth), plus GNSS observations with lever arm.
"""

import jax.numpy as jnp
import numpy as np

from ic_gvins_tpu.core import quaternion as quat
from ic_gvins_tpu.core.types import ImuBatch, IntegrationParams, NavState
from ic_gvins_tpu.ins import mechanization as mech
from ic_gvins_tpu.ins import preintegration as pre

G = 9.8


def smooth_imu(n, dt, seed=0, w_scale=0.3, f_scale=1.0):
    """Band-limited random body rates / specific forces as increments."""
    rng = np.random.default_rng(seed)
    t = np.arange(n) * dt
    # sum of a few sinusoids -> smooth, deterministic
    def field(scale, seed_off):
        r = np.random.default_rng(seed + seed_off)
        out = np.zeros((n, 3))
        for k in range(3):
            amp = r.normal(0, scale, 3)
            freq = r.uniform(0.1, 1.5, 3)
            phase = r.uniform(0, 2 * np.pi, 3)
            out[:, k] = sum(a * np.sin(2 * np.pi * f * t + p) for a, f, p in zip(amp, freq, phase))
        return out

    w = field(w_scale, 1)
    f = field(f_scale, 2) + np.array([0, 0, -G])
    return ImuBatch(
        time=jnp.asarray(t),
        dt=jnp.concatenate([jnp.zeros(1), jnp.full(n - 1, dt)]),
        dtheta=jnp.asarray(w * dt),
        dvel=jnp.asarray(f * dt),
        odovel=jnp.zeros(n),
    )


def propagate_nodes(imu: ImuBatch, state0: NavState, node_steps):
    """Integrate the IMU stream and record states at sample indices
    ``node_steps`` (list of ints, ascending, first must be 0)."""
    cfg = mech.MechConfig(gravity=jnp.array([0, 0, G]), iewn=jnp.zeros(3), iswithearth=False)
    states = [state0]
    st = state0
    for a, b in zip(node_steps[:-1], node_steps[1:]):
        seg = ImuBatch(
            imu.time[a + 1 : b + 1],
            imu.dt[a + 1 : b + 1],
            imu.dtheta[a + 1 : b + 1],
            imu.dvel[a + 1 : b + 1],
            imu.odovel[a + 1 : b + 1],
        )
        prev = (imu.dt[a], imu.dtheta[a] - imu.dt[a] * st.bg, imu.dvel[a] - imu.dt[a] * st.ba)
        st, _ = mech.mechanize_scan(cfg, st, seg, imu_prev=prev)
        states.append(st)
    return states


def preint_segments(params: IntegrationParams, imu: ImuBatch, states, node_steps):
    """Preintegrate each inter-node segment starting at the recorded states."""
    summs = []
    for (a, b), st in zip(zip(node_steps[:-1], node_steps[1:]), states[:-1]):
        seg = ImuBatch(
            imu.time[a : b + 1],
            imu.dt[a : b + 1].at[0].set(imu.dt[a]),
            imu.dtheta[a : b + 1],
            imu.dvel[a : b + 1],
            imu.odovel[a : b + 1],
        )
        summs.append(pre.preintegrate(params, seg, st, with_earth=False))
    return summs


def default_params():
    return IntegrationParams.default()._replace(gravity=jnp.asarray(G))


def stack_summaries(summs, pad_to=None):
    """Stack PreintSummary list into a batched summary, optionally padded."""
    fields = type(summs[0])._fields
    arrays = {f: np.stack([np.asarray(getattr(s, f)) for s in summs]) for f in fields}
    n = len(summs)
    if pad_to is not None and pad_to > n:
        padn = pad_to - n
        for f in fields:
            a = arrays[f]
            pad_shape = (padn,) + a.shape[1:]
            if f in ("sqrt_info", "cov"):
                pad = np.tile(np.eye(15), (padn, 1, 1))
            elif f in ("dq", "end_q"):
                pad = np.tile(np.array([0.0, 0, 0, 1.0]), (padn, 1))
            elif f == "dt":
                pad = np.ones(padn)
            else:
                pad = np.zeros(pad_shape)
            arrays[f] = np.concatenate([a, pad.reshape(pad_shape)], axis=0)
    return type(summs[0])(**{f: jnp.asarray(v) for f, v in arrays.items()})
