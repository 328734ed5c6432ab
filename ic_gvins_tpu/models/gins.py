"""GINS model: tightly-coupled GNSS/INS sliding-window estimation.

The minimum end-to-end slice (SURVEY.md §7 stage 5): replays the reference's
INITIALIZING -> INITIALIZING_INS pipeline (ic_gvins.cc:297-330, 584-722)
deterministically — GNSS/INS alignment (zero-velocity gyro bias + leveling,
heading from GNSS velocity), priors, per-GNSS time nodes with IMU
preintegration, full-window LM solves, reintegration on bias jumps, INS
feedback re-mechanization — extended with sliding-window marginalization so
the node count stays fixed-shape (the reference never runs GNSS/INS-only
past initialization; this model is the vision-disabled capability).

Outputs gvins.nav / trajectory.csv / IMU_ERR.bin with reference schemas.
"""

import math

import jax.numpy as jnp
import numpy as np

import jax

from ..core import earth_np, quaternion as quat
from ..core.types import NavState
from ..engine.config import GvinsConfig, integration_params_from_config
from ..engine.estimator import SlidingWindowEstimator
from ..engine.output import OutputFiles
from ..engine.replay import ImuStream, InsPropagator
from ..ins import mechanization as mech
from ..solver.problem import WindowConfig

D2R = math.pi / 180.0
MINMUM_ALIGN_VELOCITY = 0.5       # ic_gvins.h:128
GYROSCOPE_BIAS_PRIOR_STD = 7200 * D2R / 3600
ACCELEROMETER_BIAS_PRIOR_STD = 20000 * 1.0e-5


import functools as _functools

_zero_vel_jit = _functools.partial(jax.jit, static_argnums=(3,))(
    mech.detect_zero_velocity)


def _cpu(fn, *args):
    dev = jax.local_devices(backend="cpu")[0]
    with jax.default_device(dev):
        return np.asarray(fn(*[jnp.asarray(a) for a in args]))


class GinsModel:
    """Deterministic GNSS/INS replay engine."""

    def __init__(self, cfg: GvinsConfig, outdir=None, window_nodes=None):
        self.cfg = cfg
        n_window = window_nodes or cfg.optimize_windows_size + 2
        self.wcfg = WindowConfig(
            N=max(n_window, 4),
            L=8,            # no landmarks in GINS
            G=max(n_window, 4),
            R=8,
            with_earth=cfg.iswithearth,
            with_odo=cfg.isuseodo,
        )
        self.int_params = integration_params_from_config(cfg)
        self.out = OutputFiles(outdir) if outdir else None

        self.origin = None
        self.est = None
        self.prop = None
        self.state = "INITIALIZING"
        self.initlength_done = False

        # init bookkeeping
        self._bg = np.zeros(3)
        self._initatt = np.zeros(3)
        self._has_zero_velocity = False
        self.trajectory = []  # (time, p(3), q(4)) at node times

    # ------------------------------------------------------------------

    def run(self, imu_data, gnss_data):
        """Replay full streams. imu_data: dict (time, dt, dtheta, dvel[,odovel]);
        gnss_data: dict (time (K,), blh (K,3) geodetic rad/m, std (K,3))."""
        stream = ImuStream(imu_data)
        gtime = np.asarray(gnss_data["time"], np.float64)
        gblh = np.asarray(gnss_data["blh"], np.float64)
        gstd = np.asarray(gnss_data["std"], np.float64)

        gyaw = np.asarray(gnss_data.get("yaw", np.zeros(len(gtime))), np.float64)
        gyawvalid = np.asarray(
            gnss_data.get("isyawvalid", np.zeros(len(gtime), bool)), bool
        )

        last_gnss = None
        for k in range(len(gtime)):
            # ingest gates (fusion_ros.cc:178-198)
            if (gstd[k] == 0).all():
                continue
            if np.linalg.norm(gstd[k]) > self.cfg.gnssthreshold:
                continue
            if self.cfg.isusegnssoutage and gtime[k] >= self.cfg.gnssoutagetime:
                continue

            if self.origin is None:
                # first fix defines the world origin + local gravity
                self.origin = gblh[k].copy()
                self.gravity = float(earth_np.gravity(self.origin))
                gnss = dict(time=float(gtime[k]), blh=np.zeros(3), std=gstd[k].copy(),
                            yaw=float(gyaw[k]), isyawvalid=bool(gyawvalid[k]))
            else:
                blh_local = earth_np.global2local(self.origin, gblh[k])
                gnss = dict(time=float(gtime[k]), blh=blh_local, std=gstd[k].copy(),
                            yaw=float(gyaw[k]), isyawvalid=bool(gyawvalid[k]))

            if self.state == "INITIALIZING":
                if last_gnss is not None:
                    self._try_initialize(stream, last_gnss, gnss)
                last_gnss = gnss
            else:
                self._process_gnss(stream, gnss)

        # tail: keep producing INS output after the last usable GNSS (the
        # reference's fusion thread mechanizes through outages,
        # ic_gvins.cc:281-293 + writeNavResult)
        if self.prop is not None:
            self.prop.propagate_to(float(stream.time[-1]), sample_cb=self._write_samples if self.out else None)
        if self.out:
            self.out.close()
        return np.asarray(self.trajectory) if self.trajectory else np.zeros((0, 8))

    # ------------------------------------------------------------------

    def _try_initialize(self, stream, last_gnss, gnss):
        """gvinsInitialization (ic_gvins.cc:584-692)."""
        i0 = stream.index_after(last_gnss["time"])
        i1 = stream.index_after(gnss["time"])
        if i1 - i0 < 20:
            return False

        # pad to a fixed bucket: an eager call with the raw (varying) sample
        # count re-traces and re-compiles the reduction for every distinct
        # GNSS-pair length
        n = i1 - i0
        S = 64
        while S < n:
            S *= 2
        dtheta = np.zeros((S, 3))
        dtheta[:n] = stream.dtheta[i0:i1]
        dvel = np.zeros((S, 3))
        dvel[:n] = stream.dvel[i0:i1]
        mask = np.zeros(S)
        mask[:n] = 1.0
        is_zero, mean_th, mean_dv = _zero_vel_jit(
            jnp.asarray(dtheta), jnp.asarray(dvel), jnp.asarray(mask),
            self.cfg.imudatarate,
        )
        if bool(is_zero):
            self._bg = np.asarray(mean_th) * self.cfg.imudatarate
            fb = np.asarray(mean_dv) * self.cfg.imudatarate
            self._initatt[0] = -math.asin(np.clip(fb[1] / self.gravity, -1, 1))
            self._initatt[1] = math.asin(np.clip(fb[0] / self.gravity, -1, 1))
            self._has_zero_velocity = True
            return False

        if last_gnss.get("isyawvalid", False):
            # dual-antenna GNSS heading (ic_gvins.cc:631-633)
            self._initatt[2] = last_gnss["yaw"]
        else:
            vel = gnss["blh"] - last_gnss["blh"]
            if np.linalg.norm(vel) < MINMUM_ALIGN_VELOCITY:
                return False
            if not self._has_zero_velocity:
                self._initatt[0] = 0.0
                self._initatt[1] = math.atan(-vel[2] / math.hypot(vel[0], vel[1]))
            self._initatt[2] = math.atan2(vel[1], vel[0])

        q0 = jnp.asarray(_cpu(quat.euler_to_quat, self._initatt))
        p0 = last_gnss["blh"] - _cpu(
            lambda q, l: quat.rotate(q, l), np.asarray(q0), np.asarray(self.cfg.antlever)
        )
        state0 = NavState.identity()._replace(
            time=jnp.asarray(last_gnss["time"]),
            p=jnp.asarray(p0),
            q=q0,
            v=jnp.zeros(3),
            bg=jnp.asarray(self._bg),
        )

        self.int_params = self.int_params._replace(gravity=jnp.asarray(self.gravity))
        self.est = SlidingWindowEstimator(
            self.wcfg,
            self.int_params,
            preint_samples=self.cfg.preint_samples,
            antlever=self.cfg.antlever,
            origin=self.origin,
        )
        self.est.reset_first_node(last_gnss["time"], state0)
        self.est.add_gnss(last_gnss["time"], last_gnss["blh"], last_gnss["std"])
        self._construct_prior(state0)

        iewn = (
            earth_np.iewn(self.origin, np.asarray(p0))
            if self.cfg.iswithearth
            else np.zeros(3)
        )
        self.prop = InsPropagator(
            stream,
            gravity=[0.0, 0.0, self.gravity],
            iewn=iewn,
            iswithearth=self.cfg.iswithearth,
        )
        self.prop.set_state(state0)

        # current GNSS becomes node 1
        self._add_gnss_node(stream, gnss)
        self.state = "INITIALIZING_INS"
        return True

    def _construct_prior(self, state0: NavState):
        """constructPrior (ic_gvins.cc:1911-1936)."""
        bg_std = (
            3.0 * float(self.int_params.gyr_bias_std)
            if self._has_zero_velocity
            else GYROSCOPE_BIAS_PRIOR_STD
        )
        pose_prior = np.concatenate([np.asarray(state0.p), np.asarray(state0.q)])
        pose_std = np.array([0.1, 0.1, 0.1, 0.5 * D2R, 0.5 * D2R, 1.5 * D2R])
        mix_prior = np.concatenate([np.asarray(state0.v), np.asarray(state0.bg), np.asarray(state0.ba)])
        mix_std = np.concatenate(
            [np.full(3, 0.1), np.full(3, bg_std), np.full(3, ACCELEROMETER_BIAS_PRIOR_STD)]
        )
        if self.cfg.isuseodo:
            # sodo prior: 5000 PPM (ic_gvins.cc:1917,1934)
            mix_prior = np.concatenate([mix_prior, [float(state0.sodo)]])
            mix_std = np.concatenate([mix_std, [0.005]])
        self.est.set_prior(pose_prior, pose_std, mix_prior, mix_std)

    # ------------------------------------------------------------------

    def _chain_time_nodes(self, stream, t_target, shed_capacity=None):
        """Insert intermediate time nodes so no preintegration segment spans
        more IMU samples than the fixed capacity. The reference bounds
        preintegration spans the same way (MAXIMUM_PREINTEGRATION_LENGTH,
        ic_gvins.h:134-136 + ic_gvins.cc:858-862); with fixed shapes the
        bound is S samples. ``shed_capacity`` frees node slots when the
        window fills (defaults to marginalizing the oldest node)."""
        shed = shed_capacity or (
            lambda: self.est.marginalize(1, wc=self.est.wcfg_small))
        max_dt = (self.cfg.preint_samples - 2) / self.cfg.imudatarate
        t0 = float(self.est.times[self.est.n_nodes - 1])
        while t_target - t0 > max_dt:
            t0 += max_dt
            self.est.add_time_node(t0, stream.series(self.est.times[self.est.n_nodes - 1], t0))
            if self.est.n_nodes >= self.wcfg.N - 1:
                shed()

    def _add_gnss_node(self, stream, gnss):
        # long GNSS gaps (outages) can exceed the fixed preintegration
        # segment capacity; chain intermediate nodes to keep segments bounded
        self._chain_time_nodes(stream, gnss["time"])
        series = stream.series(self.est.times[self.est.n_nodes - 1], gnss["time"])
        self.est.add_time_node(gnss["time"], series)
        self.est.add_gnss(gnss["time"], gnss["blh"], gnss["std"])

    def _process_gnss(self, stream, gnss):
        """INITIALIZING_INS loop body (ic_gvins.cc:313-330, 395-425)."""
        # propagate + write per-sample nav output up to the node time
        self.prop.propagate_to(gnss["time"], sample_cb=self._write_samples if self.out else None)

        self._add_gnss_node(stream, gnss)
        # GNSS/INS-only problem: no landmark/reprojection rows ever live, so
        # the half-L/R tier always fits (solver cost is linear in R/L)
        self.est.optimize(num_iterations=50, wc=self.est.wcfg_small)
        self.est.reintegrate_if_needed()

        # window management: marginalize oldest when slots are full
        if self.est.n_nodes >= self.wcfg.N - 1:
            self.est.marginalize(1, wc=self.est.wcfg_small)

        # feedback: re-mechanize forward from the newest optimized node
        st = self.est.latest_state()
        if self.cfg.iswithearth:
            self.prop.update_iewn(earth_np.iewn(self.origin, np.asarray(st.p)))
        self.prop.set_state(st)

        self.trajectory.append(
            [st.time, *np.asarray(st.p), *np.asarray(st.q)]
        )

    def _write_samples(self, times, p, q, v):
        if self.out is None:
            return
        st_bg = self.est.mixes[self.est.n_nodes - 1, 3:6]
        st_ba = self.est.mixes[self.est.n_nodes - 1, 6:9]
        for i in range(len(times)):
            self.out.write_nav(self.origin, times[i], p[i], q[i], v[i], st_bg, st_ba)
