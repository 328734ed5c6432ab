"""Synthetic GNSS/INS dataset with ground truth for end-to-end tests."""

import jax.numpy as jnp
import numpy as np

from ic_gvins_tpu.core import quaternion as quat
from ic_gvins_tpu.core.types import ImuBatch, NavState
from ic_gvins_tpu.ins import mechanization as mech


def make_gins_dataset(
    g=None,
    rate=200.0,
    bg_true=(0.002, -0.001, 0.0005),
    ba_true=(0.01, -0.02, 0.03),
    gnss_noise=0.01,
    gnss_std=0.02,
    lever=(-0.3, 0.01, 0.35),
    origin_deg=(30.5, 114.3, 40.0),
    seed=0,
    with_odo=False,
    odo_scale_err=0.01,
    odo_noise=0.02,
    turn_duration=18.0,
    with_earth=False,
):
    """Timeline: 0-4 s stationary, 4-6 s accelerate (1 m/s^2 body-x),
    6-24 s gentle coordinated turn. IMU increments are generated in the body
    frame and the ground truth is the framework's own mechanization of the
    bias-free increments (self-consistent world)."""
    origin = np.array(
        [np.deg2rad(origin_deg[0]), np.deg2rad(origin_deg[1]), origin_deg[2]]
    )
    if g is None:
        # gravity must match what the estimator derives from the first fix
        # (Earth::gravity at the origin) or the noise-free IMU's tight
        # whitening turns the mismatch into a systematic preint residual
        from ic_gvins_tpu.core import earth
        import jax.numpy as _jnp

        g = float(earth.gravity(_jnp.asarray(origin)))

    dt = 1.0 / rate
    # (duration, gyro rate, specific force, in_motion)
    # motion starts EXACTLY at the t=4 GNSS epoch with >0.5 m first-second
    # displacement so alignment triggers on the (4,5) pair and the reference
    # v=0 prior (ic_gvins.cc:652-667) anchors at t=4 where the vehicle truly
    # was stationary. (A softer start slips alignment to the next pair and
    # plants a ~1 m/s 10-sigma velocity-prior error — the reference carries
    # the same behavior.)
    segs = [
        (4.0, np.zeros(3), np.array([0, 0, -g]), False),
        (2.0, np.zeros(3), np.array([1.3, 0, -g]), True),
        (turn_duration, np.array([0, 0, 0.05]), np.array([0.0, 0.13, -g]), True),
    ]
    w_list, f_list = [], []
    t_off = 0.0
    for dur, w, f, moving in segs:
        n = int(round(dur * rate))
        ts = t_off + dt * np.arange(n)
        wseg = np.tile(w, (n, 1)).astype(float)
        fseg = np.tile(f, (n, 1)).astype(float)
        if moving:
            # motion-correlated vibration so the variance-based zero-velocity
            # detector (misc.cc:363-415) sees the vehicle as moving
            wseg += 0.02 * np.sin(2 * np.pi * 2.0 * ts)[:, None] * np.array([1.0, 0.5, 0.8])
            fseg += 0.4 * np.sin(2 * np.pi * 1.3 * ts)[:, None] * np.array([0.6, 1.0, 0.7])
        w_list.append(wseg)
        f_list.append(fseg)
        t_off += dur
    w = np.concatenate(w_list)
    f = np.concatenate(f_list)
    n = len(w)
    t = dt * (np.arange(n) + 1)

    # truth: mechanize bias-free increments from rest. With earth enabled,
    # the gyro senses the full inertial rate w_ib = w_nb + R_bn * w_ie
    # (the estimator's earth-aware mechanization subtracts iewn back out,
    # misc.cc:151-206 / mechanization.py), so the earth-rate component is
    # injected into the true increments using the truth attitude — which
    # itself is the earth-aware mechanization of those increments. Fixed
    # point reached by iteration (the earth increment is ~3.6e-7 rad/sample;
    # two passes converge far below noise).
    iewn_np = np.zeros(3)
    if with_earth:
        from ic_gvins_tpu.core import earth

        iewn_np = np.asarray(earth.iewn(jnp.asarray(origin), jnp.zeros(3)))
    cfg = mech.MechConfig(
        gravity=jnp.array([0, 0, g]), iewn=jnp.asarray(iewn_np),
        iswithearth=with_earth)

    dtheta_true = w * dt
    n_iter = 3 if with_earth else 1
    q_true = np.tile(np.array([0.0, 0, 0, 1.0]), (n, 1))
    for _ in range(n_iter):
        if with_earth:
            # attitude at the START of each interval (prev sample's end)
            q_prev = np.concatenate([q_true[:1] * 0 + [0, 0, 0, 1.0], q_true[:-1]])
            earth_inc = np.asarray(
                quat.rotate(quat.conj(jnp.asarray(q_prev)), jnp.asarray(iewn_np))
            ) * dt
            dtheta_true = w * dt + earth_inc
        imu_true = ImuBatch(
            time=jnp.asarray(t),
            dt=jnp.full(n, dt),
            dtheta=jnp.asarray(dtheta_true),
            dvel=jnp.asarray(f * dt),
            odovel=jnp.zeros(n),
        )
        _, (p_true, q_true, v_true) = mech.mechanize_scan(cfg, NavState.identity(), imu_true)
        p_true, q_true, v_true = np.asarray(p_true), np.asarray(q_true), np.asarray(v_true)

    # measured increments include biases + white noise at the configured
    # densities (arw/vrw 0.1 deg/sqrt(hr), 0.1 m/s/sqrt(hr)): without real
    # measurement noise the preintegration whitening (built from these same
    # densities) amplifies tiny interpolation/discretization systematics
    # into multi-sigma residuals that out-shout the GNSS factors
    rng = np.random.default_rng(seed)
    bg = np.asarray(bg_true)
    ba = np.asarray(ba_true)
    arw = 0.1 * np.pi / 180.0 / 60.0   # rad/sqrt(s)
    vrw = 0.1 / 60.0                   # m/s/sqrt(s)
    dtheta_m = dtheta_true + bg * dt + rng.normal(0, arw * np.sqrt(dt), (n, 3))
    dvel_m = (f + ba) * dt + rng.normal(0, vrw * np.sqrt(dt), (n, 3))

    odovel = np.zeros(n)
    if with_odo:
        # wheel odometer distance increments in the vehicle frame (abv=0,
        # lodo=0): true body-x velocity integrated per sample, scaled by the
        # wheel error (measured*(1+sodo)=true => sodo ~= odo_scale_err) with
        # white increment noise
        v_body_x = np.einsum("ij,ij->i", v_true,
                             np.stack([np.asarray(quat.to_matrix(jnp.asarray(q)))[:, 0]
                                       for q in q_true]))
        odovel = (v_body_x * dt) * (1.0 - odo_scale_err) + rng.normal(
            0, odo_noise * np.sqrt(dt), n)

    imu_data = dict(
        time=t, dt=np.full(n, dt), dtheta=dtheta_m, dvel=dvel_m, odovel=odovel
    )

    # GNSS at integer seconds: antenna position + noise, output geodetic
    from ic_gvins_tpu.core import earth

    gt_times = np.arange(1.0, t[-1], 1.0)
    gnss_blh, gnss_local = [], []
    lever = np.asarray(lever)
    for tg in gt_times:
        i = int(round(tg * rate)) - 1
        R = np.asarray(quat.to_matrix(jnp.asarray(q_true[i])))
        pa = p_true[i] + R @ lever + rng.normal(0, gnss_noise, 3)
        gnss_local.append(pa)
        gnss_blh.append(np.asarray(earth.local2global(jnp.asarray(origin), jnp.asarray(pa))))
    gnss_data = dict(
        time=gt_times,
        blh=np.stack(gnss_blh),
        std=np.full((len(gt_times), 3), gnss_std),
    )
    truth = dict(
        time=t, p=p_true, q=q_true, v=v_true, origin=origin, lever=lever,
        gnss_local=np.stack(gnss_local), iewn=iewn_np,
    )
    return imu_data, gnss_data, truth
