#!/usr/bin/env python3
"""ATE evaluation of TUM-format trajectories (the evo-protocol equivalent the
reference documents for accuracy evaluation, README.md:160-162).

Computes absolute trajectory error after time association and optional
SE(3)/translation-only alignment (Umeyama).

Usage: python scripts/evaluate_ate.py est.csv ref.csv [--align se3|trans|none]
"""

import argparse

import numpy as np


def load_tum(path):
    data = np.loadtxt(path)
    if data.ndim == 1:
        data = data[None]
    return data  # t, x, y, z, qx, qy, qz, qw


def associate(est, ref, max_dt=0.02):
    idx = np.searchsorted(ref[:, 0], est[:, 0])
    idx = np.clip(idx, 1, len(ref) - 1)
    prev = idx - 1
    use_prev = np.abs(ref[prev, 0] - est[:, 0]) < np.abs(ref[idx, 0] - est[:, 0])
    best = np.where(use_prev, prev, idx)
    ok = np.abs(ref[best, 0] - est[:, 0]) <= max_dt
    return est[ok], ref[best[ok]]


def umeyama(src, dst, with_scale=False):
    mu_s, mu_d = src.mean(0), dst.mean(0)
    xs, xd = src - mu_s, dst - mu_d
    C = xd.T @ xs / len(src)
    U, S, Vt = np.linalg.svd(C)
    sgn = np.sign(np.linalg.det(U @ Vt))
    D = np.diag([1.0, 1.0, sgn])
    R = U @ D @ Vt
    s = 1.0
    if with_scale:
        s = np.trace(np.diag(S) @ D) / xs.var(0).sum()
    t = mu_d - s * R @ mu_s
    return s, R, t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("est")
    ap.add_argument("ref")
    ap.add_argument("--align", default="se3", choices=["se3", "trans", "none"])
    ap.add_argument("--max-dt", type=float, default=0.02)
    args = ap.parse_args()

    est, ref = associate(load_tum(args.est), load_tum(args.ref), args.max_dt)
    if len(est) < 3:
        raise SystemExit("too few associated poses")

    pe, pr = est[:, 1:4], ref[:, 1:4]
    if args.align == "se3":
        s, R, t = umeyama(pe, pr)
        pe = (R @ pe.T).T + t
    elif args.align == "trans":
        pe = pe + (pr.mean(0) - pe.mean(0))

    err = np.linalg.norm(pe - pr, axis=1)
    print(f"associated poses : {len(est)}")
    print(f"ATE rmse   [m]   : {np.sqrt(np.mean(err**2)):.4f}")
    print(f"ATE mean   [m]   : {err.mean():.4f}")
    print(f"ATE median [m]   : {np.median(err):.4f}")
    print(f"ATE max    [m]   : {err.max():.4f}")


if __name__ == "__main__":
    main()
