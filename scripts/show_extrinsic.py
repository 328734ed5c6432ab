#!/usr/bin/env python3
"""Plot extrinsic.txt (camera-IMU extrinsic/time-delay estimates over time).

Schema (ic_gvins.cc:1332-1345): stamp, t_b_c xyz, euler rpy [deg], td [s].

Usage: python scripts/show_extrinsic.py <rundir>/extrinsic.txt
"""

import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


def main(path):
    data = np.loadtxt(path)
    if data.ndim == 1:
        data = data[None]
    t = data[:, 0] - data[0, 0]

    fig, axes = plt.subplots(3, 1, figsize=(10, 8), sharex=True)
    for k, lab in enumerate("xyz"):
        axes[0].plot(t, data[:, 1 + k], label=f"t_{lab}")
    axes[0].set_ylabel("translation [m]")
    axes[0].legend(fontsize=8)

    for k, lab in enumerate(["roll", "pitch", "yaw"]):
        axes[1].plot(t, data[:, 4 + k], label=lab)
    axes[1].set_ylabel("attitude [deg]")
    axes[1].legend(fontsize=8)

    axes[2].plot(t, data[:, 7] * 1000.0)
    axes[2].set_ylabel("time delay [ms]")
    axes[2].set_xlabel("time [s]")

    for a in axes:
        a.grid(True, alpha=0.3)
    out = path.replace(".txt", ".png")
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print(f"wrote {out}")


if __name__ == "__main__":
    main(sys.argv[1])
