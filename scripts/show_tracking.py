#!/usr/bin/env python3
"""Plot tracking.txt (keyframe cadence, parallax, relative motion, features).

Schema (tracking.cc:296-315): stamp, dt, parallax, rel_translation,
rel_rotation, features, cost_ms.

Usage: python scripts/show_tracking.py <rundir>/tracking.txt
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

    fig, axes = plt.subplots(3, 2, figsize=(13, 8), sharex=True)
    labels = [
        (1, "keyframe dt [s]"),
        (2, "parallax [px]"),
        (3, "rel translation [m]"),
        (4, "rel rotation [deg]"),
        (5, "features"),
        (6, "tracking cost [ms]"),
    ]
    for ax, (col, lab) in zip(axes.flat, labels):
        ax.plot(t, data[:, col], ".-", ms=3)
        ax.set_ylabel(lab)
        ax.grid(True, alpha=0.3)
    axes[2, 0].set_xlabel("time [s]")
    axes[2, 1].set_xlabel("time [s]")
    out = path.replace(".txt", ".png")
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print(f"wrote {out}")


if __name__ == "__main__":
    main(sys.argv[1])
