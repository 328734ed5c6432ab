#!/usr/bin/env python3
"""Plot statistics.txt from a replay run (the reference ships the same
analysis tooling: scripts/show_statistics.py plotting the 15-column schema).

Usage: python scripts/show_statistics.py <rundir>/statistics.txt
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

    fig, axes = plt.subplots(3, 2, figsize=(13, 9), sharex=True)

    ax = axes[0, 0]
    ax.plot(t, data[:, 1], ".-", ms=3)
    ax.set_ylabel("keyframe interval [s]")

    ax = axes[0, 1]
    ax.plot(t, data[:, 3], ".-", ms=3)
    ax.set_ylabel("features")

    ax = axes[1, 0]
    ax.plot(t, data[:, 4], label="min")
    ax.plot(t, data[:, 5], label="max")
    ax.plot(t, data[:, 6], label="avg")
    ax.plot(t, data[:, 7], label="rms")
    ax.set_ylabel("reprojection error [px]")
    ax.legend(fontsize=8)

    ax = axes[1, 1]
    ax.plot(t, data[:, 8], label="pass 1")
    ax.plot(t, data[:, 9], label="pass 2")
    ax.set_ylabel("LM iterations")
    ax.legend(fontsize=8)

    ax = axes[2, 0]
    ax.plot(t, data[:, 10], label="opt 1")
    ax.plot(t, data[:, 11], label="opt 2")
    ax.plot(t, data[:, 12], label="marg")
    ax.set_ylabel("time cost [ms]")
    ax.set_xlabel("time [s]")
    ax.legend(fontsize=8)

    ax = axes[2, 1]
    ax.plot(t, data[:, 13], label="mappoint outliers")
    ax.plot(t, data[:, 14], label="feature outliers")
    ax.set_ylabel("outliers")
    ax.set_xlabel("time [s]")
    ax.legend(fontsize=8)

    for a in axes.flat:
        a.grid(True, alpha=0.3)
    out = path.replace(".txt", ".png")
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print(f"wrote {out}")


if __name__ == "__main__":
    main(sys.argv[1])
