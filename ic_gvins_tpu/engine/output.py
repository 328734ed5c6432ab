"""Result-file writers with the reference schemas.

These files are the comparison interface against the C++ baseline
(SURVEY.md §5.5): gvins.nav (misc.cc:437-454), IMU_ERR.bin (misc.cc:456-482,
binary doubles), trajectory.csv (TUM-style, misc.cc:484-498),
statistics.txt (ic_gvins.cc:930-1033), extrinsic.txt (ic_gvins.cc:1332-1345),
mappoint.txt (ic_gvins.cc:1664-1670), tracking.txt (tracking.cc:296-315).

Text formatting matches FileSaver::dump's "%-15.9lf " columns
(fileio/filesaver.cc:51-66).
"""

import math
import os
import struct

import numpy as np

R2D = 180.0 / math.pi


class TextWriter:
    def __init__(self, path):
        self.f = open(path, "w")

    def dump(self, values):
        self.f.write(" ".join(f"{v:<15.9f}" for v in values).rstrip() + "\n")

    def flush(self):
        self.f.flush()

    def close(self):
        self.f.close()


class BinaryWriter:
    def __init__(self, path):
        self.f = open(path, "wb")

    def dump(self, values):
        self.f.write(struct.pack(f"<{len(values)}d", *values))

    def flush(self):
        self.f.flush()

    def close(self):
        self.f.close()


class OutputFiles:
    """The result-file set created by the GVINS ctor (ic_gvins.cc:62-67)."""

    def __init__(self, outdir):
        os.makedirs(outdir, exist_ok=True)
        self.outdir = outdir
        self.nav = TextWriter(os.path.join(outdir, "gvins.nav"))
        self.mappoint = TextWriter(os.path.join(outdir, "mappoint.txt"))
        self.statistics = TextWriter(os.path.join(outdir, "statistics.txt"))
        self.extrinsic = TextWriter(os.path.join(outdir, "extrinsic.txt"))
        self.imuerr = BinaryWriter(os.path.join(outdir, "IMU_ERR.bin"))
        self.trajectory = TextWriter(os.path.join(outdir, "trajectory.csv"))
        self.tracking = TextWriter(os.path.join(outdir, "tracking.txt"))
        self._nav_counter = 0

    def write_nav(self, origin, time, p, q_xyzw, v, bg, ba, sodo=0.0, decimate=10):
        """Nav/err/trajectory output at 1-in-``decimate`` IMU rate
        (misc.cc:417-499). p/q in the local frame; origin = blh of the
        world origin for global conversion."""
        self._nav_counter += 1
        if (self._nav_counter - 1) % decimate:
            return
        from ..core import earth, quaternion as quat
        import jax.numpy as jnp

        R_local = np.asarray(quat.to_matrix(jnp.asarray(q_xyzw)))
        blh, Rg = earth.local2global_pose(jnp.asarray(origin), jnp.asarray(R_local), jnp.asarray(p))
        blh = np.asarray(blh)
        att = np.asarray(quat.matrix_to_euler(Rg)) * R2D
        pos = blh.copy()
        pos[:2] *= R2D

        self.nav.dump([0, time, pos[0], pos[1], pos[2], v[0], v[1], v[2], att[0], att[1], att[2]])
        self.nav.flush()

        bg_out = np.asarray(bg) * R2D * 3600.0
        ba_out = np.asarray(ba) * 1e5
        self.imuerr.dump([time, *bg_out, *ba_out, sodo])
        self.imuerr.flush()

        self.trajectory.dump([time, p[0], p[1], p[2], q_xyzw[0], q_xyzw[1], q_xyzw[2], q_xyzw[3]])

    def write_statistics(self, row):
        self.statistics.dump(row)
        self.statistics.flush()

    def write_extrinsic(self, time, t_b_c, euler_deg, td):
        self.extrinsic.dump([time, *t_b_c, *euler_deg, td])
        self.extrinsic.flush()

    def write_mappoint(self, pw):
        self.mappoint.dump([pw[0], pw[1], pw[2]])

    def write_tracking(self, row):
        self.tracking.dump(row)
        self.tracking.flush()

    def close(self):
        for w in (self.nav, self.mappoint, self.statistics, self.extrinsic,
                  self.imuerr, self.trajectory, self.tracking):
            w.close()
