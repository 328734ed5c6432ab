"""Convert a KAIST Complex Urban Dataset sequence (urban38/urban39 raw
logs) into the text formats `ic_gvins_tpu.io.dataset` consumes.

The reference ships pre-built ROS bags for urban38/urban39 and ingests them
through fusion_ros.cc:123-234 (IMU rate->increment conversion, deg->rad,
gap-filling happens downstream in ic_gvins.cc:171-183). This converter is
the bag-free equivalent for the PUBLIC raw KAIST layout
(https://sites.google.com/view/complex-urban-dataset):

  sensor_data/xsens_imu.csv   stamp(ns), q(x,y,z,w), euler(x,y,z),
                              gyro(x,y,z rad/s), accel(x,y,z m/s^2),
                              magnet(x,y,z)
  sensor_data/vrs_gps.csv     stamp(ns), lat(deg), lon(deg), x_utm, y_utm,
                              alt(m), fix, n_sat, h_prec, lat_std, lon_std,
                              alt_std, heading_valid, heading, ...
  sensor_data/data_stamp.csv  stamp(ns), sensor_name
  image/stereo_left/<stamp>.png

Outputs (into --out):
  imu.txt    time gx gy gz ax ay az          (rates; load_imu mode="rate")
  gnss.txt   time lat lon h stdn stde stdd   (deg; loader converts to rad)
  frames.txt stamp relative/path.png         (load_frame_index pairs)

Axis convention: IC-GVINS requires front-right-down IMU axes
(/root/reference/README.md:121). The KAIST xsens is mounted x-forward,
y-left, z-up, so the default mapping is (x, -y, -z); override with
--imu-axes for other rigs (e.g. "+x,+y,+z" for an already-FRD unit).

Usage:
  python scripts/convert_kaist.py --seq /data/urban38 --out /data/urban38_txt
"""

import argparse
import csv
import os

import numpy as np

NS = 1e-9


def parse_axes(spec):
    """'+x,-y,-z' -> (3,3) signed permutation applied to raw (x,y,z)."""
    M = np.zeros((3, 3))
    names = {"x": 0, "y": 1, "z": 2}
    parts = spec.split(",")
    if len(parts) != 3:
        raise ValueError(f"bad axis spec {spec!r}: need 3 comma-separated axes")
    for row, p in enumerate(parts):
        p = p.strip().lower()
        sign = -1.0 if p.startswith("-") else 1.0
        axis = p.lstrip("+-")
        if axis not in names:
            raise ValueError(f"bad axis {p!r} in {spec!r}")
        M[row, names[axis]] = sign
    return M


def convert_imu(path, axes, out_path):
    """xsens_imu.csv -> 'time gx gy gz ax ay az' rate rows (FRD axes).

    Emitted as RATES: io.dataset.load_imu(mode='rate') multiplies by dt and
    gap-fills, matching the reference ingest split (fusion_ros.cc:141-158 +
    ic_gvins.cc:171-183)."""
    raw = np.loadtxt(path, delimiter=",", ndmin=2)
    if raw.shape[1] < 14:
        raise ValueError(
            f"{path}: expected >=14 columns (xsens_imu.csv layout), got {raw.shape[1]}")
    t = raw[:, 0] * NS
    gyro = raw[:, 8:11] @ axes.T
    accel = raw[:, 11:14] @ axes.T
    order = np.argsort(t, kind="stable")
    t, gyro, accel = t[order], gyro[order], accel[order]
    keep = np.ones(len(t), bool)
    keep[1:] = np.diff(t) > 0  # drop duplicate stamps
    arr = np.concatenate([t[keep, None], gyro[keep], accel[keep]], axis=1)
    np.savetxt(out_path, arr, fmt="%.9f")
    return arr


def convert_gnss(path, out_path):
    """vrs_gps.csv -> 'time lat lon h stdn stde stdd' (degrees; the io
    loader converts deg->rad exactly like fusion_ros.cc:165-177)."""
    # only the first 12 columns are numeric across KAIST variants (the
    # trailing GNVTG mode column is a letter), so parse exactly those
    try:
        raw = np.loadtxt(path, delimiter=",", usecols=range(12), ndmin=2)
    except ValueError as e:
        raise ValueError(f"{path}: expected >=12 numeric leading columns "
                         f"(vrs_gps.csv layout): {e}") from None
    t = raw[:, 0] * NS
    lat, lon, alt = raw[:, 1], raw[:, 2], raw[:, 5]
    # KAIST stores lat/lon/alt std in meters at columns 9-11; clamp tiny
    # values so a 0-std row cannot produce an infinite-weight factor
    std = np.clip(raw[:, 9:12], 0.01, None)
    # order std as (north, east, down): lat_std->N, lon_std->E, alt_std->D
    arr = np.concatenate([t[:, None], lat[:, None], lon[:, None], alt[:, None], std], axis=1)
    order = np.argsort(t, kind="stable")
    arr = arr[order]
    keep = np.ones(len(arr), bool)
    keep[1:] = np.diff(arr[:, 0]) > 0
    np.savetxt(out_path, arr[keep], fmt="%.9f")
    return arr[keep]


def convert_frames(stamp_csv, image_dir, out_path, sensor="stereo"):
    """data_stamp.csv + image/stereo_left -> 'stamp relpath' frame index.

    Only stamps whose image file actually exists are emitted (KAIST logs
    occasionally stamp frames that were dropped by the capture)."""
    rows = []
    with open(stamp_csv) as f:
        for rec in csv.reader(f):
            if len(rec) >= 2 and rec[1].strip() == sensor:
                rows.append(int(rec[0]))
    rows.sort()
    out = []
    for stamp in rows:
        rel = os.path.join("image", "stereo_left", f"{stamp}.png")
        if image_dir is None or os.path.exists(os.path.join(image_dir, rel)):
            out.append((stamp * NS, rel))
    with open(out_path, "w") as f:
        for t, rel in out:
            f.write(f"{t:.9f} {rel}\n")
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__,
                                 formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--seq", required=True, help="KAIST sequence root (contains sensor_data/)")
    ap.add_argument("--out", required=True, help="output directory for the text logs")
    ap.add_argument("--imu-axes", default="+x,-y,-z",
                    help="raw->FRD axis map (default matches the KAIST xsens mount)")
    ap.add_argument("--gps", default="vrs_gps.csv",
                    help="GNSS csv under sensor_data/ (vrs_gps.csv or gps.csv)")
    ap.add_argument("--skip-frames", action="store_true",
                    help="skip the frame index (images not downloaded)")
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    axes = parse_axes(args.imu_axes)
    imu = convert_imu(os.path.join(args.seq, "sensor_data", "xsens_imu.csv"),
                      axes, os.path.join(args.out, "imu.txt"))
    gnss = convert_gnss(os.path.join(args.seq, "sensor_data", args.gps),
                        os.path.join(args.out, "gnss.txt"))
    n_frames = 0
    if not args.skip_frames:
        frames = convert_frames(os.path.join(args.seq, "sensor_data", "data_stamp.csv"),
                                args.seq, os.path.join(args.out, "frames.txt"))
        n_frames = len(frames)
    print(f"imu: {len(imu)} rows  gnss: {len(gnss)} rows  frames: {n_frames}")
    print(f"Run: python scripts/run_gvins.py --config <gvins.yaml> "
          f"--imu {args.out}/imu.txt --imu-mode rate "
          f"--gnss {args.out}/gnss.txt --frames {args.out}/frames.txt "
          f"--imagedir {args.seq}")


if __name__ == "__main__":
    main()
