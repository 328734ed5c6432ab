#!/usr/bin/env python3
"""CLI replay entry point (the main() / FusionROS::run equivalent,
ROS/fusion_ros.cc:52-121, 260-281): load gvins.yaml, load the dataset,
run the selected model, write the result files.

Usage:
  python scripts/run_gvins.py --config gvins.yaml --imu imu.txt --gnss gnss.txt \
      [--frames frames.txt --imagedir imgs/] [--model gvins|gins] \
      [--imu-mode increment|rate] [--output outdir]

Dataset formats (ic_gvins_tpu/io/dataset.py):
  imu.txt    time gx gy gz ax ay az [odovel]   (increment or rate form)
  gnss.txt   time lat(deg) lon(deg) h std_n std_e std_d
  frames.txt one stamp per line [optional filename column]
"""

import argparse
import datetime
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--imu", required=True)
    ap.add_argument("--gnss", required=True)
    ap.add_argument("--frames")
    ap.add_argument("--imagedir")
    ap.add_argument("--model", default="gvins", choices=["gvins", "gins"])
    ap.add_argument("--imu-mode", default="increment", choices=["increment", "rate"])
    ap.add_argument("--output")
    ap.add_argument("--cpu", action="store_true", help="pin to CPU backend")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from ic_gvins_tpu.engine.config import load_config
    from ic_gvins_tpu.io import dataset
    from ic_gvins_tpu.utils import logger

    cfg = load_config(args.config)

    outdir = args.output or cfg.outputpath or "./gvins_output"
    if cfg.is_make_outputdir:
        stamp = datetime.datetime.now().strftime("%Y%m%d%H%M%S")
        outdir = os.path.join(outdir, stamp)
    os.makedirs(outdir, exist_ok=True)
    shutil.copy(args.config, os.path.join(outdir, "gvins.yaml"))
    log = logger.initialize(outdir)

    log.info(f"loading IMU {args.imu}")
    imu = dataset.load_imu(args.imu, cfg.imudatarate, mode=args.imu_mode)
    log.info(f"loaded {len(imu['time'])} IMU samples")
    gnss = dataset.load_gnss(args.gnss)
    log.info(f"loaded {len(gnss['time'])} GNSS fixes")

    if args.model == "gins" or not args.frames:
        from ic_gvins_tpu.models.gins import GinsModel

        model = GinsModel(cfg, outdir=outdir)
        traj = model.run(imu, gnss)
    else:
        from ic_gvins_tpu.models.gvins import GvinsModel

        times, provider = dataset.load_frame_index(args.frames, args.imagedir)
        log.info(f"loaded {len(times)} frame stamps")
        model = GvinsModel(cfg, outdir=outdir)
        traj = model.run(imu, gnss, times, provider)

    log.info(f"replay finished: {len(traj)} trajectory nodes, state={model.state}")
    log.info(f"results in {outdir}")


if __name__ == "__main__":
    main()
