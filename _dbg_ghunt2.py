"""GVINS e2e with per-step diagnostics: costs, GNSS std inflation, prior
|e0|^2, landmark counts."""
import sys
sys.path.insert(0, "/root/repo/tests"); sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp

from ic_gvins_tpu.engine import estimator as est_mod
from ic_gvins_tpu.solver.problem import total_cost

log = []
orig_opt = est_mod.SlidingWindowEstimator.optimize
def popt(self, num_iterations=50, *, two_pass=False, tables=None, params=None):
    t = tables if tables is not None else self.build_tables()
    p = params if params is not None else self.build_params()
    out = orig_opt(self, num_iterations, two_pass=two_pass, tables=t, params=p)
    gstd = np.asarray(t.gnss.std)
    gval = np.asarray(t.gnss.valid) > 0
    e0sq = float(jnp.sum(self.marg_prior.e0**2)) if self.marg_prior is not None else 0.0
    stats = out[2]
    extra = ""
    if two_pass and isinstance(stats, tuple) and len(stats) == 4:
        extra = f" gout={int(stats[2])} rout={int(stats[3])}"
    log.append(f"opt2p={int(two_pass)} init {float(total_cost(p, t, self.wcfg)):10.3e} "
               f"final {float(total_cost(out[0], out[1] if two_pass else t, self.wcfg)):10.3e} "
               f"gnss_std_max {gstd[gval].max() if gval.any() else 0:8.3f} e0sq {e0sq:9.3e}{extra}")
    return out
est_mod.SlidingWindowEstimator.optimize = popt

margcaps = []
orig_marg = est_mod.SlidingWindowEstimator.marginalize
def pmarg(self, num_marg, oldest_kf_node=0, tables=None, params=None):
    t = tables if tables is not None else self.build_tables()
    p = params if params is not None else self.build_params()
    r = orig_marg(self, num_marg, oldest_kf_node, tables=t, params=p)
    e0sq = float(jnp.sum(self.marg_prior.e0**2))
    margcaps.append((jax.tree_util.tree_map(np.asarray, p),
                     jax.tree_util.tree_map(np.asarray, t),
                     num_marg, oldest_kf_node, e0sq, self.wcfg))
    log.append(f"marg oldest_kf_node={oldest_kf_node} e0sq {e0sq:10.3e}")
    return r
est_mod.SlidingWindowEstimator.marginalize = pmarg

import test_gvins_e2e as T
from gins_data import make_gins_dataset
from ic_gvins_tpu.core import quaternion as quat
from ic_gvins_tpu.engine.config import parse_config
from ic_gvins_tpu.models.gvins import GvinsModel
from ic_gvins_tpu.vision import camera as vcam

imu_data, gnss_data, truth = make_gins_dataset()
cfg = parse_config(dict(
    initlength=3, imudatarate=200, iswithearth=False,
    antlever=list(truth["lever"]),
    imumodel=dict(arw=0.1, vrw=0.1, gbstd=400.0, abstd=400.0, corrtime=1.0),
    gnssthreshold=20, optimize_windows_size=8, optimize_num_iterations=20,
    optimize_estimate_extrinsic=False, optimize_estimate_td=False,
    track_min_parallax=20, track_max_interval=0.5, track_max_features=120,
    reprojection_error_std=1.5, node_slots=20, landmark_slots=256,
    gnss_slots=20, reproj_slots=1024,
    cam0=dict(intrinsic=[T.FX, T.FX, 160.0, 120.0], distortion=[-0.05, 0.01, 0.0, 0.0],
              resolution=[T.W, T.H], q_b_c=[0.0, 0.0, 0.0, 1.0], t_b_c=[0.0, 0.0, 0.0],
              td_b_c=0.0),
))
rng = np.random.default_rng(42)
n_pts = 800
pts_w = np.stack([rng.uniform(-10, 55, n_pts), rng.uniform(-25, 25, n_pts),
                  rng.uniform(9, 13, n_pts)], axis=1)
camera = vcam.PinholeCamera.from_config([T.FX, T.FX, 160.0, 120.0],
                                        [-0.05, 0.01, 0.0, 0.0], [T.W, T.H])
frame_times = np.arange(0.05, imu_data["time"][-1] - 0.2, 0.1)
rate = 200.0
offset = truth["gnss_local"][0]

def image_provider(k):
    t = frame_times[k]
    i = min(int(round(t * rate)) - 1, len(truth["p"]) - 1)
    Rwb = np.asarray(quat.to_matrix(jnp.asarray(truth["q"][i])))
    return T.render_frame(camera, pts_w, Rwb, truth["p"][i])

model = GvinsModel(cfg)
traj = model.run(imu_data, gnss_data, frame_times, image_provider)
errs = []
for row in traj:
    t, p = row[0], row[1:4]
    i = int(round(t * rate)) - 1
    if 0 <= i < len(truth["p"]):
        errs.append(np.linalg.norm(p + offset - truth["p"][i]))
errs = np.asarray(errs)
print("mean %.4f max %.4f  landmarks %d" % (errs.mean(), errs.max(), len(model.vmap.landmarks)))
print("errs:", np.round(errs, 3))
for i, line in enumerate(log):
    print(f"{i:3d} {line}")
import pickle
bad = [mc for mc in margcaps if mc[4] > 100.0]
pickle.dump(bad[:3], open("/tmp/gmarg_bad.pkl", "wb"))
print("dumped", len(bad[:3]), "bad margs of", len(margcaps))
