"""Hunt the residual chaotic failure: run GINS once; if ATE bad, dump rich
diagnostics (per-call costs, prior |e0|^2, bias track)."""
import sys, pickle
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
    log.append(dict(kind="opt", ic=float(total_cost(p, t, self.wcfg)),
                    fc=float(total_cost(out[0], t, self.wcfg)),
                    iters=int(np.asarray(getattr(out[2], 'iterations', out[2][0]))),
                    bg=self.mixes[self.n_nodes-1, 3:6].copy(),
                    cap=(jax.tree_util.tree_map(np.asarray, p), jax.tree_util.tree_map(np.asarray, t))))
    return out
est_mod.SlidingWindowEstimator.optimize = popt

orig_marg = est_mod.SlidingWindowEstimator.marginalize
def pmarg(self, num_marg, oldest_kf_node=0, tables=None, params=None):
    t = tables if tables is not None else self.build_tables()
    p = params if params is not None else self.build_params()
    r = orig_marg(self, num_marg, oldest_kf_node, tables=t, params=p)
    log.append(dict(kind="marg", e0sq=float(jnp.sum(self.marg_prior.e0**2)),
                    cap=(jax.tree_util.tree_map(np.asarray, p), jax.tree_util.tree_map(np.asarray, t))))
    return r
est_mod.SlidingWindowEstimator.marginalize = pmarg

orig_re = est_mod.SlidingWindowEstimator.reintegrate_if_needed
def pre_(self, sigma=6.0):
    n = orig_re(self, sigma)
    if n:
        log.append(dict(kind="reint", n=n))
    return n
est_mod.SlidingWindowEstimator.reintegrate_if_needed = pre_

from gins_data import make_gins_dataset
from ic_gvins_tpu.engine.config import parse_config
from ic_gvins_tpu.models.gins import GinsModel

imu_data, gnss_data, truth = make_gins_dataset()
cfg = parse_config(dict(
    initlength=3, imudatarate=200, iswithearth=False,
    antlever=list(truth["lever"]),
    imumodel=dict(arw=0.1, vrw=0.1, gbstd=400.0, abstd=400.0, corrtime=1.0),
    gnssthreshold=20, optimize_windows_size=10,
))
model = GinsModel(cfg)
traj = model.run(imu_data, gnss_data)
rate, offset = 200.0, truth["gnss_local"][0]
errs = np.asarray([
    np.linalg.norm(r[1:4] + offset - truth["p"][int(round(r[0]*rate)) - 1]) for r in traj[2:]
])
print("mean %.4f max %.4f" % (errs.mean(), errs.max()))
if errs.mean() > 0.05:
    for i, d in enumerate(log):
        if d["kind"] == "opt":
            print(f"{i:2d} opt  init {d['ic']:10.3e} final {d['fc']:10.3e} iters {d['iters']:2d} bg {np.round(d['bg'],5)}")
        elif d["kind"] == "marg":
            print(f"{i:2d} marg e0sq {d['e0sq']:10.3e}")
        else:
            print(f"{i:2d} reint n={d['n']}")
    caps = [(d["kind"], d.get("cap")) for d in log]
    pickle.dump((caps, model.wcfg), open("/tmp/hunt_capture.pkl", "wb"))
    print("DUMPED")
