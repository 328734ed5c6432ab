"""INS-aided visual tracking frontend.

Behavioral parity with Tracking (tracking/tracking.{h,cc}): CLAHE
preprocess + optional histogram gate, landmark tracking with pose-prior
prediction, rotation-compensated reference-frame tracking, forward/backward
LK consistency, fundamental-RANSAC culling, parallax-driven keyframe policy
(min parallax 20 px weighted across landmark/reference tracks; observation
frames on >0.475 s gaps), two-view DLT triangulation with depth/reprojection
gating, blockwise masked Shi-Tomasi replenishment.

Architecture: the per-frame image math (CLAHE, pyramid, two bidirectional LK
batches, RANSAC, triangulation, detection) runs as a handful of fixed-shape
batched device kernels over padded feature tables; the feature/landmark
graph bookkeeping stays on host (vision/map.py).

Constants (tracking.h:112-115): 200 px detection blocks, 3+1 pyramid levels,
10 px triangulation parallax, 0.08 s min observation interval.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from . import camera as cam
from . import features as feat
from . import lk, pyramid, ransac
from .map import (
    KEYFRAME_NONE,
    KEYFRAME_NORMAL,
    KEYFRAME_REMOVE_OLDEST,
    KEYFRAME_REMOVE_SECOND_NEW,
    MAPPOINT_TRIANGULATED,
    FARTHEST_DEPTH,
    NEAREST_DEPTH,
    Landmark,
    Observation,
    VFrame,
    VisualMap,
)

TRACK_BLOCK_SIZE = 200.0
TRACK_MIN_PARALLAX = 10.0
TRACK_MIN_INTERVAL = 0.08

# track() return states (tracking.h:38-44)
TRACK_FIRST_FRAME = 0
TRACK_INITIALIZING = 1
TRACK_TRACKING = 2
TRACK_PASSED = 3
TRACK_LOST = 4

# --------------------------------------------------------------------------
# module-level jitted stages: compile caches shared across Tracker instances
# (shapes/static config are part of the jit cache key)
# --------------------------------------------------------------------------

import functools as _functools

def _pyr_body(img):
    """CLAHE + pyramid + the histogram-gate centroid in ONE dispatch.

    The f64->f32 conversion and the full-image mean (tracking.cc:88-105's
    histogram centroid equals mean/256 exactly) used to run host-side —
    ~1-2 ms/frame of pure numpy at production 1278x1022, and the only host
    costs that scaled with resolution."""
    img32 = img.astype(jnp.float32)
    return pyramid.build_pyramid(pyramid.clahe(img32), lk.PYRAMID_LEVELS), jnp.mean(img32)


_pyr_jit = jax.jit(_pyr_body)
_ransac_jit = jax.jit(ransac.fundamental_ransac)
_tri_jit = jax.jit(ransac.triangulate_batch)


def _cam_from_vec(cam_vec):
    return cam.PinholeCamera(*[cam_vec[i] for i in range(10)], width=0, height=0)


@jax.jit
def _undis_jit(cam_vec, pts):
    """Batched iterative undistortion with camera params as a traced vector
    (fx..p2 packed): one fused dispatch instead of the ~110 numpy ops of the
    host-path loop (~0.33 ms -> ~0.05 ms per call on the frame path)."""
    return cam.undistort_points(_cam_from_vec(cam_vec), pts)


@jax.jit
def _lk_jit(cam_vec, pyr_prev, pyr_next, pts_prev, pts_pred, valid):
    """Bidirectional LK + undistortion of the tracked endpoints in ONE
    dispatch. The separate per-frame _undis dispatches on the LK output were
    ~1 ms/frame of pure host dispatch (round-5 section profile)."""
    nxt, ok = lk.track_bidirectional(pyr_prev, pyr_next, pts_prev, pts_pred, valid)
    und = cam.undistort_points(_cam_from_vec(cam_vec), nxt.astype(jnp.float64))
    return nxt, ok, und


def _detect_body(cam_vec, img, mask, counts, block_rows, block_cols, per_block, min_distance):
    corners, resp, valid = feat.detect_blockwise(
        img, mask, counts, block_rows=block_rows, block_cols=block_cols,
        per_block=per_block, min_distance=min_distance)
    corners = feat.corner_subpix(img, corners, valid)
    und = cam.undistort_points(_cam_from_vec(cam_vec),
                               corners.astype(jnp.float64))
    return corners, valid, und


@_functools.partial(jax.jit, static_argnums=(5, 6, 7, 8))
def _detect_jit(cam_vec, img, pts, wts, counts, block_rows, block_cols, per_block, min_distance):
    """Fused occupancy-mask + blockwise Shi-Tomasi + subpixel refine +
    undistortion of the new corners."""
    mask = feat.occupancy_mask(pts, wts, img.shape, min_distance)
    return _detect_body(cam_vec, img, mask, counts, block_rows, block_cols, per_block, min_distance)


@_functools.partial(jax.jit, static_argnums=(3, 4, 5, 6))
def _detect_nomask_jit(cam_vec, img, counts, block_rows, block_cols, per_block, min_distance):
    return _detect_body(cam_vec, img, jnp.ones_like(img), counts,
                        block_rows, block_cols, per_block, min_distance)


class Tracker:
    def __init__(self, camera: cam.PinholeCamera, vmap: VisualMap, cfg, F_MAX=None):
        """cfg: GvinsConfig (track_* + reprojection_error_std fields)."""
        self.cam = camera
        self.map = vmap

        self.check_histogram = cfg.track_check_histogram
        self.min_parallax = cfg.track_min_parallax
        self.max_features = cfg.track_max_features
        # feature-slot table sized to the configured budget (power-of-two
        # padding): LK cost is linear in slots, so a fixed 512 wastes ~2x
        # at the reference's track_max_features=200
        if F_MAX is None:
            F_MAX = 64
            while F_MAX < cfg.track_max_features * 1.25:
                F_MAX *= 2
        self.F_MAX = F_MAX
        self.max_interval = cfg.track_max_interval * 0.95
        self.reproj_std = cfg.reprojection_error_std

        self.block_cols = max(int(round(camera.width / TRACK_BLOCK_SIZE)), 1)
        self.block_rows = max(int(round(camera.height / TRACK_BLOCK_SIZE)), 1)
        blocks = self.block_cols * self.block_rows
        self.per_block = max(int(round(self.max_features / blocks)), 1)
        self.min_pixel_distance = int(round(TRACK_BLOCK_SIZE / math.sqrt(self.per_block * 1.5)))

        self.frame_cur = None
        self.frame_pre = None
        self.frame_ref = None
        self.last_keyframe = None
        self.pyr_cur = None
        self.pyr_pre = None

        self.initializing = True
        self.is_new_keyframe = False
        self.histogram = 0.0
        self.passed_cnt = 0

        # reference-track feature table (host): struct-of-arrays numpy, one
        # row per live feature. und_* mirror pts_* with cached undistorted
        # pixels (recomputing the iterative undistortion for the SAME points
        # 5+ times per frame cost ~1.6 ms/frame); ref_ids mirrors
        # ref_frames[k].id so per-feature "is newer than the reference
        # keyframe" checks are single vectorized compares instead of python
        # attribute walks (round-4 host profile: the per-feature list
        # comprehensions were ~3 ms/frame of the 10.7 ms host budget)
        self.pts_ref = np.zeros((0, 2))   # distorted px in the ref frame
        self.pts_new = np.zeros((0, 2))   # distorted px at latest tracked frame
        self.und_ref = np.zeros((0, 2))   # undistorted px of pts_ref (cache)
        self.und_new = np.zeros((0, 2))   # undistorted px of pts_new (cache)
        self.und_cur = np.zeros((0, 2))   # undistorted px of pts_cur (cache)
        self.ref_frames = np.zeros(0, object)  # VFrame the feature was created in
        self.ref_ids = np.zeros(0, np.int64)   # ref_frames[k].id mirror
        self.vel_ref = np.zeros((0, 2))   # normalized-plane velocity at ref

        self.parallax_map = 0.0
        self.parallax_map_counts = 0
        self.parallax_ref = 0.0
        self.parallax_ref_counts = 0
        self.tracked_mappoints = []
        self.logging_row = None
        self.track_ms = 0.0

        # jitted fixed-shape device stages (module-level, shared caches —
        # see _pyr_jit etc. below). Eager per-frame op dispatch re-traces
        # every call (the subpix/RANSAC while_loops even re-COMPILE), and
        # the triangulation/occupancy call sites had data-dependent shapes —
        # at replay rate that cost seconds per frame of pure tracing and
        # compilation. Per-instance jit lambdas are just as bad: every new
        # Tracker/model instance recompiles everything.
        self._jit_pyr = _pyr_jit
        self._jit_lk = _lk_jit
        self._jit_ransac = _ransac_jit
        self._jit_tri = _tri_jit
        self._detect_static = (self.block_rows, self.block_cols,
                               self.per_block, self.min_pixel_distance)
        self._cam_vec = jnp.asarray([
            camera.fx, camera.fy, camera.cx, camera.cy, camera.skew,
            camera.k1, camera.k2, camera.k3, camera.p1, camera.p2])

    def _jit_detect(self, img, pts, wts, counts):
        return _detect_jit(self._cam_vec, img, pts, wts, counts,
                           *self._detect_static)

    def _jit_detect_nomask(self, img, counts):
        return _detect_nomask_jit(self._cam_vec, img, counts,
                                  *self._detect_static)

    # ------------------------------------------------------------------
    # helpers
    # ------------------------------------------------------------------

    # host camera math is pure numpy (vision/camera.py dispatches on the
    # array type) — the frame path used to pay one device dispatch per
    # conversion, thousands per second of pure latency at 200 features

    def _undis(self, pts):
        n = len(pts)
        if n == 0:
            return np.zeros((0, 2))
        # fixed-shape padded device call (varying shapes would recompile per
        # distinct count); cx/cy padding keeps the fixed point at the origin
        m = self.F_MAX
        if n > m:  # degenerate oversize: fall back to host math
            return cam.undistort_points(self.cam, np.asarray(pts, np.float64))
        buf = np.tile(np.array([self.cam.cx, self.cam.cy]), (m, 1))
        buf[:n] = pts
        return np.asarray(_undis_jit(self._cam_vec, buf))[:n]

    def _dis(self, pts):
        if len(pts) == 0:
            return np.zeros((0, 2))
        return cam.distort_points(self.cam, np.asarray(pts, np.float64))

    def _pixel2cam(self, pts):
        return cam.pixel2cam(self.cam, np.asarray(pts, np.float64))

    def _pad(self, pts, n=None):
        n = n or self.F_MAX
        out = np.zeros((n, 2))
        v = np.zeros(n)
        k = min(len(pts), n)
        if k:
            out[:k] = pts[:k]
            v[:k] = 1.0
        return out, v

    def _keypoint_parallax(self, und0, und1, R0, R1):
        """Rotation-compensated pixel parallax (tracking.cc:861-871).
        und0/und1: (...,2) undistorted pixels; R0 may be batched (n,3,3)."""
        pc0 = self._pixel2cam(np.atleast_2d(und0))
        pc1 = self._pixel2cam(np.atleast_2d(und1))
        if np.ndim(R0) == 3:
            pc01 = np.einsum("ij,njk,nk->ni", R1.T, R0, pc0)
        else:
            pc01 = pc0 @ (R1.T @ R0).T
        d = pc01[:, :2] / pc01[:, 2:3] - pc1[:, :2]
        return np.linalg.norm(d, axis=1) * float(self.cam.focal_length)

    def _track_pairs(self, pts_prev, pts_pred):
        """Bidirectional LK on padded tables; returns (next_pts, ok) trimmed."""
        [(nxt, ok, _)] = self._lk_fused([(np.asarray(pts_prev), np.asarray(pts_pred))])
        return nxt, ok

    def _lk_fused(self, sets):
        """ONE bidirectional LK over several feature sets packed into a
        single padded table. The reference issues one calcOpticalFlowPyrLK
        per set (landmark tracks + reference tracks, tracking.cc:385-393,
        528-536) but the union is bounded by track_max_features — two
        full-size padded batches would double the device work.

        sets: [(pts_prev (n,2), pts_pred (n,2)), ...] with sum(n) <= F_MAX
        (overflow slots are shed as failed tracks).
        Returns [(next (n,2) f64, ok (n,) bool, und (n,2) f64), ...] where
        und is the undistorted next point (computed in the same dispatch)."""
        n = self.F_MAX
        # f32/bool numpy temporaries passed DIRECTLY to the jit: an eager
        # jnp.asarray costs ~120 us of dispatch per array on CPU, while the
        # jit's own argument conversion is ~20 us — and these are fresh
        # per-call arrays never mutated afterwards, so the zero-copy
        # aliasing hazard (see estimator.build_params) cannot bite
        pp = np.zeros((n, 2), np.float32)
        pd = np.zeros((n, 2), np.float32)
        v = np.zeros(n, bool)
        offs = []
        off = 0
        for p, q in sets:
            k = min(len(p), n - off)
            offs.append((off, k))
            if k:
                pp[off : off + k] = p[:k]
                pd[off : off + k] = q[:k]
                v[off : off + k] = True
            off += k
        nxt, ok, und = self._jit_lk(self._cam_vec, self.pyr_pre, self.pyr_cur,
                                    pp, pd, v)
        nxt = np.asarray(nxt, np.float64)
        okn = np.asarray(ok)
        undn = np.asarray(und, np.float64)
        out = []
        for (off, k), (p, _q) in zip(offs, sets):
            m = len(p)
            nx = np.zeros((m, 2))
            good = np.zeros(m, bool)
            un = np.zeros((m, 2))
            nx[:k] = nxt[off : off + k]
            good[:k] = okn[off : off + k]
            un[:k] = undn[off : off + k]
            out.append((nx, good, un))
        return out

    # ------------------------------------------------------------------
    # main entry
    # ------------------------------------------------------------------

    def track(self, frame: VFrame, image):
        """image: (H,W) grayscale array (0..255). Wall time of the whole
        call is recorded in ``track_ms`` (tracking.txt col 7,
        tracking.cc:309-315)."""
        import time as _time

        t0 = _time.perf_counter()
        try:
            return self._track_impl(frame, image)
        finally:
            self.track_ms = (_time.perf_counter() - t0) * 1000.0

    def _track_impl(self, frame: VFrame, image):
        self.is_new_keyframe = False
        self.logging_row = None

        # one dispatch: CLAHE + pyramid + image mean (device-side; the
        # host-side np.mean + f32 copy cost ~1-2 ms/frame at 1278x1022)
        pyr_new, img_mean = self._jit_pyr(np.ascontiguousarray(image))

        if self.check_histogram:
            # the reference's histogram centroid sum(h_k * k/256)/N equals
            # mean(image)/256 exactly (tracking.cc:88-105)
            hist = float(img_mean) / 256.0
            if self.histogram != 0.0:
                rate = abs((hist - self.histogram) / self.histogram)
                if rate > 0.1:
                    self.passed_cnt += 1
                    if self.passed_cnt > 1:
                        self.histogram = 0.0
                    return TRACK_PASSED
            self.histogram = hist

        self.frame_pre = self.frame_cur
        self.frame_cur = frame
        self.pyr_pre = self.pyr_cur
        self.pyr_cur = pyr_new
        frame.pyr = self.pyr_cur  # frames own their pyramid for re-detection

        if self.initializing:
            return self._track_initializing()
        return self._track_normal()

    def _track_initializing(self):
        if self.frame_ref is None:
            self._reset_tracking_state()
            self.frame_ref = self.frame_cur
            self.features_detection(self.frame_ref, ismask=False)
            return TRACK_FIRST_FRAME

        if len(self.pts_ref) == 0:
            # nothing detected on the previous reference: re-reference to
            # the LIVE frame (the reference always detects on the newest
            # image, tracking.cc:115-133). Detecting on the stale frame_ref
            # image could fail forever — e.g. a featureless loss frame —
            # and permanently wedge re-initialization.
            self._reset_tracking_state()
            self.frame_ref = self.frame_cur
            self.features_detection(self.frame_ref, ismask=False)
            return TRACK_FIRST_FRAME

        self.track_reference_frame()

        if self.parallax_ref < self.min_parallax:
            return TRACK_INITIALIZING

        self.triangulation()

        if self._do_reset_tracking():
            self._make_new_frame(KEYFRAME_NORMAL)
            return TRACK_FIRST_FRAME

        self.frame_ref.set_keyframe(KEYFRAME_NORMAL)
        self._make_new_frame(KEYFRAME_NORMAL)
        self.last_keyframe = self.frame_cur
        self.initializing = False
        return TRACK_TRACKING

    def _track_normal(self):
        # ONE fused LK batch for both stages (see _lk_fused)
        map_prep = self._prepare_mappoint_tracking()
        ref_prep = self._prepare_reference_tracking()
        sets = []
        if map_prep is not None:
            sets.append((map_prep[1], map_prep[3]))
        if ref_prep is not None:
            sets.append(ref_prep)
        results = self._lk_fused(sets) if sets else []
        i = 0
        if map_prep is not None:
            self._finish_mappoint_tracking(map_prep, *results[i])
            i += 1
        if ref_prep is not None:
            self._finish_reference_tracking(ref_prep[0], *results[i])
            i += 1

        kf_state = self.check_keyframe_state()

        if kf_state in (KEYFRAME_NORMAL, KEYFRAME_REMOVE_OLDEST):
            self.triangulation()
        else:
            self.features_detection(self.frame_cur, ismask=True)

        if self._do_reset_tracking():
            self._make_new_frame(KEYFRAME_NORMAL)
            return TRACK_LOST

        if kf_state != KEYFRAME_NONE:
            self._make_new_frame(kf_state)

        return TRACK_TRACKING

    # ------------------------------------------------------------------
    # stages
    # ------------------------------------------------------------------

    def track_mappoints(self):
        """tracking.cc:351-455 (standalone path; the normal frame loop runs
        the fused prepare/finish halves around one LK batch)."""
        prep = self._prepare_mappoint_tracking()
        if prep is None:
            return False
        [(nxt, ok, und)] = self._lk_fused([(prep[1], prep[3])])
        return self._finish_mappoint_tracking(prep, nxt, ok, und)

    def _prepare_mappoint_tracking(self):
        self.tracked_mappoints = []
        self.parallax_map = 0.0
        self.parallax_map_counts = 0

        prev_feats = [
            (lm_id, obs)
            for lm_id, obs in self.frame_pre.features.items()
            if lm_id in self.map.landmarks and not self.map.landmarks[lm_id].outlier
        ]
        if not prev_feats:
            return None

        lms = [self.map.landmarks[lm_id] for lm_id, _ in prev_feats]
        pts_prev_dis = np.stack([obs.dis for _, obs in prev_feats])
        pts_prev_und = np.stack([obs.undis for _, obs in prev_feats])

        # predict from landmark positions through the frame's INS prior pose
        pos_w = np.stack([lm.pos for lm in lms])
        pc = (pos_w - self.frame_cur.t) @ self.frame_cur.R
        pred_und = cam.cam2pixel(self.cam, pc)
        pred_dis = self._dis(pred_und)
        return lms, pts_prev_dis, pts_prev_und, pred_dis

    def _finish_mappoint_tracking(self, prep, nxt, ok, und):
        lms, pts_prev_dis, pts_prev_und, _pred = prep
        if not ok.any():
            return False

        matched_dis = nxt[ok]
        matched_und = und[ok]
        kept_lms = [lm for lm, o in zip(lms, ok) if o]
        kept_prev_und = pts_prev_und[ok]

        dt = self.frame_cur.stamp - self.frame_pre.stamp
        pc_cur = self._pixel2cam(matched_und)
        pc_prev = self._pixel2cam(kept_prev_und)
        vel = (pc_cur[:, :2] - pc_prev[:, :2]) / dt

        self.frame_cur.features = {}
        for lm, und, dis, v in zip(kept_lms, matched_und, matched_dis, vel):
            obs = Observation(self.frame_cur, lm.id, und, dis, v, 0)
            lm.add_observation(obs)
            self.frame_cur.features[lm.id] = obs
            self.tracked_mappoints.append(lm)
        # undistorted rows of frame_cur.features in dict order — lets
        # features_detection's per-block count skip the ~200-object dict
        # walk on non-keyframe frames (guarded by a length check there)
        self._cur_feat_und = matched_und

        self.parallax_map_counts = self._parallax_from_ref_mappoints()
        return True

    def _parallax_from_ref_mappoints(self):
        """tracking.cc:873-905: average parallax between each landmark's
        observation in frame_ref and its newest observation in frame_cur."""
        und0, und1 = [], []
        for lm_id, obs_ref in self.frame_ref.features.items():
            lm = self.map.landmarks.get(lm_id)
            if lm is None or lm.outlier or not lm.observations:
                continue
            newest = lm.observations[-1]
            if newest.frame is self.frame_cur and not newest.outlier:
                und0.append(obs_ref.undis)
                und1.append(newest.undis)
        if not und0:
            self.parallax_map = 0.0
            return 0
        par = self._keypoint_parallax(
            np.stack(und0), np.stack(und1), self.frame_ref.R, self.frame_cur.R
        )
        self.parallax_map = float(par.mean())
        return len(und0)

    def track_reference_frame(self):
        """tracking.cc:457-574 (standalone path; the normal frame loop runs
        the fused prepare/finish halves around one LK batch)."""
        prep = self._prepare_reference_tracking()
        if prep is None:
            return False
        [(nxt, ok, und)] = self._lk_fused([prep])
        return self._finish_reference_tracking(prep[0], nxt, ok, und)

    def _prepare_reference_tracking(self):
        self.parallax_ref = 0.0
        self.parallax_ref_counts = 0
        if len(self.pts_new) == 0:
            return None

        pts_new = self.pts_new
        # rotation-compensated prediction (cached undistortion)
        r_cur_pre = self.frame_cur.R.T @ self.frame_pre.R
        pc_pre = self._pixel2cam(self.und_new)
        pc_cur = pc_pre @ r_cur_pre.T
        xy = cam.distort_normalized(self.cam, pc_cur[:, :2] / pc_cur[:, 2:3])
        pred = cam.cam2pixel(self.cam, np.concatenate([xy, np.ones((len(xy), 1))], axis=1))
        return pts_new, pred

    def _finish_reference_tracking(self, pts_new, nxt, ok, und):
        self._reduce(ok)
        if len(self.pts_new) == 0:
            return False
        pts_cur = nxt[ok]

        und_new = self.und_new
        und_cur = und[ok]

        dt = self.frame_cur.stamp - self.frame_pre.stamp
        pc_new = self._pixel2cam(und_new)
        pc_c = self._pixel2cam(und_cur)
        vel_cur = (pc_c[:, :2] - pc_new[:, :2]) / dt
        newer = self.ref_ids > self.frame_ref.id
        if newer.any():
            self.vel_ref[newer] = vel_cur[newer]

        # parallax over features referenced to the tracking reference keyframe
        sel = self.ref_ids == self.frame_ref.id
        nsel = int(sel.sum())
        if nsel:
            par = self._keypoint_parallax(
                self.und_ref[sel], und_cur[sel], self.frame_ref.R, self.frame_cur.R
            )
            self.parallax_ref = float(par.mean())
            self.parallax_ref_counts = nsel

        # fundamental RANSAC (tracking.cc:547-555)
        if len(pts_cur) >= 15:
            p0, v0 = self._pad(und_new)
            p1, _ = self._pad(und_cur)
            # numpy args straight into the jit (see _lk_fused's note)
            inl, _ = self._jit_ransac(p0, p1, v0, np.float64(self.reproj_std))
            keep = np.asarray(inl)[: len(pts_cur)]
            pts_cur = pts_cur[keep]
            und_cur = und_cur[keep]
            vel_cur = vel_cur[keep]
            self._reduce(keep)

        if len(pts_cur) == 0:
            return False

        self.vel_cur = vel_cur
        self.pts_cur = pts_cur
        self.und_cur = und_cur
        self.pts_new = pts_cur.copy()
        self.und_new = und_cur.copy()
        return True

    def check_keyframe_state(self):
        """tracking.cc:263-307."""
        state = KEYFRAME_NONE
        dt = self.frame_cur.stamp - self.last_keyframe.stamp
        if dt < TRACK_MIN_INTERVAL:
            return state

        cnt = self.parallax_map_counts + self.parallax_ref_counts
        parallax = (
            (self.parallax_map * self.parallax_map_counts + self.parallax_ref * self.parallax_ref_counts) / cnt
            if cnt
            else 0.0
        )
        if parallax > self.min_parallax:
            state = KEYFRAME_REMOVE_OLDEST if self.map.is_window_full else KEYFRAME_NORMAL
        elif dt > self.max_interval:
            state = KEYFRAME_REMOVE_SECOND_NEW

        if state != KEYFRAME_NONE:
            self.last_keyframe = self.frame_cur
            for lm in self.tracked_mappoints:
                lm.used_times += 1
            rel_t = float(np.linalg.norm(self.frame_cur.t - self.frame_ref.t))
            R = self.frame_cur.R.T @ self.frame_ref.R
            from ..core import rotation_np

            euler = rotation_np.matrix_to_euler(R)
            rel_r = abs(float(euler[1])) * 180.0 / math.pi
            self.logging_row = [self.frame_cur.stamp, dt, parallax, rel_t, rel_r]
        return state

    def triangulation(self):
        """tracking.cc:690-798."""
        pts_cur = getattr(self, "pts_cur", None)
        if pts_cur is None or len(pts_cur) == 0:
            return False
        if len(self.ref_frames) != len(self.pts_cur):
            # pts_cur is stale: reference tracking early-returned this frame
            # (e.g. every track lost in a blackout) after _reduce emptied
            # the per-feature lists — nothing coherent to triangulate.
            # pts_ref/pts_new/ref_frames/vel_ref remain mutually consistent.
            self.pts_cur = np.zeros((0, 2))
            return False

        n = len(self.pts_cur)
        und_ref = self.und_ref
        und_cur = self.und_cur

        # batched rotation-compensated parallax for ALL candidates in one
        # numpy pass (was one device round-trip per feature)
        ref_R = np.stack([f.R for f in self.ref_frames])
        par_all = self._keypoint_parallax(und_ref, und_cur, ref_R, self.frame_cur.R)

        # classify every feature in vectorized passes (the per-feature python
        # walk was ~2 ms/call on the host path):
        #   newer than the reference keyframe -> re-reference to current
        #   reference keyframe dropped from the map -> cull
        #   below the triangulation parallax -> keep as-is
        #   else -> triangulation candidate
        newer = self.ref_ids > self.frame_ref.id
        dropped = np.zeros(n, bool)
        if self.map.is_window_normal():
            old_idx = np.nonzero(~newer)[0]
            if len(old_idx):
                uids, first = np.unique(self.ref_ids[old_idx], return_index=True)
                bad = []
                for u, fi in zip(uids, first):
                    f = self.ref_frames[old_idx[fi]]
                    if f.kf_id is not None and not self.map.is_keyframe_in_map(f):
                        bad.append(u)
                if bad:
                    dropped = np.isin(self.ref_ids, np.asarray(bad))
        low_par = par_all < TRACK_MIN_PARALLAX

        keep = newer | (~newer & ~dropped & low_par)
        if newer.any():
            # features added mid-stream: re-reference to the current frame
            self.ref_frames[newer] = self.frame_cur
            self.ref_ids[newer] = self.frame_cur.id
            self.pts_ref[newer] = self.pts_cur[newer]
            self.und_ref[newer] = und_cur[newer]
        tri_idx = list(np.nonzero(~newer & ~dropped & ~low_par)[0])

        created = 0
        if tri_idx:
            idx = np.asarray(tri_idx)
            R0 = np.stack([self.ref_frames[k].R for k in tri_idx])
            t0 = np.stack([self.ref_frames[k].t for k in tri_idx])
            pc0 = self._pixel2cam(und_ref[idx])
            pc1 = self._pixel2cam(und_cur[idx])
            # padded to the feature-slot table so the jitted kernel never
            # recompiles on the (data-dependent) candidate count
            m, F = len(idx), self.F_MAX
            R0p = np.tile(np.eye(3), (F, 1, 1)); R0p[:m] = R0
            t0p = np.zeros((F, 3)); t0p[:m] = t0
            pcp = np.zeros((F, 3)); pcp[:, 2] = 1.0
            pc0p = pcp.copy(); pc0p[:m] = pc0
            pc1p = pcp.copy(); pc1p[:m] = pc1
            pw = np.asarray(
                self._jit_tri(R0p, t0p, self.frame_cur.R, self.frame_cur.t,
                              pc0p, pc1p)
            )[:m]
            # batched two-view depth/reprojection gating (tracking.cc:813-829)
            good = self._good_to_track_batch(und_ref[idx], R0, t0, pw, 1.0, 3.0)
            good &= self._good_to_track_batch(
                und_cur[idx], self.frame_cur.R, self.frame_cur.t, pw, 1.0, 3.0
            )
            for j, k in enumerate(tri_idx):
                fref = self.ref_frames[k]
                if not good[j]:
                    keep[k] = False
                    continue
                keep[k] = False
                created += 1
                pc = fref.R.T @ (pw[j] - fref.t)
                lm = Landmark(fref, pw[j], und_ref[k], pc[2], MAPPOINT_TRIANGULATED)

                obs_cur = Observation(self.frame_cur, lm.id, und_cur[k], self.pts_cur[k], self.vel_cur[k], 1)
                lm.add_observation(obs_cur)
                self.frame_cur.features[lm.id] = obs_cur
                lm.used_times += 1

                obs_ref = Observation(fref, lm.id, und_ref[k], self.pts_ref[k], self.vel_ref[k], 1)
                lm.add_observation(obs_ref)
                fref.features[lm.id] = obs_ref
                lm.used_times += 1

                self.frame_cur.unupdated_mappoints.append(lm)

        self._reduce(keep)
        self.pts_cur = self.pts_cur[keep]
        self.und_cur = und_cur[keep]
        self.pts_new = self.pts_cur.copy()
        self.und_new = self.und_cur.copy()
        return True

    def _good_to_track(self, und_px, R, t, pw, scale, depth_scale):
        """tracking.cc:813-829."""
        pc = R.T @ (pw - t)
        if not (NEAREST_DEPTH < pc[2] < FARTHEST_DEPTH * depth_scale):
            return False
        proj = cam.world2pixel(self.cam, R, t, pw)
        return np.linalg.norm(proj - und_px) <= self.reproj_std * scale

    def _good_to_track_batch(self, und_px, R, t, pw, scale, depth_scale):
        """Vectorized _good_to_track over (m,) points; R/t may be per-point
        (m,3,3)/(m,3) or shared (3,3)/(3,)."""
        if np.ndim(R) == 3:
            pc = np.einsum("nji,nj->ni", R, pw - t)
        else:
            pc = (pw - t) @ R
        depth_ok = (pc[:, 2] > NEAREST_DEPTH) & (pc[:, 2] < FARTHEST_DEPTH * depth_scale)
        with np.errstate(divide="ignore", invalid="ignore"):
            proj = cam.cam2pixel(self.cam, pc)
            err = np.linalg.norm(proj - und_px, axis=-1)
        return depth_ok & np.isfinite(err) & (err <= self.reproj_std * scale)

    def features_detection(self, frame, ismask=True):
        """tracking.cc:576-688."""
        num_features = len(frame.features) + len(self.pts_ref)
        if num_features > self.max_features - 5:
            return

        # per-block existing-feature counts (vectorized)
        bw = self.cam.width // self.block_cols
        bh = self.cam.height // self.block_rows
        counts = np.zeros(self.block_rows * self.block_cols, np.int32)
        cache = getattr(self, "_cur_feat_und", None)
        if (frame is self.frame_cur and cache is not None
                and len(cache) == len(frame.features)):
            # non-keyframe path: features are exactly the rows cached by
            # _finish_mappoint_tracking this frame (keyframes add
            # triangulations first -> length differs -> dict walk below)
            feat_arr = cache
        elif frame.features:
            feat_arr = np.asarray(
                [obs.undis for obs in frame.features.values()]).reshape(-1, 2)
        else:
            feat_arr = np.zeros((0, 2))
        existing = (
            np.concatenate([feat_arr, self.pts_new])
            if len(feat_arr) else self.pts_new
        )
        if len(existing):
            col = np.clip((existing[:, 0] // bw).astype(np.int64), 0, self.block_cols - 1)
            row = np.clip((existing[:, 1] // bh).astype(np.int64), 0, self.block_rows - 1)
            np.add.at(counts, row * self.block_cols + col, 1)

        if not ismask:
            # fresh start on this frame (tracking.cc:662-667)
            self._reset_tracking_state()

        img = getattr(frame, "pyr", self.pyr_cur)[0]
        if ismask and len(existing):
            pts, wts = self._pad(existing)
            corners, valid, und_all = self._jit_detect(img, pts, wts, counts)
        else:
            corners, valid, und_all = self._jit_detect_nomask(img, counts)
        vmask = np.asarray(valid)
        cn = np.asarray(corners)[vmask]
        und_v = np.asarray(und_all, np.float64)[vmask]

        budget = self.max_features - num_features
        cn = np.asarray(cn[:budget], np.float64)
        und_cn = und_v[:budget]
        m = len(cn)
        if m:
            self.pts_ref = np.concatenate([self.pts_ref, cn])
            self.pts_new = np.concatenate([self.pts_new, cn.copy()])
            self.und_ref = np.concatenate([self.und_ref, und_cn])
            self.und_new = np.concatenate([self.und_new, und_cn.copy()])
            self.ref_frames = np.concatenate(
                [self.ref_frames, np.full(m, frame, object)])
            self.ref_ids = np.concatenate(
                [self.ref_ids, np.full(m, frame.id, np.int64)])
            self.vel_ref = np.concatenate([self.vel_ref, np.zeros((m, 2))])

    # ------------------------------------------------------------------
    # bookkeeping
    # ------------------------------------------------------------------

    def _reduce(self, keep):
        keep = np.asarray(keep, bool)
        self.pts_ref = self.pts_ref[keep]
        self.pts_new = self.pts_new[keep]
        self.und_ref = self.und_ref[keep]
        self.und_new = self.und_new[keep]
        self.ref_frames = self.ref_frames[keep]
        self.ref_ids = self.ref_ids[keep]
        self.vel_ref = self.vel_ref[keep]

    def _make_new_frame(self, state):
        self.frame_cur.set_keyframe(state)
        self.is_new_keyframe = True
        if state in (KEYFRAME_NORMAL, KEYFRAME_REMOVE_OLDEST):
            self.frame_ref = self.frame_cur
            self.features_detection(self.frame_ref, ismask=True)

    def _do_reset_tracking(self):
        if not self.frame_cur.features:
            self.initializing = True
            self.frame_ref = self.frame_cur
            self._reset_tracking_state()
            return True
        return False

    def _reset_tracking_state(self):
        self.pts_ref = np.zeros((0, 2))
        self.pts_new = np.zeros((0, 2))
        self.und_ref = np.zeros((0, 2))
        self.und_new = np.zeros((0, 2))
        self.und_cur = np.zeros((0, 2))
        self.ref_frames = np.zeros(0, object)
        self.ref_ids = np.zeros(0, np.int64)
        self.vel_ref = np.zeros((0, 2))
        self.pts_cur = np.zeros((0, 2))
        self.vel_cur = np.zeros((0, 2))
