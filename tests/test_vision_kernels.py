"""Unit tests for the image kernels: camera, pyramid, detection, LK, RANSAC."""

import jax
import jax.numpy as jnp
import numpy as np

from ic_gvins_tpu.vision import camera as cam
from ic_gvins_tpu.vision import features, lk, pyramid, ransac


def kaist_camera():
    return cam.PinholeCamera.from_config(
        [787.16, 787.39, 664.40, 519.51],
        [-0.0917, 0.0813, 0.000176, 0.000167],
        [1278, 1022],
    )


def test_camera_pixel_cam_roundtrip():
    c = kaist_camera()
    px = jnp.asarray(np.random.default_rng(0).uniform(100, 900, (32, 2)))
    pc = cam.pixel2cam(c, px)
    back = cam.cam2pixel(c, pc)
    np.testing.assert_allclose(back, px, atol=1e-9)


def test_camera_distort_undistort_roundtrip():
    c = kaist_camera()
    px = jnp.asarray(np.random.default_rng(1).uniform(200, 800, (64, 2)))
    und = cam.undistort_points(c, cam.distort_points(c, px))
    np.testing.assert_allclose(und, px, atol=1e-4)


def test_world_cam_transforms():
    c = kaist_camera()
    from ic_gvins_tpu.core import quaternion as quat

    R = np.asarray(quat.to_matrix(quat.from_rotvec(jnp.array([0.1, -0.2, 0.3]))))
    t = jnp.array([1.0, 2.0, 3.0])
    pw = jnp.array([4.0, 5.0, 16.0])
    pc = cam.world2cam(jnp.asarray(R), t, pw)
    back = cam.cam2world(jnp.asarray(R), t, pc)
    np.testing.assert_allclose(back, pw, atol=1e-12)


def synth_image(H=240, W=320, seed=0, n_blobs=40):
    """Smooth random texture with gaussian blobs (trackable corners)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
    img = 100.0 + 10 * np.sin(xx / 17.0) * np.cos(yy / 23.0)
    for _ in range(n_blobs):
        cx, cy = rng.uniform(20, W - 20), rng.uniform(20, H - 20)
        amp = rng.uniform(40, 100) * rng.choice([-1, 1])
        sig = rng.uniform(1.5, 3.0)
        img += amp * np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * sig**2))
    return np.clip(img, 0, 255)


def shift_image(img, dx, dy):
    """Bilinear shift (sample at x-dx, y-dy)."""
    H, W = img.shape
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
    pts = jnp.stack([jnp.asarray(xx - dx), jnp.asarray(yy - dy)], axis=-1)
    return np.asarray(pyramid.bilinear_sample(jnp.asarray(img), pts))


def test_bilinear_sample_exact_on_grid():
    img = jnp.asarray(synth_image())
    xy = jnp.array([[10.0, 20.0], [100.0, 50.0]])
    out = pyramid.bilinear_sample(img, xy)
    np.testing.assert_allclose(out, [img[20, 10], img[50, 100]], atol=1e-9)


def test_pyramid_shapes():
    img = jnp.asarray(synth_image())
    pyr = pyramid.build_pyramid(img, 4)
    assert pyr[0].shape == (240, 320)
    assert pyr[1].shape == (120, 160)
    assert pyr[3].shape == (30, 40)


def test_clahe_improves_contrast():
    rng = np.random.default_rng(3)
    img = 100.0 + 8.0 * rng.standard_normal((128, 128))
    out = np.asarray(pyramid.clahe(jnp.asarray(img)))
    assert out.std() > np.clip(img, 0, 255).std() * 1.5
    assert out.min() >= 0 and out.max() <= 255.001


def test_detection_finds_blobs():
    img = synth_image(seed=5)
    c = jnp.asarray(img)
    mask = jnp.ones_like(c)
    br, bc, pb = 2, 2, 30
    corners, resp, valid = features.detect_blockwise(
        c, mask, jnp.zeros(br * bc, jnp.int32),
        block_rows=br, block_cols=bc, per_block=pb, min_distance=9,
    )
    nv = int(valid.sum())
    assert nv > 25, f"only {nv} corners"
    # responses positive and sorted within blocks
    assert float(resp[np.asarray(valid)].min()) > 0


def test_detection_mask_suppression():
    img = jnp.asarray(synth_image(seed=5))
    br, bc, pb = 2, 2, 30
    no_mask = jnp.ones_like(img)
    corners, _, valid = features.detect_blockwise(
        img, no_mask, jnp.zeros(br * bc, jnp.int32),
        block_rows=br, block_cols=bc, per_block=pb, min_distance=9,
    )
    # mask off everything near the detected corners -> re-detection avoids them
    occ = features.occupancy_mask(corners, valid.astype(jnp.float64), img.shape, radius=12)
    corners2, _, valid2 = features.detect_blockwise(
        img, occ, jnp.zeros(br * bc, jnp.int32),
        block_rows=br, block_cols=bc, per_block=pb, min_distance=9,
    )
    v1 = np.asarray(corners)[np.asarray(valid)]
    v2 = np.asarray(corners2)[np.asarray(valid2)]
    if len(v2):
        d = np.linalg.norm(v1[None, :, :] - v2[:, None, :], axis=-1).min(axis=1)
        assert d.min() >= 11, f"mask violated: min distance {d.min()}"


def test_lk_recovers_translation():
    img0 = synth_image(seed=7)
    dx, dy = 3.37, -2.21
    img1 = shift_image(img0, dx, dy)
    pyr0 = pyramid.build_pyramid(jnp.asarray(img0), 4)
    pyr1 = pyramid.build_pyramid(jnp.asarray(img1), 4)

    br, bc, pb = 2, 2, 20
    corners, _, valid = features.detect_blockwise(
        jnp.asarray(img0), jnp.ones_like(pyr0[0]), jnp.zeros(br * bc, jnp.int32),
        block_rows=br, block_cols=bc, per_block=pb, min_distance=9,
    )
    # keep interior corners (shift safety margin)
    inb = (
        (corners[:, 0] > 25) & (corners[:, 0] < 295)
        & (corners[:, 1] > 25) & (corners[:, 1] < 215)
    )
    valid = valid & inb
    pts_next, ok = lk.track_bidirectional(pyr0, pyr1, corners, corners, valid)
    okn = np.asarray(ok)
    assert okn.sum() >= 20, f"too few tracks: {okn.sum()}"
    flow = np.asarray(pts_next)[okn] - np.asarray(corners)[okn]
    err = np.linalg.norm(flow - [dx, dy], axis=1)
    assert np.median(err) < 0.2, f"median flow error {np.median(err):.3f}"


def test_ransac_separates_outliers():
    rng = np.random.default_rng(11)
    c = kaist_camera()
    n = 120
    # synthetic two-view: points in front of camera, small baseline
    pw = rng.uniform(-3, 3, (n, 3)) + [0, 0, 10]
    from ic_gvins_tpu.core import quaternion as quat

    R1 = np.asarray(quat.to_matrix(quat.from_rotvec(jnp.array([0.02, -0.01, 0.03]))))
    t1 = np.array([0.5, 0.1, 0.0])
    p0 = np.stack([pw[:, 0] / pw[:, 2], pw[:, 1] / pw[:, 2]], axis=1)
    pc1 = (pw - t1) @ R1  # R1^T (pw - t1)
    p1 = np.stack([pc1[:, 0] / pc1[:, 2], pc1[:, 1] / pc1[:, 2]], axis=1)
    px0 = np.asarray(cam.cam2pixel(c, jnp.asarray(np.concatenate([p0, np.ones((n, 1))], 1))))
    px1 = np.array(cam.cam2pixel(c, jnp.asarray(np.concatenate([p1, np.ones((n, 1))], 1))))
    # corrupt 20 correspondences
    bad = rng.choice(n, 20, replace=False)
    px1[bad] += rng.uniform(15, 40, (20, 2)) * rng.choice([-1, 1], (20, 2))

    N = 160  # padded table
    pts0 = np.zeros((N, 2))
    pts1 = np.zeros((N, 2))
    val = np.zeros(N)
    pts0[:n], pts1[:n], val[:n] = px0, px1, 1.0

    inl, count = ransac.fundamental_ransac(
        jnp.asarray(pts0), jnp.asarray(pts1), jnp.asarray(val), threshold=1.5
    )
    inl = np.asarray(inl)[:n]
    good = np.setdiff1d(np.arange(n), bad)
    assert inl[good].mean() > 0.95, f"lost inliers: {inl[good].mean()}"
    assert inl[bad].mean() < 0.2, f"kept outliers: {inl[bad].mean()}"


def test_triangulation_exact():
    rng = np.random.default_rng(13)
    from ic_gvins_tpu.core import quaternion as quat

    n = 32
    pw = rng.uniform(-4, 4, (n, 3)) + [0, 0, 12]
    R0 = np.eye(3)
    t0 = np.zeros(3)
    R1 = np.asarray(quat.to_matrix(quat.from_rotvec(jnp.array([0.05, 0.02, -0.03]))))
    t1 = np.array([1.0, 0.2, 0.1])

    pc0 = pw @ R0  # R0^T pw
    pc0 = pc0 / pc0[:, 2:3]
    pc1 = (pw - t1) @ R1
    pc1 = pc1 / pc1[:, 2:3]

    out = ransac.triangulate_batch(
        jnp.asarray(np.tile(R0, (n, 1, 1))), jnp.asarray(np.tile(t0, (n, 1))),
        jnp.asarray(R1), jnp.asarray(t1),
        jnp.asarray(pc0), jnp.asarray(pc1),
    )
    np.testing.assert_allclose(out, pw, atol=1e-8)


def test_pixel2unitcam_and_pixel2world():
    c = kaist_camera()
    px = jnp.asarray([[300.0, 400.0], [700.0, 600.0]])
    ray = cam.pixel2unitcam(c, px)
    np.testing.assert_allclose(np.linalg.norm(ray, axis=-1), 1.0, atol=1e-12)
    R = jnp.eye(3)
    t = jnp.asarray([1.0, 2.0, 3.0])
    pw = cam.pixel2world(c, R, t, px)
    np.testing.assert_allclose(pw, cam.pixel2cam(c, px) + t, atol=1e-12)


def test_undistort_image_inverts_distortion():
    # render a bright dot at a distorted location; the undistorted image must
    # show it at the undistorted location (Camera::undistortImage parity)
    c = cam.PinholeCamera.from_config(
        [120.0, 120.0, 64.0, 48.0], [-0.25, 0.08, 0.0005, 0.0003], [128, 96]
    )
    px_und = jnp.asarray([[40.0, 30.0]])
    px_dis = np.asarray(cam.distort_points(c, px_und))[0]
    img = np.zeros((96, 128), np.float32)
    xi, yi = int(round(px_dis[0])), int(round(px_dis[1]))
    img[yi - 1 : yi + 2, xi - 1 : xi + 2] = 255.0
    smap = cam.undistort_rectify_map(c)
    out = np.asarray(cam.undistort_image(jnp.asarray(img), smap))
    peak = np.unravel_index(np.argmax(out), out.shape)
    assert abs(peak[1] - 40.0) <= 1.5 and abs(peak[0] - 30.0) <= 1.5
    assert out.max() > 50.0


def test_clahe_matches_gather_formulation():
    """The MXU one-hot LUT application must equal the direct per-pixel
    LUT-gather + 4-tap blend to within the reference's uint8 rounding."""
    rng = np.random.default_rng(7)
    img = rng.uniform(0, 255, (96, 130)).astype(np.float32)
    out = np.asarray(pyramid.clahe(jnp.asarray(img), tile=6))

    # direct formulation (what cv::CLAHE computes, float)
    H, W = img.shape
    ty = tx = 6
    th, tw = -(-H // ty), -(-W // tx)
    Hp, Wp = th * ty, tw * tx
    padded = np.pad(img, ((0, Hp - H), (0, Wp - W)), mode="edge")
    tiles = padded.reshape(ty, th, tx, tw).transpose(0, 2, 1, 3).reshape(ty * tx, th * tw)
    idx = np.clip(tiles.astype(np.int32), 0, 255)
    hist = np.zeros((ty * tx, 256), np.float32)
    for t in range(ty * tx):
        np.add.at(hist[t], idx[t], 1.0)
    limit = max(3.0 * th * tw / 256, 1.0)
    excess = np.maximum(hist - limit, 0).sum(1, keepdims=True)
    hist = np.minimum(hist, limit) + excess / 256
    cdf = np.cumsum(hist, 1)
    lut = (cdf - cdf[:, :1]) / np.maximum(cdf[:, -1:] - cdf[:, :1], 1.0) * 255.0
    lut = lut.reshape(ty, tx, 256)
    yy, xx = np.arange(H), np.arange(W)
    tyf = np.clip((yy - th / 2 + 0.5) / th, 0, ty - 1.000001)
    txf = np.clip((xx - tw / 2 + 0.5) / tw, 0, tx - 1.000001)
    y0 = np.floor(tyf).astype(int); x0 = np.floor(txf).astype(int)
    fy = (tyf - y0)[:, None]; fx = (txf - x0)[None, :]
    y1 = np.minimum(y0 + 1, ty - 1); x1 = np.minimum(x0 + 1, tx - 1)
    v = np.clip(img.astype(int), 0, 255)
    g = lambda yi, xi: lut[yi[:, None], xi[None, :], v]
    want = (g(y0, x0) * (1 - fy) * (1 - fx) + g(y0, x1) * (1 - fy) * fx
            + g(y1, x0) * fy * (1 - fx) + g(y1, x1) * fy * fx)
    assert np.abs(out - want).max() < 0.75
