import time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_enable_x64", True)
from functools import partial
from ic_gvins_tpu.vision import pyramid, features, lk

H, W = 1022, 1278
rng = np.random.default_rng(0)

def fresh_img(seed):
    return jnp.asarray(np.random.default_rng(seed).uniform(0, 255, (H, W)), jnp.float32)

def devloop(step, make_init, k=40):
    @partial(jax.jit, static_argnames="n")
    def run(x, n):
        return jax.lax.fori_loop(0, n, lambda i, c: step(c), x)
    jax.block_until_ready(run(make_init(0), k))   # compile big
    jax.block_until_ready(run(make_init(1), 1))   # compile small
    t0 = time.perf_counter()
    jax.block_until_ready(run(make_init(2), k))
    tk = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.block_until_ready(run(make_init(3), 1))
    t1 = time.perf_counter() - t0
    return (tk - t1) / (k - 1) * 1000

print("clahe    ", round(devloop(pyramid.clahe, fresh_img), 3), "ms")

def pyr_step(x):
    p = pyramid.build_pyramid(x, lk.PYRAMID_LEVELS)
    return x + jnp.float32(1e-6) * p[0]
print("pyramid  ", round(devloop(pyr_step, fresh_img), 3), "ms")

F_MAX = 512
zc = jnp.zeros(30, jnp.int32)
def det_init(s):
    r = np.random.default_rng(100+s)
    return (jnp.asarray(r.uniform(30, 900, (F_MAX, 2)), jnp.float32), fresh_img(s))
def det_step(c):
    pts, im = c
    mask = features.occupancy_mask(pts, jnp.ones(F_MAX, jnp.float32), (H, W), 15)
    corners, resp, v = features.detect_blockwise(im, mask, zc, block_rows=5,
                                                 block_cols=6, per_block=7, min_distance=15)
    npts = pts.at[:30*7].set(corners.astype(jnp.float32))
    return (npts, im)
print("occ+det  ", round(devloop(det_step, det_init), 3), "ms")

def lk_init(s):
    r = np.random.default_rng(200+s)
    i0 = fresh_img(s)
    i1 = jnp.roll(i0, (2, 3), axis=(0, 1))
    p0 = pyramid.build_pyramid(pyramid.clahe(i0), lk.PYRAMID_LEVELS)
    p1 = pyramid.build_pyramid(pyramid.clahe(i1), lk.PYRAMID_LEVELS)
    return (tuple(p0), tuple(p1), jnp.asarray(r.uniform(30, 900, (F_MAX, 2)), jnp.float32))
def lk_step(c):
    p0, p1, pts = c
    nxt, ok = lk.track_bidirectional(list(p0), list(p1), pts, pts,
                                     jnp.ones(F_MAX, bool))
    pts2 = jnp.clip(nxt, 30.0, 900.0)
    return (p0, p1, pts2)
print("lk_bidir ", round(devloop(lk_step, lk_init, k=20), 3), "ms")
