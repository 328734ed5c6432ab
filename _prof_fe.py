import time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_enable_x64", True)
from ic_gvins_tpu.vision import features, lk, pyramid

H, W = 1022, 1278
F_MAX = 512
block_rows, block_cols, per_block = 5, 6, 7

def timed(run, make_init, k=50):
    kk = jnp.int32(k); one = jnp.int32(1)
    jax.block_until_ready(run(make_init(0), kk))
    jax.block_until_ready(run(make_init(1), one))
    t0 = time.perf_counter(); jax.block_until_ready(run(make_init(2), kk)); tk = time.perf_counter()-t0
    t0 = time.perf_counter(); jax.block_until_ready(run(make_init(3), one)); t1 = time.perf_counter()-t0
    return (tk - t1)/(k-1)*1000

def fresh_img(seed):
    return jnp.asarray(np.random.default_rng(seed).uniform(0, 255, (H, W)), jnp.float32)

@jax.jit
def run_clahe(x, n):
    return jax.lax.fori_loop(0, n, lambda i, c: pyramid.clahe(jnp.roll(c, 1, axis=0)), x)
print("clahe        ", round(timed(run_clahe, fresh_img), 2), "ms")

@jax.jit
def run_pyr(x, n):
    def body(i, c):
        p = pyramid.build_pyramid(c, lk.PYRAMID_LEVELS)
        return c + 1e-6 * p[0]
    return jax.lax.fori_loop(0, n, body, x)
print("pyramid      ", round(timed(run_pyr, fresh_img), 2), "ms")

def pyr_of(seed):
    img = fresh_img(seed)
    return [jnp.asarray(x) for x in jax.jit(lambda im: pyramid.build_pyramid(im, lk.PYRAMID_LEVELS))(img)]

def lk_init(seed):
    r = np.random.default_rng(seed)
    return (pyr_of(seed), pyr_of(seed+100), jnp.asarray(r.uniform(30, 900, (F_MAX, 2)), jnp.float32))

@jax.jit
def run_lk(c, n):
    p0, p1, pts = c
    def body(i, pts):
        nxt, ok = lk.track_bidirectional(p0, p1, pts, pts, jnp.ones(F_MAX, bool))
        return jnp.clip(nxt, 30.0, 900.0)
    return jax.lax.fori_loop(0, n, body, pts)
print("bidir LK x1  ", round(timed(run_lk, lk_init), 2), "ms")

def det_init(seed):
    r = np.random.default_rng(seed)
    return (fresh_img(seed), jnp.asarray(r.uniform(30, 900, (F_MAX, 2)), jnp.float32))

@jax.jit
def run_det(c, n):
    img, pts = c
    def body(i, pts):
        mask = features.occupancy_mask(pts, jnp.ones(F_MAX, jnp.float32), (H, W), 15)
        corners, resp, cvalid = features.detect_blockwise(
            img, mask, jnp.zeros(block_rows*block_cols, jnp.int32),
            block_rows=block_rows, block_cols=block_cols, per_block=per_block,
            min_distance=15)
        return pts.at[:block_rows*block_cols*per_block].set(
            jnp.clip(corners.astype(jnp.float32), 30.0, 900.0))
    return jax.lax.fori_loop(0, n, body, pts)
print("mask+detect  ", round(timed(run_det, det_init), 2), "ms")
