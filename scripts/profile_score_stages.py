"""Stage-wise timing of the on-device scoring pipeline pieces."""
import os, sys, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
import numpy as np
import jax, jax.numpy as jnp

BT, n, S, G = 128, 3072, 49152, 16
S3 = S // 3
key = jax.random.PRNGKey(0)

def _sync(r):
    import numpy as _np
    if isinstance(r, (tuple, list)):
        r = r[0]
    _np.asarray(jax.device_get(r.ravel()[0:1]))

def t(label, fn, *args, n_it=5):
    r = fn(*args); _sync(r)
    t0 = time.time()
    for _ in range(n_it):
        r = fn(*args)
        _sync(r)
    print(f"{label:44s} {(time.time()-t0)/n_it*1e3:8.2f} ms", flush=True)


# pass 1: m6 gather + cumsum + prefix lookups
dcrow = jax.random.normal(key, (BT, 4096), jnp.float32)
m6 = jax.random.randint(key, (2, BT, S), 0, 4096, jnp.int32)
ndx = jnp.sort(jax.random.randint(key, (BT, n), 0, S - 6), axis=1)

@jax.jit
def pass1(dcrow, m6, ndx):
    dcf = jnp.take_along_axis(dcrow, m6[0], axis=1)
    dcr = jnp.take_along_axis(dcrow, m6[1], axis=1)
    Cf = jnp.cumsum(dcf.reshape(BT, S3, 3), axis=1).reshape(BT, S)
    Cr = jnp.cumsum(dcr.reshape(BT, S3, 3), axis=1).reshape(BT, S)
    a = jnp.take_along_axis(Cf, ndx, axis=1)
    b = jnp.take_along_axis(Cr, ndx, axis=1)
    return a - b
t("pass1 m6 gather+cumsum+lookup", pass1, dcrow, m6, ndx)

@jax.jit
def m6gather(dcrow, m6):
    return (jnp.take_along_axis(dcrow, m6[0], axis=1),
            jnp.take_along_axis(dcrow, m6[1], axis=1))
t("  m6 gather only", m6gather, dcrow, m6)

@jax.jit
def csum(dcf):
    return jnp.cumsum(dcf.reshape(BT, S3, 3), axis=1)
dcf = jnp.take_along_axis(dcrow, m6[0], axis=1)
t("  cumsum only", csum, dcf)

# seg scans (4x in the pipeline)
vals = jax.random.normal(key, (BT, n, 3), jnp.float32)
is_e = jax.random.bernoulli(key, 0.5, (BT, n, 3))
is_r = jax.random.bernoulli(key, 0.1, (BT, n, 3))

@jax.jit
def segscan(vals, is_e, is_r):
    NEGI = jnp.float32(-3e38)
    m = jnp.where(is_r, 0.0, jnp.where(is_e, vals, NEGI))
    def comb(a, b):
        (m1, r1), (m2, r2) = a, b
        return jnp.where(r2, m2, jnp.maximum(m1, m2)), r1 | r2
    ms, _ = jax.lax.associative_scan(comb, (m, is_r), axis=1)
    return ms
t("one seg associative_scan (BT,n,3)", segscan, vals, is_e, is_r)

# rbs winner: 28-iteration loop over (BT, n, 15)
masks = jax.random.randint(key, (BT, n, 15), 0, 2**28, jnp.int32)
rbs_row = jax.random.normal(key, (BT, 28), jnp.float32)

@jax.jit
def rbs_winner(masks, rbs_row):
    bw = jnp.broadcast_to(rbs_row[:, 0][:, None, None], masks.shape)
    bi = jnp.zeros(masks.shape, jnp.int32)
    for v in range(1, 28):
        bit = (masks >> v) & 1
        wv = rbs_row[:, v][:, None, None]
        upd = (bit != 0) & (wv >= bw)
        bw = jnp.where(upd, wv, bw)
        bi = jnp.where(upd, v, bi)
    return jnp.max(bi, axis=2)
t("rbs winner 28-loop (BT,n,15) x2", rbs_winner, masks, rbs_row)

# union-mask variant: (BT, n) single mask, max-weight value only
um = jax.random.randint(key, (BT, n), 0, 2**28, jnp.int32)
@jax.jit
def rbs_value(um, rbs_row):
    best = jnp.full(um.shape, -99.0, jnp.float32)
    for v in range(28):
        bit = (um >> v) & 1
        wv = rbs_row[:, v][:, None]
        best = jnp.where((bit != 0) & (wv > best), wv, best)
    return best
t("rbs union-mask value (BT,n)", rbs_value, um, rbs_row)

# mot gather: (BT, n, 52) from (BT, 65536)
mid = jax.random.randint(key, (BT, n, 52), -1, 65536, jnp.int32)
mrow = jax.random.normal(key, (BT, 65536), jnp.float32)
@jax.jit
def motg(mid, mrow):
    mv = jnp.take_along_axis(mrow, jnp.clip(mid, 0, 65535).reshape(BT, -1), axis=1)
    mv = mv.reshape(mid.shape)
    best = jnp.full((BT, n), -100.0, jnp.float32)
    for s in range(52):
        ok = (mid[:, :, s] >= 0) & (mv[:, :, s] > best)
        best = jnp.where(ok, mv[:, :, s], best)
    return best
t("mot gather+52-loop", motg, mid, mrow)

# ups einsum
c_ups = jax.random.bernoulli(key, 0.2, (G, n, 128)).astype(jnp.float32)
ups_comp = jax.random.normal(key, (50, 128), jnp.float32)
@jax.jit
def upse(c_ups, ups_comp):
    return jnp.einsum("gnu,bu->gbn", c_ups, ups_comp,
                      precision=jax.lax.Precision.HIGHEST)
t("ups einsum (G,n,128)x(50,128)", upse, c_ups, ups_comp)

# star-pointer 24-step loop
starc = jax.random.randint(key, (BT, n, 24), -1, n, jnp.int32)
cs_tot = jax.random.normal(key, (BT, n), jnp.float32)
nx = jnp.sort(jax.random.randint(key, (BT, n), 0, S, jnp.int32), axis=1)
@jax.jit
def starloop(starc, cs_tot, nx):
    runmax = jnp.full((BT, n), -100.0, jnp.float32)
    ptr = [jnp.full((BT, n), -1, jnp.int32) for _ in range(3)]
    for k in range(24):
        j = starc[:, :, k]
        ok = j >= 0
        jc = jnp.clip(j, 0, n - 1)
        ndx_j = jnp.take_along_axis(nx, jc, axis=1)
        sc = jnp.take_along_axis(cs_tot, jc, axis=1) + 0.1 * jnp.abs(nx - ndx_j)
        upd = ok & (sc > runmax)
        phj = ndx_j % 3
        for f in range(3):
            ptr[f] = jnp.where(upd & (phj == f), j, ptr[f])
        runmax = jnp.where(upd, sc, runmax)
    return ptr[0], ptr[1], ptr[2]
t("star 24-step loop w/ gathers", starloop, starc, cs_tot, nx)

# DP kernel alone with random inputs (defeat any caching)
from pyrodigal_tpu.ops import dp_pallas
W = 1024
NP = W + int(np.ceil(n / 128) * 128) + 128
geom = np.zeros((6, G, n), np.int32)
geom[0] = np.sort(np.random.randint(0, S, (G, n)))
geom[1] = np.sort(np.random.randint(0, S, (G, n)))
geom[2] = np.random.randint(0, 4, (G, n))
geom[3] = np.random.choice([1, -1], (G, n))
geom[4] = np.maximum(np.arange(n)[None] - 500, 0)
geom[5] = 1
scores = np.random.randn(3, BT, n).astype(np.float32)
sp = np.random.randint(-1, n, (3, BT, n)).astype(np.int16)
gidx = np.random.randint(0, G, BT).astype(np.int32)
st_wt = np.full(BT, 4.35, np.float32)
args = [jnp.asarray(x) for x in (geom, scores, sp, gidx, st_wt)]
def dp():
    return dp_pallas._launch(*args, W, NP, BT, 8, 2)
print("compiling DP...", flush=True)
t0 = time.time(); r = dp(); _sync(r)
print(f"  compile+run {time.time()-t0:.1f}s", flush=True)
t("DP _launch BT=128 BLK=8", dp, n_it=3)
