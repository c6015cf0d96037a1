"""A/B timings of the batched DP kernel across BLK/W."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
import functools
import numpy as np
import jax, jax.numpy as jnp
from pyrodigal_tpu.ops import dp_pallas

BT, n, S = 128, 3072, 49152
rng = np.random.default_rng(0)
ndx = np.sort(rng.integers(0, S, (BT, n))).astype(np.int32)
stop_val = np.sort(rng.integers(0, S, (BT, n))).astype(np.int32)
typ = rng.integers(0, 4, (BT, n)).astype(np.int32)
strand = rng.choice([1, -1], (BT, n)).astype(np.int32)
win_lo = np.maximum(np.arange(n)[None] - 500, 0).astype(np.int32)
win_lo = np.broadcast_to(win_lo, (BT, n)).copy()
valid = np.ones((BT, n), np.int32)
cs = rng.normal(size=(BT, n)).astype(np.float32)
rsc = rng.normal(size=(BT, n)).astype(np.float32)
usc = rng.normal(size=(BT, n)).astype(np.float32)
i0 = np.arange(n)[None]
sp = np.clip(i0 + rng.integers(-30, 3, (3, BT, n)), 0, n - 1).astype(np.int32)
stw = np.full(BT, 4.35, np.float32)

args = [jnp.asarray(x) for x in
        (ndx, stop_val, typ, strand, win_lo, valid, cs, rsc, usc, sp, stw)]


def run(W, BLK, CH):
    NP = W + n + 128

    @jax.jit
    def f(ndx, stop_val, typ, strand, win_lo, valid, cs, rsc, usc, sp, stw):
        return dp_pallas._dp_core(ndx, stop_val, typ, strand, win_lo, valid,
                                  cs, rsc, usc, sp, stw, W, NP, BT, BLK, CH,
                                  star_span=36)[3]

    r = f(*args); np.asarray(jax.device_get(r))
    t0 = time.time()
    for _ in range(3):
        r = f(*args); np.asarray(jax.device_get(r))
    print(f"W={W} BLK={BLK} CH={CH}: {(time.time()-t0)/3*1e3:8.2f} ms",
          flush=True)


for W, BLK, CH in ((640, 8, 3), (640, 16, 3), (640, 32, 3), (1024, 8, 2),
                   (640, 8, 1), (512, 8, 3)):
    try:
        run(W, BLK, CH)
    except Exception as e:
        print(f"W={W} BLK={BLK} CH={CH}: FAIL {type(e).__name__}: {e}"[:200],
              flush=True)
