"""Profile the mega (node-axis-gridded) device path on the real chip.

Splits the 2.46 Mbp genome's sweep into: H2D transfer, scoring-only,
score+DP (full launch), and DP-kernel-only, to direct optimization.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np
import jax, jax.numpy as jnp
from pyrodigal_tpu.fasta import parse
from pyrodigal_tpu.metagenomic import METAGENOMIC_BINS
from pyrodigal_tpu.sequence import Sequence
from pyrodigal_tpu.ops.meta_tpu import TpuMetaRunner
from pyrodigal_tpu.ops import score_device as sd, dp_pallas

DATA = "/root/reference/src/pyrodigal/tests/data"
text = "".join(r.seq for r in parse(
    os.path.join(DATA, "GCF_001457455.1_NCTC11397_genomic.fna.gz")))
seq = Sequence(text)
runner = TpuMetaRunner(METAGENOMIC_BINS)
cand, geoms, nbt, route = runner._prepare_contig(seq)
print(f"route={route} cands={len(cand)} nn={geoms[11]['nn']}", flush=True)
g = geoms[11]

NT = next(b for b in runner.MEGA_NT if b >= g["nn"])
SB = next(b for b in runner.MEGA_SB if b >= g["slen"])
BT = 16
packed = sd.pack_geometries([g], 1, NT, SB)
bin_idx = np.zeros(BT, np.int32)
slot_idx = np.ones(BT, np.int32)
for k, b in enumerate(cand):
    bin_idx[k] = b
    slot_idx[k] = 0

def t(label, fn, n=3):
    r = fn(); jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(n):
        jax.block_until_ready(fn())
    print(f"{label:34s} {(time.time()-t0)/n*1e3:9.1f} ms", flush=True)

t("H2D geometry transfer",
  lambda: [jnp.asarray(v) for v in packed.values()], n=3)

geo = {k: jnp.asarray(v) for k, v in packed.items()}
bi = jnp.asarray(bin_idx); gi = jnp.asarray(np.zeros(BT, np.int32))
si = jnp.asarray(slot_idx)
kwargs = dict(is_meta=True, closed=False, S3=SB // 3,
              has_nonsd=bool((runner.tables.uses_sd_np[cand] == 0).any()),
              relk=runner.relk, max_overlap=60, NB=NT,
              interpret=runner.interpret)

t("score_dp_launch_mega (full)",
  lambda: sd.score_dp_launch_mega(runner.tables.as_tuple(), geo, bi, gi, si,
                                  **kwargs))

# scoring alone (same internals, no DP)
tab = runner.tables.as_tuple()
sk = dict(kwargs); sk.pop("NB"); sk.pop("interpret")
t("score_only", lambda: sd.score_only(tab, geo, bi, gi, **sk))

out = sd.score_only(tab, geo, bi, gi, **sk)
out = [jnp.asarray(np.asarray(o)) for o in out]
(ndx, stop_val, typ, strand, win_lo, valid,
 cscore, ssc, rsc, usc, star_ptr, stw) = out

@jax.jit
def dp_only(ndx, stop_val, typ, strand, win_lo, valid, cs, rsc, usc, sp, stw):
    return dp_pallas._dp_core_mega(ndx, stop_val, typ, strand, win_lo, valid,
                                   cs, rsc, usc, sp, stw, NT,
                                   interpret=runner.interpret,
                                   star_span=runner.relk)

t("dp_core_mega alone",
  lambda: dp_only(ndx, stop_val, typ, strand, win_lo, valid,
                  cscore + ssc, rsc, usc, star_ptr, stw))
