"""Split one TpuMetaRunner launch into scoring vs DP kernel time."""
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

records = list(parse("/root/reference/src/pyrodigal/tests/data/"
                     "GCF_001457455.1_NCTC11397_genomic.fna.gz"))
genome = "".join(r.seq for r in records)
contigs = [genome[i:i+40000] for i in range(0, len(genome), 40000)][:12]

runner = TpuMetaRunner(METAGENOMIC_BINS, prep_threads=8)
seqs = [Sequence(s) for s in contigs]
res = [runner._prepare_contig(s) for s in seqs]

work, geoms = [], {}
for ci, (cand, g, nbt, fb) in enumerate(res):
    for b in cand:
        tt = runner.bins[b].training_info.translation_table
        key = (ci, tt)
        if len(work) + 1 > runner.batch_size or (
                key not in geoms and len(geoms) + 1 > runner.max_geoms):
            break
        geoms.setdefault(key, g[tt])
        work.append((ci, b, key))

BT, G, n, S = (runner.batch_size, runner.max_geoms, runner.node_bucket,
               runner.seq_bucket)
keys = list(geoms.keys()); gmap = {k: i for i, k in enumerate(keys)}
packed = sd.pack_geometries([geoms[k] for k in keys], G, n, S)
bin_idx = np.zeros(BT, np.int32); gidx = np.zeros(BT, np.int32)
for k, (ci, b, gk) in enumerate(work):
    bin_idx[k] = b; gidx[k] = gmap[gk]
geo = {k: jnp.asarray(v) for k, v in packed.items()}
bi, gi = jnp.asarray(bin_idx), jnp.asarray(gidx)
print(f"items={len(work)} geoms={len(keys)}")

W = runner.window
NP = W + int(np.ceil(n / 128) * 128) + 128
kwargs = dict(is_meta=True, closed=False, S3=S // 3,
              has_nonsd=runner.tables.any_nonsd, relk=runner.relk,
              max_overlap=runner.max_overlap)
full_kwargs = dict(kwargs, W=W, NP=NP, BLK=runner.block_size,
                   MAX_CHUNKS=dp_pallas.FIXED_CHUNKS)
tab = runner.tables.as_tuple()


def t(label, fn, n_it=3):
    r = fn(); jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(n_it):
        r = fn(); jax.block_until_ready(r)
    print(f"{label:30s} {(time.time()-t0)/n_it*1e3:9.2f} ms", flush=True)


t("score_only", lambda: sd.score_only(tab, geo, bi, gi, **kwargs))
t("score+dp (full launch)",
  lambda: sd.score_dp_launch(tab, geo, bi, gi, **full_kwargs))

# DP alone on precomputed score outputs
out = sd.score_only(tab, geo, bi, gi, **kwargs)
out = [jnp.asarray(np.asarray(o)) for o in out]
(ndx, stop_val, typ, strand, win_lo, valid,
 cscore, ssc, rsc, usc, star_ptr, stw) = out


@jax.jit
def dp_only(ndx, stop_val, typ, strand, win_lo, valid, cs, rsc, usc, sp, stw):
    return dp_pallas._dp_core(ndx, stop_val, typ, strand, win_lo, valid,
                              cs, rsc, usc, sp, stw, W, NP, BT,
                              runner.block_size, dp_pallas.FIXED_CHUNKS)


t("dp_core alone",
  lambda: dp_only(ndx, stop_val, typ, strand, win_lo, valid,
                  cscore + ssc, rsc, usc, star_ptr, stw))

# -- forced-materialization re-measure ------------------------------------
print("--- forced device_get ---")


def t2(label, fn, n_it=5):
    r = fn(); np.asarray(jax.device_get(r))
    t0 = time.time()
    for _ in range(n_it):
        r = fn(); np.asarray(jax.device_get(r))
    print(f"{label:30s} {(time.time()-t0)/n_it*1e3:9.2f} ms", flush=True)


t2("score_only[best-cscore]",
   lambda: sd.score_only(tab, geo, bi, gi, **kwargs)[6][:, 0])
t2("full launch[best]",
   lambda: sd.score_dp_launch(tab, geo, bi, gi, **full_kwargs)[3])
t2("dp_core[best]",
   lambda: dp_only(ndx, stop_val, typ, strand, win_lo, valid,
                   cscore + ssc, rsc, usc, star_ptr, stw)[3])
