"""Split one TpuMetaRunner launch into H2D transfer vs device compute."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
import numpy as np
import jax, jax.numpy as jnp
from pyrodigal_tpu.fasta import parse
from pyrodigal_tpu.metagenomic import METAGENOMIC_BINS
from pyrodigal_tpu.sequence import Sequence
from pyrodigal_tpu.ops.meta_tpu import TpuMetaRunner
from pyrodigal_tpu.ops import score_device as sd, dp_pallas

records = list(parse("/root/reference/src/pyrodigal/tests/data/GCF_001457455.1_NCTC11397_genomic.fna.gz"))
genome = "".join(r.seq for r in records)
contigs = [genome[i:i+40000] for i in range(0, len(genome), 40000)][:18]

runner = TpuMetaRunner(METAGENOMIC_BINS, prep_threads=8)
seqs = [Sequence(s) for s in contigs]
res = [runner._prepare_contig(s) for s in seqs]

# build one launch worth of work
work, geoms = [], {}
for ci, (cand, g, nbt, fb) in enumerate(res):
    for b in cand:
        tt = runner.bins[b].training_info.translation_table
        key = (ci, tt)
        if len(work) + 1 > runner.batch_size or (key not in geoms and len(geoms) + 1 > runner.max_geoms):
            break
        geoms.setdefault(key, g[tt])
        work.append((ci, b, key))

BT, G, n, S = runner.batch_size, runner.max_geoms, runner.node_bucket, runner.seq_bucket
keys = list(geoms.keys()); gmap = {k:i for i,k in enumerate(keys)}
t0=time.time()
packed = sd.pack_geometries([geoms[k] for k in keys], G, n, S, runner.star_k)
t_pack = time.time()-t0
bin_idx = np.zeros(BT, np.int32); gidx = np.zeros(BT, np.int32)
for k,(ci,b,gk) in enumerate(work): bin_idx[k]=b; gidx[k]=gmap[gk]

nbytes = sum(v.nbytes for v in packed.values())
print(f"items={len(work)} geoms={len(keys)} packed={nbytes/1e6:.1f}MB pack_time={t_pack:.3f}s")

# H2D
t0=time.time()
geo = {k: jax.device_put(v) for k,v in packed.items()}
for v in geo.values(): v.block_until_ready()
bi = jax.device_put(jnp.asarray(bin_idx)); gi = jax.device_put(jnp.asarray(gidx))
t_h2d = time.time()-t0
print(f"h2d={t_h2d:.3f}s ({nbytes/1e6/t_h2d:.0f} MB/s)")

W = runner.window; NP = W + int(np.ceil(n/128)*128) + 128
kw = dict(is_meta=True, closed=False, S3=S//3, has_nonsd=runner.tables.any_nonsd,
          W=W, NP=NP, BLK=runner.block_size, MAX_CHUNKS=dp_pallas.FIXED_CHUNKS, interpret=False)
# compile
t0=time.time()
out = sd.score_dp_launch(runner.tables.as_tuple(), geo, bi, gi, **kw)
out[3].block_until_ready()
print(f"first_call={time.time()-t0:.3f}s")
for trial in range(3):
    t0=time.time()
    out = sd.score_dp_launch(runner.tables.as_tuple(), geo, bi, gi, **kw)
    out[3].block_until_ready()
    print(f"exec={time.time()-t0:.3f}s")

# split: score only vs dp
t0=time.time()
sc = sd.score_only(runner.tables.as_tuple(), geo, bi, gi, is_meta=True, closed=False, S3=S//3, has_nonsd=runner.tables.any_nonsd)
sc[0].block_until_ready()
print(f"score_only_first={time.time()-t0:.3f}s")
for trial in range(2):
    t0=time.time()
    sc = sd.score_only(runner.tables.as_tuple(), geo, bi, gi, is_meta=True, closed=False, S3=S//3, has_nonsd=runner.tables.any_nonsd)
    sc[0].block_until_ready()
    print(f"score_only={time.time()-t0:.3f}s")
