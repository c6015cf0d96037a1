"""Where does warmup go? trace/lower vs compile vs first execute."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import jax.numpy as jnp
from pyrodigal_tpu.fasta import parse
from pyrodigal_tpu.metagenomic import METAGENOMIC_BINS
from pyrodigal_tpu.sequence import Sequence
from pyrodigal_tpu.ops.meta_tpu import TpuMetaRunner
from pyrodigal_tpu.ops import score_device as sd, dp_pallas

t0 = time.time()
runner = TpuMetaRunner(METAGENOMIC_BINS)
print(f"runner init (incl table upload): {time.time()-t0:.1f}s")

rec = list(parse("/root/reference/src/pyrodigal/tests/data/GCF_001457455.1_NCTC11397_genomic.fna.gz"))
genome = "".join(r.seq for r in rec)
seqs = [Sequence(genome[i:i+40000]) for i in (0, 40000)]

t0 = time.time()
preps = [runner._prepare_contig(s) for s in seqs]
print(f"prep: {time.time()-t0:.1f}s")

# assemble one launch by hand
work, geoms = [], {}
for ci, (cand, g, nbt, fb) in enumerate(preps):
    for b in cand:
        tt = runner.bins[b].training_info.translation_table
        key = (ci, tt)
        if key not in geoms:
            geoms[key] = g[tt]
        work.append((ci, b, key))

BT = runner.batch_size
G = runner.max_geoms
n = runner.node_bucket
S = runner.seq_bucket
keys = list(geoms.keys())
gmap = {k: i for i, k in enumerate(keys)}
packed = sd.pack_geometries([geoms[k] for k in keys], G, n, S)
bin_idx = np.zeros(BT, np.int32)
gidx = np.zeros(BT, np.int32)
for k, (_ci, b, gkey) in enumerate(work):
    bin_idx[k] = b
    gidx[k] = gmap[gkey]
geo = {k: jnp.asarray(v) for k, v in packed.items()}
W = runner.window
NP = W + int(np.ceil(n / 128) * 128) + 128
kwargs = dict(is_meta=True, closed=False, S3=S // 3,
              has_nonsd=runner.tables.any_nonsd, relk=runner.relk,
              max_overlap=60, W=W, NP=NP, BLK=runner.block_size,
              MAX_CHUNKS=dp_pallas.FIXED_CHUNKS, interpret=False)

f = sd.score_dp_launch
t0 = time.time()
lowered = f.lower(runner.tables.as_tuple(), geo, jnp.asarray(bin_idx),
                  jnp.asarray(gidx), **kwargs)
t_lower = time.time() - t0
print(f"trace+lower: {t_lower:.1f}s")
t0 = time.time()
compiled = lowered.compile()
t_comp = time.time() - t0
print(f"compile (cache?): {t_comp:.1f}s")
t0 = time.time()
out = compiled(runner.tables.as_tuple(), geo, jnp.asarray(bin_idx),
               jnp.asarray(gidx))
out[3].block_until_ready()
print(f"first exec: {time.time()-t0:.1f}s")
t0 = time.time()
out = compiled(runner.tables.as_tuple(), geo, jnp.asarray(bin_idx),
               jnp.asarray(gidx))
out[3].block_until_ready()
print(f"second exec: {time.time()-t0:.3f}s")
