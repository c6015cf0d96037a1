"""Profile the meta-mode pipeline: where does the time go?

Measures tunnel characteristics (dispatch latency, H2D bandwidth) and
breaks the TpuMetaRunner per-contig cost into host prep / transfer /
device compute / finish.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np
import jax
import jax.numpy as jnp

print("devices:", jax.devices(), flush=True)

# --- tunnel characteristics -------------------------------------------------
x = jnp.zeros((8, 128), jnp.float32)
f = jax.jit(lambda a: a + 1)
f(x).block_until_ready()
t0 = time.time()
N = 20
for _ in range(N):
    f(x).block_until_ready()
lat = (time.time() - t0) / N
print(f"dispatch+roundtrip latency: {lat*1e3:.2f} ms")

for mb in (1, 8, 32):
    a = np.zeros(mb * 1024 * 1024, np.uint8)
    jnp.asarray(a).block_until_ready()  # warm
    t0 = time.time()
    for _ in range(3):
        jnp.asarray(a).block_until_ready()
    bw = 3 * mb / (time.time() - t0)
    print(f"H2D {mb} MB: {bw:.1f} MB/s")

d = jnp.zeros((32 * 1024 * 1024,), jnp.uint8)
d.block_until_ready()
t0 = time.time()
np.asarray(d)
print(f"D2H 32 MB: {32/(time.time()-t0):.1f} MB/s")

# --- per-stage profile of TpuMetaRunner -------------------------------------
from pyrodigal_tpu.fasta import parse
from pyrodigal_tpu.metagenomic import METAGENOMIC_BINS
from pyrodigal_tpu.ops.meta_tpu import TpuMetaRunner
from pyrodigal_tpu.sequence import Sequence

DATA = "/root/reference/src/pyrodigal/tests/data"
records = list(parse(os.path.join(DATA, "GCF_001457455.1_NCTC11397_genomic.fna.gz")))
genome = "".join(r.seq for r in records)
CHUNK = 40_000
contigs = [genome[i:i+CHUNK] for i in range(0, len(genome), CHUNK)]
contigs = [c for c in contigs if len(c) >= 20_000]
print(f"{len(contigs)} contigs, {sum(len(c) for c in contigs)/1e6:.2f} Mbp")

runner = TpuMetaRunner(METAGENOMIC_BINS)

# stage 1: host prep
t0 = time.time()
seqs = [Sequence(c) for c in contigs]
t_seq = time.time() - t0
print(f"Sequence digitize: {t_seq:.2f} s")

t0 = time.time()
preps = [runner._prepare_contig(s) for s in seqs]
t_prep = time.time() - t0
print(f"prepare_contig (extract+geometry): {t_prep:.2f} s "
      f"({t_prep/len(contigs)*1e3:.1f} ms/contig)")
nbins = sum(len(p[0]) for p in preps)
print(f"total work items: {nbins}")

# full run, warm + timed
t0 = time.time()
runner.find_genes_batch(contigs[:2])
print(f"warmup: {time.time()-t0:.1f} s")
t0 = time.time()
res = runner.find_genes_batch(contigs)
el = time.time() - t0
tot = sum(len(c) for c in contigs)
print(f"TpuMetaRunner full: {el:.2f} s = {tot/el/1e6:.3f} Mbp/s, "
      f"{sum(len(g) for g in res)} genes")
