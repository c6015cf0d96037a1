"""Phase-level profile of TpuMetaRunner on the real TPU."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np
import jax
import jax.numpy as jnp
from pyrodigal_tpu.fasta import parse
from pyrodigal_tpu.metagenomic import METAGENOMIC_BINS
from pyrodigal_tpu.sequence import Sequence
from pyrodigal_tpu.ops.meta_tpu import TpuMetaRunner
from pyrodigal_tpu.ops import score_device as sd, dp_pallas

records = list(parse("/root/reference/src/pyrodigal/tests/data/GCF_001457455.1_NCTC11397_genomic.fna.gz"))
genome = "".join(r.seq for r in records)
CHUNK = 40_000
contigs = [genome[i:i+CHUNK] for i in range(0, len(genome), CHUNK)]
contigs = [c for c in contigs if len(c) >= 20_000]

runner = TpuMetaRunner(METAGENOMIC_BINS, prep_threads=8)

# warm up compile
_ = runner.find_genes_batch(contigs[:2])

work = contigs[2:]
T = {}
def tick(k, t0):
    T[k] = T.get(k, 0.0) + (time.time() - t0)

# phase 1: Sequence construction
t0 = time.time()
seqs = [Sequence(s) for s in work]
tick("sequence", t0)

# phase 2: prep (extraction + geometry, threaded)
t0 = time.time()
preps = [runner.pool.submit(runner._prepare_contig, s) for s in seqs]
res = [f.result() for f in preps]
tick("prep", t0)

per_contig = [(ci, c, g, n) for ci, (c, g, n, fb) in enumerate(res) if not fb]
print("fallbacks:", sum(1 for (_c,_g,_n,fb) in res if fb))

# phase 3: sweeps (contig-aligned packing + on-device winner select)
t0 = time.time()
launches = []
cur_work, cur_geoms, cur_slots = [], {}, {}
for ci, cand, geoms, _nbt in per_contig:
    tts = {runner.bins[b].training_info.translation_table for b in cand}
    if cur_work and (len(cur_work) + len(cand) > runner.batch_size
                     or len(cur_geoms) + len(tts) > runner.max_geoms):
        launches.append({"work": cur_work,
                         "dev": runner._sweep(cur_work, cur_geoms, cur_slots),
                         "slots": cur_slots})
        cur_work, cur_geoms, cur_slots = [], {}, {}
    cur_slots[ci] = len(cur_slots)
    for b in cand:
        tt = runner.bins[b].training_info.translation_table
        key = (ci, tt)
        if key not in cur_geoms:
            cur_geoms[key] = geoms[tt]
        cur_work.append((ci, b, key))
if cur_work:
    launches.append({"work": cur_work,
                     "dev": runner._sweep(cur_work, cur_geoms, cur_slots),
                     "slots": cur_slots})
tick("sweep_dispatch", t0)
t0 = time.time()
for r in launches:
    r["dev"].block_until_ready()
tick("sweep_sync", t0)
print("launches:", len(launches), "items:", sum(len(r["work"]) for r in launches))

# phase 4: winner pulls (one packed transfer per launch)
t0 = time.time()
NB = runner.node_bucket
best = {}
for r in launches:
    arr = np.asarray(r["dev"])
    for ci, slot in r["slots"].items():
        row = arr[slot]
        win_item = int(row[3 * NB])
        sc = float(np.int32(row[3 * NB + 1]).view(np.float32))
        best[ci] = (sc, r["work"][win_item][1])
tick("winner_pull", t0)

# phase 5: winner re-score + finish (host C)
t0 = time.time()
nodes_maps = {ci: nbt for ci, _c, _g, nbt in per_contig}
for ci, (sc, b) in best.items():
    if sc > -100:
        nodes = runner._score_winner(seqs[ci], nodes_maps[ci], b)
tick("winner_rescore", t0)

total = sum(T.values())
for k, v in T.items():
    print(f"{k:16s} {v:7.2f}s {100*v/total:5.1f}%")
print("total", round(total,2), "bp", sum(len(c) for c in work))
