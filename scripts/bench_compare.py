"""Quick timing comparison: BatchMetaRunner (host scoring) vs TpuMetaRunner
(device scoring) on the real TPU, GCF genome in 40kb chunks."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

from pyrodigal_tpu.fasta import parse
from pyrodigal_tpu.metagenomic import METAGENOMIC_BINS

which = sys.argv[1] if len(sys.argv) > 1 else "tpu"
CHUNK = int(sys.argv[2]) if len(sys.argv) > 2 else 40_000

records = list(parse("/root/reference/src/pyrodigal/tests/data/GCF_001457455.1_NCTC11397_genomic.fna.gz"))
genome = "".join(r.seq for r in records)
contigs = [genome[i:i+CHUNK] for i in range(0, len(genome), CHUNK)]
contigs = [c for c in contigs if len(c) >= 20_000]

if which == "tpu":
    from pyrodigal_tpu.ops.meta_tpu import TpuMetaRunner
    runner = TpuMetaRunner(METAGENOMIC_BINS)
else:
    from pyrodigal_tpu.ops.meta_batch import BatchMetaRunner
    runner = BatchMetaRunner(METAGENOMIC_BINS)

t0 = time.time(); warm = runner.find_genes_batch(contigs[:2]); print("warmup", round(time.time()-t0,2))
work = contigs[2:]
bp = sum(len(c) for c in work)
t0 = time.time(); res = runner.find_genes_batch(work); el = time.time()-t0
print(which, "elapsed", round(el,2), "Mbp/s", round(bp/el/1e6,3), "genes", sum(len(g) for g in res))
