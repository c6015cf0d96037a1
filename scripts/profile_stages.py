"""Stage-level timeline of the bench workload on the real chip: prep /
dispatch / produce timestamps per contig (the breakdown recorded in
PROFILE.md).  Run: python scripts/profile_stages.py"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
from pyrodigal_tpu.fasta import parse
from pyrodigal_tpu import GeneFinder
from pyrodigal_tpu.ops import meta_tpu

DATA = "/root/reference/src/pyrodigal/tests/data/"
names = ["GCF_001457455.1_NCTC11397_genomic.fna.gz", "MIIJ01000039.fna.gz",
         "GCF_001457455.1_NCTC11397_genomic_100kb.fna.gz", "SRR492066.fna.gz"]
base = [r.seq for n in names for r in parse(DATA + n)]

T0 = time.time()
def ts(): return f"{time.time()-T0:7.3f}"

orig_sweep_multi = meta_tpu.TpuMetaRunner._sweep_mega_multi
def sweep_multi(self, items):
    t0 = time.time()
    out = orig_sweep_multi(self, items)
    nn = sum(it["g"]["nn"] for it in items)
    print(f"{ts()} dispatch pack n_items={len(items)} nn={nn} "
          f"({time.time()-t0:.3f}s)", flush=True)
    return out
meta_tpu.TpuMetaRunner._sweep_mega_multi = sweep_multi

orig_prep = meta_tpu.TpuMetaRunner._prepare_contig
def prep(self, seq):
    t0 = time.time()
    out = orig_prep(self, seq)
    print(f"{ts()} prep done slen={seq.slen} ({time.time()-t0:.3f}s)", flush=True)
    return out
meta_tpu.TpuMetaRunner._prepare_contig = prep

orig_pw = meta_tpu.TpuMetaRunner._produce_winner
def pw(self, seq, num_seq, cands, nbt):
    t0 = time.time()
    out = orig_pw(self, seq, num_seq, cands, nbt)
    print(f"{ts()} produce done slen={seq.slen} ({time.time()-t0:.3f}s)", flush=True)
    return out
meta_tpu.TpuMetaRunner._produce_winner = pw

_np_asarray = np.asarray
finder = GeneFinder(meta=True)
warm = finder.find_genes_batch(base)
print(f"{ts()} ===== warm done =====", flush=True)

work = base * 3
T0 = time.time()
runner = finder._get_meta_runner()
orig_fgb = runner.find_genes_batch
t0 = time.time()
res = orig_fgb(work)
el = time.time() - t0
print(f"{ts()} total {el:.2f}s = {sum(len(c) for c in work)/el/1e6:.2f} Mbp/s", flush=True)
