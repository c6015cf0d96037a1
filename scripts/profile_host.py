"""Fine-grained host-side (C/numpy) stage profile on the 2.46 Mbp genome.

Times every host stage of the meta pipeline: digitize, node extraction,
geometry precompute (device input prep), winner rescore, exact DP,
finishing.  Pure CPU — no JAX imports needed.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

from pyrodigal_tpu.fasta import parse
from pyrodigal_tpu.metagenomic import METAGENOMIC_BINS
from pyrodigal_tpu.sequence import Sequence
from pyrodigal_tpu.nodes import Nodes
from pyrodigal_tpu.ops import score_device as sd

PATH = None
for d in ("/root/reference/src/pyrodigal/tests/data",
          os.path.join(os.path.dirname(os.path.dirname(
              os.path.abspath(__file__))), "tests", "data")):
    p = os.path.join(d, "GCF_001457455.1_NCTC11397_genomic.fna.gz")
    if os.path.exists(p):
        PATH = p
        break

text = "".join(r.seq for r in parse(PATH))
print(f"genome: {len(text)} bp")


def t(label, fn, n=3):
    fn()
    t0 = time.time()
    for _ in range(n):
        out = fn()
    print(f"{label:42s} {(time.time()-t0)/n*1e3:9.1f} ms", flush=True)
    return out


seq = t("Sequence() digitize+mask", lambda: Sequence(text))

nodes = Nodes()


def extract():
    nd = Nodes()
    nd.extract(seq, translation_table=11, closed=False,
               min_gene=90, min_edge_gene=60)
    nd.sort()
    return nd


nodes = t("extract_nodes + sort", extract)
print(f"  nn = {nodes.length}")

g = t("prepare_geometry (device input prep)",
      lambda: sd.prepare_geometry(seq, nodes, 11, False, 60, 32))

# winner finishing path
b = 0
lo = min(0.65, 0.88495 * seq.gc - 0.0102337)
hi = max(0.35, 0.86596 * seq.gc + 0.1131991)
cands = [i for i in range(len(METAGENOMIC_BINS))
         if lo <= METAGENOMIC_BINS[i].training_info.gc <= hi]
print(f"  candidate bins: {len(cands)}")
tinf = METAGENOMIC_BINS[cands[len(cands) // 2]].training_info


def rescore():
    nd = nodes.copy()
    nd.reset_scores()
    nd.score_nodes(seq, tinf, closed=False, is_meta=True)
    nd.record_overlapping_starts(tinf, 1, 60)
    return nd


nd2 = t("winner rescore (score_nodes + stars)", rescore)

# inner splits of score_nodes
nd3 = nodes.copy()
nd3.reset_scores()
t("  calc_orf_gc", lambda: nd3._calc_orf_gc(seq))
t("  raw_coding_score", lambda: nd3._raw_coding_score(seq, tinf)
  if hasattr(nd3, "_raw_coding_score") else None)

t("nodes.copy", lambda: nodes.copy())


def dp():
    nd = nd2.copy()
    return nd.dynamic_programming(tinf, final=True)


t("exact DP (final)", dp)

nd4 = nd2.copy()
ipath = nd4.dynamic_programming(tinf, final=True)


def finish():
    nd = nd4.copy()
    from pyrodigal_tpu.genes import Genes
    genes = Genes()
    genes._num_seq = 1
    genes.meta = True
    genes.sequence = seq
    nd.eliminate_bad_genes(ipath, tinf)
    genes._extract(nd, ipath)
    genes._tweak_final_starts(nd, tinf, 60)
    return genes


t("finishing (eliminate+extract+tweak)", finish)
