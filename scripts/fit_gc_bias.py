"""Fitting harness for the reconstructed `record_gc_bias` (see KNOWN_GAPS.md #1).

Searches window/mapping/tally variants of the GC-frame-bias statistic against
the two exact oracles:

* SRR492066 single-mode training: bias == [2.6770525781861187,
  0.17260535063729165, 0.1503420711765898]
  (reference: test_gene_finder.py:337-345)
* GCF 100kb closed-mode training: bias == [1.1646208376404976,
  0.23845006938579058, 1.5969290929737117]
  (reference: tests/data/GCF_..._100kb.tinf_closed.bin.gz)

Current best (baked into refcore.c): per-nucleotide counts over
[node..stop_val] with relative frame (k-fr)%3 fwd / (fr-k)%3 rev, winner mass
tally, bias = 3*frames/total.  Residual: 2.9e-4 / 1.5e-3.

Evidence notes:
* no integer winner-mass tally reproduces the oracle bits for ANY total
  (scanned T in [3, 6e6]) -> the reference accumulates fractional weights;
* frame-0 fraction matches to 8 significant digits under the current
  geometry, the residual lives in the frame-1/frame-2 split.
"""
import sys, itertools, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
from pyrodigal_tpu.fasta import parse
from pyrodigal_tpu.sequence import Sequence
from pyrodigal_tpu.nodes import Nodes

DATA = "/root/reference/src/pyrodigal/tests/data/"

def setup(name, joinseqs=False, closed=False):
    recs = list(parse(DATA + name))
    s = "TTAATTAATTAA".join([r.seq for r in recs]+[""]) if joinseqs else recs[0].seq
    seq = Sequence(s)
    nodes = Nodes()
    nodes.extract(seq, translation_table=11, closed=closed)
    nodes.sort()
    gp = np.asarray(seq.max_gc_frame_plot(), dtype=np.int64)
    n = nodes.length
    st = nodes.type[:n] != 3
    return dict(slen=seq.slen, gp=gp,
                ndx=nodes.ndx[:n].astype(np.int64)[st],
                sv=nodes.stop_val[:n].astype(np.int64)[st],
                strand=nodes.strand[:n][st])

TARGETS = {
    "SRR": np.array([2.6770525781861187, 0.17260535063729165, 0.1503420711765898]),
    "GCF": np.array([1.1646208376404976, 0.23845006938579058, 1.5969290929737117]),
}

def current_best(S):
    gp, slen = S["gp"], S["slen"]
    frames = np.zeros(3)
    for i in range(len(S["ndx"])):
        fr = S["ndx"][i] % 3
        c = np.zeros(3)
        if S["strand"][i] == 1:
            js = np.arange(max(S["ndx"][i], 0), min(S["sv"][i]+1, slen))
            rel = (gp[js]-fr) % 3
        else:
            js = np.arange(max(S["sv"][i], 0), min(S["ndx"][i]+1, slen))
            rel = (fr-gp[js]) % 3
        np.add.at(c, rel, 1)
        m = (0 if c[0] > c[2] else 2) if c[0] > c[1] else (1 if c[1] > c[2] else 2)
        frames[m] += c[m]
    return frames*3/frames.sum()

if __name__ == "__main__":
    S1 = setup("SRR492066.fna.gz")
    S2 = setup("GCF_001457455.1_NCTC11397_genomic_100kb.fna.gz", True, True)
    for name, S in (("SRR", S1), ("GCF", S2)):
        b = current_best(S)
        print(name, b, "err", np.abs(b-TARGETS[name]).max())
