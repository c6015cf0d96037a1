"""Extended hypothesis scan for `record_gc_bias` (KNOWN_GAPS.md #1).

Vectorized: per-gene winner-class counts come from 3 cumulative sums of the
max-GC-frame plot indicator, so each (geometry x weight x tiebreak) hypothesis
costs O(n_genes).  A hypothesis is accepted only if BOTH oracles match to
<1e-9 (current best is 3e-4 / 2.5e-3).
"""
import sys, os, itertools
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
from pyrodigal_tpu.fasta import parse
from pyrodigal_tpu.sequence import Sequence
from pyrodigal_tpu.nodes import Nodes

DATA = "/root/reference/src/pyrodigal/tests/data/"

TARGETS = {
    "SRR": np.array([2.6770525781861187, 0.17260535063729165, 0.1503420711765898]),
    "GCF": np.array([1.1646208376404976, 0.23845006938579058, 1.5969290929737117]),
}


def setup(name, joinseqs=False, closed=False):
    recs = list(parse(DATA + name))
    s = "TTAATTAATTAA".join([r.seq for r in recs] + [""]) if joinseqs else recs[0].seq
    seq = Sequence(s)
    nodes = Nodes()
    nodes.extract(seq, translation_table=11, closed=closed)
    nodes.sort()
    gp = np.asarray(seq.max_gc_frame_plot(), dtype=np.int64)
    n = nodes.length
    st = nodes.type[:n] != 3
    # cumulative indicator sums: C[k, j] = #{p < j : gp[p] == k}
    slen = seq.slen
    C = np.zeros((3, slen + 1), np.int64)
    for k in range(3):
        C[k, 1:] = np.cumsum(gp == k)
    return dict(
        slen=slen, gp=gp, C=C,
        ndx=nodes.ndx[:n].astype(np.int64)[st],
        sv=nodes.stop_val[:n].astype(np.int64)[st],
        strand=nodes.strand[:n][st].astype(np.int64),
        typ=nodes.type[:n][st].astype(np.int64),
    )


def gene_counts(S, rev_sign, fr_anchor, lo_off, hi_off):
    """Per-gene counts c[g, r] of rel-class r over the inclusive span.

    rel = (gp - fr) % 3 on fwd;  rev uses rev_sign: +1 same, -1 flipped.
    fr_anchor: 'ndx' -> fr = ndx%3 both strands;
               'slen' -> rev uses fr = (slen-1-ndx)%3.
    """
    ndx, sv, strand, slen, C = S["ndx"], S["sv"], S["strand"], S["slen"], S["C"]
    fwd = strand == 1
    lo = np.where(fwd, ndx, sv) + lo_off
    hi = np.where(fwd, sv, ndx) + hi_off
    lo = np.clip(lo, 0, slen)
    hi = np.clip(hi + 1, 0, slen)  # exclusive
    fr = ndx % 3
    if fr_anchor == "slen":
        fr = np.where(fwd, fr, (slen - 1 - ndx) % 3)
    c = np.zeros((len(ndx), 3), np.float64)
    for r in range(3):
        # class r on fwd: gp == (fr + r) % 3 ; on rev with rev_sign=-1:
        # rel = (fr - gp) % 3 == r  -> gp == (fr - r) % 3
        k_fwd = (fr + r) % 3
        k_rev = (fr - r) % 3 if rev_sign < 0 else (fr + r) % 3
        k = np.where(fwd, k_fwd, k_rev)
        for kk in range(3):
            m = k == kk
            c[m, r] = C[kk][hi[m]] - C[kk][lo[m]]
    return c


def dedup_mask(S, which):
    """One gene per (stop_val, strand): 'first' or 'last' in sorted order."""
    key = S["sv"] * 4 + (S["strand"] + 1)
    if which == "first":
        _, idx = np.unique(key, return_index=True)
    else:
        u, inv = np.unique(key, return_inverse=True)
        idx = np.zeros(len(u), np.int64)
        idx[inv] = np.arange(len(key))
    m = np.zeros(len(key), bool)
    m[idx] = True
    return m


def winners(c, order):
    """argmax with tie-break preferring earlier element of `order`."""
    cc = c[:, list(order)]
    w = np.argmax(cc, axis=1)          # first max in permuted order
    return np.asarray(order)[w]


def run():
    S1 = setup("SRR492066.fna.gz")
    S2 = setup("GCF_001457455.1_NCTC11397_genomic_100kb.fna.gz", True, True)
    hits = []
    geoms = list(itertools.product(
        [+1, -1],                       # rev_sign
        ["ndx", "slen"],                # fr anchor for rev
        [0, -2],                        # lo_off  (rev span start tweak)
        [0, 2],                         # hi_off
    ))
    orders = [(0, 1, 2), (2, 1, 0), (1, 2, 0), (0, 2, 1)]

    subsets = {
        "all": (np.ones(len(S1["ndx"]), bool), np.ones(len(S2["ndx"]), bool)),
        "first": (dedup_mask(S1, "first"), dedup_mask(S2, "first")),
        "last": (dedup_mask(S1, "last"), dedup_mask(S2, "last")),
    }

    for g in geoms:
        C1g = gene_counts(S1, *g)
        C2g = gene_counts(S2, *g)
        for sub, (sm1, sm2) in subsets.items():
            C1 = C1g[sm1]
            C2 = C2g[sm2]
            L1 = C1.sum(1)
            L2 = C2.sum(1)
            for order in orders:
                w1 = winners(C1, order)
                w2 = winners(C2, order)
                m1 = C1[np.arange(len(w1)), w1]
                m2 = C2[np.arange(len(w2)), w2]
                frac1 = np.divide(3 * m1, L1, out=np.zeros_like(m1), where=L1 > 0)
                frac2 = np.divide(3 * m2, L2, out=np.zeros_like(m2), where=L2 > 0)
                weight_opts = {
                    "mass": (m1, m2),
                    "len": (L1, L2),
                    "frac": (frac1, frac2),
                    "one": (np.ones_like(m1), np.ones_like(m2)),
                }
                for wname, (wt1, wt2) in weight_opts.items():
                    b1 = np.zeros(3)
                    np.add.at(b1, w1, wt1)
                    b2 = np.zeros(3)
                    np.add.at(b2, w2, wt2)
                    b1 = 3 * b1 / b1.sum()
                    b2 = 3 * b2 / b2.sum()
                    e1 = np.abs(b1 - TARGETS["SRR"]).max()
                    e2 = np.abs(b2 - TARGETS["GCF"]).max()
                    if e1 < 1e-9 and e2 < 1e-9:
                        hits.append((g, sub, order, wname))
                        print("EXACT HIT:", g, sub, order, wname)
                    elif e1 < 5e-4 and e2 < 3e-3:
                        print(f"close: {g} {sub} {order} {wname}  "
                              f"err {e1:.2e} {e2:.2e}")
                # all-mass tallies (no winner selection at all)
                for wname, (bb1, bb2) in {
                    "allmass": (C1.sum(0), C2.sum(0)),
                    "allfrac": ((3 * C1 / np.maximum(L1, 1)[:, None]).sum(0),
                                (3 * C2 / np.maximum(L2, 1)[:, None]).sum(0)),
                }.items():
                    b1 = 3 * bb1 / bb1.sum()
                    b2 = 3 * bb2 / bb2.sum()
                    e1 = np.abs(b1 - TARGETS["SRR"]).max()
                    e2 = np.abs(b2 - TARGETS["GCF"]).max()
                    if e1 < 1e-9 and e2 < 1e-9:
                        hits.append((g, sub, wname))
                        print("EXACT HIT:", g, sub, wname)
                    elif e1 < 5e-4 and e2 < 3e-3:
                        print(f"close: {g} {sub} {wname}  err {e1:.2e} {e2:.2e}")
    if not hits:
        print("no exact hit in this grid")


if __name__ == "__main__":
    run()
