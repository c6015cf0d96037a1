"""Round-2 hypothesis scan for `record_gc_bias` (KNOWN_GAPS.md #1).

New vs fit_gc_bias2: (a) THREE exact-double oracles (SRR open, GCF-full
closed, GCF-100kb closed); (b) independent span offsets per strand end
(fwd_lo, fwd_hi, rev_lo, rev_hi); (c) weight hypotheses including
cross-span fractions.  Counts for any offset combo are O(genes) via the
class cumsums.
"""
import sys, os, itertools
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
from pyrodigal_tpu.fasta import parse
from pyrodigal_tpu.sequence import Sequence
from pyrodigal_tpu.nodes import Nodes

DATA = "/root/reference/src/pyrodigal/tests/data/"

ORACLES = {
    "SRR": np.array([2.6770525781861187, 0.17260535063729165,
                     0.15034207117658979]),
    "GCFfull": np.array([1.5868921611202216, 0.24776834639857023,
                         1.1653394924812084]),
    "GCF100": np.array([1.1646208376404976, 0.23845006938579058,
                        1.5969290929737117]),
}


def setup(name, closed=False, append_join=False):
    recs = list(parse(DATA + name))
    s = recs[0].seq
    if append_join:
        s = s + "TTAATTAATTAA"
    seq = Sequence(s)
    nodes = Nodes()
    nodes.extract(seq, translation_table=11, closed=closed)
    nodes.sort()
    gp = np.asarray(seq.max_gc_frame_plot(), dtype=np.int64)
    n = nodes.length
    st = nodes.type[:n] != 3
    slen = seq.slen
    C = np.zeros((3, slen + 1), np.int64)
    for k in range(3):
        C[k, 1:] = np.cumsum(gp == k)
    return dict(
        slen=slen, C=C,
        ndx=nodes.ndx[:n].astype(np.int64)[st],
        sv=nodes.stop_val[:n].astype(np.int64)[st],
        strand=nodes.strand[:n][st].astype(np.int64),
    )


def gene_counts(S, rev_sign, flo, fhi, rlo, rhi):
    """c[g, r]: count of rel class r over fwd span [ndx+flo, sv+fhi] /
    rev span [sv+rlo, ndx+rhi] (inclusive)."""
    ndx, sv, strand, slen, C = S["ndx"], S["sv"], S["strand"], S["slen"], S["C"]
    fwd = strand == 1
    lo = np.where(fwd, ndx + flo, sv + rlo)
    hi = np.where(fwd, sv + fhi, ndx + rhi)
    lo = np.clip(lo, 0, slen)
    hi = np.clip(hi + 1, 0, slen)
    hi = np.maximum(hi, lo)
    fr = ndx % 3
    c = np.zeros((len(ndx), 3), np.float64)
    for r in range(3):
        k_fwd = (fr + r) % 3
        k_rev = (fr - r) % 3 if rev_sign < 0 else (fr + r) % 3
        k = np.where(fwd, k_fwd, k_rev)
        for kk in range(3):
            m = k == kk
            c[m, r] = C[kk][hi[m]] - C[kk][lo[m]]
    return c


def dedup_mask(S, which):
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


def check(tag, weights_by_o, winners_by_o):
    ok = True
    errs = []
    for o, tgt in ORACLES.items():
        b = np.zeros(3)
        np.add.at(b, winners_by_o[o], weights_by_o[o])
        s = b.sum()
        if s == 0:
            return
        b = 3 * b / s
        e = np.abs(b - tgt).max()
        errs.append(e)
        if e > 1e-12:
            ok = False
    if ok:
        print("EXACT HIT:", tag, flush=True)
        return True
    if max(errs) < 2e-3:
        print(f"close: {tag}  errs={['%.2e' % e for e in errs]}", flush=True)
    return False


def run():
    print("setting up...", flush=True)
    SETS = {
        "SRR": setup("SRR492066.fna.gz", closed=False),
        "GCFfull": setup("GCF_001457455.1_NCTC11397_genomic.fna.gz",
                         closed=True),
        "GCF100": setup("GCF_001457455.1_NCTC11397_genomic_100kb.fna.gz",
                        closed=True),
    }
    for k, S in SETS.items():
        print(f"  {k}: {len(S['ndx'])} start nodes, slen={S['slen']}")

    subsets = {
        nm: {o: (dedup_mask(S, nm) if nm != "all"
                 else np.ones(len(S["ndx"]), bool))
             for o, S in SETS.items()}
        for nm in ("all", "first", "last")
    }

    offs = [-3, -2, -1, 0, 1, 2, 3]
    hits = 0
    for rev_sign in (-1, +1):
        for flo, fhi in itertools.product((0,), offs):
            for rlo, rhi in itertools.product(offs, (0,)):
                counts = {o: gene_counts(S, rev_sign, flo, fhi, rlo, rhi)
                          for o, S in SETS.items()}
                for sub, masks in subsets.items():
                    cs = {o: counts[o][masks[o]] for o in SETS}
                    Ls = {o: cs[o].sum(1) for o in SETS}
                    for order in ((0, 1, 2), (2, 1, 0)):
                        win = {}
                        mass = {}
                        for o in SETS:
                            cc = cs[o][:, list(order)]
                            w = np.asarray(order)[np.argmax(cc, axis=1)]
                            win[o] = w
                            mass[o] = cs[o][np.arange(len(w)), w]
                        wopts = {
                            "mass": mass,
                            "one": {o: np.ones_like(mass[o]) for o in SETS},
                            "len": Ls,
                            "frac": {o: np.divide(
                                3 * mass[o], Ls[o],
                                out=np.zeros_like(mass[o]),
                                where=Ls[o] > 0) for o in SETS},
                        }
                        for wname, wts in wopts.items():
                            tag = (rev_sign, flo, fhi, rlo, rhi, sub, order,
                                   wname)
                            if check(tag, wts, win):
                                hits += 1
    if not hits:
        print("no exact hit")


if __name__ == "__main__":
    run()

# ---------------------------------------------------------------------------
# Round-3 findings (fit continued via /tmp harnesses + rc_gc_bias_counts):
# * the per-node counts used by refcore's reconstruction were exported
#   bit-exactly (rc_gc_bias_counts) and the aggregation space re-scanned:
#   node subsets (all/dedup-first/dedup-last/non-edge/ATG/fwd), weights
#   (winner-mass, 1, length, winner-fraction), geometry offsets
#   (flo/fhi/rlo/rhi in [-1,1], both rev mappings, frame rotations), with
#   Prodigal max_fr tie semantics.  Best remains winner-mass/all-starts
#   geometry variants at ~1e-4..2e-3 across the three oracles; no
#   configuration approaches machine precision on all three.
# * the max-GC frame plot itself was audited line-by-line against
#   lib.pyx:724-768 (present in the snapshot) — it is faithful, so the
#   residual lives in the (vendored, absent) tally formula alone.
