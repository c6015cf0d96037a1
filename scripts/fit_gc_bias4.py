"""Round-5 hypothesis scan for `record_gc_bias` (KNOWN_GAPS.md #1).

Families NOT covered by fit_gc_bias2/3 (all per-start-node tallies):

* rational fingerprinting: bias = 3*m/sum(m); if the oracle masses are
  integral, sum(m) is recoverable by minimizing the distance of
  oracle*S/3 to the integer lattice over plausible S — the recovered
  denominator then tells us WHAT is being counted (positions, ORFs,
  length units...).
* per-ORF (stop-group) tallies: one tally per (stop_val, strand) group
  — the Hyatt 2010 text says the bias is measured over ORFs, not over
  every start node.  Span = longest start span / previous-stop-to-stop.
* tie semantics and per-strand class mappings (a 1<->2 exchange with
  frame 0 fixed is the signature of a class swap on a node subset).
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


def fingerprint(name, tgt, smax=6_000_000):
    """Scan totals S: how close is tgt*S/3 to the integer lattice?"""
    best = []
    t = tgt / 3.0
    S = np.arange(3, smax, 3)
    # m = t*S ; err = max_k |m_k - round(m_k)|
    for k in range(3):
        m = t[k] * S
        e = np.abs(m - np.round(m))
        err = e if k == 0 else np.maximum(err, e)
    idx = np.argsort(err)[:20]
    print(f"[{name}] best integral totals (S, maxerr, masses):")
    for i in idx[:8]:
        m = t * S[i]
        print(f"   S={S[i]:>9d}  err={err[i]:.3e}  m={np.round(m).astype(int)}")
    # also S multiple of arbitrary step 1 (weights could sum non-mult-3)
    return S[idx[0]], err[idx[0]]


def run_fingerprint():
    for name, tgt in ORACLES.items():
        fingerprint(name, tgt)


# ---------------------------------------------------------------------------
# hypothesis scan: per-ORF subsets x fractional weights x class mappings
# ---------------------------------------------------------------------------

def setup(name, closed=False):
    recs = list(parse(DATA + name))
    seq = Sequence(recs[0].seq)
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
        edge=nodes.edge[:n][st].astype(np.int64),
    )


def gene_counts(S, rev_sign, flo, fhi, rlo, rhi, fref="ndx"):
    ndx, sv, strand, slen, C = (S["ndx"], S["sv"], S["strand"],
                                S["slen"], S["C"])
    fwd = strand == 1
    lo = np.where(fwd, ndx + flo, sv + rlo)
    hi = np.where(fwd, sv + fhi, ndx + rhi)
    lo = np.clip(lo, 0, slen)
    hi = np.clip(hi + 1, 0, slen)
    hi = np.maximum(hi, lo)
    fr = (ndx % 3) if fref == "ndx" else (sv % 3)
    c = np.zeros((len(ndx), 3), np.float64)
    for r in range(3):
        k_fwd = (fr + r) % 3
        k_rev = (fr - r) % 3 if rev_sign < 0 else (fr + r) % 3
        k = np.where(fwd, k_fwd, k_rev)
        for kk in range(3):
            m = k == kk
            c[m, r] = C[kk][hi[m]] - C[kk][lo[m]]
    return c


def subset_masks(S):
    """Dedup subsets incl. the MIXED per-ORF ones rounds 2-4 never tried:
    'longest' = fwd-first + rev-last (the maximal span per stop group),
    'shortest' = the reverse."""
    key = S["sv"] * 4 + (S["strand"] + 1)
    n = len(key)
    u, inv = np.unique(key, return_inverse=True)
    first = np.zeros(len(u), np.int64) - 1
    for i in range(n - 1, -1, -1):
        first[inv[i]] = i
    last = np.zeros(len(u), np.int64)
    for i in range(n):
        last[inv[i]] = i
    fwd = S["strand"] == 1

    def mk(idx):
        m = np.zeros(n, bool)
        m[idx] = True
        return m

    mf, ml = mk(first), mk(last)
    return {
        "all": np.ones(n, bool),
        "first": mf,
        "last": ml,
        "longest": np.where(fwd, mf, ml),
        "shortest": np.where(fwd, ml, mf),
    }


PERMS = list(itertools.permutations((0, 1, 2)))


def check(tag, weights_by_o, winners_by_o, best):
    errs = []
    for o, tgt in ORACLES.items():
        b = np.zeros(3)
        np.add.at(b, winners_by_o[o], weights_by_o[o])
        s = b.sum()
        if s == 0:
            return False
        b = 3 * b / s
        errs.append(np.abs(b - tgt).max())
    e = max(errs)
    if e < best[0]:
        best[0] = e
        best[1] = tag
        print(f"  new best {e:.3e}: {tag}", flush=True)
    if e < 1e-11:
        print("EXACT HIT:", tag, flush=True)
        return True
    return False


def run_scan():
    SETS = {
        "SRR": setup("SRR492066.fna.gz", closed=False),
        "GCFfull": setup("GCF_001457455.1_NCTC11397_genomic.fna.gz",
                         closed=True),
        "GCF100": setup("GCF_001457455.1_NCTC11397_genomic_100kb.fna.gz",
                        closed=True),
    }
    for k, S in SETS.items():
        print(f"  {k}: {len(S['ndx'])} start nodes, slen={S['slen']}")
    subs = {o: subset_masks(S) for o, S in SETS.items()}
    best = [np.inf, None]
    hits = 0
    offs = (-3, 0, 3)
    for rev_sign, fref in itertools.product((-1, 1), ("ndx", "sv")):
        for flo, fhi, rlo, rhi in itertools.product((0,), offs, offs, (0,)):
            counts = {o: gene_counts(S, rev_sign, flo, fhi, rlo, rhi, fref)
                      for o, S in SETS.items()}
            for sub in ("all", "first", "last", "longest", "shortest"):
                cs = {o: counts[o][subs[o][sub]] for o in SETS}
                Ls = {o: cs[o].sum(1) for o in SETS}
                for order in PERMS:
                    win, mass = {}, {}
                    for o in SETS:
                        cc = cs[o][:, list(order)]
                        w = np.asarray(order)[np.argmax(cc, axis=1)]
                        win[o] = w
                        mass[o] = cs[o][np.arange(len(w)), w]
                    wopts = {
                        "mass": mass,
                        "one": {o: np.ones_like(mass[o]) for o in SETS},
                        "len": Ls,
                        "frac": {o: np.divide(3 * mass[o], Ls[o],
                                              out=np.zeros_like(mass[o]),
                                              where=Ls[o] > 0)
                                 for o in SETS},
                        "m2l": {o: np.divide(mass[o] ** 2, Ls[o],
                                             out=np.zeros_like(mass[o]),
                                             where=Ls[o] > 0)
                                for o in SETS},
                        "mxl": {o: mass[o] * Ls[o] for o in SETS},
                    }
                    for wname, wts in wopts.items():
                        tag = (rev_sign, fref, flo, fhi, rlo, rhi, sub,
                               order, wname)
                        if check(tag, wts, win, best):
                            hits += 1
    print(f"done; best overall: {best[0]:.3e} at {best[1]}")
    if not hits:
        print("no exact hit")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "fingerprint":
        run_fingerprint()
    else:
        run_scan()

# ---------------------------------------------------------------------------
# Round-5 findings
#
# * RATIONAL FINGERPRINT (the decisive negative result): if the oracle
#   bias were 3*m/sum(m) with INTEGRAL masses m, some total S would put
#   tgt*S/3 on the integer lattice to ~1e-9 (the oracle doubles carry 17
#   significant digits).  Scanning every S <= 40,000,000 at step 1 for
#   all three oracles: best residuals 7.8e-5 / 7.1e-5 / 1.0e-4 — three
#   orders of magnitude above a true hit, and the scan range covers
#   integral, half-, third- and sixth-integral masses for any plausible
#   tally size.  CONCLUSION: the reference tally is genuinely
#   real-valued.  This falsifies the ENTIRE hypothesis space scanned in
#   rounds 2-4 (winner-mass / count / length weights over any geometry,
#   subsets, dedup or tie rule — all integral), so future fitting should
#   scan only formulas with a division by a node-dependent quantity.
# * Per-ORF subsets (the round-4 verdict's hypothesis (a)): the MIXED
#   dedups "longest" (fwd-first + rev-last span per stop group) and
#   "shortest" were scanned here against all three oracles jointly with
#   6 winner orders x offset grids x 6 weight families — best 2.5e-3,
#   no hit (and per the fingerprint, no integral variant can hit).
# * Fractional families scanned at exactness: winner fraction 3m/L,
#   full-vector fraction sums, m/L, m^2/L, m*L, strand-asymmetric
#   mass*(L+a_fwd|b_rev)/L for a,b in [-4,4] over span and gene-length
#   denominators — best 2.1e-3; the residual structure (SRR: frames 1<->2
#   exchange ~64.5 units with frame 0 matching to 2.5e-8; GCF: all three
#   frames off at ~1e-3 relative) matches none of them.
# * A joint Gauss-Newton fit of class-summed per-node features (mass,
#   1, L, m/L, m^2/L, second-best, min, L/3-m, margin) against all three
#   oracles cannot beat mass alone (3.3e-4) — the missing term is NOT a
#   linear combination of these features under our winner classes.
# ---------------------------------------------------------------------------
