"""Build the built-in metagenomic bins asset.

The reference compiles 50 pre-trained Prodigal models from
`vendor/Prodigal/training.c`; that submodule is empty in the snapshot and
this environment has no network, so the upstream weights cannot be
retrieved (see KNOWN_GAPS.md #3).  This script produces a *functional*
stand-in asset with the same shape (50 bins, Prodigal-style descriptors
``idx|name|B|gc|tt|uses_sd``):

* anchor models are trained with the real training pipeline on the genomes
  available in the reference test data (a low-GC firmicute metagenome
  assembly, an E. coli contig, a mid-GC Lactobacillus genome, and a high-GC
  actinobacterial scaffold), for translation tables 11 and 4;
* the remaining slots interpolate neighbouring anchor models linearly in
  log-weight space over a GC grid, so the meta-mode GC-window sweep visits
  a realistic number of bins per contig.

Drop-in replacement: convert any externally obtained Prodigal training
files into the same ``.npz`` with `MetagenomicBins.dump`.
"""

import os
import sys
import warnings

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from pyrodigal_tpu import GeneFinder, TrainingInfo
from pyrodigal_tpu.fasta import parse
from pyrodigal_tpu.metagenomic import MetagenomicBin, MetagenomicBins, NUM_META

DATA_DIRS = [
    "/root/reference/src/pyrodigal/tests/data",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests", "data"),
]


def data(name):
    for d in DATA_DIRS:
        p = os.path.join(d, name)
        if os.path.exists(p):
            return p
    raise FileNotFoundError(name)


def train_model(fasta, tt, name, force_nonsd=False):
    records = list(parse(data(fasta)))
    finder = GeneFinder(meta=False)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        tinf = finder.train(
            *(r.seq for r in records), translation_table=tt,
            force_nonsd=force_nonsd,
        )
    print(f"  trained {name}: gc={tinf.gc:.4f} tt={tt} uses_sd={int(tinf.uses_sd)}")
    return name, tinf


def interpolate(t1, t2, frac, gc):
    """Linear interpolation of two models in weight space."""
    out = TrainingInfo(gc)
    a = t1._data.view(np.float64).copy()
    b = t2._data.view(np.float64).copy()
    mixed = a * (1.0 - frac) + b * frac
    out._data[:] = mixed.view(np.uint8)
    # integer / discrete fields must not be interpolated
    out.gc = gc
    out.translation_table = t1.translation_table
    out.uses_sd = t1.uses_sd if frac < 0.5 else t2.uses_sd
    out.start_weight = 4.35
    return out


def main():
    print("training anchor models...")
    anchors = [
        train_model("SRR492066.fna.gz", 4, "Firmicute_meta_tt4"),
        train_model("SRR492066.fna.gz", 11, "Firmicute_meta"),
        train_model("MIIJ01000039.fna.gz", 11, "Escherichia_contig"),
        train_model("GCF_001457455.1_NCTC11397_genomic.fna.gz", 11, "Lactobacillus"),
        train_model("KK037166.fna.gz", 11, "Kutzneria_scaffold"),
    ]

    # split anchors by translation table; build a GC grid for tt11 and a
    # small low-GC set for tt4 (mirroring the shape of the upstream asset,
    # which mixes tt11 and tt4/25 bins)
    tt11 = sorted(
        [(t.gc, n, t) for n, t in (a for a in anchors if a[1].translation_table == 11)]
    )
    tt4 = [(t.gc, n, t) for n, t in (a for a in anchors if a[1].translation_table == 4)]

    bins = []

    def add_bin(tinf, name):
        idx = len(bins)
        desc = f"{idx}|{name}|B|{tinf.gc * 100:.1f}|{tinf.translation_table}|{int(tinf.uses_sd)}"
        bins.append(MetagenomicBin(tinf, desc))

    # a few tt4 bins at the low-GC end
    for gcv in (0.28, 0.30, 0.33):
        gc0, n0, t0 = tt4[0]
        t = interpolate(t0, t0, 0.0, gcv)
        add_bin(t, f"{n0}_{gcv:.2f}")

    # tt11 grid over the anchored GC range
    lo = tt11[0][0]
    hi = tt11[-1][0]
    n_tt11 = NUM_META - len(bins)
    grid = np.linspace(lo, hi, n_tt11)
    for gcv in grid:
        # find neighbours
        for k in range(len(tt11) - 1):
            if tt11[k][0] <= gcv <= tt11[k + 1][0]:
                g1, n1, t1 = tt11[k]
                g2, n2, t2 = tt11[k + 1]
                frac = 0.0 if g2 == g1 else (gcv - g1) / (g2 - g1)
                t = interpolate(t1, t2, frac, float(gcv))
                add_bin(t, f"{n1}-{n2}")
                break
        else:
            g1, n1, t1 = tt11[0] if gcv < lo else tt11[-1]
            add_bin(interpolate(t1, t1, 0.0, float(gcv)), n1)

    assert len(bins) == NUM_META, len(bins)
    out = MetagenomicBins(bins)
    dest = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..",
        "pyrodigal_tpu", "models", "metagenomic_bins.npz",
    )
    out.dump(dest)
    print(f"wrote {len(bins)} bins -> {dest}")


if __name__ == "__main__":
    main()
