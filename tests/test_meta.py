"""Meta-mode tests: C path machinery and the device-batched runner."""

import warnings

import pytest

from pyrodigal_tpu import GeneFinder, MetagenomicBins, METAGENOMIC_BINS
from pyrodigal_tpu.fasta import parse

needs_bins = pytest.mark.skipif(
    len(METAGENOMIC_BINS) == 0,
    reason="metagenomic bins asset not built (scripts/build_bins.py)",
)


@needs_bins
def test_meta_c_path(data):
    record = list(parse(data("SRR492066.fna.gz")))[0]
    p = GeneFinder(meta=True)
    genes = p.find_genes(record.seq)
    assert len(genes) > 0
    assert genes.metagenomic_bin is not None
    assert genes.training_info is genes.metagenomic_bin.training_info


@needs_bins
def test_meta_gc_window_filters_bins(data):
    record = list(parse(data("SRR492066.fna.gz")))[0]
    # low-GC contig: only low-GC bins should be considered
    p = GeneFinder(meta=True)
    genes = p.find_genes(record.seq)
    assert genes.metagenomic_bin.training_info.gc < 0.45


def test_empty_metagenomic_bins(data):
    record = list(parse(data("SRR492066.fna.gz")))[0]
    p = GeneFinder(meta=True, metagenomic_bins=MetagenomicBins())
    genes = p.find_genes(record.seq)
    assert len(genes) == 0
    assert genes.metagenomic_bin is None
    assert genes.training_info is None


@needs_bins
def test_custom_metagenomic_bins(data):
    record = list(parse(data("SRR492066.fna.gz")))[0]
    p0 = GeneFinder(meta=True)
    full = p0.find_genes(record.seq)
    chosen = full.metagenomic_bin
    sub = MetagenomicBins((chosen,))
    p1 = GeneFinder(meta=True, metagenomic_bins=sub)
    restricted = p1.find_genes(record.seq)
    assert restricted.metagenomic_bin.description == chosen.description
    assert [(g.begin, g.end) for g in restricted] == \
        [(g.begin, g.end) for g in full]


def test_meta_short_sequences():
    p = GeneFinder(meta=True)
    seq = "AATGTAGGAAAAACAGCATTTTCATTTCGCCATTTT"
    for i in range(1, len(seq)):
        genes = p.find_genes(seq[:i])
        assert len(genes) == 0


@needs_bins
def test_meta_runner_matches_c_path(data):
    """The device-batched bin sweep must reproduce the sequential C meta
    path bin-for-bin and gene-for-gene (scan DP on CPU)."""
    jax = pytest.importorskip("jax")
    from pyrodigal_tpu.ops.meta_pipeline import MetaRunner

    record = list(parse(data("SRR492066.fna.gz")))[0]
    seq = record.seq[:30000]

    p = GeneFinder(meta=True)
    g_c = p.find_genes(seq)

    runner = MetaRunner(METAGENOMIC_BINS)
    g_j = runner.find_genes(seq)

    assert g_j.metagenomic_bin.description == g_c.metagenomic_bin.description
    assert [(g.begin, g.end, g.strand) for g in g_j] == \
        [(g.begin, g.end, g.strand) for g in g_c]
    assert all(
        a._gene_data(1) == b._gene_data(1) for a, b in zip(g_c, g_j)
    )
