"""Output writer tests (reference: tests/test_genes.py TestWrite*)."""

import io
import warnings

import pytest

from pyrodigal_tpu import GeneFinder
from pyrodigal_tpu.fasta import parse


@pytest.fixture(scope="module")
def called(data):
    record = list(parse(data("SRR492066.fna.gz")))[0]
    p = GeneFinder(meta=False)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        p.train(record.seq)
    return record, p.find_genes(record.seq)


def test_write_gff_reported_bytes(called):
    record, genes = called
    buf = io.StringIO()
    n = genes.write_gff(buf, record.id)
    assert n == buf.tell()
    lines = buf.getvalue().splitlines()
    assert lines[0] == "##gff-version  3"
    assert lines[1].startswith("# Sequence Data:")
    assert lines[2].startswith("# Model Data:")
    body = [l for l in lines if not l.startswith("#")]
    assert len(body) == len(genes)
    row = body[0].split("\t")
    assert row[2] == "CDS"
    assert int(row[3]) == genes[0].begin
    assert int(row[4]) == genes[0].end


def test_write_gff_no_header(called):
    record, genes = called
    buf = io.StringIO()
    genes.write_gff(buf, record.id, header=False)
    assert not buf.getvalue().startswith("##gff-version")


def test_write_genes_roundtrip(called):
    record, genes = called
    buf = io.StringIO()
    n = genes.write_genes(buf, record.id)
    assert n == buf.tell()
    out = list(parse(iter(buf.getvalue().splitlines(True))))
    assert len(out) == len(genes)
    for rec, gene in zip(out, genes):
        assert rec.seq == gene.sequence()


def test_write_translations_roundtrip(called):
    record, genes = called
    buf = io.StringIO()
    n = genes.write_translations(buf, record.id)
    assert n == buf.tell()
    out = list(parse(iter(buf.getvalue().splitlines(True))))
    assert len(out) == len(genes)
    for rec, gene in zip(out, genes):
        assert rec.seq == gene.translate()


def test_write_translations_no_stop(called):
    record, genes = called
    buf = io.StringIO()
    genes.write_translations(buf, record.id, include_stop=False)
    out = list(parse(iter(buf.getvalue().splitlines(True))))
    for rec in out:
        assert not rec.seq.endswith("*")


def test_write_scores_structure(called):
    record, genes = called
    buf = io.StringIO()
    n = genes.write_scores(buf, record.id)
    assert n == buf.tell()
    lines = buf.getvalue().splitlines()
    assert lines[0].startswith("# Sequence Data:")
    assert lines[2].startswith("Beg\tEnd\tStd\tTotal")
    rows = [l for l in lines if l and not l.startswith(("#", "Beg"))]
    # one row per non-stop node
    import numpy as np
    n_starts = int((genes.nodes.type[:genes.nodes.length] != 3).sum())
    assert len(rows) == n_starts
    # rows are grouped by stop codon: Beg/End ordering within groups
    cols = rows[0].split("\t")
    assert len(cols) == 13


def test_write_genbank_structure(called):
    record, genes = called
    buf = io.StringIO()
    n = genes.write_genbank(buf, record.id)
    assert n == buf.tell()
    text = buf.getvalue()
    assert text.startswith("LOCUS")
    assert text.count("     CDS             ") == len(genes)
    assert text.rstrip().endswith("//")


def test_write_empty(data):
    record = list(parse(data("SRR492066.fna.gz")))[0]
    p = GeneFinder(meta=False)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        p.train(record.seq[:20000])
    genes = p.find_genes("")
    for writer in (genes.write_gff, genes.write_genes,
                   genes.write_translations, genes.write_scores):
        buf = io.StringIO()
        writer(buf, "empty")
