"""CLI end-to-end tests (flag surface: reference cli.py:64-206)."""

import gzip
import io
import os

import pytest

from pyrodigal_tpu import GeneFinder
from pyrodigal_tpu.cli import main
from pyrodigal_tpu.fasta import parse
from pyrodigal_tpu.metagenomic import METAGENOMIC_BINS

needs_bins = pytest.mark.skipif(
    len(METAGENOMIC_BINS) == 0,
    reason="metagenomic bins asset not built",
)


def _run(argv):
    out = io.StringIO()
    err = io.StringIO()
    stdin = io.StringIO()
    stdin.isatty = lambda: True
    rc = main(argv, stdout=out, stderr=err, stdin=stdin)
    return rc, out.getvalue(), err.getvalue()


@pytest.mark.filterwarnings(
    "ignore:sequence should be at least")   # CLI trains on the 80 kb
def test_single_mode_gff_matches_api(data, tmp_path):
    path = data("SRR492066.fna.gz")
    rc, out, err = _run(["-i", path, "-p", "single"])
    assert rc == 0, err
    lines = [ln for ln in out.splitlines() if ln and not ln.startswith("#")]

    record = list(parse(path))[0]
    finder = GeneFinder(backend="refcore")
    finder.train(record.seq)
    genes = finder.find_genes(record.seq)
    assert len(lines) == len(genes)
    for ln, gene in zip(lines, genes):
        cols = ln.split("\t")
        assert cols[2] == "CDS"
        assert int(cols[3]) == gene.begin
        assert int(cols[4]) == gene.end
        assert cols[6] == "+-"[gene.strand == -1]


@pytest.mark.filterwarnings(
    "ignore:sequence should be at least")   # CLI trains on the 80 kb
def test_single_mode_writers(data, tmp_path):
    path = data("SRR492066.fna.gz")
    nuc = tmp_path / "genes.fna"
    prot = tmp_path / "prots.faa"
    scores = tmp_path / "starts.tsv"
    gff = tmp_path / "out.gff"
    rc, out, err = _run([
        "-i", path, "-p", "single", "-o", str(gff), "-d", str(nuc),
        "-a", str(prot), "-s", str(scores),
    ])
    assert rc == 0, err
    assert out == ""
    assert gff.read_text().startswith("##gff-version  3")
    assert nuc.read_text().startswith(">")
    assert prot.read_text().startswith(">")
    assert scores.read_text()


@pytest.mark.filterwarnings(
    "ignore:sequence should be at least")   # CLI trains on the 80 kb
def test_training_file_roundtrip(data, tmp_path):
    path = data("SRR492066.fna.gz")
    tfile = tmp_path / "model.trn"
    rc1, out1, err1 = _run(["-i", path, "-t", str(tfile)])
    assert rc1 == 0, err1
    assert tfile.exists() and tfile.stat().st_size == 558392
    rc2, out2, err2 = _run(["-i", path, "-t", str(tfile)])
    assert rc2 == 0, err2
    assert out1 == out2


def test_training_file_rejected_in_meta(data, tmp_path):
    tfile = tmp_path / "model.trn"
    tfile.write_bytes(b"")
    rc, out, err = _run(["-i", data("SRR492066.fna.gz"), "-p", "meta",
                         "-t", str(tfile)])
    assert rc == 1
    assert "cannot specify metagenomic" in err


@needs_bins
def test_meta_mode_matches_api(data):
    path = data("SRR492066.fna.gz")
    rc, out, err = _run(["-i", path, "-p", "meta", "--backend", "refcore"])
    assert rc == 0, err
    lines = [ln for ln in out.splitlines() if ln and not ln.startswith("#")]
    record = list(parse(path))[0]
    genes = GeneFinder(meta=True, backend="refcore").find_genes(record.seq)
    assert len(lines) == len(genes)


@needs_bins
def test_meta_mode_jax_backend_byte_equal(data):
    """`-p meta --backend jax` must produce byte-identical GFF to the
    exact C engine (the batched pipeline is the product path)."""
    pytest.importorskip("jax")
    path = data("MIIJ01000039.fna.gz")
    rc_c, out_c, err_c = _run(["-i", path, "-p", "meta",
                               "--backend", "refcore"])
    assert rc_c == 0, err_c
    rc_j, out_j, err_j = _run(["-i", path, "-p", "meta", "--backend", "jax"])
    assert rc_j == 0, err_j
    strip = lambda s: [ln for ln in s.splitlines()
                       if not ln.startswith("##gff-version")]
    assert strip(out_j) == strip(out_c)


@needs_bins
def test_meta_mode_jax_all_writers_byte_equal(data, tmp_path):
    """Every output writer (-d nucleotides, -a translations, -s scores,
    -f gbk) must be byte-identical between the device pipeline and the
    exact C engine."""
    pytest.importorskip("jax")
    path = data("SRR492066.fna.gz")
    outs = {}
    for backend in ("refcore", "jax"):
        d = tmp_path / backend
        d.mkdir()
        rc, out, err = _run([
            "-i", path, "-p", "meta", "--backend", backend,
            "-f", "gbk",
            "-d", str(d / "n.fna"), "-a", str(d / "p.faa"),
            "-s", str(d / "sc.tsv")])
        assert rc == 0, err
        outs[backend] = (out, (d / "n.fna").read_text(),
                         (d / "p.faa").read_text(),
                         (d / "sc.tsv").read_text())
    assert outs["jax"] == outs["refcore"]


@pytest.mark.filterwarnings(
    "ignore:sequence should be at least")   # CLI trains on the 80 kb
def test_gzip_stdin_like_input(data, tmp_path):
    # plain-text input file (zopen sniffing passthrough)
    src = data("SRR492066.fna.gz")
    plain = tmp_path / "seq.fna"
    with gzip.open(src, "rt") as f:
        plain.write_text(f.read())
    rc1, out1, _ = _run(["-i", str(plain), "-p", "single"])
    rc2, out2, _ = _run(["-i", src, "-p", "single"])
    assert rc1 == rc2 == 0
    assert out1 == out2


def test_bad_input_returns_errno(tmp_path):
    rc, out, err = _run(["-i", str(tmp_path / "missing.fna")])
    assert rc != 0
    assert "Error" in err


@pytest.mark.filterwarnings(
    "ignore:sequence should be at least")   # CLI trains on the 80 kb
def test_jobs_thread_pool(data):
    """-j/--pool must parallelize over contigs without changing output."""
    path = data("SRR492066.fna.gz")
    rc1, out1, err1 = _run(["-i", path, "-p", "single"])
    rc2, out2, err2 = _run(["-i", path, "-p", "single", "-j", "2",
                            "--pool", "thread"])
    assert rc1 == rc2 == 0
    assert out1 == out2
