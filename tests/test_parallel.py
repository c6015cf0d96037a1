"""Device-mesh tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from pyrodigal_tpu.parallel import (  # noqa: E402
    make_mesh, sharded_background_counts, sharded_dp,
)


def test_mesh_uses_all_devices():
    mesh = make_mesh()
    assert mesh.devices.size == len(jax.devices())


def test_hexamer_counts_psum():
    """The PRODUCT background tally (sharded_background_counts, the same
    psum-merged scan train_distributed uses) must equal a serial
    hexamer tally of both strands."""
    mesh = make_mesh()
    rng = np.random.default_rng(1)
    L = 3000
    digits = rng.integers(0, 4, size=L).astype(np.uint8)

    counts = np.asarray(sharded_background_counts(mesh, digits))

    comp = (3 - digits)[::-1]
    serial = np.zeros(4096, np.int64)
    for strandarr in (digits, comp):
        for i in range(L - 5):
            idx = 0
            for j in range(6):
                idx |= (int(strandarr[i + j]) & 3) << (2 * j)
            serial[idx] += 1
    assert counts.sum() == serial.sum() == 2 * (L - 5)
    assert np.array_equal(counts, serial)


def test_sharded_dp_matches_single_device(data):
    """The mesh-sharded DP must equal the single-device scan result."""
    import warnings
    from pyrodigal_tpu.fasta import parse
    from pyrodigal_tpu import GeneFinder, Sequence, Nodes
    from pyrodigal_tpu.ops import dp_jax

    record = list(parse(data("SRR492066.fna.gz")))[0]
    p = GeneFinder(meta=False)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        tinf = p.train(record.seq)

    seq = Sequence(record.seq[:15000])
    nodes = Nodes()
    nodes.extract(seq, translation_table=11)
    nodes.sort()
    nodes.reset_scores()
    nodes.score_nodes(seq, tinf)
    nodes.record_overlapping_starts(tinf, 1, 60)
    n = nodes.length

    mesh = make_mesh()
    G = mesh.devices.size
    W = 256
    win = dp_jax.window_starts(
        nodes.ndx[:n].astype(np.int64), nodes.stop_val[:n].astype(np.int64),
        nodes.type[:n], nodes.strand[:n],
    )
    geometry = {
        "ndx": np.tile(nodes.ndx[:n].astype(np.int32), (G, 1)),
        "stop_val": np.tile(nodes.stop_val[:n].astype(np.int32), (G, 1)),
        "typ": np.tile(nodes.type[:n].astype(np.int32), (G, 1)),
        "strand": np.tile(nodes.strand[:n].astype(np.int32), (G, 1)),
        "win_lo": np.tile(win.astype(np.int32), (G, 1)),
        "valid": np.ones((G, n), bool),
    }
    per_bin = {
        "cs": np.tile((nodes.cscore[:n] + nodes.sscore[:n]).astype(np.float32), (G, 1)),
        "rscore": np.tile(nodes.rscore[:n].astype(np.float32), (G, 1)),
        "uscore": np.tile(nodes.uscore[:n].astype(np.float32), (G, 1)),
        "star_ptr": np.tile(
            nodes.star_ptr[:n * 3].reshape(n, 3).astype(np.int32), (G, 1, 1)),
    }
    geometry = {k: jnp.asarray(v) for k, v in geometry.items()}
    per_bin = {k: jnp.asarray(v) for k, v in per_bin.items()}
    st_wt = jnp.full((G,), tinf.start_weight, jnp.float32)

    score, traceb, ov = sharded_dp(mesh, geometry, per_bin, st_wt, W)
    score = np.asarray(score)

    ref_score, _, _ = dp_jax.dp_scores(
        geometry["ndx"][0], geometry["stop_val"][0], geometry["typ"][0],
        geometry["strand"][0], per_bin["cs"][0], per_bin["rscore"][0],
        per_bin["uscore"][0], per_bin["star_ptr"][0], geometry["win_lo"][0],
        geometry["valid"][0], jnp.float32(tinf.start_weight), W=W,
    )
    ref_score = np.asarray(ref_score)
    for g in range(G):
        assert np.array_equal(score[g], ref_score)


def test_sharded_meta_runner_matches_c_path(data):
    """The PRODUCT pipeline (TpuMetaRunner) sharded over the 8-device CPU
    mesh on ragged real contigs must reproduce the sequential C meta path
    gene-for-gene — the real multi-device correctness check."""
    import pytest as _pytest
    from pyrodigal_tpu import GeneFinder
    from pyrodigal_tpu.fasta import parse
    from pyrodigal_tpu.metagenomic import METAGENOMIC_BINS
    from pyrodigal_tpu.ops.meta_tpu import TpuMetaRunner
    from pyrodigal_tpu.parallel import make_mesh

    if len(METAGENOMIC_BINS) == 0:
        _pytest.skip("metagenomic bins asset not built")
    mesh = make_mesh()
    if mesh.devices.size < 2:
        _pytest.skip("needs a multi-device mesh")

    rec = list(parse(data("SRR492066.fna.gz")))[0].seq
    kk = list(parse(data("KK037166.fna.gz")))[0].seq
    seqs = [rec[:24000], kk, rec[20000:52000], rec[40000:]]

    p = GeneFinder(meta=True)
    anchor = [p.find_genes(s) for s in seqs]

    runner = TpuMetaRunner(METAGENOMIC_BINS, node_bucket=2048,
                           batch_size=64, block_size=8, mesh=mesh,
                           interpret=True)
    sharded = runner.find_genes_batch(seqs)
    for a, b in zip(anchor, sharded):
        assert b.metagenomic_bin.description == a.metagenomic_bin.description
        assert [(g.begin, g.end, g.strand) for g in b] == \
            [(g.begin, g.end, g.strand) for g in a]
        assert all(x._gene_data(1) == y._gene_data(1) for x, y in zip(a, b))


def test_sharded_mega_route_matches_c_path(data):
    """The MEGA route under a mesh shards the candidate-bin rows over the
    devices (row-parallel model sweep, geometry replicated); a
    >seq_bucket contig through `TpuMetaRunner(mesh=...)` must reproduce
    the sequential C meta path gene-for-gene."""
    import pytest as _pytest
    from pyrodigal_tpu import GeneFinder
    from pyrodigal_tpu.fasta import parse
    from pyrodigal_tpu.metagenomic import METAGENOMIC_BINS
    from pyrodigal_tpu.ops.meta_tpu import TpuMetaRunner
    from pyrodigal_tpu.parallel import make_mesh

    if len(METAGENOMIC_BINS) == 0:
        _pytest.skip("metagenomic bins asset not built")
    mesh = make_mesh()
    if mesh.devices.size < 2:
        _pytest.skip("needs a multi-device mesh")

    rec = list(parse(data("SRR492066.fna.gz")))[0].seq
    seqs = [rec[:30000], rec[30000:52000]]

    p = GeneFinder(meta=True, backend="refcore")
    anchor = [p.find_genes(s) for s in seqs]

    # seq_bucket shrunk to force the mega route on both contigs
    runner = TpuMetaRunner(METAGENOMIC_BINS, seq_bucket=2048, mesh=mesh,
                           interpret=True)
    sharded = runner.find_genes_batch(seqs)
    for a, b in zip(anchor, sharded):
        assert b.metagenomic_bin.description == a.metagenomic_bin.description
        assert [(g.begin, g.end, g.strand) for g in b] == \
            [(g.begin, g.end, g.strand) for g in a]
        assert all(x._gene_data(1) == y._gene_data(1) for x, y in zip(a, b))


def test_train_distributed_bit_equal(data):
    """`train_distributed` shards the O(bp) background-statistics scan
    over the mesh; its psum-merged counts are bit-identical to the host
    scan, so the final TrainingInfo must equal `GeneFinder.train`
    byte-for-byte."""
    import warnings

    import numpy as np

    from pyrodigal_tpu import GeneFinder
    from pyrodigal_tpu.fasta import parse
    from pyrodigal_tpu.parallel import make_mesh, train_distributed

    rec = list(parse(data("SRR492066.fna.gz")))[0]
    p = GeneFinder(backend="refcore")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ref = p.train(rec.seq)

    mesh = make_mesh()
    tinf = train_distributed(mesh, rec.seq)
    assert bytes(tinf.raw) == bytes(ref.raw)


def test_train_distributed_contig_sharded(data):
    """A multi-contig training set sharded over the mesh (each contig's
    background AND gene hexamer tallies on its owning device, psum-merged)
    must reproduce the joined-sequence `GeneFinder.train` byte-for-byte
    (reference joining: lib.pyx:5536-5543)."""
    import warnings

    from pyrodigal_tpu import GeneFinder
    from pyrodigal_tpu.fasta import parse
    from pyrodigal_tpu.parallel import make_mesh, train_distributed

    seq = list(parse(data("SRR492066.fna.gz")))[0].seq
    # a 5-contig training set (uneven sizes, more contigs than some mesh
    # axes, one tiny contig)
    cuts = [0, 11000, 30011, 30500, 61000, len(seq)]
    contigs = [seq[cuts[k]:cuts[k + 1]] for k in range(5)]

    p = GeneFinder(backend="refcore")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ref = p.train(*contigs)

    mesh = make_mesh()
    tinf = train_distributed(mesh, *contigs)
    assert bytes(tinf.raw) == bytes(ref.raw)
