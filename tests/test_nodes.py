"""Node extraction unit tests (reference: tests/test_nodes.py)."""

import pickle

import numpy as np

from pyrodigal_tpu import Nodes, Sequence
from pyrodigal_tpu.fasta import parse


def test_extract_node_counts(data):
    """Node counts per translation table, printf'd from real Prodigal
    (reference: test_nodes.py:35-40)."""
    record = list(parse(data("SRR492066.fna.gz")))[0]
    seq = Sequence(record.seq)
    nodes = Nodes()
    for tt, expected in [(4, 2970), (11, 2293)]:
        assert nodes.extract(seq, translation_table=tt) == expected
        assert len(nodes) == expected
        nodes.clear()


def test_copy(data):
    record = list(parse(data("SRR492066.fna.gz")))[0]
    seq = Sequence(record.seq)
    n1 = Nodes()
    n1.extract(seq, translation_table=4)
    n2 = n1.copy()
    assert len(n1) == len(n2)
    assert np.array_equal(n1.ndx[:len(n1)], n2.ndx[:len(n2)])
    assert np.array_equal(n1.strand[:len(n1)], n2.strand[:len(n2)])


def test_copy_empty():
    nodes = Nodes()
    copy = nodes.copy()
    assert len(nodes) == 0
    assert len(copy) == 0


def test_pickle(data):
    record = list(parse(data("SRR492066.fna.gz")))[0]
    seq = Sequence(record.seq)
    n1 = Nodes()
    n1.extract(seq, translation_table=11)
    n2 = pickle.loads(pickle.dumps(n1))
    assert len(n1) == len(n2)
    assert np.array_equal(n1.ndx[:len(n1)], n2.ndx[:len(n2)])


def test_pickle_empty():
    n2 = pickle.loads(pickle.dumps(Nodes()))
    assert len(n2) == 0


def test_extract_edge_start():
    """Start nodes on edges must not be extracted twice in open mode
    (reference: test_nodes.py:78-99, regression #22)."""
    seq = Sequence(
        "ATGGTTAACGCTTCCGGCGACCCCGTAATCGAGGCCGCCC"
        "ACATCTGGTCAGACACGCTGACGGTGCTCAAACACAGCGC"
        "TTCGCTCAGCCCACGAGAAAAAGGCTGGTTGGAAGGCGTT"
        "GTTCCTGAAGGCGTCTTCGGTTCGACCATCGTGCTGTGTG"
        "TGGACAACAACGACACGCTTCAAGCCATTCAGGGTGATTT"
        "GAACGATTCCCTGCTTCAGGCATTGCGTACGGTAACCGGC"
        "GAAAATATGTTTCCCGCGTTCAAGGTCGTGCCGAAAACCG"
    )
    nodes = Nodes()
    nodes.extract(seq, closed=False)
    nodes.sort()
    assert nodes[0].index == 0
    assert not nodes[0].edge
    assert nodes[0].strand == 1
    assert nodes[0].type == "ATG"
    assert nodes[1].index != 0
