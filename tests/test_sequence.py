"""Sequence digitization, masking and Shine-Dalgarno unit tests.

Mirrors the reference test strategy (reference: tests/test_sequence.py).
"""

import pickle

import numpy as np
import pytest

from pyrodigal_tpu import Sequence, TrainingInfo

RAW = "ATGCNNNNNNNNNNATGCNNNNNNNNTGC"


def test_unknown():
    s = Sequence(RAW)
    assert s.unknown == RAW.count("N")


def test_gc_known():
    s = Sequence(RAW)
    gc = RAW.count("G") + RAW.count("C")
    assert s.gc_known == gc / (len(RAW) - RAW.count("N"))


def test_str():
    assert str(Sequence(RAW)) == RAW


def test_no_region_masking():
    assert len(Sequence(RAW, mask=False).masks) == 0


def test_region_masking():
    seq = Sequence(RAW, mask=True, mask_size=0)
    assert len(seq.masks) == 2
    assert (seq.masks[0].begin, seq.masks[0].end) == (4, 14)
    assert (seq.masks[1].begin, seq.masks[1].end) == (18, 26)
    seq = Sequence(RAW, mask=True, mask_size=10)
    assert len(seq.masks) == 1
    assert (seq.masks[0].begin, seq.masks[0].end) == (4, 14)


def test_mask_trailing():
    seq = Sequence("AGCGGGCTACTG" + "N" * 41, mask=True, mask_size=10)
    assert len(seq.masks) == 1


def test_pickle():
    s1 = Sequence(RAW, mask=True)
    s2 = pickle.loads(pickle.dumps(s1))
    assert len(s1) == len(s2)
    assert str(s1) == str(s2)
    assert s1.gc == s2.gc
    assert len(s1.masks) == len(s2.masks)


@pytest.fixture
def sd_tinf():
    # with all-zero weights the tie rule keeps the highest motif index,
    # making the expected winners independent of a trained profile
    return TrainingInfo(0.30)


def test_shine_dalgarno_exact(sd_tinf):
    seq = Sequence("AGGAGGTTAGCAAATATG")
    for i in range(10):
        # full AGGAGG at 5-10bp spacing (27) when scanning from position 0,
        # the GGA sub-motif (13) from position 3
        expected = 27 if i == 0 else 13 if i == 3 else 0
        assert seq.shine_dalgarno(i, 15, sd_tinf) == expected, i
    seq = Sequence("AGGTGGTTAGCAAATATG")
    for i in range(10):
        expected = 6 if i == 0 else 0
        assert seq.shine_dalgarno(i, 15, sd_tinf) == expected, i


def test_shine_dalgarno_mismatch(sd_tinf):
    seq = Sequence("AGGAGGTTAGCAAATATG")
    for i in range(10):
        assert seq.shine_dalgarno(i, 15, sd_tinf, exact=False) == 0, i
    seq = Sequence("AGGTGGTTAGCAAATATG")
    for i in range(10):
        expected = 19 if i == 0 else 0
        assert seq.shine_dalgarno(i, 15, sd_tinf, exact=False) == expected, i
