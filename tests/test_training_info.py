"""TrainingInfo serialization tests (reference: tests/test_training_info.py)."""

import gzip
import io
import pickle

import numpy as np
import pytest

from pyrodigal_tpu import TrainingInfo
from pyrodigal_tpu.training import TRAINING_STRUCT_SIZE


def test_struct_size():
    """The binary codec must be Prodigal `-t` compatible on x86-64
    (reference: prodigal/training.pxd layout; 558,392 bytes)."""
    assert TRAINING_STRUCT_SIZE == 558392


def test_roundtrip():
    t1 = TrainingInfo(
        0.42, translation_table=4, start_weight=4.35,
        bias=[2.0, 0.6, 0.4], type_weights=[0.5, -1.0, -2.0],
        rbs_weights=np.linspace(-4, 4, 28),
        coding_statistics=np.linspace(-5, 5, 4096),
    )
    f = io.BytesIO()
    t1.dump(f)
    f.seek(0)
    t2 = TrainingInfo.load(f)
    assert t1.gc == t2.gc
    assert t1.translation_table == t2.translation_table
    assert np.array_equal(np.asarray(t1.bias), np.asarray(t2.bias))
    assert np.array_equal(
        np.asarray(t1.coding_statistics), np.asarray(t2.coding_statistics)
    )


def test_load_error():
    with pytest.raises(EOFError):
        TrainingInfo.load(io.BytesIO(b"not ok\n"))


def test_load_golden(data):
    """The golden Prodigal training file must decode with correct fields."""
    with gzip.open(data("SRR492066.training.bin.gz"), "rb") as f:
        tinf = TrainingInfo.load(f)
    assert tinf.gc == 0.3010045159434068
    assert tinf.translation_table == 11
    assert tinf.start_weight == 4.35
    assert tinf.uses_sd
    assert tinf.bias[0] == 2.6770525781861187


def test_pickle():
    t1 = TrainingInfo(0.61, rbs_weights=np.arange(28.0))
    t2 = pickle.loads(pickle.dumps(t1))
    assert t1.gc == t2.gc
    assert np.array_equal(np.asarray(t1.rbs_weights), np.asarray(t2.rbs_weights))


def test_invalid_gc():
    with pytest.raises(ValueError):
        TrainingInfo(1.5)


def test_invalid_table():
    with pytest.raises(ValueError):
        TrainingInfo(0.5, translation_table=7)
