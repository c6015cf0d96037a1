"""Run the docstring examples of the public modules (reference:
tests/test_doctest.py)."""

import doctest

import pytest

import pyrodigal_tpu.sequence
import pyrodigal_tpu.training
import pyrodigal_tpu.gene_finder
import pyrodigal_tpu.metagenomic
import pyrodigal_tpu.genes

MODULES = [
    pyrodigal_tpu.sequence,
    pyrodigal_tpu.training,
    pyrodigal_tpu.gene_finder,
    pyrodigal_tpu.metagenomic,
    pyrodigal_tpu.genes,
]


@pytest.mark.parametrize("mod", MODULES, ids=lambda m: m.__name__)
def test_doctests(mod):
    results = doctest.testmod(mod, optionflags=doctest.ELLIPSIS,
                              verbose=False)
    assert results.failed == 0
    # every module above is expected to carry at least one example by the
    # time it is added here — guard against silently-empty suites
    if mod in (pyrodigal_tpu.sequence, pyrodigal_tpu.training,
               pyrodigal_tpu.gene_finder):
        assert results.attempted > 0
