"""pyrodigal_tpu — a TPU-native prokaryotic gene-calling engine.

A from-scratch reimplementation of the Prodigal v2.6.3 gene-finding method
(as exposed by the reference library althonos/pyrodigal) with two compute
paths:

* an exact float64 C reference engine (`pyrodigal_tpu._native`) for
  bit-parity with Prodigal and for differential testing, and
* a JAX/XLA/Pallas batched pipeline (`pyrodigal_tpu.ops`,
  `pyrodigal_tpu.parallel`) that maps the node-scoring and dynamic-
  programming workload onto TPU hardware, batching contigs and metagenomic
  bins as array axes and scaling over device meshes.
"""

from .__about__ import __version__, __author__
from ._constants import (
    TRANSLATION_TABLES,
    MIN_SINGLE_GENOME,
    IDEAL_SINGLE_GENOME,
    PRODIGAL_VERSION,
)
from .sequence import Sequence, Mask, Masks
from .nodes import Node, Nodes
from .genes import Gene, Genes
from .training import TrainingInfo
from .metagenomic import MetagenomicBin, MetagenomicBins, METAGENOMIC_BINS
from .gene_finder import GeneFinder

__all__ = [
    "GeneFinder",
    "Gene",
    "Genes",
    "Mask",
    "Masks",
    "MetagenomicBin",
    "MetagenomicBins",
    "METAGENOMIC_BINS",
    "Node",
    "Nodes",
    "Sequence",
    "TrainingInfo",
    "TRANSLATION_TABLES",
    "MIN_SINGLE_GENOME",
    "IDEAL_SINGLE_GENOME",
    "PRODIGAL_VERSION",
    "__version__",
]
