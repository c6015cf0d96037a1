"""Multi-device scaling for pyrodigal_tpu.

The reference is a single-process shared-memory library (SURVEY.md §2.5);
its parallelism is SIMD + a thread pool over contigs.  The TPU-native
equivalents implemented here:

* contigs are data-parallel sharded over a `jax.sharding.Mesh` axis
  ("contigs"); each device runs the scoring + DP pipeline for its shard;
* training count tables (hexamer background/gene counts, start tallies)
  are pure sums -> merged with `psum` across the mesh;
* trained models / metagenomic bins are replicated.
"""

from .mesh import (
    make_mesh,
    hexamer_background_counts,
    distributed_training_step,
    distributed_training_tallies,
    sharded_dp,
)
from .train import train_distributed, sharded_background_counts

__all__ = [
    "make_mesh",
    "hexamer_background_counts",
    "distributed_training_step",
    "distributed_training_tallies",
    "sharded_dp",
    "train_distributed",
    "sharded_background_counts",
]
