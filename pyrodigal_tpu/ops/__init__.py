"""JAX/XLA/Pallas compute kernels for the TPU path.

The hot pipeline (per-bin node scoring and the O(n·W) dynamic program) is
expressed as batched array programs over struct-of-arrays node tensors:
contigs and metagenomic bins are batch axes, the node index is a `lax.scan`
axis, and the connection window is a vector axis.  Everything here is
differentially tested against the exact C engine in
`pyrodigal_tpu._native`.
"""
