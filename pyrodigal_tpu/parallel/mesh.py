"""Device-mesh primitives: contig sharding and psum-merged training stats."""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops import dp_jax

CONTIG_AXIS = "contigs"


def make_mesh(n_devices=None):
    """A 1-D mesh over all (or the first n) devices, axis "contigs"."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (CONTIG_AXIS,))


def sharded_dp(mesh, geometry, per_bin, st_wt, W):
    """Run the scan DP for a batch of (contig, bin) work items sharded over
    the mesh contig axis.

    geometry: dict of (G, n) arrays (ndx, stop_val, typ, strand, win_lo,
    valid), per_bin: dict of (G, n[, 3]) arrays (cs, rscore, uscore,
    star_ptr); G must be divisible by the mesh size.
    """
    ndx, sv, typ, strand, win_lo, valid = (
        geometry["ndx"], geometry["stop_val"], geometry["typ"],
        geometry["strand"], geometry["win_lo"], geometry["valid"],
    )
    cs, rs, us, sp = (
        per_bin["cs"], per_bin["rscore"], per_bin["uscore"],
        per_bin["star_ptr"],
    )

    spec_g = P(CONTIG_AXIS, None)
    spec_sp = P(CONTIG_AXIS, None, None)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(spec_g,) * 6 + (spec_g, spec_g, spec_g, spec_sp, P(CONTIG_AXIS)),
        out_specs=(spec_g, spec_g, spec_g),
        check_vma=False,
    )
    def run(ndx_, sv_, typ_, strand_, winlo_, valid_, cs_, rs_, us_, sp_, wt_):
        fn = jax.vmap(
            lambda a, b, c, d, e, f, g, h, i, j, k: dp_jax.dp_scores.__wrapped__(
                a, b, c, d, e, f, g, h, i, j, k, W
            )
        )
        return fn(ndx_, sv_, typ_, strand_, cs_, rs_, us_, sp_, winlo_,
                  valid_, wt_)[0:3]

    return jax.jit(run)(ndx, sv, typ, strand, win_lo, valid, cs, rs, us,
                        sp, st_wt)
