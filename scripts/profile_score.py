"""Per-stage on-chip profile of the mega scoring pipeline (score_device).

Isolates: m6 derivation, window gathers, SD lut15, _rbs_winner, hexamer
lookups + cumsums, seg scans, star sweep, ups counts — on the 2.46 Mbp
genome's geometry with 13 candidate bins.
"""
import os, sys, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
import numpy as np, jax, jax.numpy as jnp
from pyrodigal_tpu.fasta import parse
from pyrodigal_tpu.metagenomic import METAGENOMIC_BINS
from pyrodigal_tpu.sequence import Sequence
from pyrodigal_tpu.ops.meta_tpu import TpuMetaRunner
from pyrodigal_tpu.ops import score_device as sd

DATA = "/root/reference/src/pyrodigal/tests/data"
text = "".join(r.seq for r in parse(
    os.path.join(DATA, "GCF_001457455.1_NCTC11397_genomic.fna.gz")))
seq = Sequence(text)
runner = TpuMetaRunner(METAGENOMIC_BINS)
cand, geoms, nbt, route = runner._prepare_contig(seq)
g = geoms[11]
NT = next(b for b in runner.MEGA_NT if b >= g["nn"])
SB = next(b for b in runner.MEGA_SB if b >= g["slen"])
BT = 16
packed = sd.pack_geometries([g], 1, NT, SB)
bin_idx = np.zeros(BT, np.int32)
for k, b in enumerate(cand):
    bin_idx[k] = b
geo = {k: jnp.asarray(v) for k, v in packed.items()}
bi = jnp.asarray(bin_idx)
gi = jnp.asarray(np.zeros(BT, np.int32))
tab = runner.tables.as_tuple()
(gene_dc, rbs_wt, ups_comp, type_wt, mot_wt, st_wt_t, no_mot_t,
 uses_sd_t, log_ns_t, lfmin_t, lfmax_t, sd_ex, sd_mm, sd_wi) = tab


def t(label, fn, n=3):
    r = fn()
    np.asarray(jax.tree_util.tree_leaves(r)[0])
    t0 = time.time()
    for _ in range(n):
        r = fn()
        np.asarray(jax.tree_util.tree_leaves(r)[0])
    print(f"{label:34s} {(time.time()-t0)/n*1e3:9.1f} ms", flush=True)
    return r


@jax.jit
def f_m6(geo):
    return sd._derive_m6(geo)

m6f, m6r = t("derive_m6", lambda: f_m6(geo))


@functools.partial(jax.jit, static_argnames=("has_nonsd",))
def f_cands(geo, m6f, m6r, sd_ex, sd_mm, has_nonsd):
    return sd._derive_candidates(geo, m6f, m6r, sd_ex, sd_mm, has_nonsd)

cands = t("derive_candidates (windows)",
          lambda: f_cands(geo, m6f, m6r, sd_ex, sd_mm, True))
_g_code, _g_ok, g_ups_flat, g_uok, g_mot = [
    jnp.asarray(np.asarray(x)) if x is not None else None for x in cands]




@jax.jit
def f_dc(geo, gene_dc, bi, gi):
    n32 = jnp.take(geo["n32"], gi, axis=1)
    ndx, stop_val, win_lo = (n32[k] for k in range(3))
    m6f, m6r = sd._derive_m6(geo)
    dcrow = gene_dc[bi]
    m6 = jnp.stack([m6f, m6r])
    m6 = jnp.take(m6, gi, axis=1)
    dcf = sd._lookup64(dcrow, m6[0])
    dcr = sd._lookup64(dcrow, m6[1])
    S = dcf.shape[1]
    S3 = S // 3
    Cf = jnp.cumsum(dcf.reshape(BT, S3, 3), axis=1).reshape(BT, S)
    Cr = jnp.cumsum(dcr.reshape(BT, S3, 3), axis=1).reshape(BT, S)
    return Cf[:, -1] + Cr[:, -1]

t("hexamer lookups + cumsums", lambda: f_dc(geo, gene_dc, bi, gi))


@jax.jit
def f_star(geo, bi, gi):
    # replicate just the star sweep's shape of work
    n32 = jnp.take(geo["n32"], gi, axis=1)
    ndx = n32[0]
    acc = jnp.zeros_like(ndx, jnp.float32)

    def body(d, acc):
        sh = jnp.roll(ndx, d - 32, axis=1).astype(jnp.float32)
        return acc + sh

    return jax.lax.fori_loop(0, 64, body, acc)

t("star-sweep-like 64 rolls", lambda: f_star(geo, bi, gi))


@jax.jit
def f_ups(g_ups_flat, g_uok, ups_comp, bi, gi):
    G = g_ups_flat.shape[0]
    NBINS = ups_comp.shape[0]
    n = g_ups_flat.shape[1]

    def ups_body(k, counts):
        code = jax.lax.dynamic_index_in_dim(g_ups_flat, k, axis=2,
                                            keepdims=False)
        okk = jax.lax.dynamic_index_in_dim(g_uok, k, axis=2, keepdims=True)
        oh = jax.nn.one_hot(code, 128, dtype=jnp.float32)
        return counts + jnp.where(okk, oh, 0.0)

    counts = jax.lax.fori_loop(
        0, 32, ups_body, jnp.zeros(g_ups_flat.shape[:2] + (128,),
                                   jnp.float32))
    u_all = jnp.einsum("gnc,Bc->gBn", counts, ups_comp,
                       precision=jax.lax.Precision.HIGHEST)
    return u_all

t("ups one-hot counts + einsum", lambda: f_ups(g_ups_flat, g_uok,
                                               ups_comp, bi, gi))
