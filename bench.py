"""Benchmark driver: meta-mode gene-calling throughput per chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mbp/s", "vs_baseline": N, ...}

Workload: a bacterial genome chopped into 80 kb contigs, called in
metagenomic mode (the ~13-bin GC-window sweep per contig) — the
BASELINE.json driver configuration "meta mode over metagenomic contigs on
one chip".  The baseline is the reference's best published CPU throughput
(2.149 Mbp/s, single mode, 1 core — see BASELINE.md; reference meta mode
is strictly slower per bp, so this is a conservative denominator).

The product path (`GeneFinder.find_genes_batch` with backend detection)
batches (contig, bin) work items into fixed-shape launches of the fused
on-device scoring + Pallas DP pipeline; only the digit sequences and core
node fields cross the host-device link.  A persistent compilation cache
makes the kernel compile a one-time cost.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          ".jax_cache")


def _enable_compilation_cache():
    """Persistent compilation cache (the env-var binding is absent in this
    jax build, so configure programmatically)."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

BASELINE_MBPS = 2.149  # reference pyrodigal, sse backend, 1 CPU core

DATA_DIRS = [
    "/root/reference/src/pyrodigal/tests/data",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests", "data"),
]


def data(name):
    for d in DATA_DIRS:
        p = os.path.join(d, name)
        if os.path.exists(p):
            return p
    raise FileNotFoundError(name)


def main():
    from pyrodigal_tpu.fasta import parse
    from pyrodigal_tpu import GeneFinder

    import jax
    _enable_compilation_cache()
    platform = jax.devices()[0].platform

    # workload: GCF genome chopped into 40kb contigs
    records = list(parse(data("GCF_001457455.1_NCTC11397_genomic.fna.gz")))
    genome = "".join(r.seq for r in records)
    CHUNK = 40_000
    contigs = [genome[i:i + CHUNK] for i in range(0, len(genome), CHUNK)]
    contigs = [c for c in contigs if len(c) >= 20_000]

    finder = GeneFinder(meta=True)

    # warmup (compile)
    t0 = time.time()
    warm = finder.find_genes_batch(contigs[:2])
    warmup_s = time.time() - t0
    n_warm_genes = sum(len(g) for g in warm)

    # timed run
    work = contigs[2:]
    total_bp = sum(len(c) for c in work)
    t0 = time.time()
    results = finder.find_genes_batch(work)
    elapsed = time.time() - t0
    n_genes = sum(len(g) for g in results)

    mbps = total_bp / elapsed / 1e6
    out = {
        "metric": "gene-calling throughput, meta mode, per chip",
        "value": round(mbps, 4),
        "unit": "Mbp/s",
        "vs_baseline": round(mbps / BASELINE_MBPS, 4),
        "platform": platform,
        "contigs": len(work),
        "total_bp": total_bp,
        "genes": n_genes,
        "elapsed_s": round(elapsed, 2),
        "warmup_s": round(warmup_s, 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
