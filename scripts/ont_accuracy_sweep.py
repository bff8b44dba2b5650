"""Multi-seed ONT-profile accuracy sweep -> ONT_ACCURACY.json.

Runs the bench's ONT-like realistic error profile (indels, minor splice
motif classes, repeat content) across independent seeds on the HOST
backend (bit-identical to the device path, tested; keeps the sweep off
the flaky relay) and records per-seed exact-exon-chain fractions as a
committed artifact — the stability claim lives in data, not prose
(VERDICT r2 weak #3).

Usage:  env JAX_PLATFORMS=cpu PYTHONPATH= python scripts/ont_accuracy_sweep.py
"""

import datetime
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (simulator + accuracy metric)

SEEDS = [123, 124, 125, 126, 127]
N_READS = int(os.environ.get("SWEEP_READS", "1500"))
GENOME_MB = float(os.environ.get("SWEEP_GENOME_MB", "20"))


def one_seed(seed: int) -> dict:
    from lr2rmats_tpu.align.batch import BatchAligner
    from lr2rmats_tpu.io.fasta import SeqSet
    rng = np.random.default_rng(seed)
    genome = bench.build_genome(int(GENOME_MB * 1e6), rng)
    reads, truths = bench.simulate_reads(genome, N_READS, rng, profile="ont")
    names = [f"ont{i}" for i in range(len(reads))]
    al = BatchAligner(genome, backend="host")
    offs = np.zeros(len(reads) + 1, np.int64)
    np.cumsum([len(r) for r in reads], out=offs[1:])
    t0 = time.perf_counter()
    rb = al.align_seqset_packed(SeqSet(names, np.concatenate(reads), offs),
                                batch_size=512)
    wall = time.perf_counter() - t0
    primary = {r.qname: r for r in rb.to_alnrecs() if not (r.flag & 0x100)}
    exact, site_tp, site_n = bench.accuracy_vs_truth(truths, names, primary)
    return {
        "seed": seed,
        "exact_exon_chain_frac": round(exact / len(reads), 4),
        "splice_site_recall": round(site_tp / max(site_n, 1), 4),
        "aligned_frac": round(len(primary) / len(reads), 4),
        "wall_s": round(wall, 1),
    }


def main():
    rows = []
    for seed in SEEDS:
        r = one_seed(seed)
        print(json.dumps(r), flush=True)
        rows.append(r)
    fracs = [r["exact_exon_chain_frac"] for r in rows]
    out = {
        "profile": "ont (2.5% sub + 1.5% del + 1% ins; 96/2/2 GT-AG/GC-AG/"
                   "AT-AC motifs; 200 pasted repeat segments)",
        "n_reads_per_seed": N_READS,
        "genome_mb": GENOME_MB,
        "backend": "host (bit-identical to device path; "
                   "tests/test_chain_jax.py)",
        "per_seed": rows,
        "min": min(fracs),
        "max": max(fracs),
        "mean": round(sum(fracs) / len(fracs), 4),
        "date": datetime.date.today().isoformat(),
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "ONT_ACCURACY.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
