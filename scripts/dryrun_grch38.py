"""GRCh38-scale dry run (BASELINE config 4; VERDICT r1 #6).

Builds the native minimizer index over a synthetic 3.1 Gbp / 24-chromosome
genome, aligns 50k simulated multi-exon long reads through the batched
engine (int64 global coordinates, cluster-relative int32 device tensors),
and records wall times + peak RSS.  CPU-only by design — the goal is the
memory/scale envelope, not chip throughput.

    env JAX_PLATFORMS=cpu PYTHONPATH= python scripts/dryrun_grch38.py
"""

import json
import os
import resource
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rss_gb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def main():
    n_chrom = int(os.environ.get("DRYRUN_CHROMS", "24"))
    chrom_mb = float(os.environ.get("DRYRUN_CHROM_MB", "129"))
    n_reads = int(os.environ.get("DRYRUN_READS", "50000"))
    from lr2rmats_tpu.io.fasta import Genome
    from lr2rmats_tpu.index.minimizer import MinimizerIndex
    from lr2rmats_tpu.align.batch import BatchAligner
    import bench

    rng = np.random.default_rng(7)
    t0 = time.perf_counter()
    per = int(chrom_mb * 1e6)
    total = n_chrom * per
    codes = rng.integers(0, 4, total, dtype=np.int64).astype(np.uint8)
    offsets = np.arange(n_chrom + 1, dtype=np.int64) * per
    genome = Genome([f"chr{i+1}" for i in range(n_chrom)], codes, offsets)
    t_genome = time.perf_counter() - t0
    print(f"# genome {total/1e9:.2f} Gbp built {t_genome:.0f}s "
          f"rss={rss_gb():.1f}G", file=sys.stderr, flush=True)

    t0 = time.perf_counter()
    reads, truths = bench.simulate_reads(genome, n_reads, rng)
    # drop reads whose gene crosses a chromosome boundary (the simulator
    # plants on the flat buffer)
    keep = []
    for i, parts in enumerate(truths):
        lo, hi = parts[0][0], parts[-1][1]
        t0i = np.searchsorted(offsets, lo, side="right") - 1
        if hi <= offsets[t0i + 1]:
            keep.append(i)
    reads = [reads[i] for i in keep]
    truths = [truths[i] for i in keep]
    names = [f"read{i}" for i in range(len(reads))]
    t_sim = time.perf_counter() - t0
    print(f"# {len(reads)} reads simulated {t_sim:.0f}s", file=sys.stderr,
          flush=True)

    t0 = time.perf_counter()
    idx = MinimizerIndex.build(genome)
    t_index = time.perf_counter() - t0
    idx_gb = (idx.hashes.nbytes + idx.pos.nbytes + idx.strand.nbytes) / 1e9
    print(f"# index built {t_index:.0f}s, {len(idx.hashes)/1e6:.0f}M "
          f"minimizers ({idx_gb:.1f} GB), rss={rss_gb():.1f}G",
          file=sys.stderr, flush=True)

    aligner = BatchAligner(genome, index=idx)
    t0 = time.perf_counter()
    from lr2rmats_tpu.io.fasta import SeqSet
    offs = np.zeros(len(reads) + 1, np.int64)
    np.cumsum([len(r) for r in reads], out=offs[1:])
    seqset = SeqSet(names, np.concatenate(reads), offs)
    n_aligned = 0
    primary = {}
    for r in aligner.align_seqset(seqset, batch_size=1536):
        if not (r.flag & 0x100):
            n_aligned += 1
            primary[r.qname] = r
    t_align = time.perf_counter() - t0
    print(f"# aligned {n_aligned}/{len(reads)} in {t_align:.0f}s "
          f"rss={rss_gb():.1f}G", file=sys.stderr, flush=True)

    from lr2rmats_tpu.transcript.exon_chain import gen_exons
    exact = 0
    for i, parts in enumerate(truths):
        ts = []
        for (a1, b1), (a2, b2) in zip(parts[:-1], parts[1:]):
            ts += [b1, a2 + 1]
        # truth sites are flat-buffer coords; records are per-chrom —
        # convert via the read's chromosome
        r = primary.get(names[i])
        if r is None:
            continue
        base = int(offsets[r.tid])
        es, ee, _ = gen_exons(r, 3, 3, 50)
        got = []
        for j in range(len(es) - 1):
            got += [base + int(ee[j]), base + int(es[j + 1])]
        if got == ts:
            exact += 1

    out = {
        "metric": "grch38_dryrun",
        "genome_gbp": round(total / 1e9, 2),
        "n_chrom": n_chrom,
        "minimizers_m": round(len(idx.hashes) / 1e6, 1),
        "index_gb": round(idx_gb, 2),
        "index_build_s": round(t_index, 1),
        "n_reads": len(reads),
        "align_wall_s": round(t_align, 1),
        "reads_per_s": round(len(reads) / t_align, 1),
        "aligned_frac": round(n_aligned / len(reads), 4),
        "exact_exon_chain_frac": round(exact / len(reads), 4),
        "peak_rss_gb": round(rss_gb(), 1),
        "platform": os.environ.get("JAX_PLATFORMS", "default"),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
