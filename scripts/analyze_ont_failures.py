"""Failure analysis for the ONT bench profile: categorize every read whose
exon chain is not exactly the planted truth (wrong locus / missed junction /
junction slide / extra junction), printing per-read diagnostics."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import bench
from lr2rmats_tpu.align.batch import BatchAligner
from lr2rmats_tpu.io.fasta import SeqSet
from lr2rmats_tpu.transcript.exon_chain import gen_exons


def main():
    n_reads = int(os.environ.get("BENCH_READS", "6000"))
    rng = np.random.default_rng(bench.SEED)
    genome = bench.build_genome(int(bench.GENOME_MB * 1e6), rng)
    reads, truths = bench.simulate_reads(genome, n_reads, rng, profile="ont")
    names = [f"read{i}" for i in range(len(reads))]
    aligner = BatchAligner(genome)
    offs = np.zeros(len(reads) + 1, np.int64)
    np.cumsum([len(r) for r in reads], out=offs[1:])
    seqset = SeqSet(names, np.concatenate(reads), offs)
    rb = aligner.align_seqset_packed(seqset, batch_size=512)
    primary = {r.qname: r for r in rb.to_alnrecs() if not (r.flag & 0x100)}

    cats = {}
    for i, parts in enumerate(truths):
        true_sites = []
        for (a1, b1), (a2, b2) in zip(parts[:-1], parts[1:]):
            true_sites += [b1, a2 + 1]
        r = primary.get(names[i])
        if r is None:
            cats.setdefault("unaligned", []).append((i, None))
            continue
        es, ee, _ = gen_exons(r, 3, 3, 50)
        got = []
        for j in range(len(es) - 1):
            got += [int(ee[j]), int(es[j + 1])]
        if got == true_sites:
            continue
        # categorize
        t0, t1 = parts[0][0], parts[-1][1]
        if not (es[0] < t1 + 10000 and ee[-1] > t0 - 10000):
            cat = "wrong_locus"
        elif len(got) < len(true_sites):
            cat = "missed_junction"
        elif len(got) > len(true_sites):
            cat = "extra_junction"
        else:
            deltas = [g - t for g, t in zip(got, true_sites)]
            mx = max(abs(d) for d in deltas)
            cat = f"slide_le2" if mx <= 2 else ("slide_le10" if mx <= 10
                                                else "slide_gt10")
        cats.setdefault(cat, []).append((i, (true_sites, got)))

    total_bad = sum(len(v) for v in cats.values())
    print(f"reads={n_reads} inexact={total_bad} "
          f"({1 - total_bad / n_reads:.4f} exact)")
    for cat, items in sorted(cats.items(), key=lambda kv: -len(kv[0])):
        print(f"  {cat}: {len(items)}")
    # detail for up to 8 per category
    for cat, items in cats.items():
        print(f"--- {cat} ---")
        for i, tg in items[:8]:
            if tg is None:
                print(f"  read{i}: unaligned")
                continue
            t, g = tg
            print(f"  read{i} nexon_t={len(t)//2+1}")
            if len(t) == len(g):
                print(f"    deltas {[gg - tt for gg, tt in zip(g, t)]}")
            else:
                print(f"    true {t}")
                print(f"    got  {g}")


if __name__ == "__main__":
    main()
