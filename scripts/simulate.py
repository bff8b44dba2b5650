"""Synthetic dataset generator for scale runs (BASELINE.json configs 2-3
analog: no real yeast/human data is available in this environment, so scale
is exercised with simulated genomes/transcriptomes of equivalent size).

Generates: genome.fa, anno.gtf (multi-gene, multi-isoform), long reads
(from annotated + novel isoforms, with errors), paired short reads (from the
same transcript pool).

Usage:
  python scripts/simulate.py --out DIR --genome-mb 12 --genes 200 \
      --long-reads 20000 --short-pairs 50000
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lr2rmats_tpu.io.fasta import decode_seq, revcomp  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--genome-mb", type=float, default=12.0)
    ap.add_argument("--genes", type=int, default=200)
    ap.add_argument("--long-reads", type=int, default=20000)
    ap.add_argument("--short-pairs", type=int, default=50000)
    ap.add_argument("--long-err", type=float, default=0.03)
    ap.add_argument("--short-err", type=float, default=0.005)
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    os.makedirs(args.out, exist_ok=True)
    n = int(args.genome_mb * 1e6)
    codes = rng.integers(0, 4, n).astype(np.uint8)

    genes = []
    pos = 50_000
    stride = (n - 100_000) // args.genes
    for gi in range(args.genes):
        gstart = pos + int(rng.integers(0, stride // 4))
        n_ex = int(rng.integers(3, 9))
        exons = []
        e = gstart
        for xi in range(n_ex):
            elen = int(rng.integers(120, 500))
            exons.append((e, e + elen))
            e += elen
            if xi < n_ex - 1:
                # plant GT..AG
                codes[e] = 2
                codes[e + 1] = 3
                ilen = int(rng.integers(100, 4000))
                e += ilen
                codes[e - 2] = 0
                codes[e - 1] = 2
        strand = "+" if rng.random() < 0.5 else "-"
        # isoforms: full + exon-skips; one NOVEL isoform with a shifted donor
        isoforms = [("T%d.1" % gi, exons, True)]
        if n_ex >= 4:
            skip = list(range(n_ex))
            skip.remove(int(rng.integers(1, n_ex - 1)))
            isoforms.append(("T%d.2" % gi, [exons[i] for i in skip], True))
        # novel: shift an internal donor 40bp left (novel splice site)
        if n_ex >= 3:
            nov = list(exons)
            a, b = nov[1]
            if b - a > 160:
                nov[1] = (a, b - 40)
                codes[b - 40] = 2
                codes[b - 39] = 3
                isoforms.append(("T%d.novel" % gi, nov, False))
        genes.append((f"G{gi}", strand, exons, isoforms))
        pos += stride

    with open(os.path.join(args.out, "genome.fa"), "w") as f:
        f.write(">chrSim\n")
        seq = decode_seq(codes)
        for i in range(0, len(seq), 60):
            f.write(seq[i: i + 60] + "\n")

    with open(os.path.join(args.out, "anno.gtf"), "w") as f:
        for gid, strand, exons, isoforms in genes:
            for tid, iex, annotated in isoforms:
                if not annotated:
                    continue
                attrs = (f'gene_id "{gid}"; transcript_id "{tid}"; '
                         f'gene_name "{gid}N"; transcript_name "{tid}N";')
                f.write(f"chrSim\tsim\ttranscript\t{iex[0][0]+1}\t{iex[-1][1]}"
                        f"\t.\t{strand}\t.\t{attrs}\n")
                for a, b in iex:
                    f.write(f"chrSim\tsim\texon\t{a+1}\t{b}\t.\t{strand}\t.\t{attrs}\n")

    # transcript pool (annotated + novel) for read simulation
    pool = []
    for gid, strand, exons, isoforms in genes:
        for tid, iex, annotated in isoforms:
            tx = np.concatenate([codes[a:b] for a, b in iex])
            pool.append((tid, tx, strand))

    def mutate(read, err):
        m = rng.random(len(read)) < err
        read = read.copy()
        read[m] = (read[m] + rng.integers(1, 4, int(m.sum()))) % 4
        return read

    with open(os.path.join(args.out, "long.fa"), "w") as f:
        for i in range(args.long_reads):
            tid, tx, strand = pool[int(rng.integers(0, len(pool)))]
            read = mutate(tx, args.long_err)
            if strand == "-" or rng.random() < 0.5:
                read = revcomp(read)
            f.write(f">lr{i}_{tid}\n{decode_seq(read)}\n")

    with open(os.path.join(args.out, "short_1.fa"), "w") as f1, \
            open(os.path.join(args.out, "short_2.fa"), "w") as f2:
        for i in range(args.short_pairs):
            tid, tx, strand = pool[int(rng.integers(0, len(pool)))]
            if len(tx) < 260:
                continue
            frag = int(rng.integers(220, min(400, len(tx))))
            off = int(rng.integers(0, len(tx) - frag + 1))
            r1 = mutate(tx[off: off + 101], args.short_err)
            r2 = revcomp(mutate(tx[off + frag - 101: off + frag], args.short_err))
            f1.write(f">p{i}/1\n{decode_seq(r1)}\n")
            f2.write(f">p{i}/2\n{decode_seq(r2)}\n")

    print(f"wrote dataset to {args.out}: genome {args.genome_mb}Mb, "
          f"{args.genes} genes, {len(pool)} transcripts, "
          f"{args.long_reads} long reads, {args.short_pairs} short pairs")


if __name__ == "__main__":
    main()
