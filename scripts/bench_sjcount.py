"""Short-read junction-counter scale bench (chr21-class, VERDICT r1 #4).

Simulates a chr21-sized (~46.7 Mbp) genome with planted spliced genes,
generates paired-end short reads from the transcripts, and measures the
batched paired counter's throughput plus junction recall.

    python scripts/bench_sjcount.py [--reads 2000000] [--genome-mb 46.7]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=2_000_000,
                    help="number of read PAIRS")
    ap.add_argument("--genome-mb", type=float, default=46.7)
    ap.add_argument("--genes", type=int, default=1000)
    ap.add_argument("--read-len", type=int, default=100)
    ap.add_argument("--batch", type=int, default=200_000)
    ap.add_argument("--backend", choices=("host", "device"), default="host",
                    help="device = Hamming verify + count scatter-add on "
                         "the accelerator (junctions/sjcount_device.py)")
    args = ap.parse_args()

    from lr2rmats_tpu.io.fasta import Genome, SeqSet, revcomp
    from lr2rmats_tpu.junctions.sjcount import (JunctionCounter,
                                                SJCountParams)

    rng = np.random.default_rng(42)
    n = int(args.genome_mb * 1e6)
    t0 = time.perf_counter()
    codes = rng.integers(0, 4, n).astype(np.uint8)
    genome = Genome(["chr21"], codes, np.array([0, n], np.int64))
    # plant spliced genes: 3 exons, canonical introns
    jt, jd, ja = [], [], []
    tx = []
    gap = n // (args.genes + 2)
    for g in range(args.genes):
        pos = 10_000 + g * gap
        exons = []
        for e in range(3):
            elen = int(rng.integers(150, 400))
            exons.append((pos, pos + elen))
            pos += elen
            if e < 2:
                genome.codes[pos], genome.codes[pos + 1] = 2, 3
                don = pos
                pos += int(rng.integers(300, 5000))
                genome.codes[pos - 2], genome.codes[pos - 1] = 0, 2
                jt.append(0)
                jd.append(don + 1)          # 1-based intron first base
                ja.append(pos)              # 1-based intron last base
        tx.append(np.concatenate([genome.codes[a:b] for a, b in exons]))
    jt = np.asarray(jt, np.int32)
    jd = np.asarray(jd, np.int32)
    ja = np.asarray(ja, np.int32)
    print(f"# genome {args.genome_mb} Mb, {len(jt)} junctions, "
          f"setup {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    jc = JunctionCounter(genome, jt, jd, ja, np.ones(len(jt), np.int32),
                         SJCountParams(), backend=args.backend)
    print(f"# counter init {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    # simulate paired reads: fragment 250-450bp from a transcript,
    # mate1 = fragment start (fwd), mate2 = rc of fragment end
    R = args.reads
    L = args.read_len
    t_gen = 0.0
    t_cnt = 0.0
    done = 0
    while done < R:
        b = min(args.batch, R - done)
        t1 = time.perf_counter()
        r1 = np.empty((b, L), np.uint8)
        r2 = np.empty((b, L), np.uint8)
        ti = rng.integers(0, len(tx), b)
        for i in range(b):
            t = tx[ti[i]]
            flen = int(rng.integers(2 * L + 20, min(450, len(t))))
            off = int(rng.integers(0, len(t) - flen + 1))
            frag = t[off: off + flen]
            r1[i] = frag[:L]
            r2[i] = revcomp(frag[-L:])
        err = rng.random((b, L)) < 0.005
        r1[err] = (r1[err] + 1) % 4
        err = rng.random((b, L)) < 0.005
        r2[err] = (r2[err] + 1) % 4
        offs = np.arange(b + 1, dtype=np.int64) * L
        s1 = SeqSet([f"a{i}" for i in range(b)], r1.reshape(-1), offs)
        s2 = SeqSet([f"b{i}" for i in range(b)], r2.reshape(-1), offs)
        t_gen += time.perf_counter() - t1
        t2 = time.perf_counter()
        jc.count_pairs_batched(s1, s2)
        t_cnt += time.perf_counter() - t2
        done += b
        print(f"#   {done}/{R} pairs, count {t_cnt:.1f}s "
              f"({done*2/t_cnt/1e3:.0f}k reads/s)", file=sys.stderr)

    uc, mc = jc.uniq_c, jc.multi_c
    if jc._dev_counts is not None:
        du, dm, _ = jc._dev_counts.fetch()
        uc, mc = uc + du, mc + dm
    supported = int(np.sum(uc + mc > 0))
    import json
    print(json.dumps({
        "metric": "short_reads_counted_per_sec",
        "value": round(2 * R / t_cnt, 1),
        "unit": "reads/s",
        "detail": {
            "pairs": R, "genome_mb": args.genome_mb,
            "backend": jc.backend,
            "count_wall_s": round(t_cnt, 1),
            "junctions": len(jt),
            "junction_recall": round(supported / len(jt), 4),
            "uniq_counts_total": int(uc.sum()),
        }}))


if __name__ == "__main__":
    main()
