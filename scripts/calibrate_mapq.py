"""Calibrate MAPQ against simulation truth.

Aligns simulated reads (clean + ONT-like error profiles, repeat content
included) and measures the empirical wrong-placement probability of
primary alignments as a function of the score margin 1 - s2/s1.  Writes
MAPQ_CALIBRATION.json with the per-bin empirical phred scores that
align/mapq.py's piecewise-linear knots are pinned to.

Wrong placement := primary alignment whose reference span does not
overlap the read's true source span on the true chromosome.

Usage: python scripts/calibrate_mapq.py [n_reads_per_profile]
"""

import json
import os
import sys
import importlib.util

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

spec = importlib.util.spec_from_file_location(
    "bench", os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench.py"))
bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench)


def run_profile(profile, n_reads, seed):
    from lr2rmats_tpu.align.batch import BatchAligner
    from lr2rmats_tpu.index.minimizer import MinimizerIndex
    rng = np.random.default_rng(seed)
    genome = bench.build_genome(20_000_000, rng)
    reads, truths = bench.simulate_reads(genome, n_reads, rng,
                                         profile=profile)
    names = [f"r{i}" for i in range(len(reads))]
    idx = MinimizerIndex.build(genome)
    al = BatchAligner(genome, index=idx, backend="jax")
    al.record_margins = True

    class SS:
        n = len(reads)

        def __init__(self):
            self.names = names

        def get(self, i):
            return reads[i]

    rb = al.align_seqset_packed(SS())
    # margin per primary record: need s1, s2 — recompute from NH + AS is
    # lossy; instead re-derive from the mapq-relevant raw margin stored
    # during build.  The aligner does not persist s1/s2, so approximate
    # via a second pass: mapq currently encodes 80*(1-s2/s1) clipped.
    # For calibration we want the raw margin, so patch the batch aligner
    # to record it.
    out = []
    truth_span = {}
    for i, parts in enumerate(truths):
        lo = min(a for a, b in parts)
        hi = max(b for a, b in parts)
        truth_span[names[i]] = (lo, hi)
    margins = getattr(al, "_mapq_margins", None)
    for t in range(rb.n):
        if rb.flag[t] & 0x100:
            continue
        qn = rb.qname[t]
        lo, hi = truth_span[qn]
        # rb.pos is chrom-local == global here (single-chrom genome)
        span_lo = int(rb.pos[t])
        span_hi = span_lo + int(
            ((rb.cig_buf[rb.cig_offs[t]: rb.cig_offs[t + 1]] >> 4) *
             np.isin(rb.cig_buf[rb.cig_offs[t]: rb.cig_offs[t + 1]] & 0xF,
                     (0, 2, 3))).sum())
        correct = (span_lo < hi) and (span_hi > lo)
        out.append((qn, int(rb.mapq[t]), int(rb.nh[t]), correct))
    return out, margins


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    rows = []
    for prof, seed in ((None, 5), ("ont", 6)):
        res, margins = run_profile(prof, n, seed)
        mm = dict(margins or {})
        for qn, mapq, nh, ok in res:
            rows.append({"profile": prof or "clean", "mapq": mapq,
                         "nh": nh, "correct": bool(ok),
                         "margin": mm.get(qn)})
    # bin by margin
    bins = [0.0, 0.01, 0.02, 0.05, 0.10, 0.15, 0.25, 0.40, 0.60, 1.01]
    table = []
    for lo, hi in zip(bins[:-1], bins[1:]):
        sel = [r for r in rows if r["margin"] is not None
               and lo <= r["margin"] < hi and r["nh"] > 1]
        if not sel:
            continue
        err = 1.0 - sum(r["correct"] for r in sel) / len(sel)
        phred = -10 * np.log10(max(err, 1.0 / (len(sel) + 1)))
        table.append({"margin_lo": lo, "margin_hi": hi, "n": len(sel),
                      "err": round(err, 5), "phred": round(float(phred), 1)})
    uniq = [r for r in rows if r["nh"] == 1]
    uerr = 1.0 - sum(r["correct"] for r in uniq) / max(len(uniq), 1)
    out = {
        "n_per_profile": n,
        "unique": {"n": len(uniq), "err": round(uerr, 6),
                   "phred": round(float(-10 * np.log10(
                       max(uerr, 1.0 / (len(uniq) + 1)))), 1)},
        "margin_bins": table,
    }
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "MAPQ_CALIBRATION.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
