"""MAPQ model tests (align/mapq.py, calibrated in MAPQ_CALIBRATION.json).

MAPQ fills the SAM column-5 role of minimap2 primary alignments
(reference Snakefile:61); the model maps the best/second-best chain
score margin to a phred-scaled wrong-placement probability.
"""

import json
import os

import numpy as np

from lr2rmats_tpu.align.mapq import (MAPQ_UNIQUE, mapq_from_scores,
                                     mapq_from_scores_vec)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_monotone_in_margin():
    qs = [mapq_from_scores(100.0, s2) for s2 in range(100, -1, -5)]
    assert qs == sorted(qs)
    assert qs[0] == 0                      # tie -> Q0
    assert 0 < qs[-1] < MAPQ_UNIQUE       # wide margin stays below unique


def test_scalar_vector_parity():
    rng = np.random.default_rng(0)
    s1 = rng.uniform(10, 200, 64)
    s2 = s1 * rng.uniform(0, 1, 64)
    nh = rng.integers(1, 4, 64).astype(np.int32)
    ranks = rng.integers(0, 2, 64).astype(np.int32)
    vec = mapq_from_scores_vec(s1, s2, nh, ranks)
    for i in range(64):
        if ranks[i] != 0:
            assert vec[i] == 0            # secondary records always Q0
        elif nh[i] == 1:
            assert vec[i] == MAPQ_UNIQUE
        else:
            assert vec[i] == mapq_from_scores(float(s1[i]), float(s2[i]))


def test_knots_do_not_overclaim_calibration():
    """Each knot's Q must not exceed the empirical phred lower bound of
    the calibration bin it falls in (conservativeness invariant)."""
    path = os.path.join(ROOT, "MAPQ_CALIBRATION.json")
    if not os.path.exists(path):
        return
    with open(path) as f:
        cal = json.load(f)
    for b in cal["margin_bins"]:
        mid = 0.5 * (b["margin_lo"] + min(b["margin_hi"], 1.0))
        q = mapq_from_scores(1.0, 1.0 - mid)
        if b["n"] >= 5:                    # skip unpopulated bins
            assert q <= max(b["phred"], 0) + 1e-9, (b, q)


def test_batch_aligner_emits_calibrated_mapq():
    """A read from a duplicated segment must get a low MAPQ; a unique
    read gets MAPQ_UNIQUE."""
    from lr2rmats_tpu.align.batch import BatchAligner
    from lr2rmats_tpu.io.fasta import Genome
    rng = np.random.default_rng(7)
    codes = rng.integers(0, 4, 200_000).astype(np.uint8)
    codes[120_000:122_000] = codes[40_000:42_000]   # exact repeat copy
    g = Genome(["c"], codes, np.array([0, len(codes)], np.int64))
    al = BatchAligner(g)
    reads = [codes[40_500:41_500].copy(),          # repeat-ambiguous
             codes[80_000:81_000].copy()]          # unique
    recs = al.align_batch(["amb", "unq"], reads)
    prim = {r.qname: r for r in recs if not (r.flag & 0x100)}
    assert prim["unq"].mapq >= prim["amb"].mapq
    assert prim["amb"].mapq <= 3                   # exact tie -> ~Q0
