"""Device sjcount backend: exact agreement with the host path.

The verify + count stages of the STAR SJ.out.tab role (reference
Snakefile:116-140) run on the accelerator (junctions/sjcount_device.py);
all comparisons are integer so agreement must be exact.  Tests run on the
CPU jax platform (conftest).
"""

import numpy as np

from lr2rmats_tpu.io.fasta import Genome, SeqSet, revcomp
from lr2rmats_tpu.junctions.sjcount import JunctionCounter


def mk_genome(n=60_000, seed=11):
    rng = np.random.default_rng(seed)
    codes = rng.integers(0, 4, n).astype(np.uint8)
    return Genome(["chrT"], codes, np.array([0, n], np.int64))


def mk_reads(arrs):
    offs = np.zeros(len(arrs) + 1, np.int64)
    np.cumsum([len(a) for a in arrs], out=offs[1:])
    return SeqSet([f"r{i}" for i in range(len(arrs))],
                  np.concatenate(arrs), offs)


def test_verifier_matches_numpy():
    rng = np.random.default_rng(2)
    buf = rng.integers(0, 4, 5000).astype(np.uint8)
    segs = [rng.integers(0, 4, int(rng.integers(30, 300))).astype(np.uint8)
            for _ in range(17)]
    comb = np.concatenate(segs)
    comb_off = np.zeros(len(segs) + 1, np.int64)
    np.cumsum([len(s) for s in segs], out=comb_off[1:])
    C = 300
    rid = rng.integers(0, len(segs), C).astype(np.int32)
    lens = np.diff(comb_off)
    pos = np.array([rng.integers(0, 5000 - lens[r]) for r in rid], np.int64)
    from lr2rmats_tpu.junctions.sjcount_device import make_verifier
    v = make_verifier(buf)
    mm = v.verify(comb, comb_off, rid, pos)
    for i in range(C):
        seg = comb[comb_off[rid[i]]: comb_off[rid[i] + 1]]
        ref = int(np.sum(buf[pos[i]: pos[i] + len(seg)] != seg))
        assert mm[i] == ref, i


def test_verifier_chunking():
    """Chunked calls must agree with one-shot (force a tiny chunk)."""
    rng = np.random.default_rng(4)
    buf = rng.integers(0, 4, 3000).astype(np.uint8)
    segs = [rng.integers(0, 4, 64).astype(np.uint8) for _ in range(9)]
    comb = np.concatenate(segs)
    comb_off = np.arange(10, dtype=np.int64) * 64
    rid = rng.integers(0, 9, 100).astype(np.int32)
    pos = rng.integers(0, 3000 - 64, 100).astype(np.int64)
    from lr2rmats_tpu.junctions.sjcount_device import make_verifier
    v1 = make_verifier(buf)
    big = v1.verify(comb, comb_off, rid, pos)
    v2 = make_verifier(buf)
    v2.CHUNK = 16
    np.testing.assert_array_equal(big, v2.verify(comb, comb_off, rid, pos))


def _synthetic_workload(seed=3):
    rng = np.random.default_rng(seed)
    g = mk_genome(80_000, seed=8)
    tid = np.array([0, 0], np.int32)
    don = np.array([2001, 30001], np.int32)
    acc = np.array([5000, 44000], np.int32)
    anno = np.array([1, 0], np.int32)
    reads = []
    for i in range(200):
        j = int(rng.integers(0, 2))
        d, a = int(don[j]), int(acc[j])
        left = int(rng.integers(4, 90))
        seg = np.concatenate([g.codes[d - 1 - left: d - 1],
                              g.codes[a: a + (101 - left)]])
        seg = seg.copy()
        nm = int(rng.integers(0, 3))
        for _ in range(nm):
            p = int(rng.integers(0, len(seg)))
            seg[p] = (seg[p] + 1) % 4
        if rng.random() < 0.5:
            seg = revcomp(seg)
        reads.append(seg)
    for i in range(60):   # contiguous decoys
        p = int(rng.integers(0, 70_000))
        reads.append(g.codes[p: p + 101].copy())
    return g, tid, don, acc, anno, mk_reads(reads)


def test_device_backend_matches_host_single_end():
    g, tid, don, acc, anno, rs = _synthetic_workload()
    host = JunctionCounter(g, tid, don, acc, anno, backend="host")
    host.count_seqset_batched(rs)
    dev = JunctionCounter(g, tid, don, acc, anno, backend="device")
    assert dev.backend == "device" and dev._dev_verifier is not None
    dev.count_seqset_batched(rs)
    a, b = host.result(), dev.result()
    np.testing.assert_array_equal(a.uniq_c, b.uniq_c)
    np.testing.assert_array_equal(a.multi_c, b.multi_c)
    np.testing.assert_array_equal(a.max_over, b.max_over)
    assert a.uniq_c.sum() + a.multi_c.sum() > 50  # workload not degenerate


def test_device_backend_matches_host_paired():
    g, tid, don, acc, anno, rs = _synthetic_workload(seed=9)
    # mates: first half forward, second half rc'd partner windows
    rng = np.random.default_rng(10)
    m1, m2 = [], []
    for i in range(100):
        d, a = 2001, 5000
        left = int(rng.integers(10, 80))
        seg = np.concatenate([g.codes[d - 1 - left: d - 1],
                              g.codes[a: a + (101 - left)]])
        m1.append(seg.copy())
        p = a + int(rng.integers(120, 220))
        m2.append(revcomp(g.codes[p: p + 101]).copy())
    r1, r2 = mk_reads(m1), mk_reads(m2)
    host = JunctionCounter(g, tid, don, acc, anno, backend="host")
    host.count_pairs_batched(r1, r2)
    dev = JunctionCounter(g, tid, don, acc, anno, backend="device")
    dev.count_pairs_batched(r1, r2)
    a, b = host.result(), dev.result()
    np.testing.assert_array_equal(a.uniq_c, b.uniq_c)
    np.testing.assert_array_equal(a.multi_c, b.multi_c)
    np.testing.assert_array_equal(a.max_over, b.max_over)
    assert a.uniq_c.sum() > 0
