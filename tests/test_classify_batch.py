"""Native batched classification sweep (csrc classify_batch_c) agreement
with the per-read python path, covering known / novel / unrecognized /
split paths (VERDICT r1 #7)."""

import numpy as np

import lr2rmats_tpu.native.lib as nl
from lr2rmats_tpu.io.sj import SJTable
from lr2rmats_tpu.transcript.classify import check_trans
from lr2rmats_tpu.transcript.model import Transcripts, UpdateGtfParams


def _build(seed=11, n_gene=60, reads_per=20):
    rng = np.random.default_rng(seed)
    anno = Transcripts()
    genes = []
    pos = 10_000
    for g in range(n_gene):
        exons = []
        p = pos
        for e in range(4):
            el = int(rng.integers(150, 400))
            exons.append((p, p + el - 1))
            p += el + int(rng.integers(500, 3000))
        genes.append(exons)
        s = np.array([x[0] for x in exons], np.int64)
        e = np.array([x[1] for x in exons], np.int64)
        anno.append(tid=0, is_rev=bool(g % 2), exon_start=s, exon_end=e,
                    gene_id=f"G{g}", gene_name=f"N{g}", trans_id=f"G{g}.1")
        pos = p + 20_000
    tids, revs, es, ee, offs, names = [], [], [], [], [0], []
    for i in range(n_gene * reads_per):
        g = int(rng.integers(0, n_gene))
        ex = [list(x) for x in genes[g]]
        r = rng.random()
        if r < 0.4:
            pass                              # known isoform
        elif r < 0.6:
            ex[1][0] += 7                     # novel acceptor site
        elif r < 0.8:
            ex[1][0] += 7
            ex[2][1] -= 9                     # two novel junctions
        else:
            ex = [[c[0] + 100_000_000, c[1] + 100_000_000] for c in ex[:2]]
            # far away: overlaps nothing -> full at level 3, unrecognized
        s = [c[0] for c in ex]
        e = [c[1] for c in ex]
        es += s
        ee += e
        offs.append(offs[-1] + len(s))
        tids.append(0)
        revs.append(0)
        names.append(f"r{i}")
    bam = Transcripts()
    bam.append_batch(np.array(tids, np.int32), np.array(revs, np.uint8),
                     np.array(es, np.int64), np.array(ee, np.int64),
                     np.array(offs, np.int64), names)
    order = np.lexsort((bam.end[:bam.n], bam.start[:bam.n], bam.tid[:bam.n]))
    b2 = Transcripts()
    b2.append_many(bam, order)
    return b2, anno


def _run(bam, anno, sj, ugp):
    b = Transcripts()
    b.append_many(bam, np.arange(bam.n))
    upd, kn, nv, un = (Transcripts() for _ in range(4))
    check_trans(b, anno, sj, ugp, upd, kn, nv, un)
    return b, upd, kn, nv, un


def test_native_sweep_matches_python():
    if nl.get_lib() is None:
        import pytest
        pytest.skip("native lib unavailable")
    bam, anno = _build()
    # a small SJ table supporting only SOME junctions forces both the
    # supported-novel and the split paths
    sj = SJTable(tid=np.zeros(0, np.int32), don=np.zeros(0, np.int32),
                 acc=np.zeros(0, np.int32), strand=np.zeros(0, np.int8),
                 motif=np.zeros(0, np.int8), is_anno=np.zeros(0, np.int8),
                 uniq_c=np.zeros(0, np.int32), multi_c=np.zeros(0, np.int32),
                 max_over=np.zeros(0, np.int32))
    ugp = UpdateGtfParams(full_level=3, split_trans=True)
    native = _run(bam, anno, sj, ugp)
    nl._lib, nl._tried = None, True
    try:
        fallback = _run(bam, anno, sj, ugp)
    finally:
        nl._tried = False
    bn, bf = native[0], fallback[0]
    for k in bn.flags:
        assert np.array_equal(bn.flags[k][:bn.n], bf.flags[k][:bf.n]), k
    assert bn.gene_id == bf.gene_id
    assert np.array_equal(bn.is_rev[:bn.n], bf.is_rev[:bf.n])
    assert np.array_equal(bn.novel_site_flag[:bn.n],
                          bf.novel_site_flag[:bf.n])
    assert np.array_equal(bn.novel_junction_flag[:bn.n],
                          bf.novel_junction_flag[:bf.n])
    for a, b in zip(native[1:], fallback[1:]):
        assert a.n == b.n
        assert np.array_equal(a.exon_start[:a.n], b.exon_start[:b.n])
        assert a.gene_id == b.gene_id
    # the mix actually exercised every class
    kn, nv, un = native[2], native[3], native[4]
    assert kn.n > 0 and nv.n > 0 and un.n > 0


def test_sj_check_batch_matches_python():
    """Randomized agreement of the batched SJ sweep (sj_check_batch_c) +
    native split ranges with the scalar python path: a non-empty SJ table
    supporting a random ~60% of novel junctions drives supported /
    unreliable-flagged / window-miss / split interleavings through both
    paths; outputs and mutated flags must match exactly."""
    if nl.get_lib() is None:
        import pytest
        pytest.skip("native lib unavailable")
    bam, anno = _build(seed=23)
    rng = np.random.default_rng(5)
    # SJ table: for every bam junction flip a coin; supported junctions get
    # uniq_c in {1, 3}, some rows are multi-only (use_multi gate)
    rows = []
    for bi in range(bam.n):
        en = int(bam.exon_n[bi])
        bs, be = bam.exons(bi)
        for j in range(en - 1):
            r = rng.random()
            if r < 0.55:
                rows.append((0, int(be[j]) + 1, int(bs[j + 1]) - 1, 3, 0))
            elif r < 0.65:
                rows.append((0, int(be[j]) + 1, int(bs[j + 1]) - 1, 0, 2))
    rows.sort()
    tid, don, acc, u, m = (np.array(c) for c in zip(*rows))
    z = np.zeros(len(rows), np.int8)
    sj = SJTable(tid.astype(np.int32), don.astype(np.int32),
                 acc.astype(np.int32), z, z.copy(), z.copy(),
                 u.astype(np.int32), m.astype(np.int32),
                 np.zeros(len(rows), np.int32))
    for ugp in (UpdateGtfParams(split_trans=True),
                UpdateGtfParams(split_trans=False, use_multi=True),
                UpdateGtfParams(split_trans=True, min_sj_cnt=2)):
        native = _run(bam, anno, sj, ugp)
        nl._lib, nl._tried = None, True
        try:
            fallback = _run(bam, anno, sj, ugp)
        finally:
            nl._tried = False
        bn, bf = native[0], fallback[0]
        assert np.array_equal(
            bn.unreliable_junction_flag[:bn.n],
            bf.unreliable_junction_flag[:bf.n])
        assert np.array_equal(
            bn.flags["has_unreliable_junction"][:bn.n],
            bf.flags["has_unreliable_junction"][:bf.n])
        for a, b in zip(native[1:], fallback[1:]):
            assert a.n == b.n
            assert a.trans_id[:a.n] == b.trans_id[:b.n]
            assert np.array_equal(a.exon_start[:a.n], b.exon_start[:b.n])
            assert np.array_equal(a.exon_end[:a.n], b.exon_end[:b.n])
            assert np.array_equal(a.cov[:a.n], b.cov[:b.n])
        # the table actually produced a mix
        assert native[3].n > 0
