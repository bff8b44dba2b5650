"""Native (C++) kernels must agree bit-for-bit with the numpy references."""

import numpy as np
import pytest

from lr2rmats_tpu.native import get_lib, have_native

pytestmark = pytest.mark.skipif(not have_native(),
                                reason="native lib unavailable")


def test_minimizers_match():
    from lr2rmats_tpu.index.minimizer import (extract_minimizers,
                                              extract_minimizers_np)
    rng = np.random.default_rng(3)
    for n, seed in ((500, 0), (5000, 1), (50_000, 2)):
        codes = rng.integers(0, 4, n).astype(np.uint8)
        codes[rng.random(n) < 0.01] = 4  # sprinkle Ns
        h1, p1, s1 = extract_minimizers(codes)
        h2, p2, s2 = extract_minimizers_np(codes)
        np.testing.assert_array_equal(p1, p2)
        np.testing.assert_array_equal(h1, h2)
        np.testing.assert_array_equal(s1, s2)


def test_refine_splice_indel_match():
    from lr2rmats_tpu.align.splice import (refine_splice_indel,
                                           refine_splice_indel_np)
    rng = np.random.default_rng(5)
    ref = rng.integers(0, 4, 20_000).astype(np.uint8)
    for trial in range(30):
        m = int(rng.integers(0, 40))
        left = int(rng.integers(100, 5000))
        right = left + m + int(rng.integers(40, 8000))
        # make the gap flanks partially match the reference
        q = np.empty(m, np.uint8)
        half = m // 2
        q[:half] = ref[left: left + half]
        q[half:] = ref[right - (m - half): right]
        mut = rng.random(m) < 0.15
        q[mut] = (q[mut] + 1) % 4
        a = refine_splice_indel(q, ref, left, right)
        b = refine_splice_indel_np(q, ref, left, right)
        if a is None or b is None:
            assert a == b, trial
            continue
        assert a[0] == b[0], (trial, a, b)    # left ops
        assert a[1] == b[1], trial            # intron len
        assert a[2] == b[2], trial            # right ops
        assert a[3] == b[3], trial            # vote
        assert a[4] == pytest.approx(b[4])    # score


def test_hamming_many():
    lib = get_lib()
    rng = np.random.default_rng(7)
    buf = rng.integers(0, 4, 10_000).astype(np.uint8)
    read = buf[500:601].copy()
    read[3] = (read[3] + 1) % 4
    pos = np.array([500, 501, 9950, -1], np.int64)
    out = np.zeros(4, np.int32)
    lib.hamming_many_c(buf, len(buf), read, len(read), pos, 4, out)
    assert out[0] == 1
    assert out[1] > 10
    assert out[2] == 1 << 30  # out of range
    assert out[3] == 1 << 30


def test_backtrack_match():
    import os
    from lr2rmats_tpu.align import chain as chain_mod
    rng = np.random.default_rng(11)
    for trial in range(20):
        n = int(rng.integers(2, 200))
        parent = np.full(n, -1, np.int64)
        for i in range(1, n):
            if rng.random() < 0.8:
                parent[i] = int(rng.integers(0, i))
        f = rng.random(n) * 100
        a = chain_mod.backtrack(f, parent, 10.0)
        # force numpy path
        os.environ["LR2RMATS_NO_NATIVE"] = "1"
        try:
            import lr2rmats_tpu.native.lib as nl
            saved = (nl._lib, nl._tried)
            nl._lib, nl._tried = None, True
            b = chain_mod.backtrack(f, parent, 10.0)
            nl._lib, nl._tried = saved
        finally:
            del os.environ["LR2RMATS_NO_NATIVE"]
        np.testing.assert_array_equal(a[0], b[0])
        assert a[1] == pytest.approx(b[1])
        np.testing.assert_array_equal(a[2], b[2])
        assert a[3] == pytest.approx(b[3])


def test_refine_splice_fast_match():
    from lr2rmats_tpu.align.splice import refine_splice, refine_splice_np
    rng = np.random.default_rng(13)
    ref = rng.integers(0, 4, 30_000).astype(np.uint8)
    for trial in range(40):
        m = int(rng.integers(0, 30))
        left = int(rng.integers(100, 5000))
        right = left + m + int(rng.integers(40, 9000))
        q = np.empty(m, np.uint8)
        half = m // 2
        q[:half] = ref[left: left + half]
        q[half:] = ref[right - (m - half): right]
        mut = rng.random(m) < 0.1
        q[mut] = (q[mut] + 1) % 4
        a = refine_splice(q, ref, left, right)
        b = refine_splice_np(q, ref, left, right)
        assert a[0] == b[0], trial
        assert a[1] == pytest.approx(b[1]), trial
        assert a[2] == b[2], trial


def test_extend_chain_match():
    """Native one-call extension == Python reference on simulated reads."""
    from lr2rmats_tpu.align.aligner import SpliceAligner
    from tests.test_aligner import plant_motifs, random_genome, splice_read
    g = random_genome(150_000, seed=77)
    exon_sets = [
        [(10_000, 10_400), (14_000, 14_300), (21_000, 21_500)],
        [(50_000, 50_250), (58_000, 58_200)],
        [(90_000, 90_300), (95_000, 95_400), (99_000, 99_100), (103_000, 103_200)],
    ]
    for es in exon_sets:
        plant_motifs(g, es)
    al = SpliceAligner(g)
    lib = get_lib()
    for i, es in enumerate(exon_sets):
        for err, seed in ((0.0, 1), (0.02, 2), (0.05, 3)):
            read = splice_read(g, es, "+", err=err, seed=seed + i)
            anch = al._anchors(read)
            if anch[0] is None:
                continue
            from lr2rmats_tpu.align.chain import backtrack, chain_anchors
            q, gg = anch[0]
            f, parent = chain_anchors(q, gg, al.p.chain)
            pri, _, _, _ = backtrack(f, parent, al.p.min_score)
            if not len(pri):
                continue
            a = al._extend_native(lib, read, q[pri], gg[pri])
            b = al._extend_py(read, q[pri], gg[pri])
            assert a[0] == b[0], (i, err, "pos")
            assert a[1] == b[1], (i, err, "ops", a[1], b[1])
            assert a[2] == b[2], (i, err, "ed")
            assert a[3] == b[3], (i, err, "nmatch")
            assert a[4] == b[4], (i, err, "vote")


def test_lookup_range_match():
    from lr2rmats_tpu.index.minimizer import MinimizerIndex
    import lr2rmats_tpu.native.lib as nl
    rng = np.random.default_rng(23)
    h = np.sort(rng.integers(0, 1 << 30, 100_000).astype(np.uint64))
    idx = MinimizerIndex(15, 5, h, np.arange(len(h), dtype=np.int64),
                         np.zeros(len(h), np.int8),
                         np.array([0, 10**6], np.int64), ["c"])
    q = np.concatenate([rng.choice(h, 500),
                        rng.integers(0, 1 << 30, 500).astype(np.uint64)])
    lo1, hi1 = idx.lookup(q)
    saved = (nl._lib, nl._tried)
    nl._lib, nl._tried = None, True
    lo2, hi2 = idx.lookup(q)
    nl._lib, nl._tried = saved
    np.testing.assert_array_equal(lo1, lo2)
    np.testing.assert_array_equal(hi1, hi2)


def test_check_splice_site_match():
    from lr2rmats_tpu.transcript import classify as cl
    from lr2rmats_tpu.transcript.model import Transcripts
    import lr2rmats_tpu.native.lib as nl
    rng = np.random.default_rng(31)
    for trial in range(40):
        def mk_t(n_ex, base):
            T = Transcripts()
            starts, ends = [], []
            pos = base
            for _ in range(n_ex):
                pos += int(rng.integers(50, 400))
                starts.append(pos)
                pos += int(rng.integers(80, 300))
                ends.append(pos)
            T.append(0, False, starts, ends, init_novel=True)
            return T
        bam = mk_t(int(rng.integers(2, 6)), 1000)
        anno = mk_t(int(rng.integers(2, 6)), 1000 + int(rng.integers(-300, 300)))
        # occasionally copy some boundaries so matches occur
        bn = int(bam.exon_n[0]); an = int(anno.exon_n[0])
        for _ in range(int(rng.integers(0, 3))):
            j = int(rng.integers(0, min(bn, an)))
            anno.exon_start[0, j] = bam.exon_start[0, j]
            anno.exon_end[0, j] = bam.exon_end[0, j]
        anno.start[0] = anno.exon_start[0, 0]
        anno.end[0] = anno.exon_end[0, an - 1]
        import copy
        bam2 = Transcripts(); bam2.append_from(bam, 0)
        dis = int(rng.integers(0, 3))
        r1 = cl.check_splice_site(bam, 0, anno, 0, dis)
        saved = (nl._lib, nl._tried)
        nl._lib, nl._tried = None, True
        r2 = cl.check_splice_site(bam2, 0, anno, 0, dis)
        nl._lib, nl._tried = saved
        assert r1 == r2, trial
        np.testing.assert_array_equal(bam.novel_site_flag[0], bam2.novel_site_flag[0])
        np.testing.assert_array_equal(bam.novel_exon_flag[0], bam2.novel_exon_flag[0])
        np.testing.assert_array_equal(bam.novel_junction_flag[0], bam2.novel_junction_flag[0])
        assert bool(bam.flags["known"][0]) == bool(bam2.flags["known"][0])
        assert (bool(bam.flags["has_known_site"][0]) ==
                bool(bam2.flags["has_known_site"][0]))


def test_extend_chain_fuzz_edges():
    """Stress the native extension against the Python reference with chains
    touching genome edges, overlapping anchors, and dense errors."""
    from lr2rmats_tpu.align.aligner import SpliceAligner
    from lr2rmats_tpu.align.chain import backtrack, chain_anchors
    from lr2rmats_tpu.io.fasta import Genome
    rng = np.random.default_rng(101)
    codes = rng.integers(0, 4, 60_000).astype(np.uint8)
    g = Genome(["c"], codes, np.array([0, 60_000], np.int64))
    al = SpliceAligner(g)
    lib = get_lib()
    n_checked = 0
    for trial in range(60):
        n_ex = int(rng.integers(1, 5))
        pos = int(rng.integers(0, 2000)) if trial % 3 else 0  # near edge
        parts = []
        for e in range(n_ex):
            elen = int(rng.integers(60, 400))
            parts.append((pos, min(pos + elen, 59_000)))
            pos = parts[-1][1] + int(rng.integers(40, 3000))
            if pos >= 58_000:
                break
        read = np.concatenate([g.codes[a:b] for a, b in parts]).copy()
        mut = rng.random(len(read)) < 0.05
        read[mut] = (read[mut] + rng.integers(1, 4, int(mut.sum()))) % 4
        anch = al._anchors(read)
        if anch[0] is None:
            continue
        q, gg = anch[0]
        f, parent = chain_anchors(q, gg, al.p.chain)
        pri, _, _, _ = backtrack(f, parent, al.p.min_score)
        if len(pri) < 1:
            continue
        a = al._extend_native(lib, read, q[pri], gg[pri])
        b = al._extend_py(read, q[pri], gg[pri])
        assert a == b, (trial, a, b)
        n_checked += 1
    assert n_checked > 20


def test_filter_sam_native_matches(tmp_path):
    """Native streaming SAM filter == Python filter_alignments on a real
    aligner-produced SAM (with secondaries, rm-gtf, varied CIGARs)."""
    from lr2rmats_tpu.align.batch import BatchAligner
    from lr2rmats_tpu.io.fasta import Genome, decode_seq
    from lr2rmats_tpu.io.gtf import ChrNames, read_anno_trans
    from lr2rmats_tpu.io.sam import SamReader, SamWriter
    from lr2rmats_tpu.pipeline.commands import _filter_sam_native
    from lr2rmats_tpu.transcript.filter import FilterParams, filter_alignments
    from tests.test_aligner import plant_motifs, random_genome, splice_read

    g = random_genome(150_000, seed=63)
    exon_sets = [
        [(10_000, 10_400), (14_000, 14_300)],
        [(50_000, 50_250), (58_000, 58_200), (63_000, 63_300)],
        [(90_000, 90_800)],
    ]
    for es in exon_sets:
        plant_motifs(g, es)
    al = BatchAligner(g)
    reads, names = [], []
    for i, es in enumerate(exon_sets):
        for err, seed in ((0.0, 1), (0.04, 2)):
            reads.append(splice_read(g, es, "+", err=err, seed=seed + i))
            names.append(f"q{i}_{seed}")
    sam = tmp_path / "t.sam"
    with open(sam, "w") as f:
        w = SamWriter(f, al.refs)
        for rec in al.align_batch(names, reads):
            w.write(rec)
    # rm gtf covering the single-exon gene
    rm = tmp_path / "rm.gtf"
    rm.write_text('chrT\tx\texon\t90001\t90800\t.\t+\t.\t'
                  'gene_id "r"; transcript_id "r";\n')
    for rmp in (None, str(rm)):
        params = FilterParams()
        native = _filter_sam_native(str(sam), params, rmp)
        assert native is not None
        _, _, buf, spans, rd = native
        kept_n = [rd._parse(buf[o: o + l].tobytes().decode())
                  for o, l in zip(spans[0].tolist(), spans[1].tolist())]
        with open(sam) as f:
            rd = SamReader(f)
            rmT = None
            if rmp:
                cname = ChrNames([n for n, _ in rd.refs])
                rmT = read_anno_trans(rmp, cname)
            kept_p = list(filter_alignments(iter(rd), params, rmT))
        assert [(r.qname, r.pos) for r in kept_n] == \
               [(r.qname, r.pos) for r in kept_p], rmp
        assert [r.tags.get("NM") for r in kept_n] == \
               [r.tags.get("NM") for r in kept_p]


def test_sam_to_exons_native_matches(tmp_path):
    """Native SAM->Transcripts ingestion == record-wise read_bam_trans."""
    from lr2rmats_tpu.align.batch import BatchAligner
    from lr2rmats_tpu.io.sam import SamReader, SamWriter
    from lr2rmats_tpu.transcript.exon_chain import (read_bam_trans,
                                                    read_sam_trans_native)
    from tests.test_aligner import plant_motifs, random_genome, splice_read
    g = random_genome(150_000, seed=81)
    exon_sets = [
        [(10_000, 10_400), (14_000, 14_300)],
        [(50_000, 50_250), (58_000, 58_200), (63_000, 63_300)],
        [(90_000, 90_800)],
    ]
    for es in exon_sets:
        plant_motifs(g, es)
    al = BatchAligner(g)
    reads, names = [], []
    for i, es in enumerate(exon_sets):
        for strand in "+-":
            reads.append(splice_read(g, es, strand, err=0.02, seed=3 + i))
            names.append(f"s{i}{strand}")
    sam = tmp_path / "x.sam"
    with open(sam, "w") as f:
        w = SamWriter(f, al.refs)
        for rec in al.align_batch(names, reads):
            w.write(rec)
    Tn = read_sam_trans_native(str(sam), 3, 3, 50)
    assert Tn is not None
    with open(sam) as f:
        rd = SamReader(f)
        Tp = read_bam_trans(iter(rd), 3, 3, 50)
    assert Tn.n == Tp.n
    for i in range(Tp.n):
        assert Tn.trans_id[i] == Tp.trans_id[i]
        assert int(Tn.tid[i]) == int(Tp.tid[i])
        assert int(Tn.is_rev[i]) == int(Tp.is_rev[i])
        np.testing.assert_array_equal(Tn.exons(i)[0], Tp.exons(i)[0])
        np.testing.assert_array_equal(Tn.exons(i)[1], Tp.exons(i)[1])
        en = int(Tp.exon_n[i])
        np.testing.assert_array_equal(Tn.novel_exon_flag[i, :en],
                                      Tp.novel_exon_flag[i, :en])
        np.testing.assert_array_equal(
            Tn.novel_site_flag[i, :2*(en-1)], Tp.novel_site_flag[i, :2*(en-1)])


def test_check_iden_match():
    from lr2rmats_tpu.transcript.classify import check_iden, check_iden_np
    from lr2rmats_tpu.transcript.model import Transcripts
    rng = np.random.default_rng(41)
    for trial in range(200):
        def mk(n_ex, base, jitter=0):
            T = Transcripts()
            starts, ends = [], []
            pos = base
            for _ in range(n_ex):
                pos += int(rng.integers(50, 300))
                starts.append(pos + (int(rng.integers(-jitter, jitter + 1))
                                     if jitter else 0))
                pos += int(rng.integers(80, 250))
                ends.append(pos)
            T.append(0, False, sorted(starts), sorted(ends), init_novel=True)
            return T
        a = mk(int(rng.integers(1, 6)), 1000)
        if rng.random() < 0.5:
            b = mk(int(rng.integers(1, 6)), 1000 + int(rng.integers(-200, 200)))
        else:
            # related: copy of a, possibly truncated
            b = Transcripts()
            en = int(a.exon_n[0])
            lo = int(rng.integers(0, en))
            hi = int(rng.integers(lo, en)) + 1
            b.append(0, False, a.exon_start[0, lo:hi].copy(),
                     a.exon_end[0, lo:hi].copy(), init_novel=True)
        ss = int(rng.integers(0, 3))
        ee = int(rng.choice([5, 100, 1 << 30]))
        assert check_iden(a, 0, b, 0, ss, ee) == \
            check_iden_np(a, 0, b, 0, ss, ee), trial
        assert check_iden(b, 0, a, 0, ss, ee) == \
            check_iden_np(b, 0, a, 0, ss, ee), trial


def test_minimizers_batch_match():
    """extract_minimizers_batch_c == per-read numpy reference, incl. the
    L = k+w-1 shortest-valid edge and all-too-short reads."""
    from lr2rmats_tpu.index.minimizer import extract_minimizers_np
    lib = get_lib()
    rng = np.random.default_rng(11)
    k, w = 15, 5
    reads = [rng.integers(0, 4, n).astype(np.uint8)
             for n in (0, 5, k + w - 2, k + w - 1, k + w, 300, 1500, 2500)]
    reads[6][100:110] = 4
    offs = np.zeros(len(reads) + 1, np.int64)
    np.cumsum([len(r) for r in reads], out=offs[1:])
    concat = np.ascontiguousarray(np.concatenate(reads), np.uint8)
    oh = np.empty(len(concat), np.uint64)
    op = np.empty(len(concat), np.int64)
    os_ = np.empty(len(concat), np.int8)
    on = np.zeros(len(reads), np.int64)
    lib.extract_minimizers_batch_c(concat, offs, len(reads), k, w, 3,
                                   oh, op, os_, on)
    for i, r in enumerate(reads):
        h, p, s = extract_minimizers_np(r, k, w)
        o, n = offs[i], int(on[i])
        assert n == len(h)
        np.testing.assert_array_equal(oh[o:o + n], h)
        np.testing.assert_array_equal(op[o:o + n], p)
        np.testing.assert_array_equal(os_[o:o + n], s)


def test_lookup_range_mt_match():
    """Threaded bucketed lookup == numpy searchsorted on a large batch."""
    from lr2rmats_tpu.index.minimizer import MinimizerIndex
    rng = np.random.default_rng(12)
    hashes = np.sort(rng.integers(0, 1 << 30, 1 << 16).astype(np.uint64))
    idx = MinimizerIndex(15, 5, hashes, np.zeros(len(hashes), np.int64),
                         np.zeros(len(hashes), np.int8),
                         np.array([0, 10], np.int64), ["c"])
    q = rng.integers(0, 1 << 30, 40_000).astype(np.uint64)
    q[:100] = hashes[rng.integers(0, len(hashes), 100)]  # guaranteed hits
    lo, hi = idx.lookup(q, n_threads=4)
    np.testing.assert_array_equal(lo, np.searchsorted(hashes, q, "left"))
    np.testing.assert_array_equal(hi, np.searchsorted(hashes, q, "right"))


def test_expand_anchors_matches_numpy():
    """expand_anchors_c (seeding hit expansion + composite key) must match
    the numpy repeat/gather/where chain exactly."""
    from lr2rmats_tpu.native import get_lib
    lib = get_lib()
    if lib is None:
        import pytest
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(9)
    n_idx, n_seeds, n_reads, k = 5000, 800, 40, 15
    idx_pos = np.sort(rng.integers(0, 1 << 30, n_idx)).astype(np.int64)
    idx_strand = rng.integers(0, 2, n_idx).astype(np.int8)
    lo = rng.integers(0, n_idx - 6, n_seeds).astype(np.int64)
    hi = lo + rng.integers(0, 6, n_seeds)
    qp = rng.integers(0, 3000, n_seeds).astype(np.int64)
    qs = rng.integers(0, 2, n_seeds).astype(np.int8)
    rid = rng.integers(0, n_reads, n_seeds).astype(np.int32)
    lens = rng.integers(100, 4000, n_reads).astype(np.int64)
    cnt = (hi - lo).astype(np.int64)
    starts = np.zeros(n_seeds + 1, np.int64)
    np.cumsum(cnt, out=starts[1:])
    total = int(cnt.sum())
    # numpy reference
    flat = np.repeat(lo, cnt) + (np.arange(total) -
                                 np.repeat(starts[:-1], cnt))
    gp_ref = idx_pos[flat]
    gs = idx_strand[flat]
    strand_ref = (np.repeat(qs, cnt) ^ gs).astype(np.int8)
    ridx_ref = np.repeat(rid, cnt)
    qpx = np.repeat(qp, cnt)
    qf_ref = np.where(strand_ref == 1, lens[ridx_ref] - k - qpx, qpx)
    key_ref = ((ridx_ref.astype(np.uint64) << np.uint64(52)) |
               (strand_ref.astype(np.uint64) << np.uint64(51)) |
               (gp_ref.astype(np.uint64) << np.uint64(19)) |
               qf_ref.astype(np.uint64))
    gp = np.empty(total, np.int64)
    strand = np.empty(total, np.int8)
    ridx = np.empty(total, np.int32)
    qf = np.empty(total, np.int64)
    key = np.empty(total, np.uint64)
    lib.expand_anchors_c(lo, np.ascontiguousarray(hi), starts, n_seeds,
                         idx_pos, idx_strand, qp, qs, rid, lens, k,
                         gp, strand, ridx, qf, key, 1, 4)
    np.testing.assert_array_equal(gp, gp_ref)
    np.testing.assert_array_equal(strand, strand_ref)
    np.testing.assert_array_equal(ridx, ridx_ref)
    np.testing.assert_array_equal(qf, qf_ref)
    np.testing.assert_array_equal(key, key_ref)


def test_extend_chain_ops_overflow_rc():
    """When the CIGAR run buffer is too small, extend_chain_c must return a
    nonzero rc (python-fallback signal) instead of silently merging later
    runs into earlier stored ones (a corrupted CIGAR)."""
    import ctypes

    from lr2rmats_tpu.align.aligner import SpliceAligner
    from lr2rmats_tpu.align.chain import backtrack, chain_anchors
    from lr2rmats_tpu.io.fasta import Genome
    from tests.test_aligner import plant_motifs, random_genome, splice_read

    g = random_genome(60_000, seed=77)
    exons = [(10_000, 10_300), (14_000, 14_250), (20_000, 20_300)]
    plant_motifs(g, exons)
    al = SpliceAligner(g)
    read = splice_read(g, exons, "+", err=0.0, seed=7)
    anch = al._anchors(read)
    assert anch[0] is not None
    q, gg = anch[0]
    f, parent = chain_anchors(q, gg, al.p.chain)
    pri, _, _, _ = backtrack(f, parent, al.p.min_score)
    assert len(pri) >= 2
    lib = get_lib()
    p = al.p
    chrom_lo, chrom_hi = al._chrom_bounds(int(gg[pri][0]))

    def call(cap):
        ops_buf = np.zeros(2 * cap, np.int32)
        n_ops = ctypes.c_int32(cap)
        pos = ctypes.c_int64()
        ed = ctypes.c_int64()
        nmatch = ctypes.c_int64()
        vote = ctypes.c_int32()
        rc = lib.extend_chain_c(
            np.ascontiguousarray(read, np.uint8), len(read),
            g.codes, len(g.codes), chrom_lo, chrom_hi,
            np.ascontiguousarray(q[pri], np.int64),
            np.ascontiguousarray(gg[pri], np.int64), len(pri),
            p.k, p.min_intron_gap, p.min_intron_len, p.band_pad,
            p.ext_match, p.ext_mismatch, 4,
            ctypes.byref(pos), ops_buf, ctypes.byref(n_ops),
            ctypes.byref(ed), ctypes.byref(nmatch), ctypes.byref(vote))
        return rc, n_ops.value, ops_buf

    # generous cap: success, with a 3-exon (>= 5-run M N M N M) CIGAR
    rc, n, buf = call(2 * (len(read) + 64))
    assert rc == 0 and n >= 5
    full = [(int(buf[2 * i]), int(buf[2 * i + 1])) for i in range(n)]
    # cap of 2 cannot hold that CIGAR: must signal, not truncate
    rc2, _, _ = call(2)
    assert rc2 != 0
    # the python fallback (what callers do on rc != 0) reproduces the CIGAR
    pos_py, ops_py, *_ = al._extend_py(read, q[pri], gg[pri])
    assert [o for o in ops_py if o[1] > 0] == [o for o in full if o[1] > 0]


def test_collect_gaps_block_overflow_signals():
    """collect_gaps_batch_c must flag candidates whose chain produces more
    colinear blocks than blk_stride (n_junc = -1 -> host fallback) instead
    of silently truncating the alignment."""
    lib = get_lib()
    k = 15
    rng = np.random.default_rng(11)
    ref = rng.integers(0, 4, 10_000).astype(np.uint8)
    # anchors on three distinct diagonals separated by intron-scale gaps
    aq = np.array([0, 40, 80], np.int64)
    ag = np.array([100, 1140, 2180], np.int64)
    read = np.concatenate([ref[100:155], ref[1140:1195],
                           ref[2180:2235]]).astype(np.uint8)
    read_offs = np.array([0, len(read)], np.int64)
    a_offs = np.array([0, 3], np.int64)
    cand_read = np.zeros(1, np.int32)
    cand_strand = np.zeros(1, np.int8)

    def call(blk_stride, gstride=8, mgap=64):
        blocks = np.zeros(blk_stride * 3, np.int64)
        n_blocks = np.zeros(1, np.int32)
        jflag = np.zeros(gstride, np.int8)
        jq = np.zeros(gstride * mgap, np.uint8)
        jqlen = np.zeros(gstride, np.int32)
        jlref = np.zeros(gstride, np.int64)
        jrref = np.zeros(gstride, np.int64)
        jclean_j = np.zeros(gstride, np.int32)
        jclean_vote = np.zeros(gstride, np.int32)
        jel = np.zeros(gstride, np.int32)
        jer = np.zeros(gstride, np.int32)
        n_junc = np.zeros(1, np.int32)
        lib.collect_gaps_batch_c(
            read, read_offs, ref, len(ref),
            cand_read, cand_strand, aq, ag, a_offs,
            k, 30, 20, mgap, 1, blk_stride, gstride,
            blocks, n_blocks, jflag, jq, jqlen, jlref, jrref,
            jclean_j, jclean_vote, jel, jer, n_junc, 1)
        return int(n_blocks[0]), int(n_junc[0])

    nb, nj = call(blk_stride=8)
    assert nb == 3 and nj >= 0
    nb2, nj2 = call(blk_stride=2)
    assert nj2 == -1 and nb2 == 0  # overflow flagged, not truncated


def test_filter_sam_rm_unknown_chrom(tmp_path):
    """rm_gtf intervals on chromosomes absent from the SAM header (tid -1)
    must be ignored — including for query lines whose own RNAME is not in
    the header (both map to tid -1; they must not 'overlap')."""
    from lr2rmats_tpu.pipeline.commands import _filter_sam_native
    from lr2rmats_tpu.transcript.filter import FilterParams

    seq = "ACGT" * 25
    lines = ["@SQ\tSN:chrA\tLN:100000"]
    lines.append("\t".join(["r1", "0", "chrA", "101", "60", "100M",
                            "*", "0", "0", seq, "*"]))
    # RNAME not present in the header -> native tid = -1
    lines.append("\t".join(["r2", "0", "chrB", "101", "60", "100M",
                            "*", "0", "0", seq, "*"]))
    buf = np.frombuffer(("\n".join(lines) + "\n").encode(), np.uint8)
    rm = tmp_path / "rm.gtf"
    rm.write_text('chrZ\tx\texon\t1\t99999\t.\t+\t.\t'
                  'gene_id "r"; transcript_id "r";\n')
    params = FilterParams(min_intron_n=0)
    res = _filter_sam_native(None, params, str(rm), data=buf.copy())
    assert res is not None
    _, _, b, spans, _ = res
    kept = [b[o: o + l].tobytes().split(b"\t")[0]
            for o, l in zip(spans[0].tolist(), spans[1].tolist())]
    assert kept == [b"r1", b"r2"]


def test_minimizer_window_widths():
    """The monotonic-deque window minimum must match the numpy reference
    for every window width, including w=1 and wide windows, with N clumps
    and long constant stretches (tie-heavy hashes)."""
    from lr2rmats_tpu.index.minimizer import (extract_minimizers,
                                              extract_minimizers_np)
    rng = np.random.default_rng(21)
    codes = rng.integers(0, 4, 30_000).astype(np.uint8)
    codes[5_000:5_400] = 4            # N clump
    codes[12_000:14_000] = 2          # long constant stretch (equal hashes)
    codes[rng.random(30_000) < 0.002] = 4
    for k, w in ((15, 1), (15, 2), (15, 5), (15, 16), (11, 9), (31, 7)):
        h1, p1, s1 = extract_minimizers(codes, k, w)
        h2, p2, s2 = extract_minimizers_np(codes, k, w)
        np.testing.assert_array_equal(p1, p2, err_msg=f"k={k} w={w}")
        np.testing.assert_array_equal(h1, h2, err_msg=f"k={k} w={w}")
        np.testing.assert_array_equal(s1, s2, err_msg=f"k={k} w={w}")


def test_gather_scatter_hits_native_bit_equal():
    """gather_hits_c / scatter_hits_c vs the numpy reference path they
    replace in parallel/shard_index._lookup_distributed."""
    from lr2rmats_tpu.native import get_lib
    lib = get_lib()
    if lib is None:
        import pytest
        pytest.skip("native lib unavailable")
    import ctypes
    rng = np.random.default_rng(31)
    M = 50_000
    pos = rng.integers(0, 1 << 33, M).astype(np.int64)
    strand = rng.integers(-1, 2, M).astype(np.int8)
    m = 9000
    l = rng.integers(0, M - 64, m).astype(np.int64)
    cnt = rng.integers(0, 9, m).astype(np.int64)
    ooff = np.cumsum(cnt) - cnt
    total = int(cnt.sum())

    for pos_u32, pdt in ((0, np.int64), (1, np.uint32)):
        src_pos = pos if pos_u32 == 0 else (pos & 0xFFFFFFFF)
        out_pos = np.empty(total, pdt)
        out_str = np.empty(total, np.int8)
        lib.gather_hits_c(src_pos if pos_u32 == 0 else pos, strand,
                          l, cnt, ooff, m, pos_u32,
                          out_pos.ctypes.data_as(ctypes.c_void_p), out_str,
                          3)
        rep = np.repeat(np.arange(m), cnt)
        at = (l[rep] + (np.arange(total) - ooff[rep])).astype(np.int64)
        np.testing.assert_array_equal(out_pos, pos[at].astype(pdt))
        np.testing.assert_array_equal(out_str, strand[at])

    # scatter: place per-query runs at their destination slots
    counts = np.zeros(2 * m, np.int64)
    idx = (rng.permutation(2 * m)[:m]).astype(np.int32)
    counts[idx] = cnt
    dlo = (np.cumsum(counts) - counts).astype(np.int64)
    ppos = pos[:total].copy()
    pstr = strand[:total].copy()
    dst_pos = np.zeros(int(counts.sum()), np.int64)
    dst_str = np.zeros(len(dst_pos), np.int8)
    lib.scatter_hits_c(ppos, pstr, idx, cnt, ooff, m, dlo,
                       dst_pos, dst_str, 3)
    want_pos = np.zeros_like(dst_pos)
    want_str = np.zeros_like(dst_str)
    rep = np.repeat(idx, cnt)
    within = np.arange(total) - np.repeat(ooff, cnt)
    dest = dlo[rep] + within
    want_pos[dest] = ppos
    want_str[dest] = pstr
    np.testing.assert_array_equal(dst_pos, want_pos)
    np.testing.assert_array_equal(dst_str, want_str)


def test_minimizer_save_raw_load_raw_roundtrip(tmp_path):
    """Raw directory format (mmappable) roundtrips bit-identically and
    the mapped table answers lookups identically to the original."""
    from lr2rmats_tpu.index.minimizer import MinimizerIndex
    from lr2rmats_tpu.io.fasta import Genome
    rng = np.random.default_rng(9)
    n = 200_000
    g = Genome(["cA", "cB"],
               rng.integers(0, 4, n).astype(np.uint8),
               np.array([0, n // 2, n], np.int64))
    idx = MinimizerIndex.build(g)
    d = tmp_path / "shard.raw"
    idx.save_raw(str(d), genome_sig="sigX")
    back = MinimizerIndex.load_raw(str(d), mmap=True)
    assert back.genome_sig == "sigX"
    assert (back.k, back.w, back.max_occ) == (idx.k, idx.w, idx.max_occ)
    assert back.names == idx.names
    np.testing.assert_array_equal(back.hashes, idx.hashes)
    np.testing.assert_array_equal(back.pos, idx.pos)
    np.testing.assert_array_equal(back.strand, idx.strand)
    q = rng.choice(idx.hashes, 5000)
    lo1, hi1 = idx.lookup(q)
    lo2, hi2 = back.lookup(q)
    np.testing.assert_array_equal(lo1, lo2)
    np.testing.assert_array_equal(hi1, hi2)
