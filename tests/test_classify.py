"""Unit tests for the classification/merge core against hand-computed cases
mirroring the reference C semantics (update_gtf.c / gtf.c)."""

import numpy as np
import pytest

from lr2rmats_tpu.io.sj import SJTable
from lr2rmats_tpu.transcript.classify import (
    check_iden, check_splice_site, check_trans, check_with_short_sj,
    exon_overlap_frac, split_trans,
)
from lr2rmats_tpu.transcript.merge import merge_trans, uniq_trans
from lr2rmats_tpu.transcript.model import Transcripts, UpdateGtfParams


def mk(exons, tid=0, rev=False, init_novel=True, **kw):
    T = Transcripts()
    add(T, exons, tid, rev, init_novel, **kw)
    return T


def add(T, exons, tid=0, rev=False, init_novel=True, **kw):
    starts = [e[0] for e in exons]
    ends = [e[1] for e in exons]
    return T.append(tid, rev, starts, ends, init_novel=init_novel, **kw)


def test_exon_overlap_frac():
    assert exon_overlap_frac(100, 200, 150, 250) == pytest.approx(51 / 101)
    assert exon_overlap_frac(100, 200, 300, 400) == 0.0
    assert exon_overlap_frac(100, 200, 100, 200) == 1.0


class TestCheckIden:
    def test_identical(self):
        a = mk([(100, 200), (300, 400)])
        b = mk([(100, 200), (300, 400)])
        assert check_iden(a, 0, b, 0, 0, 1 << 30) == 0

    def test_identical_with_end_slack(self):
        a = mk([(90, 200), (300, 410)])
        b = mk([(100, 200), (300, 400)])
        assert check_iden(a, 0, b, 0, 0, 1 << 30) == 0
        assert check_iden(a, 0, b, 0, 0, 5) == -1

    def test_splice_mismatch(self):
        a = mk([(100, 201), (300, 400)])
        b = mk([(100, 200), (300, 400)])
        assert check_iden(a, 0, b, 0, 0, 1 << 30) == -1
        assert check_iden(a, 0, b, 0, 1, 1 << 30) == 0

    def test_containment(self):
        long_t = mk([(100, 200), (300, 400), (500, 600)])
        short_t = mk([(310, 400), (500, 590)])
        # shorter's junction (400,500) anchors at longer's junction 1
        assert check_iden(short_t, 0, long_t, 0, 0, 1 << 30) == 2
        assert check_iden(long_t, 0, short_t, 0, 0, 1 << 30) == 2

    def test_no_containment(self):
        long_t = mk([(100, 200), (300, 400), (500, 600)])
        other = mk([(310, 405), (500, 590)])
        assert check_iden(other, 0, long_t, 0, 0, 1 << 30) == -1


class TestMergeTrans:
    def ugp(self):
        return UpdateGtfParams()

    def test_identical_merge_increments_cov_and_extends(self):
        kept = mk([(100, 200), (300, 400)])
        t = mk([(90, 200), (300, 410)])
        assert merge_trans(t, 0, kept, False, 0, 1 << 30, 0.8)
        assert kept.cov[0] == 2
        assert kept.exon_start[0, 0] == 90
        assert kept.start[0] == 90
        assert kept.exon_end[0, 1] == 410
        assert kept.end[0] == 410

    def test_contained_merges_without_cov(self):
        kept = mk([(100, 200), (300, 400), (500, 600)])
        t = mk([(310, 400), (500, 590)])
        assert merge_trans(t, 0, kept, False, 0, 1 << 30, 0.8)
        assert kept.cov[0] == 1  # containment does not bump cov

    def test_single_exon_merge(self):
        kept = mk([(100, 200)])
        t = mk([(110, 210)])
        assert merge_trans(t, 0, kept, False, 0, 1 << 30, 0.8)
        assert kept.cov[0] == 2
        assert kept.exon_end[0, 0] == 210

    def test_single_exon_low_overlap_no_merge(self):
        kept = mk([(100, 200)])
        t = mk([(180, 400)])
        assert not merge_trans(t, 0, kept, False, 0, 1 << 30, 0.8)

    def test_scan_stops_past_end(self):
        kept = mk([(100, 200), (300, 400)])
        t = mk([(500, 600), (700, 800)])
        assert not merge_trans(t, 0, kept, False, 0, 1 << 30, 0.8)

    def test_force_strand(self):
        kept = mk([(100, 200), (300, 400)], rev=False)
        t = mk([(100, 200), (300, 400)], rev=True)
        assert not merge_trans(t, 0, kept, True, 0, 1 << 30, 0.8)
        assert merge_trans(t, 0, kept, False, 0, 1 << 30, 0.8)


def anno_one_gene():
    """Annotation: one 3-exon '-' transcript."""
    anno = Transcripts()
    add(anno, [(1000, 1100), (1200, 1300), (1400, 1500)], rev=True,
        init_novel=False, gene_id="G1", gene_name="GENE1", trans_id="T1",
        trans_name="TR1")
    anno.gene_n = 1
    return anno


def run_check(bam_T, anno, sj=None, **ugp_kw):
    ugp = UpdateGtfParams(**ugp_kw)
    updated, known, novel, unrecog = (Transcripts() for _ in range(4))
    check_trans(bam_T, anno, sj or SJTable(), ugp, updated, known, novel, unrecog)
    return updated, known, novel, unrecog


class TestCheckTrans:
    def test_known(self):
        bam = mk([(1000, 1100), (1200, 1300), (1400, 1500)],
                 trans_id="r1", trans_name="r1")
        updated, known, novel, unrecog = run_check(bam, anno_one_gene())
        assert known.n == 1 and novel.n == 0 and unrecog.n == 0
        assert bam.flags["known"][0]
        # gene identity + strand adopted from annotation
        assert bam.gene_id[0] == "G1"
        assert bam.is_rev[0] == 1
        # all novelty flags cleared
        assert not bam.novel_exon_flag[0, :3].any()
        assert not bam.novel_site_flag[0, :4].any()
        assert not bam.novel_junction_flag[0, :2].any()

    def test_exon_skip_with_known_sites_is_known(self):
        # middle exon skipped: junction (1100,1400) is novel as a junction,
        # but BOTH its sites are annotated -> the reference calls this KNOWN
        # ("all bam sites identical", update_gtf.c:770-772)
        bam = mk([(1000, 1100), (1400, 1500)], trans_id="r1", trans_name="r1")
        updated, known, novel, unrecog = run_check(bam, anno_one_gene())
        assert known.n == 1 and novel.n == 0
        # the skip junction itself remains flagged novel
        assert bam.novel_junction_flag[0, 0] == 1
        assert bam.novel_site_flag[0, 0] == 0  # don 1100 known
        assert bam.novel_site_flag[0, 1] == 0  # acc 1400 known

    def test_novel_with_known_site(self):
        # novel acceptor 1350 (annotated accs are 1200/1400), known donor 1100
        bam = mk([(1000, 1100), (1350, 1500)], trans_id="r1", trans_name="r1")
        updated, known, novel, unrecog = run_check(bam, anno_one_gene())
        assert known.n == 0 and novel.n == 1 and updated.n == 1
        assert bam.flags["has_known_site"][0]
        assert not bam.flags["known"][0]
        assert bam.novel_site_flag[0, 0] == 0  # don 1100 known
        assert bam.novel_site_flag[0, 1] == 1  # acc 1350 novel
        assert bam.novel_junction_flag[0, 0] == 1

    def test_unrecognized(self):
        bam = mk([(5000, 5100), (5200, 5300)], trans_id="r1", trans_name="r1")
        updated, known, novel, unrecog = run_check(bam, anno_one_gene())
        assert unrecog.n == 1 and known.n == 0 and novel.n == 0
        assert bam.gene_id[0] == "NA"

    def test_full_level3_gate(self):
        # terminal exon overlaps middle of annotation -> lfull=0, lnoth=0
        # at level 3 => full=0 => dropped entirely
        bam = mk([(1210, 1300), (1400, 1500)], trans_id="r1", trans_name="r1")
        updated, known, novel, unrecog = run_check(bam, anno_one_gene(),
                                                   full_level=3)
        assert known.n == 0 and novel.n == 0 and unrecog.n == 0
        assert not bam.flags["full"][0]
        # at level 5 (most relaxed) the same read is kept as known
        bam2 = mk([(1210, 1300), (1400, 1500)], trans_id="r1", trans_name="r1")
        _, known2, _, _ = run_check(bam2, anno_one_gene(), full_level=5)
        assert known2.n == 1

    def test_single_exon_known(self):
        anno = Transcripts()
        add(anno, [(2000, 3000)], init_novel=False, gene_id="G2",
            gene_name="G2", trans_id="T2", trans_name="T2")
        bam = mk([(2050, 2950)], trans_id="r1", trans_name="r1")
        updated, known, novel, unrecog = run_check(bam, anno)
        assert known.n == 1

    def test_single_exon_low_ovlp_unrecog(self):
        anno = Transcripts()
        add(anno, [(2000, 3000)], init_novel=False, gene_id="G2",
            gene_name="G2", trans_id="T2", trans_name="T2")
        bam = mk([(2900, 4000)], trans_id="r1", trans_name="r1")
        updated, known, novel, unrecog = run_check(bam, anno)
        assert known.n == 0 and unrecog.n == 1


class TestShortSJ:
    def sj_table(self, rows):
        t = SJTable(
            tid=np.array([r[0] for r in rows], np.int32),
            don=np.array([r[1] for r in rows], np.int32),
            acc=np.array([r[2] for r in rows], np.int32),
            strand=np.zeros(len(rows), np.int8),
            motif=np.zeros(len(rows), np.int8),
            is_anno=np.zeros(len(rows), np.int8),
            uniq_c=np.array([r[3] for r in rows], np.int32),
            multi_c=np.array([r[4] for r in rows], np.int32),
            max_over=np.zeros(len(rows), np.int32),
        )
        return t.sort()

    def test_supported_junction(self):
        # novel junction 1100+1..1350-1 = intron (1101, 1349)
        bam = mk([(1000, 1100), (1350, 1500)], trans_id="r1", trans_name="r1")
        sj = self.sj_table([(0, 1101, 1349, 3, 0)])
        updated, known, novel, unrecog = run_check(bam, anno_one_gene(), sj=sj)
        assert novel.n == 1
        assert not bam.flags["has_unreliable_junction"][0]

    def test_unsupported_junction(self):
        bam = mk([(1000, 1100), (1350, 1500)], trans_id="r1", trans_name="r1")
        sj = self.sj_table([(0, 9101, 9399, 3, 0)])  # elsewhere
        updated, known, novel, unrecog = run_check(bam, anno_one_gene(), sj=sj)
        assert novel.n == 0 and updated.n == 0
        assert bam.flags["has_unreliable_junction"][0]

    def test_min_count_gate(self):
        bam = mk([(1000, 1100), (1350, 1500)], trans_id="r1", trans_name="r1")
        sj = self.sj_table([(0, 1101, 1349, 0, 5)])  # only multi-mapped
        updated, known, novel, unrecog = run_check(bam, anno_one_gene(), sj=sj)
        assert novel.n == 0
        bam2 = mk([(1000, 1100), (1350, 1500)], trans_id="r1", trans_name="r1")
        updated, known, novel, unrecog = run_check(
            bam2, anno_one_gene(), sj=sj, use_multi=True)
        assert novel.n == 1


class TestSplitTrans:
    def test_split(self):
        # 4 exons; junction 0 known, junction 1 novel+unreliable, junction 2 novel
        bam = mk([(100, 200), (300, 400), (500, 600), (700, 800)],
                 trans_id="r1", trans_name="r1")
        bam.novel_junction_flag[0, :3] = [0, 1, 1]
        bam.unreliable_junction_flag[0, :3] = [0, 1, 0]
        out = split_trans(bam, 0)
        # Faithful reference quirk (update_gtf.c:845-848): the unreliable
        # junction i itself is counted into has_novel BEFORE the cut test, so
        # fragment exons [0..1] IS emitted even though its only junction is
        # known.  The trailing fragment [2,3] (novel only) is dropped.
        assert out.n == 1
        es, _ = out.exons(0)
        np.testing.assert_array_equal(es, [100, 300])

    def test_split_keeps_mixed_fragment(self):
        # 5 exons; junctions: known, novel, unreliable-novel, known
        bam = mk([(100, 200), (300, 400), (500, 600), (700, 800), (900, 1000)],
                 trans_id="r1", trans_name="r1")
        bam.novel_junction_flag[0, :4] = [0, 1, 1, 0]
        bam.unreliable_junction_flag[0, :4] = [0, 0, 1, 0]
        out = split_trans(bam, 0)
        # fragment exons [0..2] has junctions known+novel -> kept
        # fragment exons [3..4] single junction known only -> dropped
        assert out.n == 1
        es, ee = out.exons(0)
        np.testing.assert_array_equal(es, [100, 300, 500])
        assert out.trans_id[0] == "r1.split.0"
        assert out.flags["partial_read"][0]


class TestUniqTrans:
    def test_dedup(self):
        bam = Transcripts()
        add(bam, [(100, 200), (300, 400)], trans_id="a", trans_name="a")
        add(bam, [(100, 200), (300, 400)], trans_id="b", trans_name="b")
        add(bam, [(500, 600), (700, 800)], trans_id="c", trans_name="c")
        uniq, shared = Transcripts(), Transcripts()
        uniq_trans(bam, uniq, shared, False, 0, 1 << 30, 0.8)
        assert uniq.n == 2
        assert shared.n == 1
        assert uniq.cov[0] == 2  # merged duplicate bumped cov


class TestFullLevels:
    """set_full/check_full semantics per level (reference update_gtf.c:629-696)."""

    def anno(self):
        return anno_one_gene()  # '-' strand exons (1000-1100),(1200-1300),(1400-1500)

    def read_flags(self, exons, level):
        bam = mk(exons, trans_id="r", trans_name="r")
        run_check(bam, self.anno(), full_level=level)
        return bam

    def test_level1_requires_exact_terminal_sites(self):
        # exact first-exon end (1100) and last-exon start (1400)
        bam = self.read_flags([(1050, 1100), (1200, 1300), (1400, 1450)], 1)
        assert bam.flags["full"][0]
        # shifted first splice end -> lfull stays 0 -> not full
        bam = self.read_flags([(1050, 1099), (1200, 1300), (1400, 1450)], 1)
        assert not bam.flags["full"][0]

    def test_level2_requires_terminal_exon_overlap(self):
        bam = self.read_flags([(1080, 1100), (1200, 1300), (1400, 1410)], 2)
        assert bam.flags["full"][0]
        # first exon overlaps only the MIDDLE annotated exon -> lfull=0
        bam = self.read_flags([(1210, 1300), (1400, 1500)], 2)
        assert not bam.flags["full"][0]

    def test_level4_only_left_side_matters(self):
        # right end overlapping the middle exon would fail level 3 but
        # level 4 only checks the 5'/left side
        bam = self.read_flags([(1000, 1100), (1200, 1250)], 4)
        assert bam.flags["full"][0]

    def test_level5_always_full(self):
        bam = self.read_flags([(1210, 1300), (1400, 1500)], 5)
        assert bam.flags["full"][0]


def test_end_distance_gate_in_merge():
    """-D end_dis bounds terminal-end differences when merging
    (reference merge_trans1 via check_iden end_dis)."""
    kept = mk([(100, 200), (300, 400)])
    t = mk([(50, 200), (300, 450)])
    assert not merge_trans(t, 0, kept, False, 0, 10, 0.8)   # ends differ by 50
    assert merge_trans(t, 0, kept, False, 0, 60, 0.8)
