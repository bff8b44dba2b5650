"""STAR-format SJ.out.tab edge-case fixtures through the consumption path
(VERDICT r4 missing #1).

Real STAR binaries are unavailable offline, so these hand-built SJ.out.tab
rows pin every column's semantics the way the reference consumes them —
by running the SAME file bytes through BOTH parsers:

  reference read_sj_group (gtf.c:431-449, compiled verbatim via the
  oracle shim's o_read_sj_file, including its get_chr_id append for
  unseen chromosomes and the (tid, don, acc) qsort)
           vs  io/sj.read_sj_group

and then the SAME parsed tables through BOTH short-SJ gates:

  reference check_short_sj / check_with_short_sj (update_gtf.c:589-627)
           vs  transcript/classify.check_with_short_sj (+ native batch)

Columns exercised: strand 0 (undefined) / 1 / 2 and the is_rev mapping
(gtf.c:441: is_rev = strand==1 ? 0 : 1 — strand 0 maps to is_rev=1);
motif 0 (non-canonical) through 6; annotated flag 0/1; uniq-only,
multi-only and mixed support with and without -M (use_multi); count
boundaries around min_sj_cnt; max_over extremes (0 and INT32_MAX).
Decisions are asserted under BOTH ref-compat modes ('exact' and 'fixed'
oracles x ref_acceptor_compat True/False) — the documented deviations
live in acceptor matching, so the SJ gate must agree in all four cells.
"""

import ctypes

import numpy as np
import pytest

import lr2rmats_tpu.transcript.classify as cl
from lr2rmats_tpu.io.gtf import ChrNames
from lr2rmats_tpu.io.sj import read_sj_group
from lr2rmats_tpu.transcript.model import Transcripts, UpdateGtfParams

import reforacle

# (chrom, don, acc, strand, motif, annotated, uniq, multi, max_over)
# deliberately NOT coordinate-sorted: the parser must sort by (tid,don,acc)
FIXTURE_ROWS = [
    ("chr1", 3000, 4000, 2, 2, 0, 1, 1, 2147483647),   # '-', CT/AC, max_over max
    ("chr1", 1500, 2600, 1, 1, 1, 2, 0, 50),           # '+', GT/AG, annotated, uniq-only
    ("chr2", 100, 200, 1, 5, 1, 1000000, 999999, 0),   # AT/AC, huge counts, max_over 0
    ("chr1", 500, 900, 0, 0, 0, 0, 7, 1),              # strand 0, non-canonical, MULTI-only
    ("chrUn_star", 50, 80, 0, 6, 0, 3, 0, 10),         # unseen chromosome (append)
    ("chr1", 700, 800, 2, 3, 1, 4, 2, 7),              # GC/AG, nested inside row idx 3
    ("chr1", 1500, 2200, 0, 4, 0, 1, 5, 3),            # same don as idx 1, smaller acc
]

HDR_CHRS = ["chr1", "chr2"]          # seeded like bam_set_cname would


@pytest.fixture(scope="module")
def sj_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("sjfix") / "SJ.out.tab"
    p.write_text("".join("\t".join(str(x) for x in row) + "\n"
                         for row in FIXTURE_ROWS))
    return str(p)


def _oracle_or_skip(variant="exact"):
    o = reforacle.get_oracle(variant)
    if o is None:
        pytest.skip("reference checkout / gcc unavailable")
    return o


def test_parser_matches_reference(sj_file):
    o = _oracle_or_skip()
    ptr, cols, names = o.read_sj_file(sj_file, HDR_CHRS)
    try:
        cname = ChrNames(list(HDR_CHRS))
        t = read_sj_group(sj_file, cname)
        assert t.n == len(FIXTURE_ROWS) == len(cols["tid"])
        # the unseen chromosome was appended identically (gtf.c:389-403)
        assert names == cname.names == ["chr1", "chr2", "chrUn_star"]
        for k in ("tid", "don", "acc", "strand", "motif", "is_anno",
                  "uniq_c", "multi_c", "max_over"):
            np.testing.assert_array_equal(
                getattr(t, k if k != "is_anno" else "is_anno"), cols[k],
                err_msg=f"column {k}")
        # gtf.c:441 is_rev mapping: ONLY strand==1 ('+') gives is_rev=0;
        # strand 0 (undefined) and 2 ('-') both map to is_rev=1
        np.testing.assert_array_equal(
            cols["is_rev"], (cols["strand"] != 1).astype(np.int32))
        # sorted by (tid, don, acc) — gtf.c:414-419,447
        key = list(zip(cols["tid"].tolist(), cols["don"].tolist(),
                       cols["acc"].tolist()))
        assert key == sorted(key)
    finally:
        o.lib.o_free_sj(ptr)


def test_bitfield_width_truncation_documented(tmp_path):
    """sj_t stores strand:2 / is_anno:2 / motif:3 as bitfields (gtf.h:25-28),
    so out-of-range file values truncate to the low bits in the reference;
    our SoA table keeps int8.  Nothing downstream consumes these columns
    (check_short_sj1 reads only uniq_c/multi_c), so the divergence is
    unreachable — this test pins the reference truncation itself."""
    o = _oracle_or_skip()
    p = tmp_path / "odd.tab"
    p.write_text("chr1\t10\t20\t5\t9\t6\t1\t1\t0\n")   # strand 5, motif 9, anno 6
    ptr, cols, _ = o.read_sj_file(str(p), HDR_CHRS)
    try:
        assert int(cols["strand"][0]) == 5 & 0x3       # 1
        assert int(cols["motif"][0]) == 9 & 0x7        # 1
        assert int(cols["is_anno"][0]) == 6 & 0x3      # 2
        t = read_sj_group(str(p), ChrNames(list(HDR_CHRS)))
        assert (int(t.strand[0]), int(t.motif[0]), int(t.is_anno[0])) == (5, 9, 6)
    finally:
        o.lib.o_free_sj(ptr)


def _decide_ours(tid, starts, ends, novel, tab, min_cnt, use_multi,
                 ss_dis, ref_compat):
    bT = Transcripts()
    bT.append(tid, False, starts, ends,
              novel_junction_flag=np.asarray(novel, np.uint8))
    ugp = UpdateGtfParams(min_sj_cnt=min_cnt, use_multi=bool(use_multi),
                          ss_dis=ss_dis, ref_acceptor_compat=ref_compat)
    got, _ = cl.check_with_short_sj(bT, 0, tab, 0, ugp)
    unrel = bT.unreliable_junction_flag[0, : len(starts) - 1].copy()
    # the batched native twin must agree record-for-record
    bT2 = Transcripts()
    bT2.append(tid, False, starts, ends,
               novel_junction_flag=np.asarray(novel, np.uint8))
    batched = cl.sj_check_batch(bT2, np.array([0]), tab, ugp)
    if batched is not None:
        assert bool(batched[0]) == bool(got)
        np.testing.assert_array_equal(
            bT2.unreliable_junction_flag[0, : len(starts) - 1], unrel)
    return bool(got), unrel


def _decide_oracle(o, sj_ptr, sj_n, tid, starts, ends, novel, min_cnt,
                   use_multi, ss_dis):
    t = o.read_trans(tid, starts, ends)
    t.set_novel(junction=np.asarray(novel, np.uint8))
    ugp = o.ugp(min_sj_cnt=min_cnt, use_multi=use_multi, ss_dis=ss_dis)
    cur = np.zeros(1, np.int32)
    want = o.lib.o_check_with_short_sj(
        t.ptr, sj_ptr, sj_n, cur.ctypes.data_as(ctypes.c_void_p), ugp)
    unrel = t.novel()["unreliable"].astype(np.uint8)
    o.lib.o_free_ugp(ugp)
    t.free()
    return bool(want), unrel


# (name, tid, exon starts, exon ends, novel-junction flags, expectations)
# junction j spans intron [ends[j]+1, starts[j+1]-1]
CASES = [
    # intron 500..900 == the strand-0 MULTI-only row (uniq 0, multi 7):
    # unsupported without -M at any min_cnt; with -M supported up to cnt 7
    ("multi_only", 0, [300, 901], [499, 1000], [1]),
    # intron 1500..2600 == annotated uniq-only row (uniq 2): supported at
    # min_cnt<=2 regardless of use_multi; annotated flag must NOT matter
    ("uniq_boundary", 0, [1300, 2601], [1499, 2700], [1]),
    # two junctions: one supported (3000..4000, uniq+multi=2), one absent
    ("mixed_two_junc", 0, [2800, 4001, 6000], [2999, 5000, 6100], [1, 1]),
    # non-novel junctions are never checked (sj_map gate, update_gtf.c:700-703)
    ("known_junction_skipped", 0, [2800, 9001], [2999, 9100], [0]),
    # off by exactly ss_dis on both sides of the 700..800 row
    ("ss_dis_window", 0, [500, 803], [696, 900], [1]),
    # chr2 read against the huge-count AT/AC row (intron 100..200)
    ("chr2_huge_counts", 1, [50, 201], [99, 300], [1]),
    # read entirely past every chr2 row: scan runs off the table => 0
    ("off_table_end", 1, [5000, 7001], [6000, 8000], [1]),
    # read on chr1 before every chr1 row with don >= end early-exit => 0
    ("before_window", 0, [10, 101], [49, 200], [1]),
]


def test_decisions_match_reference_all_modes(sj_file):
    """Every fixture case x min_sj_cnt x use_multi x ss_dis x BOTH oracle
    variants; our side additionally under both ref-compat modes."""
    cname = ChrNames(list(HDR_CHRS))
    tab = read_sj_group(sj_file, cname)
    for variant in ("exact", "fixed"):
        o = _oracle_or_skip(variant)
        sj_ptr, cols, _ = o.read_sj_file(sj_file, HDR_CHRS)
        sj_n = len(cols["tid"])
        try:
            for name, tid, ss, ee, nj in CASES:
                for min_cnt in (1, 2, 3, 8):
                    for use_multi in (0, 1):
                        for ss_dis in (0, 3):
                            want, w_unrel = _decide_oracle(
                                o, sj_ptr, sj_n, tid, ss, ee, nj,
                                min_cnt, use_multi, ss_dis)
                            for rc in (False, True):
                                got, g_unrel = _decide_ours(
                                    tid, ss, ee, nj, tab, min_cnt,
                                    use_multi, ss_dis, rc)
                                ctx = (f"{variant}/{name} J={min_cnt} "
                                       f"M={use_multi} d={ss_dis} rc={rc}")
                                assert got == want, ctx
                                np.testing.assert_array_equal(
                                    g_unrel, w_unrel, err_msg=ctx)
        finally:
            o.lib.o_free_sj(sj_ptr)


def test_ignored_columns_do_not_gate(sj_file, tmp_path):
    """motif, annotated-flag and max_over are carried but IGNORED by the
    short-SJ gate (check_short_sj1 reads only uniq_c/multi_c +
    use_multi) — flipping them must not change any decision."""
    o = _oracle_or_skip()
    flipped = tmp_path / "flipped.tab"
    rows = [(c, d, a, s, (m + 3) % 7, 1 - an, u, mu, 0 if mo else 2 ** 31 - 1)
            for (c, d, a, s, m, an, u, mu, mo) in FIXTURE_ROWS]
    flipped.write_text("".join("\t".join(str(x) for x in r) + "\n"
                               for r in rows))
    cname = ChrNames(list(HDR_CHRS))
    tab0 = read_sj_group(sj_file, cname)
    tab1 = read_sj_group(str(flipped), ChrNames(list(HDR_CHRS)))
    p0, c0, _ = o.read_sj_file(sj_file, HDR_CHRS)
    p1, c1, _ = o.read_sj_file(str(flipped), HDR_CHRS)
    try:
        for name, tid, ss, ee, nj in CASES:
            for use_multi in (0, 1):
                a, au = _decide_oracle(o, p0, len(c0["tid"]), tid, ss, ee,
                                       nj, 2, use_multi, 0)
                b, bu = _decide_oracle(o, p1, len(c1["tid"]), tid, ss, ee,
                                       nj, 2, use_multi, 0)
                assert a == b and (au == bu).all(), name
                x, xu = _decide_ours(tid, ss, ee, nj, tab0, 2, use_multi,
                                     0, False)
                y, yu = _decide_ours(tid, ss, ee, nj, tab1, 2, use_multi,
                                     0, False)
                assert x == y == a, name
                np.testing.assert_array_equal(xu, yu)
    finally:
        o.lib.o_free_sj(p0)
        o.lib.o_free_sj(p1)
