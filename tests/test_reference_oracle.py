"""Differential fuzz of the classification stack against the compiled
reference C (tests/reforacle.py builds /root/reference/src verbatim into a
shared library — nothing is hand-derived here).

Two oracle variants are exercised:

  exact  — the reference bit-for-bit, matched by the repo with
           UpdateGtfParams(ref_acceptor_compat=True)
  fixed  — the reference with ONLY the acceptor off-by-one at
           update_gtf.c:746 corrected, matched by the repo defaults

so both the documented deviation and the compat mode are machine-checked.
Covered reference functions: check_iden (gtf.c:54-92), check_splice_site
(update_gtf.c:717-779), check_full/set_full (629-696), merge_trans
(98-163), check_short_sj/check_with_short_sj (589-709), split_trans
(837-913) and the full check_trans driver (936-965).
"""

from __future__ import annotations

import numpy as np
import pytest

import reforacle

from lr2rmats_tpu.io.sam import AlnRec
from lr2rmats_tpu.io.sj import SJTable
from lr2rmats_tpu.junctions import bam2sj as b2s
from lr2rmats_tpu.transcript import classify as cl
from lr2rmats_tpu.transcript import exon_chain, fusion
from lr2rmats_tpu.transcript.merge import merge_trans
from lr2rmats_tpu.transcript.model import Transcripts, UpdateGtfParams

# skip ONLY when the environment genuinely lacks the pieces; an oracle
# COMPILE failure must fail these tests loudly, not silently skip them
# (get_oracle propagates CalledProcessError)
import shutil as _shutil

pytestmark = pytest.mark.skipif(
    not reforacle.REF_SRC.is_dir() or _shutil.which("gcc") is None,
    reason="reference checkout or C compiler unavailable")

VARIANTS = [("exact", True), ("fixed", False)]


# --------------------------------------------------------------- generators

def _chain(rng, max_exons=6, base=1000):
    n = int(rng.integers(1, max_exons + 1))
    pos = base + int(rng.integers(0, 500))
    starts, ends = [], []
    for _ in range(n):
        elen = int(rng.integers(10, 300))
        starts.append(pos)
        ends.append(pos + elen)
        pos += elen + int(rng.integers(20, 1500))
    return starts, ends


def _perturb(rng, starts, ends):
    """Derive a read-like chain from an annotation chain."""
    s, e = list(starts), list(ends)
    n = len(s)
    kind = int(rng.integers(0, 6))
    if kind == 0:                      # exact copy
        pass
    elif kind == 1:                    # end wobble
        s[0] = max(1, s[0] + int(rng.integers(-40, 40)))
        e[-1] += int(rng.integers(-40, 40))
        if e[-1] <= s[-1]:
            e[-1] = s[-1] + 5
        if n > 1 and s[0] >= e[0]:
            s[0] = e[0] - 5
    elif kind == 2 and n >= 3:         # exon skip
        k = int(rng.integers(1, n - 1))
        del s[k], e[k]
    elif kind == 3 and n >= 3:         # sub-chain (containment)
        lo = int(rng.integers(0, n - 2))
        hi = int(rng.integers(lo + 1, n))
        s, e = s[lo: hi + 1], e[lo: hi + 1]
    elif kind == 4 and n >= 2:         # shift one splice site
        j = int(rng.integers(0, n - 1))
        d = int(rng.integers(1, 5)) * (1 if rng.integers(0, 2) else -1)
        if rng.integers(0, 2):
            e[j] = max(s[j] + 1, e[j] + d)
        else:
            s[j + 1] = min(e[j + 1] - 1, max(e[j] + 2, s[j + 1] + d))
    else:                              # novel exon inserted in an intron
        if n >= 2:
            j = int(rng.integers(0, n - 1))
            gap = s[j + 1] - e[j]
            if gap > 60:
                ns = e[j] + gap // 3
                ne = ns + min(20, gap // 4)
                s.insert(j + 1, ns)
                e.insert(j + 1, ne)
    return s, e


def _scene(rng, n_anno=5, n_reads=10):
    """Random annotation set + derived/novel reads + SJ table."""
    annos = []
    base = 100
    for _ in range(n_anno):
        tid = int(rng.integers(0, 2))
        st, en = _chain(rng, base=base)
        annos.append((tid, st, en, int(rng.integers(0, 2))))
        base += int(rng.integers(0, 4000))
    annos.sort(key=lambda a: (a[0], a[1][0], a[2][-1]))

    reads = []
    for ri in range(n_reads):
        if rng.random() < 0.8 and annos:
            tid, st, en, _rev = annos[int(rng.integers(0, len(annos)))]
            s, e = _perturb(rng, st, en)
        else:
            tid = int(rng.integers(0, 2))
            s, e = _chain(rng, base=int(rng.integers(100, 8000)))
        reads.append((tid, s, e))
    reads.sort(key=lambda r: (r[0], r[1][0], r[2][-1]))

    # SJ table: junctions of annos + reads, randomly included, plus decoys
    sj_rows = set()
    for tid, st, en, *_ in [a[:3] + (0,) for a in annos] + reads:
        for j in range(len(st) - 1):
            if rng.random() < 0.6:
                sj_rows.add((tid, en[j] + 1, st[j + 1] - 1,
                             int(rng.integers(0, 4)), int(rng.integers(0, 4))))
    for _ in range(3):
        sj_rows.add((int(rng.integers(0, 2)), int(rng.integers(100, 9000)),
                     int(rng.integers(9000, 12000)), 1, 1))
    sj = sorted(sj_rows)
    return annos, reads, sj


def _mk_repo_sets(annos, reads):
    anno_T = Transcripts()
    for i, (tid, st, en, rev) in enumerate(annos):
        anno_T.append(tid, bool(rev), st, en, gene_id=f"G{i}",
                      gene_name=f"G{i}", trans_id="anno", trans_name="anno",
                      init_novel=False)
    bam_T = Transcripts()
    for i, (tid, st, en) in enumerate(reads):
        bam_T.append(tid, False, st, en, trans_id=f"r{i}", trans_name=f"r{i}",
                     init_novel=True)
    return anno_T, bam_T


def _mk_oracle_sets(o, annos, reads):
    anno_T = o.trans_set(anno=True)
    keep = []
    for i, (tid, st, en, rev) in enumerate(annos):
        t = o.anno_trans(tid, st, en, is_rev=rev, gene_id=f"G{i}",
                         gene_name=f"G{i}")
        anno_T.add(t)
        keep.append(t)
    bam_T = o.trans_set()
    for i, (tid, st, en) in enumerate(reads):
        t = o.read_trans(tid, st, en, name=f"r{i}")
        bam_T.add(t)
        keep.append(t)
    for t in keep:
        t.free()
    return anno_T, bam_T


def _mk_sj(o, sj_rows):
    a = np.asarray(sorted(sj_rows), np.int32).reshape(-1, 5)
    ptr, n = o.sj_table(a[:, 0], a[:, 1], a[:, 2], a[:, 3], a[:, 4])
    tab = SJTable(tid=a[:, 0].copy(), don=a[:, 1].copy(), acc=a[:, 2].copy(),
                  strand=np.zeros(len(a), np.int8),
                  motif=np.zeros(len(a), np.int8),
                  is_anno=np.zeros(len(a), np.int8),
                  uniq_c=a[:, 3].copy(), multi_c=a[:, 4].copy())
    return ptr, n, tab


# ------------------------------------------------------------- comparisons

def _assert_trans_match(ot, rT, ri, ctx, skip_header=False):
    os_, oe = ot.exons()
    rs, re = rT.exons(ri)
    assert ot.exon_n == int(rT.exon_n[ri]), ctx
    np.testing.assert_array_equal(os_, rs, err_msg=ctx)
    np.testing.assert_array_equal(oe, re, err_msg=ctx)
    assert ot.cov == int(rT.cov[ri]), ctx
    if not skip_header:
        assert ot.tid == int(rT.tid[ri]), ctx
        assert ot.is_rev == int(rT.is_rev[ri]), ctx


def _assert_state_match(ot, rT, ri, ctx, fields=None):
    st = ot.state()
    for k in (fields or reforacle.STATE_FIELDS):
        if k == "partial_read":
            rv = bool(rT.flags["partial_read"][ri]) \
                if "partial_read" in rT.flags else False
            assert bool(st[k]) == rv, f"{ctx}: {k}"
        else:
            assert bool(st[k]) == bool(rT.flags[k][ri]), f"{ctx}: {k}"


def _assert_novel_match(ot, rT, ri, ctx):
    nv = ot.novel()
    n = ot.exon_n
    np.testing.assert_array_equal(nv["exon"], rT.novel_exon_flag[ri, :n],
                                  err_msg=ctx)
    if n > 1:
        np.testing.assert_array_equal(
            nv["site"], rT.novel_site_flag[ri, : (n - 1) * 2], err_msg=ctx)
        np.testing.assert_array_equal(
            nv["junction"], rT.novel_junction_flag[ri, : n - 1], err_msg=ctx)
        np.testing.assert_array_equal(
            nv["unreliable"], rT.unreliable_junction_flag[ri, : n - 1],
            err_msg=ctx)


# ------------------------------------------------------------- unit fuzzes

def test_check_iden_fuzz():
    o = reforacle.get_oracle("exact")
    rng = np.random.default_rng(7)
    for it in range(600):
        tid = 0
        s1, e1 = _chain(rng)
        if rng.random() < 0.5:
            s2, e2 = _perturb(rng, s1, e1)
        else:
            s2, e2 = _chain(rng)
        ss_dis = int(rng.integers(0, 3))
        end_dis = [0, 5, 0x7FFFFFFF][int(rng.integers(0, 3))]
        t1 = o.read_trans(tid, s1, e1)
        t2 = o.read_trans(tid, s2, e2)
        want = o.lib.o_check_iden(t1.ptr, t2.ptr, ss_dis, end_dis)
        t1.free(); t2.free()
        # reference precondition: merge_trans only calls check_iden for
        # (multi,multi) or via merge_trans2 for (single,single); the repo
        # guards the single-exon containment read explicitly
        if min(len(s1), len(s2)) < 2 and len(s1) != len(s2):
            continue
        T = Transcripts()
        T.append(tid, False, s1, e1)
        T.append(tid, False, s2, e2)
        got_native = cl.check_iden(T, 0, T, 1, ss_dis, end_dis)
        got_np = cl.check_iden_np(T, 0, T, 1, ss_dis, end_dis)
        assert got_native == want and got_np == want, \
            f"iter {it}: {s1},{e1} vs {s2},{e2} dis={ss_dis},{end_dis} " \
            f"want {want} native {got_native} np {got_np}"


@pytest.mark.parametrize("variant,compat", VARIANTS)
def test_check_splice_site_fuzz(variant, compat):
    o = reforacle.get_oracle(variant)
    rng = np.random.default_rng(11)
    for it in range(600):
        sa, ea = _chain(rng)
        if rng.random() < 0.7:
            sb, eb = _perturb(rng, sa, ea)
        else:
            sb, eb = _chain(rng)
        if len(sa) < 2 or len(sb) < 2:
            continue  # caller guards multi-exon (update_gtf.c:812)
        dis = int(rng.integers(0, 3))
        bam = o.read_trans(0, sb, eb)
        anno = o.anno_trans(0, sa, ea)
        want = o.lib.o_check_splice_site(bam.ptr, anno.ptr, dis)

        for path in ("native", "np"):
            bT = Transcripts()
            bT.append(0, False, sb, eb)
            aT = Transcripts()
            aT.append(0, False, sa, ea, init_novel=False)
            if path == "native":
                got = cl.check_splice_site(bT, 0, aT, 0, dis, compat)
            else:
                got = cl.check_splice_site_np(bT, 0, aT, 0, dis, compat)
            ctx = f"iter {it} path {path} variant {variant}"
            assert got == want, \
                f"{ctx}: bam {sb},{eb} anno {sa},{ea} dis {dis} " \
                f"want {want} got {got}"
            _assert_novel_match(bam, bT, 0, ctx)
            st = bam.state()
            assert bool(st["known"]) == bool(bT.flags["known"][0]), ctx
            assert bool(st["has_known_site"]) == \
                bool(bT.flags["has_known_site"][0]), ctx
        bam.free(); anno.free()


def test_check_full_set_full_fuzz():
    o = reforacle.get_oracle("exact")
    rng = np.random.default_rng(13)
    for it in range(400):
        sb, eb = _chain(rng)
        level = int(rng.integers(1, 6))
        bam = o.read_trans(0, sb, eb)
        bT = Transcripts()
        bT.append(0, False, sb, eb)
        for _ in range(int(rng.integers(1, 4))):  # accumulate over annos
            sa, ea = (_perturb(rng, sb, eb) if rng.random() < 0.6
                      else _chain(rng))
            anno = o.anno_trans(0, sa, ea)
            aT = Transcripts()
            aT.append(0, False, sa, ea, init_novel=False)
            o.lib.o_check_full(bam.ptr, anno.ptr, level)
            cl.check_full(bT, 0, aT, 0, level)
            anno.free()
        o.lib.o_set_full(bam.ptr, level)
        cl.set_full(bT, 0, level)
        _assert_state_match(bam, bT, 0, f"iter {it} level {level}",
                            fields=["full", "lfull", "lnoth", "rfull",
                                    "rnoth"])
        bam.free()


def test_merge_trans_fuzz():
    o = reforacle.get_oracle("exact")
    rng = np.random.default_rng(17)
    for it in range(200):
        ss_dis = int(rng.integers(0, 2))
        end_dis = [5, 0x7FFFFFFF][int(rng.integers(0, 2))]
        frac = 0.80
        base_s, base_e = _chain(rng)
        oT = o.trans_set()
        rT = Transcripts()
        kept_o = []
        for k in range(8):
            if rng.random() < 0.6:
                s, e = _perturb(rng, base_s, base_e)
            else:
                s, e = _chain(rng)
            t = o.read_trans(0, s, e, name=f"m{k}")
            if not o.lib.o_merge_trans(t.ptr, oT.ptr, 0, ss_dis, end_dis,
                                       frac):
                oT.add(t)
            t.free()
            cT = Transcripts()
            ci = cT.append(0, False, s, e, trans_id=f"m{k}",
                           trans_name=f"m{k}")
            if not merge_trans(cT, ci, rT, False, ss_dis, end_dis, frac):
                rT.append_from(cT, ci)
        assert oT.n == rT.n, f"iter {it}: kept {oT.n} vs {rT.n}"
        for k in range(oT.n):
            _assert_trans_match(oT[k], rT, k, f"iter {it} kept {k}")
        oT.free()


def test_check_with_short_sj_fuzz():
    o = reforacle.get_oracle("exact")
    rng = np.random.default_rng(19)
    for it in range(300):
        s, e = _chain(rng)
        if len(s) < 2:
            continue
        nj = rng.integers(0, 2, size=len(s) - 1).astype(np.uint8)
        sj_rows = []
        for j in range(len(s) - 1):
            if rng.random() < 0.7:
                sj_rows.append((0, e[j] + 1, s[j + 1] - 1,
                                int(rng.integers(0, 3)),
                                int(rng.integers(0, 3))))
        sj_rows.append((0, 50, 60, 5, 5))
        sj_rows.append((1, 100, 200, 5, 5))
        min_cnt = int(rng.integers(1, 3))
        use_multi = int(rng.integers(0, 2))

        bam = o.read_trans(0, s, e)
        bam.set_novel(junction=nj)
        ptr, n, tab = _mk_sj(o, sj_rows)
        ugp = o.ugp(min_sj_cnt=min_cnt, use_multi=use_multi)
        cur = np.zeros(1, np.int32)
        want = o.lib.o_check_with_short_sj(
            bam.ptr, ptr, n, cur.ctypes.data_as(__import__("ctypes").c_void_p),
            ugp)
        o.lib.o_free_ugp(ugp)

        bT = Transcripts()
        bT.append(0, False, s, e, novel_junction_flag=nj)
        rugp = UpdateGtfParams(min_sj_cnt=min_cnt, use_multi=bool(use_multi))
        got, _ = cl.check_with_short_sj(bT, 0, tab, 0, rugp)
        ctx = f"iter {it}"
        assert bool(want) == bool(got), \
            f"{ctx}: {s},{e} nj={nj} sj={sorted(sj_rows)} want {want} got {got}"
        _assert_novel_match(bam, bT, 0, ctx)
        _assert_state_match(bam, bT, 0, ctx,
                            fields=["has_unreliable_junction"])
        # batched native path over a single read
        bT2 = Transcripts()
        bT2.append(0, False, s, e, novel_junction_flag=nj)
        got2 = cl.sj_check_batch(bT2, np.array([0]), tab, rugp)
        if got2 is not None:
            assert bool(got2[0]) == bool(want), ctx
            _assert_novel_match(bam, bT2, 0, ctx + " batched")
        o.lib.o_free_sj(ptr)
        bam.free()


def test_split_trans_fuzz():
    o = reforacle.get_oracle("exact")
    rng = np.random.default_rng(23)
    for it in range(300):
        s, e = _chain(rng)
        if len(s) < 3:
            continue
        nj = rng.integers(0, 2, size=len(s) - 1).astype(np.uint8)
        urj = rng.integers(0, 2, size=len(s) - 1).astype(np.uint8)
        bam = o.read_trans(0, s, e, name=f"x{it}")
        bam.set_novel(junction=nj, unreliable=urj)
        out = reforacle.TransSet(o)
        out.ptr = o.lib.o_split_trans(bam.ptr)

        bT = Transcripts()
        bT.append(0, False, s, e, trans_id=f"x{it}", trans_name=f"x{it}",
                  novel_junction_flag=nj, unreliable_junction_flag=urj)
        got = cl.split_trans(bT, 0)
        assert out.n == got.n, f"iter {it}: {out.n} vs {got.n}"
        for k in range(out.n):
            ctx = f"iter {it} frag {k}"
            _assert_trans_match(out[k], got, k, ctx)
            _assert_novel_match(out[k], got, k, ctx)
            assert out[k].trans_id == got.trans_id[k], ctx
        out.free()
        bam.free()


# ----------------------------------------------------- full-driver fuzzing

@pytest.mark.parametrize("variant,compat", VARIANTS)
def test_check_trans_scene_fuzz(variant, compat):
    o = reforacle.get_oracle(variant)
    rng = np.random.default_rng(29 if compat else 31)
    for scene_i in range(150):
        annos, reads, sj_rows = _scene(rng)
        full_level = [1, 2, 3, 5][int(rng.integers(0, 4))]
        ss_dis = int(rng.integers(0, 2))
        split = int(rng.integers(0, 2))
        min_cnt = int(rng.integers(1, 3))
        use_sj = rng.random() < 0.8

        # oracle
        oanno, obam = _mk_oracle_sets(o, annos, reads)
        if use_sj and sj_rows:
            sj_ptr, sj_n, tab = _mk_sj(o, sj_rows)
        else:
            sj_ptr, sj_n = None, 0
            tab = SJTable()
        ugp = o.ugp(min_sj_cnt=min_cnt, ss_dis=ss_dis,
                    full_level=full_level, split_trans=split)
        o_upd, o_known, o_novel, o_unrec = (o.trans_set() for _ in range(4))
        o.lib.o_check_trans(obam.ptr, oanno.ptr, sj_ptr, sj_n, o_upd.ptr,
                            o_known.ptr, o_novel.ptr, o_unrec.ptr, ugp)
        o.lib.o_free_ugp(ugp)

        # repo (production path: native batched sweep when available)
        anno_T, bam_T = _mk_repo_sets(annos, reads)
        rugp = UpdateGtfParams(min_sj_cnt=min_cnt, ss_dis=ss_dis,
                               full_level=full_level,
                               split_trans=bool(split),
                               ref_acceptor_compat=compat)
        r_upd, r_known, r_novel, r_unrec = (Transcripts() for _ in range(4))
        cl.check_trans(bam_T, anno_T, tab, rugp, r_upd, r_known, r_novel,
                       r_unrec)

        ctx0 = f"scene {scene_i} variant {variant} level {full_level} " \
               f"dis {ss_dis} split {split} sj {use_sj}"
        # per-read final state
        for ri in range(obam.n):
            ot = obam[ri]
            ctx = f"{ctx0} read {ri}"
            _assert_state_match(ot, bam_T, ri, ctx)
            _assert_novel_match(ot, bam_T, ri, ctx)
            assert ot.gene_id == bam_T.gene_id[ri], ctx
            assert ot.is_rev == int(bam_T.is_rev[ri]), ctx
        # output sets.  Documented deviation (ARCHITECTURE.md §5): the
        # reference leaves split fragments' transcript headers calloc-zero,
        # which (a) zeroes tid/start/end/is_rev on novel_T fragment entries
        # and (b) turns each fragment in updated_T into a permanent merge
        # barrier.  In exact mode we therefore skip fragment headers and —
        # when -s is on — the updated_T comparison; the fixed oracle
        # (= reference + the two documented patches) is compared strictly.
        for name, oset, rset in (("updated", o_upd, r_upd),
                                 ("known", o_known, r_known),
                                 ("novel", o_novel, r_novel),
                                 ("unrecog", o_unrec, r_unrec)):
            ctx = f"{ctx0} set {name}"
            if compat and split and name == "updated":
                continue
            assert oset.n == rset.n, f"{ctx}: {oset.n} vs {rset.n}"
            for k in range(oset.n):
                frag = compat and bool(oset[k].state()["partial_read"])
                _assert_trans_match(oset[k], rset, k, f"{ctx} entry {k}",
                                    skip_header=frag)
                assert oset[k].trans_id == rset.trans_id[k], f"{ctx} entry {k}"
                assert oset[k].gene_id == rset.gene_id[k], f"{ctx} entry {k}"
        for h in (o_upd, o_known, o_novel, o_unrec, obam):
            h.free()
        oanno.free()
        if sj_ptr is not None:
            o.lib.o_free_sj(sj_ptr)


# ------------------------------------------------ the adjudicated deviation

def test_acceptor_divergence_adjudicated():
    """The documented deliberate deviation (ARCHITECTURE.md §5): a perfect
    multi-exon match is `known` under repo defaults, but `has_known_site`
    (novel) under exact reference semantics, where the last acceptor can
    never be matched (update_gtf.c:746) and the first junction's acceptor
    flag (index 1) stays novel.  Both modes are pinned to their oracles."""
    starts, ends = [100, 300, 500], [200, 400, 600]

    for variant, compat in VARIANTS:
        o = reforacle.get_oracle(variant)
        bam = o.read_trans(0, starts, ends)
        anno = o.anno_trans(0, starts, ends)
        want = o.lib.o_check_splice_site(bam.ptr, anno.ptr, 0)
        wnovel = bam.novel()

        bT = Transcripts()
        bT.append(0, False, starts, ends)
        aT = Transcripts()
        aT.append(0, False, starts, ends, init_novel=False)
        got = cl.check_splice_site(bT, 0, aT, 0, 0, compat)
        assert got == want == (2 if compat else 1)
        np.testing.assert_array_equal(bT.novel_site_flag[0, :4],
                                      wnovel["site"])
        if compat:  # the reference leaves the FIRST acceptor flagged novel
            assert list(wnovel["site"]) == [0, 1, 0, 0]
        else:
            assert list(wnovel["site"]) == [0, 0, 0, 0]
        bam.free(); anno.free()


def test_split_fragment_header_quirk_adjudicated():
    """Documented deviation #2 (ARCHITECTURE.md §5): reference split_trans
    never fills the fragment transcript header — tid/start/end/is_rev stay
    calloc-zero (update_gtf.c:843-855) — so fragment transcript lines print
    as 'chr<tid0> 0 0 +' and fragments block later updated_T merges.  The
    repo gives fragments their true header; the fixed oracle (reference +
    set_trans_name on fragments) is pinned to the repo bit-for-bit by
    test_check_trans_scene_fuzz[fixed-False]."""
    starts, ends = [100, 300, 500, 700, 900], [200, 400, 600, 800, 1000]
    # junction 1 is novel+unreliable -> cut there; both halves keep one
    # known and one novel junction, so two fragments are emitted
    nj = np.array([0, 1, 0, 1], np.uint8)
    urj = np.array([0, 1, 0, 0], np.uint8)

    for variant in ("exact", "fixed"):
        o = reforacle.get_oracle(variant)
        bam = o.read_trans(1, starts, ends, name="q")
        bam.set_novel(junction=nj, unreliable=urj)
        out = reforacle.TransSet(o)
        out.ptr = o.lib.o_split_trans(bam.ptr)
        assert out.n == 2
        frag = out[0]
        if variant == "exact":
            assert (frag.tid, frag.start, frag.end, frag.is_rev) == (0, 0, 0, 0)
        else:
            assert (frag.tid, frag.start, frag.end) == (1, 100, 400)
        out.free(); bam.free()

    bT = Transcripts()
    bT.append(1, False, starts, ends, trans_id="q", trans_name="q",
              novel_junction_flag=nj, unreliable_junction_flag=urj)
    got = cl.split_trans(bT, 0)
    assert got.n == 2
    assert (int(got.tid[0]), int(got.start[0]), int(got.end[0])) == (1, 100, 400)


# --------------------------------------- bam2gtf / bam2sj / fusion oracles

def _rand_cigar(rng, clips=True):
    ops = []
    if clips and rng.random() < 0.3:
        ops.append(("S", int(rng.integers(1, 50))))
    n_blocks = int(rng.integers(1, 6))
    for b in range(n_blocks):
        if b > 0:
            k = rng.random()
            if k < 0.5:
                ops.append(("N", int(rng.integers(1, 200))))
            elif k < 0.8:
                ops.append(("D", int(rng.integers(1, 120))))
            else:
                ops.append(("I", int(rng.integers(1, 20))))
        ops.append(("M", int(rng.integers(1, 120))))
    if clips and rng.random() < 0.3:
        ops.append(("S", int(rng.integers(1, 50))))
    return ops


def test_gen_exons_fuzz():
    """CIGAR -> exon chain vs reference gen_trans/gen_exon
    (bam2gtf.c:31-87), incl. XS-tag strand adoption."""
    o = reforacle.get_oracle("exact")
    rng = np.random.default_rng(37)
    for it in range(500):
        ops = _rand_cigar(rng)
        pos0 = int(rng.integers(0, 500))
        flag = 16 if rng.random() < 0.5 else 0
        xs = ["", "+", "-"][int(rng.integers(0, 3))]
        me, mi, md = (int(rng.integers(1, 10)), int(rng.integers(1, 30)),
                      int(rng.integers(10, 120)))
        b = o.mk_bam(0, pos0, flag, ops, xs=xs)
        ot = o.gen_trans(b, exon_min=me, intron_len=mi, deletion_max=md)
        os_, oe = ot.exons()
        ot.free(); o.lib.o_free_bam(b)

        tags = {"XS": xs} if xs else {}
        rec = AlnRec(qname="q", flag=flag, tid=0, pos=pos0,
                     cigar=reforacle.Oracle.pack_cigar(ops), tags=tags)
        rs, re, is_rev = exon_chain.gen_exons(rec, me, mi, md)
        ctx = f"iter {it}: {ops} pos {pos0} me={me} mi={mi} md={md} xs={xs!r}"
        np.testing.assert_array_equal(os_, rs, err_msg=ctx)
        np.testing.assert_array_equal(oe, re, err_msg=ctx)
        want_rev = (xs != "+") if xs else bool(flag & 16)
        assert bool(is_rev) == want_rev, ctx


class _FakeGenome:
    """Duck-typed Genome: .get(tid) -> A=0 C=1 G=2 T=3 codes."""

    _LUT = np.full(256, 4, np.uint8)
    for _i, _c in enumerate(b"ACGT"):
        _LUT[_c] = _i

    def __init__(self, seqs):
        self.seqs = seqs
        self._codes = [self._LUT[np.frombuffer(s.encode(), np.uint8)]
                       for s in seqs]

    def get(self, tid):
        return self._codes[tid]


def _rand_genome(rng, n):
    return "".join("ACGT"[int(c)] for c in rng.integers(0, 4, size=n))


def test_intron_motif_fuzz():
    """Donor/acceptor motif table vs reference intr_deri_str
    (parse_bam.c:319-337), with planted canonical motifs."""
    o = reforacle.get_oracle("exact")
    rng = np.random.default_rng(41)
    motifs = ["GTAG", "CTAC", "GCAG", "CTGC", "ATAC", "GTAT"]
    for it in range(400):
        g = list(_rand_genome(rng, 300))
        start = int(rng.integers(1, 200))
        end = start + int(rng.integers(3, 80))
        if rng.random() < 0.7:  # plant a motif
            m = motifs[int(rng.integers(0, 6))]
            g[start - 1], g[start] = m[0], m[1]
            g[end - 2], g[end - 1] = m[2], m[3]
        gs = "".join(g)
        want_strand, want_motif = o.intr_deri_str([gs], 0, start, end)
        got_strand, got_motif = b2s.intron_motif_of(_FakeGenome([gs]), 0,
                                                    start, end)
        assert (want_strand, want_motif) == (got_strand, got_motif), \
            f"iter {it}: intron {start}-{end} {gs[start-1:start+1]}.." \
            f"{gs[end-2:end]} want {(want_strand, want_motif)} " \
            f"got {(got_strand, got_motif)}"


def test_bam2sj_stream_fuzz():
    """gen_sj + sj_update_group over a record stream vs the repo's
    bam2sj_records (reference parse_bam.c:353-442, 896-924).  The unmap/
    NH/proper-pair gates (bam2sj_core) are replicated record-wise here;
    junction extraction and table accumulation run through the compiled
    reference."""
    o = reforacle.get_oracle("exact")
    rng = np.random.default_rng(43)
    for it in range(60):
        genomes = [_rand_genome(rng, 3000), _rand_genome(rng, 3000)]
        fake = _FakeGenome(genomes)
        recs = []
        for _ in range(int(rng.integers(3, 20))):
            ops = _rand_cigar(rng)
            # bound ref extent to the genome
            rlen = sum(l for op, l in ops if op in "MDN")
            if rlen >= 2900:
                continue
            pos0 = int(rng.integers(0, 2900 - rlen))
            tid = int(rng.integers(0, 2))
            flag = (2 if rng.random() < 0.8 else 0) | \
                   (4 if rng.random() < 0.1 else 0)
            nh = 1 if rng.random() < 0.7 else 2
            recs.append((tid, pos0, flag, ops, nh))
        recs.sort(key=lambda r: (r[0], r[1]))

        # oracle: replicate bam2sj_core gating, junctions via compiled C
        rows = []
        for tid, pos0, flag, ops, nh in recs:
            if flag & 4:
                continue
            if not (flag & 2):  # read_type == PAIR_T default
                continue
            uniq = 1 if nh == 1 else 0
            for sj in o.gen_sj(uniq, tid, pos0 + 1, ops, genomes):
                rows.append((tid, sj["don"], sj["acc"], sj["strand"],
                             sj["motif"], sj["uniq_c"], sj["multi_c"]))
        want = o.sj_update_group(rows) if rows else []

        got = b2s.bam2sj_records(
            (AlnRec(qname="q", flag=flag, tid=tid, pos=pos0,
                    cigar=reforacle.Oracle.pack_cigar(ops),
                    tags={"NH": nh})
             for tid, pos0, flag, ops, nh in recs),
            fake, min_intron=3, require_proper_pair=True, use_multi=True)

        ctx = f"iter {it}"
        assert len(want) == got.n, f"{ctx}: {len(want)} vs {got.n}"
        for k, w in enumerate(want):
            for fld in ("tid", "don", "acc", "strand", "motif", "uniq_c",
                        "multi_c"):
                assert w[fld] == int(getattr(got, fld)[k]), \
                    f"{ctx} row {k} field {fld}: {w} vs repo"


def test_gtf_filter_fuzz():
    """Filter gates vs reference gtf_filter/remove_overlap
    (bam_filter.c:49-86): coverage (incl. the 0/0-NaN pass quirk),
    NM identity, deletion credit, intron count, rm-gtf overlap
    (0-based pos vs 1-based rm coords, faithful quirk)."""
    from lr2rmats_tpu.transcript.filter import FilterParams
    from lr2rmats_tpu.transcript.filter import gtf_filter as repo_gate
    o = reforacle.get_oracle("exact")
    rng = np.random.default_rng(59)

    # sorted rm set on two tids
    rm_chains = []
    base = 500
    for tid in (0, 1):
        for _ in range(3):
            s, e = _chain(rng, base=base)
            rm_chains.append((tid, s, e))
            base += 4000
    orm = o.trans_set(anno=True)
    keep = []
    for tid, s, e in rm_chains:
        t = o.anno_trans(tid, s, e)
        orm.add(t)
        keep.append(t)
    rrm = Transcripts()
    for tid, s, e in rm_chains:
        rrm.append(tid, False, s, e, init_novel=False)

    for it in range(500):
        ops = _rand_cigar(rng)
        qlen_cigar = sum(l for op, l in ops if op in "MIS")
        l_qseq = qlen_cigar if rng.random() < 0.8 else \
            max(qlen_cigar + int(rng.integers(-20, 50)), 0)
        pos0 = int(rng.integers(0, 30000))
        tid = int(rng.integers(0, 2))
        flag = 4 if rng.random() < 0.05 else 0
        nm = int(rng.integers(0, 60))
        cov = float(rng.choice([0.0, 0.5, 0.67, 0.9]))
        mq = float(rng.choice([0.5, 0.75, 0.9]))

        b = o.mk_bam(tid, pos0, flag, ops, nm=nm, l_qseq=l_qseq)
        want = o.gtf_filter(b, orm, cov, mq)
        o.lib.o_free_bam(b)

        rec = AlnRec(qname="q", flag=flag, tid=tid, pos=pos0,
                     cigar=reforacle.Oracle.pack_cigar(ops),
                     seq="A" * l_qseq if l_qseq else "*", tags={"NM": nm})
        got = repo_gate(rec, FilterParams(cov_rate=cov, map_qual=mq), rrm)
        ctx = f"iter {it}: {ops} pos {pos0} tid {tid} nm {nm} " \
              f"l_qseq {l_qseq} cov {cov} mq {mq}"
        assert want[0] == got[0], f"{ctx}: keep {want} vs {got}"
        if want[0]:
            assert want[1] == got[1], f"{ctx}: score {want} vs {got}"
            assert want[2] == got[2], f"{ctx}: intron_n {want} vs {got}"
    for t in keep:
        t.free()
    orm.free()


def test_uniq_trans_fuzz():
    """Cross-sample dedup vs reference uniq_trans (unique_gtf.c:73-84):
    uniq/shared membership, order, cov accumulation and end extension."""
    from lr2rmats_tpu.transcript.merge import uniq_trans
    o = reforacle.get_oracle("exact")
    rng = np.random.default_rng(53)
    for it in range(80):
        base_s, base_e = _chain(rng)
        cands = []
        for k in range(12):
            if rng.random() < 0.6:
                s, e = _perturb(rng, base_s, base_e)
            else:
                s, e = _chain(rng)
            cands.append((s, e))
        cands.sort(key=lambda c: (c[0][0], c[1][-1]))
        ss_dis = int(rng.integers(0, 2))
        end_dis = [5, 0x7FFFFFFF][int(rng.integers(0, 2))]
        force = int(rng.integers(0, 2))

        obam = o.trans_set()
        keep = []
        for k, (s, e) in enumerate(cands):
            t = o.read_trans(0, s, e, name=f"u{k}",
                             is_rev=int(rng.integers(0, 2)) if force else 0)
            obam.add(t)
            keep.append(t)
        ouniq, oshared = o.trans_set(), o.trans_set()
        ugp_frac = 0.80
        o.lib.o_uniq_trans(obam.ptr, ouniq.ptr, oshared.ptr, force, ss_dis,
                           end_dis, ugp_frac)

        rbam = Transcripts()
        for k, (s, e) in enumerate(cands):
            rbam.append(0, bool(obam[k].is_rev), s, e, trans_id=f"u{k}",
                        trans_name=f"u{k}")
        runiq, rshared = Transcripts(), Transcripts()
        uniq_trans(rbam, runiq, rshared, bool(force), ss_dis, end_dis,
                   ugp_frac)

        ctx0 = f"iter {it} dis={ss_dis},{end_dis} force={force}"
        for name, oset, rset in (("uniq", ouniq, runiq),
                                 ("shared", oshared, rshared)):
            ctx = f"{ctx0} {name}"
            assert oset.n == rset.n, f"{ctx}: {oset.n} vs {rset.n}"
            for k in range(oset.n):
                _assert_trans_match(oset[k], rset, k, f"{ctx} entry {k}")
                assert oset[k].trans_id == rset.trans_id[k], f"{ctx} entry {k}"
        for h in (ouniq, oshared, obam):
            h.free()
        for t in keep:
            t.free()


def test_check_fusion_fuzz():
    """Greedy fusion segment selection vs reference check_fusion /
    check_with_exist1 / bam_seg_cov (bam_fusion.c:67-129)."""
    o = reforacle.get_oracle("exact")
    rng = np.random.default_rng(47)
    for it in range(400):
        rlen = int(rng.integers(100, 1000))
        n = int(rng.integers(1, 7))
        segs = []
        keys = set()
        for _ in range(n):
            while True:
                score, ed = int(rng.integers(0, 500)), int(rng.integers(0, 40))
                if (score, ed) not in keys:  # qsort order must be unique
                    keys.add((score, ed))
                    break
            rs = int(rng.integers(1, rlen))
            re_ = int(rng.integers(rs, rlen + 1))
            fs = int(rng.integers(1, 100000))
            fe = fs + (re_ - rs)
            segs.append(dict(tid=int(rng.integers(0, 2)),
                             is_rev=int(rng.integers(0, 2)), score=score,
                             ed=ed, read_start=rs, read_end=re_,
                             ref_start=fs, ref_end=fe))
        p = fusion.FusionParams(ovlp_frac=0.34, each_cov=0.15, all_cov=0.75,
                                dis=int(rng.integers(1, 50000)))
        want_n, want_segs = o.check_fusion(
            segs, rlen, ovlp_frac=p.ovlp_frac, each_cov=p.each_cov,
            all_cov=p.all_cov, dis=p.dis)

        rsegs = [fusion.Seg(s["tid"], bool(s["is_rev"]), s["score"], s["ed"],
                            s["read_start"], s["read_end"], s["ref_start"],
                            s["ref_end"], None) for s in segs]
        got = fusion.check_fusion(rsegs, rlen, p)
        ctx = f"iter {it}: rlen={rlen} segs={segs} dis={p.dis}"
        if want_n < 0:
            assert got is None, ctx
        else:
            assert got is not None and len(got) == want_n, ctx
            for k in range(want_n):
                w, g = want_segs[k], got[k]
                assert (w["tid"], w["read_start"], w["read_end"],
                        w["ref_start"], w["ref_end"], w["score"], w["ed"]) == \
                    (g.tid, g.read_start, g.read_end, g.ref_start, g.ref_end,
                     g.score, g.ed), f"{ctx} pick {k}"
