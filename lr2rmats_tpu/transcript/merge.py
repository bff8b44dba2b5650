"""Order-dependent transcript merging/dedup.

merge_trans / merge_trans1 / merge_trans2 (reference update_gtf.c:98-163):
backward scan from the most recently kept transcript; identical multi-exon
chains merge (cov++, end extension); contained chains are absorbed;
single-exon pairs merge on overlap fraction.  The scan stops as soon as the
candidate starts past the kept transcript's end, so with coordinate-sorted
input it is amortized O(1) per call.

uniq_trans (reference unique_gtf.c:73-84) builds the cross-sample unique set.
"""

from __future__ import annotations

from .model import Transcripts


def merge_trans1(t: Transcripts, ti: int, T: Transcripts, Ti: int,
                 ss_dis: int, end_dis: int) -> bool:
    """Merge multi-exon t into kept T (reference update_gtf.c:98-119)."""
    from .classify import check_iden
    ret = check_iden(t, ti, T, Ti, ss_dis, end_dis)
    if ret == 0:  # fully identical: absorb, extend terminal exons
        T.cov[Ti] += 1
        i = int(t.exon_n[ti]) - 1
        j = int(T.exon_n[Ti]) - 1
        if t.exon_start[ti, 0] < T.exon_start[Ti, 0]:
            T.exon_start[Ti, 0] = t.exon_start[ti, 0]
            T.start[Ti] = t.exon_start[ti, 0]
        if t.exon_end[ti, i] > T.exon_end[Ti, j]:
            T.exon_end[Ti, j] = t.exon_end[ti, i]
            T.end[Ti] = t.exon_end[ti, i]
        return True
    if ret == 2:  # containment either way: keep T unchanged
        return True
    # ret == 1 (t fully contains T -> modify_read_trans) is unreachable:
    # see check_iden docstring.
    return False


def merge_trans2(t: Transcripts, ti: int, T: Transcripts, Ti: int,
                 end_dis: int, single_exon_ovlp_frac: float) -> bool:
    """Merge single-exon t into kept T (reference update_gtf.c:122-140)."""
    from .classify import exon_overlap_frac
    ts, te = int(t.exon_start[ti, 0]), int(t.exon_end[ti, 0])
    Ts, Te = int(T.exon_start[Ti, 0]), int(T.exon_end[Ti, 0])
    if abs(ts - Ts) > end_dis or abs(te - Te) > end_dis:
        return False
    if exon_overlap_frac(ts, te, Ts, Te) >= single_exon_ovlp_frac:
        T.cov[Ti] += 1
        if ts < Ts:
            T.exon_start[Ti, 0] = ts
            T.start[Ti] = ts
        if te > Te:
            T.exon_end[Ti, 0] = te
            T.end[Ti] = te
        return True
    return False


def merge_trans(t: Transcripts, ti: int, T: Transcripts, force_strand: bool,
                ss_dis: int, end_dis: int, single_exon_ovlp_frac: float) -> bool:
    """Backward scan merge (reference update_gtf.c:144-163).

    Returns True if t was merged into an existing member of T.
    """
    tn = int(t.exon_n[ti])
    for i in range(T.n - 1, -1, -1):
        if t.tid[ti] > T.tid[i] or t.start[ti] > T.end[i]:
            return False
        if force_strand and t.is_rev[ti] != T.is_rev[i]:
            continue
        Tn = int(T.exon_n[i])
        if tn == 1 and Tn == 1:
            if merge_trans2(t, ti, T, i, end_dis, single_exon_ovlp_frac):
                return True
        elif tn > 1 and Tn > 1:
            if merge_trans1(t, ti, T, i, ss_dis, end_dis):
                return True
    return False


def uniq_trans(bam_T: Transcripts, uniq_T: Transcripts, shared_T: Transcripts,
               force_strand: bool, ss_dis: int, end_dis: int,
               single_exon_ovlp_frac: float) -> int:
    """Cross-sample dedup (reference uniq_trans, unique_gtf.c:73-84)."""
    for i in range(bam_T.n):
        if merge_trans(bam_T, i, uniq_T, force_strand, ss_dis, end_dis,
                       single_exon_ovlp_frac):
            shared_T.append_from(bam_T, i)
        else:
            uniq_T.append_from(bam_T, i)
    return uniq_T.n
