"""Splice-point refinement between chain anchors.

Given a candidate intron between two anchor blocks, choose the query split
point j (and thus the donor/acceptor positions) maximizing
    matches(left prefix) + matches(right suffix) + motif_bonus
— prefix sums make the scan O(gap length) and fully vectorized.  Canonical
motifs considered: GT..AG ('+'), CT..AC ('-'), with smaller bonuses for
GC..AG / AT..AC (and their complements), mirroring the minimap2 splice
model's preference order.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

# donor/acceptor dinucleotide codes (A0 C1 G2 T3)
_GT = (2, 3)
_AG = (0, 2)
_CT = (1, 3)
_AC = (0, 1)
_GC = (2, 1)
_AT = (0, 3)

BONUS_CANON = 10.0   # GT..AG / CT..AC
BONUS_SEMI = 5.0     # GC..AG / AT..AC and complements


def _dinuc_eq(arr: np.ndarray, pos: np.ndarray, pair: Tuple[int, int]) -> np.ndarray:
    """arr[pos]==pair[0] and arr[pos+1]==pair[1] with bounds safety."""
    n = len(arr)
    ok = (pos >= 0) & (pos + 1 < n)
    a = np.where(ok, arr[np.clip(pos, 0, n - 1)], -1)
    b = np.where(ok, arr[np.clip(pos + 1, 0, n - 1)], -1)
    return (a == pair[0]) & (b == pair[1])


def refine_splice(q: np.ndarray, ref: np.ndarray, left_ref: int, right_ref: int
                  ) -> Tuple[int, float, int]:
    """Place the intron inside a gap region.

    q          : query gap codes (length m, may be 0)
    ref        : full reference chrom codes
    left_ref   : ref offset where the left flank resumes (0-based, first
                 unaligned ref base after the left anchor block)
    right_ref  : ref offset one past the last unaligned ref base before the
                 right anchor block (exclusive)

    The intron occupies ref [left_ref + j, right_ref - (m - j)) for the
    chosen split j.  Returns (j, score, strand_vote) where strand_vote is
    +1 for '+'-motifs, -1 for '-'-motifs, 0 for non-canonical.
    """
    m = len(q)
    span = right_ref - left_ref
    j = np.arange(m + 1)
    # matches of left prefix q[:j] vs ref[left_ref : left_ref+j]
    if m > 0:
        lmatch = (q == ref[left_ref: left_ref + m]).astype(np.float64)
        lpre = np.concatenate([[0.0], np.cumsum(lmatch)])
        rmatch = (q == ref[right_ref - m: right_ref]).astype(np.float64)
        rsuf = np.concatenate([[0.0], np.cumsum(rmatch[::-1])])[::-1]
    else:
        lpre = np.zeros(1)
        rsuf = np.zeros(1)
    don = left_ref + j            # first intron base
    acc = right_ref - (m - j) - 2  # position of acceptor dinuc start (last-1)
    plus = (_dinuc_eq(ref, don, _GT) & _dinuc_eq(ref, acc, _AG)).astype(np.float64) * BONUS_CANON
    minus = (_dinuc_eq(ref, don, _CT) & _dinuc_eq(ref, acc, _AC)).astype(np.float64) * BONUS_CANON
    semi_p = (_dinuc_eq(ref, don, _GC) & _dinuc_eq(ref, acc, _AG)).astype(np.float64) * BONUS_SEMI
    semi_p2 = (_dinuc_eq(ref, don, _AT) & _dinuc_eq(ref, acc, _AC)).astype(np.float64) * BONUS_SEMI
    semi_m = (_dinuc_eq(ref, don, _CT) & _dinuc_eq(ref, acc, _GC)).astype(np.float64) * BONUS_SEMI
    semi_m2 = (_dinuc_eq(ref, don, _GT) & _dinuc_eq(ref, acc, _AT)).astype(np.float64) * BONUS_SEMI
    bonus_p = np.maximum(plus, np.maximum(semi_p, semi_p2))
    bonus_m = np.maximum(minus, np.maximum(semi_m, semi_m2))
    bonus = np.maximum(bonus_p, bonus_m)
    score = lpre + rsuf + bonus
    best = int(np.argmax(score))
    if bonus_p[best] > bonus_m[best]:
        vote = 1
    elif bonus_m[best] > bonus_p[best]:
        vote = -1
    else:
        vote = 0
    return best, float(score[best]), vote


# ---------------------------------------------------------------------------
# Indel-aware junction placement (two-sided banded DP + motif-scored join).
#
# A long-read junction region may carry small indels right at the splice
# boundary (the toy CCS read does), which a pure query-split cannot place on
# the annotated donor/acceptor.  Here both flanks are aligned with a banded
# shift DP and joined over all (query split, left shift, right shift)
# combinations with the motif bonus — the host reference of the Pallas
# splice-DP kernel.
# ---------------------------------------------------------------------------

MATCH = 1.0
MISMATCH = -2.0
GAP = -3.0
NEG = -1e18


def _shift_dp(q: np.ndarray, ref_win: np.ndarray, B: int):
    """Banded prefix DP.

    S[j, c] = best score aligning q[:j] to ref_win[: j + (c - B)] with
    ref-consumption shift s = c - B in [-B, B].  Returns the [m+1, 2B+1]
    score matrix (NEG where invalid).
    """
    m = len(q)
    W = 2 * B + 1
    S = np.full((m + 1, W), NEG)
    S[0, B] = 0.0
    for s in range(1, B + 1):
        if s <= len(ref_win):
            S[0, B + s] = GAP * s
    nr = len(ref_win)
    for j in range(1, m + 1):
        prev = S[j - 1]
        for c in range(W):
            s = c - B
            rlen = j + s
            if rlen < 0 or rlen > nr:
                continue
            best = NEG
            # diagonal: consume q[j-1] and ref_win[rlen-1]
            if rlen >= 1 and prev[c] > NEG / 2:
                best = prev[c] + (MATCH if q[j - 1] == ref_win[rlen - 1]
                                  else MISMATCH)
            # insertion (query-only): shift decreases
            if c + 1 < W and prev[c + 1] > NEG / 2:
                best = max(best, prev[c + 1] + GAP)
            S[j, c] = best
        # deletion (ref-only): scan within row, shift increases
        for c in range(1, W):
            if S[j, c - 1] > NEG / 2:
                S[j, c] = max(S[j, c], S[j, c - 1] + GAP)
    return S


def _traceback_ops(q: np.ndarray, ref_win: np.ndarray, S: np.ndarray,
                   j: int, c: int, B: int):
    """Recover (op, len) runs for the DP cell (j, c); ops use BAM codes
    M=0 I=1 D=2."""
    ops = []

    def push(op):
        if ops and ops[-1][0] == op:
            ops[-1][1] += 1
        else:
            ops.append([op, 1])

    while j > 0 or c != B:
        s = c - B
        rlen = j + s
        cur = S[j, c]
        if j > 0 and rlen >= 1:
            d = MATCH if q[j - 1] == ref_win[rlen - 1] else MISMATCH
            if abs(S[j - 1, c] + d - cur) < 1e-9:
                push(0)
                j -= 1
                continue
        if c > 0 and abs(S[j, c - 1] + GAP - cur) < 1e-9:
            push(2)
            c -= 1
            continue
        if j > 0 and c + 1 < 2 * B + 1 and abs(S[j - 1, c + 1] + GAP - cur) < 1e-9:
            push(1)
            j -= 1
            c += 1
            continue
        # numerical fallback
        if j > 0:
            push(0)
            j -= 1
        else:
            push(2)
            c -= 1
    return [(op, l) for op, l in reversed(ops)]


def _motif_bonus(ref: np.ndarray, don: int, last: int):
    """(bonus, vote) for intron [don, last] (0-based inclusive)."""
    n = len(ref)
    if don < 0 or last + 1 > n or last - don + 1 < 2:
        return 0.0, 0
    d = (int(ref[don]), int(ref[don + 1]))
    a = (int(ref[last - 1]), int(ref[last]))
    if d == _GT and a == _AG:
        return BONUS_CANON, 1
    if d == _CT and a == _AC:
        return BONUS_CANON, -1
    if (d == _GC and a == _AG) or (d == _AT and a == _AC):
        return BONUS_SEMI, 1
    if (d == _CT and a == _GC) or (d == _GT and a == _AT):
        return BONUS_SEMI, -1
    return 0.0, 0


def refine_splice_indel(q: np.ndarray, ref: np.ndarray, left_ref: int,
                        right_ref: int, B: int = 4, min_intron: int = 20):
    """Indel-aware intron placement in the gap between two anchor blocks.

    q         : query gap codes (m bases)
    ref       : full concatenated reference codes
    left_ref  : 0-based ref offset where the left flank resumes
    right_ref : 0-based ref offset of the right anchor block start

    Returns (left_ops, intron_len, right_ops, vote, score) where the ops are
    (op, len) runs in BAM codes covering the query gap; or None when no
    intron >= min_intron fits.
    """
    m = len(q)
    span = right_ref - left_ref
    max_left = min(m + B, span)
    lwin = ref[left_ref: left_ref + max_left]
    max_right = min(m + B, span)
    rwin = ref[right_ref - max_right: right_ref][::-1]

    SL = _shift_dp(q, lwin, B)
    SR = _shift_dp(q[::-1], rwin, B)

    best = (NEG, None)
    W = 2 * B + 1
    for j in range(m + 1):
        for cl in range(W):
            sl = SL[j, cl]
            if sl <= NEG / 2:
                continue
            lref = j + (cl - B)
            don = left_ref + lref  # first intron base (0-based)
            for cr in range(W):
                sr = SR[m - j, cr]
                if sr <= NEG / 2:
                    continue
                rref = (m - j) + (cr - B)
                last = right_ref - rref - 1  # last intron base
                ilen = last - don + 1
                if ilen < min_intron:
                    continue
                bonus, vote = _motif_bonus(ref, don, last)
                sc = sl + sr + bonus
                if sc > best[0]:
                    best = (sc, (j, cl, cr, don, last, vote))
    if best[1] is None:
        return None
    sc, (j, cl, cr, don, last, vote) = best
    left_ops = _traceback_ops(q, lwin, SL, j, cl, B)
    right_rev = _traceback_ops(q[::-1], rwin, SR, m - j, cr, B)
    right_ops = [(op, l) for op, l in reversed(right_rev)]
    return left_ops, last - don + 1, right_ops, vote, sc
