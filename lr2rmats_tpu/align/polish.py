"""Cross-read splice-junction consensus polishing.

Single-read junction placement is fundamentally ambiguous when sequencing
errors corrupt the bases flanking a splice site: a look-alike motif a few
bases away can genuinely outscore the true junction for THAT read, while
sibling reads of the same gene (with independent errors) place it
correctly.  This pass aggregates junction support across all reads of a
run and re-places near-miss junctions onto the locally dominant placement
— the same evidence the reference pipeline taps via STAR's 2-pass
`--sjdbGTFfile` re-alignment (reference Snakefile:116-140) and minimap2
exposes as `--junc-bed`; here it is annotation-free, using the long reads
themselves as the junction prior.

Snapping is conservative: a junction moves only to a strictly
better-supported placement within SNAP bp on both ends, and only when the
read's own bases support the new placement within DELTA score of the old
one (re-scored with the same banded flank DP the aligner uses —
align/splice.py).  CIGAR, NM and AS are rewritten exactly.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from ..io.sam import FSECONDARY, FUNMAP, OP_D, OP_I, OP_M, OP_N, OP_S, AlnRec
from .splice import (GAP, MATCH, MISMATCH, NEG, _motif_bonus, _shift_dp,
                     _traceback_ops)

SNAP = 40        # max per-end distance between a junction and its winner
DELTA = 6.0      # max score the read may lose by accepting the winner
DELTA_STRONG = 30.0  # ... when the winner dominates (>= 2x weight + 2):
                 # error pileups can make a misplacement outscore truth by
                 # a lot for ONE read; dominant clean siblings override it
FLANK_Q = 24     # query bases re-aligned on each side of the junction
B = 8            # flank DP band (wider than the aligner's junction DP:
                 # the old alignment's flank may already carry several
                 # indels that the re-placement has to absorb)
FLK = 8          # flank bases checked for the clean-vote weight
W_CLEAN = 2      # vote weight of a junction with both flanks error-free


def _cigar_ops(rec: AlnRec) -> List[Tuple[int, int]]:
    return [(int(c) & 0xF, int(c) >> 4) for c in rec.cigar]


def _junctions_of(ops, pos: int) -> List[Tuple[int, int, int]]:
    """(op_index, don, acc) for every N run; don/acc 0-based chrom-local
    first/last intron base."""
    out = []
    r = pos
    for i, (op, l) in enumerate(ops):
        if op == OP_N:
            out.append((i, r, r + l - 1))
        if op in (OP_M, OP_D, OP_N):
            r += l
    return out


def collect_junction_support(records, genome_codes: np.ndarray,
                             chrom_offsets: np.ndarray
                             ) -> Dict[Tuple[int, int, int], int]:
    """Weighted junction support over primary mapped records.

    A junction flanked on both sides by >= FLK exactly-matching M bases
    (no adjacent indels) votes with weight W_CLEAN: an error-free flank
    pins the placement, while the error-corrupted flanks that cause
    misplacements get weight 1 — so a clean sibling outvotes one
    error-driven misplacement even at 1:1 read counts."""
    from ..io.fasta import encode_seq
    support: Dict[Tuple[int, int, int], int] = {}
    for rec in records:
        if rec.flag & (FSECONDARY | FUNMAP):
            continue
        ops = _cigar_ops(rec)
        juncs = _junctions_of(ops, rec.pos)
        if not juncs:
            continue
        off = int(chrom_offsets[rec.tid])
        q = encode_seq(rec.seq.encode())
        qi = 0
        r = rec.pos
        qs = []
        for op, l in ops:
            qs.append(qi)
            if op in (OP_M, OP_I, OP_S):
                qi += l
        for op_i, don, acc in juncs:
            w = 1
            if 0 < op_i < len(ops) - 1:
                lop, ll = ops[op_i - 1]
                rop, rl = ops[op_i + 1]
                if lop == OP_M and ll >= FLK and rop == OP_M and rl >= FLK:
                    lq = qs[op_i - 1] + ll
                    rq = qs[op_i + 1]
                    gl = off + don - FLK
                    gr = off + acc + 1
                    if (np.array_equal(q[lq - FLK: lq],
                                       genome_codes[gl: gl + FLK]) and
                            np.array_equal(q[rq: rq + FLK],
                                           genome_codes[gr: gr + FLK])):
                        w = W_CLEAN
            key = (rec.tid, don, acc)
            support[key] = support.get(key, 0) + w
    return support


def consensus_winners(support: Dict[Tuple[int, int, int], int]
                      ) -> Dict[Tuple[int, int, int], Tuple[int, int, int]]:
    """For each junction, the strictly better-supported junction within
    SNAP bp on both ends (the local-max neighbor), if any."""
    by_tid: Dict[int, List[Tuple[int, int, int]]] = {}
    for (tid, don, acc), c in support.items():
        by_tid.setdefault(tid, []).append((don, acc, c))
    winners: Dict[Tuple[int, int, int], Tuple[int, int, int]] = {}
    for tid, rows in by_tid.items():
        rows.sort()
        dons = np.array([r[0] for r in rows], np.int64)
        for don, acc, c in rows:
            lo = int(np.searchsorted(dons, don - SNAP))
            hi = int(np.searchsorted(dons, don + SNAP, side="right"))
            best_c, best_d, best_a = c, don, acc
            for t in range(lo, hi):
                d2, a2, c2 = rows[t]
                if abs(a2 - acc) <= SNAP and c2 > best_c:
                    best_c, best_d, best_a = c2, d2, a2
            if (best_d, best_a) != (don, acc):
                winners[(tid, don, acc)] = (tid, best_d, best_a)
    return winners


def _window(ops, op_i: int, pos: int, need_l: int = FLANK_Q,
            need_r: int = FLANK_Q):
    """Flank windows around the N run at op_i.

    Returns (ops2, op_i2, q0, r0, left_ops_i, right_ops_j, q_end, r_end)
    where ops2 is `ops` with the outermost included M runs split so the
    window holds only ~need bases (a 600 bp exon M op would otherwise make
    the flank DP 10-20x more expensive for no gain — splitting an M op is
    a semantic no-op and the caller's seam re-merge restores it), op_i2 is
    the N run's index within ops2, [left_ops_i, op_i2) and (op_i2,
    right_ops_j] bound the replaced segment, q0/q_end are query offsets
    and r0/r_end chrom-local ref offsets of the window boundaries.
    Windows never cross another N run.  need_l/need_r are the minimum
    query bases wanted per side (grown by the caller when the junction
    shift must be absorbed by one flank).
    """
    ops = list(ops)
    # clip: split the outermost M op of each flank at the need boundary
    got_q = 0
    for t in range(op_i - 1, -1, -1):
        op, l = ops[t]
        if op in (OP_N, OP_S):
            break
        if op in (OP_M, OP_I):
            if op == OP_M and got_q + l > need_l and got_q < need_l:
                keep = need_l - got_q
                ops[t: t + 1] = [(OP_M, l - keep), (OP_M, keep)]
                op_i += 1
                got_q += l
                break
            got_q += l
            if got_q >= need_l:
                break
    got_q = 0
    for t in range(op_i + 1, len(ops)):
        op, l = ops[t]
        if op in (OP_N, OP_S):
            break
        if op in (OP_M, OP_I):
            if op == OP_M and got_q + l > need_r and got_q < need_r:
                keep = need_r - got_q
                ops[t: t + 1] = [(OP_M, keep), (OP_M, l - keep)]
                break
            got_q += l
            if got_q >= need_r:
                break
    q = 0
    r = pos
    qs, rs = [], []          # query/ref offsets at the START of each op
    for op, l in ops:
        qs.append(q)
        rs.append(r)
        if op in (OP_M, OP_I, OP_S):
            q += l
        if op in (OP_M, OP_D, OP_N):
            r += l
    qs.append(q)
    rs.append(r)
    i = op_i
    got_q = 0
    while i > 0 and got_q < need_l:
        op, l = ops[i - 1]
        if op in (OP_N, OP_S):
            break
        i -= 1
        if op in (OP_M, OP_I):
            got_q += l
    j = op_i
    got_q = 0
    while j + 1 < len(ops) and got_q < need_r:
        op, l = ops[j + 1]
        if op in (OP_N, OP_S):
            break
        j += 1
        if op in (OP_M, OP_I):
            got_q += l
    return ops, op_i, qs[i], rs[i], i, j, qs[j + 1], rs[j + 1]


def _window_score(ops, lo: int, hi: int, q: np.ndarray, q0: int,
                  ref: np.ndarray, r0: int) -> Tuple[float, int, int]:
    """(unit-model score, n_match, NM) of ops[lo:hi+1] (N skipped) with
    query starting at q0 and ref at r0 (global)."""
    sc = 0.0
    nm = 0
    match = 0
    qi, ri = q0, r0
    for op, l in ops[lo: hi + 1]:
        if op == OP_M:
            mism = int(np.sum(q[qi: qi + l] != ref[ri: ri + l]))
            sc += MATCH * (l - mism) + MISMATCH * mism
            nm += mism
            match += l - mism
            qi += l
            ri += l
        elif op == OP_I:
            sc += GAP * l
            nm += l
            qi += l
        elif op == OP_D:
            sc += GAP * l
            nm += l
            ri += l
        elif op == OP_N:
            ri += l
    return sc, match, nm


def _constrained_place(qwin: np.ndarray, ref: np.ndarray, L0: int, R0: int,
                       don: int, acc: int):
    """Best split of qwin with the intron FORCED to [don, acc] (global
    coords); flanks run L0->don and acc+1->R0.  Returns
    (score, left_ops, right_ops, nm) or None if infeasible in band B."""
    m = len(qwin)
    DL = don - L0                    # ref consumed by the left flank
    DR = R0 - 1 - acc                # ref consumed by the right flank
    if DL < 0 or DR < 0 or DL > m + B or DR > m + B:
        return None
    span = R0 - L0
    side = min(m + B, span)
    lwin = ref[L0: L0 + side]
    rwin = ref[R0 - side: R0][::-1]
    SL = _shift_dp(qwin, lwin, B)
    SR = _shift_dp(qwin[::-1], rwin, B)
    W = 2 * B + 1
    best = NEG
    bj = bcl = bcr = -1
    for j in range(m + 1):
        cl = DL + B - j
        cr = DR + B - (m - j)
        if not (0 <= cl < W and 0 <= cr < W):
            continue
        sc = SL[j, cl] + SR[m - j, cr]
        if sc >= best and sc > NEG / 2:
            best = sc
            bj, bcl, bcr = j, cl, cr
    if bj < 0:
        return None
    lops = _traceback_ops(qwin, lwin, SL, bj, bcl, B)
    rrev = _traceback_ops(qwin[::-1], rwin, SR, m - bj, bcr, B)
    rops = [(op, l) for op, l in reversed(rrev)]
    nm = 0
    match = 0
    qi, ri = 0, L0
    for side_ops, r_start in ((lops, L0), (rops, acc + 1)):
        ri = r_start
        for op, l in side_ops:
            if op == OP_M:
                mism = int(np.sum(qwin[qi: qi + l] != ref[ri: ri + l]))
                nm += mism
                match += l - mism
                qi += l
                ri += l
            elif op == OP_I:
                nm += l
                qi += l
            else:
                nm += l
                ri += l
    return best, lops, rops, match, nm


def _pair_scores(rec, ops, q, op_i, don, acc, wd, wa, off,
                 ref: np.ndarray):
    """(own_score, alt_score) of rec's junction window under its own
    placement (don, acc) vs the alternative (wd, wa); None if the
    alternative is infeasible for this read."""
    ops2, op_i, q0, r0, lo, hi, q1, r1 = _window(
        ops, op_i, rec.pos,
        FLANK_Q + max(wd - don, 0), FLANK_Q + max(acc - wa, 0))
    qwin = q[q0: q1]
    L0, R0 = off + r0, off + r1
    res = _constrained_place(qwin, ref, L0, R0, off + wd, off + wa)
    if res is None:
        return None
    own_sc, _, _ = _window_score(ops2, lo, hi, q, q0, ref, L0)
    b_own = _motif_bonus(ref, off + don, off + acc)[0]
    b_alt = _motif_bonus(ref, off + wd, off + wa)[0]
    return own_sc + b_own, res[0] + b_alt


def _resolve_weight_ties(records, genome_codes, chrom_offsets, support,
                         winners) -> None:
    """Resolve equal-weight junction pairs by summed read evidence.

    When a misplaced junction and the true one tie on vote weight (e.g. a
    1-clean-read vs 1-errored-read gene), neither wins by count.  The
    likelihood vote decides instead: score every supporting read's window
    under BOTH placements and pick the placement with the larger summed
    score — the misplaced read barely prefers its junction while a clean
    sibling strongly prefers truth.  Losers are added to `winners`.
    """
    from ..io.fasta import encode_seq
    holders: Dict[Tuple[int, int, int], List] = {}
    ops_cache: Dict[int, list] = {}
    q_cache: Dict[int, np.ndarray] = {}
    for rec in records:
        if rec.flag & FUNMAP:
            continue
        ops = _cigar_ops(rec)
        ops_cache[id(rec)] = ops
        for op_i, d, a in _junctions_of(ops, rec.pos):
            holders.setdefault((rec.tid, d, a), []).append((rec, op_i))
    by_tid: Dict[int, List[Tuple[int, int, int]]] = {}
    for (tid, d, a), c in support.items():
        by_tid.setdefault(tid, []).append((d, a, c))
    for tid, rows in by_tid.items():
        rows.sort()
        dons = np.array([r[0] for r in rows], np.int64)
        off = int(chrom_offsets[tid])
        for d, a, c in rows:
            if (tid, d, a) in winners:
                continue
            lo = int(np.searchsorted(dons, d - SNAP))
            hi = int(np.searchsorted(dons, d + SNAP, side="right"))
            for t in range(lo, hi):
                d2, a2, c2 = rows[t]
                if (d2, a2) <= (d, a) or abs(a2 - a) > SNAP or c2 != c:
                    continue
                if (tid, d2, a2) in winners:
                    continue
                total = 0.0        # > 0 prefers (d2, a2)
                ok = True
                for own, alt, sign in (((d, a), (d2, a2), -1.0),
                                       ((d2, a2), (d, a), +1.0)):
                    for rec, op_i in holders.get((tid,) + own, []):
                        if id(rec) not in q_cache:
                            q_cache[id(rec)] = encode_seq(rec.seq.encode())
                        s = _pair_scores(rec, ops_cache[id(rec)],
                                         q_cache[id(rec)], op_i,
                                         own[0], own[1], alt[0], alt[1],
                                         off, genome_codes)
                        if s is None:
                            ok = False
                            break
                        total += sign * (s[0] - s[1])
                    if not ok:
                        break
                if not ok or total == 0.0:
                    continue
                if total > 0:
                    winners[(tid, d, a)] = (tid, d2, a2)
                else:
                    winners[(tid, d2, a2)] = (tid, d, a)


def polish_records(records: List[AlnRec], genome_codes: np.ndarray,
                   chrom_offsets: np.ndarray) -> int:
    """Snap near-miss junctions to their cross-read consensus placement.

    Mutates records in place; returns the number of junctions re-placed.
    `chrom_offsets` maps tid -> offset of that chromosome in the
    concatenated `genome_codes` buffer.
    """
    support = collect_junction_support(records, genome_codes, chrom_offsets)
    winners = consensus_winners(support)
    _resolve_weight_ties(records, genome_codes, chrom_offsets, support,
                         winners)
    if not winners:
        return 0
    import os
    dbg = bool(os.environ.get("LR2RMATS_POLISH_DEBUG"))
    from ..io.fasta import encode_seq
    n_fix = 0
    for rec in records:
        if rec.flag & FUNMAP:
            continue
        ops = _cigar_ops(rec)
        juncs = _junctions_of(ops, rec.pos)
        todo = [(i, d, a) for i, d, a in juncs
                if (rec.tid, d, a) in winners]
        if dbg and os.environ.get("LR2RMATS_POLISH_DEBUG") == rec.qname:
            for i, d, a in juncs:
                near = {k: v for k, v in support.items()
                        if k[0] == rec.tid and abs(k[1] - d) <= SNAP}
                print(f"[polish] {rec.qname} junc ({d},{a}) "
                      f"w={support.get((rec.tid, d, a))} near={near} "
                      f"winner={winners.get((rec.tid, d, a))}")
        if not todo:
            continue
        off = int(chrom_offsets[rec.tid])
        q = encode_seq(rec.seq.encode())
        changed = False
        # re-place junctions right to left so op indices stay valid
        for op_i, don, acc in reversed(todo):
            _, wd, wa = winners[(rec.tid, don, acc)]
            # a junction shift must be absorbed by one flank's query window
            ops, op_i, q0, r0, lo, hi, q1, r1 = _window(
                ops, op_i, rec.pos,
                FLANK_Q + max(wd - don, 0), FLANK_Q + max(acc - wa, 0))
            qwin = q[q0: q1]
            L0, R0 = off + r0, off + r1
            gd, ga = off + wd, off + wa
            res = _constrained_place(qwin, genome_codes, L0, R0, gd, ga)
            if res is None:
                if dbg:
                    print(f"[polish] {rec.qname} ({don},{acc})->({wd},{wa}) "
                          f"infeasible m={q1-q0} DL={gd-L0} DR={R0-1-ga}")
                continue
            new_sc, lops, rops, new_match, new_nm = res
            old_sc, old_match, old_nm = _window_score(ops, lo, hi, q, q0,
                                                      genome_codes, L0)
            bonus_old = _motif_bonus(genome_codes, off + don, off + acc)[0]
            bonus_new, _ = _motif_bonus(genome_codes, gd, ga)
            own_w = support.get((rec.tid, don, acc), 1)
            win_w = support.get((rec.tid, wd, wa), 0)
            delta = DELTA_STRONG if win_w >= 2 * own_w + 2 else DELTA
            if dbg:
                print(f"[polish] {rec.qname} ({don},{acc})->({wd},{wa}) "
                      f"own_w={own_w} win_w={win_w} old={old_sc + bonus_old:.1f} "
                      f"new={new_sc + bonus_new:.1f} delta={delta} "
                      f"accept={new_sc + bonus_new >= old_sc + bonus_old - delta}")
            if new_sc + bonus_new < old_sc + bonus_old - delta:
                continue
            new_seg = [(op, l) for op, l in lops if l > 0]
            new_seg.append((OP_N, wa - wd + 1))
            new_seg += [(op, l) for op, l in rops if l > 0]
            merged: List[Tuple[int, int]] = []
            for op, l in ops[:lo] + new_seg + ops[hi + 1:]:
                if merged and merged[-1][0] == op:
                    merged[-1] = (op, merged[-1][1] + l)
                else:
                    merged.append((op, l))
            ops = merged
            # NM/AS deltas (aligner convention: AS = 2*nmatch - 4*ed)
            if "NM" in rec.tags:
                rec.tags["NM"] = int(rec.tags["NM"]) - old_nm + new_nm
            if "AS" in rec.tags:
                rec.tags["AS"] = (int(rec.tags["AS"])
                                  + 2 * (new_match - old_match)
                                  - 4 * (new_nm - old_nm))
            changed = True
            n_fix += 1
        if changed:
            rec.cigar = np.array([(l << 4) | op for op, l in ops if l > 0],
                                 np.uint32)
    return n_fix
