// lrio.cpp — native hot-path kernels for lr2rmats_tpu.
//
// The reference keeps its whole runtime in C (src/*.c + htslib); here the
// TPU owns the batched compute (chaining DP) and this library owns the
// ragged host-side inner loops that feed it:
//   * indel-aware splice-junction DP (mirrors align/splice.py, bit-equal)
//   * minimizer extraction (mirrors index/minimizer.py)
//   * chain backtrack
// Exposed with a plain C ABI for ctypes (no pybind11 in this image).
//
// Build: g++ -O3 -march=native -shared -fPIC csrc/lrio.cpp -o build/liblrio.so

#include <cstdint>
#include <cstring>
#include <cmath>
#include <vector>
#include <algorithm>

namespace {

constexpr double MATCH = 1.0;
constexpr double MISMATCH = -2.0;
constexpr double GAP = -3.0;
constexpr double NEG = -1e18;
constexpr double BONUS_CANON = 10.0;
constexpr double BONUS_SEMI = 5.0;

// banded prefix DP (align/splice.py::_shift_dp)
// S has (m+1) x W doubles, W = 2B+1
void shift_dp(const uint8_t* q, int m, const uint8_t* win, int nw, int B,
              double* S) {
    const int W = 2 * B + 1;
    for (int i = 0; i < (m + 1) * W; ++i) S[i] = NEG;
    S[B] = 0.0;
    for (int s = 1; s <= B; ++s)
        if (s <= nw) S[B + s] = GAP * s;
    for (int j = 1; j <= m; ++j) {
        const double* prev = S + (j - 1) * W;
        double* row = S + j * W;
        double best = NEG;
        for (int c = 0; c < W; ++c) {
            int rlen = j + c - B;
            if (rlen < 0 || rlen > nw) { row[c] = NEG; best = NEG; continue; }
            double v = NEG;
            if (rlen >= 1 && prev[c] > NEG / 2) {
                double d = (win[rlen - 1] == q[j - 1]) ? MATCH : MISMATCH;
                v = prev[c] + d;
            }
            if (c + 1 < W && prev[c + 1] > NEG / 2) {
                double t = prev[c + 1] + GAP;
                if (t > v) v = t;
            }
            // deletion from row[c-1] (running best)
            best = std::max(best + GAP, v);
            row[c] = best;
        }
    }
}

// traceback of one DP cell -> (op,len) runs appended to out
// ops: 0=M 1=I 2=D. Returns count of runs.
int traceback(const uint8_t* q, const uint8_t* win, const double* S,
              int m, int B, int j, int c, int32_t* out_ops, int cap) {
    const int W = 2 * B + 1;
    std::vector<std::pair<int, int>> ops;
    auto push = [&](int op) {
        if (!ops.empty() && ops.back().first == op) ops.back().second++;
        else ops.emplace_back(op, 1);
    };
    while (j > 0 || c != B) {
        int rlen = j + c - B;
        double cur = S[j * W + c];
        bool stepped = false;
        if (j > 0 && rlen >= 1) {
            double d = (win[rlen - 1] == q[j - 1]) ? MATCH : MISMATCH;
            if (std::fabs(S[(j - 1) * W + c] + d - cur) < 1e-9) {
                push(0); --j; stepped = true;
            }
        }
        if (!stepped && c > 0 &&
            std::fabs(S[j * W + (c - 1)] + GAP - cur) < 1e-9) {
            push(2); --c; stepped = true;
        }
        if (!stepped && j > 0 && c + 1 < W &&
            std::fabs(S[(j - 1) * W + (c + 1)] + GAP - cur) < 1e-9) {
            push(1); --j; ++c; stepped = true;
        }
        if (!stepped) {
            if (j > 0 && rlen >= 1) { push(0); --j; }
            else if (j > 0) { push(1); --j; ++c; }
            else { push(2); --c; }
        }
    }
    int n = std::min((int)ops.size(), cap);
    for (int i = 0; i < n; ++i) {
        out_ops[2 * i] = ops[n - 1 - i].first;       // reversed
        out_ops[2 * i + 1] = ops[n - 1 - i].second;
    }
    return n;
}

inline int donor_class(const uint8_t* ref, int64_t n, int64_t d) {
    if (d < 0 || d + 1 >= n) return 0;
    uint8_t a = ref[d], b = ref[d + 1];
    if (a == 2 && b == 3) return 1;  // GT
    if (a == 1 && b == 3) return 2;  // CT
    if (a == 2 && b == 1) return 3;  // GC
    if (a == 0 && b == 3) return 4;  // AT
    return 0;
}
inline int acceptor_class(const uint8_t* ref, int64_t n, int64_t last) {
    if (last - 1 < 0 || last >= n) return 0;
    uint8_t a = ref[last - 1], b = ref[last];
    if (a == 0 && b == 2) return 1;  // AG
    if (a == 0 && b == 1) return 2;  // AC
    if (a == 2 && b == 1) return 3;  // GC
    if (a == 0 && b == 3) return 4;  // AT
    return 0;
}
inline void motif_bonus(int dc, int ac, double* bonus, int* vote) {
    *bonus = 0.0; *vote = 0;
    if (dc == 1 && ac == 1) { *bonus = BONUS_CANON; *vote = 1; }
    else if (dc == 2 && ac == 2) { *bonus = BONUS_CANON; *vote = -1; }
    else if (dc == 3 && ac == 1) { *bonus = BONUS_SEMI; *vote = 1; }
    else if (dc == 4 && ac == 2) { *bonus = BONUS_SEMI; *vote = 1; }
    else if (dc == 2 && ac == 3) { *bonus = BONUS_SEMI; *vote = -1; }
    else if (dc == 1 && ac == 4) { *bonus = BONUS_SEMI; *vote = -1; }
}

}  // namespace

extern "C" {

// Indel-aware intron placement (align/splice.py::refine_splice_indel).
// Returns 0 on success, -1 when no intron >= min_intron fits.
int refine_splice_indel_c(
    const uint8_t* q, int m, const uint8_t* ref, int64_t ref_len,
    int64_t left_ref, int64_t right_ref, int B, int min_intron,
    int32_t* left_ops, int32_t* left_n,
    int32_t* right_ops, int32_t* right_n,
    int64_t* intron_len, int32_t* vote_out, double* score_out) {
    const int W = 2 * B + 1;
    int64_t span = right_ref - left_ref;
    int nl = (int)std::min<int64_t>(m + B, span);
    int nr = (int)std::min<int64_t>(m + B, span);

    std::vector<uint8_t> lwin(ref + left_ref, ref + left_ref + nl);
    std::vector<uint8_t> rwin(nr);
    for (int i = 0; i < nr; ++i) rwin[i] = ref[right_ref - 1 - i];
    std::vector<uint8_t> qrev(q, q + m);
    std::reverse(qrev.begin(), qrev.end());

    std::vector<double> SL((m + 1) * W), SR((m + 1) * W);
    shift_dp(q, m, lwin.data(), nl, B, SL.data());
    shift_dp(qrev.data(), m, rwin.data(), nr, B, SR.data());

    // precompute donor/acceptor classes over candidate positions
    std::vector<int> dcls(m + 2 * B + 1), acls(m + 2 * B + 1);
    for (int i = 0; i <= m + 2 * B; ++i) {
        dcls[i] = donor_class(ref, ref_len, left_ref + i - B);
        acls[i] = acceptor_class(ref, ref_len, right_ref - (i - B) - 1);
    }

    double best = NEG;
    int bj = -1, bcl = -1, bcr = -1, bvote = 0;
    for (int j = 0; j <= m; ++j) {
        const double* sl = SL.data() + j * W;
        const double* sr = SR.data() + (m - j) * W;
        for (int cl = 0; cl < W; ++cl) {
            if (sl[cl] <= NEG / 2) continue;
            int64_t don = left_ref + (j + cl - B);
            if (don < 0 || don + 1 >= ref_len) continue;
            int dc = dcls[j + cl];
            for (int cr = 0; cr < W; ++cr) {
                if (sr[cr] <= NEG / 2) continue;
                int64_t last = right_ref - ((m - j) + cr - B) - 1;
                if (last - 1 < 0 || last >= ref_len) continue;
                int64_t ilen = last - don + 1;
                if (ilen < min_intron) continue;
                double bonus; int vote;
                motif_bonus(dc, acls[(m - j) + cr], &bonus, &vote);
                double sc = sl[cl] + sr[cr] + bonus;
                if (sc > best) {
                    best = sc; bj = j; bcl = cl; bcr = cr; bvote = vote;
                }
            }
        }
    }
    if (bj < 0) return -1;
    int64_t don = left_ref + (bj + bcl - B);
    int64_t last = right_ref - ((m - bj) + bcr - B) - 1;
    *intron_len = last - don + 1;
    *vote_out = bvote;
    *score_out = best;
    *left_n = traceback(q, lwin.data(), SL.data(), m, B, bj, bcl,
                        left_ops, m + 2 * B + 4);
    // right side ops come out reversed twice (reversed query, reversed run
    // order) -> reverse the run list and the op order is already correct in
    // query direction after the double reversal below
    int rn = traceback(qrev.data(), rwin.data(), SR.data(), m, B, m - bj, bcr,
                       right_ops, m + 2 * B + 4);
    // traceback returns runs in forward order of the REVERSED query; the
    // forward-query order is the reverse of that run list
    for (int i = 0; i < rn / 2; ++i) {
        std::swap(right_ops[2 * i], right_ops[2 * (rn - 1 - i)]);
        std::swap(right_ops[2 * i + 1], right_ops[2 * (rn - 1 - i) + 1]);
    }
    *right_n = rn;
    return 0;
}

// Minimizer extraction (index/minimizer.py::extract_minimizers).
// codes: uint8 [n_codes]; outputs hash/pos/strand arrays (cap = n_codes).
// Returns count.
int64_t extract_minimizers_c(const uint8_t* codes, int64_t n_codes,
                             int k, int w,
                             uint64_t* out_hash, int64_t* out_pos,
                             int8_t* out_strand) {
    int64_t n = n_codes - k + 1;
    if (n < w) return 0;
    const uint64_t mask = (k < 32) ? ((1ULL << (2 * k)) - 1) : ~0ULL;
    const uint64_t BAD = ~0ULL;
    std::vector<uint64_t> h(n);
    std::vector<int8_t> strand(n);
    uint64_t fwd = 0, rc = 0;
    int valid_run = 0;
    const int shift_rc = 2 * (k - 1);
    for (int64_t i = 0; i < n_codes; ++i) {
        uint8_t c = codes[i];
        if (c < 4) {
            fwd = ((fwd << 2) | c) & mask;
            rc = (rc >> 2) | ((uint64_t)(3 - c) << shift_rc);
            ++valid_run;
        } else {
            fwd = rc = 0; valid_run = 0;
        }
        int64_t p = i - k + 1;
        if (p >= 0) {
            if (valid_run >= k) {
                uint64_t canon; int8_t s;
                if (rc < fwd) { canon = rc; s = 1; } else { canon = fwd; s = 0; }
                // hash64 finalizer
                uint64_t x = canon;
                x = (~x + (x << 21)) & mask;
                x = x ^ (x >> 24);
                x = (x + (x << 3) + (x << 8)) & mask;
                x = x ^ (x >> 14);
                x = (x + (x << 2) + (x << 4)) & mask;
                x = x ^ (x >> 28);
                x = (x + (x << 31)) & mask;
                h[p] = x; strand[p] = s;
            } else {
                h[p] = BAD; strand[p] = 0;
            }
        }
    }
    // sliding window minimum, leftmost argmin, dedup on position
    int64_t cnt = 0;
    int64_t last_pos = -1;
    for (int64_t wstart = 0; wstart + w <= n; ++wstart) {
        uint64_t mn = BAD; int64_t arg = -1;
        for (int j = 0; j < w; ++j) {
            if (h[wstart + j] < mn) { mn = h[wstart + j]; arg = wstart + j; }
        }
        if (arg < 0 || mn == BAD) continue;
        if (arg == last_pos) continue;
        out_hash[cnt] = mn;
        out_pos[cnt] = arg;
        out_strand[cnt] = strand[arg];
        ++cnt;
        last_pos = arg;
    }
    return cnt;
}

// Pure-split splice scan (align/splice.py::refine_splice): choose query
// split j in [0, m] maximizing prefix/suffix matches + motif bonus.
// Returns j; writes score and strand vote.
int refine_splice_c(const uint8_t* q, int m, const uint8_t* ref,
                    int64_t ref_len, int64_t left_ref, int64_t right_ref,
                    double* score_out, int32_t* vote_out) {
    // prefix/suffix match cumsums
    std::vector<double> lpre(m + 1, 0.0), rsuf(m + 1, 0.0);
    for (int t = 0; t < m; ++t)
        lpre[t + 1] = lpre[t] + (q[t] == ref[left_ref + t] ? 1.0 : 0.0);
    for (int t = m - 1; t >= 0; --t)
        rsuf[t] = rsuf[t + 1] +
                  (q[t] == ref[right_ref - m + t] ? 1.0 : 0.0);
    double best = -1.0;
    int bj = 0, bvote = 0;
    for (int j = 0; j <= m; ++j) {
        int64_t don = left_ref + j;
        int64_t acc = right_ref - (m - j) - 2;  // acceptor dinuc start
        double bp = 0.0, bm = 0.0;
        if (don >= 0 && don + 1 < ref_len && acc >= 0 && acc + 1 < ref_len) {
            uint8_t d0 = ref[don], d1 = ref[don + 1];
            uint8_t a0 = ref[acc], a1 = ref[acc + 1];
            bool GT = d0 == 2 && d1 == 3, CT = d0 == 1 && d1 == 3;
            bool GC_d = d0 == 2 && d1 == 1, AT_d = d0 == 0 && d1 == 3;
            bool AG = a0 == 0 && a1 == 2, AC = a0 == 0 && a1 == 1;
            bool GC_a = a0 == 2 && a1 == 1, AT_a = a0 == 0 && a1 == 3;
            if (GT && AG) bp = BONUS_CANON;
            else if ((GC_d && AG) || (AT_d && AC)) bp = BONUS_SEMI;
            if (CT && AC) bm = BONUS_CANON;
            else if ((CT && GC_a) || (GT && AT_a)) bm = BONUS_SEMI;
        }
        double bonus = std::max(bp, bm);
        double sc = lpre[j] + rsuf[j] + bonus;
        if (sc > best) {
            best = sc; bj = j;
            bvote = (bp > bm) ? 1 : (bm > bp ? -1 : 0);
        }
    }
    *score_out = best;
    *vote_out = bvote;
    return bj;
}

// Chain backtrack (align/chain.py::backtrack): primary chain + best
// anchor-disjoint secondary.  Outputs index arrays (cap n each); returns 0.
int backtrack_c(const double* f, const int64_t* parent, int64_t n,
                double min_score, int max_examine,
                int64_t* primary, int64_t* pn,
                int64_t* secondary, int64_t* sn,
                double* pscore, double* sscore) {
    *pn = 0; *sn = 0; *pscore = 0.0; *sscore = 0.0;
    if (n == 0) return 0;
    std::vector<int64_t> order(n);
    for (int64_t i = 0; i < n; ++i) order[i] = i;
    std::stable_sort(order.begin(), order.end(),
                     [&](int64_t a, int64_t b) { return f[a] > f[b]; });
    std::vector<uint8_t> used(n, 0);
    auto trace = [&](int64_t end, int64_t* out) {
        int64_t cnt = 0;
        for (int64_t i = end; i != -1; i = parent[i]) out[cnt++] = i;
        std::reverse(out, out + cnt);
        return cnt;
    };
    int64_t best_end = order[0];
    if (f[best_end] < min_score) return 0;
    *pn = trace(best_end, primary);
    *pscore = f[best_end];
    for (int64_t i = 0; i < *pn; ++i) used[primary[i]] = 1;
    int examined = 0;
    std::vector<int64_t> tmp(n);
    for (int64_t oi = 1; oi < n; ++oi) {
        int64_t e = order[oi];
        if (f[e] < min_score || examined >= max_examine) break;
        if (used[e]) continue;
        ++examined;
        int64_t cnt = trace(e, tmp.data());
        bool clean = true;
        for (int64_t i = 0; i < cnt; ++i)
            if (used[tmp[i]]) { clean = false; break; }
        if (clean) {
            std::memcpy(secondary, tmp.data(), cnt * sizeof(int64_t));
            *sn = cnt;
            *sscore = f[e];
            break;
        }
    }
    return 0;
}

// Hamming distance of a read vs buffer at many candidate positions.
void hamming_many_c(const uint8_t* buf, int64_t n, const uint8_t* read,
                    int L, const int64_t* pos, int n_pos, int32_t* out_mm) {
    for (int i = 0; i < n_pos; ++i) {
        int64_t p = pos[i];
        if (p < 0 || p + L > n) { out_mm[i] = 1 << 30; continue; }
        int mm = 0;
        const uint8_t* b = buf + p;
        for (int t = 0; t < L; ++t) mm += (b[t] != read[t]);
        out_mm[i] = mm;
    }
}

}  // extern "C"
