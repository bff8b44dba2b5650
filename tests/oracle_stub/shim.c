/* ctypes-facing shim for the reference-C classifier oracle.
 *
 * Compiled together with the UNMODIFIED reference sources
 * /root/reference/src/{gtf.c,update_gtf.c,utils.c} (read in place; never
 * copied into this repo) against the stub htslib header in this directory.
 * All struct construction/inspection goes through these accessors so the
 * Python driver never has to mirror the C struct layout (bitfields!).
 *
 * Reference functions exercised through this shim:
 *   check_iden            gtf.c:54-92
 *   check_splice_site     update_gtf.c:717-779
 *   check_full/set_full   update_gtf.c:629-696
 *   check_with_anno_trans update_gtf.c:792-835
 *   check_short_sj(1)     update_gtf.c:589-627
 *   check_with_short_sj   update_gtf.c:698-709
 *   merge_trans           update_gtf.c:98-163
 *   split_trans           update_gtf.c:837-913
 *   check_trans           update_gtf.c:936-965
 */
#include <stdlib.h>
#include <string.h>
#include <stdint.h>
#include <stdio.h>

#include "htslib/sam.h"
#include "gtf.h"
#include "update_gtf.h"
#include "parse_bam.h"
#include "bam_fusion.h"
#include "unique_gtf.h"

/* ---- data symbols the reference expects from main.c ---- */
const char PROG[20] = "lr2rmats";

/* ---- aborting stubs for htslib I/O referenced (but never called) by the
 *      compiled translation units ---- */
samFile *sam_open(const char *fn, const char *mode) { (void)fn; (void)mode; abort(); }
bam_hdr_t *sam_hdr_read(samFile *fp) { (void)fp; abort(); }
int sam_hdr_write(samFile *fp, const bam_hdr_t *h) { (void)fp; (void)h; abort(); }
int sam_close(samFile *fp) { (void)fp; abort(); }
int sam_read1(samFile *fp, bam_hdr_t *h, bam1_t *b) { (void)fp; (void)h; (void)b; abort(); }
int sam_write1(samFile *fp, const bam_hdr_t *h, const bam1_t *b) { (void)fp; (void)h; (void)b; abort(); }
int bam_name2id(bam_hdr_t *h, const char *ref) { (void)h; (void)ref; abort(); }
void bam_hdr_destroy(bam_hdr_t *h) { (void)h; abort(); }
hts_idx_t *sam_index_load(samFile *fp, const char *fn) { (void)fp; (void)fn; abort(); }
void hts_itr_destroy(hts_itr_t *itr) { (void)itr; abort(); }
void hts_idx_destroy(hts_idx_t *idx) { (void)idx; abort(); }
samFile *sam_open_format(const char *fn, const char *mode, void *fmt)
{ (void)fn; (void)mode; (void)fmt; abort(); }

/* ---- REAL minimal record machinery (stub-layout bam1_t; see sam.h):
 *      called at oracle runtime by gen_exon / bam_is_uniq_NH /
 *      copy_bam_seg1 ---- */
bam1_t *bam_init1(void)
{
    bam1_t *b = (bam1_t*)calloc(1, sizeof(bam1_t));
    return b;
}

void bam_destroy1(bam1_t *b)
{
    if (b) { free(b->data); free(b); }
}

bam1_t *bam_copy1(bam1_t *bdst, const bam1_t *bsrc)
{
    uint8_t *data = bdst->data;
    int m = bdst->m_data;
    if (m < bsrc->l_data) {
        m = bsrc->l_data;
        data = (uint8_t*)realloc(data, m > 0 ? m : 1);
    }
    memcpy(data, bsrc->data, bsrc->l_data);
    *bdst = *bsrc;
    bdst->data = data;
    bdst->m_data = m;
    return bdst;
}

/* aux records are packed as tag[2] + type + value (types 'A' and 'i'
 * only — all the compiled reference code reads) */
uint8_t *bam_aux_get(const bam1_t *b, const char tag[2])
{
    uint8_t *p = bam_get_aux(b);
    uint8_t *end = b->data + b->l_data;
    while (p + 3 <= end) {
        int sz = (p[2] == 'A') ? 1 : (p[2] == 'i') ? 4 : -1;
        if (sz < 0 || p + 3 + sz > end) return 0;
        if (p[0] == (uint8_t)tag[0] && p[1] == (uint8_t)tag[1]) return p + 2;
        p += 3 + sz;
    }
    return 0;
}

int64_t bam_aux2i(const uint8_t *s)
{
    if (*s != 'i') return 0;
    int32_t v;
    memcpy(&v, s + 1, 4);
    return v;
}

char bam_aux2A(const uint8_t *s)
{
    if (*s != 'A') return 0;
    return (char)s[1];
}

/* htslib bam_cigar2rlen: reference-consuming ops are M/D/N/=/X */
int bam_cigar2rlen(int n_cigar, const uint32_t *cigar)
{
    int l = 0;
    for (int i = 0; i < n_cigar; ++i) {
        int op = bam_cigar_op(cigar[i]);
        if (op == BAM_CMATCH || op == BAM_CDEL || op == BAM_CREF_SKIP ||
            op == BAM_CEQUAL || op == BAM_CDIFF)
            l += bam_cigar_oplen(cigar[i]);
    }
    return l;
}

/* ---- externs for non-static reference functions not in headers ---- */
extern update_gtf_para *update_gtf_init_para(void);
extern int check_splice_site(trans_t *bam_t, trans_t anno_t, int dis);
extern int check_full(trans_t *t, trans_t anno_t, int level);
extern void set_full(trans_t *t, int l);
extern int check_short_sj1(int tid, int start, int end, sj_t *sj_group,
                           int sj_n, int i_start, update_gtf_para *ugp);
extern int check_with_short_sj(trans_t *bam_t, sj_t *sj_group, int sj_n,
                               int *last_sj_i, update_gtf_para *ugp);
extern void check_with_anno_trans(trans_t *bam_t, read_trans_t *anno_T,
                                  int *last_anno_i, update_gtf_para *ugp);
extern read_trans_t *split_trans(trans_t *bam_t);
extern void check_trans(read_trans_t *bam_T, read_trans_t *anno_T,
                        sj_t *sj_group, int sj_n, read_trans_t *updated_T,
                        read_trans_t *known_T, read_trans_t *novel_T,
                        read_trans_t *unrecog_T, update_gtf_para *ugp);
extern int sj_group_comp(const void *_a, const void *_b);
extern void add_anno_trans(read_trans_t *r, trans_t t);

/* =================== constructors =================== */

/* Build a read-derived transcript exactly like read_bam_trans
 * (reference bam2gtf.c:89-110): all-novel flag init + set_trans_name. */
trans_t *o_mk_read_trans(int32_t tid, int32_t is_rev, const int32_t *starts,
                         const int32_t *ends, int32_t n, const char *name)
{
    trans_t *t = trans_init(1);
    int i;
    for (i = 0; i < n; ++i) add_exon(t, tid, starts[i], ends[i], (uint8_t)is_rev);
    t->full = 0, t->lfull = 0, t->lnoth = 1, t->rfull = 0, t->rnoth = 1;
    t->known = 0; t->has_known_site = 0; t->has_unreliable_junction = 0; t->partial_read = 0;
    t->novel_exon_flag = (uint8_t*)malloc(t->exon_n); memset(t->novel_exon_flag, 1, t->exon_n);
    t->novel_site_flag = (uint8_t*)malloc((size_t)(t->exon_n-1)*2); memset(t->novel_site_flag, 1, (size_t)(t->exon_n-1)*2);
    t->novel_junction_flag = (uint8_t*)malloc(t->exon_n-1); memset(t->novel_junction_flag, 1, t->exon_n-1);
    t->unreliable_junction_flag = (uint8_t*)malloc(t->exon_n-1); memset(t->unreliable_junction_flag, 0, t->exon_n-1);
    set_trans_name(t, (char*)name, (char*)name, (char*)name, (char*)name);
    return t;
}

/* Build an annotation transcript like read_anno_trans (gtf.c:468-521):
 * no novelty-flag arrays, gene ids set. */
trans_t *o_mk_anno_trans(int32_t tid, int32_t is_rev, const int32_t *starts,
                         const int32_t *ends, int32_t n, const char *gid,
                         const char *gname)
{
    trans_t *t = trans_init(1);
    int i;
    for (i = 0; i < n; ++i) add_exon(t, tid, starts[i], ends[i], (uint8_t)is_rev);
    strncpy(t->gene_id, gid, 99); strncpy(t->gene_name, gname, 99);
    strcpy(t->trans_id, "anno"); strcpy(t->trans_name, "anno");
    set_trans_name(t, NULL, NULL, NULL, NULL);
    return t;
}

void o_free_trans(trans_t *t) { read_trans_free1(t); }
void o_free_anno_trans(trans_t *t) { free(t->exon); free(t); }

/* =================== containers =================== */

read_trans_t *o_rt_new(void) { return read_trans_init(1); }
void o_rt_add(read_trans_t *r, trans_t *t) { add_read_trans(r, *t); }
void o_rt_add_anno(read_trans_t *r, trans_t *t) { add_anno_trans(r, *t); }
int32_t o_rt_n(read_trans_t *r) { return r->trans_n; }
trans_t *o_rt_get(read_trans_t *r, int32_t i) { return r->t + i; }
void o_rt_free(read_trans_t *r) { read_trans_free(r); }
/* anno containers: entries have no flag arrays -> free exons only */
void o_rt_free_anno(read_trans_t *r)
{
    int i;
    for (i = 0; i < r->trans_n; ++i) free(r->t[i].exon);
    free(r->t); free(r);
}

/* =================== getters / setters =================== */

int32_t o_exon_n(trans_t *t) { return t->exon_n; }
int32_t o_tid(trans_t *t) { return t->tid; }
int32_t o_start(trans_t *t) { return t->start; }
int32_t o_end(trans_t *t) { return t->end; }
int32_t o_is_rev(trans_t *t) { return t->is_rev; }
int32_t o_cov(trans_t *t) { return t->cov; }
const char *o_gene_id(trans_t *t) { return t->gene_id; }
const char *o_gene_name(trans_t *t) { return t->gene_name; }
const char *o_trans_id(trans_t *t) { return t->trans_id; }

void o_get_exons(trans_t *t, int32_t *starts, int32_t *ends)
{
    int i;
    for (i = 0; i < t->exon_n; ++i) { starts[i] = t->exon[i].start; ends[i] = t->exon[i].end; }
}

/* out[9] = full,lfull,lnoth,rfull,rnoth,known,has_known_site,
 *          has_unreliable_junction,partial_read */
void o_get_state(trans_t *t, int32_t *out)
{
    out[0] = t->full; out[1] = t->lfull; out[2] = t->lnoth;
    out[3] = t->rfull; out[4] = t->rnoth; out[5] = t->known;
    out[6] = t->has_known_site; out[7] = t->has_unreliable_junction;
    out[8] = t->partial_read;
}

void o_get_novel(trans_t *t, uint8_t *exon_f, uint8_t *site_f,
                 uint8_t *junc_f, uint8_t *unrel_f)
{
    int n = t->exon_n;
    if (exon_f && t->novel_exon_flag) memcpy(exon_f, t->novel_exon_flag, n);
    if (n > 1) {
        if (site_f && t->novel_site_flag) memcpy(site_f, t->novel_site_flag, (size_t)(n-1)*2);
        if (junc_f && t->novel_junction_flag) memcpy(junc_f, t->novel_junction_flag, n-1);
        if (unrel_f && t->unreliable_junction_flag) memcpy(unrel_f, t->unreliable_junction_flag, n-1);
    }
}

void o_set_novel(trans_t *t, const uint8_t *exon_f, const uint8_t *site_f,
                 const uint8_t *junc_f, const uint8_t *unrel_f)
{
    int n = t->exon_n;
    if (exon_f) memcpy(t->novel_exon_flag, exon_f, n);
    if (n > 1) {
        if (site_f) memcpy(t->novel_site_flag, site_f, (size_t)(n-1)*2);
        if (junc_f) memcpy(t->novel_junction_flag, junc_f, n-1);
        if (unrel_f) memcpy(t->unreliable_junction_flag, unrel_f, n-1);
    }
}

/* =================== SJ table + params =================== */

sj_t *o_mk_sj(int32_t n, const int32_t *tid, const int32_t *don,
              const int32_t *acc, const int32_t *uniq_c, const int32_t *multi_c)
{
    sj_t *sj = (sj_t*)calloc(n > 0 ? n : 1, sizeof(sj_t));
    int i;
    for (i = 0; i < n; ++i) {
        sj[i].tid = tid[i]; sj[i].don = don[i]; sj[i].acc = acc[i];
        sj[i].uniq_c = uniq_c[i]; sj[i].multi_c = multi_c[i];
    }
    /* read_sj_group sorts by (tid,don,acc) — gtf.c:447 */
    qsort(sj, n, sizeof(sj_t), sj_group_comp);
    return sj;
}
void o_free_sj(sj_t *sj) { free(sj); }

update_gtf_para *o_mk_ugp(int32_t min_sj_cnt, int32_t ss_dis, int32_t end_dis,
                          int32_t full_level, int32_t split, int32_t use_multi,
                          int32_t force_strand, double single_exon_ovlp_frac)
{
    update_gtf_para *ugp = update_gtf_init_para();
    ugp->min_sj_cnt = min_sj_cnt; ugp->ss_dis = ss_dis; ugp->end_dis = end_dis;
    ugp->full_level = full_level; ugp->split_trans = split;
    ugp->use_multi = (uint8_t)use_multi; ugp->force_strand = (uint8_t)force_strand;
    ugp->single_exon_ovlp_frac = (float)single_exon_ovlp_frac;
    return ugp;
}
void o_free_ugp(update_gtf_para *ugp) { free(ugp); }

/* =================== oracle entry points =================== */

int32_t o_check_iden(trans_t *t1, trans_t *t2, int32_t ss_dis, int32_t end_dis)
{ return check_iden(t1, t2, ss_dis, end_dis); }

int32_t o_check_splice_site(trans_t *bam_t, trans_t *anno_t, int32_t dis)
{ return check_splice_site(bam_t, *anno_t, dis); }

void o_check_full(trans_t *t, trans_t *anno_t, int32_t level)
{ check_full(t, *anno_t, level); }

void o_set_full(trans_t *t, int32_t level) { set_full(t, level); }

void o_check_with_anno_trans(trans_t *bam_t, read_trans_t *anno_T,
                             int32_t *last_anno_i, update_gtf_para *ugp)
{ check_with_anno_trans(bam_t, anno_T, (int*)last_anno_i, ugp); }

int32_t o_check_with_short_sj(trans_t *bam_t, sj_t *sj, int32_t sj_n,
                              int32_t *last_sj_i, update_gtf_para *ugp)
{ return check_with_short_sj(bam_t, sj, sj_n, (int*)last_sj_i, ugp); }

int32_t o_merge_trans(trans_t *t, read_trans_t *T, int32_t force_strand,
                      int32_t ss_dis, int32_t end_dis, double frac)
{ return merge_trans(t, T, force_strand, ss_dis, end_dis, (float)frac); }

read_trans_t *o_split_trans(trans_t *bam_t) { return split_trans(bam_t); }

void o_check_trans(read_trans_t *bam_T, read_trans_t *anno_T, sj_t *sj,
                   int32_t sj_n, read_trans_t *updated_T, read_trans_t *known_T,
                   read_trans_t *novel_T, read_trans_t *unrecog_T,
                   update_gtf_para *ugp)
{ check_trans(bam_T, anno_T, sj, sj_n, updated_T, known_T, novel_T, unrecog_T, ugp); }

/* =================== bam2gtf / bam2sj / fusion oracle =================== */

extern int gen_trans(bam1_t *b, trans_t *t, int exon_min, int intron_len,
                     int deletion_max);
extern uint8_t intr_deri_str(kseq_t *seq, int seq_n, int tid, int start,
                             int end, uint8_t *motif_i);
extern int gen_sj(uint8_t is_uniq, int tid, int start, int n_cigar,
                  uint32_t *c, kseq_t *seq, int seq_n, sj_t **sj, int *sj_m,
                  void *sjp);
extern void *sj_init_para(void);
extern int sj_update_group(sj_t **SJ_group, int *SJ_n, int *SJ_m, sj_t *sj,
                           int sj_n);
extern int check_fusion(bam_seg_t *seg, int rlen, int seg_n,
                        bam_fusion_para *bfp);
extern int check_with_exist1(bam_seg_t *s1, bam_seg_t *s2,
                             bam_fusion_para *bfp);
extern float bam_seg_cov(bam_seg_t *seg, int n, int rlen);

/* Fabricate a record in the stub layout: qname + cigar + optional
 * XS:A:<xs>, NH:i:<nh>, NM:i:<nm> aux records (negative int tag =
 * absent).  l_qseq is carried in core only (no packed seq needed by the
 * compiled reference paths). */
bam1_t *o_mk_bam(int32_t tid, int32_t pos0, int32_t flag,
                 const uint32_t *cigar, int32_t n_cigar, const char *qname,
                 int32_t xs, int32_t nh, int32_t nm, int32_t l_qseq)
{
    bam1_t *b = bam_init1();
    int l_qname = (int)strlen(qname) + 1;
    int l_aux = (xs ? 4 : 0) + (nh >= 0 ? 7 : 0) + (nm >= 0 ? 7 : 0);
    b->core.tid = tid; b->core.pos = pos0; b->core.flag = (uint16_t)flag;
    b->core.l_qname = l_qname; b->core.n_cigar = n_cigar;
    b->core.l_qseq = l_qseq;
    b->l_data = b->m_data = l_qname + 4 * n_cigar + l_aux;
    b->data = (uint8_t*)malloc(b->l_data);
    memcpy(b->data, qname, l_qname);
    memcpy(b->data + l_qname, cigar, 4 * (size_t)n_cigar);
    uint8_t *p = b->data + l_qname + 4 * n_cigar;
    if (xs) { p[0] = 'X'; p[1] = 'S'; p[2] = 'A'; p[3] = (uint8_t)xs; p += 4; }
    if (nh >= 0) {
        p[0] = 'N'; p[1] = 'H'; p[2] = 'i';
        memcpy(p + 3, &nh, 4);
        p += 7;
    }
    if (nm >= 0) {
        p[0] = 'N'; p[1] = 'M'; p[2] = 'i';
        memcpy(p + 3, &nm, 4);
    }
    return b;
}

void o_free_bam(bam1_t *b) { bam_destroy1(b); }

/* CIGAR -> exon chain (reference gen_trans/gen_exon, bam2gtf.c:31-87). */
trans_t *o_gen_trans(bam1_t *b, int32_t exon_min, int32_t intron_len,
                     int32_t deletion_max)
{
    trans_t *t = trans_init(1);
    gen_trans(b, t, exon_min, intron_len, deletion_max);
    return t;
}

static kseq_t *mk_genome(const char **seqs, int n)
{
    kseq_t *g = (kseq_t*)calloc(n > 0 ? n : 1, sizeof(kseq_t));
    int i;
    for (i = 0; i < n; ++i) {
        g[i].seq.s = (char*)seqs[i];
        g[i].seq.l = strlen(seqs[i]);
    }
    return g;
}

/* donor/acceptor dinucleotides -> (strand, motif) — parse_bam.c:319-337 */
int32_t o_intr_deri_str(const char **seqs, int32_t seq_n, int32_t tid,
                        int32_t start, int32_t end, uint8_t *motif_i)
{
    kseq_t *g = mk_genome(seqs, seq_n);
    uint8_t strand = intr_deri_str(g, seq_n, tid, start, end, motif_i);
    free(g);
    return strand;
}

/* CIGAR -> junction list (reference gen_sj, parse_bam.c:402-442).
 * Uses sj_init_para() defaults (intron_len = INTRON_MIN_LEN).  Returns
 * the junction count; fills parallel out arrays (caller sizes >= n_cigar). */
int32_t o_gen_sj(int32_t is_uniq, int32_t tid, int32_t start1,
                 const uint32_t *cigar, int32_t n_cigar,
                 const char **seqs, int32_t seq_n,
                 int32_t *don, int32_t *acc, uint8_t *strand,
                 uint8_t *motif, int32_t *uniq_c, int32_t *multi_c)
{
    kseq_t *g = mk_genome(seqs, seq_n);
    void *sjp = sj_init_para();
    int sj_m = n_cigar > 0 ? n_cigar : 1;
    sj_t *sj = (sj_t*)calloc(sj_m, sizeof(sj_t));
    int n = gen_sj((uint8_t)is_uniq, tid, start1, n_cigar, (uint32_t*)cigar,
                   g, seq_n, &sj, &sj_m, sjp);
    int i;
    for (i = 0; i < n; ++i) {
        don[i] = sj[i].don; acc[i] = sj[i].acc;
        strand[i] = sj[i].strand; motif[i] = sj[i].motif;
        uniq_c[i] = sj[i].uniq_c; multi_c[i] = sj[i].multi_c;
    }
    free(sj); free(sjp); free(g);
    return n;
}

/* sorted-insert dedup + count accumulation (parse_bam.c:353-380).
 * in arrays length n are applied one record at a time like bam2sj_core;
 * returns final group size, fills out arrays (caller sizes >= n). */
int32_t o_sj_update_group(const int32_t *tid, const int32_t *don,
                          const int32_t *acc, const uint8_t *strand,
                          const uint8_t *motif, const int32_t *uniq_c,
                          const int32_t *multi_c, int32_t n,
                          int32_t *o_tid, int32_t *o_don, int32_t *o_acc,
                          uint8_t *o_strand, uint8_t *o_motif,
                          int32_t *o_uniq, int32_t *o_multi)
{
    int SJ_n = 0, SJ_m = 8;
    sj_t *SJ = (sj_t*)calloc(SJ_m, sizeof(sj_t));
    int i;
    for (i = 0; i < n; ++i) {
        sj_t s;
        memset(&s, 0, sizeof(s));
        s.tid = tid[i]; s.don = don[i]; s.acc = acc[i];
        s.strand = strand[i] & 3; s.motif = motif[i] & 7;
        s.uniq_c = uniq_c[i]; s.multi_c = multi_c[i];
        sj_update_group(&SJ, &SJ_n, &SJ_m, &s, 1);
    }
    for (i = 0; i < SJ_n; ++i) {
        o_tid[i] = SJ[i].tid; o_don[i] = SJ[i].don; o_acc[i] = SJ[i].acc;
        o_strand[i] = SJ[i].strand; o_motif[i] = SJ[i].motif;
        o_uniq[i] = SJ[i].uniq_c; o_multi[i] = SJ[i].multi_c;
    }
    free(SJ);
    return SJ_n;
}

/* Greedy fusion segment selection (bam_fusion.c:67-129).  Segments given
 * as parallel arrays; returns check_fusion's result and writes the
 * selected segment order's fields back into the arrays (post-qsort). */
int32_t o_check_fusion(int32_t *tid, int32_t *is_rev, int32_t *score,
                       int32_t *ed, int32_t *read_start, int32_t *read_end,
                       int32_t *ref_start, int32_t *ref_end, int32_t seg_n,
                       int32_t rlen, double ovlp_frac, double each_cov,
                       double all_cov, int32_t dis)
{
    bam_seg_t *seg = bam_seg_init(seg_n);
    bam_fusion_para bfp;
    bfp.ovlp_frac = (float)ovlp_frac; bfp.each_cov = (float)each_cov;
    bfp.all_cov = (float)all_cov; bfp.dis = dis; bfp.fs_fp = NULL;
    int i;
    for (i = 0; i < seg_n; ++i) {
        seg[i].tid = tid[i]; seg[i].is_rev = is_rev[i];
        seg[i].score = score[i]; seg[i].ed = ed[i];
        seg[i].read_start = read_start[i]; seg[i].read_end = read_end[i];
        seg[i].ref_start = ref_start[i]; seg[i].ref_end = ref_end[i];
    }
    int ret = check_fusion(seg, rlen, seg_n, &bfp);
    for (i = 0; i < seg_n; ++i) {
        tid[i] = seg[i].tid; is_rev[i] = seg[i].is_rev;
        score[i] = seg[i].score; ed[i] = seg[i].ed;
        read_start[i] = seg[i].read_start; read_end[i] = seg[i].read_end;
        ref_start[i] = seg[i].ref_start; ref_end[i] = seg[i].ref_end;
    }
    bam_seg_free(seg, seg_n);
    return ret;
}

/* filter gates (bam_filter.c:49-86): coverage / identity / rm-overlap */
extern int gtf_filter(bam1_t *b, int *score, int *intron_n, float cov_rate,
                      float map_qual, read_trans_t *r);

int32_t o_gtf_filter(bam1_t *b, read_trans_t *rm, double cov_rate,
                     double map_qual, int32_t *score, int32_t *intron_n)
{
    return gtf_filter(b, (int*)score, (int*)intron_n, (float)cov_rate,
                      (float)map_qual, rm);
}

/* cross-sample dedup (unique_gtf.c:73-84) */
extern int uniq_trans(read_trans_t *bam_T, read_trans_t *uniq_T,
                      read_trans_t *shared_T, unique_gtf_para *ugp);

int32_t o_uniq_trans(read_trans_t *bam_T, read_trans_t *uniq_T,
                     read_trans_t *shared_T, int32_t force_strand,
                     int32_t ss_dis, int32_t end_dis, double frac)
{
    unique_gtf_para ugp;
    memset(&ugp, 0, sizeof(ugp));
    ugp.force_strand = force_strand; ugp.ss_dis = ss_dis;
    ugp.end_dis = end_dis; ugp.single_exon_ovlp_frac = (float)frac;
    return uniq_trans(bam_T, uniq_T, shared_T, &ugp);
}

int32_t o_check_with_exist1(int32_t tid1, int32_t rs1, int32_t re1,
                            int32_t fs1, int32_t fe1,
                            int32_t tid2, int32_t rs2, int32_t re2,
                            int32_t fs2, int32_t fe2,
                            double ovlp_frac, int32_t dis)
{
    bam_seg_t s1, s2;
    memset(&s1, 0, sizeof(s1)); memset(&s2, 0, sizeof(s2));
    s1.tid = tid1; s1.read_start = rs1; s1.read_end = re1;
    s1.ref_start = fs1; s1.ref_end = fe1;
    s2.tid = tid2; s2.read_start = rs2; s2.read_end = re2;
    s2.ref_start = fs2; s2.ref_end = fe2;
    bam_fusion_para bfp;
    memset(&bfp, 0, sizeof(bfp));
    bfp.ovlp_frac = (float)ovlp_frac; bfp.dis = dis;
    return check_with_exist1(&s1, &s2, &bfp);
}

/* ====== STAR SJ.out.tab consumption oracle (reference gtf.c:431-449) ===== */

/* Parse a real SJ.out.tab file through the reference's own read_sj_group,
 * seeding the chr_name_t the way the pipeline does (bam_set_cname from the
 * alignment header, gtf.c:405-412) so get_chr_id append semantics for
 * unseen chromosomes are exercised too.  Returns the sorted sj_t array;
 * the final chromosome registry is flattened into names_out (100 bytes
 * per name, reference chr_name_init stride). */
sj_t *o_read_sj_file(const char *path, const char *const *chrs,
                     int32_t chr_n, int32_t *out_n, char *names_out,
                     int32_t names_cap, int32_t *out_chr_n)
{
    chr_name_t *cname = chr_name_init();
    int i;
    for (i = 0; i < chr_n; ++i) get_chr_id(cname, (char *)chrs[i]);
    FILE *fp = fopen(path, "r");
    if (!fp) { chr_name_free(cname); return NULL; }
    int sj_m = 4;
    sj_t *sj_group = (sj_t *)_err_malloc(sj_m * sizeof(sj_t));
    *out_n = read_sj_group(fp, cname, &sj_group, sj_m);
    fclose(fp);
    *out_chr_n = cname->chr_n;
    for (i = 0; i < cname->chr_n && i < names_cap; ++i)
        strcpy(names_out + i * 100, cname->chr_name[i]);
    chr_name_free(cname);
    return sj_group;
}

/* Export every sj_t field (incl. the bitfields strand:2 / is_anno:2 /
 * motif:3, whose width truncation is itself reference behavior). */
void o_sj_cols(const sj_t *sj, int32_t n, int32_t *tid, int32_t *don,
               int32_t *acc, int32_t *strand, int32_t *is_rev,
               int32_t *motif, int32_t *is_anno, int32_t *uniq_c,
               int32_t *multi_c, int32_t *max_over)
{
    int i;
    for (i = 0; i < n; ++i) {
        tid[i] = sj[i].tid; don[i] = sj[i].don; acc[i] = sj[i].acc;
        strand[i] = sj[i].strand; is_rev[i] = sj[i].is_rev;
        motif[i] = sj[i].motif; is_anno[i] = sj[i].is_anno;
        uniq_c[i] = sj[i].uniq_c; multi_c[i] = sj[i].multi_c;
        max_over[i] = sj[i].max_over;
    }
}
