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

/* ---- data symbols the reference expects from main.c ---- */
const char PROG[20] = "lr2rmats";

/* ---- aborting stubs for htslib + bam2gtf functions referenced (but
 *      never called) by the compiled translation units ---- */
samFile *sam_open(const char *fn, const char *mode) { (void)fn; (void)mode; abort(); }
bam_hdr_t *sam_hdr_read(samFile *fp) { (void)fp; abort(); }
int sam_close(samFile *fp) { (void)fp; abort(); }
int sam_read1(samFile *fp, bam_hdr_t *h, bam1_t *b) { (void)fp; (void)h; (void)b; abort(); }
int bam_name2id(bam_hdr_t *h, const char *ref) { (void)h; (void)ref; abort(); }
bam1_t *bam_init1(void) { abort(); }
void bam_destroy1(bam1_t *b) { (void)b; abort(); }
void bam_hdr_destroy(bam_hdr_t *h) { (void)h; abort(); }
int read_bam_trans(samFile *in, bam_hdr_t *h, bam1_t *b, int min_exon,
                   int min_intron, int max_delet, read_trans_t *T)
{ (void)in; (void)h; (void)b; (void)min_exon; (void)min_intron; (void)max_delet; (void)T; abort(); }

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
