/* Minimal htslib stub used ONLY to compile the reference's classifier /
 * parser sources (/root/reference/src/{gtf,update_gtf,parse_bam,bam2gtf,
 * bam_fusion}.c) into a differential test oracle (see tests/reforacle.py).
 *
 * It provides the types, macros and declarations those translation units
 * reference at compile time.  The I/O functions are never called on
 * oracle code paths (aborting stub definitions live in shim.c); the aux
 * accessors have real minimal implementations in shim.c because
 * gen_exon / bam_is_uniq_NH read fabricated records at oracle runtime.
 */
#ifndef ORACLE_STUB_HTSLIB_SAM_H
#define ORACLE_STUB_HTSLIB_SAM_H

#include <stdint.h>

/* bam_set_cname (reference gtf.c:405) iterates n_targets/target_name. */
typedef struct {
    int32_t n_targets;
    char **target_name;
} bam_hdr_t;

typedef struct { int unused; } samFile;
typedef struct { int unused; } hts_idx_t;
typedef struct { int unused; } hts_itr_t;

/* --- record model.  Layout is oracle-private (the reference only touches
 * it through the macros below); data = qname (l_qname bytes incl NUL) +
 * cigar (4*n_cigar) + packed aux records.  Fabricated by shim.c::o_mk_bam. */
typedef struct {
    int32_t tid;
    int32_t pos;       /* 0-based leftmost */
    uint16_t flag;
    uint8_t qual;
    int32_t l_qname;
    int32_t n_cigar;
    int32_t l_qseq;
    int32_t mtid, mpos, isize;
} bam1_core_t;

typedef struct {
    bam1_core_t core;
    int l_data, m_data;
    uint8_t *data;
} bam1_t;

/* CIGAR ops + accessors (public htslib API shape) */
#define BAM_CMATCH      0
#define BAM_CINS        1
#define BAM_CDEL        2
#define BAM_CREF_SKIP   3
#define BAM_CSOFT_CLIP  4
#define BAM_CHARD_CLIP  5
#define BAM_CPAD        6
#define BAM_CEQUAL      7
#define BAM_CDIFF       8
#define BAM_CBACK       9
#define bam_cigar_op(c)    ((c) & 0xf)
#define bam_cigar_oplen(c) ((c) >> 4)

/* FLAG bits */
#define BAM_FPAIRED        1
#define BAM_FPROPER_PAIR   2
#define BAM_FUNMAP         4
#define BAM_FMUNMAP        8
#define BAM_FREVERSE      16
#define BAM_FMREVERSE     32
#define BAM_FREAD1        64
#define BAM_FREAD2       128
#define BAM_FSECONDARY   256
#define BAM_FQCFAIL      512
#define BAM_FDUP        1024
#define BAM_FSUPPLEMENTARY 2048

#define bam_is_rev(b)    (((b)->core.flag & BAM_FREVERSE) != 0)
#define bam_get_qname(b) ((char*)(b)->data)
#define bam_get_cigar(b) ((uint32_t*)((b)->data + (b)->core.l_qname))
#define bam_get_aux(b)   ((b)->data + (b)->core.l_qname + 4*(b)->core.n_cigar)
#define bam_get_l_aux(b) ((b)->l_data - (b)->core.l_qname - 4*(b)->core.n_cigar)

samFile *sam_open(const char *fn, const char *mode);
bam_hdr_t *sam_hdr_read(samFile *fp);
int sam_hdr_write(samFile *fp, const bam_hdr_t *h);
int sam_close(samFile *fp);
int sam_read1(samFile *fp, bam_hdr_t *h, bam1_t *b);
int sam_write1(samFile *fp, const bam_hdr_t *h, const bam1_t *b);
int bam_name2id(bam_hdr_t *h, const char *ref);
bam1_t *bam_init1(void);
void bam_destroy1(bam1_t *b);
void bam_hdr_destroy(bam_hdr_t *h);
hts_idx_t *sam_index_load(samFile *fp, const char *fn);
void hts_itr_destroy(hts_itr_t *itr);
bam1_t *bam_copy1(bam1_t *bdst, const bam1_t *bsrc);

uint8_t *bam_aux_get(const bam1_t *b, const char tag[2]);
int64_t bam_aux2i(const uint8_t *s);
char bam_aux2A(const uint8_t *s);

#endif
