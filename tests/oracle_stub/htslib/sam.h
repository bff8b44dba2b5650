/* Minimal htslib stub used ONLY to compile the reference's classifier
 * sources (/root/reference/src/{gtf,update_gtf}.c) into a differential
 * test oracle (see tests/reforacle.py).
 *
 * It provides exactly the types and declarations those two translation
 * units reference at compile time.  None of the declared functions are
 * ever called on oracle code paths; aborting stub definitions live in
 * tests/oracle_stub/shim.c so the resulting shared library has no
 * undefined symbols.
 */
#ifndef ORACLE_STUB_HTSLIB_SAM_H
#define ORACLE_STUB_HTSLIB_SAM_H

#include <stdint.h>

/* bam_set_cname (reference gtf.c:405) iterates n_targets/target_name. */
typedef struct {
    int32_t n_targets;
    char **target_name;
} bam_hdr_t;

typedef struct {
    int unused;
} bam1_t;

typedef struct {
    int unused;
} samFile;

typedef struct {
    int unused;
} hts_idx_t;

typedef struct {
    int unused;
} hts_itr_t;

samFile *sam_open(const char *fn, const char *mode);
bam_hdr_t *sam_hdr_read(samFile *fp);
int sam_close(samFile *fp);
int sam_read1(samFile *fp, bam_hdr_t *h, bam1_t *b);
int bam_name2id(bam_hdr_t *h, const char *ref);
bam1_t *bam_init1(void);
void bam_destroy1(bam1_t *b);
void bam_hdr_destroy(bam_hdr_t *h);

#endif
