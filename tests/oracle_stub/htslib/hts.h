/* stub for #include "htslib/hts.h" (parse_bam.c:8) — everything the
 * compiled reference sources use is declared in the sibling sam.h stub. */
#ifndef ORACLE_STUB_HTSLIB_HTS_H
#define ORACLE_STUB_HTSLIB_HTS_H
#include "sam.h"
#endif
