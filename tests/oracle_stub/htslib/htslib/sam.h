/* stub for bam_fusion.c's #include "../htslib/htslib/sam.h" — resolved via
 * -I tests/oracle_stub/htslib so the relative path lands here. */
#include "../sam.h"
