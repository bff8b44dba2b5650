from .bam2sj import bam2sj_records, intron_motif_of
