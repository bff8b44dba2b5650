from .aligner import SpliceAligner, AlignParams
