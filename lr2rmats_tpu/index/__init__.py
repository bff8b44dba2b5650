from .minimizer import MinimizerIndex, extract_minimizers
