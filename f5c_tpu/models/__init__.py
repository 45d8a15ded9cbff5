from .pore_model import (
    PoreModel,
    load_model_file,
    builtin_model,
    kmer_ranks_dna,
    kmer_ranks_meth,
    BUILTIN_MODELS,
)

__all__ = [
    "PoreModel",
    "load_model_file",
    "builtin_model",
    "kmer_ranks_dna",
    "kmer_ranks_meth",
    "BUILTIN_MODELS",
]
