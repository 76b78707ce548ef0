"""Pure, deterministic, vectorized kernels used inside Ray Data stages.

No Ray imports here — everything is numpy / pyarrow / hashlib so the kernels
can be unit-tested without a cluster and shipped to workers cheaply.
"""

from .hashing import hash64_bytes, hash64_strings, sha256_hex, stable_file_id
from .tokenize import tokenize, tokenize_many
from .minhash import MinHasher, band_keys, jaccard_from_signatures
from .strings import jaccard_tokens, levenshtein_ratio, jaro_winkler
from .aggdsl import compile_agg_expr

__all__ = [
    "hash64_bytes",
    "hash64_strings",
    "sha256_hex",
    "stable_file_id",
    "tokenize",
    "tokenize_many",
    "MinHasher",
    "band_keys",
    "jaccard_from_signatures",
    "jaccard_tokens",
    "levenshtein_ratio",
    "jaro_winkler",
    "compile_agg_expr",
]
