"""Ray Data stages — each a batch transform over ``ray.data.Dataset``.

Stateless transforms are plain functions passed to ``map_batches(fn,
batch_format="pyarrow")``; stateful ones (compiled kernels, models) are
callable classes run as actor pools (``map_batches(Cls, concurrency=N)``),
mirroring the reference's build-once/query-many matcher lifecycle
(``takco/cluster/matchers/matcher.py:33-121``) without any shared mutable
index.
"""

from .normalize import add_fingerprint_columns, FINGERPRINT_COLUMNS
from .minhash import SignatureStage
from .blocking import emit_band_rows, hot_band_keys, candidate_pairs
from .scoring import PairScorer
from .components import connected_components
from .dedup import exact_dedup, minhash_dedup, simhash_dedup, ngram_jaccard_pairs

__all__ = [
    "add_fingerprint_columns",
    "FINGERPRINT_COLUMNS",
    "SignatureStage",
    "emit_band_rows",
    "hot_band_keys",
    "candidate_pairs",
    "PairScorer",
    "connected_components",
    "exact_dedup",
    "minhash_dedup",
    "simhash_dedup",
    "ngram_jaccard_pairs",
]
