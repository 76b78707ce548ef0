"""Ray Data stages — each a batch transform over ``ray.data.Dataset``.

Stateless transforms are plain functions passed to ``map_batches(fn,
batch_format="pyarrow")``; stateful ones (compiled kernels, models) are
callable classes run as actor pools (``map_batches(Cls, concurrency=(1,N))``),
mirroring the reference's build-once/query-many matcher lifecycle
(``takco/cluster/matchers/matcher.py:33-121``) without any shared mutable
index. Grouped operators with many tiny groups go through
``groupmap.partitioned_group_map`` (numpy segment ops, no per-group Python).
"""

from .normalize import add_fingerprint_columns, normalize_content, FINGERPRINT_COLUMNS
from .minhash import SignatureStage
from .blocking import emit_band_rows, band_key_stats, candidate_pairs, block_size_stats
from .scoring import PairScorer, score_pairs
from .components import (
    connected_components,
    cc_forest,
    attach_singletons,
    star_edges,
    label_rows,
)
from .dedup import exact_dedup, minhash_dedup, simhash_dedup, ngram_jaccard_pairs
from .groupmap import partitioned_group_map
from .temporal import sessionize, asof_join, range_join, rolling_window_count

__all__ = [
    "add_fingerprint_columns",
    "normalize_content",
    "FINGERPRINT_COLUMNS",
    "SignatureStage",
    "emit_band_rows",
    "band_key_stats",
    "candidate_pairs",
    "block_size_stats",
    "PairScorer",
    "score_pairs",
    "connected_components",
    "cc_forest",
    "attach_singletons",
    "star_edges",
    "label_rows",
    "exact_dedup",
    "minhash_dedup",
    "simhash_dedup",
    "ngram_jaccard_pairs",
    "partitioned_group_map",
    "sessionize",
    "asof_join",
    "range_join",
    "rolling_window_count",
]
from .report import score_clusters

__all__.append("score_clusters")
