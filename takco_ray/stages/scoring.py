"""Pairwise scoring actor pool.

The reference scores candidate pairs per matcher in 10k-pair chunks
(``takco/cluster/cluster.py:29-35, 399-431``) and combines channels with a
numexpr-style DSL (``cluster.py:214-243``). Here the scorer is a callable
class run as ``map_batches(PairScorer, concurrency=(lo, hi))`` — the DSL is
compiled and the kernels prepared ONCE per actor in ``__init__``, and each
``__call__`` is a vectorized pass over a batch of candidate pairs.

Channels:

- ``content_minhash`` — positional digest-equality mean over the two MinHash
  signatures, the exact Jaccard estimator of the reference (``lsh.py:244``);
- ``path_jw`` — Jaro-Winkler on the (short) path strings;
- ``path_lev`` — normalized Levenshtein on paths;
- ``size_ratio`` — min/max byte size;
- ``lang_eq`` — 0/1 language equality.

The default aggregation mirrors the flagship's shape
(``resources/pipelines/wikitables.toml``): content similarity dominates,
path channels only break near-threshold ties.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.aggdsl import compile_agg_expr
from ..functions.minhash import jaccard_from_signatures
from ..functions.strings import jaro_winkler, levenshtein_ratio_batch
from .minhash import signatures_to_numpy

DEFAULT_AGG_EXPR = "@max(content_minhash, @mean(content_minhash, @pow(path_jw, 4)))"
DEFAULT_THRESHOLD = 0.65


class PairScorer:
    """Candidate-pair batch → thresholded edge batch ``(u, v, score)``.

    Emitting only above-threshold edges keeps the CC input tiny (24 B/row)
    regardless of candidate volume. Set ``keep_all=True`` to emit every
    scored pair (used by tests and score audits).
    """

    def __init__(
        self,
        agg_expr: str = DEFAULT_AGG_EXPR,
        threshold: float = DEFAULT_THRESHOLD,
        keep_all: bool = False,
        compute_path_channels: bool = True,
    ):
        self.agg = compile_agg_expr(agg_expr)
        self.threshold = threshold
        self.keep_all = keep_all
        self.compute_path_channels = compute_path_channels

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        if n == 0:
            return _empty_edges()
        sig1 = signatures_to_numpy(batch.column("sig1"))
        sig2 = signatures_to_numpy(batch.column("sig2"))
        channels: dict = {
            "content_minhash": jaccard_from_signatures(sig1, sig2),
        }
        sizes1 = np.asarray(batch.column("size1").combine_chunks(), dtype=np.float64)
        sizes2 = np.asarray(batch.column("size2").combine_chunks(), dtype=np.float64)
        channels["size_ratio"] = np.minimum(sizes1, sizes2) / np.maximum(
            np.maximum(sizes1, sizes2), 1.0
        )
        channels["lang_eq"] = (
            np.asarray(batch.column("lang1")) == np.asarray(batch.column("lang2"))
        ).astype(np.float64)
        if "type_hist1" in batch.column_names and "type_hist2" in batch.column_names:
            # reference TypeCosMatcher analog (takco/cluster/matchers/
            # typecos.py): cosine between the two files' character-class
            # distributions (computed once in the signature stage, 5 floats
            # per side riding the pair rows)
            from ..functions.featurize import cosine_rows

            channels["type_cos"] = cosine_rows(
                _pair_vectors(batch.column("type_hist1")),
                _pair_vectors(batch.column("type_hist2")),
            )
        if "emb1" in batch.column_names and "emb2" in batch.column_names:
            # optional embedding channel — the reference's EmbeddingMatcher
            # (embedding.py:222-246) as a per-pair cosine over whatever
            # vector column rode through blocking. Cheap (one einsum), so
            # computed up front with the other always-on channels; when the
            # column is absent the DSL sees NaN and skips it (aggdsl).
            from ..functions.featurize import cosine_rows

            channels["emb_cos"] = cosine_rows(
                _pair_vectors(batch.column("emb1")),
                _pair_vectors(batch.column("emb2")),
            )
        if self.compute_path_channels:
            # Bound-gating: every DSL op (max/min/mean/sum/prod/pow with
            # constant exponents) is monotone nondecreasing in its channel
            # values on [0,1], so evaluating with the path channels pinned to
            # 0 and to 1 brackets the true score. Only pairs whose verdict
            # the bracket leaves open pay the string kernels — typically a
            # few % (real dups already clear θ on content similarity alone).
            zeros, ones = np.zeros(n), np.ones(n)
            lo = np.asarray(
                self.agg({**channels, "path_jw": zeros, "path_lev": zeros}),
                dtype=np.float64,
            )
            hi = np.asarray(
                self.agg({**channels, "path_jw": ones, "path_lev": ones}),
                dtype=np.float64,
            )
            if self.keep_all:
                uncertain = np.ones(n, dtype=bool)  # exact scores wanted
            else:
                uncertain = (hi >= self.threshold) & (lo < self.threshold)
            score = lo  # decided pairs report the paths-floored score
            u_idx = np.nonzero(uncertain)[0]
            if len(u_idx):
                sub = batch.select(["path1", "path2"]).take(
                    pa.array(u_idx, type=pa.int64())
                )
                p1 = sub.column("path1").to_pylist()
                p2 = sub.column("path2").to_pylist()
                sub_ch = {k: np.asarray(v)[u_idx] for k, v in channels.items()}
                sub_ch["path_jw"] = np.fromiter(
                    (jaro_winkler(a or "", b or "") for a, b in zip(p1, p2)),
                    dtype=np.float64,
                    count=len(u_idx),
                )
                sub_ch["path_lev"] = levenshtein_ratio_batch(
                    [x or "" for x in p1], [x or "" for x in p2]
                )
                score = score.copy()
                score[u_idx] = np.asarray(self.agg(sub_ch), dtype=np.float64)
        else:
            score = np.asarray(self.agg(channels), dtype=np.float64)
        keep = np.ones(n, dtype=bool) if self.keep_all else score >= self.threshold
        idx = np.nonzero(keep)[0]
        taken = batch.select(["id1", "id2"]).take(pa.array(idx, type=pa.int64()))
        return pa.table(
            {
                "u": taken.column("id1").cast(pa.int64()),
                "v": taken.column("id2").cast(pa.int64()),
                "score": pa.array(score[idx], type=pa.float64()),
            }
        )


def _pair_vectors(col) -> np.ndarray:
    """fixed_size_list<float> column → (n, d) matrix (slice-safe)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    d = arr.type.list_size
    return np.asarray(arr.flatten(), dtype=np.float64).reshape(len(arr), d)


def _empty_edges() -> pa.Table:
    return pa.table(
        {
            "u": pa.array([], type=pa.int64()),
            "v": pa.array([], type=pa.int64()),
            "score": pa.array([], type=pa.float64()),
        }
    )


def score_pairs(
    pairs,
    agg_expr: str = DEFAULT_AGG_EXPR,
    threshold: float = DEFAULT_THRESHOLD,
    concurrency=None,
    batch_size: int = 4096,
    **kwargs,
):
    """Run the scoring actor pool over a candidate-pair Dataset → edges.

    Default concurrency autoscales from a small floor: a FIXED pool sized to
    the cluster reserves every CPU at DAG launch and starves the upstream
    blocking shuffle it is fused with, while a floor of 1 ramps too slowly —
    (2, cap) lets Ray grow the pool as scored batches queue up.
    """
    from ..util import default_concurrency

    if concurrency is None:
        concurrency = (2, default_concurrency()[1])
    return pairs.map_batches(
        PairScorer,
        fn_constructor_kwargs={"agg_expr": agg_expr, "threshold": threshold, **kwargs},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )
