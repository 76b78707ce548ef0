"""Text-analysis operators for training-data pipelines.

Language-ID (stopword-profile heuristic), quality scoring (length/punct/
stopword ratios), token counting, and rolling-hash document fingerprinting —
the numeric/type detection heuristics of the reference (numeric-column
voting, ``takco/cluster/matchers/lsh.py:124-128``; cell typing,
``takco/link/types.py:121-142``) generalized to document scoring.

All operators run on the FLAT token stream from
:func:`takco_ray.functions.tokenize.token_stream` (vectorized ASCII scanner
+ FNV token hashes, per-doc regex fallback for non-ASCII): membership tests
are ``searchsorted`` against tiny sorted profile-hash arrays and per-doc
reductions are ``np.add.reduceat`` over segment boundaries — no per-token
or per-row Python anywhere on the hot path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.tokenize import token_stream, python_token_hashes_lengths

# Tiny per-language stopword profiles (public common-word lists) — enough for
# a deterministic heuristic; NOT a trained model (none are available here).
_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "it", "for", "was", "with", "this"},
    "de": {"der", "die", "und", "das", "ist", "nicht", "ein", "mit", "von", "sich", "auf"},
    "fr": {"le", "la", "les", "et", "de", "un", "une", "est", "pas", "pour", "dans", "que"},
    "es": {"el", "la", "los", "de", "que", "y", "en", "un", "una", "es", "por", "con"},
    "nl": {"de", "het", "een", "en", "van", "ik", "dat", "is", "niet", "op", "te", "met"},
}

_TOKEN_SEED = 3


def _profile_hashes(words, seed: int = _TOKEN_SEED) -> np.ndarray:
    """Sorted FNV hashes of a profile word set (same family as the stream)."""
    h, _ = python_token_hashes_lengths(" ".join(sorted(words)), seed)
    return np.sort(h)


def _seg_starts(counts: np.ndarray) -> np.ndarray:
    ends = np.cumsum(counts)
    return (ends - counts).astype(np.int64)


def _member(sorted_arr: np.ndarray, keys: np.ndarray) -> np.ndarray:
    if len(sorted_arr) == 0 or len(keys) == 0:
        return np.zeros(len(keys), dtype=bool)
    pos = np.minimum(np.searchsorted(sorted_arr, keys), len(sorted_arr) - 1)
    return sorted_arr[pos] == keys


def _per_doc_sum(values: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Sum of ``values`` per doc segment; 0 for empty docs."""
    out = np.zeros(len(counts), dtype=np.float64)
    nz = counts > 0
    if nz.any():
        starts = _seg_starts(counts)
        sums = np.add.reduceat(values.astype(np.float64), starts[nz])
        out[nz] = sums
    return out


def token_counts(ds, text_column: str, id_column: str):
    """(id, n_tokens, n_unique_tokens) — whitespace+\\w tokenizer counts."""

    def fn(batch: pa.Table) -> pa.Table:
        hashes, _lens, counts = token_stream(batch.column(text_column), _TOKEN_SEED)
        n_docs = len(counts)
        parents = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
        # distinct per doc: hash-based first-occurrence (exact — hashes are
        # factorized to dense codes so the composite fits int64), same O(n)
        # kernel as functions.shingle.distinct_doc_shingles
        if len(hashes):
            import pandas as pd

            codes, uniq_codes = pd.factorize(hashes.view(np.int64))
            comb = parents * np.int64(len(uniq_codes)) + codes
            first = ~pd.Series(comb).duplicated().to_numpy()
            uniq = np.bincount(parents[first], minlength=n_docs)
        else:
            uniq = np.zeros(n_docs, dtype=np.int64)
        return pa.table(
            {
                "id": batch.column(id_column).cast(pa.int64()),
                "n_tokens": pa.array(counts, type=pa.int64()),
                "n_unique_tokens": pa.array(uniq.astype(np.int64), type=pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def quality_features(col: pa.Array) -> tuple:
    """Per-doc quality doubles for one Arrow string column: ``(n_chars,
    punct_ratio, mean_token_len, stopword_ratio, quality)`` — the shared
    kernel behind :func:`quality_scores` and the fused curation pass
    (``stages/curate.py``). One identical IEEE expression on both engines;
    callers integerize with ``floor(x·10⁶ + 0.5)`` for the typed oracle."""
    en = _profile_hashes(_LANG_PROFILES["en"])
    filled = pc.fill_null(col, "")
    n_chars = np.asarray(pc.utf8_length(filled), dtype=np.float64)
    punct = np.asarray(pc.count_substring_regex(filled, r"[^\w\s]"), dtype=np.float64)
    hashes, lens, counts = token_stream(col, _TOKEN_SEED)
    punct_ratio = punct / np.maximum(n_chars, 1.0)
    tok_f = np.maximum(counts.astype(np.float64), 1.0)
    mean_tok = _per_doc_sum(lens, counts) / tok_f
    stop_ratio = _per_doc_sum(_member(en, hashes), counts) / tok_f
    quality = (
        np.clip(n_chars / 200.0, 0, 1) * 0.25
        + np.clip(1.0 - 4.0 * punct_ratio, 0, 1) * 0.25
        + np.clip(1.0 - np.abs(mean_tok - 5.0) / 5.0, 0, 1) * 0.25
        + np.clip(stop_ratio * 4.0, 0, 1) * 0.25
    )
    return n_chars, punct_ratio, mean_tok, stop_ratio, quality


def quality_scores(ds, text_column: str, id_column: str, units: bool = False):
    """(id, n_chars, punct_ratio, mean_token_len, stopword_ratio, quality).

    ``quality`` ∈ [0,1]: long-enough docs with moderate punctuation, natural
    token lengths and some stopwords score high — the usual cheap pre-filter
    in training-data pipelines. Deterministic, fully vectorized.

    ``units=True`` emits int64 micro-units ``floor(x·10⁶ + 0.5)`` computed
    from the RAW doubles — engine-independent (identical IEEE expression on
    the SQL side; no round() tie-breaking enters), which is what the driver
    oracle compares.
    """
    def fn(batch: pa.Table) -> pa.Table:
        col = batch.column(text_column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n_chars, punct_ratio, mean_tok, stop_ratio, quality = quality_features(col)
        # empty docs: token-derived features are 0 by construction
        if units:
            def u(x):
                return pa.array(
                    np.floor(x * 1e6 + 0.5).astype(np.int64), type=pa.int64()
                )

            return pa.table(
                {
                    "id": batch.column(id_column).cast(pa.int64()),
                    "n_chars": pa.array(n_chars.astype(np.int64), type=pa.int64()),
                    "punct_ratio_u": u(punct_ratio),
                    "mean_token_len_u": u(mean_tok),
                    "stopword_ratio_u": u(stop_ratio),
                    "quality_u": u(quality),
                }
            )
        return pa.table(
            {
                "id": batch.column(id_column).cast(pa.int64()),
                "n_chars": pa.array(n_chars.astype(np.int64), type=pa.int64()),
                "punct_ratio": pa.array(np.round(punct_ratio, 6), type=pa.float64()),
                "mean_token_len": pa.array(np.round(mean_tok, 6), type=pa.float64()),
                "stopword_ratio": pa.array(np.round(stop_ratio, 6), type=pa.float64()),
                "quality": pa.array(np.round(quality, 6), type=pa.float64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


class LanguageId:
    """Actor-pool stage: stopword-profile language scoring per document.

    Profile hash arrays are prepared in ``__init__`` (once per actor); each
    batch is one flat-stream pass — per-language membership via searchsorted,
    per-doc hit counts via ``reduceat``. Ties break deterministically by
    profile order (argmax keeps the first maximum); docs with no stopword
    hits → "und" (undetermined).
    """

    def __init__(self, text_column: str, id_column: str):
        self.text_column = text_column
        self.id_column = id_column
        self.langs = sorted(_LANG_PROFILES)
        self.profiles = [_profile_hashes(_LANG_PROFILES[l]) for l in self.langs]

    def __call__(self, batch: pa.Table) -> pa.Table:
        hashes, _lens, counts = token_stream(batch.column(self.text_column), _TOKEN_SEED)
        n_docs = len(counts)
        hits = np.zeros((n_docs, len(self.langs)), dtype=np.float64)
        for li, prof in enumerate(self.profiles):
            hits[:, li] = _per_doc_sum(_member(prof, hashes), counts)
        best = np.argmax(hits, axis=1)
        best_hits = hits[np.arange(n_docs), best]
        langs = np.asarray(self.langs, dtype=object)[best]
        langs[best_hits == 0] = "und"
        conf = np.round(best_hits / np.maximum(counts.astype(np.float64), 1.0), 6)
        conf[best_hits == 0] = 0.0
        return pa.table(
            {
                "id": batch.column(self.id_column).cast(pa.int64()),
                "lang_pred": pa.array(langs, type=pa.string()),
                "lang_conf": pa.array(conf, type=pa.float64()),
            }
        )


def language_id(ds, text_column: str, id_column: str, concurrency=None):
    from ..util import default_concurrency

    return ds.map_batches(
        LanguageId,
        fn_constructor_kwargs=dict(text_column=text_column, id_column=id_column),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency or default_concurrency(),
    )


def global_token_topk(ds, text_column: str, k: int = 20):
    """Top-``k`` tokens by corpus-wide count — (token, cnt), count-desc then
    token-asc (total order, so the limit is deterministic).

    Map-side combiner: each batch collapses its token stream to (token, cnt)
    partials with Arrow's native hash aggregate, so the shuffle carries one
    row per DISTINCT token per batch, not one per occurrence. Vocabulary
    (not corpus) sized groupby, then a top-k sort on the tiny counts table.
    """
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        col = t.column(text_column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        toks = pc.split_pattern_regex(
            pc.utf8_lower(pc.fill_null(col, "")), r"\W+"
        )
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.not_equal(flat, pa.scalar("")))
        part = pa.table({"token": flat}).group_by("token").aggregate([("token", "count")])
        return pa.table(
            {
                "token": part.column("token"),
                "cnt": part.column("token_count").cast(pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("token")
        .aggregate(Sum("cnt"))
        .rename_columns({"sum(cnt)": "cnt"})
    )
    return agg.sort(["cnt", "token"], descending=[True, False]).limit(k)


def stop_shingles(ds, text_column: str, id_column: str, shingle_k: int = 3, top_k: int = 20):
    """Top-``top_k`` ``shingle_k``-token shingles by DOCUMENT frequency —
    ``(shingle, df)``, df-desc then shingle-asc (total order → deterministic
    limit).

    The stop-shingle mining pass of SURVEY §7.5 #1: shingles shared by huge
    document populations (license headers, codegen boilerplate) are exactly
    what inflates LSH blocks, and demoting the measured heavy hitters is the
    Scarlett-style mitigation the flagship's salting complements. df (docs
    containing the shingle), not total frequency, because block membership
    is per-document.

    Map-side combiner: per batch, the flat token stream rolls into shingle
    strings (vectorized object-array join, doc-boundary masked), Arrow hash
    aggregates collapse to per-doc-DISTINCT then per-batch (shingle, df)
    partials — the shuffle carries one row per distinct shingle per batch.
    Then a vocabulary-sized groupby-sum and a top-k sort pre-trimmed per
    block to ``top_k`` rows.
    """
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        col = t.column(text_column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        toks = pc.split_pattern_regex(pc.utf8_lower(pc.fill_null(col, "")), r"\W+")
        counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        ids = np.asarray(t.column(id_column).combine_chunks(), dtype=np.int64)
        did = np.repeat(ids, counts)
        flat = np.asarray(pc.list_flatten(toks), dtype=object)
        keep = flat != ""
        did, flat = did[keep], flat[keep]
        n = len(flat)
        empty = pa.table(
            {"shingle": pa.array([], type=pa.string()), "df": pa.array([], type=pa.int64())}
        )
        if n < shingle_k:
            return empty
        w = n - shingle_k + 1
        valid = did[:w] == did[shingle_k - 1 :]
        sh = flat[:w]
        for i in range(1, shingle_k):
            sh = sh + " "
            sh = sh + flat[i : w + i]
        tbl = pa.table(
            {
                "did": pa.array(did[:w][valid], type=pa.int64()),
                "shingle": pa.array(sh[valid], type=pa.string()),
            }
        )
        dist = tbl.group_by(["did", "shingle"]).aggregate([])
        part = dist.group_by("shingle").aggregate([("did", "count")])
        return pa.table(
            {
                "shingle": part.column("shingle"),
                "df": part.column("did_count").cast(pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("shingle")
        .aggregate(Sum("df"))
        .rename_columns({"sum(df)": "df"})
    )

    def trim(t: pa.Table) -> pa.Table:
        # per-block pre-trim so the global sort sees ≤ top_k rows per block
        dfv = np.asarray(t.column("df").combine_chunks(), dtype=np.int64)
        sh = np.asarray(t.column("shingle").combine_chunks(), dtype=object)
        # np.unique codes preserve lexicographic order → int lexsort tiebreak
        _u, codes = np.unique(sh, return_inverse=True)
        order = np.lexsort((codes, -dfv))[:top_k]
        return t.take(pa.array(np.sort(order), type=pa.int64()))

    trimmed = agg.map_batches(trim, batch_format="pyarrow", zero_copy_batch=True)
    return trimmed.sort(["df", "shingle"], descending=[True, False]).limit(top_k)


def tfidf_top_terms(ds, text_column: str, id_column: str, k: int = 5):
    """Per-document top-``k`` salient terms ranked by tf/df — the exactness-
    preserving core of TF-IDF (the reference's TfidfMatcher,
    ``docs/benchmarks/snow_pipeline.py``): for a fixed corpus size N,
    ranking by ``tf · idf`` with any monotone idf(df) equals ranking by
    ``tf / df``, and the single IEEE division is bit-identical across
    engines where a ``log`` would not be.

    Plan shape: ONE tokenization pass emits final (doc, token, tf) rows
    (a document never spans batches, so per-batch Arrow hash aggregates are
    already global); df comes from ONE token-keyed grouped pass over those
    same rows — since tf rows are distinct per (doc, token), a token's df
    is simply its row count, so no separate vocabulary aggregate or join
    exists; per-doc top-k runs in a second grouped pass with vectorized
    segment ranking. Output: ``(id, token, tf, df, rank)``, rank 1-based
    by (tf/df desc, token asc).
    """
    from .groupmap import partitioned_group_map

    def tf_rows(t: pa.Table) -> pa.Table:
        import pandas as pd

        col = t.column(text_column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        toks = pc.split_pattern_regex(pc.utf8_lower(pc.fill_null(col, "")), r"\W+")
        flat = pc.list_flatten(toks)
        counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        ids = np.asarray(t.column(id_column).combine_chunks(), dtype=np.int64)
        parents = np.repeat(ids, counts)
        tbl = pa.table({"id": pa.array(parents, type=pa.int64()), "token": flat})
        tbl = tbl.filter(pc.not_equal(tbl.column("token"), pa.scalar("")))
        agg = tbl.group_by(["id", "token"]).aggregate([("token", "count")])
        # routing key only (partition assignment) — exactness never depends
        # on it: the df pass re-groups by the actual token strings
        tok_pk = pd.util.hash_array(
            np.asarray(agg.column("token").combine_chunks(), dtype=object)
        ).astype(np.int64)
        return pa.table(
            {
                "id": agg.column("id"),
                "token": agg.column("token"),
                "tf": agg.column("token_count").cast(pa.int64()),
                "tok_pk": pa.array(tok_pk, type=pa.int64()),
            }
        )

    tf = ds.map_batches(tf_rows, batch_format="pyarrow", zero_copy_batch=True)

    def attach_df(part: pa.Table) -> pa.Table:
        toks = np.asarray(part.column("token").combine_chunks(), dtype=object)
        _uniq, inv = np.unique(toks, return_inverse=True)
        dfs = np.bincount(inv)
        return pa.table(
            {
                "id": part.column("id"),
                "token": part.column("token"),
                "tf": part.column("tf"),
                "df": pa.array(dfs[inv].astype(np.int64), type=pa.int64()),
            }
        )

    joined = partitioned_group_map(tf, "tok_pk", attach_df)

    def topk_partition(t: pa.Table) -> pa.Table:
        ids = np.asarray(t.column("id").combine_chunks(), dtype=np.int64)
        tfv = np.asarray(t.column("tf").combine_chunks(), dtype=np.int64)
        dfv = np.asarray(t.column("df").combine_chunks(), dtype=np.int64)
        toks = t.column("token").combine_chunks()
        # np.unique gives lexicographically sorted uniques → codes preserve
        # string order, so the int lexsort tiebreak equals token-asc
        tok_sorted, tok_codes = np.unique(np.asarray(toks, dtype=object), return_inverse=True)
        score = tfv.astype(np.float64) / dfv.astype(np.float64)
        order = np.lexsort((tok_codes, -score, ids))
        gs = ids[order]
        starts = np.concatenate([[0], np.flatnonzero(gs[1:] != gs[:-1]) + 1]) if len(gs) else np.zeros(0, dtype=np.int64)
        seg_of = np.repeat(np.arange(len(starts)), np.diff(np.append(starts, len(gs))))
        rank = np.arange(len(gs)) - starts[seg_of]
        keep = rank < k
        sel = order[keep]
        return pa.table(
            {
                "id": pa.array(ids[sel], type=pa.int64()),
                "token": pc.take(toks, pa.array(sel, type=pa.int64())),
                "tf": pa.array(tfv[sel], type=pa.int64()),
                "df": pa.array(dfv[sel], type=pa.int64()),
                "rank": pa.array(rank[keep] + 1, type=pa.int64()),
            }
        )

    return partitioned_group_map(joined, "id", topk_partition)


def ngram_repetition(ds, text_column: str, id_column: str, shingle_k: int = 3):
    """(id, n_ngrams, n_unique_ngrams) — duplicate-n-gram quality signal
    (the Gopher-style repetition filter): docs whose n-gram stream is mostly
    repeats are boilerplate/spam. Pure projection over the rolled shingle
    hashes — no shuffle, no per-row Python."""
    from ..functions.shingle import doc_shingles

    def fn(batch: pa.Table) -> pa.Table:
        sh, par, counts = doc_shingles(batch.column(text_column), shingle_k, 41)
        n_docs = len(counts)
        total = np.bincount(par, minlength=n_docs).astype(np.int64)
        if len(sh):
            order = np.lexsort((sh, par))
            shs, pars = sh[order], par[order]
            first = np.concatenate(
                [[True], (pars[1:] != pars[:-1]) | (shs[1:] != shs[:-1])]
            )
            uniq = np.bincount(pars[first], minlength=n_docs).astype(np.int64)
        else:
            uniq = np.zeros(n_docs, dtype=np.int64)
        return pa.table(
            {
                "id": batch.column(id_column).cast(pa.int64()),
                "n_ngrams": pa.array(total, type=pa.int64()),
                "n_unique_ngrams": pa.array(uniq, type=pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


_WINNOW_BASE = np.uint64(0x100000001B3)


def winnow_window_mins(col, window: int, roll_k: int = 4) -> tuple:
    """(mins, n_win, win_off, n_docs) — per-window minimum rolling hashes of
    every doc (the winnowing kernel of Schleimer et al. 2003, MOSS).

    Rolling polynomial hash over ``roll_k``-token windows of the token-hash
    stream, min-sampled per ``window`` values; ``mins`` is flat in doc
    order, doc ``d`` owns ``mins[win_off[d] : win_off[d] + n_win[d]]``.
    Fully vectorized: one global roll pass, a flat gather of kept values,
    ONE ``minimum.reduceat`` across every window of every doc. Shared by
    :func:`fingerprints` (Horner-combines to one value/doc) and the
    shared-fingerprint near-dup pair operator (``dedup.winnow_neardup``).
    """
    base = _WINNOW_BASE
    hashes, _lens, counts = token_stream(col, _TOKEN_SEED)
    n_docs = len(counts)
    n = len(hashes)
    k = roll_k
    if n >= k:
        # global roll; per-doc slices below use only windows fully
        # inside the doc (start ≤ doc_start + count - k)
        roll = hashes[: n - k + 1].copy()
        for j in range(1, k):
            roll *= base
            roll += hashes[j : n - k + 1 + j]
    else:
        roll = np.zeros(0, dtype=np.uint64)
    starts = _seg_starts(counts)
    c = counts.astype(np.int64)
    live = c > 0
    zero_off = np.zeros(n_docs, dtype=np.int64)
    if not live.any():
        return np.zeros(0, dtype=np.uint64), zero_off.copy(), zero_off, n_docs
    # per-doc roll segment: length L from `roll` (c>=k) or `hashes` (c<k)
    use_hash = c < k
    L = np.where(use_hash, c, c - k + 1)
    n_win = np.maximum(L // window, 1)
    kept = np.where(L >= window, n_win * window, L)  # dropped tails excluded
    kept[~live] = 0
    n_win = np.where(live, n_win, 0)
    # flat gather of every kept value from the unified [roll | hashes] pool
    pool = np.concatenate([roll, hashes]) if len(hashes) else roll
    src_base = np.where(use_hash, starts + len(roll), starts)
    doc_off = np.concatenate([[0], np.cumsum(kept)[:-1]])
    total = int(kept.sum())
    intra = np.arange(total, dtype=np.int64) - np.repeat(doc_off, kept)
    flat = pool[np.repeat(src_base, kept) + intra]
    # global window starts: doc_off[d] + i*window for i < n_win[d]
    win_off = np.concatenate([[0], np.cumsum(n_win)[:-1]])
    w_total = int(n_win.sum())
    w_intra = np.arange(w_total, dtype=np.int64) - np.repeat(win_off[live], n_win[live])
    w_starts = np.repeat(doc_off[live], n_win[live]) + w_intra * window
    mins = np.minimum.reduceat(flat, w_starts) if w_total else np.zeros(0, dtype=np.uint64)
    return mins, n_win.astype(np.int64), win_off.astype(np.int64), n_docs


def fingerprints(ds, text_column: str, id_column: str, window: int = 16):
    """(id, fingerprint) — winnowed rolling-hash document fingerprint.

    :func:`winnow_window_mins` per-window minima, Horner-combined to one
    uint64 per doc (``max_windows_per_doc`` vectorized steps over the doc
    axis — no per-doc Python).
    """
    base = _WINNOW_BASE

    def fn(batch: pa.Table) -> pa.Table:
        mins, n_win, win_off, n_docs = winnow_window_mins(
            batch.column(text_column), window
        )
        acc = np.zeros(n_docs, dtype=np.uint64)
        for j in range(int(n_win.max(initial=0))):
            active = n_win > j
            acc[active] = acc[active] * base + mins[win_off[active] + j]
        return pa.table(
            {
                "id": batch.column(id_column).cast(pa.int64()),
                "fingerprint": pa.array(acc, type=pa.uint64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def line_stats(ds, text_column: str, id_column: str):
    """(id, n_lines, n_unique_lines, n_blank_lines) — within-document line
    duplication stats, the cheap boilerplate / template-churn signal (a doc
    whose lines are mostly repeats of each other is generated filler; the
    usual filter is ``n_unique_lines / n_lines``).

    Exact and fully vectorized with NO hash-collision caveat: the flattened
    line array is Arrow ``dictionary_encode``-d (C++ hash table → dense
    codes), per-doc distinct is the shared factorize-composite trick on the
    codes. Pure projection — nothing shuffles; a DuckDB
    ``string_split``/``list_distinct`` oracle reproduces it bit-for-bit.
    """
    import pandas as pd

    def fn(batch: pa.Table) -> pa.Table:
        col = batch.column(text_column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        filled = pc.fill_null(col, "")
        split = pc.split_pattern(filled, "\n")
        counts = np.asarray(pc.list_value_length(split), dtype=np.int64)
        flat = pc.list_flatten(split)
        codes = np.asarray(flat.dictionary_encode().indices, dtype=np.int64)
        par = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        if len(codes):
            comb = par * np.int64(codes.max() + 2) + codes
            first = ~pd.Series(comb).duplicated().to_numpy()
            n_uniq = np.bincount(par[first], minlength=len(counts)).astype(np.int64)
            blank = np.asarray(
                pc.equal(pc.utf8_trim_whitespace(flat), ""), dtype=np.int64
            )
            n_blank = np.bincount(par, weights=blank, minlength=len(counts)).astype(np.int64)
        else:
            n_uniq = np.zeros(len(counts), dtype=np.int64)
            n_blank = np.zeros(len(counts), dtype=np.int64)
        return pa.table(
            {
                "id": batch.column(id_column).cast(pa.int64()),
                "n_lines": pa.array(counts, type=pa.int64()),
                "n_unique_lines": pa.array(n_uniq, type=pa.int64()),
                "n_blank_lines": pa.array(n_blank, type=pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# (priority-ordered; first match wins — GPL v3 before v2 so a v3 header
# that also mentions "version 2" classifies as v3, matching the SQL CASE)
LICENSE_RULES = (
    ("apache-2.0", ("licensed under the apache license",)),
    ("mit", ("permission is hereby granted, free of charge",)),
    ("gpl-3.0", ("gnu general public license", "version 3")),
    ("gpl-2.0", ("gnu general public license", "version 2")),
    ("bsd-3-clause", ("redistribution and use in source and binary forms",)),
    ("mpl-2.0", ("mozilla public license",)),
    ("unlicense", ("this is free and unencumbered software",)),
)
PERMISSIVE = {"apache-2.0", "mit", "bsd-3-clause", "mpl-2.0", "unlicense"}


def license_scan(ds, text_column: str, id_column: str, header_chars: int = 2048):
    """Per-doc SPDX-style license detection from the file header.

    Scans the first ``header_chars`` characters (lowercased) for canonical
    license phrases, priority-ordered (``LICENSE_RULES``); emits
    ``(id, license, permissive)``. Pure Arrow projection — one slice + one
    lower + one ``match_substring`` per phrase, no shuffle, no Python loop —
    the code-corpus curation gate (drop/keep by license) is then a plain
    ``filter``. A phrase table, not a model: the classic license-scanner
    trade (fast, explainable, exact-string recall only), and every rule is
    TOML-visible rather than baked into a binary.

    Reference analog: takco filters corpus slices by metadata predicates
    (``takco/pages.py`` page-type gates); license is the code-corpus
    equivalent of those provenance gates.
    """

    def fn(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch.column(text_column), "")
        head = pc.utf8_lower(pc.utf8_slice_codeunits(text, 0, header_chars))
        n = len(batch)
        label = np.full(n, "none", dtype=object)
        undecided = np.ones(n, dtype=bool)
        perm = np.zeros(n, dtype=np.int64)
        for name, phrases in LICENSE_RULES:
            mask = np.ones(n, dtype=bool)
            for p in phrases:
                mask &= np.asarray(pc.match_substring(head, p), dtype=bool)
            hit = mask & undecided
            label[hit] = name
            if name in PERMISSIVE:
                perm[hit] = 1
            undecided &= ~mask
        return pa.table(
            {
                "id": batch.column(id_column).cast(pa.int64()),
                "license": pa.array(label, type=pa.string()),
                "permissive": pa.array(perm, type=pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
