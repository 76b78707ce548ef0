"""Heuristic compound splitting for header / identifier strings.

Analog of the reference's ``CompoundSplitter`` ABC (SURVEY §2 M10/ST6;
reference ``takco/reshape/compound.py:90-95`` and the spaCy-based
``SpacyCompoundSplitter``). No language model exists in this environment,
so the splitter is the code-corpus heuristic: camelCase, snake_case,
kebab-case and letter↔digit boundaries — the identifier conventions of the
source-code north star. Fully vectorized: two Arrow regex passes + one
split per batch, no per-row Python.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# boundary insertion: lower→Upper, letter→digit, digit→letter, ALLCAPS→Word
_BOUNDARIES = [
    (r"([a-z])([A-Z])", r"\1 \2"),
    (r"([A-Za-z])([0-9])", r"\1 \2"),
    (r"([0-9])([A-Za-z])", r"\1 \2"),
    (r"([A-Z]+)([A-Z][a-z])", r"\1 \2"),
]
_SEPS = r"[_\-\.\s]+"


def split_compound(col) -> pa.ChunkedArray | pa.Array:
    """Split each string into its compound parts (list<string>, lowercased).

    ``getHTTPResponse2xx`` → [get, http, response, 2, xx];
    ``snake_case-kebab.dots`` → [snake, case, kebab, dots].
    """
    s = col
    for pat, rep in _BOUNDARIES:
        s = pc.replace_substring_regex(s, pat, rep)
    s = pc.utf8_lower(pc.utf8_trim_whitespace(pc.replace_substring_regex(s, _SEPS, " ")))
    return pc.split_pattern(s, " ")


def compound_parts_stage(ds, column: str, out_col: str = "parts", n_col: str = "n_parts"):
    """map_batches stage: append the parts list + part count per row."""

    def fn(t: pa.Table) -> pa.Table:
        parts = split_compound(t.column(column))
        if isinstance(parts, pa.ChunkedArray):
            parts = parts.combine_chunks()
        return t.append_column(out_col, parts).append_column(
            n_col, pc.cast(pc.list_value_length(parts), pa.int64())
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# --------------------------------------------------------------------------
# corpus-learned segmentation (the offline analog of the reference's
# language-model splitter, ``takco/reshape/compound.py:186-396``: spaCy's
# vocabulary ranks become corpus token frequencies, segmentation becomes
# unigram Viterbi — no external model, the corpus IS the model)
# --------------------------------------------------------------------------

def build_split_vocab(ds, text_col: str, top_k: int = 100_000, min_len: int = 2):
    """Corpus token frequencies → broadcast segmentation vocabulary.

    A map-side per-batch token count (the A4 partial-agg shape) feeds one
    small groupby-sum; the driver keeps the ``top_k`` tokens with their
    log-probability COSTS (-log p, Zipf-smoothed like the published
    wordninja approach) and broadcasts them once via ``ray.put``. Returns
    the object ref for :class:`CorpusCompoundSplitter`.
    """
    import math

    import pyarrow as pa
    import ray as _ray

    from .tokenize import tokenize

    def count_batch(t: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for s in t.column(text_col).to_pylist():
            for tok in tokenize(s or ""):
                if len(tok) >= min_len and not tok.isdigit():
                    c[tok] += 1
        items = sorted(c.items())
        return pa.table(
            {
                "tok": pa.array([k for k, _ in items], type=pa.string()),
                "n": pa.array([v for _, v in items], type=pa.int64()),
            }
        )

    counts = (
        ds.map_batches(count_batch, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("tok")
        .sum("n")
    )
    top = counts.sort("sum(n)", descending=True).limit(top_k).take_all()
    total = float(sum(r["sum(n)"] for r in top)) or 1.0
    # cost = -log(p); longer words get a mild per-char bonus via the
    # DP's additive structure (fewer pieces → fewer cost terms)
    vocab = {
        r["tok"]: -math.log(r["sum(n)"] / total) for r in top
    }
    return _ray.put(vocab)


def viterbi_split(word: str, vocab: dict, max_piece: int = 24,
                  unknown_cost_per_char: float = 12.0) -> list[str]:
    """Minimum-cost segmentation of ``word`` by corpus unigram costs.

    Classic DP: best[i] = min over j of best[j] + cost(word[j:i]), where
    in-vocabulary pieces cost -log p and unknown single chars pay a high
    per-char penalty (so unknown material survives as one unsplit run
    rather than shattering). Deterministic; ties prefer the longer last
    piece."""
    w = word.lower()
    n = len(w)
    if n == 0:
        return []
    INF = float("inf")
    best = [0.0] + [INF] * n
    back = [0] * (n + 1)
    for i in range(1, n + 1):
        lo = max(0, i - max_piece)
        for j in range(lo, i):
            piece = w[j:i]
            c = vocab.get(piece)
            if c is None:
                if i - j == 1:
                    c = unknown_cost_per_char
                else:
                    continue
            cand = best[j] + c
            # strict < : earlier j (longer piece) wins ties
            if cand < best[i]:
                best[i] = cand
                back[i] = j
    # merge adjacent unknown single chars back into runs
    pieces = []
    i = n
    while i > 0:
        j = back[i]
        pieces.append(word[j:i])
        i = j
    pieces.reverse()
    merged: list[str] = []
    for p in pieces:
        if (
            merged
            and p.lower() not in vocab
            and merged[-1].lower() not in vocab
        ):
            merged[-1] += p
        else:
            merged.append(p)
    return merged


class CorpusCompoundSplitter:
    """Actor-pool stage: identifier column → corpus-learned segmentation.

    ``__init__`` fetches the broadcast vocabulary ONCE per actor (the
    reference loads the spaCy model once per worker the same way,
    ``compound.py:198-201``); ``__call__`` first applies the structural
    boundary splitter (camel/snake/kebab/digit, :func:`split_compound`),
    then Viterbi-splits each remaining all-lowercase run — so
    ``requestslogger`` → ``requests | logger`` even with no case boundary.
    """

    def __init__(self, vocab_ref, min_run: int = 6):
        import ray as _ray

        self.vocab = _ray.get(vocab_ref)
        self.min_run = min_run

    def __call__(self, batch, column: str = "ident",
                 out_col: str = "parts", n_col: str = "n_parts"):
        import pyarrow as pa

        structural = split_compound(batch.column(column))
        out: list[list[str]] = []
        for parts in structural.to_pylist():
            final: list[str] = []
            for p in parts or []:
                if (
                    len(p) >= self.min_run
                    and p.isalpha()
                    and p.lower() not in self.vocab
                ):
                    final.extend(viterbi_split(p, self.vocab))
                else:
                    final.append(p)
            out.append(final)
        t = batch.append_column(
            out_col, pa.array(out, type=pa.list_(pa.string()))
        )
        return t.append_column(
            n_col,
            pa.array([len(x) for x in out], type=pa.int64()),
        )


def corpus_split_stage(ds, column: str, vocab_ref, concurrency=None,
                       batch_size: int = 4096):
    """Dataset wrapper: structural + corpus-learned splitting."""
    from ..util import default_concurrency

    class _Stage(CorpusCompoundSplitter):
        def __call__(self, batch):
            return super().__call__(batch, column=column)

    return ds.map_batches(
        _Stage,
        fn_constructor_kwargs=dict(vocab_ref=vocab_ref),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency or default_concurrency(),
    )
