"""takco_ray — a Ray-Data-native record-linkage / data-processing engine.

A from-scratch reimplementation of the capabilities of karmaresearch/takco
(reference: /root/reference) for a Parquet corpus of source-code files
``(repo, path, commit, lang, content)``: blocking (MinHash/LSH), pairwise
scoring (batched Jaccard + Levenshtein on actor pools), and transitive
clustering (distributed connected components), plus the general-purpose
dataset operators the reference exposes (maps, filters, grouped aggregates,
joins, dedup, sorts) expressed as idiomatic ``ray.data`` pipelines.

Layout
------
- ``functions``  — pure, vectorized kernels (hashing, tokenize, minhash,
  string similarity, score-combination DSL).
- ``stages``     — Ray Data stages (map_batches / flat_map / groupby bodies):
  normalize, exact dedup, minhash, LSH blocking + salting, pair scoring,
  connected components, text analysis, ANN, multimodal plumbing.
- ``sources``    — read helpers with column pruning.
- ``pipelines``  — end-to-end pipelines (the flagship ER pipeline, testdata
  query pipelines used for driver conformance).
- ``state``      — checkpoint / lineage / metrics for resumable stages.
- ``corpus``     — deterministic synthetic source-code corpus generator
  (FIXTURES.md) with planted clone clusters and gold labels.

Never calls ``ray.init`` — the caller (driver, bench.py, test fixture) owns
the Ray session.
"""

__version__ = "0.1.0"
