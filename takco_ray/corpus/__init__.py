"""Deterministic synthetic source-code corpus with planted clone clusters.

FIXTURES.md §1-4: the engine's primary input shape per BASELINE.json
``input_hint`` — Parquet ``files(repo, path, commit, lang, content)`` — plus
gold sidecars (``labels``, ``labeled_pairs``) the engine never reads.
"""

from .gen import CorpusConfig, generate_corpus, SCALES

__all__ = ["CorpusConfig", "generate_corpus", "SCALES"]
