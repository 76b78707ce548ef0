"""Tokenization.

Mirrors the reference's ``default_tokenize`` — lowercase ``\\W+`` split
(``takco/cluster/matchers/matcher.py:23-26``) — applied to source-code
content instead of table cells. The compiled regex is module-level so worker
processes compile it once on import.
"""

from __future__ import annotations

import re

_TOKEN_RE = re.compile(r"\w+", re.UNICODE)


def tokenize(text: str) -> list:
    """Lowercase word tokens of one string."""
    if not text:
        return []
    return _TOKEN_RE.findall(text.lower())


def tokenize_many(texts) -> list:
    """Token lists for a column of strings (hot path: one findall per doc)."""
    findall = _TOKEN_RE.findall
    out = []
    for t in texts:
        out.append(findall(t.lower()) if t else [])
    return out
