"""String-similarity kernels.

The reference scores strings by token-set Jaccard and Levenshtein ratio
(``takco/link/types.py:190-202``) and combines channels with a small DSL
(see :mod:`aggdsl`). rapidfuzz is not available in this environment, so
Levenshtein / Jaro-Winkler are implemented here (pure Python two-row DP /
standard JW); they are only applied to *short* key strings (paths,
identifiers) inside the scoring actors, never to full file contents —
content similarity always goes through the MinHash estimator.
"""

from __future__ import annotations


def jaccard_tokens(a, b) -> float:
    """Token-set Jaccard (``types.py:190-194`` semantics)."""
    sa, sb = set(a), set(b)
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter)


def levenshtein_ratio(a: str, b: str) -> float:
    """Normalized Levenshtein similarity: 1 - dist / max(len).

    Two-row DP, O(len(a)*len(b)); intended for short strings (paths).
    """
    if a == b:
        return 1.0
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0
    if la < lb:  # keep inner loop over the shorter string
        a, b, la, lb = b, a, lb, la
    prev = list(range(lb + 1))
    cur = [0] * (lb + 1)
    for i in range(1, la + 1):
        cur[0] = i
        ca = a[i - 1]
        for j in range(1, lb + 1):
            cost = 0 if ca == b[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
        prev, cur = cur, prev
    return 1.0 - prev[lb] / la


def jaro_winkler(a: str, b: str, prefix_weight: float = 0.1) -> float:
    """Jaro-Winkler similarity (standard definition, prefix cap 4)."""
    if a == b:
        return 1.0
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0
    match_dist = max(la, lb) // 2 - 1
    a_matched = [False] * la
    b_matched = [False] * lb
    matches = 0
    for i, ca in enumerate(a):
        lo = max(0, i - match_dist)
        hi = min(lb, i + match_dist + 1)
        for j in range(lo, hi):
            if not b_matched[j] and b[j] == ca:
                a_matched[i] = b_matched[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    transpositions = 0
    j = 0
    for i in range(la):
        if a_matched[i]:
            while not b_matched[j]:
                j += 1
            if a[i] != b[j]:
                transpositions += 1
            j += 1
    transpositions //= 2
    jaro = (
        matches / la + matches / lb + (matches - transpositions) / matches
    ) / 3.0
    prefix = 0
    for ca, cb in zip(a[:4], b[:4]):
        if ca != cb:
            break
        prefix += 1
    return jaro + prefix * prefix_weight * (1.0 - jaro)
