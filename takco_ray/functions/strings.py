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


def levenshtein_ratio_batch(a_list, b_list, chunk: int = 262_144,
                            return_distance: bool = False):
    """Vectorized normalized Levenshtein over pairs of short strings.

    Full-matrix DP run simultaneously for every pair with numpy row updates
    (~350× the scalar Python loop: the flagship's dominant kernel before
    this). Strings are padded into uint32 code matrices; each pair's answer
    is gathered at its own (len(a), len(b)) cell, so padding never corrupts
    results. Memory is bounded by ``chunk`` pairs per DP sweep.

    ``return_distance=True`` yields the raw edit distance (int64, DuckDB
    ``levenshtein()`` semantics) instead of the 1 − dist/max ratio.
    """
    import numpy as np

    n = len(a_list)
    out = np.empty(n, dtype=np.int64 if return_distance else np.float64)
    for c0 in range(0, n, chunk):
        c1 = min(c0 + chunk, n)
        aa = a_list[c0:c1]
        bb = b_list[c0:c1]
        m = c1 - c0
        la = np.fromiter((len(x) for x in aa), dtype=np.int64, count=m)
        lb = np.fromiter((len(x) for x in bb), dtype=np.int64, count=m)
        maxa = int(la.max()) if m else 0
        maxb = int(lb.max()) if m else 0
        if maxa == 0 or maxb == 0:
            if return_distance:
                out[c0:c1] = np.maximum(la, lb)
            else:
                out[c0:c1] = np.where((la == 0) & (lb == 0), 1.0, 0.0)
            continue
        A = np.zeros((m, maxa), dtype=np.uint32)
        B = np.zeros((m, maxb), dtype=np.uint32)
        for i, x in enumerate(aa):
            codes = np.frombuffer(x.encode("utf-32-le"), dtype=np.uint32)
            A[i, : len(codes)] = codes
        for i, x in enumerate(bb):
            codes = np.frombuffer(x.encode("utf-32-le"), dtype=np.uint32)
            B[i, : len(codes)] = codes
        prev = np.tile(np.arange(maxb + 1, dtype=np.int32), (m, 1))
        final = prev.copy()  # snapshot for rows with la == 0
        for i in range(1, maxa + 1):
            cost = (A[:, i - 1 : i] != B).astype(np.int32)  # (m, maxb)
            cur = np.empty_like(prev)
            cur[:, 0] = i
            # the left-dependency makes column order sequential; rows vector
            for j in range(1, maxb + 1):
                cur[:, j] = np.minimum(
                    np.minimum(prev[:, j] + 1, cur[:, j - 1] + 1),
                    prev[:, j - 1] + cost[:, j - 1],
                )
            hit = la == i
            if hit.any():
                final[hit] = cur[hit]
            prev = cur
        dist = final[np.arange(m), lb]
        if return_distance:
            out[c0:c1] = dist
        else:
            denom = np.maximum(np.maximum(la, lb), 1)
            out[c0:c1] = np.where(
                (la == 0) & (lb == 0), 1.0, 1.0 - dist / denom
            )
    return out


def jaro_winkler(a: str, b: str, prefix_weight: float = 0.1) -> float:
    """Jaro-Winkler similarity (standard definition, prefix cap 4).

    The Winkler prefix bonus applies only when the Jaro similarity exceeds
    the standard 0.7 boost threshold — matching DuckDB's
    ``jaro_winkler_similarity`` and RapidFuzz (below the threshold the
    function IS Jaro). An unconditional bonus diverges on low-similarity
    prefix-sharing pairs, e.g. ('aXXXXX','aYYYYY'): 0.5 unconditional vs
    0.444 gated.
    """
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
    if jaro <= 0.7:
        return jaro
    prefix = 0
    for ca, cb in zip(a[:4], b[:4]):
        if ca != cb:
            break
        prefix += 1
    return jaro + prefix * prefix_weight * (1.0 - jaro)
