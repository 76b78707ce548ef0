"""Score-combination DSL.

Re-implements the reference's matcher-aggregation mini-language
(``takco/cluster/cluster.py:214-243``): expressions like

    @mean(@max(headjacc, @pow(headvec, 4)), @max(bodylsh, bodytype))

combine named per-pair score channels. Here channels are numpy arrays
(one value per candidate pair in a batch), so the compiled expression is
fully vectorized. Missing channels evaluate as NaN and every reducer
SKIPS NaN — exactly the reference's semantics (absent matcher scores are
NaN-filled and ``mean`` skips them, ``cluster.py:214-243``), so a TOML
user adding an optional channel doesn't bias scores toward 0. A pair
with NO present channel anywhere scores 0.
"""

from __future__ import annotations

import re

import numpy as np

_TOKEN = re.compile(r"@\w+|[\w.]+|[(),]")


def _nanmean(args) -> np.ndarray:
    """Mean over channels skipping NaN entries, NaN where all are NaN —
    computed manually so all-NaN positions don't emit RuntimeWarnings."""
    a = np.asarray(args, dtype=np.float64)
    present = ~np.isnan(a)
    cnt = present.sum(axis=0)
    s = np.where(present, a, 0.0).sum(axis=0)
    with np.errstate(invalid="ignore", divide="ignore"):
        out = s / cnt
    return np.where(cnt > 0, out, np.nan)


_FUNCS = {
    # fmax/fmin/nansum/nanprod ignore NaN operands (NaN only when ALL are)
    "@max": lambda args: np.fmax.reduce(args),
    "@min": lambda args: np.fmin.reduce(args),
    "@mean": _nanmean,
    "@sum": lambda args: np.nansum(args, axis=0),
    "@prod": lambda args: np.nanprod(args, axis=0),
    "@pow": lambda args: np.power(args[0], args[1]),  # NaN propagates → skipped above
}


def _parse(tokens, pos):
    tok = tokens[pos]
    if tok in _FUNCS:
        fn = _FUNCS[tok]
        if tokens[pos + 1] != "(":
            raise ValueError(f"expected '(' after {tok}")
        pos += 2
        args = []
        while True:
            node, pos = _parse(tokens, pos)
            args.append(node)
            if tokens[pos] == ",":
                pos += 1
                continue
            if tokens[pos] == ")":
                pos += 1
                break
            raise ValueError(f"expected ',' or ')' at {pos}")
        return ("call", fn, args), pos
    if re.fullmatch(r"\d+(\.\d+)?", tok):
        return ("const", float(tok)), pos + 1
    if re.fullmatch(r"\w+", tok):
        return ("name", tok), pos + 1
    raise ValueError(f"unexpected token {tok!r}")


def _eval(node, channels, n):
    kind = node[0]
    if kind == "const":
        return np.full(n, node[1])
    if kind == "name":
        arr = channels.get(node[1])
        return np.full(n, np.nan) if arr is None else np.asarray(arr, dtype=np.float64)
    _, fn, args = node
    return fn([_eval(a, channels, n) for a in args])


def compile_agg_expr(expr: str):
    """Compile a DSL string to ``fn(channels: dict[str, ndarray]) -> ndarray``."""
    tokens = _TOKEN.findall(expr)
    if not tokens:
        raise ValueError("empty aggregation expression")
    tree, pos = _parse(tokens, 0)
    if pos != len(tokens):
        raise ValueError(f"trailing tokens in {expr!r}")

    def run(channels):
        arrays = [v for v in channels.values() if v is not None]
        n = len(arrays[0]) if arrays else 0
        out = np.asarray(_eval(tree, channels, n), dtype=np.float64)
        # a pair with no present channel at all scores 0, not NaN (NaN would
        # silently fail every >= threshold comparison, which happens to be
        # the same decision but poisons downstream arithmetic)
        return np.nan_to_num(out, nan=0.0)

    return run
