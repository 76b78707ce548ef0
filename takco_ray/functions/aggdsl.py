"""Score-combination DSL.

Re-implements the reference's matcher-aggregation mini-language
(``takco/cluster/cluster.py:214-243``): expressions like

    @mean(@max(headjacc, @pow(headvec, 4)), @max(bodylsh, bodytype))

combine named per-pair score channels. Here channels are numpy arrays
(one value per candidate pair in a batch), so the compiled expression is
fully vectorized. Missing channels evaluate as 0 (the reference fills
absent matcher scores with NaN→mean-skip; we use 0, documented, since
every configured channel is always computed).

Grammar:  expr := NUMBER | NAME | '@' FUNC '(' expr (',' expr)* ')'
          FUNC := max | min | mean | sum | pow | prod
"""

from __future__ import annotations

import re

import numpy as np

_TOKEN = re.compile(r"@\w+|[\w.]+|[(),]")

_FUNCS = {
    "@max": lambda args: np.maximum.reduce(args),
    "@min": lambda args: np.minimum.reduce(args),
    "@mean": lambda args: np.mean(args, axis=0),
    "@sum": lambda args: np.sum(args, axis=0),
    "@prod": lambda args: np.prod(args, axis=0),
    "@pow": lambda args: np.power(args[0], args[1]),
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
        return np.zeros(n) if arr is None else np.asarray(arr, dtype=np.float64)
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
        return _eval(tree, channels, n)

    return run
