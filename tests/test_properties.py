"""Property-based tests (hypothesis) for the pure deterministic kernels —
no Ray session needed: these gates run on arbitrary inputs, not fixtures."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from takco_ray.functions.hashing import FEISTEL_DOMAIN, feistel_permute
from takco_ray.functions.sketch import kll_compress, kll_quantile, mg_compress
from takco_ray.stages.relational import ntile_from_rn


@settings(max_examples=50, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=FEISTEL_DOMAIN - 1),
             min_size=1, max_size=200, unique=True),
    st.integers(min_value=0, max_value=2**31),
)
def test_feistel_bijective_in_domain(ids, seed):
    arr = np.asarray(ids, dtype=np.int64)
    out = feistel_permute(arr, rounds=4, seed=seed)
    assert len(np.unique(out)) == len(arr)          # injective on the sample
    assert out.min() >= 0 and out.max() < FEISTEL_DOMAIN
    # pure function: same input, same permutation
    assert (feistel_permute(arr, rounds=4, seed=seed) == out).all()


@settings(max_examples=50, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=500),
    st.integers(min_value=1, max_value=16),
)
def test_mg_compress_guarantees(values, k):
    import collections

    true = collections.Counter(values)
    keys = np.asarray(sorted(true), dtype=object)
    counts = np.asarray([true[key] for key in keys], dtype=np.int64)
    rk, rc, err = mg_compress(keys, counts, k)
    assert len(rk) <= k
    assert err >= 0
    got = dict(zip(rk, rc))
    for key, c in true.items():
        if key in got:
            # undercount by at most err, never overcount
            assert got[key] <= c <= got[key] + err
        else:
            # absent ⇒ true frequency is within the loss bound
            assert c <= err


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.floats(min_value=-1e9, max_value=1e9, allow_nan=False),
             min_size=1, max_size=800),
    st.integers(min_value=8, max_value=64),
)
def test_kll_weight_and_rank_sanity(values, cap):
    v = np.asarray(values, dtype=np.float64)
    w = np.ones(len(v), dtype=np.int64)
    cv, cw = kll_compress(v.copy(), w.copy(), cap)
    assert len(cv) <= max(cap, 1)
    # compaction halves point counts, weight stays within a factor of 2
    assert 0 < cw.sum() <= 2 * len(v)
    # median estimate lies within the value range and is deterministic
    est = kll_quantile(cv, cw, 0.5)
    assert v.min() <= est <= v.max()
    cv2, cw2 = kll_compress(v.copy(), w.copy(), cap)
    assert (cv2 == cv).all() and (cw2 == cw).all()


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=1, max_value=5000), st.integers(min_value=1, max_value=64))
def test_ntile_partition_invariants(n, k):
    tiles = ntile_from_rn(np.arange(n, dtype=np.int64), n, k)
    sizes = np.bincount(tiles)[1:]
    big, small = -(-n // k), n // k
    assert tiles.min() == 1 and tiles.max() == min(k, n)
    assert all(s in (big, small) for s in sizes if s)
    assert (np.diff(tiles) >= 0).all() and sizes.sum() == n


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**9),
            st.text(
                # exclude surrogates (not encodable) — everything else is
                # payload bytes and must survive the WARC framing verbatim
                alphabet=st.characters(blacklist_categories=("Cs",)),
                max_size=400,
            ),
            st.booleans(),
        ),
        max_size=8,
    ),
    st.booleans(),
)
def test_warc_roundtrip_property(pages, gz):
    """Any unicode payload round-trips through the WARC writer/reader
    bit-exactly: framing is byte-counted (Content-Length), never delimiter
    -based, so record bodies containing 'WARC/1.0', CRLFs, or empty
    strings must not confuse the parser."""
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        _roundtrip(tmp, pages, gz)


def _roundtrip(tmp, pages, gz):
    import os as _os

    from takco_ray.sources.warc import iter_response_pages, write_warc

    path = _os.path.join(tmp, "p.warc.gz" if gz else "p.warc")
    triples = [
        (
            f"http://t.test/page/{i}",
            f"http://kb.test/e{about_id}" if has_about else None,
            text,
        )
        for i, (about_id, text, has_about) in enumerate(pages)
    ]
    n = write_warc(path, triples)
    assert n == len(triples)
    got = list(iter_response_pages(path))
    assert got == triples
