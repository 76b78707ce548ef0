"""Unit tests for the pure kernels (no Ray needed)."""

import numpy as np
import pytest

from takco_ray.functions.hashing import hash64_strings, sha256_hex, stable_file_id
from takco_ray.functions.minhash import MinHasher, band_keys, jaccard_from_signatures
from takco_ray.functions.strings import jaccard_tokens, levenshtein_ratio, jaro_winkler
from takco_ray.functions.tokenize import tokenize
from takco_ray.functions.aggdsl import compile_agg_expr


def test_tokenize_matches_reference_semantics():
    # lowercase \w+ split — takco/cluster/matchers/matcher.py:23-26
    assert tokenize("Foo BAR_baz  12x!") == ["foo", "bar_baz", "12x"]
    assert tokenize("") == []
    assert tokenize(None) == []


def test_hash64_deterministic_and_seeded():
    a = hash64_strings(["x", "y"], seed=1)
    b = hash64_strings(["x", "y"], seed=1)
    c = hash64_strings(["x", "y"], seed=2)
    assert (a == b).all()
    assert (a != c).any()


def test_sha256_matches_hashlib():
    import hashlib

    assert sha256_hex(["abc"])[0] == hashlib.sha256(b"abc").hexdigest()


def test_stable_file_id_no_collisions_and_order_free():
    ids = stable_file_id(
        [f"r{i}" for i in range(10_000)],
        [f"p{i}" for i in range(10_000)],
        ["c"] * 10_000,
    )
    assert ids.dtype == np.int64
    assert len(set(ids.tolist())) == 10_000


def test_minhash_deterministic():
    mh1, mh2 = MinHasher(seed=41), MinHasher(seed=41)
    texts = ["a b c d e f g h i j", "k l m n o p q r s t"]
    assert (mh1.signatures(texts) == mh2.signatures(texts)).all()
    assert (mh1.signatures(texts) != MinHasher(seed=42).signatures(texts)).any()


def test_minhash_jaccard_estimator_error_bound():
    """Estimator mean |err| ≤ ~2/sqrt(num_perm) on controlled-overlap docs."""
    rng = np.random.RandomState(0)
    vocab = [f"t{i}" for i in range(400)]
    mh = MinHasher(num_perm=128, shingle_k=1, seed=41)
    errs = []
    for frac in (0.2, 0.5, 0.8):
        shared = vocab[: int(200 * frac)]
        a = " ".join(shared + vocab[200 : 400 - int(200 * frac)])
        b = " ".join(shared + [v + "x" for v in vocab[200 : 400 - int(200 * frac)]])
        sa, sb = set(tokenize(a)), set(tokenize(b))
        true_j = len(sa & sb) / len(sa | sb)
        sigs = mh.signatures([a, b])
        est = jaccard_from_signatures(sigs[:1], sigs[1:])[0]
        errs.append(abs(est - true_j))
    assert max(errs) < 0.15
    assert np.mean(errs) < 0.08


def test_identical_docs_share_all_bands_distinct_none():
    mh = MinHasher(seed=41)
    sigs = mh.signatures(["x y z w v u t s", "x y z w v u t s", "a b c d e f g h"])
    bands = band_keys(sigs, 16, seed=41)
    assert (bands[0] == bands[1]).all()
    assert not (bands[0] == bands[2]).any()


def test_agg_dsl_matches_numpy():
    fn = compile_agg_expr("@mean(@max(a, @pow(b, 4)), @min(a, b))")
    a = np.array([0.5, 1.0])
    b = np.array([0.8, 0.2])
    expect = (np.maximum(a, b**4) + np.minimum(a, b)) / 2
    assert np.allclose(fn({"a": a, "b": b}), expect)


def test_agg_dsl_missing_channel_is_skipped():
    fn = compile_agg_expr("@max(a, nosuch)")
    assert np.allclose(fn({"a": np.array([0.3])}), [0.3])


def test_agg_dsl_nan_skip_mean():
    # reference semantics (cluster.py:214-243): absent matcher scores are
    # NaN-filled and @mean SKIPS them — a missing optional channel must not
    # drag the mean toward 0
    fn = compile_agg_expr("@mean(a, optional)")
    assert np.allclose(fn({"a": np.array([0.8, 0.4])}), [0.8, 0.4])
    # present channel: plain mean
    assert np.allclose(
        fn({"a": np.array([0.8]), "optional": np.array([0.4])}), [0.6]
    )
    # per-row NaN (not whole-channel) is skipped too
    assert np.allclose(
        fn({"a": np.array([0.8, 0.8]), "optional": np.array([np.nan, 0.4])}),
        [0.8, 0.6],
    )
    # every channel missing → 0, not NaN
    fn2 = compile_agg_expr("@mean(nosuch, other)")
    assert np.allclose(fn2({"a": np.array([0.5])}), [0.0])


def test_string_similarities():
    assert jaccard_tokens(["a", "b"], ["b", "c"]) == pytest.approx(1 / 3)
    assert levenshtein_ratio("kitten", "sitting") == pytest.approx(1 - 3 / 7)
    assert jaro_winkler("martha", "marhta") == pytest.approx(0.9611, abs=1e-3)
    assert jaro_winkler("abc", "abc") == 1.0
    assert levenshtein_ratio("", "x") == 0.0


def test_jaro_winkler_prefix_bonus_gated_on_boost_threshold():
    # DuckDB/RapidFuzz semantics: the Winkler prefix bonus applies only when
    # jaro > 0.7; below that the function IS Jaro. ('aXXXXX','aYYYYY') has
    # jaro = (1/6 + 1/6 + 1)/3 = 4/9 ≈ 0.444 — an unconditional bonus would
    # report 0.5 and diverge from the DuckDB oracle.
    assert jaro_winkler("aXXXXX", "aYYYYY") == pytest.approx(4 / 9, abs=1e-9)
    # above the threshold the bonus still applies (standard example)
    assert jaro_winkler("dixon", "dicksonx") == pytest.approx(0.8133, abs=1e-3)


def test_arrow_and_python_signature_paths_agree():
    """The vectorized ASCII/word-hash path and the per-doc regex fallback
    must produce identical signatures on any input mix (empty docs, short
    docs, >16-byte tokens, non-ASCII, boundary-adjacent word runs)."""
    import string

    import numpy as np
    import pyarrow as pa
    from takco_ray.functions.minhash import MinHasher
    from takco_ray.functions.tokenize import tokenize_many

    mh = MinHasher()
    edge = [
        "", "a b", "héllo wörld foo bar baz qux aaa bbb", "xxx", None,
        "supercalifragilisticexpialidocious extraordinarily_long_identifier_name_here ok",
        "short k", "tail", "", "x y z w v u t s",
    ]
    a = mh.signatures_arrow(pa.array(edge, type=pa.large_string()))
    b = mh.signatures_from_shingles(
        mh._shingles_from_tokens(tokenize_many([w or "" for w in edge]))
    )
    assert np.array_equal(a, b)

    rs = np.random.RandomState(1234)
    alphabet = list(string.ascii_letters + string.digits + "_ .,;()#\n\t-")
    for _ in range(5):
        docs = ["".join(rs.choice(alphabet, rs.randint(0, 200))) for _ in range(40)]
        a = mh.signatures_arrow(pa.array(docs, type=pa.large_string()))
        b = mh.signatures_from_shingles(mh._shingles_from_tokens(tokenize_many(docs)))
        assert np.array_equal(a, b)


def test_segment_pairs_matches_per_block_loop():
    # the batched-by-size pair generator must emit exactly the same pair SET
    # as the per-block reference loop, for every oversize policy
    from takco_ray.stages.groupmap import segment_pairs

    rng = np.random.default_rng(7)
    counts = rng.integers(1, 10, size=500).astype(np.int64)
    counts[::71] = 100  # some oversized blocks
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)

    def naive(max_block_size, oversize):
        out = set()
        for s, m in zip(starts[counts >= 2], counts[counts >= 2]):
            if max_block_size is None or m <= max_block_size:
                li, lj = np.triu_indices(m, k=1)
            else:
                ring = np.arange(m - 1)
                if oversize == "ring_spoke":
                    spokes = np.arange(0, m, 8)[1:]
                    li = np.concatenate([ring, np.zeros(len(spokes), dtype=np.int64)])
                    lj = np.concatenate([ring + 1, spokes])
                else:
                    li, lj = ring, ring + 1
            out.update(zip((li + s).tolist(), (lj + s).tolist()))
        return out

    for mbs, ov in [(64, "ring"), (64, "ring_spoke"), (None, "ring"), (8, "ring")]:
        ii, jj = segment_pairs(starts, counts, mbs, oversize=ov)
        got = set(zip(ii.tolist(), jj.tolist()))
        assert got == naive(mbs, ov)
        assert (ii < jj).all()

    # empty / all-singleton inputs
    ii, jj = segment_pairs(np.array([0, 1], dtype=np.int64), np.array([1, 1], dtype=np.int64), 64)
    assert len(ii) == 0 and len(jj) == 0


def test_word_mask_matches_lut_all_bytes():
    """The range-compare word classifier must agree with the \\w LUT on every
    byte value that can appear in an ascii_lower'ed ASCII buffer (and, for
    safety, on all 256 byte values — uppercase can't appear post-lower, and
    A-Z are non-word under the lowered classifier by design)."""
    import numpy as np

    from takco_ray.functions.tokenize import _WORD_LUT, _word_mask_lowered

    buf = np.arange(256, dtype=np.uint8)
    out = np.empty(256, dtype=bool)
    _word_mask_lowered(buf, out, np.empty(256, dtype=np.uint8))
    lowered_lut = _WORD_LUT.copy()
    lowered_lut[ord("A"): ord("Z") + 1] = False  # never present post-lower
    assert (out[:128] == lowered_lut[:128]).all()
    assert not out[128:].any()  # non-ASCII bytes are non-word on this path
