"""Relational extension operators: semi/anti join, top-n, pivot, quantiles,
hash sampling — small in-memory oracles (numpy/python recomputation)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from takco_ray.stages import relational


def _ds(tbl: dict):
    import ray.data

    return ray.data.from_arrow(pa.table(tbl))


def test_semi_and_anti_join(ray_session):
    left = _ds({"k": [1, 2, 3, 4, 5], "v": ["a", "b", "c", "d", "e"]})
    right = _ds({"rk": [2, 2, 4, 9]})
    semi = relational.semi_join(left, right, on="k", right_on="rk", num_partitions=2)
    anti = relational.anti_join(left, right, on="k", right_on="rk", num_partitions=2)
    semi_keys = sorted(r["k"] for r in semi.take_all())
    anti_keys = sorted(r["k"] for r in anti.take_all())
    assert semi_keys == [2, 4]  # duplicates on the right don't multiply rows
    assert anti_keys == [1, 3, 5]


def test_top_n_per_group_with_ties(ray_session):
    n = 200
    rng = np.random.default_rng(7)
    groups = rng.integers(0, 5, n)
    vals = rng.integers(0, 20, n).astype(np.float64)  # many ties
    ids = np.arange(n, dtype=np.int64)
    ds = _ds({"g": [f"g{i}" for i in groups], "val": vals, "id": ids})
    out = relational.top_n_per_group(
        ds, group_col="g", order_col="val", n=3, tiebreak_col="id"
    ).to_pandas()

    # oracle: per group sort by (-val, id), take 3
    import pandas as pd

    df = pd.DataFrame({"g": [f"g{i}" for i in groups], "val": vals, "id": ids})
    expected = (
        df.sort_values(["g", "val", "id"], ascending=[True, False, True])
        .groupby("g")
        .head(3)
    )
    expected["rank"] = expected.groupby("g").cumcount() + 1
    got = out.sort_values(["g", "rank"]).reset_index(drop=True)
    exp = expected.sort_values(["g", "rank"]).reset_index(drop=True)
    assert got[["g", "val", "id", "rank"]].values.tolist() == exp[
        ["g", "val", "id", "rank"]
    ].values.tolist()


def test_pivot_counts(ray_session):
    ds = _ds(
        {
            "seg": ["x", "x", "y", "y", "y", "x"],
            "status": ["A", "B", "A", "A", "C", "A"],
        }
    )
    out = (
        relational.pivot_counts(ds, "seg", "status", ["A", "B", "C"])
        .to_pandas()
        .set_index("seg")
        .sort_index()
    )
    assert out.loc["x"].to_dict() == {"n_a": 2, "n_b": 1, "n_c": 0}
    assert out.loc["y"].to_dict() == {"n_a": 2, "n_b": 0, "n_c": 1}


def test_exact_quantiles_matches_disc_definition(ray_session):
    rng = np.random.default_rng(11)
    vals = rng.integers(0, 97, 5003).astype(np.float64)
    ds = _ds({"v": vals})
    out = relational.exact_quantiles(ds, "v", [0.25, 0.5, 0.9]).to_pandas()
    s = np.sort(vals)
    for q, col in [(0.25, "q25"), (0.5, "q50"), (0.9, "q90")]:
        idx = max(0, int(np.ceil(q * len(s))) - 1)
        assert out[col].iloc[0] == s[idx], (q, out[col].iloc[0], s[idx])


def test_hash_sample_deterministic_and_consistent(ray_session):
    ids = np.arange(10_000, dtype=np.int64)
    ds = _ds({"id": ids, "payload": ids * 2})
    out1 = relational.hash_sample(ds, "id", modulus=1000, keep=100).to_pandas()
    out2 = relational.hash_sample(_ds({"id": ids}), "id", modulus=1000, keep=100).to_pandas()
    # same membership regardless of co-columns / run
    assert sorted(out1.id) == sorted(out2.id)
    # approximate rate
    assert 0.07 < len(out1) / len(ids) < 0.13
    # pure function of the id
    expected = ids[(ids * relational.SAMPLE_MIX) % 1000 < 100]
    assert sorted(out1.id) == expected.tolist()


def test_hash_sample_rejects_overflowing_ids(ray_session):
    import pytest as _pytest

    # past 2^63 // SAMPLE_MIX numpy int64 multiply wraps while DuckDB
    # promotes to HUGEINT — membership would silently diverge, so it raises
    big = _ds({"id": np.array([2**62], dtype=np.int64)})
    with _pytest.raises(Exception):
        relational.hash_sample(big, "id").to_pandas()


def test_stratified_sample_matches_rank_oracle(ray_session):
    import pandas as pd

    rng = np.random.default_rng(3)
    n = 2000
    groups = [f"p{i}" for i in rng.integers(0, 4, n)]
    ids = rng.permutation(np.arange(10_000, dtype=np.int64))[:n]
    ds = _ds({"g": groups, "id": ids, "payload": ids * 3})
    out = (
        relational.stratified_sample(ds, "g", "id", n=15)
        .to_pandas()
        .sort_values(["g", "rank"])
        .reset_index(drop=True)
    )
    # oracle: rank ascending by (id * SAMPLE_MIX) % 2^32, ties by id
    df = pd.DataFrame({"g": groups, "id": ids})
    df["hk"] = (df.id * relational.SAMPLE_MIX) % (2**32)
    df = df.sort_values(["g", "hk", "id"])
    df["rank"] = df.groupby("g").cumcount() + 1
    exp = df[df["rank"] <= 15].sort_values(["g", "rank"]).reset_index(drop=True)
    assert out[["g", "id", "rank"]].values.tolist() == exp[
        ["g", "id", "rank"]
    ].values.tolist()
    # payload columns ride along
    assert (out.payload == out.id * 3).all()


def test_stratified_sample_rejects_overflowing_ids(ray_session):
    big = _ds({"g": ["a"], "id": np.array([2**62], dtype=np.int64)})
    with pytest.raises(Exception):
        relational.stratified_sample(big, "g", "id", n=1).to_pandas()


def test_epoch_shuffle_bijective_and_sql_exact(ray_session):
    """Feistel epoch shuffle: bijective keys, in-domain, shard = key mod n,
    payload rides along; keys match the generated DuckDB SQL twin bit-exactly
    (the same generator the driver oracle uses)."""
    import duckdb
    import pandas as pd

    from takco_ray.functions.hashing import FEISTEL_DOMAIN, feistel_permute
    from takco_ray.pipelines.queries import feistel_sql_cte

    ids = np.concatenate(
        [np.arange(5000, dtype=np.int64), np.array([FEISTEL_DOMAIN - 1], dtype=np.int64)]
    )
    ds = _ds({"id": ids, "payload": ids * 7})
    out = (
        relational.epoch_shuffle(ds, "id", num_shards=16, rounds=4, seed=3)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    keys = out.shuffle_key.to_numpy()
    assert len(np.unique(keys)) == len(ids)               # bijection
    assert keys.min() >= 0 and keys.max() < FEISTEL_DOMAIN
    assert (out.shard == keys % 16).all()
    assert (out.payload == out.id * 7).all()
    assert (keys == feistel_permute(np.sort(ids), rounds=4, seed=3)).all()

    con = duckdb.connect()
    con.register("t", pd.DataFrame({"doc_id": ids}))
    sql = feistel_sql_cte("t", "doc_id", rounds=4, seed=3) + (
        "\nSELECT id, shuffle_key FROM fk ORDER BY id"
    )
    assert (con.sql(sql).df().shuffle_key.to_numpy() == keys).all()

    # reseeding changes the permutation (new epoch order)
    k2 = feistel_permute(ids, rounds=4, seed=4)
    assert (k2 != keys).mean() > 0.99


def test_epoch_shuffle_rejects_out_of_domain_ids(ray_session):
    from takco_ray.functions.hashing import FEISTEL_DOMAIN

    big = _ds({"id": np.array([FEISTEL_DOMAIN], dtype=np.int64)})
    with pytest.raises(Exception):
        relational.epoch_shuffle(big, "id").to_pandas()


def test_quantile_filter_matches_numpy(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from takco_ray.stages.relational import quantile_filter

    rs = np.random.RandomState(5)
    vals = rs.randint(0, 50, size=400).astype(np.int64)
    ds = ray.data.from_arrow(
        pa.table({"id": pa.array(range(400), type=pa.int64()),
                  "v": pa.array(vals, type=pa.int64())})
    )
    for q, keep in ((0.25, "ge"), (0.9, "le")):
        out = quantile_filter(ds, "v", q=q, keep=keep).to_pandas()
        # quantile_disc: element at 0-based sorted index ceil(q*n)-1
        thr = np.sort(vals)[max(0, int(np.ceil(q * len(vals))) - 1)]
        want = (vals >= thr) if keep == "ge" else (vals <= thr)
        assert len(out) == want.sum(), (q, keep)
        assert set(out.id) == set(np.flatnonzero(want))


def test_rollup_aggregate_matches_pandas(ray_session):
    import pandas as pd

    rng = np.random.default_rng(11)
    a = rng.choice(["x", "y", "z"], 300)
    b = rng.choice(["p", "q"], 300)
    v = rng.integers(0, 100, 300).astype(np.int64)
    ds = _ds({"a": list(a), "b": list(b), "v": v})
    out = (
        relational.rollup_aggregate(ds, ["a", "b"], "v", sum_name="sv")
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    df = pd.DataFrame({"a": a, "b": b, "v": v})
    finest = df.groupby(["a", "b"], as_index=False).agg(sv=("v", "sum"), n_rows=("v", "size"))
    sub = df.groupby(["a"], as_index=False).agg(sv=("v", "sum"), n_rows=("v", "size"))
    sub["b"] = "ALL"
    total = pd.DataFrame({"a": ["ALL"], "b": ["ALL"], "sv": [v.sum()], "n_rows": [300]})
    want = (
        pd.concat([finest, sub, total], ignore_index=True)[["a", "b", "sv", "n_rows"]]
        .sort_values(["a", "b"])
        .reset_index(drop=True)
        .astype({"sv": "int64", "n_rows": "int64"})
    )
    pd.testing.assert_frame_equal(out, want)


def test_grouped_mode_tiebreak(ray_session):
    # group g1: 'b' x2 vs 'a' x2 → tie broken by smallest value ('a')
    ds = _ds({"g": ["g1"] * 4 + ["g2"] * 3,
              "v": ["b", "a", "b", "a", "z", "z", "y"]})
    out = relational.grouped_mode(ds, "g", "v").to_pandas().sort_values("g")
    assert list(out["mode"]) == ["a", "z"]
    assert list(out["mode_n"]) == [2, 2]


def test_string_agg_per_group(ray_session):
    ds = _ds({"g": [1, 1, 2, 1], "name": ["c", "a", "x", "b"]})
    out = relational.string_agg_per_group(ds, "g", "name").to_pandas().sort_values("g")
    assert list(out["agg"]) == ["a,b,c", "x"]
    assert list(out["n_values"]) == [3, 1]


def test_quantile_cont_scaled_matches_numpy(ray_session):
    rng = np.random.default_rng(3)
    v = rng.integers(0, 10_000, 501).astype(np.int64)
    ds = _ds({"c": v})
    for q_num, q_den in ((1, 2), (9, 10), (3, 4), (0, 1), (1, 1)):
        out = relational.quantile_cont_scaled(ds, "c", q_num, q_den, "out").to_pandas()
        got = out["out"].iloc[0] / q_den
        want = np.percentile(v, 100.0 * q_num / q_den, method="linear")
        assert abs(got - want) < 1e-9, (q_num, q_den)


def test_dense_rank_matches_pandas(ray_session):
    import pandas as pd

    rng = np.random.default_rng(9)
    v = rng.integers(0, 40, 300).astype(np.int64)  # many ties across buckets
    ids = np.arange(300, dtype=np.int64)
    ds = _ds({"id": ids, "v": v})
    for desc in (False, True):
        out = (
            relational.dense_rank(ds, "v", out_col="r", descending=desc, num_buckets=7)
            .to_pandas()
            .sort_values("id")
            .reset_index(drop=True)
        )
        want = pd.Series(v).rank(method="dense", ascending=not desc).astype(np.int64)
        assert (out["r"].to_numpy() == want.to_numpy()).all(), desc


def test_comoment_sums_exact(ray_session):
    x = np.array([1, 2, 3, 4], dtype=np.int64)
    y = np.array([10, -2, 7, 0], dtype=np.int64)
    out = relational.comoment_sums(_ds({"x": x, "y": y}), "x", "y").to_pandas()
    row = out.iloc[0]
    assert row["n"] == 4 and row["sum_x"] == 10 and row["sum_y"] == 15
    assert row["sum_xx"] == 30 and row["sum_yy"] == 153 and row["sum_xy"] == 27


def test_heavy_hitters_exact_regime(ray_session):
    # every batch has <= num_sketch distinct values → sketch is exact
    vals = ["a"] * 50 + ["b"] * 30 + ["c"] * 19 + ["d"]
    ds = _ds({"v": vals})
    out = relational.heavy_hitters(ds, "v", k=3, num_sketch=16).to_pandas()
    assert list(out.value) == ["a", "b", "c"]
    assert list(out.est_count) == [50, 30, 19]
    assert (out.err_bound == 0).all()


def test_heavy_hitters_lossy_bound(ray_session):
    import collections
    import ray.data

    rng = np.random.default_rng(13)
    # zipf-ish: heavy head + long tail, forced through many small blocks
    vals = [f"t{int(v)}" for v in rng.zipf(1.5, 4000) if v < 5000]
    true = collections.Counter(vals)
    ds = ray.data.from_items([{"v": v} for v in vals]).repartition(16)
    out = relational.heavy_hitters(ds, "v", k=10, num_sketch=8).to_pandas()
    err = int(out.err_bound.iloc[0])
    assert err > 0  # tail wide enough to force compression
    got = dict(zip(out.value, out.est_count))
    for v, est in got.items():
        # MG guarantee: est <= true <= est + err
        assert est <= true[v] <= est + err, (v, est, true[v], err)
    # any value with true frequency > err must be present
    for v, c in true.items():
        if c > err:
            assert v in got, (v, c, err)


def test_global_row_number_and_ntile(ray_session):
    import pandas as pd

    rng = np.random.default_rng(21)
    v = rng.integers(0, 50, 337).astype(np.int64)  # heavy ties
    ids = rng.permutation(337).astype(np.int64)
    ds = _ds({"val": v, "id": ids})
    out = (
        relational.global_row_number(ds, "val", "id", out_col="rn", num_buckets=9)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    df = pd.DataFrame({"val": v, "id": ids}).sort_values(["val", "id"]).reset_index(drop=True)
    want = {i: rn for rn, i in enumerate(df.id)}
    assert all(want[r.id] == r.rn for r in out.itertuples())
    # NTILE formula vs an explicit partitioning
    for n, k in ((337, 4), (12, 5), (5, 8), (100, 1)):
        rn = np.arange(n, dtype=np.int64)
        tiles = relational.ntile_from_rn(rn, n, k)
        sizes = np.bincount(tiles)[1:]
        big, small = -(-n // k), n // k
        assert tiles.min() == 1 and tiles.max() == min(k, n)
        assert all(s in (big, small) for s in sizes)
        assert (np.diff(tiles) >= 0).all()
        assert sizes.sum() == n


def test_skew_join_matches_plain_join(ray_session):
    import pandas as pd

    rng = np.random.default_rng(31)
    # right side: one pathologically hot key + a cold tail
    rkeys = np.concatenate([np.zeros(500, dtype=np.int64),
                            rng.integers(1, 40, 200).astype(np.int64)])
    right = _ds({"k": rkeys, "rv": np.arange(len(rkeys), dtype=np.int64)})
    lkeys = rng.integers(0, 40, 300).astype(np.int64)
    left = _ds({"k": lkeys, "lv": np.arange(300, dtype=np.int64)})

    out = (
        relational.skew_join(left, right, on="k", hot_threshold=100, num_partitions=4)
        .to_pandas()
        .sort_values(["lv", "rv"])
        .reset_index(drop=True)
    )
    want = (
        pd.DataFrame({"k": lkeys, "lv": np.arange(300)})
        .merge(pd.DataFrame({"k": rkeys, "rv": np.arange(len(rkeys))}), on="k")
        .sort_values(["lv", "rv"])
        .reset_index(drop=True)
        .astype("int64")
    )
    assert list(out.columns) == ["k", "lv", "rv"]
    pd.testing.assert_frame_equal(out.astype("int64"), want)

    # all-cold regime takes the pure hash-join path and matches too
    out2 = (
        relational.skew_join(left, right, on="k", hot_threshold=10_000, num_partitions=4)
        .to_pandas()
        .sort_values(["lv", "rv"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out2.astype("int64"), want)


def test_skew_join_bounds_hot_collection(ray_session):
    import pytest as _pytest

    right = _ds({"k": np.zeros(700, dtype=np.int64),
                 "rv": np.arange(700, dtype=np.int64)})
    left = _ds({"k": np.zeros(3, dtype=np.int64), "lv": np.arange(3, dtype=np.int64)})
    with _pytest.raises(ValueError, match="hot side"):
        relational.skew_join(left, right, on="k", hot_threshold=10, num_partitions=2)


def test_bloom_semi_join_exact(ray_session):
    rng = np.random.default_rng(41)
    lk = rng.integers(0, 10_000, 2_000).astype(np.int64)
    rk = rng.integers(0, 10_000, 150).astype(np.int64)
    left = _ds({"k": lk, "lv": np.arange(2_000, dtype=np.int64)})
    right = _ds({"rk": rk})
    out = relational.bloom_semi_join(
        left, right, on="k", right_on="rk", num_partitions=4
    ).to_pandas()
    want = np.isin(lk, rk)
    assert len(out) == int(want.sum())
    assert set(out.lv) == set(np.flatnonzero(want))


def test_skew_join_all_hot(ray_session):
    import pandas as pd

    # every right key hot → cold join provably empty and skipped
    rkeys = np.repeat(np.arange(3, dtype=np.int64), 50)
    right = _ds({"k": rkeys, "rv": np.arange(150, dtype=np.int64)})
    left = _ds({"k": np.array([0, 1, 2, 9], dtype=np.int64),
                "lv": np.arange(4, dtype=np.int64)})
    out = (
        relational.skew_join(left, right, on="k", hot_threshold=10, num_partitions=2)
        .to_pandas()
        .sort_values(["lv", "rv"])
        .reset_index(drop=True)
    )
    want = (
        pd.DataFrame({"k": [0, 1, 2, 9], "lv": range(4)})
        .merge(pd.DataFrame({"k": rkeys, "rv": range(150)}), on="k")
        .sort_values(["lv", "rv"])
        .reset_index(drop=True)
        .astype("int64")
    )
    pd.testing.assert_frame_equal(out.astype("int64"), want)


def test_bloom_semi_join_empty_right(ray_session):
    left = _ds({"k": np.arange(10, dtype=np.int64)})
    right = _ds({"rk": np.arange(5, dtype=np.int64)}).filter(expr="rk > 100")
    out = relational.bloom_semi_join(left, right, on="k", right_on="rk",
                                     num_partitions=2)
    assert out.count() == 0


def test_rollup_aggregate_int_keys(ray_session):
    # non-string keys cast to string so the ALL sentinel stays total-ordered
    ds = _ds({"k": np.array([1, 1, 2], dtype=np.int64),
              "v": np.array([10, 20, 5], dtype=np.int64)})
    out = (
        relational.rollup_aggregate(ds, ["k"], "v", sum_name="sv")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert list(out.k) == ["1", "2", "ALL"]
    assert list(out.sv) == [30, 5, 35]


def test_skew_join_null_keys_go_cold(ray_session):
    import pandas as pd

    right = _ds({"k": pa.array([None] * 60 + [1] * 5, type=pa.int64()),
                 "rv": np.arange(65, dtype=np.int64)})
    left = _ds({"k": pa.array([1, None, 2], type=pa.int64()),
                "lv": np.arange(3, dtype=np.int64)})
    out = (
        relational.skew_join(left, right, on="k", hot_threshold=10, num_partitions=2)
        .to_pandas()
        .sort_values(["lv", "rv"])
        .reset_index(drop=True)
    )
    # SQL semantics: NULL keys never match — only the k=1 rows join
    assert list(out.lv.unique()) == [0] and len(out) == 5


def test_string_agg_skips_nulls(ray_session):
    ds = _ds({"g": [1, 1, 1], "name": pa.array(["b", None, "a"], type=pa.string())})
    out = relational.string_agg_per_group(ds, "g", "name").to_pandas()
    assert list(out["agg"]) == ["a,b"] and list(out.n_values) == [2]


def test_heavy_hitters_int_column(ray_session):
    vals = np.array([7] * 30 + [9] * 20 + [11] * 5, dtype=np.int64)
    out = relational.heavy_hitters(_ds({"v": vals}), "v", k=2, num_sketch=16).to_pandas()
    assert list(out.value) == [7, 9]
    assert list(out.est_count) == [30, 20]
    assert str(out.value.dtype) == "int64"


def test_dense_rank_rejects_beyond_float53(ray_session):
    big = _ds({"v": np.array([2**60, 2**60 + 1], dtype=np.int64),
               "id": np.array([0, 1], dtype=np.int64)})
    with pytest.raises(Exception, match="2\\^53"):
        relational.dense_rank(big, "v").to_pandas()


def test_sketch_quantiles_exact_regime(ray_session):
    v = np.arange(1, 101, dtype=np.float64)
    out = relational.sketch_quantiles(_ds({"v": v}), "v", [0.25, 0.5, 0.9],
                                      cap=4096).to_pandas()
    # quantile_disc: element at 0-based index ceil(q*n)-1
    assert out.q25.iloc[0] == 25.0
    assert out.q50.iloc[0] == 50.0
    assert out.q90.iloc[0] == 90.0


def test_sketch_quantiles_lossy_rank_error(ray_session):
    import ray.data

    rng = np.random.default_rng(7)
    v = rng.normal(size=60_000)
    ds = ray.data.from_arrow(pa.table({"v": pa.array(v)})).repartition(8)
    out = relational.sketch_quantiles(ds, "v", [0.1, 0.5, 0.9], cap=512).to_pandas()
    sv = np.sort(v)
    for col, q in (("q10", 0.1), ("q50", 0.5), ("q90", 0.9)):
        rank = np.searchsorted(sv, out[col].iloc[0]) / len(v)
        assert abs(rank - q) < 0.02, (col, rank)

    # determinism: same input, same sketch, bit-identical estimates
    out2 = relational.sketch_quantiles(ds, "v", [0.1, 0.5, 0.9], cap=512).to_pandas()
    assert out.equals(out2)


def test_percent_rank_and_grouped_median(ray_session):
    import pandas as pd

    rng = np.random.default_rng(17)
    v = rng.integers(0, 30, 200).astype(np.int64)
    ids = rng.permutation(200).astype(np.int64)
    out = (
        relational.percent_rank_scaled(_ds({"v": v, "id": ids}), "v", "id",
                                       scale=1000, num_buckets=5)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    df = pd.DataFrame({"v": v, "id": ids}).sort_values(["v", "id"]).reset_index(drop=True)
    rank_of = {i: rn for rn, i in enumerate(df.id)}
    for r in out.itertuples():
        assert r.pr_scaled == rank_of[r.id] * 1000 // 199

    g = np.repeat(["a", "b"], 100)
    gv = np.concatenate([np.arange(100), np.arange(100) * 10]).astype(np.int64)
    med = (
        relational.grouped_quantile_cont(_ds({"g": list(g), "c": gv}), "c", "g", 1, 2)
        .to_pandas()
        .sort_values("g")
    )
    # n=100 even: median x2 = x[49] + x[50]
    assert list(med.qcont_scaled) == [49 + 50, 490 + 500]


def test_quantile_filter_rejects_bad_keep(ray_session):
    ds = _ds({"v": np.arange(10, dtype=np.int64)})
    with pytest.raises(ValueError, match="keep"):
        relational.quantile_filter(ds, "v", q=0.5, keep="gte")


def test_sketch_quantiles_rejects_tiny_cap(ray_session):
    with pytest.raises(ValueError, match="cap"):
        relational.sketch_quantiles(_ds({"v": np.arange(5, dtype=np.int64)}),
                                    "v", [0.5], cap=0)


def test_quantile_cont_rejects_bad_q(ray_session):
    ds = _ds({"c": np.arange(5, dtype=np.int64)})
    with pytest.raises(ValueError, match="q_num"):
        relational.quantile_cont_scaled(ds, "c", 3, 1, "out")
    with pytest.raises(ValueError, match="q_num"):
        relational.grouped_quantile_cont(
            _ds({"g": ["a"] * 5, "c": np.arange(5, dtype=np.int64)}), "c", "g", -1, 2
        )


def test_join_remote_args_quarter_budget(ray_session):
    """Regression for the concurrent-join aggregator deadlock: Ray's default
    gives each join operator HALF the cluster's CPUs for aggregator actors,
    so two concurrent joins reserve 100 % and the tasks feeding them can
    never schedule (observed as a 45-min pytest hang on the 4-CPU test
    cluster). join_remote_args must keep ONE join's total aggregator
    reservation at a quarter of the cluster, so two joins + feeding tasks
    always fit."""
    import ray

    from takco_ray.util import join_remote_args

    from ray.data import DataContext

    cpus = float(ray.cluster_resources().get("CPU", 4.0))
    ctx = DataContext.get_current()
    max_aggs = (
        getattr(ctx, "max_hash_shuffle_aggregators", None)
        or getattr(ctx, "default_hash_shuffle_parallelism", None)
        or 10**9
    )
    for parts in (2, 8, 31, 64, 256):
        args = join_remote_args(parts)
        n_aggs = min(parts, int(max_aggs))
        ratio = -(-parts // n_aggs)
        # per-actor CPUs scale with the partitions-per-aggregator ratio
        # (mirrors Ray's _get_default_aggregator_ray_remote_args)
        assert 0 < args["num_cpus"] <= float(ratio)
        total = args["num_cpus"] * n_aggs
        # one join's pool ≤ 25 % of the cluster (+ float slack)
        assert total <= cpus * 0.25 + 1e-9
        # memory reservation and SPREAD mirrored from Ray's defaults
        assert args["scheduling_strategy"] == "SPREAD"
        # must NOT pass vacuously when the private estimator import failed:
        # the mirrored memory reservation is the point of this test
        assert "memory" in args and args["memory"] > 0
        # the memory reservation must account for multi-partition aggregators
        if parts > int(max_aggs):
            base = join_remote_args(n_aggs)
            assert args["memory"] >= base["memory"]


def test_two_concurrent_joins_complete_on_small_cluster(ray_session):
    """A single plan with two join operators must complete on the 4-CPU
    test cluster (the deadlock shape: labels ⋈ sources ⋈ quality)."""
    left = _ds({"k": list(range(200)), "a": list(range(200))})
    mid = _ds({"mk": list(range(200)), "b": [i * 2 for i in range(200)]})
    right = _ds({"rk": list(range(0, 200, 2)), "c": [i * 3 for i in range(100)]})
    from takco_ray.util import join_remote_args

    j1 = left.join(
        mid, join_type="inner", num_partitions=8, on=("k",), right_on=("mk",),
        aggregator_ray_remote_args=join_remote_args(8),
    )
    j2 = j1.join(
        right, join_type="inner", num_partitions=8, on=("k",), right_on=("rk",),
        aggregator_ray_remote_args=join_remote_args(8),
    )
    rows = j2.take_all()
    assert len(rows) == 100
    got = {r["k"]: (r["a"], r["b"], r["c"]) for r in rows}
    assert got[10] == (10, 20, 15)
