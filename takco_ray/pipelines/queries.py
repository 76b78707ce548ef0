"""Driver-conformance query catalog: Ray pipelines + DuckDB oracle SQL.

One entry per operator family from SURVEY.md §2, run over the driver's
testdata tables (``TESTDATA.md``). Contract (see ``__ray_entry__.py``):

- every Ray query names computed columns EXACTLY as its oracle SQL does;
- aggregates over decimal-valued doubles are integerized (×100 / ×10000,
  rounded, summed as int64) in BOTH engines, so value hashes match exactly —
  float sums would differ by summation order;
- genuinely non-SQL ops (LSH clustering, simhash, language-ID, ER) have no
  oracle entry → the driver records a rows-only check.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Count, Sum

from ..sources import read_table
from ..util import default_join_partitions, join_remote_args
from ..functions.hashing import sha256_hex
from ..stages import dedup as dedup_stages
from ..stages import textstats
from ..stages import ann as ann_stages
from ..stages import temporal as temporal_stages
from ..stages import relational
from ..stages import decontam as decontam_stages
from ..stages.multimodal import extract_media_features


# --------------------------------------------------------------------------
# helpers
# --------------------------------------------------------------------------

def _int_units(col: pa.ChunkedArray, factor: int) -> pa.Array:
    """double → int64 units (×factor, round) — deterministic summation."""
    scaled = pc.multiply(col.cast(pa.float64()), pa.scalar(float(factor)))
    return pc.cast(pc.round(scaled), pa.int64())


# --------------------------------------------------------------------------
# SQL-oracled queries (groupby / join / sort / filter / dedup / set ops)
# --------------------------------------------------------------------------

def q_pricing_summary(sf_dir: str):
    """TPC-H-Q1-shaped grouped aggregate over lineitem (SURVEY §2.5 A1/A8).

    Column pruning at the read; Ray's AggregateFn does map-side partials
    before the 4-group shuffle.
    """
    ds = read_table(
        sf_dir,
        "lineitem",
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
        ],
    )

    def prep(t: pa.Table) -> pa.Table:
        disc_price = pc.multiply(
            t.column("l_extendedprice").cast(pa.float64()),
            pc.subtract(pa.scalar(1.0), t.column("l_discount").cast(pa.float64())),
        )
        return pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "l_linestatus": t.column("l_linestatus"),
                "qty": t.column("l_quantity").cast(pa.int64()),
                "price_c": _int_units(t.column("l_extendedprice"), 100),
                "disc_price_u": pc.cast(
                    pc.round(pc.multiply(disc_price, pa.scalar(10000.0))), pa.int64()
                ),
            }
        )

    agg = (
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(Sum("qty"), Sum("price_c"), Sum("disc_price_u"), Count())
    )
    return agg.rename_columns(
        {
            "sum(qty)": "sum_qty",
            "sum(price_c)": "sum_price_c",
            "sum(disc_price_u)": "sum_disc_price_u",
            "count()": "count_order",
        }
    )


# Outer CAST(sum(...) AS BIGINT): DuckDB's sum(BIGINT) yields HUGEINT, which
# lands in pandas as float64 and fails the driver's typed value-hash even
# when every value matches the Ray-side int64.
SQL_PRICING = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS sum_disc_price_u,
       count(*) AS count_order
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


def q_nation_revenue(sf_dir: str):
    """orders ⋈ customer (hash-shuffle join) ⋈ nation (broadcast) — J3/J4.

    Customer is fact-sized, so it joins via ``Dataset.join`` like any big
    side; only the 25-row nation map is collected and broadcast (the
    reference's broadcast lookup is for the *small* side only,
    ``takco/link/base.py:122-136``). The nationkey→name mapping is applied
    vectorized with ``pc.index_in`` — no per-row Python.
    """
    import ray as _ray

    nation = read_table(sf_dir, "nation", columns=["n_nationkey", "n_name"]).to_pandas()
    nation_ref = _ray.put(
        (
            nation.n_nationkey.to_numpy(np.int64),
            nation.n_name.to_numpy(dtype=object),
        )
    )

    orders = read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    joined = orders.join(
        cust,
        join_type="inner",
        num_partitions=default_join_partitions(),
        aggregator_ray_remote_args=join_remote_args(default_join_partitions()),
        on=("o_custkey",),
        right_on=("c_custkey",),
    )

    def attach(t: pa.Table) -> pa.Table:
        keys, names = _ray.get(nation_ref)
        pos = pc.index_in(
            t.column("c_nationkey").cast(pa.int64()),
            pa.array(keys, type=pa.int64()),
        )
        return pa.table(
            {
                "n_name": pc.take(pa.array(names, type=pa.string()), pos),
                "price_c": _int_units(t.column("o_totalprice"), 100),
            }
        )

    agg = (
        joined.map_batches(attach, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("n_name")
        .aggregate(Sum("price_c"), Count())
    )
    return agg.rename_columns({"sum(price_c)": "revenue_c", "count()": "n_orders"})


SQL_NATION_REVENUE = """
SELECT n.n_name,
       CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_c,
       count(*) AS n_orders
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
"""


def q_segment_orders(sf_dir: str):
    """orders ⋈ customer via the HASH-SHUFFLE join (``Dataset.join``) —
    the wide-path join for when neither side is broadcastable."""
    orders = read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    joined = orders.join(
        cust,
        join_type="inner",
        num_partitions=default_join_partitions(),
        aggregator_ray_remote_args=join_remote_args(default_join_partitions()),
        on=("o_custkey",),
        right_on=("c_custkey",),
    )

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_mktsegment": t.column("c_mktsegment"),
                "price_c": _int_units(t.column("o_totalprice"), 100),
            }
        )

    agg = (
        joined.map_batches(prep, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .aggregate(Sum("price_c"), Count())
    )
    return agg.rename_columns({"sum(price_c)": "revenue_c", "count()": "n_orders"})


SQL_SEGMENT_ORDERS = """
SELECT c.c_mktsegment,
       CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_c,
       count(*) AS n_orders
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
"""


def q_top_parts(sf_dir: str):
    """Global sort + limit (SURVEY §2.6 O1/O6)."""
    ds = read_table(sf_dir, "part", columns=["p_partkey", "p_name", "p_retailprice"])
    return ds.sort(["p_retailprice", "p_partkey"], descending=[True, False]).limit(10)


SQL_TOP_PARTS = """
SELECT p_partkey, p_name, p_retailprice
FROM part ORDER BY p_retailprice DESC, p_partkey ASC LIMIT 10
"""


def q_filter_orders(sf_dir: str):
    """Predicate filter + projection (SURVEY §2.2 M7/M8)."""
    ds = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_orderstatus", "o_totalprice"]
    )

    def fn(t: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.equal(t.column("o_orderstatus"), "O"),
            pc.greater(t.column("o_totalprice"), 150000.0),
        )
        return t.filter(mask).select(["o_orderkey", "o_totalprice"])

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


SQL_FILTER_ORDERS = """
SELECT o_orderkey, o_totalprice FROM orders
WHERE o_orderstatus = 'O' AND o_totalprice > 150000.0
"""


def q_events_hourly(sf_dir: str):
    """Tumbling-window grouped aggregate over the events stream table
    (batch analog of a windowed aggregate; SURVEY §2.9)."""
    ds = read_table(sf_dir, "events", columns=["ts", "event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "hour": pc.floor_temporal(t.column("ts"), unit="hour"),
                "event_type": t.column("event_type"),
                "value_u": _int_units(t.column("value"), 10000),
            }
        )

    agg = (
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["hour", "event_type"])
        .aggregate(Sum("value_u"), Count())
    )

    def fix_unit(t: pa.Table) -> pa.Table:
        # Ray's sort-based groupby coerces timestamp keys to [s]; DuckDB
        # date_trunc yields [us] and the driver's value hash is typed
        return t.set_column(
            t.schema.get_field_index("hour"),
            "hour",
            t.column("hour").cast(pa.timestamp("us")),
        )

    return agg.map_batches(fix_unit, batch_format="pyarrow").rename_columns(
        {"sum(value_u)": "sum_value_u", "count()": "n_events"}
    )


SQL_EVENTS_HOURLY = """
SELECT date_trunc('hour', ts) AS hour, event_type,
       CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) AS sum_value_u,
       count(*) AS n_events
FROM events GROUP BY 1, 2
"""


def q_event_sessions(sf_dir: str):
    """Gap-based sessionization (custom temporal operator — Ray Data has no
    session window; stages/temporal.py builds it as one hash shuffle +
    vectorized per-partition segmentation). session_id = min event_id of the
    session; new session when the same-user gap exceeds 30 minutes."""
    ds = read_table(sf_dir, "events", columns=["event_id", "ts", "user_id"])
    return temporal_stages.sessionize(
        ds, key_column="user_id", ts_column="ts", id_column="event_id"
    )


SQL_EVENT_SESSIONS = """
WITH o AS (
  SELECT event_id, user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT event_id, user_id,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sess
  FROM o
)
SELECT event_id,
       CAST(min(event_id) OVER (PARTITION BY user_id, sess) AS BIGINT) AS session_id
FROM s
"""


def q_asof_orders(sf_dir: str):
    """As-of join (custom temporal operator): each event matched to the most
    recent order of the same customer with o_orderdate ≤ ts (ties → max
    o_orderkey). One shuffle + merge-scan; never builds the key×key cross
    product the SQL oracle scans."""
    events = read_table(sf_dir, "events", columns=["event_id", "ts", "user_id"])
    orders = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]
    )
    return temporal_stages.asof_join(
        events,
        orders,
        left_key="user_id",
        right_key="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        left_id="event_id",
        right_id="o_orderkey",
        right_value="o_totalprice",
    )


SQL_ASOF_ORDERS = """
SELECT event_id, o_orderkey, o_totalprice FROM (
  SELECT e.event_id, o.o_orderkey, o.o_totalprice,
         row_number() OVER (
           PARTITION BY e.event_id
           ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
         ) AS rn
  FROM events e JOIN orders o
    ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
) WHERE rn = 1
"""


def q_events_rolling(sf_dir: str):
    """Sliding-window (RANGE-frame) count (custom temporal operator): per
    event, how many same-user events fall in the preceding hour inclusive —
    the windowed-aggregate tier of the brief, computed with two global
    searchsorted calls per partition."""
    ds = read_table(sf_dir, "events", columns=["event_id", "ts", "user_id"])
    return temporal_stages.rolling_window_count(
        ds, key_column="user_id", ts_column="ts", id_column="event_id"
    )


SQL_EVENTS_ROLLING = """
SELECT event_id,
       CAST(count(*) OVER (
         PARTITION BY user_id ORDER BY ts
         RANGE BETWEEN INTERVAL '1 hour' PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS n_window
FROM events
"""


def q_event_pairs_range(sf_dir: str):
    """Self range join (custom temporal operator): all ordered pairs of
    same-user events within ±10 minutes of each other (identity pairs
    filtered). Banded searchsorted pair emission — output size is the true
    match count, never the key×key cross product."""
    ds = read_table(sf_dir, "events", columns=["event_id", "ts", "user_id"])
    ten_min = 10 * 60 * 1_000_000
    pairs = temporal_stages.range_join(
        ds,
        ds,
        left_key="user_id",
        right_key="user_id",
        left_ts="ts",
        right_ts="ts",
        left_id="event_id",
        right_id="event_id",
        before_us=ten_min,
        after_us=ten_min,
        left_id_out="event_id",
        right_id_out="other_id",
    )
    return pairs.filter(expr="event_id != other_id")


SQL_EVENT_PAIRS_RANGE = """
SELECT a.event_id AS event_id, b.event_id AS other_id
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND b.ts BETWEEN a.ts - INTERVAL '10 minutes' AND a.ts + INTERVAL '10 minutes'
 AND a.event_id <> b.event_id
"""


def q_semi_join_orders(sf_dir: str):
    """Semi-join: orders having ≥1 high-quantity lineitem (SURVEY §2.4 J2,
    the filter-matchers semi-join made first-class). Right side pruned to
    the key column before the single hash exchange."""
    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    big = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"]).filter(
        expr="l_quantity > 49"
    ).select_columns(["l_orderkey"])
    return relational.semi_join(orders, big, on="o_orderkey", right_on="l_orderkey")


SQL_SEMI_JOIN_ORDERS = """
SELECT o_orderkey, o_totalprice FROM orders
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity > 49)
"""


def q_anti_join_customers(sf_dir: str):
    """Anti-join: customers with no finished ('F') order — the novelty /
    not-matched shape (reference ``takco/evaluate/novelty.py``)."""
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_name"])
    f_orders = read_table(
        sf_dir, "orders", columns=["o_custkey", "o_orderstatus"]
    ).filter(expr="o_orderstatus == 'F'").select_columns(["o_custkey"])
    return relational.anti_join(cust, f_orders, on="c_custkey", right_on="o_custkey")


SQL_ANTI_JOIN_CUSTOMERS = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
"""


def q_top_orders_per_priority(sf_dir: str):
    """Per-group top-n (window row_number ≤ n): top-3 orders by totalprice
    per priority, map-side combiner bounds the shuffle at n×groups rows
    per batch (SURVEY §2.6 O2/O4 generalized)."""
    orders = read_table(
        sf_dir, "orders", columns=["o_orderpriority", "o_orderkey", "o_totalprice"]
    )
    return relational.top_n_per_group(
        orders, group_col="o_orderpriority", order_col="o_totalprice",
        n=3, tiebreak_col="o_orderkey",
    )


SQL_TOP_ORDERS_PER_PRIORITY = """
SELECT o_orderpriority, o_orderkey, o_totalprice, rank FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         CAST(row_number() OVER (
           PARTITION BY o_orderpriority
           ORDER BY o_totalprice DESC, o_orderkey
         ) AS BIGINT) AS rank
  FROM orders
) WHERE rank <= 3
"""


def q_orders_pivot(sf_dir: str):
    """Pivot (conditional-aggregation form): order-status counts as columns
    per priority. Shuffle carries groups×categories integers only."""
    orders = read_table(sf_dir, "orders", columns=["o_orderpriority", "o_orderstatus"])
    return relational.pivot_counts(
        orders, index_col="o_orderpriority", pivot_col="o_orderstatus",
        categories=["F", "O", "P"],
    )


SQL_ORDERS_PIVOT = """
SELECT o_orderpriority,
       CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
       CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
       CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
FROM orders GROUP BY o_orderpriority
"""


def q_quantiles_quantity(sf_dir: str):
    """Exact distributed quantiles via the value-histogram route — only
    distinct values shuffle, never rows (SURVEY §2.5 A9 distribution stats
    generalized to quantiles)."""
    li = read_table(sf_dir, "lineitem", columns=["l_quantity"])
    return relational.exact_quantiles(li, "l_quantity", [0.25, 0.5, 0.75, 0.99])


SQL_QUANTILES_QUANTITY = """
SELECT quantile_disc(l_quantity, 0.25) AS q25,
       quantile_disc(l_quantity, 0.50) AS q50,
       quantile_disc(l_quantity, 0.75) AS q75,
       quantile_disc(l_quantity, 0.99) AS q99
FROM lineitem
"""


def q_grouped_quantiles(sf_dir: str):
    """Per-group exact quantiles (distribution stats per key) — only
    distinct (group, value) pairs shuffle."""
    li = read_table(sf_dir, "lineitem", columns=["l_returnflag", "l_quantity"])
    return relational.grouped_quantiles(
        li, col="l_quantity", group_col="l_returnflag", qs=[0.25, 0.5, 0.9]
    )


SQL_GROUPED_QUANTILES = """
SELECT l_returnflag,
       quantile_disc(l_quantity, 0.25) AS q25,
       quantile_disc(l_quantity, 0.50) AS q50,
       quantile_disc(l_quantity, 0.90) AS q90
FROM lineitem GROUP BY l_returnflag
"""


def q_doc_sample(sf_dir: str):
    """Deterministic 10% hash sample of documents — stateless projection,
    identical membership on any engine / cluster size."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "n_chars"])
    return relational.hash_sample(docs, "doc_id", modulus=1000, keep=100)


SQL_DOC_SAMPLE = """
SELECT doc_id, n_chars FROM documents
WHERE (doc_id * 2654435761) % 1000 < 100
"""


def q_events_running_sum(sf_dir: str):
    """Per-key running total (SQL window ROWS UNBOUNDED PRECEDING) — one
    hash shuffle + one cumsum per partition; integer micro-units so the
    accumulation is associative and engine-exact."""
    ev = read_table(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"])
    return temporal_stages.grouped_running_sum(
        ev, key_column="user_id", ts_column="ts", id_column="event_id",
        value_column="value", units=1_000_000,
    )


SQL_EVENTS_RUNNING_SUM = """
SELECT event_id, CAST(sum(CAST(round(value * 1000000) AS BIGINT)) OVER (
  PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING
) AS BIGINT) AS running_sum
FROM events
"""


def q_customer_f_order_counts(sf_dir: str):
    """LEFT OUTER join with null semantics: per-customer count of finished
    orders, zero for customers with none (71 such at sf0.01)."""
    cust = read_table(sf_dir, "customer", columns=["c_custkey"])
    f_orders = read_table(
        sf_dir, "orders", columns=["o_custkey", "o_orderstatus"]
    ).filter(expr="o_orderstatus == 'F'").select_columns(["o_custkey"])

    def mark(t: pa.Table) -> pa.Table:
        # the join coalesces the right key column away; an explicit marker
        # column survives as NULL on unmatched left rows
        return pa.table(
            {
                "o_custkey": t.column("o_custkey").cast(pa.int64()),
                "matched": pa.array(np.ones(t.num_rows, dtype=np.int64), type=pa.int64()),
            }
        )

    joined = cust.join(
        f_orders.map_batches(mark, batch_format="pyarrow", zero_copy_batch=True),
        join_type="left_outer",
        num_partitions=default_join_partitions(),
        aggregator_ray_remote_args=join_remote_args(default_join_partitions()),
        on=("c_custkey",),
        right_on=("o_custkey",),
    )

    def proj(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": t.column("c_custkey").cast(pa.int64()),
                "hit": pc.cast(t.column("matched").is_valid(), pa.int64()),
            }
        )

    agg = (
        joined.map_batches(proj, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("c_custkey")
        .aggregate(Sum("hit"))
    )
    return agg.rename_columns({"sum(hit)": "n_f_orders"})


SQL_CUSTOMER_F_ORDER_COUNTS = """
SELECT c.c_custkey, CAST(count(o.o_custkey) AS BIGINT) AS n_f_orders
FROM customer c LEFT JOIN (
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
) o ON c.c_custkey = o.o_custkey
GROUP BY c.c_custkey
"""


def q_name_distances(sf_dir: str):
    """String-distance scalar functions (SURVEY §2.8 lev/JW) SQL-verified:
    edit distance + Jaro-Winkler between consecutive customer names.
    Levenshtein runs the vectorized batch DP; JW is the scalar kernel over
    short key strings (bounded per batch — the flagship path never calls
    it on content)."""
    from ..functions.strings import levenshtein_ratio_batch, jaro_winkler

    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_name"])

    def as_right(t: pa.Table) -> pa.Table:
        return pa.table(
            {"rkey": t.column("c_custkey").cast(pa.int64()), "rname": t.column("c_name")}
        )

    def add_next(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "id1": t.column("c_custkey").cast(pa.int64()),
                "lname": t.column("c_name"),
                "next_key": pc.add(t.column("c_custkey").cast(pa.int64()), pa.scalar(1)),
            }
        )

    joined = cust.map_batches(add_next, batch_format="pyarrow", zero_copy_batch=True).join(
        cust.map_batches(as_right, batch_format="pyarrow", zero_copy_batch=True),
        join_type="inner",
        num_partitions=default_join_partitions(),
        aggregator_ray_remote_args=join_remote_args(default_join_partitions()),
        on=("next_key",),
        right_on=("rkey",),
    )

    def dists(t: pa.Table) -> pa.Table:
        a = t.column("lname").to_pylist()
        b = t.column("rname").to_pylist()
        lev = levenshtein_ratio_batch(a, b, return_distance=True)
        jw = np.array(
            [np.floor(jaro_winkler(x, y) * 1e6 + 0.5) for x, y in zip(a, b)],
            dtype=np.int64,
        )
        return pa.table(
            {
                "id1": t.column("id1").cast(pa.int64()),
                "lev": pa.array(lev, type=pa.int64()),
                "jw_u": pa.array(jw, type=pa.int64()),
            }
        )

    return joined.map_batches(dists, batch_format="pyarrow", zero_copy_batch=True)


SQL_NAME_DISTANCES = """
SELECT a.c_custkey AS id1,
       CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS lev,
       CAST(floor(jaro_winkler_similarity(a.c_name, b.c_name) * 1000000 + 0.5) AS BIGINT) AS jw_u
FROM customer a JOIN customer b ON b.c_custkey = a.c_custkey + 1
"""


def q_distinct_segments(sf_dir: str):
    """Distinct values (SURVEY §2.7 D6)."""
    ds = read_table(sf_dir, "customer", columns=["c_mktsegment"])
    vals = sorted(ds.unique("c_mktsegment"))
    return pa.table({"c_mktsegment": pa.array(vals, type=pa.string())})


SQL_DISTINCT_SEGMENTS = "SELECT DISTINCT c_mktsegment FROM customer"


def q_union_accounts(sf_dir: str):
    """Union-all of two sources with a tag column (SURVEY §2.7 D1)."""
    cust = read_table(sf_dir, "customer", columns=["c_name", "c_acctbal"]).map_batches(
        lambda t: pa.table(
            {
                "name": t.column("c_name"),
                "acctbal_c": _int_units(t.column("c_acctbal"), 100),
                "side": pa.array(["customer"] * len(t), type=pa.string()),
            }
        ),
        batch_format="pyarrow",
    )
    supp = read_table(sf_dir, "supplier", columns=["s_name", "s_acctbal"]).map_batches(
        lambda t: pa.table(
            {
                "name": t.column("s_name"),
                "acctbal_c": _int_units(t.column("s_acctbal"), 100),
                "side": pa.array(["supplier"] * len(t), type=pa.string()),
            }
        ),
        batch_format="pyarrow",
    )
    return cust.union(supp)


SQL_UNION_ACCOUNTS = """
SELECT c_name AS name, CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_c,
       'customer' AS side FROM customer
UNION ALL
SELECT s_name AS name, CAST(round(s_acctbal * 100) AS BIGINT) AS acctbal_c,
       'supplier' AS side FROM supplier
"""


def q_doc_sha256(sf_dir: str):
    """Per-row content hash — the engine's invariant column (SURVEY §2.8)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "sha": pa.array(sha256_hex(t.column("text").to_pylist())),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


SQL_DOC_SHA256 = "SELECT doc_id, sha256(text) AS sha FROM documents"


def q_exact_dedup_docs(sf_dir: str):
    """Exact dedup: min-id survivor + dup_count per distinct text
    (SURVEY §2.7 D2, reference header-union A2)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    out = dedup_stages.exact_dedup(ds, text_column="text", id_column="doc_id")
    return out.select_columns(["doc_id", "dup_count"])


SQL_EXACT_DEDUP_DOCS = """
SELECT min(doc_id) AS doc_id, count(*) AS dup_count
FROM documents GROUP BY text
"""


def q_token_counts_docs(sf_dir: str):
    """Token counting (SURVEY §2.8 tokenize / M13)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return textstats.token_counts(ds, text_column="text", id_column="doc_id")


SQL_TOKEN_COUNTS = r"""
SELECT doc_id AS id,
       len(regexp_extract_all(text, '\w+')) AS n_tokens,
       len(list_distinct(regexp_extract_all(lower(text), '\w+'))) AS n_unique_tokens
FROM documents
"""


def q_doc_char_stats(sf_dir: str):
    """Integer quality counters (chars / punct / tokens) — the SQL-checkable
    core of quality scoring; the float composite is rows-only (q_doc_quality).
    """
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        col = t.column("text")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        filled = pc.fill_null(col, "")
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_chars": pc.utf8_length(filled).cast(pa.int64()),
                "n_punct": pc.count_substring_regex(filled, r"[^\w\s]").cast(pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


SQL_DOC_CHAR_STATS = r"""
SELECT doc_id, length(text) AS n_chars,
       len(regexp_extract_all(text, '[^\w\s]')) AS n_punct
FROM documents
"""


def q_embedding_neighbors(sf_dir: str):
    """Threshold cosine similarity against a fixed query set (SURVEY §2.6 O3,
    reference EmbeddingMatcher blocking).

    Membership-only output (no float column): rank ties can't flip the hash.
    """
    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    qtab = (
        read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
        .filter(expr="vec_id < 50")
        .to_pandas()
    )
    qids = qtab.vec_id.to_numpy()
    qmat = np.stack(qtab.embedding.to_numpy())
    # 0.3 sits ≥1e-4 from every cosine in this synthetic corpus — float
    # noise (~1e-15 relative) cannot flip membership vs the DuckDB oracle
    out = ann_stages.cosine_above(
        emb, qids, qmat, threshold=0.3, id_column="vec_id", emb_column="embedding"
    )

    def strip(t: pa.Table) -> pa.Table:
        mask = pc.not_equal(t.column("query_id"), t.column("neighbor_id"))
        return t.filter(mask).select(["query_id", "neighbor_id"])

    return out.map_batches(strip, batch_format="pyarrow")


SQL_EMBEDDING_NEIGHBORS = """
SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id
FROM embeddings q, embeddings e
WHERE q.vec_id < 50 AND e.vec_id <> q.vec_id
  AND list_cosine_similarity(q.embedding, e.embedding) >= 0.3
"""


def q_embedding_pair_cos(sf_dir: str, bucket_width: int = 4096):
    """Per-pair cosine channel — the flagship scorer's ``emb_cos`` kernel
    (``functions.featurize.cosine_rows``, reference EmbeddingMatcher
    ``embedding.py:222-246``) exercised over consecutive-id embedding
    pairs. Acero rejects list-typed non-key join fields, so the pairing
    uses the repo's temporal bucket-shuffle shape: rows hash to
    ``vec_id // bucket_width`` buckets (bucket-boundary rows duplicated
    into the previous bucket), one grouped exchange, then a vectorized
    merge scan pairs adjacent ids. Thresholded membership keeps the value
    hash float-safe: min |cos − 0.2| ≥ 2.5e-4 at every SF, ≫ the ~1e-6
    numpy-vs-DuckDB float divergence."""
    from ..functions.featurize import cosine_rows
    from ..stages.ann import _emb_matrix
    from ..stages.groupmap import partitioned_group_map

    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    B = bucket_width

    def to_buckets(t: pa.Table) -> pa.Table:
        vid = np.asarray(t.column("vec_id").combine_chunks(), dtype=np.int64)
        b = vid // B
        extra = np.flatnonzero(vid % B == 0)  # pairs with vid-1 in bucket b-1
        idx = np.concatenate([np.arange(len(vid), dtype=np.int64), extra])
        bucket = np.concatenate([b, b[extra] - 1])
        tt = t.take(pa.array(idx, type=pa.int64()))
        return tt.append_column("bucket", pa.array(bucket, type=pa.int64()))

    def pair_in_bucket(g: pa.Table) -> pa.Table:
        vid = np.asarray(g.column("vec_id").combine_chunks(), dtype=np.int64)
        bkt = np.asarray(g.column("bucket").combine_chunks(), dtype=np.int64)
        order = np.lexsort((vid, bkt))
        vs, bs = vid[order], bkt[order]
        # (v, v+1) adjacent within a bucket segment; emit only in v's HOME
        # bucket so the duplicated boundary row never double-pairs
        adj = (
            (vs[1:] == vs[:-1] + 1)
            & (bs[1:] == bs[:-1])
            & (vs[:-1] // B == bs[:-1])
            if len(vs) > 1
            else np.zeros(0, dtype=bool)
        )
        li = np.flatnonzero(adj)
        left = g.take(pa.array(order[li], type=pa.int64()))
        right = g.take(pa.array(order[li + 1], type=pa.int64()))
        cos = cosine_rows(
            _emb_matrix(left, "embedding"), _emb_matrix(right, "embedding")
        )
        return pa.table(
            {
                "id1": left.column("vec_id").cast(pa.int64()),
                "id2": right.column("vec_id").cast(pa.int64()),
                "near": pa.array((cos >= 0.2).astype(np.int64), type=pa.int64()),
            }
        )

    bucketed = emb.map_batches(to_buckets, batch_format="pyarrow", zero_copy_batch=True)
    return partitioned_group_map(
        bucketed, "bucket", pair_in_bucket, default_join_partitions()
    )


SQL_EMBEDDING_PAIR_COS = """
SELECT e1.vec_id AS id1, e2.vec_id AS id2,
       CAST(list_cosine_similarity(e1.embedding, e2.embedding) >= 0.2 AS BIGINT) AS near
FROM embeddings e1 JOIN embeddings e2 ON e2.vec_id = e1.vec_id + 1
"""


# --------------------------------------------------------------------------
# rows-only queries (non-SQL-expressible: LSH clustering, heuristics, ER)
# --------------------------------------------------------------------------

def q_minhash_dedup_docs(sf_dir: str):
    """MinHash+LSH near-dup clusters over documents (SURVEY §2.7 D3)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return dedup_stages.minhash_dedup(
        ds, text_column="text", id_column="doc_id", shingle_k=3, threshold=0.5
    )


def q_simhash_docs(sf_dir: str):
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return dedup_stages.simhash_dedup(ds, text_column="text", id_column="doc_id")


def q_simhash_neardup_docs(sf_dir: str):
    """Hamming-ball SimHash near-dup clusters (exact-recall banding +
    popcount verify; rows-only — gated by the brute-force pytest oracle)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return dedup_stages.simhash_neardup(
        ds, text_column="text", id_column="doc_id", max_hamming=3
    )


def q_ngram_jaccard_docs(sf_dir: str):
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return dedup_stages.ngram_jaccard_pairs(
        ds, text_column="text", id_column="doc_id", shingle_k=3, threshold=0.5
    )


def q_language_id_docs(sf_dir: str):
    """Language-ID predictions (SQL-oracled on the string label; the float
    confidence stays operator-level — round() tie semantics differ across
    engines)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return textstats.language_id(ds, text_column="text", id_column="doc_id").select_columns(
        ["id", "lang_pred"]
    )


def _sql_language_id() -> str:
    from ..stages.textstats import _LANG_PROFILES

    langs = sorted(_LANG_PROFILES)
    hits = ",\n       ".join(
        "len(list_filter(toks, t -> t IN ({}))) AS h_{}".format(
            ", ".join(f"'{w}'" for w in sorted(_LANG_PROFILES[l])), l
        )
        for l in langs
    )
    # first-maximum tie-break in profile order — same as numpy argmax
    case = "CASE WHEN greatest({all}) = 0 THEN 'und' ".format(
        all=", ".join(f"h_{l}" for l in langs)
    )
    for i, l in enumerate(langs[:-1]):
        rest = ", ".join(f"h_{m}" for m in langs[i + 1 :])
        case += f"WHEN h_{l} >= greatest({rest}) THEN '{l}' "
    case += f"ELSE '{langs[-1]}' END AS lang_pred"
    return f"""
WITH tokd AS (
  SELECT doc_id AS id, regexp_extract_all(lower(text), '\\w+') AS toks FROM documents
), hits AS (
  SELECT id, {hits} FROM tokd
)
SELECT id, {case} FROM hits
"""


def q_doc_quality(sf_dir: str):
    """Quality scores in int64 micro-units — engine-independent floor(x·1e6
    + 0.5) over identical IEEE expressions, so the typed value hash matches
    DuckDB exactly (no round() tie-break differences)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return textstats.quality_scores(ds, text_column="text", id_column="doc_id", units=True)


_EN_STOP_SQL = None


def _sql_doc_quality() -> str:
    from ..stages.textstats import _LANG_PROFILES

    en = ", ".join(f"'{w}'" for w in sorted(_LANG_PROFILES["en"]))
    return f"""
WITH tokd AS (
  SELECT doc_id AS id,
         CAST(length(text) AS DOUBLE) AS n_chars_f,
         CAST(len(regexp_extract_all(text, '[^\\w\\s]')) AS DOUBLE) AS punct,
         regexp_extract_all(lower(text), '\\w+') AS toks
  FROM documents
), feat AS (
  SELECT id, n_chars_f,
         punct / greatest(n_chars_f, 1.0) AS punct_ratio,
         CAST(coalesce(list_sum(list_transform(toks, t -> length(t))), 0) AS DOUBLE)
           / greatest(CAST(len(toks) AS DOUBLE), 1.0) AS mean_tok,
         CAST(len(list_filter(toks, t -> t IN ({en}))) AS DOUBLE)
           / greatest(CAST(len(toks) AS DOUBLE), 1.0) AS stop_ratio
  FROM tokd
)
SELECT id,
       CAST(n_chars_f AS BIGINT) AS n_chars,
       CAST(floor(punct_ratio * 1000000 + 0.5) AS BIGINT) AS punct_ratio_u,
       CAST(floor(mean_tok * 1000000 + 0.5) AS BIGINT) AS mean_token_len_u,
       CAST(floor(stop_ratio * 1000000 + 0.5) AS BIGINT) AS stopword_ratio_u,
       CAST(floor(
         (least(greatest(n_chars_f / 200.0, 0.0), 1.0) * 0.25
          + least(greatest(1.0 - 4.0 * punct_ratio, 0.0), 1.0) * 0.25
          + least(greatest(1.0 - abs(mean_tok - 5.0) / 5.0, 0.0), 1.0) * 0.25
          + least(greatest(stop_ratio * 4.0, 0.0), 1.0) * 0.25) * 1000000 + 0.5
       ) AS BIGINT) AS quality_u
FROM feat
"""


def q_doc_fingerprints(sf_dir: str):
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return textstats.fingerprints(ds, text_column="text", id_column="doc_id")


def q_embedding_topk(sf_dir: str):
    """Exact top-5 neighbors per query (SQL-oracled on (query, neighbor,
    rank); the raw cosine stays operator-level — summation order makes the
    float differ across engines at ~1e-15)."""
    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    qtab = (
        read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
        .filter(expr="vec_id < 10")
        .to_pandas()
    )
    qmat = np.stack(qtab.embedding.to_numpy())
    out = ann_stages.brute_topk(
        emb, qtab.vec_id.to_numpy(), qmat, k=5, id_column="vec_id", emb_column="embedding"
    )
    return out.select_columns(["query_id", "neighbor_id", "rank"])


SQL_EMBEDDING_TOPK = """
SELECT query_id, neighbor_id, rank FROM (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY list_cosine_similarity(q.embedding, e.embedding) DESC,
                    e.vec_id ASC
         ) AS rank
  FROM embeddings q, embeddings e
  WHERE q.vec_id < 10
) WHERE rank <= 5
"""


def q_ivf_topk(sf_dir: str):
    """IVF top-k at FULL probe (n_probe == n_centroids): every cell is
    searched, so results are exactly brute force — which makes the brute
    SQL oracle (``SQL_EMBEDDING_TOPK``) an EXACT oracle for the IVF
    machinery (cell assignment, per-cell search, partial+final top-k)."""
    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    qtab = (
        read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
        .filter(expr="vec_id < 10")
        .to_pandas()
    )
    qmat = np.stack(qtab.embedding.to_numpy())
    out = ann_stages.ivf_topk(
        emb,
        qtab.vec_id.to_numpy(),
        qmat,
        k=5,
        n_centroids=16,
        n_probe=16,
        id_column="vec_id",
        emb_column="embedding",
    )
    return out.select_columns(["query_id", "neighbor_id", "rank"])


def q_top_tokens(sf_dir: str):
    """Corpus-global token frequency top-k — vocabulary-sized groupby over
    per-batch Arrow hash-aggregate partials."""
    docs = read_table(sf_dir, "documents", columns=["text"])
    return textstats.global_token_topk(docs, text_column="text", k=20)


SQL_TOP_TOKENS = r"""
SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM (
  SELECT unnest(list_filter(string_split_regex(lower(text), '\W+'), x -> x <> '')) AS token
  FROM documents
) GROUP BY token ORDER BY cnt DESC, token LIMIT 20
"""


def q_stop_shingles(sf_dir: str):
    """Corpus heavy-hitter shingles by document frequency — the measured
    input to stop-shingle demotion (hot-LSH-block mitigation)."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return textstats.stop_shingles(
        docs, text_column="text", id_column="doc_id", shingle_k=3, top_k=20
    )


SQL_STOP_SHINGLES = r"""
WITH tok AS (SELECT doc_id, list_filter(regexp_extract_all(lower(text), '\w+'), x -> x <> '') AS ts
             FROM documents),
sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, len(ts) - 1),
                               i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS shingle
  FROM tok)
SELECT shingle, CAST(count(*) AS BIGINT) AS df
FROM sh GROUP BY shingle ORDER BY df DESC, shingle LIMIT 20
"""


def q_tfidf_terms(sf_dir: str):
    """Per-doc salient terms by tf/df (TF-IDF core with exact ranking)."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return textstats.tfidf_top_terms(docs, text_column="text", id_column="doc_id", k=3)


SQL_TFIDF_TERMS = r"""
WITH tok AS (
  SELECT doc_id, unnest(list_filter(regexp_extract_all(lower(text), '\w+'), x -> x <> '')) AS token
  FROM documents),
tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token),
df AS (SELECT token, count(DISTINCT doc_id) AS df FROM tok GROUP BY token),
scored AS (
  SELECT tf.doc_id, tf.token, tf.tf, df.df,
         row_number() OVER (
           PARTITION BY tf.doc_id
           ORDER BY CAST(tf.tf AS DOUBLE) / df.df DESC, tf.token
         ) AS rank
  FROM tf JOIN df USING (token))
SELECT doc_id AS id, token, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
       CAST(rank AS BIGINT) AS rank
FROM scored WHERE rank <= 3
"""


def q_ngram_repetition_docs(sf_dir: str):
    """Duplicate-n-gram repetition stats (Gopher-style quality signal)."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return textstats.ngram_repetition(docs, text_column="text", id_column="doc_id", shingle_k=3)


SQL_NGRAM_REPETITION = r"""
WITH tok AS (SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS ts FROM documents),
sh AS (
  SELECT doc_id,
         list_transform(range(1, len(ts) - 1),
                        i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]) AS s
  FROM tok)
SELECT doc_id AS id, CAST(len(s) AS BIGINT) AS n_ngrams,
       CAST(len(list_distinct(s)) AS BIGINT) AS n_unique_ngrams
FROM sh
"""


def q_quantile_filter_docs(sf_dir: str):
    """Global-statistic curation gate: drop the shortest quartile of the
    corpus — threshold computed distributed (histogram quantile), applied as
    a stateless filter (:func:`takco_ray.stages.relational.quantile_filter`)."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "n_chars"])
    return relational.quantile_filter(docs, "n_chars", q=0.25, keep="ge")


SQL_QUANTILE_FILTER = """
SELECT doc_id, n_chars FROM documents
WHERE n_chars >= (SELECT quantile_disc(n_chars, 0.25) FROM documents)
"""


def q_source_quota_docs(sf_dir: str):
    """Per-source quota (domain-rebalancing curation): keep at most 10 docs
    per source, longest first, deterministic tiebreak — the documents-table
    instance of the per-group top-n combiner."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "source", "n_chars"])
    return relational.top_n_per_group(
        docs, group_col="source", order_col="n_chars", n=10, tiebreak_col="doc_id"
    )


SQL_SOURCE_QUOTA = """
SELECT doc_id, source, n_chars, rank FROM (
  SELECT doc_id, source, n_chars,
         row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rank
  FROM documents)
WHERE rank <= 10
"""


_LICENSE_HEADERS = [
    '// Licensed under the Apache License, Version 2.0 (the "License")',
    "/* Permission is hereby granted, free of charge, to any person */",
    "# This program is free software: GNU General Public License version 3",
    "// Redistribution and use in source and binary forms, with or without",
    "/* This is free and unencumbered software released into the public domain */",
    "",
]


def q_license_scan_docs(sf_dir: str):
    """SPDX-style license header detection. The synthetic documents carry no
    license text, so each doc is first prepended a deterministic
    doc_id-derived header in BOTH engines (same pattern as
    ``redact_pii_docs``), then scanned with the priority phrase rules."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def enrich(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").cast(pa.int64())
        ids_np = np.asarray(ids.combine_chunks(), dtype=np.int64)
        hdr = pa.array(
            np.array(_LICENSE_HEADERS, dtype=object)[ids_np % 6], type=pa.string()
        )
        return pa.table(
            {
                "doc_id": ids,
                "text": pc.binary_join_element_wise(hdr, t.column("text"), "\n"),
            }
        )

    enriched = ds.map_batches(enrich, batch_format="pyarrow", zero_copy_batch=True)
    return textstats.license_scan(enriched, text_column="text", id_column="doc_id")


SQL_LICENSE_SCAN = r"""
WITH enriched AS (
  SELECT doc_id,
         CASE doc_id % 6
           WHEN 0 THEN '// Licensed under the Apache License, Version 2.0 (the "License")'
           WHEN 1 THEN '/* Permission is hereby granted, free of charge, to any person */'
           WHEN 2 THEN '# This program is free software: GNU General Public License version 3'
           WHEN 3 THEN '// Redistribution and use in source and binary forms, with or without'
           WHEN 4 THEN '/* This is free and unencumbered software released into the public domain */'
           ELSE ''
         END || chr(10) || text AS t
  FROM documents),
hdr AS (SELECT doc_id, lower(substr(t, 1, 2048)) AS h FROM enriched),
lic AS (
  SELECT doc_id,
         CASE
           WHEN contains(h, 'licensed under the apache license') THEN 'apache-2.0'
           WHEN contains(h, 'permission is hereby granted, free of charge') THEN 'mit'
           WHEN contains(h, 'gnu general public license') AND contains(h, 'version 3') THEN 'gpl-3.0'
           WHEN contains(h, 'gnu general public license') AND contains(h, 'version 2') THEN 'gpl-2.0'
           WHEN contains(h, 'redistribution and use in source and binary forms') THEN 'bsd-3-clause'
           WHEN contains(h, 'mozilla public license') THEN 'mpl-2.0'
           WHEN contains(h, 'this is free and unencumbered software') THEN 'unlicense'
           ELSE 'none'
         END AS license
  FROM hdr)
SELECT doc_id AS id, license,
       CAST(license IN ('apache-2.0', 'mit', 'bsd-3-clause', 'mpl-2.0', 'unlicense') AS BIGINT) AS permissive
FROM lic
"""


def q_dup_span_docs(sf_dir: str):
    """Cross-doc duplicated-n-gram spans per document — the substring-level
    dedup signal (within-doc repeats excluded; see
    :func:`takco_ray.stages.dedup.cross_doc_dup_spans`)."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return dedup_stages.cross_doc_dup_spans(docs, text_column="text", id_column="doc_id", shingle_k=3)


SQL_DUP_SPANS = r"""
WITH tok AS (SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS ts FROM documents),
shl AS (
  SELECT doc_id,
         list_transform(range(1, len(ts) - 1),
                        i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]) AS s
  FROM tok),
inst AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(s) + 1),
                               i -> {'pos': i, 'sh': s[i]}),
                recursive := true)
  FROM shl),
df AS (SELECT sh, count(DISTINCT doc_id) AS df FROM inst GROUP BY sh),
dup AS (SELECT i.doc_id, i.pos FROM inst i JOIN df USING (sh) WHERE df.df >= 2),
agg AS (SELECT doc_id, count(*) AS dup_ngrams FROM dup GROUP BY doc_id),
runs AS (SELECT doc_id,
                pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
         FROM dup),
runlen AS (SELECT doc_id, max(cnt) AS max_run FROM
             (SELECT doc_id, grp, count(*) AS cnt FROM runs GROUP BY doc_id, grp)
           GROUP BY doc_id)
SELECT shl.doc_id AS id, CAST(len(s) AS BIGINT) AS n_ngrams,
       CAST(coalesce(agg.dup_ngrams, 0) AS BIGINT) AS dup_ngrams,
       CAST(coalesce(runlen.max_run, 0) AS BIGINT) AS max_dup_run
FROM shl LEFT JOIN agg USING (doc_id) LEFT JOIN runlen USING (doc_id)
"""


def q_decontam_docs(sf_dir: str):
    """Benchmark decontamination: the 'benchmark' is the deterministic
    doc_id % 97 == 0 slice (a stand-in for held-out eval sets); the corpus
    side is a pure projection against the broadcast shingle set."""
    import ray as _ray

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def bench_mask(t: pa.Table) -> pa.Table:
        ids = np.asarray(t.column("doc_id").combine_chunks(), dtype=np.int64)
        return t.filter(pa.array(ids % 97 == 0))

    bench_docs = docs.map_batches(bench_mask, batch_format="pyarrow", zero_copy_batch=True)
    bench = decontam_stages.collect_benchmark_shingles(bench_docs, "text", shingle_k=3)
    ref = _ray.put(bench)
    return decontam_stages.decontaminate(docs, "text", "doc_id", ref, shingle_k=3)


def q_decontam_bloom_docs(sf_dir: str):
    """Bloom-probe decontamination (the membership scale path): same
    benchmark slice as ``decontam_docs``, sorted-array broadcast replaced by
    a bits-per-key-bounded Bloom filter — n_flagged ≥ the exact count, a
    0-flag doc is provably clean. Rows-only here; the exact-vs-bloom
    envelope is pytest-gated (no false negatives, FP-bounded overshoot)."""
    from ..functions.sketch import bloom_params

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def bench_mask(t: pa.Table) -> pa.Table:
        ids = np.asarray(t.column("doc_id").combine_chunks(), dtype=np.int64)
        return t.filter(pa.array(ids % 97 == 0))

    bench_docs = docs.map_batches(bench_mask, batch_format="pyarrow", zero_copy_batch=True)
    n_keys = len(decontam_stages.collect_benchmark_shingles(bench_docs, "text", shingle_k=3))
    n_bits, k = bloom_params(max(n_keys, 1), bits_per_key=12)
    bloom = decontam_stages.build_benchmark_bloom(bench_docs, "text", n_bits, k, shingle_k=3)
    import ray as _ray

    return decontam_stages.decontaminate_bloom(
        docs, "text", "doc_id", _ray.put(bloom), k, shingle_k=3
    )


def q_line_stats_docs(sf_dir: str):
    """Within-document line-duplication stats (boilerplate signal): exact
    per-doc distinct lines via Arrow dictionary-encode — no hash-collision
    caveat, so the DuckDB list_distinct oracle hash-matches."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return textstats.line_stats(ds, "text", "doc_id")


SQL_LINE_STATS = """
SELECT doc_id AS id,
       len(string_split(coalesce(text, ''), chr(10))) AS n_lines,
       len(list_distinct(string_split(coalesce(text, ''), chr(10)))) AS n_unique_lines,
       len(list_filter(string_split(coalesce(text, ''), chr(10)),
                       x -> trim(x) = '')) AS n_blank_lines
FROM documents
"""


def q_embedding_quantized_topk(sf_dir: str):
    """int8-quantized cosine top-k (storage/transport rung: 4× less shuffle
    and object-store traffic than float32). Rows-only — the quantization
    boundary is float32-rounding-dependent, so the gate is the pytest
    recall@k bound vs exact brute force, not a SQL hash."""
    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    qtab = (
        read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
        .filter(expr="vec_id < 10")
        .to_pandas()
    )
    qmat = np.stack(qtab.embedding.to_numpy())
    quant = ann_stages.quantize_embeddings(emb, "vec_id", "embedding")
    out = ann_stages.quantized_topk(quant, qtab.vec_id.to_numpy(), qmat, k=5)
    return out.select_columns(["query_id", "neighbor_id", "rank"])


def q_cross_neardup_docs(sf_dir: str):
    """EXACT cross-corpus near-dup pairs: 'benchmark' = doc_id % 7 == 0
    slice, 'corpus' = the rest; only cross-side pairs emitted (the
    within-side quadratic term never exists). Doc-level complement of
    decontam_docs; DuckDB intersect-join oracle."""
    from ..stages.dedup import cross_neardup

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def side(pred):
        def fn(t: pa.Table) -> pa.Table:
            ids = np.asarray(t.column("doc_id").combine_chunks(), dtype=np.int64)
            return t.filter(pa.array(pred(ids)))

        return fn

    corpus = docs.map_batches(side(lambda i: i % 7 != 0), batch_format="pyarrow",
                              zero_copy_batch=True)
    bench = docs.map_batches(side(lambda i: i % 7 == 0), batch_format="pyarrow",
                             zero_copy_batch=True)
    return cross_neardup(corpus, bench, "text", "doc_id", shingle_k=3, threshold=0.5)


SQL_CROSS_NEARDUP = r"""
WITH sh AS (
  SELECT doc_id, list_distinct(
           list_transform(
             range(1, len(regexp_extract_all(lower(text), '\w+')) - 1),
             i -> regexp_extract_all(lower(text), '\w+')[i] || ' ' ||
                  regexp_extract_all(lower(text), '\w+')[i+1] || ' ' ||
                  regexp_extract_all(lower(text), '\w+')[i+2]
           )) AS s
  FROM documents
), pairs AS (
  SELECT a.doc_id AS id1, b.doc_id AS id2,
         len(list_intersect(a.s, b.s)) AS c, len(a.s) AS n1, len(b.s) AS n2
  FROM sh a JOIN sh b ON a.doc_id % 7 <> 0 AND b.doc_id % 7 = 0
)
SELECT id1, id2, CAST(c AS DOUBLE) / CAST(n1 + n2 - c AS DOUBLE) AS jaccard
FROM pairs
WHERE c > 0 AND CAST(c AS DOUBLE) / CAST(n1 + n2 - c AS DOUBLE) >= 0.5
"""


def q_winnow_neardup_docs(sf_dir: str):
    """Shared winnowed-fingerprint near-dup pairs (MOSS scheme) over the
    documents table — containment-scored, robust to length-asymmetric
    copies. Rows-only; pytest gates the tail against local set algebra."""
    from ..stages.dedup import winnow_neardup

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return winnow_neardup(docs, "text", "doc_id", window=8, threshold=0.3)


SQL_DECONTAM = r"""
WITH tok AS (SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS ts FROM documents),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(ts) - 1),
                       i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS s
  FROM tok),
bench AS (SELECT list_distinct(flatten(list(s))) AS bs FROM sh WHERE doc_id % 97 = 0)
SELECT doc_id AS id, CAST(len(s) AS BIGINT) AS n_shingles,
       CAST(len(list_intersect(s, b.bs)) AS BIGINT) AS n_contaminated
FROM sh CROSS JOIN bench b
"""


def q_curate_docs(sf_dir: str):
    """Fused curation funnel: quality + decontamination + exact-dup survivor
    in ONE content pass → per-doc keep/drop audit relation. The benchmark is
    the deterministic doc_id % 97 == 0 slice (as in decontam_docs)."""
    import ray as _ray

    from ..stages.curate import curate_docs

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def bench_mask(t: pa.Table) -> pa.Table:
        ids = np.asarray(t.column("doc_id").combine_chunks(), dtype=np.int64)
        return t.filter(pa.array(ids % 97 == 0))

    bench_docs = docs.map_batches(bench_mask, batch_format="pyarrow", zero_copy_batch=True)
    bench = decontam_stages.collect_benchmark_shingles(bench_docs, "text", shingle_k=3)
    return curate_docs(
        docs, "text", "doc_id", _ray.put(bench), quality_threshold_u=400_000, shingle_k=3
    )


def _sql_curate_docs() -> str:
    from ..stages.textstats import _LANG_PROFILES

    en = ", ".join(f"'{w}'" for w in sorted(_LANG_PROFILES["en"]))
    return rf"""
WITH tokd AS (
  SELECT doc_id,
         CAST(length(text) AS DOUBLE) AS n_chars_f,
         CAST(len(regexp_extract_all(text, '[^\w\s]')) AS DOUBLE) AS punct,
         regexp_extract_all(lower(text), '\w+') AS toks
  FROM documents
), q AS (
  SELECT doc_id,
         CAST(floor(
           (least(greatest(n_chars_f / 200.0, 0.0), 1.0) * 0.25
            + least(greatest(1.0 - 4.0 * (punct / greatest(n_chars_f, 1.0)), 0.0), 1.0) * 0.25
            + least(greatest(1.0 - abs(
                CAST(coalesce(list_sum(list_transform(toks, t -> length(t))), 0) AS DOUBLE)
                  / greatest(CAST(len(toks) AS DOUBLE), 1.0) - 5.0) / 5.0, 0.0), 1.0) * 0.25
            + least(greatest(CAST(len(list_filter(toks, t -> t IN ({en}))) AS DOUBLE)
                  / greatest(CAST(len(toks) AS DOUBLE), 1.0) * 4.0, 0.0), 1.0) * 0.25
           ) * 1000000 + 0.5) AS BIGINT) AS quality_u
  FROM tokd
), sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(toks) - 1),
                       i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS s
  FROM tokd
), bench AS (
  SELECT list_distinct(flatten(list(s))) AS bs FROM sh WHERE doc_id % 97 = 0
), contam AS (
  SELECT doc_id, CAST(len(list_intersect(s, b.bs)) AS BIGINT) AS n_contaminated
  FROM sh CROSS JOIN bench b
), surv AS (
  SELECT min(doc_id) AS sid FROM documents GROUP BY text
)
SELECT d.doc_id, q.quality_u, c.n_contaminated,
       CAST(CASE WHEN s.sid IS NULL THEN 0 ELSE 1 END AS BIGINT) AS is_survivor,
       CAST(CASE WHEN s.sid IS NOT NULL AND c.n_contaminated = 0
                  AND q.quality_u >= 400000 THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM documents d
JOIN q USING (doc_id)
JOIN contam c ON c.doc_id = d.doc_id
LEFT JOIN surv s ON s.sid = d.doc_id
"""


def q_event_props(sf_dir: str):
    """JSON field extraction from the events props column (the reference's
    stringly-typed nested-dict model as a column op), then a grouped sum —
    parse once, aggregate on the typed value."""
    from ..stages.normalize import json_extract
    from ray.data.aggregate import Count, Sum

    ev = read_table(sf_dir, "events", columns=["event_id", "event_type", "props"])
    typed = json_extract(ev, "props", {"k": ("k", "int64")})
    agg = typed.groupby("event_type").aggregate(Sum("k"), Count())
    return agg.rename_columns({"sum(k)": "sum_k", "count()": "n_events"})


SQL_EVENT_PROPS = """
SELECT event_type,
       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       count(*) AS n_events
FROM events GROUP BY event_type
"""


def q_approx_distinct_users(sf_dir: str):
    """HLL approximate COUNT(DISTINCT) per group — rows-only (approximate
    by construction; the pytest oracle bounds relative error vs exact)."""
    ev = read_table(sf_dir, "events", columns=["user_id", "event_type"])
    return relational.approx_distinct(ev, key_col="user_id", group_col="event_type")


def q_ngram_jaccard_exact(sf_dir: str):
    """EXACT shingle-set Jaccard pairs ≥ 0.5 (SURVEY §2.3 ST2 CellJacc
    analog) — candidates from shared-shingle buckets are exhaustive for any
    positive threshold, so DuckDB's brute-force cross join is a true oracle.
    """
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return dedup_stages.ngram_jaccard_exact(
        ds, text_column="text", id_column="doc_id", shingle_k=3, threshold=0.5
    )


SQL_NGRAM_JACCARD_EXACT = r"""
WITH sh AS (
  SELECT doc_id, list_distinct(
           list_transform(
             range(1, len(regexp_extract_all(lower(text), '\w+')) - 1),
             i -> regexp_extract_all(lower(text), '\w+')[i] || ' ' ||
                  regexp_extract_all(lower(text), '\w+')[i+1] || ' ' ||
                  regexp_extract_all(lower(text), '\w+')[i+2]
           )) AS s
  FROM documents
), pairs AS (
  SELECT a.doc_id AS id1, b.doc_id AS id2,
         len(list_intersect(a.s, b.s)) AS c, len(a.s) AS n1, len(b.s) AS n2
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
)
SELECT id1, id2, CAST(c AS DOUBLE) / CAST(n1 + n2 - c AS DOUBLE) AS jaccard
FROM pairs
WHERE c > 0 AND CAST(c AS DOUBLE) / CAST(n1 + n2 - c AS DOUBLE) >= 0.5
"""


def q_text_neardup_clusters(sf_dir: str):
    """Transitive near-dup clusters over exact n-gram-Jaccard edges ≥ 0.5 —
    blocking + scoring + distributed CC + singleton attach, all verified by
    one recursive-CTE oracle (the text twin of embedding_neardup)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return dedup_stages.text_neardup_clusters(
        ds, text_column="text", id_column="doc_id", shingle_k=3, threshold=0.5
    )


SQL_TEXT_NEARDUP_CLUSTERS = r"""
WITH RECURSIVE sh AS (
  SELECT doc_id, list_distinct(
           list_transform(
             range(1, len(regexp_extract_all(lower(text), '\w+')) - 1),
             i -> regexp_extract_all(lower(text), '\w+')[i] || ' ' ||
                  regexp_extract_all(lower(text), '\w+')[i+1] || ' ' ||
                  regexp_extract_all(lower(text), '\w+')[i+2]
           )) AS s
  FROM documents
), pairs AS (
  SELECT a.doc_id AS id1, b.doc_id AS id2,
         len(list_intersect(a.s, b.s)) AS c, len(a.s) AS n1, len(b.s) AS n2
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
), edges AS (
  SELECT id1 AS u, id2 AS v FROM pairs
  WHERE c > 0 AND CAST(c AS DOUBLE) / CAST(n1 + n2 - c AS DOUBLE) >= 0.5
  UNION ALL
  SELECT id2, id1 FROM pairs
  WHERE c > 0 AND CAST(c AS DOUBLE) / CAST(n1 + n2 - c AS DOUBLE) >= 0.5
), walk(id, lbl) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.v, w.lbl FROM walk w JOIN edges e ON e.u = w.id
)
SELECT CAST(id AS BIGINT) AS file_id, CAST(min(lbl) AS BIGINT) AS cluster_id
FROM walk GROUP BY id
"""


def q_cluster_reps(sf_dir: str):
    """Merit-based survivor per near-dup cluster: highest quality_u member
    (ties by doc_id) of each text_neardup cluster — clustering, the quality
    signal, the hash join and the per-group top-1 all in one oracled query."""
    from ..stages.dedup import cluster_representatives

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    labels = dedup_stages.text_neardup_clusters(
        docs, text_column="text", id_column="doc_id", shingle_k=3, threshold=0.5
    )
    quality = textstats.quality_scores(
        docs, text_column="text", id_column="doc_id", units=True
    ).select_columns(["id", "quality_u"])
    return cluster_representatives(labels, quality)


def _sql_cluster_reps() -> str:
    from ..stages.textstats import _LANG_PROFILES

    en = ", ".join(f"'{w}'" for w in sorted(_LANG_PROFILES["en"]))
    return rf"""
WITH RECURSIVE tokd AS (
  SELECT doc_id,
         CAST(length(text) AS DOUBLE) AS n_chars_f,
         CAST(len(regexp_extract_all(text, '[^\w\s]')) AS DOUBLE) AS punct,
         regexp_extract_all(lower(text), '\w+') AS toks
  FROM documents
), q AS (
  SELECT doc_id,
         CAST(floor(
           (least(greatest(n_chars_f / 200.0, 0.0), 1.0) * 0.25
            + least(greatest(1.0 - 4.0 * (punct / greatest(n_chars_f, 1.0)), 0.0), 1.0) * 0.25
            + least(greatest(1.0 - abs(
                CAST(coalesce(list_sum(list_transform(toks, t -> length(t))), 0) AS DOUBLE)
                  / greatest(CAST(len(toks) AS DOUBLE), 1.0) - 5.0) / 5.0, 0.0), 1.0) * 0.25
            + least(greatest(CAST(len(list_filter(toks, t -> t IN ({en}))) AS DOUBLE)
                  / greatest(CAST(len(toks) AS DOUBLE), 1.0) * 4.0, 0.0), 1.0) * 0.25
           ) * 1000000 + 0.5) AS BIGINT) AS quality_u
  FROM tokd
), sh AS (
  SELECT doc_id, list_distinct(
           list_transform(range(1, len(toks) - 1),
             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS s
  FROM tokd
), prs AS (
  SELECT a.doc_id AS id1, b.doc_id AS id2,
         len(list_intersect(a.s, b.s)) AS c, len(a.s) AS n1, len(b.s) AS n2
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
), edges AS (
  SELECT id1 AS u, id2 AS v FROM prs
  WHERE c > 0 AND CAST(c AS DOUBLE) / CAST(n1 + n2 - c AS DOUBLE) >= 0.5
  UNION ALL
  SELECT id2, id1 FROM prs
  WHERE c > 0 AND CAST(c AS DOUBLE) / CAST(n1 + n2 - c AS DOUBLE) >= 0.5
), walk(id, lbl) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.v, w.lbl FROM walk w JOIN edges e ON e.u = w.id
), labels AS (
  SELECT CAST(id AS BIGINT) AS file_id, CAST(min(lbl) AS BIGINT) AS cluster_id
  FROM walk GROUP BY id
)
SELECT cluster_id, rep_id, quality_u FROM (
  SELECT l.cluster_id, l.file_id AS rep_id, q.quality_u,
         row_number() OVER (
           PARTITION BY l.cluster_id ORDER BY q.quality_u DESC, l.file_id ASC
         ) AS rn
  FROM labels l JOIN q ON q.doc_id = l.file_id
) WHERE rn = 1
"""


def q_embedding_lsh_pairs(sf_dir: str):
    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    import pyarrow.parquet as pq

    dim = len(
        pq.read_table(
            os.path.join(sf_dir, "embeddings.parquet"), columns=["embedding"]
        )
        .column("embedding")[0]
        .as_py()
    )
    # the synthetic embeddings have no tight clusters (max pairwise cosine
    # ≈0.5), so the demo threshold sits where pairs actually exist
    return ann_stages.lsh_bucket_neighbors(emb, dim=dim, bits=4, threshold=0.35)


def q_semdedup_docs(sf_dir: str):
    """SemDeDup-style semantic dedup: seeded k-means cells over the
    embeddings table, exact cosine + min-label components WITHIN each cell,
    min-id survivor (rows-only: cell assignment is k-means output; pytest
    asserts n_cells=1 equals the SQL-oracled ``embedding_neardup``)."""
    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return dedup_stages.semantic_dedup(
        emb, id_column="vec_id", emb_column="embedding",
        threshold=0.4205, n_cells=4,
    )


def q_embedding_neardup(sf_dir: str):
    """Embedding-cosine near-dup clusters (exact all-pairs rung of the vector
    dedup ladder, SURVEY §2.7 D3 analog for vectors). SQL-oracled end to end:
    DuckDB reproduces the transitive closure itself with a recursive-CTE
    min-label walk, so the CC tail — not just the pair stage — is
    hash-verified. Threshold 0.4205 sits mid-gap between the nearest actual
    cosines in the synthetic corpus (0.41826 / 0.42270), so float32-vs-DuckDB
    rounding (~1e-6) cannot flip an edge."""
    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return dedup_stages.embedding_neardup(
        emb, id_column="vec_id", emb_column="embedding", threshold=0.4205
    )


SQL_EMBEDDING_NEARDUP = """
WITH RECURSIVE edges AS (
  SELECT a.vec_id AS u, b.vec_id AS v
  FROM embeddings a, embeddings b
  WHERE a.vec_id <> b.vec_id
    AND list_cosine_similarity(a.embedding, b.embedding) >= 0.4205
),
walk(id, lbl) AS (
  SELECT vec_id, vec_id FROM embeddings
  UNION
  SELECT e.v, w.lbl FROM walk w JOIN edges e ON e.u = w.id
)
SELECT CAST(id AS BIGINT) AS file_id, CAST(min(lbl) AS BIGINT) AS cluster_id
FROM walk GROUP BY id
"""


def q_media_features(sf_dir: str):
    """Byte-level media feature extraction, SQL-oracled (VERDICT r4 item 3).

    Media payloads are built distributedly from the documents table — a
    real container magic number (PNG/WAV/MP4 cycling on doc_id) prepended
    to the document's utf-8 bytes — so every projected feature (size,
    printable-byte ratio, magic-number format sniff, kind agreement) is
    recomputable in SQL from the same view. The entropy/histogram outputs
    and the synthetic-payload path stay pytest-gated (`synthesize_media`).
    Printable bytes of utf-8 text are exactly its ASCII chars in
    ``[ -~]`` (all bytes of multi-byte sequences are ≥ 0x80), which is what
    the oracle counts."""
    from ..stages.multimodal import _SYNTH_MAGIC

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    kinds_cycle = np.array(["image", "audio", "video"], dtype=object)

    def to_media(t: pa.Table) -> pa.Table:
        idn = t.column("doc_id").to_numpy(zero_copy_only=False)
        kinds = kinds_cycle[idn % 3]
        magic = pa.array(
            [_SYNTH_MAGIC[k] for k in kinds], type=pa.large_binary()
        )
        text_b = pc.cast(t.column("text"), pa.large_binary())
        payload = pc.binary_join_element_wise(
            magic, text_b, pa.scalar(b"", type=pa.large_binary())
        )
        return pa.table(
            {
                "media_id": t.column("doc_id"),
                "kind": pa.array(kinds, type=pa.string()),
                "payload": payload,
            }
        )

    media = docs.map_batches(to_media, batch_format="pyarrow", zero_copy_batch=True)
    feats = extract_media_features(media, batch_size=256)
    return feats.select_columns(
        [
            "media_id",
            "kind",
            "size_bytes",
            "printable_ratio",
            "detected_format",
            "kind_matches",
            "decoded",
        ]
    )


SQL_MEDIA_FEATURES = """
SELECT doc_id AS media_id,
       CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
       CAST(octet_length(encode(text)) + CASE WHEN doc_id % 3 = 0 THEN 8 ELSE 12 END AS BIGINT) AS size_bytes,
       (length(regexp_replace(text, '[^ -~]', '', 'g'))
        + CASE WHEN doc_id % 3 = 0 THEN 3 ELSE 8 END)
       / CAST(octet_length(encode(text)) + CASE WHEN doc_id % 3 = 0 THEN 8 ELSE 12 END AS DOUBLE)
         AS printable_ratio,
       CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'riff-wav' ELSE 'mp4' END AS detected_format,
       TRUE AS kind_matches,
       TRUE AS decoded
FROM documents
"""


def q_cluster_manifest_docs(sf_dir: str):
    """Per-cluster manifest over text near-dup clusters of ``documents``:
    size, merit rep (quality_u), ascending member sample, quality range,
    distinct-source provenance count — the reference merge-step audit
    artifact (cluster.py:532-649) as one grouped exchange. Rows-only
    (list-typed member sample); the underlying clustering and quality
    signals are oracled elsewhere (``cluster_reps``, ``doc_quality``)."""
    from ..stages.components import cluster_manifest

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text", "source"])
    labels = dedup_stages.text_neardup_clusters(
        docs, text_column="text", id_column="doc_id", shingle_k=3, threshold=0.5
    )
    with_src = labels.join(  # labels are (file_id, cluster_id)
        docs.select_columns(["doc_id", "source"]),
        join_type="inner",
        num_partitions=default_join_partitions(),
        aggregator_ray_remote_args=join_remote_args(default_join_partitions()),
        on=("file_id",),
        right_on=("doc_id",),
    )
    quality = textstats.quality_scores(
        docs, text_column="text", id_column="doc_id", units=True
    ).select_columns(["id", "quality_u"])
    return cluster_manifest(
        with_src,
        signals=quality,
        label_column="cluster_id",
        id_column="file_id",
        source_column="source",
        sample_size=8,
    )


def q_cluster_size_report(sf_dir: str):
    """Cluster-size audit over the MinHash near-dup labeling of documents —
    the operator that drives the reference's ``max_cluster_size`` re-chunk
    decision (``takco/__init__.py:385-397``). Rows-only: single summary row
    (histogram + top clusters), gated by the dedup pytest oracles."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    labels = dedup_stages.minhash_dedup_labels(
        docs, text_column="text", id_column="doc_id"
    )
    return dedup_stages.cluster_size_report(labels)


def q_block_size_stats(sf_dir: str):
    """LSH band-block size distribution over the documents table — the skew
    detector feeding the hot-threshold/salting choice (SURVEY §2.5 A9).
    Rows-only: single summary row."""
    from ..stages import blocking as blocking_stages
    from ..stages.dedup import _signature_ds

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    sig_ds = _signature_ds(
        docs, "text", "doc_id", num_perm=128, num_bands=16, shingle_k=5, seed=41
    )
    stats = blocking_stages.block_size_stats(sig_ds)
    return ray.data.from_arrow(
        pa.table(
            {
                "n_blocks": pa.array([stats["n_blocks"]], type=pa.int64()),
                "n_rows": pa.array([stats["n_rows"]], type=pa.int64()),
                "mean_u": pa.array([int(round(stats["mean"] * 100))], type=pa.int64()),
                "max": pa.array([stats["max"]], type=pa.int64()),
                "log2_histogram": pa.array([stats["log2_histogram"]]),
            }
        )
    )


def _corpus_scale_for(sf_dir: str) -> str:
    name = os.path.basename(os.path.normpath(sf_dir))
    return {"sf0.001": "test", "sf0.01": "small", "sf0.1": "bench"}.get(name, "test")


def q_er_clusters(sf_dir: str):
    """Flagship ER pipeline on the deterministic synthetic code corpus sized
    to match the sf scale (BASELINE.json north star; rows-only check —
    correctness is gated by the F1/invariant pytest suite instead)."""
    from ..corpus import CorpusConfig, generate_corpus, SCALES
    from .er import er_pipeline

    scale = _corpus_scale_for(sf_dir)
    out_dir = f"/tmp/takco_fixtures/{scale}"
    generate_corpus(out_dir, CorpusConfig(n_files=SCALES[scale]))
    result = er_pipeline(os.path.join(out_dir, "files"))
    return result["labels"]


def q_incremental_er_labels(sf_dir: str):
    """Continuous-ingest ER: flagship run over the fixture corpus, then a
    deterministic second batch (different seed, ~10 % of base size) attached
    with ``incremental_er`` — base corpus never re-clustered (rows-only;
    attach / new-cluster / singleton semantics are gated by the pytest
    oracle in ``tests/test_er.py``)."""
    from ..corpus import CorpusConfig, generate_corpus, SCALES
    from .er import er_pipeline, incremental_er

    scale = _corpus_scale_for(sf_dir)
    base_dir = f"/tmp/takco_fixtures/{scale}"
    generate_corpus(base_dir, CorpusConfig(n_files=SCALES[scale]))
    inc_dir = f"/tmp/takco_fixtures/{scale}_inc"
    generate_corpus(
        inc_dir,
        CorpusConfig(n_files=max(200, SCALES[scale] // 10), seed=1043),
    )
    base = er_pipeline(os.path.join(base_dir, "files"))
    out = incremental_er(
        os.path.join(inc_dir, "files"), base["labels"], base["signatures"]
    )
    return out["labels"]



def q_incremental_er_merges(sf_dir: str):
    """The continuous-ingest MERGE AUDIT surface: components of the new
    batch that bridge ≥2 base clusters (the incremental view cannot merge
    base clusters in place, so the implied merge is emitted as data for a
    later full re-cluster to consume). A deterministic bridge corpus is
    constructed — two disjoint base clusters plus one new file similar to
    both — so the audit rows are stable: 2 rows, both merged into the
    min base cluster id. Rows-only (LSH-banding dependent); semantics
    pytest-gated in tests/test_er.py::test_incremental_er_merge_audit."""
    import pyarrow.parquet as pq

    from .er import ERConfig, er_pipeline, incremental_er

    def toks(p, lo, hi):
        return " ".join(f"{p}{j}" for j in range(lo, hi))

    # fixed path, overwritten each run — mkdtemp would leak a directory per
    # invocation (bench runs this twice per session, the driver every round)
    root = "/tmp/takco_fixtures/merge_audit"

    def write(dirname, rows):
        d = os.path.join(root, dirname)
        os.makedirs(d, exist_ok=True)
        pq.write_table(
            pa.table(
                {
                    "repo": [f"r/{k}" for k in rows],
                    "path": [f"{k}.py" for k in rows],
                    "commit": ["c"] * len(rows),
                    "lang": ["py"] * len(rows),
                    "content": pa.array(list(rows.values()), type=pa.large_string()),
                }
            ),
            os.path.join(d, "shard_00000.parquet"),
        )
        return d

    base_dir = write(
        "base",
        {
            "x0": toks("x", 0, 150), "x1": toks("x", 0, 150) + " xtail",
            "y0": toks("y", 0, 150), "y1": toks("y", 0, 150) + " ytail",
        },
    )
    new_dir = write("new", {"z": toks("x", 0, 150) + " " + toks("y", 0, 150)})
    cfg = ERConfig(threshold=0.42, num_bands=32)
    base = er_pipeline(base_dir, cfg)
    out = incremental_er(new_dir, base["labels"], base["signatures"], cfg)
    return out["merges"]


def q_redact_pii_docs(sf_dir: str):
    """PII redaction (email / IPv4 / hex-secret → sentinel) with per-pattern
    hit counts. The synthetic documents carry no PII, so each text is first
    enriched with deterministic doc_id-derived PII in BOTH engines — the
    redaction then has real matches to find, and the redacted text itself is
    hash-compared (both engines run RE2, so pattern semantics agree by
    construction)."""
    from ..stages.redact import redact_pii

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def enrich(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").cast(pa.int64())
        ids_np = np.asarray(ids.combine_chunks(), dtype=np.int64)
        octet = pc.cast(pa.array(ids_np % 256, type=pa.int64()), pa.string())
        idstr = pc.cast(ids, pa.string())
        suffix = pc.binary_join_element_wise(
            pa.array([" contact user"] * len(t), type=pa.string()),
            idstr,
            pa.array(["@example.com from 10.0."] * len(t), type=pa.string()),
            octet,
            pa.array([".7"] * len(t), type=pa.string()),
            "",
        )
        return pa.table(
            {
                "doc_id": ids,
                "text": pc.binary_join_element_wise(t.column("text"), suffix, ""),
            }
        )

    enriched = ds.map_batches(enrich, batch_format="pyarrow", zero_copy_batch=True)
    return redact_pii(enriched, text_column="text", id_column="doc_id")


SQL_REDACT_PII = r"""
WITH enriched AS (
  SELECT doc_id,
         text || ' contact user' || doc_id || '@example.com from 10.0.'
              || (doc_id % 256) || '.7' AS t0
  FROM documents
), s1 AS (
  SELECT doc_id,
         regexp_replace(t0, '[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1,
         len(regexp_extract_all(t0, '[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}')) AS n_email
  FROM enriched
), s2 AS (
  SELECT doc_id, regexp_replace(t1, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS t2,
         n_email,
         len(regexp_extract_all(t1, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ipv4
  FROM s1
)
SELECT doc_id,
       regexp_replace(t2, '\b[0-9a-fA-F]{32,}\b', '<HEX>', 'g') AS text_redacted,
       n_email, n_ipv4,
       len(regexp_extract_all(t2, '\b[0-9a-fA-F]{32,}\b')) AS n_hexkey
FROM s2
"""


def q_source_neardup(sf_dir: str):
    """Repo-level (source-level) near-dup: exact shingle-set Jaccard between
    sources — The Stack's repository-dedup signal as a first-class operator.
    Integer-only output (common/size counts + integer-cross-multiplied
    threshold), so the hash comparison is exact."""
    ds = read_table(sf_dir, "documents", columns=["source", "text"])
    return dedup_stages.group_set_jaccard(
        ds, group_column="source", text_column="text",
        shingle_k=3, threshold_millis=20,
    )


SQL_SOURCE_NEARDUP = r"""
WITH tok AS (
  SELECT source, regexp_extract_all(lower(text), '\w+') AS ts FROM documents
), sh AS (
  SELECT DISTINCT source,
         unnest(list_transform(range(1, len(ts) - 1),
                i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS s
  FROM tok
), sz AS (
  SELECT source, count(*) AS n FROM sh GROUP BY source
), common AS (
  SELECT a.source AS group_a, b.source AS group_b, count(*) AS n_common
  FROM sh a JOIN sh b ON a.s = b.s AND a.source < b.source
  GROUP BY 1, 2
)
SELECT group_a, group_b, n_common, sa.n AS n_a, sb.n AS n_b
FROM common
JOIN sz sa ON common.group_a = sa.source
JOIN sz sb ON common.group_b = sb.source
WHERE n_common * 1000 >= 20 * (sa.n + sb.n - n_common)
"""


def q_event_deltas(sf_dir: str):
    """Per-user inter-event gaps — SQL LAG window as one hash shuffle +
    vectorized per-partition diff (SURVEY §2.9 temporal tier)."""
    ev = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    return temporal_stages.lag_deltas(
        ev, key_column="user_id", ts_column="ts", id_column="event_id"
    )


SQL_EVENT_DELTAS = """
SELECT event_id, delta_us FROM (
  SELECT event_id,
         epoch_us(ts) - LAG(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS delta_us
  FROM events
) WHERE delta_us IS NOT NULL
"""


def q_stratified_orders(sf_dir: str):
    """Deterministic stratified sample: 20 orders per priority class by the
    mixed-hash rank — cross-engine-reproducible downsampling (the per-group
    analog of ``doc_sample``)."""
    ds = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_orderpriority", "o_totalprice"]
    )
    out = relational.stratified_sample(ds, "o_orderpriority", "o_orderkey", n=20)
    return out.select_columns(["o_orderkey", "o_orderpriority", "rank"])


SQL_STRATIFIED_ORDERS = """
SELECT o_orderkey, o_orderpriority, rank FROM (
  SELECT o_orderkey, o_orderpriority,
         row_number() OVER (
           PARTITION BY o_orderpriority
           ORDER BY (o_orderkey * 2654435761) % 4294967296 ASC, o_orderkey ASC
         ) AS rank
  FROM orders
) WHERE rank <= 20
"""


def q_pack_docs(sf_dir: str):
    """Sequence packing: documents (ordered by doc_id) concatenated into
    512-token training sequences — the plan rows (doc_id, seq_id, global
    token interval). Distributed prefix scan; SQL window-cumsum oracle."""
    from ..stages.pack import pack_sequences

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return pack_sequences(ds, "doc_id", "text", seq_len=512)


SQL_PACK_DOCS = r"""
WITH tc AS (
  SELECT doc_id, len(regexp_extract_all(text, '\w+')) AS n FROM documents
), cum AS (
  SELECT doc_id, n,
         CAST(coalesce(sum(n) OVER (
           ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS BIGINT) AS prev
  FROM tc WHERE n > 0
), spans AS (
  SELECT doc_id, n, prev,
         unnest(range(prev // 512, (prev + n - 1) // 512 + 1)) AS seq_id
  FROM cum
)
SELECT doc_id, seq_id,
       greatest(prev, seq_id * 512) AS tok_begin,
       least(prev + n, (seq_id + 1) * 512) AS tok_end
FROM spans
"""


def q_chunk_docs(sf_dir: str):
    """Overlapping character-window chunking (embedding-pipeline pre-step):
    400-char windows every 320 chars (80 overlap); the last window is the
    first one reaching the doc end. Codepoint semantics == SQL substr."""
    from ..stages.pack import chunk_docs

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return chunk_docs(ds, "text", "doc_id", size=400, overlap=80)


SQL_CHUNK_DOCS = """
WITH n AS (
  SELECT doc_id, text,
         CASE WHEN length(text) <= 400 THEN 0
              ELSE CAST(ceil((length(text) - 400) / 320.0) AS BIGINT) END AS max_k
  FROM documents WHERE length(text) > 0
)
SELECT doc_id AS id, u.k AS chunk_idx,
       substr(text, u.k * 320 + 1, 400) AS chunk
FROM n, UNNEST(range(0, max_k + 1)) AS u(k)
"""


def feistel_sql_cte(table: str, id_col: str, rounds: int = 4, seed: int = 0) -> str:
    """SQL twin of :func:`takco_ray.functions.hashing.feistel_permute`:
    chained CTEs (one per round, distinct half names — DuckDB's lateral
    column aliases would otherwise shadow the source halves) with the SAME
    round constants inlined as literals. All operands are 31-bit so BIGINT
    products never overflow; ``xor`` is DuckDB's scalar bitwise xor."""
    from ..functions.hashing import FEISTEL_MASK, feistel_round_constants

    m = FEISTEL_MASK + 1  # 2^31
    parts = [
        f"f0 AS (SELECT {id_col} AS id, {id_col} // {m} AS l0, "
        f"{id_col} % {m} AS r0 FROM {table})"
    ]
    for i, (mult, add) in enumerate(feistel_round_constants(rounds, seed)):
        parts.append(
            f"f{i + 1} AS (SELECT id, r{i} AS l{i + 1}, "
            f"xor(l{i}, xor((r{i} * {mult} + {add}) % {m}, "
            f"(r{i} * {mult} + {add}) // {m})) AS r{i + 1} FROM f{i})"
        )
    final = (
        f"fk AS (SELECT id, l{rounds} * {m} + r{rounds} AS shuffle_key FROM f{rounds})"
    )
    return "WITH " + ",\n".join(parts + [final])


def q_shuffle_docs(sf_dir: str):
    """Deterministic epoch shuffle: bijective Feistel key + shard per doc.
    Pure projection (no payload movement); key order IS the shuffled epoch
    order, shard is the uniform reader partition."""
    ds = read_table(sf_dir, "documents", columns=["doc_id"])
    return relational.epoch_shuffle(ds, "doc_id", num_shards=16, rounds=4, seed=3)


SQL_SHUFFLE_DOCS = (
    feistel_sql_cte("documents", "doc_id", rounds=4, seed=3)
    + "\nSELECT id AS doc_id, shuffle_key, shuffle_key % 16 AS shard FROM fk"
)


def q_source_neardup_minhash(sf_dir: str):
    """Repo-level near-dup, MinHash scale rung (rows-only: the estimate is
    LSH-probabilistic; pytest pins it against the exact rung)."""
    ds = read_table(sf_dir, "documents", columns=["source", "text"])
    return dedup_stages.group_minhash_neardup(
        ds, group_column="source", text_column="text",
        shingle_k=3, threshold_millis=20, num_perm=128, num_bands=64,
    )



def q_rollup_lineitem(sf_dir: str):
    """GROUP BY ROLLUP analog (A1/A8 family): finest level is the only
    cluster-wide aggregate; subtotals and the grand total derive from that
    small result. Rolled-up keys carry the 'ALL' sentinel in both engines."""
    ds = read_table(sf_dir, "lineitem",
                    columns=["l_returnflag", "l_linestatus", "l_quantity"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": t.column("l_returnflag"),
            "l_linestatus": t.column("l_linestatus"),
            "qty": t.column("l_quantity").cast(pa.int64()),
        })

    prepped = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    return relational.rollup_aggregate(
        prepped, ["l_returnflag", "l_linestatus"], "qty", sum_name="sum_qty"
    )


SQL_ROLLUP_LINEITEM = """
SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
       coalesce(l_linestatus, 'ALL') AS l_linestatus,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       count(*) AS n_rows
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
"""


def q_priority_mode_by_segment(sf_dir: str):
    """Per-group mode with deterministic tie-break (the reference's
    Counter.most_common(1) header vote, cluster.py:692-700): orders joined
    to customer segments, then grouped_mode."""
    orders = read_table(sf_dir, "orders", columns=["o_custkey", "o_orderpriority"])
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    joined = orders.join(
        cust,
        join_type="inner",
        num_partitions=default_join_partitions(),
        aggregator_ray_remote_args=join_remote_args(default_join_partitions()),
        on=("o_custkey",),
        right_on=("c_custkey",),
    )
    return relational.grouped_mode(joined, "c_mktsegment", "o_orderpriority")


SQL_PRIORITY_MODE = """
WITH j AS (
  SELECT c_mktsegment, o_orderpriority
  FROM orders JOIN customer ON o_custkey = c_custkey
), c AS (
  SELECT c_mktsegment, o_orderpriority, count(*) AS cnt
  FROM j GROUP BY c_mktsegment, o_orderpriority
), r AS (
  SELECT c_mktsegment, o_orderpriority, cnt,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY cnt DESC, o_orderpriority) AS rn
  FROM c
)
SELECT c_mktsegment, o_orderpriority AS mode, cnt AS mode_n
FROM r WHERE rn = 1
"""


def q_supplier_name_agg(sf_dir: str):
    """Per-group sorted string_agg (list-assembly aggregate): supplier
    names per nation, deterministically ordered inside each group."""
    sup = read_table(sf_dir, "supplier", columns=["s_nationkey", "s_name"])
    return relational.string_agg_per_group(sup, "s_nationkey", "s_name")


SQL_SUPPLIER_NAME_AGG = """
SELECT s_nationkey, count(*) AS n_values,
       string_agg(s_name, ',' ORDER BY s_name) AS agg
FROM supplier
GROUP BY s_nationkey
"""


def q_price_p90_cont(sf_dir: str):
    """Interpolated (quantile_cont) p90 of order totals in exact integer
    arithmetic — result scaled by the quantile denominator (cents x 10) so
    no float interpolation can round differently across engines. Only the
    distinct-value histogram shuffles."""
    orders = read_table(sf_dir, "orders", columns=["o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"cents": _int_units(t.column("o_totalprice"), 100)})

    prepped = orders.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    return relational.quantile_cont_scaled(prepped, "cents", 9, 10, "p90_cents_x10")


SQL_PRICE_P90_CONT = """
WITH v AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c FROM orders),
s AS (SELECT c, row_number() OVER (ORDER BY c) - 1 AS rn FROM v),
p AS (SELECT count(*) AS n,
             ((count(*) - 1) * 9) // 10 AS k,
             ((count(*) - 1) * 9) % 10 AS rem
      FROM v)
SELECT CAST((SELECT c FROM s WHERE rn = p.k) * (10 - p.rem)
          + (SELECT c FROM s WHERE rn = least(p.k + 1, p.n - 1)) * p.rem
       AS BIGINT) AS p90_cents_x10
FROM p
"""


def q_supplier_rank(sf_dir: str):
    """Global dense_rank as a distributed window op (no global row sort):
    distinct-value hash aggregate -> range-bucketed prefix scan (only
    num_buckets counts on the driver) -> per-bucket rank assign -> hash
    join back. Ranked by account balance, highest first."""
    sup = read_table(sf_dir, "supplier", columns=["s_suppkey", "s_acctbal"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "s_suppkey": t.column("s_suppkey"),
            "bal_c": _int_units(t.column("s_acctbal"), 100),
        })

    prepped = sup.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    ranked = relational.dense_rank(prepped, "bal_c", out_col="acct_rank",
                                   descending=True, num_buckets=64)
    return ranked.select_columns(["s_suppkey", "bal_c", "acct_rank"])


SQL_SUPPLIER_RANK = """
SELECT s_suppkey,
       CAST(round(s_acctbal * 100) AS BIGINT) AS bal_c,
       CAST(dense_rank() OVER (ORDER BY round(s_acctbal * 100) DESC) AS BIGINT)
         AS acct_rank
FROM supplier
"""


def q_quantity_discount_moments(sf_dir: str):
    """Exact one-pass co-moment aggregation (n, Sx, Sy, Sxx, Syy, Sxy as
    int64) over quantity x discount-pct — the distributed correlation /
    covariance building block; each block reduces to one 48-byte row."""
    ds = read_table(sf_dir, "lineitem", columns=["l_quantity", "l_discount"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "x": t.column("l_quantity").cast(pa.int64()),
            "y": _int_units(t.column("l_discount"), 100),
        })

    prepped = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    return relational.comoment_sums(prepped, "x", "y")


SQL_COMOMENTS = """
WITH v AS (
  SELECT CAST(l_quantity AS BIGINT) AS x,
         CAST(round(l_discount * 100) AS BIGINT) AS y
  FROM lineitem
)
SELECT count(*) AS n,
       CAST(sum(x) AS BIGINT) AS sum_x,
       CAST(sum(y) AS BIGINT) AS sum_y,
       CAST(sum(x * x) AS BIGINT) AS sum_xx,
       CAST(sum(y * y) AS BIGINT) AS sum_yy,
       CAST(sum(x * y) AS BIGINT) AS sum_xy
FROM v
"""



def q_dup_line_docs(sf_dir: str):
    """Line-level cross-corpus boilerplate signal (RefinedWeb-style): per
    doc, how many of its distinct non-blank lines appear in >= 2 documents.
    The synthetic docs are single-line word soups with zero literal line
    overlap, so (license_scan pattern) deterministic boilerplate footer
    lines are appended by doc_id in BOTH engines first — docs with
    doc_id%5==0 share footer A, doc_id%7==0 footer B, the rest only their
    (unique) body line."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def enrich(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").cast(pa.int64())
        ids_np = np.asarray(ids.combine_chunks(), dtype=np.int64)
        a = np.where(ids_np % 5 == 0, "\n# generated by build-bot v1", "")
        b = np.where(ids_np % 7 == 0, "\n-- footer: all rights reserved", "")
        suffix = pa.array(np.char.add(a, b), type=pa.string())
        return pa.table(
            {
                "doc_id": ids,
                "text": pc.binary_join_element_wise(t.column("text"), suffix, ""),
            }
        )

    enriched = ds.map_batches(enrich, batch_format="pyarrow", zero_copy_batch=True)
    return dedup_stages.cross_doc_dup_lines(enriched, "text", "doc_id", min_df=2)


SQL_DUP_LINES = r"""
WITH src AS (
  SELECT doc_id,
         coalesce(text, '')
           || CASE WHEN doc_id % 5 = 0 THEN chr(10) || '# generated by build-bot v1' ELSE '' END
           || CASE WHEN doc_id % 7 = 0 THEN chr(10) || '-- footer: all rights reserved' ELSE '' END
           AS text
  FROM documents
), l AS (
  SELECT doc_id, trim(line) AS line
  FROM (SELECT doc_id, unnest(string_split(text, chr(10))) AS line FROM src)
  WHERE trim(line) <> ''
), dl AS (SELECT DISTINCT doc_id, line FROM l),
df AS (SELECT line, count(*) AS df FROM dl GROUP BY line),
dup AS (
  SELECT dl.doc_id, count(*) AS n
  FROM dl JOIN df USING (line)
  WHERE df.df >= 2
  GROUP BY dl.doc_id
)
SELECT d.doc_id AS id, CAST(coalesce(dup.n, 0) AS BIGINT) AS n_dup_lines
FROM documents d LEFT JOIN dup ON d.doc_id = dup.doc_id
"""



def q_remove_dup_lines_docs(sf_dir: str):
    """Actionable line dedup: REWRITE documents with corpus-duplicated
    lines removed (RefinedWeb cleanup), order/blank-preserving. Enrichment
    (license_scan pattern) appends a shared build-bot footer (doc_id%5==0,
    removed), a shared legal footer (doc_id%7==0, removed) and a UNIQUE
    per-doc tag line (always kept) in BOTH engines, so the oracle verifies
    removal AND retention byte-exactly on reconstructed content."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def enrich(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").cast(pa.int64())
        ids_np = np.asarray(ids.combine_chunks(), dtype=np.int64)
        a = np.where(ids_np % 5 == 0, "\n# generated by build-bot v1", "")
        b = np.where(ids_np % 7 == 0, "\n-- footer: all rights reserved", "")
        c = np.array(["\n# doc-tag " + str(i) for i in ids_np], dtype=object)
        suffix = pa.array(np.char.add(np.char.add(a, b), c.astype(str)), type=pa.string())
        return pa.table(
            {
                "doc_id": ids,
                "text": pc.binary_join_element_wise(t.column("text"), suffix, ""),
            }
        )

    enriched = ds.map_batches(enrich, batch_format="pyarrow", zero_copy_batch=True)
    return dedup_stages.remove_dup_lines(enriched, "text", "doc_id", min_df=2)


SQL_REMOVE_DUP_LINES = r"""
WITH src AS (
  SELECT doc_id,
         coalesce(text, '')
           || CASE WHEN doc_id % 5 = 0 THEN chr(10) || '# generated by build-bot v1' ELSE '' END
           || CASE WHEN doc_id % 7 = 0 THEN chr(10) || '-- footer: all rights reserved' ELSE '' END
           || chr(10) || '# doc-tag ' || doc_id
           AS text
  FROM documents
), s2 AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM src),
l AS (SELECT doc_id, unnest(ls) AS line, generate_subscripts(ls, 1) AS idx FROM s2),
dl AS (SELECT DISTINCT trim(line) AS t, doc_id FROM l WHERE trim(line) <> ''),
df AS (SELECT t, count(*) AS c FROM dl GROUP BY t),
keep AS (
  SELECT l.doc_id, l.idx, l.line
  FROM l LEFT JOIN df ON trim(l.line) = df.t
  WHERE trim(l.line) = '' OR coalesce(df.c, 0) < 2
), agg AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY idx) AS text
  FROM keep GROUP BY doc_id
)
SELECT d.doc_id AS id, coalesce(a.text, '') AS text
FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
"""



def q_heavy_event_types(sf_dir: str):
    """Misra-Gries heavy hitters over the event stream. event_type has a
    handful of distinct values per batch, so the sketch runs in its EXACT
    regime (err_bound = 0) and the SQL oracle pins the whole machinery;
    the lossy regime's undercount bound is pytest-gated."""
    ds = read_table(sf_dir, "events", columns=["event_type"])
    return relational.heavy_hitters(ds, "event_type", k=8, num_sketch=64)


SQL_HEAVY_EVENT_TYPES = """
SELECT event_type AS value, count(*) AS est_count,
       CAST(0 AS BIGINT) AS err_bound
FROM events
GROUP BY event_type
"""



def q_urgent_low_counts(sf_dir: str):
    """FULL OUTER join (completes the join family J1-J7 + semi/anti/left):
    per-customer URGENT vs LOW order counts, customers appearing on either
    side only — keys coalesced, absent side 0. Both inputs are map-side
    count partials, so the exchange carries one row per (customer,
    priority-class)."""
    orders = read_table(sf_dir, "orders", columns=["o_custkey", "o_orderpriority"])

    def side(priority: str, key: str, out: str):
        def proj(t: pa.Table) -> pa.Table:
            mask = pc.equal(t.column("o_orderpriority"), pa.scalar(priority))
            filt = t.filter(mask)
            return pa.table(
                {
                    key: filt.column("o_custkey").cast(pa.int64()),
                    out: pa.array(np.ones(filt.num_rows, dtype=np.int64), type=pa.int64()),
                }
            )

        from ray.data.aggregate import Sum

        agg = (
            orders.map_batches(proj, batch_format="pyarrow", zero_copy_batch=True)
            .groupby(key)
            .aggregate(Sum(out))
        )
        return agg.rename_columns({f"sum({out})": out})

    left = side("1-URGENT", "ck_u", "n_urgent")
    right = side("5-LOW", "ck_l", "n_low")
    joined = left.join(
        right,
        join_type="full_outer",
        num_partitions=default_join_partitions(),
        aggregator_ray_remote_args=join_remote_args(default_join_partitions()),
        on=("ck_u",),
        right_on=("ck_l",),
    )

    def fin(t: pa.Table) -> pa.Table:
        # Ray's full_outer coalesces the right key into the left key column
        return pa.table(
            {
                "custkey": t.column("ck_u").cast(pa.int64()),
                "n_urgent": pc.fill_null(t.column("n_urgent"), 0).cast(pa.int64()),
                "n_low": pc.fill_null(t.column("n_low"), 0).cast(pa.int64()),
            }
        )

    return joined.map_batches(fin, batch_format="pyarrow", zero_copy_batch=True)


SQL_URGENT_LOW_COUNTS = """
WITH u AS (
  SELECT o_custkey AS ck, count(*) AS n_urgent FROM orders
  WHERE o_orderpriority = '1-URGENT' GROUP BY o_custkey
), l AS (
  SELECT o_custkey AS ck, count(*) AS n_low FROM orders
  WHERE o_orderpriority = '5-LOW' GROUP BY o_custkey
)
SELECT coalesce(u.ck, l.ck) AS custkey,
       CAST(coalesce(u.n_urgent, 0) AS BIGINT) AS n_urgent,
       CAST(coalesce(l.n_low, 0) AS BIGINT) AS n_low
FROM u FULL OUTER JOIN l ON u.ck = l.ck
"""



def q_order_price_ntile(sf_dir: str):
    """Distributed NTILE(4): global row_number via the range-bucketed
    prefix scan (only per-bucket counts on the driver), then the exact SQL
    tile-size formula — the second window function built on the prefix-scan
    shape (dense_rank is the first). Ties impossible (orderkey breaks
    them), so the result is engine-reproducible."""
    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": t.column("o_orderkey"),
            "cents": _int_units(t.column("o_totalprice"), 100),
        })

    prepped = orders.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    rn = relational.global_row_number(prepped, "cents", "o_orderkey", out_col="rn")
    # row count from the RAW read (parquet metadata), not the prepped
    # pipeline — counting prepped would re-execute the read + projection
    n = orders.count()

    def fin(t: pa.Table) -> pa.Table:
        r = np.asarray(t.column("rn").combine_chunks(), dtype=np.int64)
        return pa.table(
            {
                "o_orderkey": t.column("id").cast(pa.int64()),
                "tile": pa.array(relational.ntile_from_rn(r, n, 4), type=pa.int64()),
            }
        )

    return rn.map_batches(fin, batch_format="pyarrow", zero_copy_batch=True)


SQL_ORDER_PRICE_NTILE = """
SELECT o_orderkey,
       CAST(ntile(4) OVER (ORDER BY round(o_totalprice * 100), o_orderkey) AS BIGINT)
         AS tile
FROM orders
"""



def q_priority_skew_join(sf_dir: str):
    """Skew-aware join (the join-side twin of salted blocking): a 5-row
    priority dimension joined to orders on o_orderpriority — a key with
    ~n/5 rows per value, the vendored-boilerplate shape that would make one
    hash-join partition a straggler. Keys above hot_threshold take the
    broadcast path (at sf0.01 all five are hot), the rest the hash join;
    identical result either way, which is exactly what the oracle pins."""
    dim = ray.data.from_arrow(
        pa.table(
            {
                "o_orderpriority": pa.array(
                    ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
                    type=pa.string(),
                ),
                "prio_rank": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
            }
        )
    )
    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    # threshold scales with the input so the broadcast-collection guard
    # (hot rows ≤ threshold×64) holds at every sf; metadata-cheap count
    hot_threshold = max(1000, orders.count() // 20)
    return relational.skew_join(
        dim, orders, on="o_orderpriority", hot_threshold=hot_threshold
    )


SQL_PRIORITY_SKEW_JOIN = """
SELECT o_orderpriority,
       CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS prio_rank,
       o_orderkey
FROM orders
"""



def q_bloom_semi_lineitem(sf_dir: str):
    """Bloom-prefiltered EXACT semi-join: line items of expensive orders.
    The right side's keys build a distributed Bloom bitmap (partial
    bitmaps, one OR merge) broadcast to a map-side probe that drops
    definite non-matches before the exchange; survivors ride the native
    hash semi-join, so the result is exactly the plain semi-join."""
    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber"])
    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    big = orders.filter(expr="o_totalprice > 400000").select_columns(["o_orderkey"])
    return relational.bloom_semi_join(
        li, big, on="l_orderkey", right_on="o_orderkey"
    )


SQL_BLOOM_SEMI_LINEITEM = """
SELECT l_orderkey, l_linenumber
FROM lineitem
WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 400000)
"""



def q_embedding_unnest(sf_dir: str):
    """List-column unnest WITH ORDINALITY as a zero-copy projection
    (offset arithmetic on the ListArray) — embeddings exploded to
    (vec_id, pos, val) rows, dimension-sliced to keep the oracle compact."""
    from ..stages.normalize import unnest_list

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    ds = ds.filter(expr="vec_id < 100")
    return unnest_list(ds, "embedding", "vec_id")


SQL_EMBEDDING_UNNEST = """
SELECT vec_id,
       CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS pos,
       unnest(embedding) AS val
FROM embeddings
WHERE vec_id < 100
"""



def q_sketch_quantiles_supplier(sf_dir: str):
    """KLL-style mergeable quantile sketch in its EXACT regime (points
    under the sketch cap → no compaction → identical to quantile_disc,
    which the oracle pins); the lossy regime's deterministic rank-error
    bound is pytest-gated. Completes the sketch family: HLL distincts,
    Bloom membership, Misra-Gries frequencies, KLL quantiles."""
    sup = read_table(sf_dir, "supplier", columns=["s_acctbal"])
    return relational.sketch_quantiles(sup, "s_acctbal", [0.25, 0.5, 0.9])


SQL_SKETCH_QUANTILES = """
SELECT quantile_disc(s_acctbal, 0.25) AS q25,
       quantile_disc(s_acctbal, 0.50) AS q50,
       quantile_disc(s_acctbal, 0.90) AS q90
FROM supplier
"""



def q_supplier_percent_rank(sf_dir: str):
    """Global percent_rank as exact scaled integers (rank·10⁶ // (n−1)
    over the tie-free (balance, key) order) — no float division to round
    differently across engines; the prefix-scan window machinery again."""
    sup = read_table(sf_dir, "supplier", columns=["s_suppkey", "s_acctbal"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "s_suppkey": t.column("s_suppkey"),
            "bal_c": _int_units(t.column("s_acctbal"), 100),
        })

    prepped = sup.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    out = relational.percent_rank_scaled(prepped, "bal_c", "s_suppkey",
                                         num_buckets=64)
    return out.rename_columns({"id": "s_suppkey", "value": "bal_c"})


SQL_SUPPLIER_PERCENT_RANK = """
SELECT s_suppkey,
       CAST(round(s_acctbal * 100) AS BIGINT) AS bal_c,
       CAST((rank() OVER (ORDER BY round(s_acctbal * 100), s_suppkey) - 1)
            * 1000000 // (count(*) OVER () - 1) AS BIGINT) AS pr_scaled
FROM supplier
"""


def q_grouped_price_median(sf_dir: str):
    """Per-group interpolated median (quantile_cont scaled by 2) of order
    totals by priority — the grouped integer-exact window/quantile form;
    only distinct (group, cents) pairs shuffle."""
    orders = read_table(sf_dir, "orders", columns=["o_orderpriority", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderpriority": t.column("o_orderpriority"),
            "cents": _int_units(t.column("o_totalprice"), 100),
        })

    prepped = orders.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    return relational.grouped_quantile_cont(
        prepped, "cents", "o_orderpriority", 1, 2, out_name="median_cents_x2"
    )


SQL_GROUPED_PRICE_MEDIAN = """
WITH v AS (
  SELECT o_orderpriority, CAST(round(o_totalprice * 100) AS BIGINT) AS c
  FROM orders
), s AS (
  SELECT o_orderpriority, c,
         row_number() OVER (PARTITION BY o_orderpriority ORDER BY c) - 1 AS rn,
         count(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM v
)
SELECT o_orderpriority,
       CAST(sum(CASE
           WHEN rn = ((n - 1) * 1) // 2
             THEN c * (2 - ((n - 1) * 1) % 2)
           WHEN rn = least(((n - 1) * 1) // 2 + 1, n - 1)
                AND ((n - 1) * 1) % 2 = 1
             THEN c
           ELSE 0
       END) AS BIGINT) AS median_cents_x2
FROM s
GROUP BY o_orderpriority
"""



def q_event_coverage(sf_dir: str):
    """Per-user merged-interval coverage (gaps-and-islands union): each
    event opens an interval [ts, ts + |value|·1e6 µs + 1]; overlapping /
    touching intervals merge, and the query reports islands + total
    covered µs per user — the interval-union dual of event_sessions."""
    ev = read_table(sf_dir, "events", columns=["user_id", "ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        s = t.column("ts").cast(pa.int64())  # µs epoch
        dur = pc.add(
            pc.cast(pc.round(pc.multiply(
                pc.abs(t.column("value").cast(pa.float64())),
                pa.scalar(1_000_000.0))), pa.int64()),
            pa.scalar(1, type=pa.int64()),
        )
        return pa.table(
            {
                "user_id": t.column("user_id").cast(pa.int64()),
                "s": s,
                "e": pc.add(s, dur),
            }
        )

    prepped = ev.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    return temporal_stages.interval_coverage(prepped, "user_id", "s", "e").rename_columns(
        {"covered": "covered_us"}
    )


SQL_EVENT_COVERAGE = """
WITH iv AS (
  SELECT user_id, epoch_us(ts) AS s,
         epoch_us(ts) + CAST(round(abs(value) * 1000000) AS BIGINT) + 1 AS e
  FROM events
), o AS (
  SELECT user_id, s, e,
         max(e) OVER (PARTITION BY user_id ORDER BY s, e
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
  FROM iv
), g AS (
  SELECT user_id, s, e,
         sum(CASE WHEN prev_max IS NULL OR s > prev_max THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY s, e) AS island
  FROM o
), h AS (
  SELECT user_id, island, max(e) - min(s) AS cov
  FROM g GROUP BY user_id, island
)
SELECT user_id, count(*) AS n_islands, CAST(sum(cov) AS BIGINT) AS covered_us
FROM h GROUP BY user_id
"""


def q_pfd_orders(sf_dir: str):
    """Probabilistic-FD profile o_custkey → {status, priority} (SURVEY §2 A11;
    reference ``perTuple_pFDs``/``pfd_prob_pervalue``, ``takco/link/profile.py``).
    Map-side (det, dep, val) count partials → one det-hash exchange →
    per-partition segment max/sum → tiny final agg; scores floored to ppm."""
    from ..stages.profile import pfd_scores

    ds = read_table(
        sf_dir, "orders", columns=["o_custkey", "o_orderstatus", "o_orderpriority"]
    )
    return pfd_scores(ds, "o_custkey", ["o_orderstatus", "o_orderpriority"])


def _sql_pfd_one(dep: str) -> str:
    return f"""
SELECT '{dep}' AS dep_col,
       CAST(sum(mx) * 1000000 // (SELECT count(*) FROM orders) AS BIGINT) AS pfd_ppm,
       CAST(sum(mx * 1000000 // tot) // count(*) AS BIGINT) AS pfd_pv_ppm
FROM (
  SELECT det, max(cnt) AS mx, sum(cnt) AS tot
  FROM (
    SELECT CAST(o_custkey AS VARCHAR) AS det, CAST({dep} AS VARCHAR) AS v,
           count(*) AS cnt
    FROM orders GROUP BY 1, 2
  ) GROUP BY det
)"""


SQL_PFD_ORDERS = (
    _sql_pfd_one("o_orderstatus") + "\nUNION ALL" + _sql_pfd_one("o_orderpriority")
)


def q_column_profile_customer(sf_dir: str):
    """Numeric-fraction / uniqueness column profile + heuristic-key flag over
    customer (SURVEY §2 M15; reference ``numscore``/``uniqscore``/
    ``heuristic_key``, ``takco/link/__init__.py:96-118``). One (col, value)
    count shuffle serves every column; integer ppm + exact integer threshold
    comparisons keep the oracle hash-stable."""
    from ..stages.profile import column_profile

    cols = ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]
    return column_profile(read_table(sf_dir, "customer", columns=cols), cols)


_PUNCT_SQL = r"[!-/:-@\[-`{-~ ]"


def _sql_profile_one(col: str) -> str:
    return f"""
SELECT '{col}' AS col_name,
       CAST(nnum * 1000000 // n AS BIGINT) AS num_ppm,
       CAST(ndist * 1000000 // n AS BIGINT) AS uniq_ppm,
       (2 * nnum < n AND 10 * ndist > 9 * n) AS is_key
FROM (
  SELECT count(*) AS n, count(DISTINCT {col}) AS ndist,
         sum(CASE WHEN length(s2) > 0
                   AND 2 * length(regexp_replace(s2, '[^0-9]', '', 'g')) > length(s2)
             THEN 1 ELSE 0 END) AS nnum
  FROM (SELECT {col},
               regexp_replace(CAST({col} AS VARCHAR), '{_PUNCT_SQL}', '', 'g') AS s2
        FROM customer)
)"""


SQL_COLUMN_PROFILE = "\nUNION ALL".join(
    _sql_profile_one(c)
    for c in ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]
)


def q_coltype_events(sf_dir: str):
    """Majority-vote column typing over events (SURVEY §2 M16; reference
    ``coltypes`` + ``Typer.coltype`` majority rule,
    ``takco/link/__init__.py:152-172``). Cells vote integer/number/date/text
    by first-match priority; a column keeps the plurality type only on a
    strict majority. Partial counts per batch; the shuffle moves ≤
    cols × 4 rows per block."""
    from ..stages.profile import coltype_votes

    cols = ["event_id", "ts", "event_type", "props"]
    return coltype_votes(read_table(sf_dir, "events", columns=cols), cols)


_RE_INT = "^[+-]?[0-9]+$"
_RE_NUM = r"^[+-]?[0-9]*\.[0-9]+([eE][+-]?[0-9]+)?$"
_RE_DATE = "^[0-9]{4}-[0-9]{2}-[0-9]{2}"


def _sql_coltype_one(col: str) -> str:
    return f"""
SELECT col_name,
       CASE WHEN 2 * w > n THEN wname ELSE 'text' END AS coltype,
       CAST((CASE WHEN 2 * w > n THEN w ELSE n_text END) * 1000000 // n AS BIGINT)
         AS vote_ppm
FROM (
  SELECT col_name, n, n_text,
         CASE WHEN n_int >= n_num AND n_int >= n_date AND n_int >= n_text THEN n_int
              WHEN n_num >= n_date AND n_num >= n_text THEN n_num
              WHEN n_date >= n_text THEN n_date ELSE n_text END AS w,
         CASE WHEN n_int >= n_num AND n_int >= n_date AND n_int >= n_text THEN 'integer'
              WHEN n_num >= n_date AND n_num >= n_text THEN 'number'
              WHEN n_date >= n_text THEN 'date' ELSE 'text' END AS wname
  FROM (
    SELECT '{col}' AS col_name, nn AS n,
           n_int, n_num, n_date, nn - n_int - n_num - n_date AS n_text
    FROM (
      SELECT
        sum(CASE WHEN regexp_matches(s, '{_RE_INT}') THEN 1 ELSE 0 END) AS n_int,
        sum(CASE WHEN NOT regexp_matches(s, '{_RE_INT}')
                  AND regexp_matches(s, '{_RE_NUM}') THEN 1 ELSE 0 END) AS n_num,
        sum(CASE WHEN NOT regexp_matches(s, '{_RE_INT}')
                  AND NOT regexp_matches(s, '{_RE_NUM}')
                  AND regexp_matches(s, '{_RE_DATE}') THEN 1 ELSE 0 END) AS n_date,
        count(*) AS nn
      FROM (SELECT CAST({col} AS VARCHAR) AS s FROM events)
    )
  )
)"""


SQL_COLTYPE_EVENTS = "\nUNION ALL".join(
    _sql_coltype_one(c) for c in ["event_id", "ts", "event_type", "props"]
)


_MELT_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def q_unpivot_lineitem(sf_dir: str):
    """Wide→long unpivot of four lineitem measures (SURVEY §2 M9; reference
    ``unpivot_tables`` melt, ``takco/reshape/findpivot.py:100-158``). The
    melt is a pure per-block transform (k stacked zero-copy views); the
    subset filter bounds driver output. Measures are integerized ×10000 so
    both engines hash identically."""
    from ..stages.reshape import melt

    ds = read_table(
        sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber"] + _MELT_COLS
    )

    def prep(t: pa.Table) -> pa.Table:
        ok = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(ok % 101 == 7))
        cols = {
            "l_orderkey": t.column("l_orderkey"),
            "l_linenumber": t.column("l_linenumber"),
        }
        for c in _MELT_COLS:
            cols[c] = _int_units(t.column(c), 10000)
        return pa.table(cols)

    prepped = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    return melt(
        prepped,
        id_cols=["l_orderkey", "l_linenumber"],
        value_cols=_MELT_COLS,
        var_name="variable",
        value_name="value_u",
        value_type=pa.int64(),
    )


SQL_UNPIVOT_LINEITEM = "\nUNION ALL".join(
    f"""
SELECT l_orderkey, l_linenumber, '{c}' AS variable,
       CAST(round({c} * 10000) AS BIGINT) AS value_u
FROM lineitem WHERE l_orderkey % 101 = 7"""
    for c in _MELT_COLS
)


def q_link_customer_nations(sf_dir: str):
    """Cell-mention → entity-id broadcast lookup (SURVEY §2 M14; reference
    ``lookup_hyperlinks`` / label-DB lookup, ``takco/link/__init__.py:24-74``).
    Deterministic mentions ('nation_<custkey mod 30>', 5 of 30 unresolvable)
    link against the nation label index — built once, ``ray.put`` once,
    probed per batch via dictionary-encode + ``index_in``."""
    from ..stages.linking import build_label_index, link_cells

    nation = pa.Table.from_pandas(
        read_table(sf_dir, "nation", columns=["n_nationkey", "n_name"]).to_pandas()
    )
    index_ref = build_label_index(nation, "n_name", "n_nationkey")

    cust = read_table(sf_dir, "customer", columns=["c_custkey"])

    def add_mention(t: pa.Table) -> pa.Table:
        ck = t.column("c_custkey").to_numpy(zero_copy_only=False)
        mention = np.char.add("nation_", (ck % 30).astype(str))
        return pa.table(
            {
                "c_custkey": t.column("c_custkey"),
                "mention": pa.array(mention, type=pa.string()),
            }
        )

    withm = cust.map_batches(add_mention, batch_format="pyarrow", zero_copy_batch=True)
    return link_cells(withm, "mention", index_ref)


SQL_LINK_CUSTOMER_NATIONS = """
WITH t AS (
  SELECT c_custkey, 'nation_' || CAST(c_custkey % 30 AS VARCHAR) AS mention
  FROM customer
)
SELECT t.c_custkey, t.mention,
       CAST(COALESCE(n.n_nationkey, -1) AS BIGINT) AS entity_id,
       n.n_nationkey IS NOT NULL AS matched
FROM t LEFT JOIN nation n ON lower(trim(n.n_name)) = t.mention
"""


def q_novelty_customer_segments(sf_dir: str):
    """Per-triple KB novelty classes (SURVEY §2 M20; reference
    ``get_cell_noveltyhashes``, ``takco/evaluate/novelty.py:8-58``). Pred
    triples (custkey, segment) check against a deterministically degraded KB
    (custkey%3==0 absent → attnovel; custkey%5==0 wrong object → valnovel).
    One left hash join + per-triple any-match reduction; counts per class."""
    from ..stages.linking import novelty_classify, novelty_counts

    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])

    def kb_prep(t: pa.Table) -> pa.Table:
        ck = t.column("c_custkey").to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(ck % 3 != 0))
        ck = t.column("c_custkey").to_numpy(zero_copy_only=False)
        seg = t.column("c_mktsegment").to_numpy(zero_copy_only=False).astype(object)
        seg[ck % 5 == 0] = "UNKNOWN"
        return pa.table(
            {
                "c_custkey": t.column("c_custkey"),
                "c_mktsegment": pa.array(seg, type=pa.string()),
            }
        )

    kb = cust.map_batches(kb_prep, batch_format="pyarrow", zero_copy_batch=True)
    classified = novelty_classify(cust, kb, ["c_custkey"], "c_mktsegment")
    return novelty_counts(classified)


SQL_NOVELTY_CUSTOMER_SEGMENTS = """
WITH kb AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 5 = 0 THEN 'UNKNOWN' ELSE c_mktsegment END AS v
  FROM customer WHERE c_custkey % 3 <> 0
)
SELECT CASE WHEN kb.c_custkey IS NULL THEN 'attnovel'
            WHEN t.c_mktsegment = kb.v THEN 'existing'
            ELSE 'valnovel' END AS novelty,
       count(*) AS n
FROM customer t LEFT JOIN kb ON t.c_custkey = kb.c_custkey
GROUP BY 1
"""


def q_html_tables_roundtrip(sf_dir: str):
    """HTML page → table extraction round-trip (SURVEY §2 S5/M2; reference
    ``Extractor.parse`` span expansion, ``takco/extract/htmltables.py:52-150``).
    Deterministic pages (a colspan header + a rowspan body) are generated
    from doc ids and parsed back; the oracle derives the expected table
    shapes directly from the generator's formula — a genuine end-to-end
    check of the parser + grid expansion, since any misplacement changes
    n_rows/n_cols."""
    from ..sources.htmltables import extract_tables_stage

    docs = read_table(sf_dir, "documents", columns=["doc_id"])

    def gen(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        ids = ids[ids % 11 == 0]
        pages = []
        for i in ids:
            extra = "".join(
                f"<tr><td>e{j}</td><td>f</td><td>g</td></tr>" for j in range(i % 3)
            )
            pages.append(
                f"<html><body><p>noise</p><table>"
                f'<tr><th colspan="2">doc {i}</th><th>x</th></tr>'
                f'<tr><td rowspan="2">r</td><td><a href="/e{i}">a{i}</a></td>'
                f"<td>b</td></tr>"
                f"<tr><td>c</td><td>d</td></tr>{extra}</table></body></html>"
            )
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "html": pa.array(pages, type=pa.string()),
            }
        )

    pages = docs.map_batches(gen, batch_format="pyarrow", zero_copy_batch=True)
    parsed = extract_tables_stage(pages, "html", "doc_id")
    return parsed.select_columns(
        ["page_id", "table_idx", "n_head", "n_rows", "n_cols"]
    )


SQL_HTML_TABLES_ROUNDTRIP = """
SELECT doc_id AS page_id,
       CAST(0 AS BIGINT) AS table_idx,
       CAST(1 AS BIGINT) AS n_head,
       CAST(3 + doc_id % 3 AS BIGINT) AS n_rows,
       CAST(3 AS BIGINT) AS n_cols
FROM documents WHERE doc_id % 11 = 0
"""


def q_warc_tables_roundtrip(sf_dir: str):
    """WARC shard → response pages → HTML table extraction (SURVEY §2 S5;
    reference ``WarcPages.load``, ``takco/extract/pages.py:65-104``).
    Deterministic multi-record ``.warc.gz`` shards (one gzip member per
    record, interleaved request records, ``?about=`` URIs on even ids) are
    generated from doc ids under /tmp, then streamed back through
    :func:`read_warc_pages` (one task per shard) into the span-expanding
    extractor; the oracle recomputes the expected table shapes and about
    flags from the generator's formula. Any fault in record framing, the
    response filter, the about split, or grid expansion changes the
    output."""
    import hashlib
    import os

    import pyarrow.parquet as pq

    from ..sources.htmltables import extract_tables_stage
    from ..sources.warc import page_doc_id, read_warc_pages, write_warc

    ids = (
        pq.read_table(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
        )
        .column("doc_id")
        .to_numpy()
    )
    ids = np.sort(ids[ids % 7 == 0])

    def page_html(i: int) -> str:
        body = "".join(
            f"<tr><td>r{j}</td><td>s</td><td>t</td></tr>" for j in range(2 + i % 4)
        )
        return (
            f"<html><body><table>"
            f'<tr><th colspan="2">doc {i}</th><th>x</th></tr>{body}'
            f"</table></body></html>"
        )

    key = hashlib.sha256(
        f"warcfix1:{os.path.abspath(sf_dir)}:{len(ids)}".encode()
    ).hexdigest()[:16]
    root = f"/tmp/takco_warc_{key}"
    if not os.path.exists(os.path.join(root, "_DONE")):
        tmp = f"{root}.build.{os.getpid()}"
        os.makedirs(tmp, exist_ok=True)
        shard_size = 2048
        for s, lo in enumerate(range(0, len(ids), shard_size)):
            chunk = ids[lo : lo + shard_size]
            write_warc(
                os.path.join(tmp, f"shard-{s:04d}.warc.gz"),
                (
                    (
                        f"http://corpus.test/page/{i}",
                        f"http://kb.test/e{i}" if i % 2 == 0 else None,
                        page_html(int(i)),
                    )
                    for i in chunk
                ),
            )
        open(os.path.join(tmp, "_DONE"), "w").close()
        try:
            os.rename(tmp, root)
        except OSError:  # concurrent builder won the rename; use theirs
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
    shards = sorted(
        os.path.join(root, f)
        for f in os.listdir(root)
        if f.endswith(".warc.gz")
    )
    pages = read_warc_pages(shards)

    def add_id(t: pa.Table) -> pa.Table:
        urls = t.column("url").to_pylist()
        doc_ids = [page_doc_id(u) for u in urls]
        has_about = pc.is_valid(t.column("about"))
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, type=pa.int64()),
                "html": t.column("html"),
                "has_about": has_about,
            }
        )

    pages = pages.map_batches(add_id, batch_format="pyarrow", zero_copy_batch=True)
    parsed = extract_tables_stage(pages, "html", "doc_id")
    flags = pages.select_columns(["doc_id", "has_about"])
    joined = parsed.join(
        flags,
        join_type="inner",
        num_partitions=default_join_partitions(),
        on=("page_id",),
        right_on=("doc_id",),
        aggregator_ray_remote_args=join_remote_args(default_join_partitions()),
    )
    return joined.select_columns(
        ["page_id", "n_head", "n_rows", "n_cols", "has_about"]
    )


SQL_WARC_TABLES_ROUNDTRIP = """
SELECT doc_id AS page_id,
       CAST(1 AS BIGINT) AS n_head,
       CAST(3 + doc_id % 4 AS BIGINT) AS n_rows,
       CAST(3 AS BIGINT) AS n_cols,
       doc_id % 2 = 0 AS has_about
FROM documents WHERE doc_id % 7 = 0
"""


def q_semtab_tables(sf_dir: str):
    """SemTab gold-layout loader round-trip (SURVEY §2 S4; reference
    ``Semtab.tables``, ``takco/evaluate/dataset/semtab.py:17-45``).
    Deterministic ``tables/*.csv`` files are generated from doc ids under
    /tmp (a text Name column + a numeric Value column, row count keyed to
    the id), loaded back through the distributed per-file parser, and the
    oracle recomputes shapes + the entity-column heuristic (numeric columns
    excluded) from the generator's formula."""
    import hashlib
    import os

    import pyarrow.parquet as pq

    from ..sources.gold import load_semtab_tables

    ids = (
        pq.read_table(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
        )
        .column("doc_id")
        .to_numpy()
    )
    ids = np.sort(ids[ids % 13 == 0])
    key = hashlib.sha256(
        f"semtabfix1:{os.path.abspath(sf_dir)}:{len(ids)}".encode()
    ).hexdigest()[:16]
    root = f"/tmp/takco_semtab_{key}"
    if not os.path.exists(os.path.join(root, "_DONE")):
        tmp = f"{root}.build.{os.getpid()}"
        os.makedirs(os.path.join(tmp, "tables"), exist_ok=True)
        for i in ids:
            i = int(i)
            rows = ["Name,Value"] + [
                f"name{i}_{j},{i * 10 + j}" for j in range(1 + i % 5)
            ]
            with open(os.path.join(tmp, "tables", f"t{i}.csv"), "w") as f:
                f.write("\n".join(rows) + "\n")
        open(os.path.join(tmp, "_DONE"), "w").close()
        try:
            os.rename(tmp, root)
        except OSError:
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)

    loaded = load_semtab_tables(root)

    def project(t: pa.Table) -> pa.Table:
        ec = t.column("entcols")
        return pa.table(
            {
                "table": t.column("table"),
                "n_rows": t.column("n_rows"),
                "n_cols": t.column("n_cols"),
                "n_entcols": pc.cast(pc.list_value_length(ec), pa.int64()),
                "first_entcol": pc.list_element(ec, 0),
            }
        )

    return loaded.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)


SQL_SEMTAB_TABLES = """
SELECT 't' || CAST(doc_id AS VARCHAR) AS "table",
       CAST(1 + doc_id % 5 AS BIGINT) AS n_rows,
       CAST(2 AS BIGINT) AS n_cols,
       CAST(1 AS BIGINT) AS n_entcols,
       CAST(0 AS BIGINT) AS first_entcol
FROM documents WHERE doc_id % 13 = 0
"""


def q_wdc_tables(sf_dir: str):
    """WebDataCommons jsonl loader round-trip (SURVEY §2 S4; reference
    ``WebDataCommons.convert``, ``takco/evaluate/dataset/wdc.py:43-74``).
    Deterministic jsonl shards are generated from doc ids under /tmp with
    COLUMN-MAJOR relations; ids ≡ 2 (mod 3) get ``headerPosition: NONE``
    and must be filtered out; the oracle recomputes the surviving rows'
    urls, domains and shapes from the generator's formula — any fault in
    the transpose, the FIRST_ROW filter, or the domain parse changes the
    output."""
    import hashlib
    import json as _json
    import os

    import pyarrow.parquet as pq

    from ..sources.gold import load_wdc_tables

    ids = (
        pq.read_table(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
        )
        .column("doc_id")
        .to_numpy()
    )
    ids = np.sort(ids[ids % 17 == 0])
    key = hashlib.sha256(
        f"wdcfix1:{os.path.abspath(sf_dir)}:{len(ids)}".encode()
    ).hexdigest()[:16]
    root = f"/tmp/takco_wdc_{key}"
    if not os.path.exists(os.path.join(root, "_DONE")):
        tmp = f"{root}.build.{os.getpid()}"
        os.makedirs(tmp, exist_ok=True)
        shard_size = 1024
        for s, lo in enumerate(range(0, len(ids), shard_size)):
            with open(os.path.join(tmp, f"shard-{s:04d}.jsonl"), "w") as f:
                for i in ids[lo : lo + shard_size]:
                    i = int(i)
                    n_body = 1 + i % 3
                    doc = {
                        "relation": [
                            ["col_a"] + [f"a{i}_{r}" for r in range(n_body)],
                            ["col_b"] + [f"b{i}_{r}" for r in range(n_body)],
                        ],
                        "headerPosition": "NONE" if i % 3 == 2 else "FIRST_ROW",
                        "url": f"http://s{i % 7}.test/page/{i}",
                        "tableNum": i % 4,
                    }
                    f.write(_json.dumps(doc) + "\n")
        open(os.path.join(tmp, "_DONE"), "w").close()
        try:
            os.rename(tmp, root)
        except OSError:
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)

    shards = sorted(
        os.path.join(root, f) for f in os.listdir(root) if f.endswith(".jsonl")
    )
    loaded = load_wdc_tables(shards)
    return loaded.select_columns(
        ["url", "domain", "table_num", "n_rows", "n_cols"]
    )


SQL_WDC_TABLES = """
SELECT 'http://s' || CAST(doc_id % 7 AS VARCHAR) || '.test/page/'
         || CAST(doc_id AS VARCHAR) AS url,
       's' || CAST(doc_id % 7 AS VARCHAR) || '.test' AS domain,
       CAST(doc_id % 4 AS BIGINT) AS table_num,
       CAST(1 + doc_id % 3 AS BIGINT) AS n_rows,
       CAST(2 AS BIGINT) AS n_cols
FROM documents WHERE doc_id % 17 = 0 AND doc_id % 3 <> 2
"""


def q_kb_search_customers(sf_dir: str):
    """Local SQLite KB search with the part-split fallback (SURVEY §2 ST5;
    reference ``SQLiteSearcher.search_entities``,
    ``takco/link/db/sqlite.py:341-408``). The KB is built DISTRIBUTED from
    customer names (score 1.0 on even keys, 0.5 on odd — the
    prefLabel/altLabel split) into the reference's label(uri,txt,score)
    layout under /tmp; mentions are every third customer's name, with
    every ninth customer's mention suffixed ``" (branch)"`` so the exact
    probe misses and the ``(``-split parts fallback must recover it. The
    oracle recomputes uri/score/flags from the generator's formula."""
    import hashlib
    import os

    from ..stages.kbsearch import build_sqlite_kb, search_kb

    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_name"])

    key = hashlib.sha256(
        f"kbfix1:{os.path.abspath(sf_dir)}".encode()
    ).hexdigest()[:16]
    db_path = f"/tmp/takco_kb_{key}.sqlite"
    if not os.path.exists(db_path + ".done"):
        def kb_rows(t: pa.Table) -> pa.Table:
            keys = t.column("c_custkey")
            return pa.table(
                {
                    "uri": pc.binary_join_element_wise(
                        pa.array(["kb:c"] * t.num_rows),
                        pc.cast(keys, pa.string()),
                        "",
                    ),
                    "label": t.column("c_name"),
                    "score": pc.if_else(
                        pc.equal(pc.bit_wise_and(keys, 1), 0), 1.0, 0.5
                    ),
                }
            )

        kb = cust.map_batches(kb_rows, batch_format="pyarrow", zero_copy_batch=True)
        tmp_db = f"{db_path}.build.{os.getpid()}"
        build_sqlite_kb(kb, tmp_db, "uri", "label", score_col="score")
        try:
            os.rename(tmp_db, db_path)
            open(db_path + ".done", "w").close()
        except OSError:
            if os.path.exists(tmp_db):
                os.remove(tmp_db)

    def mention_rows(t: pa.Table) -> pa.Table:
        keys = t.column("c_custkey").to_numpy(zero_copy_only=False)
        keep = keys % 3 == 0
        names = t.column("c_name").to_numpy(zero_copy_only=False)[keep]
        kk = keys[keep]
        mention = [
            f"{n} (branch)" if k % 9 == 0 else str(n)
            for n, k in zip(names, kk)
        ]
        return pa.table(
            {
                "c_custkey": pa.array(kk, type=pa.int64()),
                "mention": pa.array(mention, type=pa.string()),
            }
        )

    mentions = cust.map_batches(
        mention_rows, batch_format="pyarrow", zero_copy_batch=True
    )
    out = search_kb(mentions, "mention", db_path)
    return out.select_columns(
        ["c_custkey", "kb_uri", "kb_score", "kb_matched", "kb_via_parts"]
    )


SQL_KB_SEARCH_CUSTOMERS = """
SELECT c_custkey,
       'kb:c' || CAST(c_custkey AS VARCHAR) AS kb_uri,
       CASE WHEN c_custkey % 2 = 0 THEN 1.0 ELSE 0.5 END AS kb_score,
       TRUE AS kb_matched,
       c_custkey % 9 = 0 AS kb_via_parts
FROM customer WHERE c_custkey % 3 = 0
"""


def q_integrate_customer_facts(sf_dir: str):
    """N-ary KB fact matching → column-property discovery (SURVEY §2 M17's
    KB arm; reference ``NaryDB.integrate``, ``takco/link/integrate.py:
    33-75``). The customer table becomes cells (col 0 = name carrying a
    linked entity on keys ≢ 1 (mod 4), col 1 = segment, col 2 = nation key
    as text); facts assert ``mem:segment`` for every entity and
    ``mem:nation`` for even keys. The match counts per (from_col, to_col,
    prop) are exact integers the oracle recomputes from the generator's
    formula — any fault in either join, the literal normalization, or the
    self-match guard changes a count."""
    from ..stages.linking import integrate_nary

    cust = read_table(
        sf_dir, "customer", columns=["c_custkey", "c_name", "c_mktsegment", "c_nationkey"]
    )

    def to_cells(t: pa.Table) -> pa.Table:
        keys = t.column("c_custkey")
        n = t.num_rows
        ent = pc.if_else(
            pc.not_equal(pc.bit_wise_and(keys, 3), 1),
            pc.binary_join_element_wise(
                pa.array(["kb:c"] * n), pc.cast(keys, pa.string()), ""
            ),
            pa.scalar(None, type=pa.string()),
        )
        nat = pc.cast(t.column("c_nationkey"), pa.string())
        return pa.table(
            {
                "row_idx": pa.concat_arrays([pc.cast(keys, pa.int64()).combine_chunks()] * 3),
                "col_idx": pa.array(
                    np.repeat(np.array([0, 1, 2], dtype=np.int64), n)
                ),
                "celltext": pa.concat_arrays(
                    [
                        pc.cast(t.column("c_name"), pa.string()).combine_chunks(),
                        pc.cast(t.column("c_mktsegment"), pa.string()).combine_chunks(),
                        nat.combine_chunks(),
                    ]
                ),
                "entity_uri": pa.concat_arrays(
                    [
                        ent.combine_chunks(),
                        pa.nulls(n, type=pa.string()),
                        pa.nulls(n, type=pa.string()),
                    ]
                ),
            }
        )

    cells = cust.map_batches(to_cells, batch_format="pyarrow", zero_copy_batch=True)

    def to_facts(t: pa.Table) -> pa.Table:
        keys = t.column("c_custkey")
        n = t.num_rows
        s = pc.binary_join_element_wise(
            pa.array(["kb:c"] * n), pc.cast(keys, pa.string()), ""
        )
        seg = pa.table(
            {
                "s": s,
                "p": pa.array(["mem:segment"] * n),
                "o": t.column("c_mktsegment"),
            }
        )
        even = pc.equal(pc.bit_wise_and(keys, 1), 0)
        natt = pa.table(
            {
                "s": s,
                "p": pa.array(["mem:nation"] * n),
                "o": pc.cast(t.column("c_nationkey"), pa.string()),
            }
        ).filter(even)
        return pa.concat_tables([seg, natt])

    facts = cust.map_batches(to_facts, batch_format="pyarrow", zero_copy_batch=True)
    return integrate_nary(cells, facts)


SQL_INTEGRATE_CUSTOMER_FACTS = """
SELECT CAST(0 AS BIGINT) AS from_col, CAST(1 AS BIGINT) AS to_col,
       'mem:segment' AS prop,
       count(*) AS n_matches
FROM customer WHERE c_custkey % 4 <> 1
UNION ALL
SELECT CAST(0 AS BIGINT), CAST(2 AS BIGINT), 'mem:nation', count(*)
FROM customer WHERE c_custkey % 4 <> 1 AND c_custkey % 2 = 0
"""


def q_triples_customer(sf_dir: str):
    """Triple emission from annotated tables (SURVEY §2 M18; reference
    ``yield_triples``, ``takco/evaluate/triples.py:13-133``). The customer
    table becomes cells (col 0 name, col 1 segment) with entity
    annotations on col 0 for keys ≢ 1 (mod 3), a column class, and a
    0→1 property; every linked row must emit exactly one label, one
    rdf:type, and one literal property triple, which the oracle rebuilds
    from the generator's formula (kind/s/p/o/row all checked)."""
    from ..stages.triples import LABEL, TYPE, emit_triples

    cust = read_table(
        sf_dir, "customer", columns=["c_custkey", "c_name", "c_mktsegment"]
    )

    def to_cells(t: pa.Table) -> pa.Table:
        keys = pc.cast(t.column("c_custkey"), pa.int64()).combine_chunks()
        n = t.num_rows
        return pa.table(
            {
                "table": pa.array(["customer"] * (2 * n), type=pa.string()),
                "row": pa.concat_arrays([keys, keys]),
                "col": pa.array(
                    np.repeat(np.array([0, 1], dtype=np.int64), n)
                ),
                "text": pa.concat_arrays(
                    [
                        pc.cast(t.column("c_name"), pa.string()).combine_chunks(),
                        pc.cast(t.column("c_mktsegment"), pa.string()).combine_chunks(),
                    ]
                ),
            }
        )

    def to_entities(t: pa.Table) -> pa.Table:
        keys = t.column("c_custkey")
        kn = keys.to_numpy(zero_copy_only=False)
        sel = kn % 3 != 1
        kn = kn[sel]
        return pa.table(
            {
                "table": pa.array(["customer"] * len(kn), type=pa.string()),
                "row": pa.array(kn, type=pa.int64()),
                "col": pa.array(np.zeros(len(kn), dtype=np.int64)),
                "uri": pa.array([f"kb:c{k}" for k in kn], type=pa.string()),
                "score": pa.array(np.ones(len(kn)), type=pa.float64()),
            }
        )

    cells = cust.map_batches(to_cells, batch_format="pyarrow", zero_copy_batch=True)
    entities = cust.map_batches(
        to_entities, batch_format="pyarrow", zero_copy_batch=True
    )
    classes = ray.data.from_arrow(
        pa.table(
            {
                "table": ["customer"],
                "col": pa.array([0], type=pa.int64()),
                "uri": ["mem:Customer"],
                "score": [1.0],
            }
        )
    )
    props = ray.data.from_arrow(
        pa.table(
            {
                "table": ["customer"],
                "from_col": pa.array([0], type=pa.int64()),
                "to_col": pa.array([1], type=pa.int64()),
                "uri": ["mem:segment"],
                "score": [0.9],
            }
        )
    )
    out = emit_triples(cells, entities, classes, props)
    return out.select_columns(["kind", "s", "p", "o", "row", "col"])


SQL_TRIPLES_CUSTOMER = """
WITH linked AS (SELECT * FROM customer WHERE c_custkey % 3 <> 1)
SELECT 'label' AS kind, 'kb:c' || CAST(c_custkey AS VARCHAR) AS s,
       'http://www.w3.org/2000/01/rdf-schema#label' AS p,
       c_name AS o, c_custkey AS row, CAST(0 AS BIGINT) AS col
FROM linked
UNION ALL
SELECT 'class', 'kb:c' || CAST(c_custkey AS VARCHAR),
       'http://www.w3.org/1999/02/22-rdf-syntax-ns#type',
       'mem:Customer', c_custkey, CAST(0 AS BIGINT)
FROM linked
UNION ALL
SELECT 'property', 'kb:c' || CAST(c_custkey AS VARCHAR), 'mem:segment',
       c_mktsegment, c_custkey, CAST(1 AS BIGINT)
FROM linked
"""


def q_compound_split_parts(sf_dir: str):
    """Compound-identifier splitting (SURVEY §2 M10 analog; reference
    ``CompoundSplitter.find_splits``, ``takco/reshape/compound.py:90-95``).
    Part names are snake_cased into identifiers, split back by the
    vectorized boundary splitter; the oracle recomputes part counts from the
    original spaced form — a round-trip through the splitter's separator
    logic. Camel/digit boundaries are pytest-gated (SQL can't express the
    chain compactly)."""
    from ..functions.compound import compound_parts_stage

    parts = read_table(sf_dir, "part", columns=["p_partkey", "p_name"])

    def to_ident(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "p_partkey": t.column("p_partkey"),
                "ident": pc.replace_substring(t.column("p_name"), " ", "_"),
            }
        )

    idents = parts.map_batches(to_ident, batch_format="pyarrow", zero_copy_batch=True)
    split = compound_parts_stage(idents, "ident")

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "p_partkey": t.column("p_partkey"),
                "n_parts": t.column("n_parts"),
                "first_part": pc.list_element(t.column("parts"), 0),
            }
        )

    return split.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)


SQL_COMPOUND_SPLIT = """
SELECT p_partkey,
       CAST(len(string_split(p_name, ' ')) AS BIGINT) AS n_parts,
       lower(string_split(p_name, ' ')[1]) AS first_part
FROM part
"""


# --------------------------------------------------------------------------
# registry
# --------------------------------------------------------------------------

# Snapshot of the query names present in the MOST RECENT driver
# CORRECTNESS file (r04's 50-slot window, plus three r01-r03 rows-only
# entries).  The oracled tier below rotates entries absent from that
# snapshot to the FRONT — VERDICT r4 item 1's exact criterion — so every
# SQL-oracled query eventually earns a hard driver-green row;
# previously-graded entries fall back behind them (they all still pass
# locally, so rotation risks nothing).
_DRIVER_GRADED = frozenset({
    "pricing_summary", "nation_revenue", "segment_orders", "top_parts",
    "filter_orders", "events_hourly", "distinct_segments", "union_accounts",
    "semi_join_orders", "anti_join_customers", "top_orders_per_priority",
    "orders_pivot", "quantiles_quantity", "grouped_quantiles", "doc_sample",
    "events_running_sum", "customer_f_order_counts", "name_distances",
    "top_tokens", "tfidf_terms", "ngram_repetition_docs", "dup_span_docs",
    "license_scan_docs", "quantile_filter_docs", "source_quota_docs",
    "decontam_docs", "cross_neardup_docs", "line_stats_docs", "doc_sha256",
    "exact_dedup_docs", "token_counts_docs", "doc_char_stats",
    "embedding_neighbors", "embedding_pair_cos", "ngram_jaccard_exact",
    "language_id_docs", "redact_pii_docs", "source_neardup", "event_deltas",
    "stratified_orders", "pack_docs", "chunk_docs", "shuffle_docs",
    "stop_shingles", "curate_docs", "text_neardup_clusters", "cluster_reps",
    "event_props", "rollup_lineitem", "priority_mode_by_segment",
    # graded earlier rounds (r01-r03 windows)
    "minhash_dedup_docs", "simhash_docs", "ngram_jaccard_docs",
})


def build_queries() -> dict:
    """Query registry, ordered so every SQL-oracled entry comes first.

    The driver grades the first 50 registry entries for full
    rows+schema+hash correctness; rows-only (``no_oracle``) queries are
    deliberately placed last so all graded slots carry a SQL oracle.
    Within the oracled tier, entries that have never appeared in a driver
    CORRECTNESS file (``_DRIVER_GRADED``) come first so the hard signal
    rotates over the whole catalog across rounds.
    """
    all_q = _build_queries_unordered()
    oracled = set(build_oracle_sql())
    ordered = {
        k: v for k, v in all_q.items()
        if k in oracled and k not in _DRIVER_GRADED
    }
    ordered.update(
        {k: v for k, v in all_q.items() if k in oracled and k not in ordered}
    )
    ordered.update({k: v for k, v in all_q.items() if k not in oracled})
    return ordered


def _build_queries_unordered() -> dict:
    return {
        "pricing_summary": q_pricing_summary,
        "nation_revenue": q_nation_revenue,
        "segment_orders": q_segment_orders,
        "top_parts": q_top_parts,
        "filter_orders": q_filter_orders,
        "events_hourly": q_events_hourly,
        "distinct_segments": q_distinct_segments,
        "union_accounts": q_union_accounts,
        "semi_join_orders": q_semi_join_orders,
        "anti_join_customers": q_anti_join_customers,
        "top_orders_per_priority": q_top_orders_per_priority,
        "orders_pivot": q_orders_pivot,
        "quantiles_quantity": q_quantiles_quantity,
        "grouped_quantiles": q_grouped_quantiles,
        "doc_sample": q_doc_sample,
        "events_running_sum": q_events_running_sum,
        "customer_f_order_counts": q_customer_f_order_counts,
        "name_distances": q_name_distances,
        "top_tokens": q_top_tokens,
        "tfidf_terms": q_tfidf_terms,
        "ngram_repetition_docs": q_ngram_repetition_docs,
        "dup_span_docs": q_dup_span_docs,
        "license_scan_docs": q_license_scan_docs,
        "quantile_filter_docs": q_quantile_filter_docs,
        "source_quota_docs": q_source_quota_docs,
        "decontam_docs": q_decontam_docs,
        "decontam_bloom_docs": q_decontam_bloom_docs,
        "cross_neardup_docs": q_cross_neardup_docs,
        "embedding_quantized_topk": q_embedding_quantized_topk,
        "line_stats_docs": q_line_stats_docs,
        "winnow_neardup_docs": q_winnow_neardup_docs,
        "approx_distinct_users": q_approx_distinct_users,
        "doc_sha256": q_doc_sha256,
        "exact_dedup_docs": q_exact_dedup_docs,
        "token_counts_docs": q_token_counts_docs,
        "doc_char_stats": q_doc_char_stats,
        "embedding_neighbors": q_embedding_neighbors,
        "embedding_pair_cos": q_embedding_pair_cos,
        # rows-only (non-SQL-expressible)
        "minhash_dedup_docs": q_minhash_dedup_docs,
        "simhash_docs": q_simhash_docs,
        "simhash_neardup_docs": q_simhash_neardup_docs,
        "ngram_jaccard_docs": q_ngram_jaccard_docs,
        # SQL-oracled (moved up from rows-only in round 2)
        "ngram_jaccard_exact": q_ngram_jaccard_exact,
        "language_id_docs": q_language_id_docs,
        # round-3 additions (all SQL-oracled)
        "redact_pii_docs": q_redact_pii_docs,
        "source_neardup": q_source_neardup,
        "event_deltas": q_event_deltas,
        "stratified_orders": q_stratified_orders,
        "pack_docs": q_pack_docs,
        "chunk_docs": q_chunk_docs,
        "shuffle_docs": q_shuffle_docs,
        "stop_shingles": q_stop_shingles,
        "curate_docs": q_curate_docs,
        "text_neardup_clusters": q_text_neardup_clusters,
        "cluster_reps": q_cluster_reps,
        "event_props": q_event_props,
        "rollup_lineitem": q_rollup_lineitem,
        "priority_mode_by_segment": q_priority_mode_by_segment,
        "supplier_name_agg": q_supplier_name_agg,
        "price_p90_cont": q_price_p90_cont,
        "supplier_rank": q_supplier_rank,
        "quantity_discount_moments": q_quantity_discount_moments,
        "dup_line_docs": q_dup_line_docs,
        "remove_dup_lines_docs": q_remove_dup_lines_docs,
        "heavy_event_types": q_heavy_event_types,
        "urgent_low_counts": q_urgent_low_counts,
        "order_price_ntile": q_order_price_ntile,
        "priority_skew_join": q_priority_skew_join,
        "bloom_semi_lineitem": q_bloom_semi_lineitem,
        "embedding_unnest": q_embedding_unnest,
        "sketch_quantiles_supplier": q_sketch_quantiles_supplier,
        "supplier_percent_rank": q_supplier_percent_rank,
        "grouped_price_median": q_grouped_price_median,
        "event_coverage": q_event_coverage,
        "pfd_orders": q_pfd_orders,
        "column_profile_customer": q_column_profile_customer,
        "coltype_events": q_coltype_events,
        "unpivot_lineitem": q_unpivot_lineitem,
        "link_customer_nations": q_link_customer_nations,
        "novelty_customer_segments": q_novelty_customer_segments,
        "html_tables_roundtrip": q_html_tables_roundtrip,
        "compound_split_parts": q_compound_split_parts,
        # round-5 additions (SQL-oracled)
        "warc_tables_roundtrip": q_warc_tables_roundtrip,
        "semtab_tables": q_semtab_tables,
        "wdc_tables": q_wdc_tables,
        "kb_search_customers": q_kb_search_customers,
        "integrate_customer_facts": q_integrate_customer_facts,
        "triples_customer": q_triples_customer,
        # round-3 rows-only (estimate is LSH-probabilistic; pytest-pinned)
        "source_neardup_minhash": q_source_neardup_minhash,
        "doc_quality": q_doc_quality,
        "doc_fingerprints": q_doc_fingerprints,
        "embedding_topk": q_embedding_topk,
        "ivf_topk": q_ivf_topk,
        "embedding_lsh_pairs": q_embedding_lsh_pairs,
        # rows-only audit operators (single-row summaries)
        "cluster_size_report": q_cluster_size_report,
        "cluster_manifest_docs": q_cluster_manifest_docs,
        "block_size_stats": q_block_size_stats,
        "embedding_neardup": q_embedding_neardup,
        "semdedup_docs": q_semdedup_docs,
        "event_sessions": q_event_sessions,
        "asof_orders": q_asof_orders,
        "events_rolling": q_events_rolling,
        "event_pairs_range": q_event_pairs_range,
        "media_features": q_media_features,
        "er_clusters": q_er_clusters,
        "incremental_er_labels": q_incremental_er_labels,
        "incremental_er_merges": q_incremental_er_merges,
    }


def build_oracle_sql() -> dict:
    return {
        "pricing_summary": SQL_PRICING,
        "nation_revenue": SQL_NATION_REVENUE,
        "segment_orders": SQL_SEGMENT_ORDERS,
        "top_parts": SQL_TOP_PARTS,
        "filter_orders": SQL_FILTER_ORDERS,
        "events_hourly": SQL_EVENTS_HOURLY,
        "distinct_segments": SQL_DISTINCT_SEGMENTS,
        "union_accounts": SQL_UNION_ACCOUNTS,
        "semi_join_orders": SQL_SEMI_JOIN_ORDERS,
        "anti_join_customers": SQL_ANTI_JOIN_CUSTOMERS,
        "top_orders_per_priority": SQL_TOP_ORDERS_PER_PRIORITY,
        "orders_pivot": SQL_ORDERS_PIVOT,
        "quantiles_quantity": SQL_QUANTILES_QUANTITY,
        "grouped_quantiles": SQL_GROUPED_QUANTILES,
        "doc_sample": SQL_DOC_SAMPLE,
        "events_running_sum": SQL_EVENTS_RUNNING_SUM,
        "customer_f_order_counts": SQL_CUSTOMER_F_ORDER_COUNTS,
        "name_distances": SQL_NAME_DISTANCES,
        "top_tokens": SQL_TOP_TOKENS,
        "tfidf_terms": SQL_TFIDF_TERMS,
        "ngram_repetition_docs": SQL_NGRAM_REPETITION,
        "dup_span_docs": SQL_DUP_SPANS,
        "license_scan_docs": SQL_LICENSE_SCAN,
        "quantile_filter_docs": SQL_QUANTILE_FILTER,
        "source_quota_docs": SQL_SOURCE_QUOTA,
        "decontam_docs": SQL_DECONTAM,
        "cross_neardup_docs": SQL_CROSS_NEARDUP,
        "line_stats_docs": SQL_LINE_STATS,
        "doc_sha256": SQL_DOC_SHA256,
        "exact_dedup_docs": SQL_EXACT_DEDUP_DOCS,
        "token_counts_docs": SQL_TOKEN_COUNTS,
        "doc_char_stats": SQL_DOC_CHAR_STATS,
        "embedding_neighbors": SQL_EMBEDDING_NEIGHBORS,
        "embedding_pair_cos": SQL_EMBEDDING_PAIR_COS,
        "embedding_topk": SQL_EMBEDDING_TOPK,
        # IVF at full probe is exactly brute force — same oracle, same result
        "ivf_topk": SQL_EMBEDDING_TOPK,
        "ngram_jaccard_exact": SQL_NGRAM_JACCARD_EXACT,
        "doc_quality": _sql_doc_quality(),
        "language_id_docs": _sql_language_id(),
        "embedding_neardup": SQL_EMBEDDING_NEARDUP,
        "event_sessions": SQL_EVENT_SESSIONS,
        "asof_orders": SQL_ASOF_ORDERS,
        "events_rolling": SQL_EVENTS_ROLLING,
        "event_pairs_range": SQL_EVENT_PAIRS_RANGE,
        "redact_pii_docs": SQL_REDACT_PII,
        "source_neardup": SQL_SOURCE_NEARDUP,
        "event_deltas": SQL_EVENT_DELTAS,
        "stratified_orders": SQL_STRATIFIED_ORDERS,
        "pack_docs": SQL_PACK_DOCS,
        "chunk_docs": SQL_CHUNK_DOCS,
        "shuffle_docs": SQL_SHUFFLE_DOCS,
        "stop_shingles": SQL_STOP_SHINGLES,
        "curate_docs": _sql_curate_docs(),
        "text_neardup_clusters": SQL_TEXT_NEARDUP_CLUSTERS,
        "cluster_reps": _sql_cluster_reps(),
        "event_props": SQL_EVENT_PROPS,
        "rollup_lineitem": SQL_ROLLUP_LINEITEM,
        "priority_mode_by_segment": SQL_PRIORITY_MODE,
        "supplier_name_agg": SQL_SUPPLIER_NAME_AGG,
        "price_p90_cont": SQL_PRICE_P90_CONT,
        "supplier_rank": SQL_SUPPLIER_RANK,
        "quantity_discount_moments": SQL_COMOMENTS,
        "dup_line_docs": SQL_DUP_LINES,
        "remove_dup_lines_docs": SQL_REMOVE_DUP_LINES,
        "heavy_event_types": SQL_HEAVY_EVENT_TYPES,
        "urgent_low_counts": SQL_URGENT_LOW_COUNTS,
        "order_price_ntile": SQL_ORDER_PRICE_NTILE,
        "priority_skew_join": SQL_PRIORITY_SKEW_JOIN,
        "bloom_semi_lineitem": SQL_BLOOM_SEMI_LINEITEM,
        "embedding_unnest": SQL_EMBEDDING_UNNEST,
        "sketch_quantiles_supplier": SQL_SKETCH_QUANTILES,
        "supplier_percent_rank": SQL_SUPPLIER_PERCENT_RANK,
        "grouped_price_median": SQL_GROUPED_PRICE_MEDIAN,
        "event_coverage": SQL_EVENT_COVERAGE,
        "pfd_orders": SQL_PFD_ORDERS,
        "column_profile_customer": SQL_COLUMN_PROFILE,
        "coltype_events": SQL_COLTYPE_EVENTS,
        "unpivot_lineitem": SQL_UNPIVOT_LINEITEM,
        "link_customer_nations": SQL_LINK_CUSTOMER_NATIONS,
        "novelty_customer_segments": SQL_NOVELTY_CUSTOMER_SEGMENTS,
        "html_tables_roundtrip": SQL_HTML_TABLES_ROUNDTRIP,
        "compound_split_parts": SQL_COMPOUND_SPLIT,
        "warc_tables_roundtrip": SQL_WARC_TABLES_ROUNDTRIP,
        "media_features": SQL_MEDIA_FEATURES,
        "semtab_tables": SQL_SEMTAB_TABLES,
        "wdc_tables": SQL_WDC_TABLES,
        "kb_search_customers": SQL_KB_SEARCH_CUSTOMERS,
        "integrate_customer_facts": SQL_INTEGRATE_CUSTOMER_FACTS,
        "triples_customer": SQL_TRIPLES_CUSTOMER,
    }
