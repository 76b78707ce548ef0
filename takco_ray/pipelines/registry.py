"""Generic config-driven pipeline: a TOML stage list over named datasets.

The reference resolves a TOML step list against ``TableSet`` methods with
signature-based config injection and per-step jsonl caches
(``takco/__init__.py:654-695``, ``chain_step``). Here the same shape is a
registry of OPS over named Ray Datasets:

    workdir = "/tmp/ckpt"            # optional: enables per-stage resume

    [[stage]]
    op = "read_parquet"
    path = "/data/documents.parquet"
    columns = ["doc_id", "text"]
    output = "docs"

    [[stage]]
    op = "exact_dedup"
    input = "docs"
    text_column = "text"
    id_column = "doc_id"
    output = "uniq"

    [[stage]]
    op = "write_parquet"
    input = "uniq"
    path = "/data/out"

Every stage with an ``output`` is checkpointed under ``workdir`` (Parquet +
lineage fingerprint chained through its inputs' fingerprints + the input
manifest for reads), so a rerun resumes from the first changed stage —
``chain_step`` semantics without the stale-cache footgun.
"""

from __future__ import annotations

import os
from collections.abc import Callable

import ray.data

from ..state import StageRunner, stage_fingerprint
from ..state.checkpoint import input_manifest, manifest_for_dir

OPS: dict[str, Callable] = {}


def op(name: str):
    def deco(f):
        OPS[name] = f
        return f

    return deco


def _ds(ctx, cfg, key="input"):
    name = cfg[key]
    if name not in ctx:
        raise KeyError(f"stage input {name!r} not produced by any earlier stage")
    return ctx[name]


def _join_parts() -> int:
    from ..util import default_join_partitions

    return default_join_partitions()


# ---- sources / sinks -----------------------------------------------------

@op("read_parquet")
def _read_parquet(ctx, cfg):
    return ray.data.read_parquet(cfg["path"], columns=cfg.get("columns"))


@op("read_csv")
def _read_csv(ctx, cfg):
    return ray.data.read_csv(cfg["path"])


@op("read_json")
def _read_json(ctx, cfg):
    return ray.data.read_json(cfg["path"])


@op("write_parquet")
def _write_parquet(ctx, cfg):
    # overwrite: a re-run sink replaces its output instead of appending a
    # second copy beside the previous run's files
    _ds(ctx, cfg).write_parquet(cfg["path"], mode="overwrite")
    return None


@op("write_shards")
def _write_shards(ctx, cfg):
    """Shard-partitioned training-output sink: epoch-shuffle the input by a
    Feistel key and write one parquet directory per shard
    (``path/shard=K/``). Each shard is a uniform pseudo-random sample of the
    corpus, so readers stream shards in any order and a failed writer run
    resumes by diffing existing ``shard=`` dirs; a reseed re-layouts without
    re-reading content beyond one projection."""
    from ..stages.relational import epoch_shuffle

    out = epoch_shuffle(
        _ds(ctx, cfg), cfg.get("id_column", "doc_id"),
        num_shards=int(cfg.get("num_shards", 64)),
        rounds=int(cfg.get("rounds", 4)),
        seed=int(cfg.get("seed", 0)),
    )
    out.write_parquet(cfg["path"], partition_cols=["shard"], mode="overwrite")
    return None


# ---- row-level transforms ------------------------------------------------

@op("filter")
def _filter(ctx, cfg):
    return _ds(ctx, cfg).filter(expr=cfg["expr"])


@op("select_columns")
def _select(ctx, cfg):
    return _ds(ctx, cfg).select_columns(cfg["columns"])


@op("limit")
def _limit(ctx, cfg):
    return _ds(ctx, cfg).limit(int(cfg["n"]))


@op("normalize_content")
def _normalize(ctx, cfg):
    from ..stages.normalize import normalize_content

    kw = {k: cfg[k] for k in ("content_column", "out_column", "strip_comments", "collapse_whitespace") if k in cfg}
    return normalize_content(_ds(ctx, cfg), **kw)


@op("unnest")
def _unnest(ctx, cfg):
    from ..stages.normalize import unnest_list

    return unnest_list(
        _ds(ctx, cfg), cfg["list_column"], cfg["id_column"],
        pos_name=cfg.get("pos_name", "pos"), value_name=cfg.get("value_name", "val"),
    )


@op("json_extract")
def _json_extract(ctx, cfg):
    from ..stages.normalize import json_extract

    # TOML shape: [stage.fields.<out>] key = "k"; type = "int64"
    fields = {
        out: (spec["key"], spec.get("type", "string"))
        for out, spec in dict(cfg["fields"]).items()
    }
    return json_extract(_ds(ctx, cfg), cfg.get("json_column", "props"), fields)


@op("fingerprint")
def _fingerprint(ctx, cfg):
    from ..stages.normalize import fingerprint

    return fingerprint(_ds(ctx, cfg))


# ---- dedup family --------------------------------------------------------

def _text_kw(cfg, extra=()):
    keys = ("text_column", "id_column") + tuple(extra)
    return {k: cfg[k] for k in keys if k in cfg}


@op("exact_dedup")
def _exact_dedup(ctx, cfg):
    from ..stages import dedup

    return dedup.exact_dedup(_ds(ctx, cfg), **_text_kw(cfg))


@op("minhash_dedup")
def _minhash_dedup(ctx, cfg):
    from ..stages import dedup

    return dedup.minhash_dedup(
        _ds(ctx, cfg),
        **_text_kw(cfg, ("num_perm", "num_bands", "shingle_k", "seed", "threshold", "max_block_size")),
    )


@op("simhash_dedup")
def _simhash_dedup(ctx, cfg):
    from ..stages import dedup

    return dedup.simhash_dedup(_ds(ctx, cfg), **_text_kw(cfg, ("seed",)))


@op("ngram_jaccard_pairs")
def _ngram_jaccard(ctx, cfg):
    from ..stages import dedup

    return dedup.ngram_jaccard_pairs(
        _ds(ctx, cfg), **_text_kw(cfg, ("shingle_k", "threshold"))
    )


# ---- text analysis -------------------------------------------------------

@op("quality_scores")
def _quality(ctx, cfg):
    from ..stages import textstats

    return textstats.quality_scores(_ds(ctx, cfg), **_text_kw(cfg))


@op("language_id")
def _language_id(ctx, cfg):
    from ..stages import textstats

    return textstats.language_id(_ds(ctx, cfg), **_text_kw(cfg))


@op("token_counts")
def _token_counts(ctx, cfg):
    from ..stages import textstats

    return textstats.token_counts(_ds(ctx, cfg), **_text_kw(cfg))


@op("fingerprints")
def _fingerprints(ctx, cfg):
    from ..stages import textstats

    return textstats.fingerprints(_ds(ctx, cfg), **_text_kw(cfg))


# ---- relational ----------------------------------------------------------

@op("join")
def _join(ctx, cfg):
    from ..util import join_remote_args

    right = _ds(ctx, cfg, "right")
    parts = int(cfg["num_partitions"]) if "num_partitions" in cfg else _join_parts()
    return _ds(ctx, cfg).join(
        right,
        join_type=cfg.get("join_type", "inner"),
        num_partitions=parts,
        on=tuple(cfg["on"]),
        right_on=tuple(cfg["right_on"]) if "right_on" in cfg else None,
        aggregator_ray_remote_args=join_remote_args(parts),
    )


@op("union")
def _union(ctx, cfg):
    return _ds(ctx, cfg).union(_ds(ctx, cfg, "other"))


@op("incremental_er")
def _incremental_er(ctx, cfg):
    """Attach new files to an existing run's clusters: `input` = the new
    corpus path is given via `corpus`; `base_labels` / `base_signatures`
    name earlier-stage datasets (e.g. read from a prior run's checkpoints)."""
    from .er import ERConfig, incremental_er

    er_kwargs = {k: v for k, v in cfg.items() if k in ERConfig.__dataclass_fields__}
    out = incremental_er(
        cfg["corpus"],
        _ds(ctx, {"input": cfg["base_labels"]}),
        _ds(ctx, {"input": cfg["base_signatures"]}),
        ERConfig(**er_kwargs) if er_kwargs else None,
    )
    return out["labels"]


@op("refine_clusters")
def _refine_clusters(ctx, cfg):
    from ..stages.components import refine_clusters

    return refine_clusters(
        _ds(ctx, cfg), _ds(ctx, cfg, "edges"),
        min_score=float(cfg["min_score"]),
        num_partitions=int(cfg.get("num_partitions", 64)),
    )


@op("semi_join")
def _semi_join(ctx, cfg):
    from ..stages.relational import semi_join

    return semi_join(
        _ds(ctx, cfg), _ds(ctx, cfg, "right"), on=cfg["on"],
        right_on=cfg.get("right_on"),
        num_partitions=cfg.get("num_partitions"),
    )


@op("anti_join")
def _anti_join(ctx, cfg):
    from ..stages.relational import anti_join

    return anti_join(
        _ds(ctx, cfg), _ds(ctx, cfg, "right"), on=cfg["on"],
        right_on=cfg.get("right_on"),
        num_partitions=cfg.get("num_partitions"),
    )


@op("top_n_per_group")
def _top_n_per_group(ctx, cfg):
    from ..stages.relational import top_n_per_group

    return top_n_per_group(
        _ds(ctx, cfg), group_col=cfg["group_col"], order_col=cfg["order_col"],
        n=int(cfg.get("n", 10)), tiebreak_col=cfg["tiebreak_col"],
        descending=bool(cfg.get("descending", True)),
    )


@op("pivot_counts")
def _pivot_counts(ctx, cfg):
    from ..stages.relational import pivot_counts

    return pivot_counts(
        _ds(ctx, cfg), index_col=cfg["index_col"], pivot_col=cfg["pivot_col"],
        categories=list(cfg["categories"]),
    )


@op("exact_quantiles")
def _exact_quantiles(ctx, cfg):
    from ..stages.relational import exact_quantiles

    return exact_quantiles(_ds(ctx, cfg), cfg["column"], [float(q) for q in cfg["qs"]])


@op("hash_sample")
def _hash_sample(ctx, cfg):
    from ..stages.relational import hash_sample

    return hash_sample(
        _ds(ctx, cfg), cfg["id_column"],
        modulus=int(cfg.get("modulus", 1000)), keep=int(cfg.get("keep", 100)),
    )


@op("grouped_quantiles")
def _grouped_quantiles(ctx, cfg):
    from ..stages.relational import grouped_quantiles

    return grouped_quantiles(
        _ds(ctx, cfg), cfg["column"], cfg["group_col"], [float(q) for q in cfg["qs"]]
    )


@op("tfidf_top_terms")
def _tfidf_top_terms(ctx, cfg):
    return textstats.tfidf_top_terms(
        _ds(ctx, cfg), cfg.get("text_column", "text"),
        cfg.get("id_column", "doc_id"), k=int(cfg.get("k", 5)),
    )


@op("approx_distinct")
def _approx_distinct(ctx, cfg):
    from ..stages.relational import approx_distinct

    return approx_distinct(
        _ds(ctx, cfg), key_col=cfg["key_column"], group_col=cfg["group_column"],
        p=int(cfg.get("p", 12)),
    )


@op("global_token_topk")
def _global_token_topk(ctx, cfg):
    return textstats.global_token_topk(
        _ds(ctx, cfg), cfg.get("text_column", "text"), k=int(cfg.get("k", 20))
    )


@op("ngram_repetition")
def _ngram_repetition(ctx, cfg):
    return textstats.ngram_repetition(
        _ds(ctx, cfg), cfg.get("text_column", "text"),
        cfg.get("id_column", "doc_id"), shingle_k=int(cfg.get("shingle_k", 3)),
    )


@op("quantile_filter")
def _quantile_filter(ctx, cfg):
    from ..stages.relational import quantile_filter

    return quantile_filter(
        _ds(ctx, cfg), cfg["column"], q=float(cfg.get("q", 0.25)),
        keep=cfg.get("keep", "ge"),
    )


@op("license_scan")
def _license_scan(ctx, cfg):
    from ..stages import textstats

    return textstats.license_scan(
        _ds(ctx, cfg), cfg.get("text_column", "text"),
        cfg.get("id_column", "doc_id"),
        header_chars=int(cfg.get("header_chars", 2048)),
    )


@op("dup_lines")
def _dup_lines(ctx, cfg):
    from ..stages.dedup import cross_doc_dup_lines

    return cross_doc_dup_lines(
        _ds(ctx, cfg), cfg.get("text_column", "text"),
        cfg.get("id_column", "doc_id"), min_df=int(cfg.get("min_df", 2)),
    )


@op("remove_dup_lines")
def _remove_dup_lines(ctx, cfg):
    from ..stages.dedup import remove_dup_lines

    return remove_dup_lines(
        _ds(ctx, cfg), cfg.get("text_column", "text"),
        cfg.get("id_column", "doc_id"), min_df=int(cfg.get("min_df", 2)),
    )


@op("dup_spans")
def _dup_spans(ctx, cfg):
    from ..stages.dedup import cross_doc_dup_spans

    return cross_doc_dup_spans(
        _ds(ctx, cfg), cfg.get("text_column", "text"),
        cfg.get("id_column", "doc_id"), shingle_k=int(cfg.get("shingle_k", 3)),
        min_df=int(cfg.get("min_df", 2)),
    )


@op("semantic_dedup")
def _semantic_dedup(ctx, cfg):
    from ..stages.dedup import semantic_dedup

    return semantic_dedup(
        _ds(ctx, cfg), id_column=cfg.get("id_column", "vec_id"),
        emb_column=cfg.get("emb_column", "embedding"),
        threshold=float(cfg.get("threshold", 0.95)),
        n_cells=int(cfg.get("n_cells", 64)),
        seed=int(cfg.get("seed", 17)),
    )


@op("decontaminate")
def _decontaminate(ctx, cfg):
    """Benchmark side = another named dataset in the pipeline (tiny by
    contract); its shingle set is collected once and broadcast."""
    import ray as _ray

    from ..stages.decontam import collect_benchmark_shingles, decontaminate

    k = int(cfg.get("shingle_k", 3))
    bench = collect_benchmark_shingles(
        _ds(ctx, cfg, "benchmark"), cfg.get("text_column", "text"), shingle_k=k
    )
    return decontaminate(
        _ds(ctx, cfg), cfg.get("text_column", "text"),
        cfg.get("id_column", "doc_id"), _ray.put(bench), shingle_k=k,
    )


@op("interval_coverage")
def _interval_coverage(ctx, cfg):
    from ..stages.temporal import interval_coverage

    return interval_coverage(
        _ds(ctx, cfg), cfg["key_column"], cfg["start_column"], cfg["end_column"],
    )


@op("sessionize")
def _sessionize(ctx, cfg):
    from ..stages.temporal import sessionize

    kw = {k: int(cfg[k]) for k in ("gap_us", "num_partitions") if k in cfg}
    if "session_column" in cfg:
        kw["session_column"] = cfg["session_column"]
    return sessionize(
        _ds(ctx, cfg), cfg["key_column"], cfg["ts_column"], cfg["id_column"], **kw
    )


@op("asof_join")
def _asof_join(ctx, cfg):
    from ..stages.temporal import asof_join

    return asof_join(
        _ds(ctx, cfg),
        _ds(ctx, cfg, "right"),
        left_key=cfg["left_key"],
        right_key=cfg["right_key"],
        left_ts=cfg["left_ts"],
        right_ts=cfg["right_ts"],
        left_id=cfg["left_id"],
        right_id=cfg["right_id"],
        right_value=cfg.get("right_value"),
        num_partitions=int(cfg["num_partitions"]) if "num_partitions" in cfg else None,
    )


@op("range_join")
def _range_join(ctx, cfg):
    from ..stages.temporal import range_join

    return range_join(
        _ds(ctx, cfg),
        _ds(ctx, cfg, "right"),
        left_key=cfg["left_key"],
        right_key=cfg["right_key"],
        left_ts=cfg["left_ts"],
        right_ts=cfg["right_ts"],
        left_id=cfg["left_id"],
        right_id=cfg["right_id"],
        before_us=int(cfg.get("before_us", 0)),
        after_us=int(cfg.get("after_us", 0)),
        left_id_out=cfg.get("left_id_out"),
        right_id_out=cfg.get("right_id_out"),
        num_partitions=int(cfg["num_partitions"]) if "num_partitions" in cfg else None,
    )


@op("grouped_running_sum")
def _grouped_running_sum(ctx, cfg):
    from ..stages.temporal import grouped_running_sum

    return grouped_running_sum(
        _ds(ctx, cfg), cfg["key_column"], cfg["ts_column"], cfg["id_column"],
        cfg["value_column"], out_column=cfg.get("out_column", "running_sum"),
        units=int(cfg["units"]) if "units" in cfg else None,
        num_partitions=int(cfg["num_partitions"]) if "num_partitions" in cfg else None,
    )


@op("rolling_window_count")
def _rolling_window_count(ctx, cfg):
    from ..stages.temporal import rolling_window_count

    kw = {k: int(cfg[k]) for k in ("window_us", "num_partitions") if k in cfg}
    if "count_column" in cfg:
        kw["count_column"] = cfg["count_column"]
    return rolling_window_count(
        _ds(ctx, cfg), cfg["key_column"], cfg["ts_column"], cfg["id_column"], **kw
    )


@op("lag_deltas")
def _lag_deltas(ctx, cfg):
    from ..stages.temporal import lag_deltas

    return lag_deltas(
        _ds(ctx, cfg), cfg["key_column"], cfg["ts_column"], cfg["id_column"],
        delta_column=cfg.get("delta_column", "delta_us"),
        num_partitions=int(cfg["num_partitions"]) if "num_partitions" in cfg else None,
    )


@op("stratified_sample")
def _stratified_sample(ctx, cfg):
    from ..stages.relational import stratified_sample

    return stratified_sample(
        _ds(ctx, cfg), cfg["group_col"], cfg["id_col"], n=int(cfg.get("n", 10))
    )


@op("rollup")
def _rollup(ctx, cfg):
    from ..stages.relational import rollup_aggregate

    return rollup_aggregate(
        _ds(ctx, cfg), list(cfg["keys"]), cfg["value_col"],
        sum_name=cfg.get("sum_name", "value_sum"),
        total_label=cfg.get("total_label", "ALL"),
    )


@op("grouped_mode")
def _grouped_mode(ctx, cfg):
    from ..stages.relational import grouped_mode

    return grouped_mode(_ds(ctx, cfg), cfg["group_col"], cfg["value_col"])


@op("string_agg")
def _string_agg(ctx, cfg):
    from ..stages.relational import string_agg_per_group

    return string_agg_per_group(
        _ds(ctx, cfg), cfg["group_col"], cfg["value_col"], sep=cfg.get("sep", ",")
    )


@op("quantile_cont")
def _quantile_cont(ctx, cfg):
    from ..stages.relational import quantile_cont_scaled

    return quantile_cont_scaled(
        _ds(ctx, cfg), cfg["column"], int(cfg["q_num"]), int(cfg["q_den"]),
        cfg.get("out_name", "quantile_scaled"),
    )


@op("dense_rank")
def _dense_rank(ctx, cfg):
    from ..stages.relational import dense_rank

    return dense_rank(
        _ds(ctx, cfg), cfg["column"], out_col=cfg.get("out_col", "rank"),
        descending=bool(cfg.get("descending", False)),
        num_buckets=int(cfg.get("num_buckets", 256)),
    )


@op("comoments")
def _comoments(ctx, cfg):
    from ..stages.relational import comoment_sums

    return comoment_sums(_ds(ctx, cfg), cfg["x_col"], cfg["y_col"])


@op("bloom_semi_join")
def _bloom_semi_join(ctx, cfg):
    from ..stages.relational import bloom_semi_join

    return bloom_semi_join(
        _ds(ctx, cfg), _ds(ctx, cfg, "right"), cfg["on"],
        right_on=cfg.get("right_on"),
        bits_per_key=int(cfg.get("bits_per_key", 10)),
        num_partitions=int(cfg["num_partitions"]) if "num_partitions" in cfg else None,
    )


@op("skew_join")
def _skew_join(ctx, cfg):
    from ..stages.relational import skew_join

    return skew_join(
        _ds(ctx, cfg), _ds(ctx, cfg, "right"), cfg["on"],
        right_on=cfg.get("right_on"),
        hot_threshold=int(cfg.get("hot_threshold", 100000)),
        num_partitions=int(cfg["num_partitions"]) if "num_partitions" in cfg else None,
    )


@op("row_number")
def _row_number(ctx, cfg):
    from ..stages.relational import global_row_number

    return global_row_number(
        _ds(ctx, cfg), cfg["value_col"], cfg["id_col"],
        out_col=cfg.get("out_col", "rn"),
        num_buckets=int(cfg.get("num_buckets", 256)),
    )


@op("sketch_quantiles")
def _sketch_quantiles(ctx, cfg):
    from ..stages.relational import sketch_quantiles

    return sketch_quantiles(
        _ds(ctx, cfg), cfg["column"], [float(q) for q in cfg["qs"]],
        cap=int(cfg.get("cap", 4096)),
    )


@op("percent_rank")
def _percent_rank(ctx, cfg):
    from ..stages.relational import percent_rank_scaled

    return percent_rank_scaled(
        _ds(ctx, cfg), cfg["value_col"], cfg["id_col"],
        scale=int(cfg.get("scale", 1_000_000)),
        num_buckets=int(cfg.get("num_buckets", 256)),
    )


@op("grouped_quantile_cont")
def _grouped_quantile_cont(ctx, cfg):
    from ..stages.relational import grouped_quantile_cont

    return grouped_quantile_cont(
        _ds(ctx, cfg), cfg["column"], cfg["group_col"],
        int(cfg["q_num"]), int(cfg["q_den"]),
        out_name=cfg.get("out_name", "qcont_scaled"),
    )


@op("heavy_hitters")
def _heavy_hitters(ctx, cfg):
    from ..stages.relational import heavy_hitters

    return heavy_hitters(
        _ds(ctx, cfg), cfg["column"], k=int(cfg.get("k", 16)),
        num_sketch=int(cfg.get("num_sketch", 256)),
    )


@op("redact_pii")
def _redact_pii(ctx, cfg):
    from ..stages.redact import DEFAULT_PATTERNS, redact_pii

    pats = None
    if "patterns" in cfg:
        pats = [tuple(p) for p in cfg["patterns"]]  # [[name, re2, repl], ...]
    return redact_pii(
        _ds(ctx, cfg), cfg.get("text_column", "text"),
        cfg.get("id_column", "doc_id"), patterns=pats or DEFAULT_PATTERNS,
        out_column=cfg.get("out_column", "text_redacted"),
    )


@op("group_set_jaccard")
def _group_set_jaccard(ctx, cfg):
    from ..stages.dedup import group_set_jaccard

    return group_set_jaccard(
        _ds(ctx, cfg), cfg["group_column"], cfg.get("text_column", "text"),
        shingle_k=int(cfg.get("shingle_k", 3)),
        threshold_millis=int(cfg.get("threshold_millis", 300)),
        num_partitions=int(cfg["num_partitions"]) if "num_partitions" in cfg else None,
    )


@op("group_minhash_neardup")
def _group_minhash_neardup(ctx, cfg):
    from ..stages.dedup import group_minhash_neardup

    return group_minhash_neardup(
        _ds(ctx, cfg), cfg["group_column"], cfg.get("text_column", "text"),
        shingle_k=int(cfg.get("shingle_k", 3)),
        threshold_millis=int(cfg.get("threshold_millis", 200)),
        num_perm=int(cfg.get("num_perm", 128)),
        num_bands=int(cfg.get("num_bands", 32)),
        num_partitions=int(cfg["num_partitions"]) if "num_partitions" in cfg else None,
    )


@op("cluster_representatives")
def _cluster_representatives(ctx, cfg):
    from ..stages.dedup import cluster_representatives

    return cluster_representatives(
        _ds(ctx, cfg), _ds(ctx, cfg, key="signals"),
        label_column=cfg.get("label_column", "cluster_id"),
        id_column=cfg.get("id_column", "file_id"),
        signal_id_column=cfg.get("signal_id_column", "id"),
        order_column=cfg.get("order_column", "quality_u"),
        num_partitions=int(cfg["num_partitions"]) if "num_partitions" in cfg else None,
    )


@op("text_neardup_clusters")
def _text_neardup_clusters(ctx, cfg):
    from ..stages.dedup import text_neardup_clusters

    return text_neardup_clusters(
        _ds(ctx, cfg), cfg.get("text_column", "text"),
        cfg.get("id_column", "doc_id"),
        shingle_k=int(cfg.get("shingle_k", 3)),
        threshold=float(cfg.get("threshold", 0.5)),
        num_partitions=int(cfg["num_partitions"]) if "num_partitions" in cfg else None,
    )


@op("curate_docs")
def _curate_docs(ctx, cfg):
    import ray as _ray

    from ..stages.curate import curate_docs
    from ..stages.decontam import collect_benchmark_shingles

    k = int(cfg.get("shingle_k", 3))
    bench_ds = _ds(ctx, cfg, key="benchmark") if "benchmark" in cfg else None
    if bench_ds is not None:
        bench = collect_benchmark_shingles(
            bench_ds, cfg.get("text_column", "text"), shingle_k=k
        )
    else:
        import numpy as np

        bench = np.zeros(0, dtype=np.uint64)
    return curate_docs(
        _ds(ctx, cfg), cfg.get("text_column", "text"),
        cfg.get("id_column", "doc_id"), _ray.put(bench),
        quality_threshold_u=int(cfg.get("quality_threshold_u", 400_000)),
        shingle_k=k,
        num_partitions=int(cfg["num_partitions"]) if "num_partitions" in cfg else None,
    )


@op("stop_shingles")
def _stop_shingles(ctx, cfg):
    from ..stages.textstats import stop_shingles

    return stop_shingles(
        _ds(ctx, cfg), cfg.get("text_column", "text"),
        cfg.get("id_column", "doc_id"),
        shingle_k=int(cfg.get("shingle_k", 3)),
        top_k=int(cfg.get("top_k", 20)),
    )


@op("epoch_shuffle")
def _epoch_shuffle(ctx, cfg):
    from ..stages.relational import epoch_shuffle

    return epoch_shuffle(
        _ds(ctx, cfg), cfg.get("id_column", "doc_id"),
        num_shards=int(cfg.get("num_shards", 64)),
        rounds=int(cfg.get("rounds", 4)),
        seed=int(cfg.get("seed", 0)),
    )


@op("pack_sequences")
def _pack_sequences(ctx, cfg):
    from ..stages.pack import pack_sequences

    return pack_sequences(
        _ds(ctx, cfg), cfg.get("id_column", "doc_id"),
        cfg.get("text_column", "text"), seq_len=int(cfg.get("seq_len", 512)),
        num_buckets=int(cfg["num_buckets"]) if "num_buckets" in cfg else None,
    )


@op("chunk_docs")
def _chunk_docs(ctx, cfg):
    from ..stages.pack import chunk_docs

    return chunk_docs(
        _ds(ctx, cfg), cfg.get("text_column", "text"),
        cfg.get("id_column", "doc_id"), size=int(cfg.get("size", 400)),
        overlap=int(cfg.get("overlap", 0)),
    )


@op("line_stats")
def _line_stats(ctx, cfg):
    from ..stages.textstats import line_stats

    return line_stats(
        _ds(ctx, cfg), cfg.get("text_column", "text"),
        cfg.get("id_column", "doc_id"),
    )


@op("quantize_embeddings")
def _quantize_embeddings(ctx, cfg):
    from ..stages.ann import quantize_embeddings

    return quantize_embeddings(
        _ds(ctx, cfg), id_column=cfg.get("id_column", "vec_id"),
        emb_column=cfg.get("emb_column", "embedding"),
    )


@op("cross_neardup")
def _cross_neardup(ctx, cfg):
    from ..stages.dedup import cross_neardup

    return cross_neardup(
        _ds(ctx, cfg, key="input_a"), _ds(ctx, cfg, key="input_b"),
        cfg.get("text_column", "text"), cfg.get("id_column", "doc_id"),
        shingle_k=int(cfg.get("shingle_k", 3)),
        threshold=float(cfg.get("threshold", 0.5)),
    )


@op("winnow_neardup")
def _winnow_neardup(ctx, cfg):
    from ..stages.dedup import winnow_neardup

    return winnow_neardup(
        _ds(ctx, cfg), cfg.get("text_column", "text"),
        cfg.get("id_column", "doc_id"), window=int(cfg.get("window", 8)),
        threshold=float(cfg.get("threshold", 0.5)),
    )


# ---- composite pipelines -------------------------------------------------

@op("er")
def _er(ctx, cfg):
    from .er import ERConfig, er_pipeline

    er_kwargs = {k: v for k, v in cfg.items() if k in ERConfig.__dataclass_fields__}
    if "scorer_concurrency" in er_kwargs and isinstance(er_kwargs["scorer_concurrency"], list):
        er_kwargs["scorer_concurrency"] = tuple(er_kwargs["scorer_concurrency"])
    result = er_pipeline(
        cfg["corpus"], ERConfig(**er_kwargs), checkpoint_root=cfg.get("er_workdir")
    )
    if cfg.get("edges_output"):
        # second output: the scored edge list, for downstream refinement
        # (refine_modularity levels > 1, refine_clusters min_score cuts)
        ctx[cfg["edges_output"]] = result["edges"]
    return result["labels"]


@op("er_signatures")
def _er_signatures(ctx, cfg):
    """Signature stage only (fingerprint + MinHash bands) over `corpus` —
    checkpoint it under a workdir to feed later `incremental_er` stages
    without re-reading content."""
    from .er import ERConfig, signatures_for_paths

    er_kwargs = {k: v for k, v in cfg.items() if k in ERConfig.__dataclass_fields__}
    return signatures_for_paths([cfg["corpus"]], ERConfig(**er_kwargs))


@op("rechunk_clusters")
def _rechunk_clusters(ctx, cfg):
    from ..stages.components import rechunk_clusters

    return rechunk_clusters(
        _ds(ctx, cfg),
        int(cfg["max_cluster_size"]),
        int(cfg.get("num_partitions", 64)),
    )


@op("cluster_manifest")
def _cluster_manifest(ctx, cfg):
    """One row per cluster: size, rep_id, member sample, quality range,
    distinct-source count (reference merge-step manifest analog,
    takco/cluster/cluster.py:532-649). Optional ``signals`` input names a
    (id, quality) dataset for merit-based rep + quality range."""
    from ..stages.components import cluster_manifest

    kw = {
        k: cfg[k]
        for k in (
            "label_column",
            "id_column",
            "signal_id_column",
            "quality_column",
            "source_column",
            "sample_size",
            "num_partitions",
        )
        if k in cfg
    }
    signals = _ds(ctx, cfg, "signals") if "signals" in cfg else None
    return cluster_manifest(_ds(ctx, cfg), signals=signals, **kw)


@op("score_clusters")
def _score_clusters(ctx, cfg):
    from ..stages.report import score_clusters

    kw = {
        k: cfg[k]
        for k in ("id_column", "label_column", "gold_column", "num_partitions")
        if k in cfg
    }
    return score_clusters(_ds(ctx, cfg), _ds(ctx, cfg, "gold"), **kw)


@op("split_compounds")
def _split_compounds(ctx, cfg):
    from ..functions.compound import compound_parts_stage

    return compound_parts_stage(
        _ds(ctx, cfg), cfg["column"],
        out_col=cfg.get("out_col", "parts"), n_col=cfg.get("n_col", "n_parts"),
    )


@op("extract_html_tables")
def _extract_html_tables(ctx, cfg):
    from ..sources.htmltables import extract_tables_stage

    return extract_tables_stage(
        _ds(ctx, cfg), cfg["html_col"], cfg["id_col"],
        split_subheaders=bool(cfg.get("split_subheaders", False)),
    )


@op("read_warc")
def _read_warc(ctx, cfg):
    """WARC shards → (path, url, about, html) pages (reference
    ``WarcPages.load``, pages.py:65-104). ``paths`` is an explicit list or
    a directory scanned for ``*.warc`` / ``*.warc.gz``."""
    import glob as _glob
    import os as _os

    from ..sources.warc import read_warc_pages

    paths = cfg.get("paths")
    if not paths:
        root = cfg["dir"]
        paths = sorted(
            p
            for pat in ("*.warc.gz", "*.warc")
            for p in _glob.glob(_os.path.join(root, pat))
        )
    return read_warc_pages(
        list(paths),
        records_per_block=int(cfg.get("records_per_block", 4096)),
        on_error=cfg.get("on_error", "raise"),
    )


@op("load_semtab")
def _load_semtab(ctx, cfg):
    from ..sources.gold import load_semtab_tables

    return load_semtab_tables(cfg["root"])


@op("load_semtab_cea")
def _load_semtab_cea(ctx, cfg):
    """CEA gold targets (small csv) as a Dataset."""
    import ray.data as _rd

    from ..sources.gold import load_semtab_cea

    return _rd.from_arrow(load_semtab_cea(cfg["path"]))


@op("explode_table_cells")
def _explode_table_cells(ctx, cfg):
    """Loader output (table, rows_json[, entcols]) → one row per body cell
    ``(table, row_idx, col_idx, celltext)``; ``entcols_only`` restricts to
    the entity-column heuristic's picks."""
    import json as _json

    import pyarrow as pa

    entcols_only = bool(cfg.get("entcols_only", False))

    def fn(t: pa.Table) -> pa.Table:
        tables, ris, cis, texts = [], [], [], []
        has_ec = "entcols" in t.schema.names
        ec_col = t.column("entcols").to_pylist() if has_ec else None
        for i, (name, rows_json) in enumerate(
            zip(t.column("table").to_pylist(), t.column("rows_json").to_pylist())
        ):
            allowed = set(ec_col[i]) if (entcols_only and has_ec) else None
            for ri, row in enumerate(_json.loads(rows_json or "[]")):
                for ci, cell in enumerate(row):
                    if allowed is not None and ci not in allowed:
                        continue
                    tables.append(name)
                    ris.append(ri)
                    cis.append(ci)
                    texts.append(cell)
        return pa.table(
            {
                "table": pa.array(tables, type=pa.string()),
                "row_idx": pa.array(ris, type=pa.int64()),
                "col_idx": pa.array(cis, type=pa.int64()),
                "celltext": pa.array(texts, type=pa.string()),
            }
        )

    return _ds(ctx, cfg).map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


@op("load_wdc")
def _load_wdc(ctx, cfg):
    import glob as _glob

    from ..sources.gold import load_wdc_tables

    fnames = cfg.get("paths") or sorted(_glob.glob(cfg["glob"]))
    return load_wdc_tables(list(fnames))


@op("refine_modularity")
def _refine_modularity(ctx, cfg):
    """Within-cluster (multi-level) Louvain refinement; ``levels`` > 1 runs
    full multilevel (phase-1 moves + aggregation)."""
    from ..stages.components import refine_clusters_modularity

    return refine_clusters_modularity(
        _ds(ctx, cfg), _ds(ctx, cfg, "edges"),
        num_partitions=int(cfg.get("num_partitions", 64)),
        resolution=float(cfg.get("resolution", 1.0)),
        min_refine_size=int(cfg.get("min_refine_size", 3)),
        levels=int(cfg.get("levels", 1)),
    )


@op("media_features")
def _media_features(ctx, cfg):
    from ..stages.multimodal import extract_media_features

    return extract_media_features(
        _ds(ctx, cfg),
        kind_filter=cfg.get("kind_filter"),
        batch_size=int(cfg.get("batch_size", 64)),
    )


@op("build_sqlite_kb")
def _build_sqlite_kb(ctx, cfg):
    """Sink: distributed-reduce (uri,label[,score]) rows into the
    reference's label(uri,txt,score) SQLite layout (ST5)."""
    from ..stages.kbsearch import build_sqlite_kb

    build_sqlite_kb(
        _ds(ctx, cfg), cfg["db_path"], cfg["uri_col"], cfg["label_col"],
        score_col=cfg.get("score_col"),
        default_score=float(cfg.get("default_score", 1.0)),
    )
    return None


@op("kb_search")
def _kb_search(ctx, cfg):
    """Actor-pool SQLite KB probe with the part-split fallback (ST5)."""
    from ..stages.kbsearch import search_kb

    return search_kb(
        _ds(ctx, cfg), cfg["mention_col"], cfg["db_path"],
        parts=bool(cfg.get("parts", True)),
        batch_size=int(cfg.get("batch_size", 4096)),
    )


@op("integrate_facts")
def _integrate_facts(ctx, cfg):
    """N-ary fact matching → column-property counts (M17's KB arm)."""
    from ..stages.linking import integrate_nary

    return integrate_nary(
        _ds(ctx, cfg), _ds(ctx, cfg, "facts"),
        row_col=cfg.get("row_col", "row_idx"),
        col_col=cfg.get("col_col", "col_idx"),
        text_col=cfg.get("text_col", "celltext"),
        ent_col=cfg.get("ent_col", "entity_uri"),
        num_partitions=cfg.get("num_partitions"),
    )


@op("corpus_split_compounds")
def _corpus_split_compounds(ctx, cfg):
    """Structural + corpus-learned identifier splitting (ST6's offline
    analog: token frequencies from a corpus Dataset are the model)."""
    from ..functions.compound import build_split_vocab, corpus_split_stage

    vocab_ref = build_split_vocab(
        _ds(ctx, cfg, "corpus"), cfg.get("corpus_text_col", "text"),
        top_k=int(cfg.get("top_k", 100_000)),
    )
    return corpus_split_stage(
        _ds(ctx, cfg), cfg["column"], vocab_ref,
        batch_size=int(cfg.get("batch_size", 4096)),
    )


@op("emit_triples")
def _emit_triples(ctx, cfg):
    """Annotated-table relations → triples (reference yield_triples)."""
    from ..stages.triples import emit_triples

    return emit_triples(
        _ds(ctx, cfg),
        _ds(ctx, cfg, "entities"),
        classes=_ds(ctx, cfg, "classes") if "classes" in cfg else None,
        properties=_ds(ctx, cfg, "properties") if "properties" in cfg else None,
        table_col=cfg.get("table_col", "table"),
        include_type=bool(cfg.get("include_type", True)),
        include_label=bool(cfg.get("include_label", True)),
        num_partitions=cfg.get("num_partitions"),
    )


@op("score_annotations")
def _score_annotations(ctx, cfg):
    """Annotation-set P/R/F1 vs gold (reference `classification`,
    score.py:8-40), with only_annotated / any_annotated slicing."""
    from ..stages.report import score_annotations

    return score_annotations(
        _ds(ctx, cfg), _ds(ctx, cfg, "gold"),
        list(cfg["target_cols"]), cfg.get("label_col", "uri"),
        only_annotated=bool(cfg.get("only_annotated", False)),
        any_annotated=bool(cfg.get("any_annotated", False)),
        num_partitions=cfg.get("num_partitions"),
    )


@op("build_duckdb")
def _build_duckdb(ctx, cfg):
    from ..sources.dbsink import build_duckdb

    build_duckdb(
        _ds(ctx, cfg), cfg["db_path"], cfg["table_name"],
        mode=cfg.get("mode", "view"), shard_dir=cfg.get("shard_dir"),
    )


@op("build_sqlite_labels")
def _build_sqlite_labels(ctx, cfg):
    from ..sources.dbsink import build_sqlite_labels

    build_sqlite_labels(
        _ds(ctx, cfg), cfg["db_path"], cfg["label_col"], cfg["id_col"],
        table_name=cfg.get("table_name", "labels"),
    )


@op("link_cells")
def _link_cells(ctx, cfg):
    import pyarrow as pa

    from ..stages.linking import build_label_index, link_cells

    kb_ds = _ds(ctx, cfg, "kb")
    kb = pa.Table.from_pandas(kb_ds.to_pandas())
    ref = build_label_index(kb, cfg["label_col"], cfg["id_col"])
    return link_cells(
        _ds(ctx, cfg), cfg["mention_col"], ref,
        entity_col=cfg.get("entity_col", "entity_id"),
        missing_id=int(cfg.get("missing_id", -1)),
    )


@op("novelty")
def _novelty(ctx, cfg):
    from ..stages.linking import novelty_classify, novelty_counts

    classified = novelty_classify(
        _ds(ctx, cfg), _ds(ctx, cfg, "kb"),
        key_cols=list(cfg["key_cols"]), val_col=cfg["val_col"],
    )
    return novelty_counts(classified) if cfg.get("counts", False) else classified


@op("melt")
def _melt(ctx, cfg):
    import pyarrow as pa

    from ..stages.reshape import melt

    vt = cfg.get("value_type")
    return melt(
        _ds(ctx, cfg),
        id_cols=list(cfg["id_cols"]),
        value_cols=list(cfg["value_cols"]),
        var_name=cfg.get("var_name", "variable"),
        value_name=cfg.get("value_name", "value"),
        value_type={"int64": pa.int64(), "string": pa.string()}.get(vt) if vt else None,
    )


@op("pfd_scores")
def _pfd_scores(ctx, cfg):
    from ..stages.profile import pfd_scores

    return pfd_scores(
        _ds(ctx, cfg), cfg["det_col"], list(cfg["dep_cols"]),
        num_partitions=int(cfg.get("num_partitions", 64)),
    )


@op("column_profile")
def _column_profile(ctx, cfg):
    from ..stages.profile import column_profile

    return column_profile(_ds(ctx, cfg), list(cfg["columns"]))


@op("coltype_votes")
def _coltype_votes(ctx, cfg):
    from ..stages.profile import coltype_votes

    return coltype_votes(_ds(ctx, cfg), list(cfg["columns"]))


# ---- executor ------------------------------------------------------------

def run_pipeline(cfg: dict) -> dict:
    """Execute a ``[[stage]]`` list; returns ``{"datasets": {...}, "metrics": {...}}``.

    Stage fingerprints chain: op + kwargs + input-dataset fingerprints (+
    file manifest for reads), so any upstream change re-runs exactly the
    affected suffix of the pipeline. Stages without an ``output`` name
    (sinks) always execute.
    """
    stages = cfg.get("stage", [])
    runner = StageRunner(cfg.get("workdir"))
    ctx: dict = {}
    fps: dict = {}
    for i, st in enumerate(stages):
        st = dict(st)
        op_name = st.pop("op")
        if op_name not in OPS:
            raise KeyError(f"unknown op {op_name!r}; known: {sorted(OPS)}")
        out_name = st.pop("output", None)
        upstream = [
            fps[st[k]]
            for k in (
                "input", "input_a", "input_b", "right", "other", "gold",
                "benchmark", "signals", "base_labels", "base_signatures",
                "kb", "edges", "facts", "entities", "classes", "properties", "corpus",
            )
            if k in st and st[k] in fps
        ]
        extra = {}
        if op_name.startswith("read_") and "path" in st:
            p = st["path"]
            try:
                extra["manifest"] = (
                    manifest_for_dir(p) if os.path.isdir(p) else input_manifest([p])
                )
            except OSError:
                pass
        if "corpus" in st:
            try:
                extra["manifest"] = manifest_for_dir(st["corpus"])
            except OSError:
                pass
        fp = stage_fingerprint(f"{i:02d}-{op_name}", {**st, **extra}, upstream=upstream)
        stage_key = f"{i:02d}-{op_name}"

        fn = OPS[op_name]
        if out_name is None:
            result = fn(ctx, st)  # sink: always executes
            runner.metrics[stage_key] = {"sink": True}
            continue

        # Multi-output ops declare extra outputs via ``*_output`` kwargs
        # (e.g. er's ``edges_output``): the op sets ctx[<name>] while
        # building. Each extra gets its OWN checkpoint under the same
        # fingerprint, so a rerun that checkpoint-hits the main output
        # still restores the extras (or rebuilds the op once when an
        # extra's checkpoint is missing/stale) — a bare ctx side effect
        # would silently vanish on the hit path.
        extra_names = [
            st[k] for k in sorted(st) if k.endswith("_output") and st[k]
        ]
        built: dict = {}

        def build_main():
            r = fn(ctx, st)
            built["ran"] = True
            return r

        result = runner.run(stage_key, fp, build_main, materialize=False)
        ctx[out_name] = result
        fps[out_name] = fp
        for en in extra_names:
            def build_extra(en=en):
                if "ran" not in built:
                    # main output came from its checkpoint; re-run the op
                    # once to regenerate this extra (ops with internal
                    # checkpointing make this cheap)
                    fn(ctx, st)
                    built["ran"] = True
                return ctx[en]

            ctx[en] = runner.run(
                f"{stage_key}.{en}", fp, build_extra, materialize=False
            )
            fps[en] = fp
    return {"datasets": ctx, "metrics": runner.metrics}
