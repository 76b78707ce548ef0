#!/usr/bin/env python
"""Benchmark harness.

Default: run the headline pipelines over ``$GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) at ``num_cpus=$RAY_GRAFT_CPUS`` (default 32) and
print ONE JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...},
     "spread": {...}, "sf": ..., "num_cpus": N}

Every query is timed ``$GRAFT_BENCH_REPEATS`` times (default 2) in one
session; ``queries`` holds the per-query MIN and ``spread`` all samples —
this host is co-tenanted and single samples swing 3-30× (round-2 driver
bench vs builder same-day snapshots), so the minimum is the least-contended
estimate of the engine and the spread makes contamination visible.

``--scaling``: run the flagship ER pipeline twice in FRESH processes at two
CPU levels on the same input (the sandbox surrogate for the north rule's N
vs 4N cluster sizes) and report both throughputs plus
``efficiency = (T_low × low) / (T_high × high)``. Defaults to 2 vs 8 CPUs —
both levels below this co-tenanted host's shared-memory ceiling, the
faithful emulation of multi-node scaling where every node brings its own
DRAM (measured analysis: BASELINE.md round-2 scaling section). Override
with ``GRAFT_SCALING_LOW`` / ``GRAFT_SCALING_HIGH`` (e.g. 8 and 32).

``--stages``: per-stage walls + files/s at ``RAY_GRAFT_CPUS`` (the
north rule's per-stage throughput counters).

Owns its Ray session (init/shutdown); nothing in takco_ray ever calls
ray.init.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time


SF_DEFAULT = "/root/testdata/sf0.1"

BENCH_QUERIES = [
    "pricing_summary",
    "nation_revenue",
    "segment_orders",
    "top_parts",
    "filter_orders",
    "events_hourly",
    "exact_dedup_docs",
    "token_counts_docs",
    "minhash_dedup_docs",
    "embedding_topk",
    "semi_join_orders",
    "top_orders_per_priority",
    "quantiles_quantity",
    "top_tokens",
    "tfidf_terms",
    "decontam_docs",
    "approx_distinct_users",
    # round-3 operators
    "redact_pii_docs",
    "source_neardup",
    "event_deltas",
    "stratified_orders",
    "pack_docs",
    "source_neardup_minhash",
    "shuffle_docs",
    "stop_shingles",
    "curate_docs",
    "text_neardup_clusters",
    "cluster_reps",
    "event_props",
    # round-3 additions (second batch)
    "chunk_docs",
    "line_stats_docs",
    "winnow_neardup_docs",
    "cross_neardup_docs",
    "decontam_bloom_docs",
    "embedding_quantized_topk",
    "dup_span_docs",
    "semdedup_docs",
    "license_scan_docs",
    "quantile_filter_docs",
    "source_quota_docs",
    # round-3 additions (third batch)
    "rollup_lineitem",
    "priority_mode_by_segment",
    "supplier_name_agg",
    "price_p90_cont",
    "supplier_rank",
    "quantity_discount_moments",
    "dup_line_docs",
    "remove_dup_lines_docs",
    "heavy_event_types",
    "urgent_low_counts",
    "order_price_ntile",
    "priority_skew_join",
    "bloom_semi_lineitem",
    "embedding_unnest",
    "incremental_er_merges",
    "sketch_quantiles_supplier",
    "supplier_percent_rank",
    "grouped_price_median",
    "event_coverage",
    # round-4 additions
    "pfd_orders",
    "column_profile_customer",
    "coltype_events",
    "unpivot_lineitem",
    "link_customer_nations",
    "novelty_customer_segments",
    "html_tables_roundtrip",
    "compound_split_parts",
    # round-5 additions
    "warc_tables_roundtrip",
    "media_features",
    "semtab_tables",
    "wdc_tables",
    "kb_search_customers",
    "integrate_customer_facts",
    "triples_customer",
]


def _corpus_for(sf_dir: str) -> tuple:
    name = os.path.basename(os.path.normpath(sf_dir))
    scale = {"sf0.001": "test", "sf0.01": "small", "sf0.1": "bench"}.get(name, "test")
    return scale, f"/tmp/takco_fixtures/{scale}"


def _corpus_override() -> str | None:
    """``GRAFT_BENCH_CORPUS=/path/to/corpus_dir`` points both bench modes at a
    pre-generated files corpus (e.g. the 800k-file bench4 used for scaling
    evidence) instead of the sf-derived default."""
    return os.environ.get("GRAFT_BENCH_CORPUS")


def _ensure_corpus(sf_dir: str) -> tuple:
    """Generate (or reuse) the synthetic code corpus BEFORE any timing.

    Bench scale uses ~3 KB files (1000 template tokens, realistic source-file
    weight) so the measured job is compute-bound like the real corpus, and
    skips gold-pair emission (correctness is pytest's job, at test scale).
    """
    from takco_ray.corpus import CorpusConfig, generate_corpus, SCALES

    override = _corpus_override()
    if override:
        # override is the generator output ROOT (contains files/ + MANIFEST)
        with open(os.path.join(override, "MANIFEST.json")) as f:
            return override, json.load(f)
    scale, out_dir = _corpus_for(sf_dir)
    if scale == "bench":
        cfg = CorpusConfig(
            n_files=SCALES[scale],
            emit_pairs=False,
            template_tokens=1000,
            mutate_tokens=8,
        )
    else:
        cfg = CorpusConfig(n_files=SCALES[scale])
    manifest = generate_corpus(out_dir, cfg)
    return out_dir, manifest


def run_bench(sf_dir: str, num_cpus: int, er_only: bool = False) -> dict:
    import ray

    corpus_dir, manifest = _ensure_corpus(sf_dir)
    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        log_to_driver=False,
    )
    try:
        from takco_ray.pipelines.er import er_pipeline
        from takco_ray.pipelines.queries import build_queries

        # this sandbox shares a host with other tenants: single samples swing
        # 3-30× (round-2 driver bench vs same-day builder snapshots). Every
        # query is timed ``repeats`` times in one session; ``queries`` carries
        # the MIN (least-contended engine estimate) and ``spread`` carries all
        # samples so a noisy window is visible instead of silently distorting.
        repeats = max(1, int(os.environ.get("GRAFT_BENCH_REPEATS", "2")))
        timings: dict = {}
        spread: dict = {}

        # warm the page cache the same way --scaling does, so per-round
        # bench numbers measure the engine, not first-touch disk reads
        _warm_page_cache(corpus_dir)

        er_samples: list = []
        n_labels = 0
        for _rep in range(repeats):
            t0 = time.monotonic()
            result = er_pipeline(os.path.join(corpus_dir, "files"))
            # (corpus_dir is the generator output root; files/ holds the shards)
            n_labels = result["labels"].count()
            er_samples.append(round(time.monotonic() - t0, 3))
        er_sec = min(er_samples)
        timings["er_pipeline"] = er_sec
        spread["er_pipeline"] = er_samples

        # pairwise F1 vs the generator's gold entity labels — reported with
        # every bench run (outside the timed window) so throughput numbers
        # are always accompanied by correctness (SURVEY §5 / reference
        # `report`, takco/evaluate/__init__.py:77-141)
        er_f1 = None
        gold_path = os.path.join(corpus_dir, "labels.parquet")
        if os.path.exists(gold_path):
            import ray.data as rd
            from takco_ray.stages.report import score_clusters

            gold = rd.read_parquet(gold_path, columns=["file_id", "entity_id"])
            rep = score_clusters(result["labels"], gold).take_all()[0]
            er_f1 = rep["f1"]

        if not er_only:
            queries = build_queries()
            for name in BENCH_QUERIES:
                samples = []
                for _rep in range(repeats):
                    t0 = time.monotonic()
                    out = queries[name](sf_dir)
                    # consume the stream without pulling data to the driver
                    if hasattr(out, "count"):
                        out.count()
                    samples.append(round(time.monotonic() - t0, 3))
                timings[name] = min(samples)
                spread[name] = samples

        total = round(sum(timings.values()), 3)
        return {
            "metric": "bench_total_sec",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "spread": spread,
            "repeats": repeats,
            "sf": os.path.basename(os.path.normpath(sf_dir)),
            "num_cpus": num_cpus,
            "er_files": manifest["n_files"],
            "er_files_per_s": round(manifest["n_files"] / er_sec, 1),
            "er_labels": int(n_labels),
            "er_pairwise_f1": er_f1,
        }
    finally:
        ray.shutdown()


def _warm_page_cache(corpus_dir: str):
    """Read every corpus shard once so both timed runs see memory-speed IO.

    On a real multi-node cluster, storage bandwidth scales with nodes; this
    sandbox has ONE disk (~100 MB/s), which would impose an identical IO
    floor on both parallelism levels and turn the efficiency ratio into a
    disk benchmark. Warming the cache makes the measurement about the
    engine.
    """
    files_dir = os.path.join(corpus_dir, "files")
    for fn in sorted(os.listdir(files_dir)):
        with open(os.path.join(files_dir, fn), "rb") as f:
            while f.read(1 << 24):
                pass


def run_stages(sf_dir: str, num_cpus: int) -> dict:
    """Per-stage throughput counters (the north rule's per-stage evidence).

    Runs the flagship stages with explicit barriers so each wall is
    attributable — read+fingerprint+signatures / band-key stats /
    blocking-shuffle+fused-scoring / connected components / label broadcast
    — and prints one JSON line with per-stage seconds + files/s. The barrier
    between blocking and CC means the total here is slightly above the fused
    `--er-only` wall; use THIS mode to compare stages across CPU levels.
    """
    import ray

    corpus_dir, manifest = _ensure_corpus(sf_dir)
    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        log_to_driver=False,
    )
    try:
        from takco_ray.pipelines.er import ERConfig, _broadcast_labels
        from takco_ray.sources import read_files_corpus
        from takco_ray.stages.normalize import fingerprint as fingerprint_stage
        from takco_ray.stages.minhash import make_signature_fn
        from takco_ray.stages import blocking
        from takco_ray.stages.groupmap import partitioned_group_map
        from takco_ray.stages.components import cc_forest

        cfg = ERConfig()
        num_parts = max(16, num_cpus)
        n_files = manifest["n_files"]
        stages: dict = {}

        def tick(name, t0):
            stages[name] = round(time.monotonic() - t0, 3)

        t0 = time.monotonic()
        files = read_files_corpus(
            os.path.join(corpus_dir, "files"), override_num_blocks=4 * num_cpus
        )
        fp = fingerprint_stage(files, batch_size=2048)
        sigs = fp.map_batches(
            # MUST mirror er.py's signature config — a default here silently
            # diverges when ERConfig re-tunes num_perm/num_bands (64/8 in
            # round 3 vs the kernel's 128/16 defaults)
            make_signature_fn(
                num_perm=cfg.num_perm,
                num_bands=cfg.num_bands,
                shingle_k=cfg.shingle_k,
                seed=cfg.seed,
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=2048,
        ).materialize()
        tick("signatures", t0)

        t0 = time.monotonic()
        active, hot = blocking.band_key_stats(
            sigs, num_bands=cfg.num_bands, seed=cfg.seed, hot_threshold=cfg.hot_threshold
        )
        tick("band_key_stats", t0)

        t0 = time.monotonic()
        active_ref = ray.put(active) if active is not None and len(active) else None
        bands = blocking.emit_band_rows(
            sigs, hot, num_bands=cfg.num_bands, seed=cfg.seed,
            salt_target=cfg.salt_target, active_ref=active_ref,
        )
        pairs = partitioned_group_map(
            bands,
            "block_key",
            blocking._PartitionPairEmitter(
                max_block_size=cfg.max_block_size,
                min_size_ratio=cfg.min_size_ratio,
                scorer_kwargs=dict(agg_expr=cfg.agg_expr, threshold=cfg.threshold),
            ),
            num_partitions=num_parts,
        )
        edges = pairs.map_batches(
            lambda t: t.drop_columns(["pair_key"]), batch_format="pyarrow"
        ).materialize()
        tick("blocking_scoring", t0)

        t0 = time.monotonic()
        star = cc_forest(
            edges, num_partitions=num_parts, driver_limit=cfg.broadcast_label_limit
        )
        tick("connected_components", t0)

        t0 = time.monotonic()
        side = sigs.select_columns(["file_id", "sha256", "repo", "path"])
        n_labels = _broadcast_labels(star, side).count()
        tick("label_broadcast", t0)

        total = round(sum(stages.values()), 3)
        return {
            "metric": "stage_walls_sec",
            "value": total,
            "unit": "sec",
            "queries": stages,
            "stage_files_per_s": {
                k: round(n_files / v, 1) if v > 0 else None for k, v in stages.items()
            },
            "sf": os.path.basename(os.path.normpath(sf_dir)),
            "num_cpus": num_cpus,
            "er_files": n_files,
            "er_labels": int(n_labels),
            "n_edges": int(edges.count()),
        }
    finally:
        ray.shutdown()


def run_scaling(sf_dir: str, low: int = 2, high: int = 8) -> dict:
    corpus_dir, _ = _ensure_corpus(sf_dir)  # generate once, outside timing
    repeats = int(os.environ.get("GRAFT_SCALING_REPEATS", "2"))
    results = {}
    samples: dict = {low: [], high: []}
    # INTERLEAVE the levels (low, high, low, high, ...): the two levels of
    # one sequential sweep run ~15 min apart on this co-tenanted host, long
    # enough for background load to drift between them — two same-day
    # sweeps measured eff 0.79 and 0.50 with each level moving in OPPOSITE
    # directions. Adjacent interleaved samples share a contention window,
    # so the min-per-level pair is far more likely to be comparable.
    for _rep in range(repeats):
        for cpus in (low, high):
            # min over repeats: this sandbox shares a host with other
            # tenants (loadavg >10 observed), so single samples swing ±70%;
            # the minimum is the least-contended estimate of the engine
            _warm_page_cache(corpus_dir)
            # one ER run per subprocess: the min-over-repeats happens HERE
            # (across fresh sessions), not inside run_bench
            env = dict(
                os.environ,
                RAY_GRAFT_CPUS=str(cpus),
                GRAFT_SF_DIR=sf_dir,
                GRAFT_BENCH_REPEATS="1",
            )
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--er-only"],
                capture_output=True,
                text=True,
                env=env,
            )
            line = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")][-1]
            r = json.loads(line)
            samples[cpus].append(r["queries"]["er_pipeline"])
            best = results.get(cpus)
            if best is None or r["queries"]["er_pipeline"] < best["queries"]["er_pipeline"]:
                results[cpus] = r
    t_low = results[low]["queries"]["er_pipeline"]
    t_high = results[high]["queries"]["er_pipeline"]
    n = results[low]["er_files"]
    eff = (t_high * high) and round((t_low * low) / (t_high * high), 3)
    return {
        "metric": "scaling_efficiency",
        "value": eff,
        "unit": "ratio",
        "queries": {
            f"er_pipeline_cpus{low}": t_low,
            f"er_pipeline_cpus{high}": t_high,
        },
        "spread": {
            f"er_pipeline_cpus{low}": samples[low],
            f"er_pipeline_cpus{high}": samples[high],
        },
        "sf": os.path.basename(os.path.normpath(sf_dir)),
        "num_cpus": high,
        "throughput_low_files_per_s": round(n / t_low, 1),
        "throughput_high_files_per_s": round(n / t_high, 1),
        "low_cpus": low,
        "high_cpus": high,
        "er_files": n,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--er-only", action="store_true")
    ap.add_argument("--stages", action="store_true")
    args = ap.parse_args()

    sf_dir = os.environ.get("GRAFT_SF_DIR", SF_DEFAULT)
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    if args.scaling:
        low = int(os.environ.get("GRAFT_SCALING_LOW", "2"))
        high = int(os.environ.get("GRAFT_SCALING_HIGH", "8"))
        out = run_scaling(sf_dir, low=low, high=high)
    elif args.stages:
        out = run_stages(sf_dir, num_cpus)
    else:
        out = run_bench(sf_dir, num_cpus, er_only=args.er_only)

    # Keep the stdout line compact: the driver tail-captures a bounded window,
    # and a 50+-query ``spread`` dict once overflowed it (BENCH_r03 parsed as
    # null). Full per-sample spread goes to a sidecar next to this script.
    spread = out.pop("spread", None)
    if spread is not None:
        sidecar = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_SPREAD.json")
        try:
            with open(sidecar, "w") as f:
                json.dump({"spread": spread, "metric": out.get("metric"),
                           "sf": out.get("sf")}, f)
            out["spread_file"] = os.path.basename(sidecar)
        except OSError:
            pass
    print(json.dumps(out))


if __name__ == "__main__":
    main()
