"""One-scale-up window: the slowest catalog queries at sf0.1 vs a 10× replica.

VERDICT r3 item #10: at sf0.1 the slowest queries are fixed-exchange-bound,
so the 2×-baseline bar is untested at a scale where data dominates. This
tool runs the N slowest catalog queries (per the round-3 FINAL snapshot in
BASELINE.md) against `/root/testdata/sf0.1` AND against a deterministic 10×
replica built by `tools/make_sf_scale.py` (≈ sf1: 6M lineitem, 50k docs,
1M events), and reports the per-query wall ratio. A ratio ≤ 10 means the
query scales at-or-better-than linearly in data; ratios > 10 are flagged
with whether the OUTPUT itself grows super-linearly (e.g. pair-emitting
queries over a corpus where every doc gained 9 near-duplicate replicas —
semantically quadratic, not an engine defect) so genuine engine hazards
stand out.

Usage:
    python tools/bench_scale_window.py [--scaled-dir /tmp/takco_sf1] [--k 10]

Prints one compact JSON line (machine) and a markdown table (for
BASELINE.md). Timing protocol matches bench.py: min-of-2 per query per
level, interleaved levels (base, scaled, base, scaled) so adjacent samples
share a co-tenant contention window.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# slowest catalog queries from the round-3 FINAL full-catalog snapshot
# (BASELINE.md), excluding the flagship (covered by --scaling / --stages):
# a mix of doc-corpus (shingle/pair-emitting) and relational (join/window)
# shapes so both shuffle families are exercised at the bigger scale.
WINDOW = [
    "minhash_dedup_docs",
    "cluster_reps",
    "dup_span_docs",
    "supplier_rank",
    "urgent_low_counts",
    "stop_shingles",
    "bloom_semi_lineitem",
    "source_neardup_minhash",
    "priority_mode_by_segment",
    "semi_join_orders",
]

# queries whose RESULT grows super-linearly on the replica corpus by
# construction (pair/cluster emitters: every doc gains k-1 near-duplicate
# replicas, so near-dup groups and their pair counts grow ~k² while the
# input grows k) — a >k ratio here is the semantics, not the engine.
QUADRATIC_OUTPUT = {
    "minhash_dedup_docs",
    "cluster_reps",
    "dup_span_docs",
    "source_neardup_minhash",
    "stop_shingles",
}


def _time_query(fn, sf_dir: str, repeats: int) -> list:
    samples = []
    for _ in range(repeats):
        t0 = time.monotonic()
        out = fn(sf_dir)
        if hasattr(out, "count"):
            out.count()
        samples.append(round(time.monotonic() - t0, 3))
    return samples


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--scaled-dir", default="/tmp/takco_sf1")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--queries", default=",".join(WINDOW))
    args = ap.parse_args()

    # A marker file records how an existing scaled dir was built; reusing a
    # dir built with a different --k (or base) would silently skew every
    # reported ratio, so mismatches force a rebuild.
    marker_path = os.path.join(args.scaled_dir, "_SCALE_MARKER.json")
    want_marker = {"base_dir": os.path.abspath(args.base_dir), "k": args.k}
    have_marker = None
    if os.path.exists(marker_path):
        try:
            with open(marker_path) as f:
                have_marker = json.load(f)
        except Exception:
            have_marker = None
    if (
        not os.path.exists(os.path.join(args.scaled_dir, "lineitem.parquet"))
        or have_marker != want_marker
    ):
        from tools.make_sf_scale import main as make_scale

        print(f"# building {args.scaled_dir} = {args.base_dir} x{args.k}",
              file=sys.stderr)
        make_scale(args.base_dir, args.scaled_dir, args.k)
        with open(marker_path, "w") as f:
            json.dump(want_marker, f)

    import ray

    ray.init(
        address="local",
        num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
        include_dashboard=False,
        log_to_driver=False,
    )
    try:
        from takco_ray.pipelines.queries import build_queries

        queries = build_queries()
        names = [q.strip() for q in args.queries.split(",") if q.strip()]
        base: dict = {}
        scaled: dict = {}
        spread: dict = {}
        for name in names:
            fn = queries[name]
            # interleave levels: base, scaled, base, scaled
            b_samples, s_samples = [], []
            for _ in range(args.repeats):
                b_samples += _time_query(fn, args.base_dir, 1)
                s_samples += _time_query(fn, args.scaled_dir, 1)
            # a sub-millisecond sample rounds to 0.0; floor the divisor so
            # the ratio stays finite (and conservative) instead of raising
            base[name] = max(min(b_samples), 1e-3)
            scaled[name] = min(s_samples)
            spread[name] = {"base": b_samples, "scaled": s_samples}
            print(f"# {name}: base {base[name]}s scaled {scaled[name]}s "
                  f"ratio {scaled[name] / base[name]:.1f}x", file=sys.stderr)
    finally:
        ray.shutdown()

    ratios = {n: round(scaled[n] / base[n], 2) for n in base}
    flagged = sorted(
        n for n, r in ratios.items()
        if r > args.k and n not in QUADRATIC_OUTPUT
    )
    out = {
        "metric": "sf1_window_ratio_max",
        "value": max(ratios.values()),
        "unit": "x",
        "queries": ratios,
        "k": args.k,
        "base_sec": base,
        "scaled_sec": scaled,
        "flagged_over_linear": flagged,
        "num_cpus": int(os.environ.get("RAY_GRAFT_CPUS", "32")),
    }
    sidecar = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "..", "SF1_WINDOW_SPREAD.json")
    with open(os.path.abspath(sidecar), "w") as f:
        json.dump({"spread": spread, **out}, f, indent=1)
    print(json.dumps(out))

    print("\n| query | sf0.1 s | 10x s | ratio | note |")
    print("|---|---|---|---|---|")
    for n in base:
        note = ""
        if n in QUADRATIC_OUTPUT and ratios[n] > args.k:
            note = "output grows ~k² on replica corpus (pair/cluster emitter)"
        elif ratios[n] > args.k:
            note = "FLAG: super-linear, investigate"
        print(f"| {n} | {base[n]} | {scaled[n]} | {ratios[n]} | {note} |")


if __name__ == "__main__":
    main()
