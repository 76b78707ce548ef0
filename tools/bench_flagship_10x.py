"""Per-round flagship run at 10× bench scale (2M files; VERDICT r4 item 5).

Prerequisite: `python tools/make_corpus_10x.py` (builds
/tmp/takco_fixtures/bench10 — 10 parallel bench-shaped replicas with
planted clusters, merged labels sidecar).

Runs the flagship ER pipeline once at `RAY_GRAFT_CPUS` (default 32) with a
warmed page cache, then reports wall, files/s, label + edge counts, and
pairwise F1 vs the planted gold — one JSON line plus a ready BASELINE.md
row. Edge counting happens OUTSIDE the timed window (it re-executes the
lazy tail of the DAG; the timed wall matches bench.py --er-only protocol).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    corpus = sys.argv[1] if len(sys.argv) > 1 else "/tmp/takco_fixtures/bench10"
    files_dir = os.path.join(corpus, "files")
    with open(os.path.join(corpus, "MANIFEST.json")) as f:
        manifest = json.load(f)

    # warm page cache (same rationale as bench.py: one shared disk would
    # otherwise make this an IO benchmark)
    for fn in sorted(os.listdir(files_dir)):
        with open(os.path.join(files_dir, fn), "rb") as f:
            while f.read(1 << 24):
                pass

    import ray

    cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             log_to_driver=False)
    try:
        import ray.data as rd

        from takco_ray.pipelines.er import er_pipeline
        from takco_ray.stages.report import score_clusters

        t0 = time.monotonic()
        res = er_pipeline(files_dir)
        n_labels = res["labels"].count()
        wall = round(time.monotonic() - t0, 2)

        n_edges = res["edges"].count()
        gold = rd.read_parquet(
            os.path.join(corpus, "labels.parquet"),
            columns=["file_id", "entity_id"],
        )
        rep = score_clusters(res["labels"], gold).take_all()[0]

        out = {
            "metric": "flagship_10x_sec",
            "value": wall,
            "unit": "sec",
            "n_files": manifest["n_files"],
            "files_per_s": round(manifest["n_files"] / wall, 1),
            "n_labels": int(n_labels),
            "n_edges": int(n_edges),
            "er_pairwise_f1": rep["f1"],
            "precision": rep["precision"],
            "recall": rep["recall"],
            "num_cpus": cpus,
        }
        print(json.dumps(out))
        print(
            f"| 10x flagship ({manifest['n_files']} files, {cpus} CPUs) | "
            f"{wall} s | {out['files_per_s']} files/s | {n_labels} labels | "
            f"{n_edges} edges | F1 {rep['f1']:.6f} |",
            file=sys.stderr,
        )
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
