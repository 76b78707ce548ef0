"""Per-stage Parquet checkpoints with lineage fingerprints + metrics.

The reference caches each pipeline step as a jsonl dir and skips a step when
its dir merely EXISTS (``takco/__init__.py:642-652, 661-682``) — a stale-cache
footgun. Here a stage is skipped only when its recorded fingerprint (config
+ code version + upstream fingerprint chain) matches, and every run writes a
lineage sidecar with row/byte/wall counters (the per-partition lineage +
metrics the north rule requires: any stage resumes without recomputation).

Layout per stage::

    <root>/<stage>/data/*.parquet   — partitioned output (one file per block)
    <root>/<stage>/_LINEAGE.json    — fingerprint, metrics, upstream chain
    <root>/<stage>/_SUCCESS         — atomicity marker (written last)
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time

import ray.data

# bump when stage semantics change — part of every fingerprint
CODE_VERSION = "takco_ray-0.1"


def stage_fingerprint(name: str, params: dict, upstream: list | None = None) -> str:
    payload = json.dumps(
        {"name": name, "params": params, "upstream": upstream or [], "code": CODE_VERSION},
        sort_keys=True,
        default=str,
    )
    return hashlib.sha256(payload.encode()).hexdigest()[:32]


class StageRunner:
    """Run-or-resume stages under one checkpoint root.

    ``root=None`` disables checkpointing: builds run fully streamed and
    nothing is written (used by unit tests and pure-bench runs).
    """

    def __init__(self, root: str | None):
        self.root = root
        self.metrics: dict = {}

    def run(
        self, name: str, fingerprint: str, build, materialize: bool = True
    ) -> "ray.data.Dataset":
        """Return the stage's Dataset, reusing a valid checkpoint if present.

        ``build()`` must return a Dataset. On a fresh run the Dataset is
        written to partitioned Parquet and read back lazily, so downstream
        stages stream from disk instead of recomputing lineage.

        ``materialize=False`` (honored only when ``root is None``): return
        the built Dataset LAZY, fusing it into the consumer's streaming DAG
        with no barrier — for stages with exactly one downstream consumer
        (a barrier there only adds an exchange and idles the cluster between
        stages). Stages read more than once must keep ``materialize=True``.
        """
        if self.root is None:
            if not materialize:
                self.metrics[name] = {"lazy": True, "skipped": False}
                return build()
            # materialize to the object store so multiple downstream
            # consumers don't re-execute this stage's lineage
            t0 = time.monotonic()
            ds = build().materialize()
            wall = time.monotonic() - t0
            rows = ds.count()
            self.metrics[name] = {
                "rows": rows,
                "wall_s": round(wall, 3),
                "rows_per_s": round(rows / wall, 1) if wall > 0 else None,
                "skipped": False,
            }
            return ds

        stage_dir = os.path.join(self.root, name)
        data_dir = os.path.join(stage_dir, "data")
        lineage_path = os.path.join(stage_dir, "_LINEAGE.json")
        success_path = os.path.join(stage_dir, "_SUCCESS")

        if os.path.exists(success_path) and os.path.exists(lineage_path):
            with open(lineage_path) as f:
                lineage = json.load(f)
            if lineage.get("fingerprint") == fingerprint:
                self.metrics[name] = {**lineage.get("metrics", {}), "skipped": True}
                return ray.data.read_parquet(data_dir)
            # stale: config/code/upstream changed → rebuild from scratch
            shutil.rmtree(stage_dir)

        if os.path.exists(stage_dir):
            shutil.rmtree(stage_dir)  # partial previous attempt
        os.makedirs(data_dir, exist_ok=True)
        t0 = time.monotonic()
        ds = build()
        ds.write_parquet(data_dir)
        wall = time.monotonic() - t0

        import pyarrow.parquet as pq

        rows = 0
        byts = 0
        n_parts = 0
        for fn in os.listdir(data_dir):
            if fn.endswith(".parquet"):
                md = pq.read_metadata(os.path.join(data_dir, fn))
                rows += md.num_rows
                byts += os.path.getsize(os.path.join(data_dir, fn))
                n_parts += 1
        metrics = {
            "rows": rows,
            "bytes": byts,
            "partitions": n_parts,
            "wall_s": round(wall, 3),
            "rows_per_s": round(rows / wall, 1) if wall > 0 else None,
            "skipped": False,
        }
        with open(lineage_path, "w") as f:
            json.dump(
                {"fingerprint": fingerprint, "metrics": metrics, "stage": name},
                f,
                indent=2,
                sort_keys=True,
            )
        with open(success_path, "w") as f:
            f.write(fingerprint)
        self.metrics[name] = metrics
        return ray.data.read_parquet(data_dir)
