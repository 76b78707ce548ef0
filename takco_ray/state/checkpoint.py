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
CODE_VERSION = "takco_ray-0.2"


def _dir_stats(d: str) -> tuple:
    import pyarrow.parquet as pq

    rows = byts = 0
    for fn in os.listdir(d):
        if fn.endswith(".parquet"):
            rows += pq.read_metadata(os.path.join(d, fn)).num_rows
            byts += os.path.getsize(os.path.join(d, fn))
    return rows, byts


def stage_fingerprint(name: str, params: dict, upstream: list | None = None) -> str:
    payload = json.dumps(
        {"name": name, "params": params, "upstream": upstream or [], "code": CODE_VERSION},
        sort_keys=True,
        default=str,
    )
    return hashlib.sha256(payload.encode()).hexdigest()[:32]


def input_manifest(paths: list) -> dict:
    """(size, mtime_ns) per input file — folded into stage fingerprints so a
    *changed corpus* under the same checkpoint root invalidates stale
    checkpoints (the reference skips a step whenever its dir merely exists,
    ``takco/__init__.py:661-663`` — the footgun SURVEY §7.5(7) fixes)."""
    out = {}
    for p in sorted(paths):
        st = os.stat(p)
        out[os.path.basename(p)] = [st.st_size, st.st_mtime_ns]
    return out


def manifest_for_dir(corpus_dir: str, suffix: str = ".parquet") -> dict:
    files = [
        os.path.join(corpus_dir, f)
        for f in os.listdir(corpus_dir)
        if f.endswith(suffix)
    ]
    return input_manifest(files)


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

        return self._run_stage(
            name, fingerprint, build, stage_dir, data_dir, lineage_path, success_path
        )

    def run_sharded(
        self,
        name: str,
        fingerprint: str,
        shard_groups: list,
        build_group,
    ) -> "ray.data.Dataset":
        """Input-partitioned stage with PER-PARTITION resume.

        ``shard_groups`` is a list of input-file-path lists; each group is
        built by ``build_group(paths) -> Dataset`` and written to its own
        ``part-NNNNN/`` directory with a per-part ``_SUCCESS`` + lineage
        (fingerprint = stage fingerprint ⊕ the group's input manifest). A
        retry after a crash — or after single shards changed — rebuilds ONLY
        the parts whose marker is missing or whose input manifest moved; a
        config/code change (stage fingerprint mismatch) rebuilds everything.
        This is the north rule's per-partition lineage: the unit of resume
        for input-bound stages is the input shard group, not the stage.

        With ``root=None`` falls back to one unpartitioned streamed build.
        """
        if self.root is None:
            import ray.data as _rd

            all_paths = [p for g in shard_groups for p in g]
            t0 = time.monotonic()
            ds = build_group(all_paths).materialize()
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
        success_path = os.path.join(stage_dir, "_SUCCESS")
        lineage_path = os.path.join(stage_dir, "_LINEAGE.json")
        if os.path.exists(lineage_path):
            with open(lineage_path) as f:
                lineage = json.load(f)
            if lineage.get("fingerprint") != fingerprint:
                shutil.rmtree(stage_dir)  # config/code change: full rebuild
        os.makedirs(stage_dir, exist_ok=True)

        part_metrics: dict = {}
        n_skipped = 0
        t_stage = time.monotonic()
        for gi, paths in enumerate(shard_groups):
            part_dir = os.path.join(stage_dir, f"part-{gi:05d}")
            part_fp = stage_fingerprint(
                f"{fingerprint}/part-{gi}", input_manifest(paths)
            )
            marker = os.path.join(part_dir, "_SUCCESS")
            meta_path = os.path.join(part_dir, "_PART.json")
            if os.path.exists(marker) and os.path.exists(meta_path):
                with open(meta_path) as f:
                    meta = json.load(f)
                if meta.get("fingerprint") == part_fp:
                    part_metrics[f"part-{gi:05d}"] = {**meta.get("metrics", {}), "skipped": True}
                    n_skipped += 1
                    continue
            if os.path.exists(part_dir):
                shutil.rmtree(part_dir)  # partial / stale attempt
            part_data = os.path.join(part_dir, "data")
            os.makedirs(part_data)
            t0 = time.monotonic()
            ds = build_group(paths)
            ds.write_parquet(part_data)
            wall = time.monotonic() - t0
            rows, byts = _dir_stats(part_data)
            metrics = {"rows": rows, "bytes": byts, "wall_s": round(wall, 3)}
            with open(meta_path, "w") as f:
                json.dump({"fingerprint": part_fp, "metrics": metrics}, f)
            with open(marker, "w") as f:
                f.write(part_fp)
            part_metrics[f"part-{gi:05d}"] = {**metrics, "skipped": False}

        stage_metrics = {
            "rows": sum(m.get("rows", 0) for m in part_metrics.values()),
            "bytes": sum(m.get("bytes", 0) for m in part_metrics.values()),
            "partitions": len(shard_groups),
            "partitions_skipped": n_skipped,
            "wall_s": round(time.monotonic() - t_stage, 3),
            "per_partition": part_metrics,
        }
        with open(lineage_path, "w") as f:
            json.dump(
                {"fingerprint": fingerprint, "metrics": stage_metrics, "stage": name},
                f,
                indent=2,
                sort_keys=True,
            )
        with open(success_path, "w") as f:
            f.write(fingerprint)
        self.metrics[name] = {**stage_metrics, "skipped": n_skipped == len(shard_groups)}
        part_files = [
            os.path.join(stage_dir, f"part-{gi:05d}", "data", f)
            for gi in range(len(shard_groups))
            for f in sorted(os.listdir(os.path.join(stage_dir, f"part-{gi:05d}", "data")))
            if f.endswith(".parquet")
        ]
        return ray.data.read_parquet(part_files)

    def _run_stage(
        self, name, fingerprint, build, stage_dir, data_dir, lineage_path, success_path
    ):

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
