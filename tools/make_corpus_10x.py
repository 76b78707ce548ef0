"""Build the 10× flagship corpus (2M files) as 10 independent replicas.

VERDICT r4 item 5: run the flagship ER pipeline per round on a 2M-file
corpus with planted clusters. A single `generate_corpus` call at 2M files
is a ~30-min single-threaded driver loop; instead this tool generates 10
bench-shaped replicas (200k files each, seeds 42..51) in parallel
PROCESSES and unions them:

- different seeds → disjoint vocabularies, so contents, commits and
  therefore file_ids are distinct across replicas and entities never
  cross replica boundaries (the union is a valid planted-cluster corpus);
- per-replica entity ids are offset by replica_index × 10^9 in the merged
  labels sidecar so gold entities stay globally unique;
- files/ holds hard links to every replica shard (no byte copies);
- MANIFEST.json carries the merged n_files so `GRAFT_BENCH_CORPUS=<out>
  python bench.py --er-only` runs the flagship + F1 on it unchanged.

Usage:
    python tools/make_corpus_10x.py [--out /tmp/takco_fixtures/bench10]
        [--replicas 10] [--files-per-replica 200000]
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ENTITY_STRIDE = 10**9


def _gen_one(args: tuple) -> dict:
    out_dir, n_files, seed = args
    from takco_ray.corpus import CorpusConfig, generate_corpus

    cfg = CorpusConfig(
        n_files=n_files,
        seed=seed,
        emit_pairs=False,
        template_tokens=1000,
        mutate_tokens=8,
    )
    return generate_corpus(out_dir, cfg)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/takco_fixtures/bench10")
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument("--files-per-replica", type=int, default=200_000)
    ap.add_argument("--jobs", type=int, default=10)
    args = ap.parse_args()

    manifest_path = os.path.join(args.out, "MANIFEST.json")
    want = {
        "kind": "replica-union",
        "replicas": args.replicas,
        "files_per_replica": args.files_per_replica,
    }
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            m = json.load(f)
        if m.get("union") == want:
            print(json.dumps({"reused": True, "n_files": m["n_files"]}))
            return

    jobs = [
        (os.path.join(args.out, f"rep{i:02d}"), args.files_per_replica, 42 + i)
        for i in range(args.replicas)
    ]
    with mp.get_context("spawn").Pool(min(args.jobs, args.replicas)) as pool:
        manifests = pool.map(_gen_one, jobs)

    import pyarrow.parquet as pq
    import pyarrow as pa
    import pyarrow.compute as pc

    files_dir = os.path.join(args.out, "files")
    os.makedirs(files_dir, exist_ok=True)
    label_parts = []
    n_files = 0
    n_entities = 0
    total_bytes = 0
    for i, (rep_dir, _n, _s) in enumerate(jobs):
        src_files = os.path.join(rep_dir, "files")
        for fn in sorted(os.listdir(src_files)):
            dst = os.path.join(files_dir, f"rep{i:02d}_{fn}")
            if not os.path.exists(dst):
                os.link(os.path.join(src_files, fn), dst)
        lab = pq.read_table(os.path.join(rep_dir, "labels.parquet"))
        lab = lab.set_column(
            lab.schema.get_field_index("entity_id"),
            "entity_id",
            pc.add(lab.column("entity_id"), i * ENTITY_STRIDE),
        )
        label_parts.append(lab)
        n_files += manifests[i]["n_files"]
        n_entities += manifests[i]["n_entities"]
        total_bytes += manifests[i]["bytes"]

    merged = pa.concat_tables(label_parts)
    fid = merged.column("file_id")
    assert len(pc.unique(fid)) == len(merged), "cross-replica file_id collision"
    pq.write_table(merged, os.path.join(args.out, "labels.parquet"))

    manifest = {
        "n_files": n_files,
        "n_entities": n_entities,
        "bytes": total_bytes,
        "union": want,
        "config": {"emit_pairs": False, "note": "union of replica configs"},
    }
    with open(manifest_path, "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    print(json.dumps({"reused": False, "n_files": n_files,
                      "n_entities": n_entities, "bytes": total_bytes}))


if __name__ == "__main__":
    main()
