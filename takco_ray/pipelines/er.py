"""Flagship pipeline: blocking + pairwise scoring + transitive clustering.

The Ray-Data-native reimagining of the reference's cluster step
(``takco/__init__.py:231-430``):

    read_parquet(files)                                   [S2]
      → fingerprint: sha256 / file_id / size              [map_batches]
      → MinHash signatures, content dropped               [actor pool]
      → hot-band pre-pass → salted band groupby → pairs   [1-2 shuffles]
      → pair dedup → scoring actor pool → edges ≥ θ       [1 shuffle + map]
      → large-star/small-star connected components        [iterated groupby]
      → labels ∪ singleton self-labels → join sha256      [groupby + join]

Every stage boundary can checkpoint to partitioned Parquet with a lineage
fingerprint (resume skips valid stages — ``state/checkpoint.py``). Edges and
labels are 16-24 B rows: content never enters a wide operation.
"""

from __future__ import annotations

from dataclasses import dataclass, asdict, field

import pyarrow as pa

import ray.data

from ..sources import read_files_corpus
from ..stages.normalize import fingerprint as fingerprint_stage
from ..stages.normalize import normalize_content
from ..stages.minhash import make_signature_fn
from ..stages.blocking import candidate_pairs
from ..stages.scoring import score_pairs, DEFAULT_AGG_EXPR, DEFAULT_THRESHOLD
from ..stages.components import cc_forest, label_rows
from ..state import StageRunner, stage_fingerprint
from ..state.checkpoint import manifest_for_dir


@dataclass
class ERConfig:
    num_perm: int = 128
    num_bands: int = 16
    shingle_k: int = 5
    seed: int = 41
    # shingle NORMALIZED content (comment/whitespace churn stripped — the
    # analog of the reference's restructure-first flagship order,
    # takco/reshape/clean.py:18-70). sha256/size stay on the RAW bytes: the
    # invariant the driver checks is the content as stored.
    normalize: bool = False
    agg_expr: str = DEFAULT_AGG_EXPR
    threshold: float = DEFAULT_THRESHOLD
    hot_threshold: int = 512
    salt_target: int = 512
    max_block_size: int = 64
    min_size_ratio: float = 0.4
    scorer_batch_size: int = 4096
    scorer_concurrency: int | tuple | None = None
    sig_concurrency: int | tuple | None = None
    join_partitions: int = 16
    read_num_blocks: int | None = None  # default: 4 blocks per cluster CPU
    num_partitions: int | None = None  # grouped-shuffle partitions (default ≈ CPUs)
    # "fused": score inside the band partition, shuffle only 32 B edges
    # (a real match surfaces in ~num_bands bands — recomputing the vectorized
    # kernels per copy is far cheaper than shipping ~1 KB feature rows).
    # "actor_pool": dedup feature pairs, then the standalone PairScorer pool.
    scoring_mode: str = "fused"
    # CC emits one label row per file in a non-singleton component — tiny
    # next to the corpus. Below this row count the labels are collected once,
    # ray.put, and attached to the side rows in a single map pass (classic
    # small-side broadcast); above it, the shuffle merge path runs.
    broadcast_label_limit: int = 5_000_000
    # cap cluster sizes the way the reference re-chunks oversized partitions
    # (takco/__init__.py:385-397); None = transitive components unaltered
    max_cluster_size: int | None = None
    # score-weighted sharpening (reference Louvain edge_exp analog,
    # takco/cluster/cluster.py:74-106): re-run CC inside each cluster over
    # edges with score >= refine_threshold, splitting weak transitive
    # chains; None = plain transitive components (the north-rule default)
    refine_threshold: float | None = None


def signatures_for_paths(paths, cfg: ERConfig):
    """Corpus shard paths (or a directory) → signature Dataset: fingerprint
    (sha256 / file_id / size), optional normalization, MinHash bands + 16-bit
    signature; content dropped after the signature stage.

    Task-based (not actor-pool): minhash state is ~2 KB and cached per
    worker process, so the elastic task pool saturates all CPUs.
    ``batch_size`` bounds per-task content in memory (~2048 × file size);
    a whole 100 MB read block per batch starves concurrent workers.
    """
    import ray as _ray

    n_blocks = cfg.read_num_blocks or 4 * int(_ray.cluster_resources().get("CPU", 8))
    files = read_files_corpus(paths, override_num_blocks=n_blocks)
    fp = fingerprint_stage(files, batch_size=2048)
    src_col = "content"
    if cfg.normalize:
        fp = normalize_content(fp).map_batches(
            lambda t: t.drop_columns(["content"]),
            batch_format="pyarrow",
        )
        src_col = "content_norm"
    return fp.map_batches(
        make_signature_fn(
            num_perm=cfg.num_perm,
            num_bands=cfg.num_bands,
            shingle_k=cfg.shingle_k,
            seed=cfg.seed,
            content_column=src_col,
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=2048,
    )


def er_pipeline(
    corpus_dir: str,
    cfg: ERConfig | None = None,
    checkpoint_root: str | None = None,
) -> dict:
    """Run the flagship ER pipeline over a files corpus directory.

    Returns ``{"labels": Dataset(file_id, cluster_id, sha256, repo, path),
    "edges": Dataset(u, v, score), "metrics": {stage: counters}}``.
    """
    cfg = cfg or ERConfig()
    runner = StageRunner(checkpoint_root)
    params = asdict(cfg)
    import ray as _ray

    num_parts = cfg.num_partitions or max(16, int(_ray.cluster_resources().get("CPU", 16)))

    # ---- stage 1: fingerprint + signatures (content dropped afterwards) --
    # the corpus manifest (per-shard size+mtime) is part of every stage
    # fingerprint: rerunning the same config on a CHANGED corpus under the
    # same checkpoint root must invalidate, not silently reuse (SURVEY §7.5
    # item 7 — the reference's dir-exists check is the footgun)
    import hashlib as _hashlib
    import json as _json

    manifest = manifest_for_dir(corpus_dir)
    manifest_hash = _hashlib.sha256(
        _json.dumps(manifest, sort_keys=True).encode()
    ).hexdigest()[:16]
    fp_fp = stage_fingerprint("signatures", params)

    def build_signatures_from(paths):
        return signatures_for_paths(paths, cfg)

    # materialized: consumed by the count pre-pass, the blocking shuffle AND
    # the label merge — three readers of one object-store copy. With a
    # checkpoint root the stage is built per input shard GROUP with its own
    # _SUCCESS + input-manifest fingerprint, so a retried or partially
    # changed corpus rebuilds only the affected partitions.
    import os as _os

    shard_paths = sorted(
        _os.path.join(corpus_dir, f)
        for f in _os.listdir(corpus_dir)
        if f.endswith(".parquet")
    )
    if shard_paths:
        # contiguous groups: appending shards to a corpus only perturbs the
        # trailing groups' manifests, so earlier partitions stay reusable
        n_groups = min(len(shard_paths), max(8, num_parts // 2))
        bounds = [len(shard_paths) * i // n_groups for i in range(n_groups + 1)]
        groups = [
            shard_paths[bounds[i] : bounds[i + 1]]
            for i in range(n_groups)
            if bounds[i] < bounds[i + 1]
        ]
    else:
        groups = [[corpus_dir]]
    sigs = runner.run_sharded("signatures", fp_fp, groups, build_signatures_from)

    # ---- stage 2: blocking + scoring → edges ------------------------------
    edges_fp = stage_fingerprint("edges", params, upstream=[fp_fp, manifest_hash])

    def build_edges():
        scorer_kwargs = dict(agg_expr=cfg.agg_expr, threshold=cfg.threshold)
        if cfg.scoring_mode == "fused":
            return candidate_pairs(
                sigs,
                num_bands=cfg.num_bands,
                seed=cfg.seed,
                hot_threshold=cfg.hot_threshold,
                salt_target=cfg.salt_target,
                max_block_size=cfg.max_block_size,
                min_size_ratio=cfg.min_size_ratio,
                num_partitions=num_parts,
                scorer_kwargs=scorer_kwargs,
            )
        pairs = candidate_pairs(
            sigs,
            num_bands=cfg.num_bands,
            seed=cfg.seed,
            hot_threshold=cfg.hot_threshold,
            salt_target=cfg.salt_target,
            max_block_size=cfg.max_block_size,
            min_size_ratio=cfg.min_size_ratio,
            num_partitions=num_parts,
        )
        return score_pairs(
            pairs,
            agg_expr=cfg.agg_expr,
            threshold=cfg.threshold,
            batch_size=cfg.scorer_batch_size,
            concurrency=cfg.scorer_concurrency,
        )

    # lazy: edges has ONE consumer (the CC first pass) — fusing it into that
    # DAG drops a cluster-wide barrier; fused-mode edges may carry cross-band
    # duplicates, which CC collapses in its first grouped pass
    edges = runner.run("edges", edges_fp, build_edges, materialize=False)

    # ---- stage 3: connected components → total labels ---------------------
    labels_fp = stage_fingerprint("clusters", params, upstream=[edges_fp, manifest_hash])

    def build_labels():
        star = cc_forest(
            edges,
            num_partitions=num_parts,
            driver_limit=cfg.broadcast_label_limit,
        )
        side = sigs.select_columns(["file_id", "sha256", "repo", "path"])
        if cfg.refine_threshold is not None:
            from ..stages.components import refine_clusters

            # refinement reads edges a second time (scores are gone after
            # CC) — the edge stage is re-executed lazily for this consumer
            raw = refine_clusters(
                label_rows(star), edges, cfg.refine_threshold, num_parts
            )
            labels = _merge_labels(raw, side, num_parts)
        # star is materialized by the CC loop, so count() is metadata-cheap
        elif star.count() <= cfg.broadcast_label_limit:
            labels = _broadcast_labels(star, side)
        else:
            raw = label_rows(star)  # (file_id, cluster_id), dup roots possible
            labels = _merge_labels(raw, side, num_parts)
        if cfg.max_cluster_size is not None:
            from ..stages.components import rechunk_clusters

            labels = rechunk_clusters(labels, cfg.max_cluster_size, num_parts)
        return labels

    labels = runner.run("clusters", labels_fp, build_labels, materialize=False)
    return {
        "labels": labels,
        "edges": edges,
        "signatures": sigs,
        "metrics": runner.metrics,
    }


def incremental_er(
    new_corpus_dir: str,
    base_labels,
    base_signatures,
    cfg: ERConfig | None = None,
) -> dict:
    """Attach a NEW batch of files to an existing run's clusters without
    re-clustering the base corpus (continuous-ingest ER — beyond the
    reference, which always re-clusters from scratch,
    ``takco/__init__.py:231-430``).

    Labels are min-member-id canonical, so each base cluster's
    REPRESENTATIVE is exactly the member with ``file_id == cluster_id`` —
    the rep set needs no extra index. The match runs the normal blocking +
    fused-scoring + CC machinery over (rep signatures ∪ new signatures):
    a component containing rep R maps its new members to base cluster R
    (min R on multi-rep bridges — a merge signal worth auditing);
    rep-free components become new clusters labeled by their min file id
    (globally unique content-hash ids, so no collision with base labels).

    Every step is a hash-partitioned grouped pass — no broadcast of the
    (cluster-count-sized) rep set, no driver materialization. Semantics =
    the transitive closure a full rerun would produce restricted to reps +
    new files; periodic full reruns remain the consolidation path.

    ``base_signatures`` / ``base_labels``: the ``signatures`` / ``labels``
    datasets of the base run (same ``cfg`` — signatures must be
    hash-compatible). Returns ``{"labels": Dataset(file_id, cluster_id)}``
    covering exactly the new files.
    """
    import numpy as np
    import pyarrow.compute as pc

    from ..stages.groupmap import partitioned_group_map

    cfg = cfg or ERConfig()
    import ray as _ray

    num_parts = cfg.num_partitions or max(16, int(_ray.cluster_resources().get("CPU", 16)))

    # ---- rep signatures: base sig rows whose file_id is a cluster id ------
    sig_schema = base_signatures.schema()
    sig_names = list(sig_schema.names)
    sig_types = dict(zip(sig_schema.names, sig_schema.types))

    def sig_rows(t: pa.Table) -> pa.Table:
        return t.append_column(
            "__marker", pa.array(np.zeros(t.num_rows, dtype=np.int64), type=pa.int64())
        )

    def marker_rows(t: pa.Table) -> pa.Table:
        # one row per distinct cluster id in the batch, null payload
        cl = pc.unique(t.column("cluster_id").combine_chunks()).cast(pa.int64())
        cols = {}
        for name in sig_names:
            if name == "file_id":
                cols[name] = cl
            else:
                cols[name] = pa.nulls(len(cl), sig_types[name])
        cols["__marker"] = pa.array(np.ones(len(cl), dtype=np.int64), type=pa.int64())
        return pa.table(cols)

    tagged = base_signatures.map_batches(
        sig_rows, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        base_labels.select_columns(["cluster_id"]).map_batches(
            marker_rows, batch_format="pyarrow", zero_copy_batch=True
        )
    )

    def keep_reps(part: pa.Table) -> pa.Table:
        fid = np.asarray(part.column("file_id").combine_chunks(), dtype=np.int64)
        mark = np.asarray(part.column("__marker").combine_chunks(), dtype=np.int64)
        order = np.argsort(fid, kind="stable")
        fs, ms = fid[order], mark[order]
        starts = np.concatenate([[0], np.flatnonzero(fs[1:] != fs[:-1]) + 1]) if len(fs) else np.zeros(0, dtype=np.int64)
        seg_of = np.repeat(np.arange(len(starts)), np.diff(np.append(starts, len(fs))))
        has_marker = np.zeros(len(starts), dtype=bool)
        np.logical_or.at(has_marker, seg_of, ms == 1)
        keep = (ms == 0) & has_marker[seg_of]
        return part.take(pa.array(order[keep], type=pa.int64())).drop_columns(["__marker"])

    rep_sigs = partitioned_group_map(tagged, "file_id", keep_reps, num_parts)

    # ---- match: normal machinery over rep ∪ new signatures ----------------
    new_sigs = signatures_for_paths([new_corpus_dir], cfg)
    combined = rep_sigs.union(new_sigs)
    edges = candidate_pairs(
        combined,
        num_bands=cfg.num_bands,
        seed=cfg.seed,
        hot_threshold=cfg.hot_threshold,
        salt_target=cfg.salt_target,
        max_block_size=cfg.max_block_size,
        min_size_ratio=cfg.min_size_ratio,
        num_partitions=num_parts,
        scorer_kwargs=dict(agg_expr=cfg.agg_expr, threshold=cfg.threshold),
    )
    comp_labels = label_rows(
        cc_forest(edges, num_partitions=num_parts, driver_limit=cfg.broadcast_label_limit)
    )

    # ---- relabel: comp → base cluster if a rep is a member ----------------
    def lab_tag(t: pa.Table) -> pa.Table:  # (file_id, comp, kind=0)
        n = t.num_rows
        return pa.table(
            {
                "file_id": t.column("file_id").cast(pa.int64()),
                "comp": t.column("cluster_id").cast(pa.int64()),
                "kind": pa.array(np.zeros(n, dtype=np.int64), type=pa.int64()),
            }
        )

    def rep_tag(t: pa.Table) -> pa.Table:  # marker: file is a rep
        fid = t.column("file_id").cast(pa.int64())
        n = t.num_rows
        return pa.table(
            {
                "file_id": fid,
                "comp": fid,  # self-comp fallback (rep never matched anything)
                "kind": pa.array(np.full(n, 1, dtype=np.int64), type=pa.int64()),
            }
        )

    def new_tag(t: pa.Table) -> pa.Table:  # marker: file is new (self fallback)
        fid = t.column("file_id").cast(pa.int64())
        n = t.num_rows
        return pa.table(
            {
                "file_id": fid,
                "comp": fid,
                "kind": pa.array(np.full(n, 2, dtype=np.int64), type=pa.int64()),
            }
        )

    tag_rows = (
        comp_labels.map_batches(lab_tag, batch_format="pyarrow", zero_copy_batch=True)
        .union(rep_sigs.select_columns(["file_id"]).map_batches(rep_tag, batch_format="pyarrow"))
        .union(new_sigs.select_columns(["file_id"]).map_batches(new_tag, batch_format="pyarrow"))
    )

    def per_file(part: pa.Table) -> pa.Table:
        """min comp per file + rep/new flags → (comp, file_id, is_rep, is_new)."""
        fid = np.asarray(part.column("file_id").combine_chunks(), dtype=np.int64)
        comp = np.asarray(part.column("comp").combine_chunks(), dtype=np.int64)
        kind = np.asarray(part.column("kind").combine_chunks(), dtype=np.int64)
        order = np.argsort(fid, kind="stable")
        fs, cs, ks = fid[order], comp[order], kind[order]
        starts = np.concatenate([[0], np.flatnonzero(fs[1:] != fs[:-1]) + 1]) if len(fs) else np.zeros(0, dtype=np.int64)
        seg_of = np.repeat(np.arange(len(starts)), np.diff(np.append(starts, len(fs))))
        n_seg = len(starts)
        min_comp = np.full(n_seg, np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(min_comp, seg_of, cs)
        is_rep = np.zeros(n_seg, dtype=bool)
        np.logical_or.at(is_rep, seg_of, ks == 1)
        is_new = np.zeros(n_seg, dtype=bool)
        np.logical_or.at(is_new, seg_of, ks == 2)
        return pa.table(
            {
                "comp": pa.array(min_comp, type=pa.int64()),
                "file_id": pa.array(fs[starts], type=pa.int64()),
                "is_rep": pa.array(is_rep),
                "is_new": pa.array(is_new),
            }
        )

    per_file_rows = partitioned_group_map(tag_rows, "file_id", per_file, num_parts)

    def relabel(part: pa.Table) -> pa.Table:
        comp = np.asarray(part.column("comp").combine_chunks(), dtype=np.int64)
        fid = np.asarray(part.column("file_id").combine_chunks(), dtype=np.int64)
        is_rep = np.asarray(part.column("is_rep").combine_chunks(), dtype=bool)
        is_new = np.asarray(part.column("is_new").combine_chunks(), dtype=bool)
        order = np.argsort(comp, kind="stable")
        cs, fs, rs, ns = comp[order], fid[order], is_rep[order], is_new[order]
        starts = np.concatenate([[0], np.flatnonzero(cs[1:] != cs[:-1]) + 1]) if len(cs) else np.zeros(0, dtype=np.int64)
        seg_of = np.repeat(np.arange(len(starts)), np.diff(np.append(starts, len(cs))))
        n_seg = len(starts)
        base = np.full(n_seg, np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(base, seg_of, np.where(rs, fs, np.iinfo(np.int64).max))
        label = np.where(base[seg_of] != np.iinfo(np.int64).max, base[seg_of], cs)
        keep = ns
        return pa.table(
            {
                "file_id": pa.array(fs[keep], type=pa.int64()),
                "cluster_id": pa.array(label[keep], type=pa.int64()),
            }
        )

    labels = partitioned_group_map(per_file_rows, "comp", relabel, num_parts)
    return {"labels": labels}


def _broadcast_labels(star, side):
    """Attach cluster ids in ONE map pass over the side rows — no shuffle.

    The star forest (child → root) has one row per file in a non-singleton
    component; collected as Arrow blocks, min-reduced per child driver-side
    (duplicate root rows across batches collapse here), sorted and
    ``ray.put`` once. Every side batch then does a vectorized searchsorted
    lookup, defaulting absent files (singletons) to their own id.
    """
    import numpy as np

    import ray as _ray

    fid_parts: list = []
    cid_parts: list = []
    # batch_size=None: whole blocks — the 256-row default would cost one
    # driver-side slice+combine per 256 rows (~50k Python roundtrips on a
    # 12M-row stream)
    for b in star.iter_batches(batch_format="pyarrow", batch_size=None):
        fid_parts.append(np.asarray(b.column("u").combine_chunks(), dtype=np.int64))
        cid_parts.append(np.asarray(b.column("v").combine_chunks(), dtype=np.int64))
    if fid_parts:
        fid = np.concatenate(fid_parts)
        cid = np.concatenate(cid_parts)
        order = np.lexsort((cid, fid))
        fid, cid = fid[order], cid[order]
        first = np.concatenate([[True], fid[1:] != fid[:-1]])
        fid, cid = fid[first], cid[first]  # min cid per file (lexsort order)
    else:
        fid = np.zeros(0, dtype=np.int64)
        cid = np.zeros(0, dtype=np.int64)
    lookup_ref = _ray.put((fid, cid))

    def attach(t: pa.Table) -> pa.Table:
        import numpy as _np

        keys, vals = _ray.get(lookup_ref)  # zero-copy plasma views
        ids = _np.asarray(t.column("file_id").combine_chunks(), dtype=_np.int64)
        out = ids.copy()  # default: own id (singleton component)
        if len(keys):
            pos = _np.searchsorted(keys, ids)
            pos = _np.minimum(pos, len(keys) - 1)
            hit = keys[pos] == ids
            out[hit] = vals[pos[hit]]
        return pa.table(
            {
                "file_id": pa.array(ids, type=pa.int64()),
                "cluster_id": pa.array(out, type=pa.int64()),
                "sha256": t.column("sha256"),
                "repo": t.column("repo"),
                "path": t.column("path"),
            }
        )

    return side.map_batches(attach, batch_format="pyarrow", zero_copy_batch=True)


def _merge_labels(raw_labels, side, num_partitions: int):
    """ONE grouped pass replacing groupby-min + singleton union + hash join.

    Union the CC label rows with the per-file side rows (sha256/provenance,
    defaulting cluster_id to the file's own id) and combine per file_id:
    cluster = min over rows, side fields from the unique side row. Every
    input file gets exactly one output row — singletons included — without
    a separate join shuffle.
    """
    import numpy as np

    from ..stages.groupmap import partitioned_group_map, segment_boundaries

    def lab_rows(t: pa.Table) -> pa.Table:
        n = len(t)
        return pa.table(
            {
                "file_id": t.column("file_id").cast(pa.int64()),
                "cluster_id": t.column("cluster_id").cast(pa.int64()),
                "sha256": pa.nulls(n, pa.string()),
                "repo": pa.nulls(n, pa.string()),
                "path": pa.nulls(n, pa.string()),
            }
        )

    def side_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "file_id": t.column("file_id").cast(pa.int64()),
                "cluster_id": t.column("file_id").cast(pa.int64()),  # self default
                "sha256": t.column("sha256"),
                "repo": t.column("repo"),
                "path": t.column("path"),
            }
        )

    unioned = raw_labels.map_batches(lab_rows, batch_format="pyarrow").union(
        side.map_batches(side_rows, batch_format="pyarrow")
    )

    def combine(part: pa.Table) -> pa.Table:
        fid = np.asarray(part.column("file_id").combine_chunks(), dtype=np.int64)
        cid = np.asarray(part.column("cluster_id").combine_chunks(), dtype=np.int64)
        n = len(fid)
        starts = segment_boundaries(fid)
        cluster_min = np.minimum.reduceat(cid, starts)
        sha = part.column("sha256").combine_chunks()
        valid = np.asarray(sha.is_valid())
        side_idx = np.flatnonzero(valid)  # exactly one side row per file_id
        if len(side_idx) != len(starts):
            # duplicate (repo, path, commit) input rows or a stable_file_id
            # collision produce >1 (or 0) side rows for a file_id — name the
            # offending ids instead of crashing deep in a Ray task
            per_seg = np.add.reduceat(valid.astype(np.int64), starts)
            bad = fid[starts[per_seg != 1]][:10]
            raise ValueError(
                f"expected exactly one side row per file_id; offending "
                f"file_ids (≤10 shown): {bad.tolist()} — duplicate "
                f"(repo,path,commit) rows or a stable_file_id collision"
            )
        picked = part.take(pa.array(side_idx, type=pa.int64()))
        return pa.table(
            {
                "file_id": picked.column("file_id"),
                "cluster_id": pa.array(cluster_min, type=pa.int64()),
                "sha256": picked.column("sha256"),
                "repo": picked.column("repo"),
                "path": picked.column("path"),
            }
        )

    return partitioned_group_map(unioned, "file_id", combine, num_partitions)
