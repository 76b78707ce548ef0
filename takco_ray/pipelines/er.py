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
    # 64 perms / 8 bands (r=8): same per-band selectivity as the original
    # 128/16 at HALF the signature kernel traffic (the measured memory-
    # bandwidth wall of the whole pipeline) and half the band-row shuffle.
    # Measured F1 on the 20k gold corpus: 0.99977 (vs 0.99994 at 128/16,
    # recall 0.99960) — far above the ≥0.99 bar; estimator σ at 64 perms is
    # 0.06, wide of the 0.65-vs-entity-margin by construction. Bump back to
    # 128/16 for corpora whose match margin is tighter.
    num_perm: int = 64
    num_bands: int = 8
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
    # >0 appends a hashed shingle-TF embedding column ("emb",
    # fixed_size_list<float32, emb_dim>) in the signature stage (one shared
    # tokenize pass) and carries it through blocking so the scorer's
    # emb_cos channel is live — reference EmbeddingMatcher analog
    # (takco/cluster/matchers/embedding.py:222-246). Reference the channel
    # from agg_expr, e.g. "@max(content_minhash, @pow(emb_cos, 4))".
    emb_dim: int = 0
    # appends a "type_hist" column (5-bin char-class distribution,
    # fixed_size_list<float32, 5>) in the signature stage and carries it to
    # the scorer's type_cos channel — reference TypeCosMatcher analog
    # (takco/cluster/matchers/typecos.py). Reference from agg_expr, e.g.
    # "@mean(content_minhash, type_cos)".
    type_channel: bool = False
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
    # "threshold" = strong-edge CC above (needs refine_threshold);
    # "modularity" = one Louvain level per cluster over ALL its weighted
    # edges (splits dense-communities-plus-sparse-bridge clusters that a
    # score cut provably cannot — every edge may clear the threshold)
    refine_mode: str = "threshold"
    refine_resolution: float = 1.0


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
            emb_dim=cfg.emb_dim,
            type_hist=cfg.type_channel,
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
        extras = (("emb",) if cfg.emb_dim else ()) + (
            ("type_hist",) if cfg.type_channel else ()
        )
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
                extra_feature_cols=extras,
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
            extra_feature_cols=extras,
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
        if cfg.refine_mode == "modularity":
            from ..stages.components import refine_clusters_modularity

            # refinement reads edges a second time (scores are gone after
            # CC) — the edge stage is re-executed lazily for this consumer
            raw = refine_clusters_modularity(
                label_rows(star), edges, num_parts, resolution=cfg.refine_resolution
            )
            labels = _merge_labels(raw, side, num_parts)
        elif cfg.refine_threshold is not None:
            from ..stages.components import refine_clusters

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
    max_new_band_keys: int = 50_000_000,
) -> dict:
    """Attach a NEW batch of files to an existing run's clusters without
    re-clustering the base corpus (continuous-ingest ER — beyond the
    reference, which always re-clusters from scratch,
    ``takco/__init__.py:231-430``).

    Full-member recall: new files block against the band keys of EVERY
    member of every base cluster — not only the min-id representative — so a
    new file similar to any member attaches (the reference's cluster step
    always re-blocks all tables, ``takco/cluster/cluster.py:348-431``; this
    matches that recall on the new-vs-base frontier at incremental cost).

    Shape:

    1. new signatures → the distinct new band-key set, ``ray.put`` once
       (the "small side" — the new batch is small by the definition of
       incremental ingest; above ``max_new_band_keys`` (~400 MB) this
       raises: run the full pipeline instead).
    2. base signatures stream through the band exploder with that key set
       as the active filter — a map-only pass; ONLY base members sharing a
       band with some new file emit band rows. No base-base pair is ever
       generated or scored.
    3. one grouped pass per band key scores (new × new) and (new × base)
       pairs with the standard fused PairScorer → edges; oversized blocks
       cap at O(m_new) pairs (ring over new members + each new member to
       ``max_block_size`` nearest base members).
    4. CC over the edges; each component labels its new members with the
       MINIMUM base cluster id among its base members, else (all-new
       component) its min new file id. Components spanning ≥2 base clusters
       emit ``merges`` audit rows — the incremental view cannot merge base
       clusters in place, so the implied merge is surfaced as data instead
       of silently picking one side.

    Every wide step is a hash-partitioned grouped pass; content never
    shuffles; the only driver materialization is the new band-key set.
    Periodic full reruns remain the consolidation path (new-vs-new clusters
    formed here don't extend the base index until consolidated).

    ``base_signatures`` / ``base_labels``: the ``signatures`` / ``labels``
    datasets of the base run (same ``cfg`` — signatures must be
    hash-compatible). Returns ``{"labels": Dataset(file_id, cluster_id)}``
    covering exactly the new files, plus ``{"merges": Dataset(base_cluster_id,
    merged_into)}`` naming base clusters bridged by new evidence.
    """
    import numpy as np

    from ..stages.blocking import emit_band_rows
    from ..stages.groupmap import partitioned_group_map, segment_boundaries

    cfg = cfg or ERConfig()
    import ray as _ray

    num_parts = cfg.num_partitions or max(16, int(_ray.cluster_resources().get("CPU", 16)))

    # the base signatures MUST have been built under the same banding
    # config — band keys from different (num_perm, num_bands) cannot
    # collide, so a mismatch silently attaches nothing (every new file
    # becomes a singleton). The stored schema carries both shapes; check
    # them instead of trusting the docstring. (ERConfig's default moved
    # 128/16 → 64/8 in round 3, making this footgun live for old runs.)
    base_schema = base_signatures.schema()
    for col, want in (("bands", cfg.num_bands), ("sig", cfg.num_perm)):
        if col in base_schema.names:
            typ = base_schema.types[base_schema.names.index(col)]
            size = getattr(typ, "list_size", None)
            if size is not None and size != want:
                raise ValueError(
                    f"base_signatures.{col} has {size} elements but cfg "
                    f"expects {want} — the base run used a different "
                    "signature config; re-run er_pipeline or pass its cfg"
                )

    # materialized: consumed by the key collection, the band explosion AND
    # the new-marker rows — without it the corpus read + fingerprint +
    # MinHash would re-execute per consumer (ADVICE r2)
    new_sigs = signatures_for_paths([new_corpus_dir], cfg).materialize()

    # ---- 1. distinct new band keys, broadcast once ------------------------
    from ..stages.minhash import signatures_to_numpy

    key_parts: list = []
    for b in new_sigs.select_columns(["bands"]).iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        key_parts.append(np.unique(signatures_to_numpy(b.column("bands")).reshape(-1)))
    new_keys = (
        np.unique(np.concatenate(key_parts)) if key_parts else np.zeros(0, dtype=np.int64)
    )
    if len(new_keys) > max_new_band_keys:
        raise ValueError(
            f"incremental batch produces {len(new_keys)} distinct band keys "
            f"(> {max_new_band_keys}); at that scale run the full er_pipeline "
            "over base ∪ new instead of the incremental path"
        )
    if len(new_keys) == 0:  # degenerate: nothing to ingest
        import ray.data as _rd

        empty = _rd.from_arrow(
            pa.table(
                {
                    "file_id": pa.array([], type=pa.int64()),
                    "cluster_id": pa.array([], type=pa.int64()),
                }
            )
        )
        return {
            "labels": empty,
            "merges": empty.rename_columns(
                {"file_id": "base_cluster_id", "cluster_id": "merged_into"}
            ),
        }
    new_keys_ref = _ray.put(new_keys)

    # ---- 2. band rows: base filtered by new keys, new exploded fully ------
    def tag_side(side: int):
        def fn(t: pa.Table) -> pa.Table:
            return t.append_column(
                "side", pa.array(np.full(t.num_rows, side, dtype=np.int8), type=pa.int8())
            )

        return fn

    base_bands = emit_band_rows(
        base_signatures, None, num_bands=cfg.num_bands, seed=cfg.seed,
        active_ref=new_keys_ref,
    ).map_batches(tag_side(0), batch_format="pyarrow", zero_copy_batch=True)
    new_bands = emit_band_rows(
        new_sigs, None, num_bands=cfg.num_bands, seed=cfg.seed
    ).map_batches(tag_side(1), batch_format="pyarrow", zero_copy_batch=True)
    # materialized: feeds BOTH the pair shuffle and the member→cluster tag
    # rows; small (only band-colliding base members survive the filter)
    base_bands = base_bands.materialize()

    # ---- 3. grouped pair-gen (≥1 new side) + fused scoring → edges --------
    edges = partitioned_group_map(
        new_bands.union(base_bands),
        "block_key",
        _IncrementalPairEmitter(
            max_block_size=cfg.max_block_size,
            min_size_ratio=cfg.min_size_ratio,
            scorer_kwargs=dict(agg_expr=cfg.agg_expr, threshold=cfg.threshold),
        ),
        num_partitions=num_parts,
    )
    comp_labels = label_rows(
        cc_forest(edges, num_partitions=num_parts, driver_limit=cfg.broadcast_label_limit)
    )

    # ---- 4. relabel by min base cluster + merge audit ----------------------
    # tag rows on file_id: kind 0 = CC component, kind 1 = base member's
    # cluster (from base_labels, restricted to surviving members), kind 2 =
    # new-file marker. base_labels is a 16 B/row stream — the grouped pass
    # replaces any broadcast of the (corpus-sized) label map.
    def lab_tag(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "file_id": t.column("file_id").cast(pa.int64()),
                "val": t.column("cluster_id").cast(pa.int64()),
                "kind": pa.array(np.zeros(n, dtype=np.int64), type=pa.int64()),
            }
        )

    def member_marker(t: pa.Table) -> pa.Table:  # surviving base member
        fid = t.column("file_id").cast(pa.int64())
        return pa.table(
            {
                "file_id": fid,
                "val": fid,
                "kind": pa.array(np.full(t.num_rows, 1, dtype=np.int64), type=pa.int64()),
            }
        )

    def base_label_rows(t: pa.Table) -> pa.Table:  # cluster of any base file
        return pa.table(
            {
                "file_id": t.column("file_id").cast(pa.int64()),
                "val": t.column("cluster_id").cast(pa.int64()),
                "kind": pa.array(np.full(t.num_rows, 3, dtype=np.int64), type=pa.int64()),
            }
        )

    def new_tag(t: pa.Table) -> pa.Table:
        fid = t.column("file_id").cast(pa.int64())
        return pa.table(
            {
                "file_id": fid,
                "val": fid,
                "kind": pa.array(np.full(t.num_rows, 2, dtype=np.int64), type=pa.int64()),
            }
        )

    tag_rows = (
        comp_labels.map_batches(lab_tag, batch_format="pyarrow", zero_copy_batch=True)
        .union(
            base_bands.select_columns(["file_id"]).map_batches(
                member_marker, batch_format="pyarrow"
            )
        )
        .union(
            base_labels.select_columns(["file_id", "cluster_id"]).map_batches(
                base_label_rows, batch_format="pyarrow"
            )
        )
        .union(new_sigs.select_columns(["file_id"]).map_batches(new_tag, batch_format="pyarrow"))
    )

    _MAX = np.iinfo(np.int64).max

    def per_file(part: pa.Table) -> pa.Table:
        """(file_id) → (comp, file_id, base_cluster, is_new); files that are
        neither new nor surviving base members are dropped here."""
        fid = np.asarray(part.column("file_id").combine_chunks(), dtype=np.int64)
        val = np.asarray(part.column("val").combine_chunks(), dtype=np.int64)
        kind = np.asarray(part.column("kind").combine_chunks(), dtype=np.int64)
        order = np.argsort(fid, kind="stable")
        fs, vs, ks = fid[order], val[order], kind[order]
        starts = segment_boundaries(fs)
        seg_of = np.repeat(np.arange(len(starts)), np.diff(np.append(starts, len(fs))))
        n_seg = len(starts)
        min_comp = np.full(n_seg, _MAX, dtype=np.int64)
        np.minimum.at(min_comp, seg_of, np.where(ks == 0, vs, _MAX))
        base_cl = np.full(n_seg, _MAX, dtype=np.int64)
        np.minimum.at(base_cl, seg_of, np.where(ks == 3, vs, _MAX))
        is_member = np.zeros(n_seg, dtype=bool)
        np.logical_or.at(is_member, seg_of, ks == 1)
        is_new = np.zeros(n_seg, dtype=bool)
        np.logical_or.at(is_new, seg_of, ks == 2)
        file_ids = fs[starts]
        comp = np.where(min_comp != _MAX, min_comp, file_ids)  # self fallback
        keep = is_new | is_member
        # a surviving base member carries its cluster; a new file carries MAX
        base_out = np.where(is_member, base_cl, _MAX)
        return pa.table(
            {
                "comp": pa.array(comp[keep], type=pa.int64()),
                "file_id": pa.array(file_ids[keep], type=pa.int64()),
                "base_cluster": pa.array(base_out[keep], type=pa.int64()),
                "is_new": pa.array(is_new[keep]),
            }
        )

    per_file_rows = partitioned_group_map(tag_rows, "file_id", per_file, num_parts)

    def relabel(part: pa.Table) -> pa.Table:
        """Per component: label new members min-base-cluster (else min new
        id); emit merge-audit rows (row_kind=1) for multi-base components."""
        comp = np.asarray(part.column("comp").combine_chunks(), dtype=np.int64)
        fid = np.asarray(part.column("file_id").combine_chunks(), dtype=np.int64)
        base = np.asarray(part.column("base_cluster").combine_chunks(), dtype=np.int64)
        is_new = np.asarray(part.column("is_new").combine_chunks(), dtype=bool)
        order = np.lexsort((base, comp))
        cs, fs, bs, ns = comp[order], fid[order], base[order], is_new[order]
        starts = segment_boundaries(cs)
        seg_of = np.repeat(np.arange(len(starts)), np.diff(np.append(starts, len(cs))))
        n_seg = len(starts)
        base_min = np.full(n_seg, _MAX, dtype=np.int64)
        np.minimum.at(base_min, seg_of, bs)
        new_min = np.full(n_seg, _MAX, dtype=np.int64)
        np.minimum.at(new_min, seg_of, np.where(ns, fs, _MAX))
        label_of = np.where(base_min != _MAX, base_min, new_min)
        # label rows: one per NEW member
        lab_f = fs[ns]
        lab_c = label_of[seg_of[ns]]
        # merge audit: distinct base clusters per segment (bs sorted within)
        distinct = (bs != _MAX) & np.concatenate(
            [[True], (cs[1:] != cs[:-1]) | (bs[1:] != bs[:-1])]
        ) if len(cs) else np.zeros(0, dtype=bool)
        n_distinct = np.zeros(n_seg, dtype=np.int64)
        np.add.at(n_distinct, seg_of, distinct.astype(np.int64))
        audit = distinct & (n_distinct[seg_of] >= 2)
        return pa.table(
            {
                "file_id": pa.array(np.concatenate([lab_f, bs[audit]]), type=pa.int64()),
                "cluster_id": pa.array(
                    np.concatenate([lab_c, label_of[seg_of[audit]]]), type=pa.int64()
                ),
                "row_kind": pa.array(
                    np.concatenate(
                        [np.zeros(len(lab_f), dtype=np.int8), np.ones(int(audit.sum()), dtype=np.int8)]
                    ),
                    type=pa.int8(),
                ),
            }
        )

    out = partitioned_group_map(per_file_rows, "comp", relabel, num_parts).materialize()
    labels = out.filter(expr="row_kind == 0").select_columns(["file_id", "cluster_id"])
    merges = (
        out.filter(expr="row_kind == 1")
        .select_columns(["file_id", "cluster_id"])
        .rename_columns({"file_id": "base_cluster_id", "cluster_id": "merged_into"})
    )
    return {"labels": labels, "merges": merges}


class _IncrementalPairEmitter:
    """Partition fn for incremental ER: blocks of (new ∪ filtered-base) band
    rows → fused-scored edges, pairs restricted to ≥1 NEW side.

    Small blocks emit every (new, new)/(new, base) pair; blocks over
    ``max_block_size`` cap at O(m_new): a ring over the new members plus
    each new member × the block's first ``max_block_size`` base members in
    id order — a deterministic arbitrary subset (file ids are hashes, so
    no ordering is semantically "nearer"; any fixed rule gives the same
    recall class), with the trade that a new file whose only similar base
    member sorts past the cap in EVERY shared band stays unattached
    (base-base connectivity already lives in ``base_labels`` — re-deriving
    it here would re-cluster the base corpus, exactly what incremental
    ingest avoids)."""

    def __init__(self, max_block_size: int, min_size_ratio: float, scorer_kwargs: dict):
        self.max_block_size = max_block_size
        self.min_size_ratio = min_size_ratio
        self.scorer_kwargs = scorer_kwargs
        self._scorer = None

    def __call__(self, part: pa.Table) -> pa.Table:
        import numpy as np

        from ..stages.blocking import _empty_edges_keyed, _SALT_MIX
        from ..stages.groupmap import segment_boundaries, segment_pairs

        keys = np.asarray(part.column("block_key").combine_chunks(), dtype=np.int64)
        ids = np.asarray(part.column("file_id").combine_chunks(), dtype=np.int64)
        side = np.asarray(part.column("side").combine_chunks(), dtype=np.int8)
        n = len(keys)
        if n == 0:
            return _empty_edges_keyed().drop_columns(["pair_key"])
        order = np.lexsort((ids, keys))
        keys, side = keys[order], side[order]
        starts = segment_boundaries(keys)
        counts = np.diff(np.append(starts, n))
        small = counts <= self.max_block_size
        ii, jj = segment_pairs(starts[small], counts[small], max_block_size=None)
        mask = (side[ii] | side[jj]).astype(bool) if len(ii) else np.zeros(0, bool)
        ii_parts = [ii[mask]]
        jj_parts = [jj[mask]]
        for s, m in zip(starts[~small], counts[~small]):
            sub_new = s + np.flatnonzero(side[s : s + m] == 1)
            sub_base = s + np.flatnonzero(side[s : s + m] == 0)
            if len(sub_new) >= 2:  # ring over new members
                ii_parts.append(sub_new[:-1])
                jj_parts.append(sub_new[1:])
            if len(sub_new) and len(sub_base):
                k = min(len(sub_base), self.max_block_size)
                bi = np.repeat(sub_new, k)
                bj = np.tile(sub_base[:k], len(sub_new))
                lo = np.minimum(bi, bj)
                hi = np.maximum(bi, bj)
                ii_parts.append(lo)
                jj_parts.append(hi)
        ii = np.concatenate(ii_parts)
        jj = np.concatenate(jj_parts)
        if len(ii) == 0:
            return _empty_edges_keyed().drop_columns(["pair_key"])

        part = part.take(pa.array(order, type=pa.int64()))
        sizes = np.asarray(part.column("size").combine_chunks(), dtype=np.float64)
        ratio = np.minimum(sizes[ii], sizes[jj]) / np.maximum(
            np.maximum(sizes[ii], sizes[jj]), 1.0
        )
        keep = ratio >= self.min_size_ratio
        ii, jj = ii[keep], jj[keep]
        if len(ii) == 0:
            return _empty_edges_keyed().drop_columns(["pair_key"])
        left = part.take(pa.array(ii, type=pa.int64()))
        right = part.take(pa.array(jj, type=pa.int64()))
        cols = {
            "id1": left.column("file_id").cast(pa.int64()),
            "id2": right.column("file_id").cast(pa.int64()),
        }
        for c in ("path", "size", "lang", "sig"):
            cols[f"{c}1"] = left.column(c)
            cols[f"{c}2"] = right.column(c)
        if self._scorer is None:
            from ..stages.scoring import PairScorer

            self._scorer = PairScorer(**self.scorer_kwargs)
        return self._scorer(pa.table(cols))


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
