"""End-to-end flagship ER pipeline tests (SURVEY.md §5 new-engine plan).

(1) pairwise F1 ≥ 0.99 vs planted labels on same-block pairs;
(2) per-row sha256 invariant in == out;
(3) hot boilerplate block survives salting as ONE cluster;
(4) checkpoint resume: stage reuse without recompute, identical output.
"""

import os
import shutil

import numpy as np
import pyarrow.parquet as pq
import pytest

from takco_ray.pipelines.er import er_pipeline, ERConfig


@pytest.fixture(scope="module")
def er_result(ray_session, test_corpus):
    out = er_pipeline(test_corpus["files"])
    labels = out["labels"].to_pandas()
    gold = pq.read_table(test_corpus["dir"] + "/labels.parquet").to_pandas()
    return out, labels, gold


def _pairwise_f1(labels, pairs):
    lab = dict(zip(labels.file_id, labels.cluster_id))
    pred = np.array(
        [lab.get(a) is not None and lab.get(a) == lab.get(b) for a, b in zip(pairs.id1, pairs.id2)]
    )
    gold = pairs.is_match.to_numpy()
    tp = int((pred & gold).sum())
    fp = int((pred & ~gold).sum())
    fn = int((~pred & gold).sum())
    p = tp / max(tp + fp, 1)
    r = tp / max(tp + fn, 1)
    return 2 * p * r / max(p + r, 1e-9), p, r


def test_pairwise_f1_on_same_block_pairs(er_result, test_corpus):
    _, labels, _ = er_result
    pairs = pq.read_table(test_corpus["dir"] + "/labeled_pairs.parquet").to_pandas()
    f1, p, r = _pairwise_f1(labels, pairs)
    assert f1 >= 0.99, f"F1={f1:.4f} P={p:.4f} R={r:.4f}"


def test_sha256_invariant_end_to_end(er_result):
    _, labels, gold = er_result
    merged = labels.merge(gold, on="file_id", suffixes=("", "_gold"))
    assert len(merged) == len(gold)
    assert (merged.sha256 == merged.sha256_gold).all()


def test_every_input_row_labeled_exactly_once(er_result, test_corpus):
    _, labels, _ = er_result
    assert len(labels) == test_corpus["manifest"]["n_files"]
    assert labels.file_id.is_unique


def test_hot_block_single_cluster_despite_salting(er_result):
    """The boilerplate entity (largest planted) must remain ONE cluster —
    overlapping-salt sub-blocks chain-connect (blocking.py §3)."""
    _, labels, gold = er_result
    merged = labels.merge(gold, on="file_id", suffixes=("", "_gold"))
    hot_entity = merged.entity_id.value_counts().idxmax()
    hot = merged[merged.entity_id == hot_entity]
    assert len(hot) >= 50
    assert hot.cluster_id.nunique() == 1


def test_exact_duplicates_always_co_clustered(er_result):
    _, labels, gold = er_result
    merged = labels.merge(gold, on="file_id", suffixes=("", "_gold"))
    per_sha = merged.groupby("sha256_gold").cluster_id.nunique()
    assert (per_sha == 1).all()


def test_checkpoint_resume_skips_stages_and_reproduces(ray_session, test_corpus):
    root = "/tmp/takco_ckpt_test"
    shutil.rmtree(root, ignore_errors=True)
    cfg = ERConfig()
    out1 = er_pipeline(test_corpus["files"], cfg, checkpoint_root=root)
    labels1 = out1["labels"].to_pandas().sort_values("file_id").reset_index(drop=True)
    assert not out1["metrics"]["signatures"]["skipped"]

    # kill the downstream stage; rerun must reuse upstream checkpoints
    shutil.rmtree(os.path.join(root, "clusters"))
    out2 = er_pipeline(test_corpus["files"], cfg, checkpoint_root=root)
    labels2 = out2["labels"].to_pandas().sort_values("file_id").reset_index(drop=True)
    assert out2["metrics"]["signatures"]["skipped"]
    assert out2["metrics"]["edges"]["skipped"]
    assert not out2["metrics"]["clusters"]["skipped"]
    assert labels1[["file_id", "cluster_id", "sha256"]].equals(
        labels2[["file_id", "cluster_id", "sha256"]]
    )

    # config change invalidates the fingerprint chain → full rebuild
    cfg2 = ERConfig(threshold=0.7)
    out3 = er_pipeline(test_corpus["files"], cfg2, checkpoint_root=root)
    assert not out3["metrics"]["signatures"]["skipped"]
    shutil.rmtree(root, ignore_errors=True)


def test_scoring_modes_agree(ray_session, test_corpus):
    """Fused in-partition scoring and the actor-pool path produce identical
    cluster labelings (same kernels, same threshold, different shuffles)."""
    fused = er_pipeline(test_corpus["files"], ERConfig(scoring_mode="fused"))
    pool = er_pipeline(test_corpus["files"], ERConfig(scoring_mode="actor_pool"))
    a = fused["labels"].to_pandas().sort_values("file_id").reset_index(drop=True)
    b = pool["labels"].to_pandas().sort_values("file_id").reset_index(drop=True)
    assert a[["file_id", "cluster_id"]].equals(b[["file_id", "cluster_id"]])


def test_incremental_er_attach_and_new_clusters(ray_session, tmp_path):
    """incremental_er: a new near-dup joins its base cluster, mutual new
    near-dups form a new cluster labeled by a new file id, a unique new
    file stays a singleton — base corpus never re-clustered."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    from takco_ray.pipelines.er import (
        ERConfig,
        er_pipeline,
        incremental_er,
        signatures_for_paths,
    )

    def text(i, n=150):
        return " ".join(f"w{i}x{j}" for j in range(n))

    def write(dirname, rows):
        d = tmp_path / dirname
        d.mkdir()
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
            str(d / "shard_00000.parquet"),
        )
        return str(d)

    base_dir = write(
        "base",
        {"a0": text(1), "a1": text(1) + " tail", "b0": text(2), "b1": text(2) + " tail", "s0": text(3)},
    )
    new_dir = write(
        "new",
        {"n0": text(1) + " extra", "n1": text(9), "n2": text(9) + " tail", "n3": text(7)},
    )

    cfg = ERConfig(threshold=0.5)
    base = er_pipeline(base_dir, cfg)
    out = incremental_er(new_dir, base["labels"], base["signatures"], cfg)
    lab = out["labels"].to_pandas()
    assert len(lab) == 4

    ns = signatures_for_paths([new_dir], cfg).to_pandas()[["file_id", "path"]]
    bs = base["signatures"].to_pandas()[["file_id", "path"]]
    new_id = dict(zip(ns.path, ns.file_id))
    base_id = dict(zip(bs.path, bs.file_id))
    got = dict(zip(lab.file_id, lab.cluster_id))

    base_lab = base["labels"].to_pandas().set_index("file_id").cluster_id
    assert got[new_id["n0.py"]] == base_lab[base_id["a0.py"]]
    assert got[new_id["n1.py"]] == got[new_id["n2.py"]]
    assert got[new_id["n1.py"]] in set(ns.file_id)  # new cluster, new id
    assert got[new_id["n3.py"]] == new_id["n3.py"]  # singleton self-label


def test_incremental_er_attaches_via_non_representative_member(ray_session, tmp_path):
    """Full-member recall: a new file similar ONLY to a non-representative
    member of a base cluster (no shared band with the rep) must still attach
    to that cluster — the r2 rep-only design silently left it a singleton."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from takco_ray.pipelines.er import (
        ERConfig,
        er_pipeline,
        incremental_er,
        signatures_for_paths,
    )

    def toks(lo, hi, p="t"):
        return " ".join(f"{p}{j}" for j in range(lo, hi))

    def write(dirname, rows):
        d = tmp_path / dirname
        d.mkdir()
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
            str(d / "shard_00000.parquet"),
        )
        return str(d)

    # chain cluster: a0 = t[0:150), a1 = t[25:175) — deterministic (seed 41)
    # signature-jaccard 0.688 ≥ θ, so they cluster; rep = min file_id (a hash,
    # so either member may be it)
    base_dir = write("base", {"a0": toks(0, 150), "a1": toks(25, 175)})
    cfg = ERConfig(threshold=0.5, num_bands=32)
    base = er_pipeline(base_dir, cfg)
    blab = base["labels"].to_pandas()
    assert blab.cluster_id.nunique() == 1  # a0 ~ a1 clustered
    cluster_id = int(blab.cluster_id.iloc[0])
    rep_path = blab.set_index("file_id").loc[cluster_id, "path"]
    # build the new file against the NON-rep member. Measured with seed 41:
    # toks(55,205) scores 0.625 vs a1 but 0.485 (< θ, zero shared bands) vs
    # a0; the u-prefixed variant scores 0.609 vs a0 but 0.398 vs a1.
    non_rep_is_a1 = rep_path == "a0.py"
    new_content = (
        toks(55, 205) if non_rep_is_a1 else toks(0, 55, "u") + " " + toks(0, 120)
    )
    new_dir = write("new", {"n0": new_content})

    out = incremental_er(new_dir, base["labels"], base["signatures"], cfg)
    lab = out["labels"].to_pandas()
    assert len(lab) == 1
    assert int(lab.cluster_id.iloc[0]) == cluster_id  # attached, not singleton
    assert out["merges"].count() == 0


def test_incremental_er_merge_audit(ray_session, tmp_path):
    """A new file bridging two base clusters surfaces the implied merge as
    audit rows instead of silently picking one side."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from takco_ray.pipelines.er import ERConfig, er_pipeline, incremental_er

    def toks(p, lo, hi):
        return " ".join(f"{p}{j}" for j in range(lo, hi))

    def write(dirname, rows):
        d = tmp_path / dirname
        d.mkdir()
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
            str(d / "shard_00000.parquet"),
        )
        return str(d)

    base_dir = write(
        "base",
        {
            "x0": toks("x", 0, 150), "x1": toks("x", 0, 150) + " xtail",
            "y0": toks("y", 0, 150), "y1": toks("y", 0, 150) + " ytail",
        },
    )
    # measured with seed 41 / num_bands=32: z scores 0.461 vs x0 and 0.531
    # vs y0 (both ≥ θ=0.42, each with ≥1 shared band); x–y share nothing
    cfg = ERConfig(threshold=0.42, num_bands=32)
    base = er_pipeline(base_dir, cfg)
    blab = base["labels"].to_pandas()
    assert blab.cluster_id.nunique() == 2
    cx = int(blab.set_index("path").loc["x0.py", "cluster_id"])
    cy = int(blab.set_index("path").loc["y0.py", "cluster_id"])

    # bridge: 150 x-tokens + 150 y-tokens → shingle-jaccard ≈ 0.49 both ways
    new_dir = write("new", {"z": toks("x", 0, 150) + " " + toks("y", 0, 150)})
    out = incremental_er(new_dir, base["labels"], base["signatures"], cfg)
    lab = out["labels"].to_pandas()
    assert len(lab) == 1
    assert int(lab.cluster_id.iloc[0]) == min(cx, cy)
    merges = out["merges"].to_pandas().sort_values("base_cluster_id")
    assert sorted(merges.base_cluster_id) == sorted([cx, cy])
    assert set(merges.merged_into) == {min(cx, cy)}


def test_incremental_er_rejects_mismatched_signature_config(ray_session, tmp_path):
    """Band keys from different (num_perm, num_bands) can't collide — a
    mismatched base would silently attach nothing, so it must raise."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from takco_ray.pipelines.er import ERConfig, er_pipeline, incremental_er

    d = tmp_path / "base"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "repo": ["r/a", "r/b"],
                "path": ["a.py", "b.py"],
                "commit": ["c", "c"],
                "lang": ["py", "py"],
                "content": pa.array(
                    ["alpha beta gamma delta epsilon zeta", "one two three four five six"],
                    type=pa.large_string(),
                ),
            }
        ),
        str(d / "shard_00000.parquet"),
    )
    base = er_pipeline(str(d), ERConfig(num_perm=128, num_bands=16))
    with pytest.raises(ValueError, match="signature config"):
        incremental_er(str(d), base["labels"], base["signatures"],
                       ERConfig(num_perm=64, num_bands=8))


def test_embedding_channel_f1_not_worse(er_result, test_corpus, ray_session):
    """VERDICT r3 #4: optional emb_cos channel (hashed shingle-TF embedding,
    reference EmbeddingMatcher analog). With the channel ADDED to the default
    DSL via @max, gold-corpus F1 must be >= the channel-off run."""
    pairs = pq.read_table(test_corpus["dir"] + "/labeled_pairs.parquet").to_pandas()
    _, labels_off, _ = er_result
    f1_off, _, _ = _pairwise_f1(labels_off, pairs)

    cfg_on = ERConfig(
        emb_dim=64,
        agg_expr="@max(content_minhash, @mean(content_minhash, @pow(path_jw, 4)),"
        " @pow(emb_cos, 4))",
    )
    labels_on = er_pipeline(test_corpus["files"], cfg_on)["labels"].to_pandas()
    f1_on, _, _ = _pairwise_f1(labels_on, pairs)
    assert f1_on >= f1_off - 1e-12, f"on={f1_on} off={f1_off}"


def test_pair_scorer_emb_cos_channel(ray_session):
    """The emb_cos channel is live when emb1/emb2 ride the pair rows and
    NaN-skipped (not zero-biased) when they don't."""
    import pyarrow as pa
    import numpy as np

    from takco_ray.stages.scoring import PairScorer

    def pairs_table(with_emb):
        sig = pa.FixedSizeListArray.from_arrays(
            pa.array(np.arange(8, dtype=np.uint16)), 4
        )
        cols = {
            "id1": pa.array([1, 3], type=pa.int64()),
            "id2": pa.array([2, 4], type=pa.int64()),
            "path1": pa.array(["a", "b"]),
            "path2": pa.array(["a", "b"]),
            "size1": pa.array([10, 10], type=pa.int64()),
            "size2": pa.array([10, 10], type=pa.int64()),
            "lang1": pa.array(["py", "py"]),
            "lang2": pa.array(["py", "py"]),
            "sig1": sig,
            "sig2": sig,
        }
        if with_emb:
            e1 = np.array([[1, 0, 0], [1, 0, 0]], dtype=np.float32)
            e2 = np.array([[1, 0, 0], [0, 1, 0]], dtype=np.float32)  # cos 1, 0
            cols["emb1"] = pa.FixedSizeListArray.from_arrays(
                pa.array(e1.reshape(-1), type=pa.float32()), 3
            )
            cols["emb2"] = pa.FixedSizeListArray.from_arrays(
                pa.array(e2.reshape(-1), type=pa.float32()), 3
            )
        return pa.table(cols)

    scorer = PairScorer(agg_expr="@max(content_minhash, emb_cos)", keep_all=True)
    with_emb = scorer(pairs_table(True)).to_pandas().sort_values("u")
    # identical sigs => content_minhash == 1 for both; emb differs only in
    # a @max so scores stay 1 — check the channel via a pure-emb expr
    scorer2 = PairScorer(agg_expr="emb_cos", keep_all=True, threshold=-1.0)
    s2 = scorer2(pairs_table(True)).to_pandas().sort_values("u")
    assert np.allclose(s2.score.to_numpy(), [1.0, 0.0], atol=1e-6)
    assert np.allclose(with_emb.score.to_numpy(), [1.0, 1.0], atol=1e-6)
    # absent emb columns: channel NaN-skips inside @max, no crash, no 0-bias
    s3 = scorer(pairs_table(False)).to_pandas().sort_values("u")
    assert np.allclose(s3.score.to_numpy(), [1.0, 1.0], atol=1e-6)


def test_char_class_histogram_unit():
    """type_hist bins are L2-normalized char-class distributions."""
    import numpy as np
    import pyarrow as pa

    from takco_ray.stages.minhash import char_class_histogram

    h = char_class_histogram(pa.array(["abc123", "   ", "!!!", ""]))
    m = np.asarray(h.values).reshape(-1, 5)
    # "abc123": 3 alpha + 3 digit → equal weight, no other classes
    assert np.allclose(m[0], [3, 3, 0, 0, 0] / np.sqrt(18), atol=1e-6)
    assert np.allclose(m[1], [0, 0, 1, 0, 0], atol=1e-6)  # all whitespace
    assert np.allclose(m[2], [0, 0, 0, 1, 0], atol=1e-6)  # all punct
    assert np.allclose(m[3], 0.0)  # empty string → zero vector


def test_pair_scorer_type_cos_channel(ray_session):
    """type_cos is live when type_hist1/2 ride the pair rows (reference
    TypeCosMatcher analog) and NaN-skips when absent."""
    import numpy as np
    import pyarrow as pa

    from takco_ray.stages.scoring import PairScorer

    def pairs_table(with_th):
        sig = pa.FixedSizeListArray.from_arrays(
            pa.array(np.arange(8, dtype=np.uint16)), 4
        )
        cols = {
            "id1": pa.array([1, 3], type=pa.int64()),
            "id2": pa.array([2, 4], type=pa.int64()),
            "path1": pa.array(["a", "b"]),
            "path2": pa.array(["a", "b"]),
            "size1": pa.array([10, 10], type=pa.int64()),
            "size2": pa.array([10, 10], type=pa.int64()),
            "lang1": pa.array(["py", "py"]),
            "lang2": pa.array(["py", "py"]),
            "sig1": sig,
            "sig2": sig,
        }
        if with_th:
            t1 = np.array(
                [[1, 0, 0, 0, 0], [1, 0, 0, 0, 0]], dtype=np.float32
            )
            t2 = np.array(
                [[1, 0, 0, 0, 0], [0, 1, 0, 0, 0]], dtype=np.float32
            )  # cos 1, 0
            cols["type_hist1"] = pa.FixedSizeListArray.from_arrays(
                pa.array(t1.reshape(-1), type=pa.float32()), 5
            )
            cols["type_hist2"] = pa.FixedSizeListArray.from_arrays(
                pa.array(t2.reshape(-1), type=pa.float32()), 5
            )
        return pa.table(cols)

    scorer = PairScorer(agg_expr="type_cos", keep_all=True, threshold=-1.0)
    s = scorer(pairs_table(True)).to_pandas().sort_values("u")
    assert np.allclose(s.score.to_numpy(), [1.0, 0.0], atol=1e-6)
    # absent type_hist: NaN-skip inside @max, no crash
    scorer2 = PairScorer(agg_expr="@max(content_minhash, type_cos)", keep_all=True)
    s2 = scorer2(pairs_table(False)).to_pandas().sort_values("u")
    assert np.allclose(s2.score.to_numpy(), [1.0, 1.0], atol=1e-6)


def test_type_channel_f1_not_worse(er_result, test_corpus, ray_session):
    """With type_cos added to the default DSL via @max, gold-corpus F1 must
    be >= the channel-off run (same guarantee the emb channel carries)."""
    import pyarrow.parquet as pq

    pairs = pq.read_table(test_corpus["dir"] + "/labeled_pairs.parquet").to_pandas()
    _, labels_off, _ = er_result
    f1_off, _, _ = _pairwise_f1(labels_off, pairs)

    cfg_on = ERConfig(
        type_channel=True,
        agg_expr="@max(content_minhash, @mean(content_minhash, @pow(path_jw, 4)),"
        " @mean(content_minhash, type_cos))",
    )
    labels_on = er_pipeline(test_corpus["files"], cfg_on)["labels"].to_pandas()
    f1_on, _, _ = _pairwise_f1(labels_on, pairs)
    assert f1_on >= f1_off - 1e-12, f"on={f1_on} off={f1_off}"


def _ref_classification(keys_gold, keys_pred, only_annotated, any_annotated):
    """Pure-pandas emulation of the reference's ``classification``
    (takco/evaluate/score.py:8-30) → (tp, fp, fn)."""
    import pandas as pd

    union = sorted(keys_gold | keys_pred)
    if not union:
        return 0, 0, 0
    df = pd.DataFrame(
        {
            "gold": [k in keys_gold for k in union],
            "pred": [k in keys_pred for k in union],
        },
        index=pd.MultiIndex.from_tuples(union),
    )
    levels = list(range(df.index.nlevels))[:-1]
    if only_annotated:
        df = df[df.groupby(level=levels).gold.transform("any")]
    if any_annotated:
        anypred = df.pred.groupby(level=levels).transform("any")
        anycorrect = (df.pred & df.gold).groupby(level=levels).transform("any")
        fn = df[~anypred].groupby(level=levels).head(1)
        fp = df[(~anycorrect) & df.pred].groupby(level=levels).head(1)
        tp = df[df.pred & df.gold].groupby(level=levels).head(1)
        df = pd.concat([fn, fp, tp])
    return (
        int((df.pred & df.gold).sum()),
        int((df.pred & ~df.gold).sum()),
        int((~df.pred & df.gold).sum()),
    )


def test_score_annotations_matches_reference_semantics(ray_session):
    """score_annotations vs a pandas emulation of the reference's
    classification across all mode combinations on a fixture exercising
    multi-answer targets, wrong-only targets, unpredicted targets and
    unannotated-but-predicted targets."""
    import pyarrow as pa
    import ray.data

    from takco_ray.stages.report import score_annotations

    # keys: (table, col, uri)
    gold = {
        ("t0", 0, "u1"), ("t0", 0, "u2"),   # multi-answer target
        ("t0", 1, "u3"),                     # predicted wrong
        ("t1", 0, "u4"),                     # not predicted at all
        ("t1", 1, "u5"),                     # predicted right
    }
    pred = {
        ("t0", 0, "u1"),                     # one of two right answers
        ("t0", 1, "u9"),                     # wrong
        ("t1", 1, "u5"),                     # right
        ("t2", 0, "u6"), ("t2", 0, "u7"),   # unannotated target, 2 preds
    }

    def ds_of(keys):
        ks = sorted(keys)
        return ray.data.from_arrow(
            pa.table(
                {
                    "table": pa.array([k[0] for k in ks]),
                    "col": pa.array([k[1] for k in ks], type=pa.int64()),
                    "uri": pa.array([k[2] for k in ks]),
                }
            )
        )

    for only in (False, True):
        for anym in (False, True):
            got = score_annotations(
                ds_of(pred), ds_of(gold), ["table", "col"], "uri",
                only_annotated=only, any_annotated=anym, num_partitions=4,
            ).take_all()[0]
            tp, fp, fn = _ref_classification(gold, pred, only, anym)
            assert (got["tp"], got["fp"], got["fn"]) == (tp, fp, fn), (
                only, anym, got,
            )
            if tp + fp:
                assert got["precision"] == pytest.approx(tp / (tp + fp), abs=1e-6)
            if tp + fn:
                assert got["recall"] == pytest.approx(tp / (tp + fn), abs=1e-6)


def test_score_annotations_randomized_vs_reference(ray_session):
    """Randomized small annotation sets, all four modes, exact tp/fp/fn
    parity with the reference emulation."""
    import random

    import pyarrow as pa
    import ray.data

    from takco_ray.stages.report import score_annotations

    rng = random.Random(7)
    for trial in range(4):
        targets = [(f"t{i}", c) for i in range(4) for c in range(3)]
        uris = [f"u{i}" for i in range(5)]
        gold = {
            (*t, u) for t in targets for u in uris if rng.random() < 0.25
        }
        pred = {
            (*t, u) for t in targets for u in uris if rng.random() < 0.25
        }
        if not (gold | pred):
            continue

        def ds_of(keys):
            ks = sorted(keys)
            return ray.data.from_arrow(
                pa.table(
                    {
                        "table": pa.array([k[0] for k in ks]),
                        "col": pa.array([k[1] for k in ks], type=pa.int64()),
                        "uri": pa.array([k[2] for k in ks]),
                    }
                )
            )

        for only in (False, True):
            for anym in (False, True):
                got = score_annotations(
                    ds_of(pred), ds_of(gold), ["table", "col"], "uri",
                    only_annotated=only, any_annotated=anym,
                    num_partitions=4,
                ).take_all()[0]
                want = _ref_classification(gold, pred, only, anym)
                assert (got["tp"], got["fp"], got["fn"]) == want, (
                    trial, only, anym,
                )


def test_score_annotations_empty_sides(ray_session):
    """Empty pred/gold sides short-circuit (Ray's hash join cannot build
    fully-empty partitions) with mode-correct counts."""
    import pyarrow as pa
    import ray.data

    from takco_ray.stages.report import score_annotations

    empty = ray.data.from_arrow(
        pa.table(
            {
                "table": pa.array([], type=pa.string()),
                "col": pa.array([], type=pa.int64()),
                "uri": pa.array([], type=pa.string()),
            }
        )
    )
    full = ray.data.from_arrow(
        pa.table(
            {
                "table": ["t0", "t0"],
                "col": pa.array([0, 1], type=pa.int64()),
                "uri": ["u1", "u2"],
            }
        )
    )
    for only in (False, True):
        for anym in (False, True):
            kw = dict(only_annotated=only, any_annotated=anym, num_partitions=2)
            r = score_annotations(empty, empty, ["table", "col"], "uri", **kw).take_all()[0]
            assert (r["tp"], r["fp"], r["fn"]) == (0, 0, 0)
            r = score_annotations(empty, full, ["table", "col"], "uri", **kw).take_all()[0]
            assert (r["tp"], r["fp"], r["fn"]) == (0, 0, 2)
            r = score_annotations(full, empty, ["table", "col"], "uri", **kw).take_all()[0]
            assert (r["tp"], r["fp"], r["fn"]) == (0, 0 if only else 2, 0)
