"""Stage-level tests over small deterministic inputs."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest

from tests.conftest import SF_DIR


def test_fingerprint_invariant(ray_session, test_corpus):
    import ray.data
    from takco_ray.stages.normalize import fingerprint
    import pyarrow.parquet as pq

    files = ray.data.read_parquet(test_corpus["files"]).limit(200)
    out = fingerprint(files).to_pandas()
    for _, row in out.iterrows():
        assert row["sha256"] == hashlib.sha256(row["content"].encode()).hexdigest()
        assert row["size"] == len(row["content"].encode())
    gold = pq.read_table(test_corpus["dir"] + "/labels.parquet").to_pandas()
    merged = out.merge(gold, on=["repo", "path", "commit"], suffixes=("", "_gold"))
    assert (merged.sha256 == merged.sha256_gold).all()
    assert (merged.file_id == merged.file_id_gold).all()


def test_exact_dedup_vs_duckdb(ray_session):
    import duckdb
    from takco_ray.sources import read_table
    from takco_ray.stages.dedup import exact_dedup

    ds = read_table(SF_DIR, "documents", columns=["doc_id", "text"])
    got = (
        exact_dedup(ds, text_column="text", id_column="doc_id")
        .to_pandas()[["doc_id", "dup_count"]]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = (
        duckdb.sql(
            f"""SELECT min(doc_id) AS doc_id, count(*) AS dup_count
            FROM read_parquet('{SF_DIR}/documents.parquet') GROUP BY text
            ORDER BY doc_id"""
        )
        .df()
        .reset_index(drop=True)
    )
    assert got.doc_id.tolist() == want.doc_id.tolist()
    assert got.dup_count.tolist() == want.dup_count.tolist()


def test_minhash_dedup_finds_planted_near_dups(ray_session):
    """Planted corpus: exact + near duplicates cluster; distinct docs don't."""
    import ray.data
    from takco_ray.stages.dedup import minhash_dedup_labels

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    near = base.replace("gamma", "gammaX", 1)
    other = "one two three four five six seven eight nine ten " * 5
    rows = [(0, base), (1, base), (2, near), (3, other), (4, "solo doc " * 20)]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
                "text": [r[1] for r in rows],
            }
        )
    )
    labels = {
        int(r["file_id"]): int(r["cluster_id"])
        for r in minhash_dedup_labels(
            ds, "text", "doc_id", shingle_k=3, threshold=0.5
        ).take_all()
    }
    assert labels[0] == labels[1] == labels[2]
    assert labels[3] != labels[0]
    assert labels[4] not in (labels[0], labels[3])
    assert len(labels) == 5


def test_simhash_identical_docs_same_hash(ray_session):
    import ray.data
    from takco_ray.stages.dedup import simhash_dedup

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2], type=pa.int64()),
                "text": ["same words here", "same words here", "different entirely now"],
            }
        )
    )
    out = {int(r["id"]): (int(r["simhash"]), int(r["cluster_id"])) for r in simhash_dedup(ds, "text", "doc_id").take_all()}
    assert out[0][0] == out[1][0]
    assert out[0][1] == out[1][1] == 0
    assert out[2][0] != out[0][0]


def test_textstats_token_counts(ray_session):
    import ray.data
    from takco_ray.stages.textstats import token_counts, quality_scores, language_id

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1], type=pa.int64()),
                "text": ["The cat and the dog.", ""],
            }
        )
    )
    tc = {int(r["id"]): r for r in token_counts(ds, "text", "doc_id").take_all()}
    assert tc[0]["n_tokens"] == 5
    assert tc[0]["n_unique_tokens"] == 4  # "the" twice after lowering
    assert tc[1]["n_tokens"] == 0
    q = {int(r["id"]): r for r in quality_scores(ds, "text", "doc_id").take_all()}
    assert 0.0 <= q[0]["quality"] <= 1.0
    lid = {int(r["id"]): r for r in language_id(ds, "text", "doc_id").take_all()}
    assert lid[0]["lang_pred"] == "en"
    assert lid[1]["lang_pred"] == "und"


def test_brute_topk_matches_numpy(ray_session):
    import ray.data
    from takco_ray.stages.ann import brute_topk

    rs = np.random.RandomState(3)
    mat = rs.normal(size=(100, 16)).astype(np.float32)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(100), type=pa.int64()),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(mat.reshape(-1), type=pa.float32()), 16
                ),
            }
        )
    )
    qids = np.array([0, 5])
    out = brute_topk(ds, qids, mat[qids], k=3).to_pandas()
    matn = mat.astype(np.float64)
    matn /= np.linalg.norm(matn, axis=1, keepdims=True)
    for q in qids:
        sims = matn[q] @ matn.T
        want = set(np.argsort(-sims)[:3].tolist())
        got = set(out[out.query_id == q].neighbor_id.tolist())
        assert got == want


def test_lsh_bucket_neighbors_high_recall_on_clusters(ray_session):
    import ray.data
    from takco_ray.stages.ann import lsh_bucket_neighbors

    rs = np.random.RandomState(4)
    centers = rs.normal(size=(5, 16))
    vecs = np.concatenate([c + 0.01 * rs.normal(size=(4, 16)) for c in centers])
    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(20), type=pa.int64()),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(vecs.reshape(-1).astype(np.float32), type=pa.float32()), 16
                ),
            }
        )
    )
    pairs = lsh_bucket_neighbors(ds, dim=16, bits=4, threshold=0.99).to_pandas()
    # same-cluster pairs land in the same hyperplane bucket most of the time
    same = sum(1 for _, r in pairs.iterrows() if r.id1 // 4 == r.id2 // 4)
    assert same >= 20  # 5 clusters × C(4,2)=6 → 30 possible; ≥2/3 recall
    assert (pairs.cosine >= 0.99).all()


def test_media_features_deterministic_schema(ray_session):
    import ray.data
    from takco_ray.stages.multimodal import synthesize_media, extract_media_features

    media = ray.data.from_arrow(synthesize_media(n=32))
    out = extract_media_features(media, batch_size=8).to_pandas()
    assert len(out) == 32
    assert out.decoded.all()
    assert all(len(f) == 16 for f in out.feature)
    # features are REAL byte statistics, checked against a pure-python oracle
    import collections
    import math

    payloads = {int(r["media_id"]): r["payload"]
                for r in synthesize_media(n=32).to_pylist()}
    for _, row in out.iterrows():
        p = payloads[int(row.media_id)]
        assert row.size_bytes == len(p)
        cnt = collections.Counter(p)
        ent = -sum((c / len(p)) * math.log2(c / len(p)) for c in cnt.values())
        assert row.entropy_bits == pytest.approx(ent, abs=1e-9)
        coarse = np.bincount(np.frombuffer(p, np.uint8) >> 4, minlength=16) / len(p)
        assert np.allclose(np.asarray(row.feature), coarse, atol=1e-6)
        printable = sum(1 for b in p if 32 <= b < 127) / len(p)
        assert row.printable_ratio == pytest.approx(printable, abs=1e-9)
    # magic-number sniff: synthetic payloads carry true container signatures
    fmt = out.set_index("kind").detected_format
    assert set(fmt.loc["image"]) == {"png"}
    assert set(fmt.loc["audio"]) == {"riff-wav"}
    assert set(fmt.loc["video"]) == {"mp4"}
    assert out.kind_matches.all()
    out2 = extract_media_features(
        ray.data.from_arrow(synthesize_media(n=32)), batch_size=8
    ).to_pandas()
    a = np.stack(out.sort_values("media_id").feature.to_numpy())
    b = np.stack(out2.sort_values("media_id").feature.to_numpy())
    assert np.array_equal(a, b)


def test_media_features_kind_filter_and_mismatch(ray_session):
    """kind_filter skips rows (decoded=False, zeroed stats) and a payload
    whose magic disagrees with its declared kind gets kind_matches=False."""
    import pyarrow as pa
    import ray.data
    from takco_ray.stages.multimodal import extract_media_features

    tbl = pa.table(
        {
            "media_id": pa.array([1, 2, 3], type=pa.int64()),
            "kind": pa.array(["image", "audio", "image"]),
            # 1: real PNG magic; 2: PNG magic but declared audio; 3: garbage
            "payload": pa.array(
                [b"\x89PNG\r\n\x1a\n" + b"abc", b"\x89PNG\r\n\x1a\n" + b"x", b"zzzz"],
                type=pa.large_binary(),
            ),
        }
    )
    out = extract_media_features(ray.data.from_arrow(tbl), batch_size=2).to_pandas()
    out = out.set_index("media_id").sort_index()
    assert out.loc[1, "detected_format"] == "png" and out.loc[1, "kind_matches"]
    assert out.loc[2, "detected_format"] == "png" and not out.loc[2, "kind_matches"]
    assert out.loc[3, "detected_format"] == "unknown" and not out.loc[3, "kind_matches"]
    only_img = extract_media_features(
        ray.data.from_arrow(tbl), kind_filter="image", batch_size=2
    ).to_pandas().set_index("media_id").sort_index()
    assert list(only_img.decoded) == [True, False, True]
    assert only_img.loc[2, "entropy_bits"] == 0.0
    assert only_img.loc[2, "size_bytes"] == 9  # true length still reported


def test_score_clusters_report(ray_session):
    """Pairwise P/R/F1 from contingency counts vs a hand-computed oracle."""
    import itertools

    import pyarrow as pa
    import ray.data
    from takco_ray.stages.report import score_clusters

    # pred clusters: {1,2,3}, {4,5}, {6}; gold: {1,2}, {3,4,5}, {6}
    ids = [1, 2, 3, 4, 5, 6]
    pred = [10, 10, 10, 20, 20, 30]
    gold = [100, 100, 200, 200, 200, 300]
    labels = ray.data.from_arrow(
        pa.table({"file_id": ids, "cluster_id": pred})
    )
    gold_ds = ray.data.from_arrow(
        pa.table({"file_id": ids, "entity_id": gold})
    )
    out = score_clusters(labels, gold_ds).take_all()[0]

    def pairs(assign):
        by = {}
        for i, a in zip(ids, assign):
            by.setdefault(a, []).append(i)
        return {
            frozenset(p)
            for members in by.values()
            for p in itertools.combinations(members, 2)
        }

    pp, gp = pairs(pred), pairs(gold)
    tp = pp & gp
    assert out["pred_pairs"] == len(pp)
    assert out["gold_pairs"] == len(gp)
    assert out["tp_pairs"] == len(tp)
    prec, rec = len(tp) / len(pp), len(tp) / len(gp)
    assert abs(out["precision"] - prec) < 1e-9
    assert abs(out["recall"] - rec) < 1e-9
    assert abs(out["f1"] - 2 * prec * rec / (prec + rec)) < 1e-9
    # ARI vs the standard contingency formula
    n = len(ids)
    total = n * (n - 1) / 2
    expected = len(pp) * len(gp) / total
    ari = (len(tp) - expected) / ((len(pp) + len(gp)) / 2 - expected)
    assert abs(out["ari"] - ari) < 1e-6
    # identical partitions → ARI 1
    self_gold = ray.data.from_arrow(pa.table({"file_id": ids, "entity_id": pred}))
    perfect = score_clusters(labels, self_gold).take_all()[0]
    assert perfect["ari"] == 1.0 and perfect["f1"] == 1.0


def test_simhash_neardup_matches_bruteforce(ray_session):
    """Banded Hamming-ball grouping finds EXACTLY the brute-force clusters."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from takco_ray.stages.dedup import _SimHasher, _hamming64, simhash_neardup

    rs = np.random.RandomState(5)
    vocab = [f"tok{i}" for i in range(400)]
    texts = []
    for i in range(40):
        base = [vocab[j] for j in rs.randint(0, 400, 60)]
        texts.append(" ".join(base))
        if i % 3 == 0:
            # near-dup: a couple of token substitutions → small hamming delta
            mut = list(base)
            for _ in range(2):
                mut[rs.randint(0, 60)] = vocab[rs.randint(0, 400)]
            texts.append(" ".join(mut))
    ids = list(range(len(texts)))
    tbl = pa.table({"doc_id": pa.array(ids, type=pa.int64()), "text": texts})

    max_h = 8
    out = simhash_neardup(
        ray.data.from_arrow(tbl), text_column="text", id_column="doc_id", max_hamming=max_h
    ).take_all()
    got = {r["file_id"]: r["cluster_id"] for r in out}

    # brute force oracle
    sh = _SimHasher("text", "doc_id")(tbl)
    h = np.asarray(sh.column("simhash")).view(np.uint64)
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a in ids:
        for b in range(a + 1, len(ids)):
            if _hamming64(h[a : a + 1], h[b : b + 1])[0] <= max_h:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    want = {i: find(i) for i in ids}
    # canonical: min id per component on both sides
    assert len(got) == len(want)
    comp_got = {}
    comp_want = {}
    for i in ids:
        comp_got.setdefault(got[i], set()).add(i)
        comp_want.setdefault(want[i], set()).add(i)
    assert sorted(map(sorted, comp_got.values())) == sorted(map(sorted, comp_want.values()))
    # at least one planted near-dup pair actually clustered
    assert any(len(c) > 1 for c in comp_want.values())


def test_cluster_size_report(ray_session):
    import pyarrow as pa
    import ray.data
    from takco_ray.stages.dedup import cluster_size_report

    labels = ray.data.from_arrow(
        pa.table({"cluster_id": [1] * 10 + [2] * 5 + [3] * 1 + [4] * 2})
    )
    rep = cluster_size_report(labels, top_k=2).take_all()[0]
    assert rep["n_clusters"] == 4
    assert rep["n_items"] == 18
    assert rep["max_size"] == 10
    assert rep["top_cluster_sizes"] == [10, 5]


def test_multimodal_resize_and_frame_sample(ray_session):
    import ray.data
    from takco_ray.stages.multimodal import synthesize_media, resize_images, sample_frames

    media = ray.data.from_arrow(synthesize_media(n=24))
    resized = resize_images(media, width=32, height=32, decoder="stub").to_pandas()
    assert len(resized) == 24
    assert (resized.width == 32).all()
    imgs = resized[resized.kind == "image"]
    assert len(imgs) and all(len(p) == max(16, 32 * 32 // 64) for p in imgs.payload)
    # determinism
    again = resize_images(
        ray.data.from_arrow(synthesize_media(n=24)), 32, 32, decoder="stub"
    ).to_pandas()
    assert list(again.payload) == list(resized.payload)

    frames = sample_frames(media, every_ms=500, max_frames=4, decoder="stub").to_pandas()
    assert set(frames.columns) == {"media_id", "frame_idx", "ts_ms", "frame_payload", "truncated"}
    assert len(frames) > 0
    assert (frames.frame_idx < 4).all()
    vids = synthesize_media(n=24).to_pandas()
    vid_ids = set(vids[vids.kind == "video"].media_id)
    assert set(frames.media_id) <= vid_ids

    # decoders are explicit, never a silent fallback: the real decoder
    # raises at construction when its library is absent, and unknown
    # decoder names are rejected
    import pytest as _pytest
    from takco_ray.stages.multimodal import _HAS_PIL

    if not _HAS_PIL:
        with _pytest.raises(ImportError, match="decoder='stub'"):
            resize_images(media, 32, 32)
    with _pytest.raises(ImportError, match="decoder='stub'"):
        sample_frames(media)
    with _pytest.raises(ValueError, match="decoder"):
        sample_frames(media, decoder="magic")


def test_csv_and_jsonl_readers_roundtrip(ray_session, tmp_path):
    """S1/S3 sources: csv + jsonl read through the same query surface."""
    import pyarrow as pa
    import ray.data
    from takco_ray.sources import read_csv_table, read_jsonl, write_dataset

    src = ray.data.from_arrow(
        pa.table({"a": [1, 2, 3], "b": ["x", "y", "z"]})
    )
    csv_dir = str(tmp_path / "csv")
    json_dir = str(tmp_path / "json")
    write_dataset(src, csv_dir, fmt="csv")
    write_dataset(src, json_dir, fmt="json")
    got_csv = read_csv_table(csv_dir).to_pandas().sort_values("a").reset_index(drop=True)
    got_json = read_jsonl(json_dir).to_pandas().sort_values("a").reset_index(drop=True)
    assert list(got_csv.a) == [1, 2, 3] and list(got_csv.b) == ["x", "y", "z"]
    assert list(got_json.a) == [1, 2, 3] and list(got_json.b) == ["x", "y", "z"]


def test_block_size_stats(ray_session, test_corpus):
    """A9: block-size distribution over band keys of the fixture corpus."""
    from takco_ray.sources import read_files_corpus
    from takco_ray.stages.normalize import fingerprint
    from takco_ray.stages.minhash import make_signature_fn
    from takco_ray.stages.blocking import block_size_stats

    files = read_files_corpus(test_corpus["files"])
    sigs = fingerprint(files).map_batches(
        make_signature_fn(), batch_format="pyarrow", zero_copy_batch=True
    )
    stats = block_size_stats(sigs)
    n_files = test_corpus["manifest"]["n_files"]
    assert stats["n_rows"] == n_files * 16  # num_bands rows per file
    assert stats["n_blocks"] > 0
    # the planted hot boilerplate block must dominate the max
    assert stats["max"] >= int(n_files * 0.04)
    assert sum(stats["log2_histogram"]) == stats["n_blocks"]


def test_ivf_topk_full_probe_equals_brute(ray_session):
    """IVF with n_probe == n_centroids is exhaustive → must equal brute_topk."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from takco_ray.stages.ann import brute_topk, ivf_topk

    rs = np.random.RandomState(3)
    n, dim = 300, 16
    mat = rs.normal(size=(n, dim))
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), type=pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(mat.astype(np.float32).reshape(-1), type=pa.float32()), dim
            ),
        }
    )
    ds = ray.data.from_arrow(tbl)
    qids = np.arange(5)
    qmat = mat[:5]
    want = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in brute_topk(ds, qids, qmat, k=5).take_all()
    }
    got = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in ivf_topk(
            ds, qids, qmat, k=5, n_centroids=8, n_probe=8, sample_size=300
        ).take_all()
    }
    assert got == want

    # reduced probe: still returns k ranked neighbors per query
    approx = ivf_topk(ds, qids, qmat, k=5, n_centroids=8, n_probe=2, sample_size=300)
    df = approx.to_pandas()
    assert set(df.query_id) == set(qids)
    assert (df.groupby("query_id")["rank"].max() == 5).all()


def test_embedding_neardup_tiled_matches_bruteforce(ray_session):
    """Tiled batch×corpus matmul (corpus_tile < n forces multiple tiles)
    reproduces the brute-force union-find clusters exactly."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from takco_ray.stages.dedup import embedding_neardup

    rs = np.random.RandomState(11)
    n, dim = 120, 8
    # planted near-dup pairs: every 4th vector gets a tiny-perturbation clone
    base = rs.normal(size=(n, dim))
    rows = []
    for i in range(n):
        rows.append(base[i])
        if i % 4 == 0:
            rows.append(base[i] + rs.normal(scale=0.01, size=dim))
    mat = np.asarray(rows, dtype=np.float32)
    m = len(mat)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(m), type=pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(mat.reshape(-1), type=pa.float32()), dim
            ),
        }
    )
    thr = 0.9
    out = embedding_neardup(
        ray.data.from_arrow(tbl), threshold=thr, corpus_tile=17
    ).take_all()
    got = {r["file_id"]: r["cluster_id"] for r in out}

    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = norm @ norm.T
    parent = list(range(m))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a in range(m):
        for b in range(a + 1, m):
            if sims[a, b] >= thr:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    want = {i: find(i) for i in range(m)}
    assert len(got) == m
    comp_got, comp_want = {}, {}
    for i in range(m):
        comp_got.setdefault(got[i], set()).add(i)
        comp_want.setdefault(want[i], set()).add(i)
    assert sorted(map(sorted, comp_got.values())) == sorted(map(sorted, comp_want.values()))
    # cluster_id is the component-min id
    assert all(k == min(v) for k, v in comp_got.items())
    # planted clones actually clustered
    assert sum(1 for c in comp_want.values() if len(c) > 1) >= 25


def test_temporal_operators_match_bruteforce(ray_session):
    """sessionize / asof_join / rolling_window_count vs brute-force Python on
    an adversarial fixture: equal-ts ties, gaps exactly at the threshold
    (same session: strict >), right ts == left ts (inclusive as-of), right-ts
    ties (max rid wins), keys with no eligible right row (dropped)."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from takco_ray.stages.temporal import asof_join, rolling_window_count, sessionize

    rs = np.random.RandomState(7)
    n, n_keys = 600, 12
    keys = rs.randint(0, n_keys, n).astype(np.int64)
    ts = np.sort(rs.randint(0, 10_000, n)).astype(np.int64)
    # plant exact ties and exact-gap pairs
    ts[100] = ts[101] = ts[102]
    ids = rs.permutation(n).astype(np.int64)
    ev = pa.table(
        {
            "event_id": pa.array(ids),
            "ts": pa.array(ts, type=pa.int64()),
            "user_id": pa.array(keys),
        }
    )
    gap, window = 50, 80

    got = {
        r["event_id"]: r["session_id"]
        for r in sessionize(
            ray.data.from_arrow(ev), "user_id", "ts", "event_id",
            gap_us=gap, num_partitions=5,
        ).take_all()
    }
    want = {}
    for k in range(n_keys):
        idx = np.flatnonzero(keys == k)
        order = idx[np.lexsort((ids[idx], ts[idx]))]
        sess: list = []
        for i in order:
            if sess and ts[i] - ts[sess[-1][-1]] <= gap:
                sess[-1].append(i)
            else:
                sess.append([i])
        for s in sess:
            m = min(ids[i] for i in s)
            for i in s:
                want[ids[i]] = m
    assert got == want

    rc = {
        r["event_id"]: r["n_window"]
        for r in rolling_window_count(
            ray.data.from_arrow(ev), "user_id", "ts", "event_id",
            window_us=window, num_partitions=5,
        ).take_all()
    }
    for i in range(n):
        same = keys == keys[i]
        assert rc[ids[i]] == int(
            np.sum(same & (ts >= ts[i] - window) & (ts <= ts[i]))
        )

    m = 150
    rkeys = rs.randint(0, n_keys + 3, m).astype(np.int64)  # some keys eventless
    rts = rs.randint(-500, 9_000, m).astype(np.int64)
    rts[10] = ts[5]  # right ts == a left ts → inclusive match
    rts[11] = rts[12] = 4_000  # duplicate right ts → max rid wins
    rkeys[11] = rkeys[12]
    rids = (1000 + rs.permutation(m)).astype(np.int64)
    rvals = rs.uniform(1, 9, m).round(3)
    orders = pa.table(
        {
            "o_orderkey": pa.array(rids),
            "o_custkey": pa.array(rkeys),
            "o_orderdate": pa.array(rts, type=pa.int64()),
            "o_totalprice": pa.array(rvals, type=pa.float64()),
        }
    )
    out = asof_join(
        ray.data.from_arrow(ev),
        ray.data.from_arrow(orders),
        left_key="user_id", right_key="o_custkey",
        left_ts="ts", right_ts="o_orderdate",
        left_id="event_id", right_id="o_orderkey",
        right_value="o_totalprice", num_partitions=5,
    ).take_all()
    got_asof = {r["event_id"]: (r["o_orderkey"], r["o_totalprice"]) for r in out}
    want_asof = {}
    for i in range(n):
        elig = np.flatnonzero((rkeys == keys[i]) & (rts <= ts[i]))
        if len(elig):
            j = elig[np.lexsort((rids[elig], rts[elig]))][-1]
            want_asof[ids[i]] = (rids[j], rvals[j])
    assert len(out) == len(want_asof) < n  # some lefts really dropped
    assert got_asof == want_asof


def test_range_join_matches_bruteforce(ray_session):
    """Banded range join (two distinct tables, asymmetric window) vs
    brute-force nested loop, including inclusive boundaries and keys
    missing from one side."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from takco_ray.stages.temporal import range_join

    rs = np.random.RandomState(13)
    nl, nr, n_keys = 300, 200, 10
    lk = rs.randint(0, n_keys, nl).astype(np.int64)
    lt = rs.randint(0, 5_000, nl).astype(np.int64)
    lid = rs.permutation(nl).astype(np.int64)
    rk = rs.randint(0, n_keys + 4, nr).astype(np.int64)
    rt = rs.randint(0, 5_000, nr).astype(np.int64)
    rt[0] = lt[0] - 40  # exactly at the 'before' boundary → included
    rk[0] = lk[0]
    rid = (5000 + np.arange(nr)).astype(np.int64)
    left = pa.table({"k": pa.array(lk), "t": pa.array(lt), "i": pa.array(lid)})
    right = pa.table({"k": pa.array(rk), "t": pa.array(rt), "i": pa.array(rid)})
    before, after = 40, 25
    out = range_join(
        ray.data.from_arrow(left),
        ray.data.from_arrow(right),
        left_key="k", right_key="k", left_ts="t", right_ts="t",
        left_id="i", right_id="i", before_us=before, after_us=after,
        left_id_out="li", right_id_out="ri", num_partitions=4,
    ).take_all()
    got = sorted((r["li"], r["ri"]) for r in out)
    want = sorted(
        (int(lid[a]), int(rid[b]))
        for a in range(nl)
        for b in range(nr)
        if lk[a] == rk[b] and lt[a] - before <= rt[b] <= lt[a] + after
    )
    assert got == want and len(want) >= 40
    assert (int(lid[0]), int(rid[0])) in got  # exact 'before' boundary included


def test_lag_deltas_matches_pandas(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from takco_ray.stages.temporal import lag_deltas

    rs = np.random.RandomState(13)
    n, n_keys = 500, 9
    keys = rs.randint(0, n_keys, n).astype(np.int64)
    ts = rs.randint(0, 5_000, n).astype(np.int64)
    ts[50] = ts[51]  # equal-ts tie inside one key → id breaks the order
    keys[50] = keys[51]
    ids = rs.permutation(n).astype(np.int64)
    ds = ray.data.from_arrow(
        pa.table({"event_id": ids, "ts": ts, "user_id": keys})
    )
    got = {
        r["event_id"]: r["delta_us"]
        for r in lag_deltas(
            ds, "user_id", "ts", "event_id", num_partitions=4
        ).take_all()
    }
    df = pd.DataFrame({"event_id": ids, "ts": ts, "user_id": keys})
    df = df.sort_values(["user_id", "ts", "event_id"])
    df["delta"] = df.groupby("user_id").ts.diff()
    exp = df[df.delta.notna()]
    assert got == dict(zip(exp.event_id, exp.delta.astype(np.int64)))


def test_group_set_jaccard_matches_bruteforce(ray_session):
    """Repo-level exact shingle Jaccard vs a Python set oracle, including
    near-identical groups (above threshold), partial overlap (below), and a
    disjoint group (no pair row)."""
    import itertools
    import re

    import pyarrow as pa
    import ray.data
    from takco_ray.stages.dedup import group_set_jaccard

    base = "the quick brown fox jumps over the lazy dog again and again today"
    docs = [
        ("repoA", base),
        ("repoA", "alpha beta gamma delta epsilon zeta eta theta"),
        ("repoB", base + " extra trailing words"),   # ~near-dup of repoA
        ("repoB", "alpha beta gamma delta epsilon zeta eta theta"),
        ("repoC", "completely different content with nothing shared at all"),
        ("repoD", "the quick brown fox sat still"),  # small overlap with A/B
    ]
    k, thr = 3, 200
    ds = ray.data.from_arrow(
        pa.table(
            {
                "source": pa.array([d[0] for d in docs]),
                "text": pa.array([d[1] for d in docs]),
            }
        )
    )
    got = {
        (r["group_a"], r["group_b"]): (r["n_common"], r["n_a"], r["n_b"])
        for r in group_set_jaccard(
            ds, "source", "text", shingle_k=k, threshold_millis=thr,
            num_partitions=3,
        ).take_all()
    }

    # oracle: distinct word-k-gram sets per group, exact Jaccard
    sets: dict = {}
    for g, t in docs:
        ws = re.findall(r"\w+", t.lower())
        sets.setdefault(g, set()).update(
            " ".join(ws[i : i + k]) for i in range(len(ws) - k + 1)
        )
    want = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        c = len(sets[a] & sets[b])
        na, nb = len(sets[a]), len(sets[b])
        if c * 1000 >= thr * (na + nb - c):
            want[(a, b)] = (c, na, nb)
    assert got == want
    assert ("repoA", "repoB") in got          # planted near-dup found
    assert all("repoC" not in p for p in got)  # disjoint group emits nothing


def test_group_minhash_tracks_exact_group_jaccard(ray_session):
    """The MinHash scale rung vs the exact audit rung on planted repo
    near-dups: the high-similarity pair is found with an estimate within
    estimator noise of the exact Jaccard; unrelated groups emit nothing."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from takco_ray.stages.dedup import group_minhash_neardup, group_set_jaccard

    rng = np.random.default_rng(23)
    vocab = [f"tok{i}" for i in range(300)]

    def doc(n, seed_words=None):
        ws = list(seed_words) if seed_words else []
        ws += [vocab[i] for i in rng.integers(0, len(vocab), n)]
        return " ".join(ws)

    shared = [vocab[i] for i in rng.integers(0, len(vocab), 400)]
    docs = []
    # repoX / repoY: heavily overlapping (same 400-token backbone)
    for g, extra in [("repoX", 30), ("repoY", 60)]:
        docs.append((g, " ".join(shared)))
        docs.append((g, doc(extra)))
    # two unrelated repos
    docs.append(("repoZ", doc(350)))
    docs.append(("repoW", doc(350)))
    ds = ray.data.from_arrow(
        pa.table(
            {
                "source": pa.array([d[0] for d in docs]),
                "text": pa.array([d[1] for d in docs]),
            }
        )
    )

    exact = {
        (r["group_a"], r["group_b"]): r["n_common"] / (r["n_a"] + r["n_b"] - r["n_common"])
        for r in group_set_jaccard(
            ds, "source", "text", shingle_k=3, threshold_millis=1, num_partitions=3
        ).take_all()
    }
    est = {
        (r["group_a"], r["group_b"]): r["est_jaccard_millis"] / 1000
        for r in group_minhash_neardup(
            ds, "source", "text", shingle_k=3, threshold_millis=300,
            num_perm=256, num_bands=64, num_partitions=3,
        ).take_all()
    }
    assert ("repoX", "repoY") in est
    j = exact[("repoX", "repoY")]
    assert j > 0.5  # the plant is a genuine near-dup
    # binomial noise at num_perm=256: sigma = sqrt(j(1-j)/256) ~ 0.03
    assert abs(est[("repoX", "repoY")] - j) < 0.12
    # nothing invented: every estimated pair exists in the exact relation
    # with a Jaccard at least near the threshold
    for pair, e in est.items():
        assert exact.get(pair, 0.0) > 0.15, (pair, e, exact.get(pair))


def test_text_neardup_clusters_transitive(ray_session):
    """A~B and B~C above threshold but A~C below it must still co-cluster
    (transitive closure), unrelated docs stay singletons, cluster_id is the
    component min."""
    import pyarrow as pa
    import ray.data
    from takco_ray.stages.dedup import ngram_jaccard_exact, text_neardup_clusters

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    mid = "lambda mu nu xi omicron pi rho sigma tau upsilon"
    a = base + " one two three"
    b = base + " " + mid[:30]  # overlaps base heavily
    c = "phi chi psi " + base  # same shingle backbone, shifted
    docs = {
        1: a,
        2: b,
        3: c,
        4: "completely unrelated words about something else entirely here",
    }
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(sorted(docs), type=pa.int64()),
                "text": pa.array([docs[i] for i in sorted(docs)]),
            }
        )
    )
    pairs = {
        (r["id1"], r["id2"]): r["jaccard"]
        for r in ngram_jaccard_exact(ds, "text", "doc_id", 3, 0.4).take_all()
    }
    labels = {
        r["file_id"]: r["cluster_id"]
        for r in text_neardup_clusters(
            ds, "text", "doc_id", shingle_k=3, threshold=0.4, num_partitions=3
        ).take_all()
    }
    assert len(labels) == 4
    # every edge's endpoints share a label; closure merges the chain
    for (u, v), _j in pairs.items():
        assert labels[u] == labels[v]
    assert labels[1] == labels[2] == labels[3] == 1  # min id of the component
    assert labels[4] == 4
    # sanity: 1-3 similarity is genuinely weaker than the chain links
    assert pairs.get((1, 2)) and pairs.get((2, 3)) or pairs.get((1, 3))


def test_cluster_representatives_merit_pick(ray_session):
    """Best-signal member per cluster, ties by id; singleton clusters keep
    their only member; the signal column rides through the join."""
    import pyarrow as pa
    import ray.data
    from takco_ray.stages.dedup import cluster_representatives

    labels = ray.data.from_arrow(
        pa.table(
            {
                "file_id": pa.array([1, 2, 3, 10, 20, 21], type=pa.int64()),
                "cluster_id": pa.array([1, 1, 1, 10, 20, 20], type=pa.int64()),
            }
        )
    )
    quality = ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array([1, 2, 3, 10, 20, 21], type=pa.int64()),
                "quality_u": pa.array([5, 9, 9, 4, 7, 7], type=pa.int64()),
            }
        )
    )
    out = {
        r["cluster_id"]: (r["rep_id"], r["quality_u"])
        for r in cluster_representatives(labels, quality, num_partitions=2).take_all()
    }
    assert out == {
        1: (2, 9),    # merit beats min-id 1; tie 2-vs-3 breaks to lower id
        10: (10, 4),  # singleton
        20: (20, 7),  # tie breaks to lower id
    }


def test_json_extract_typed_and_robust(ray_session):
    """Typed field extraction with null-not-throw on malformed/missing/empty
    rows; string/int/float casts; json column dropped."""
    import pyarrow as pa
    import ray.data
    from takco_ray.stages.normalize import json_extract

    rows = [
        '{"k": 7, "s": "x", "f": 1.5}',
        '{"k": "8"}',              # numeric string casts to int
        '{"s": 3}',                # int casts to string
        "not json",
        "",
        None,
        '[1, 2]',                  # non-dict JSON -> nulls
    ]
    ds = ray.data.from_arrow(
        pa.table({"id": pa.array(range(len(rows)), type=pa.int64()), "props": rows})
    )
    out = (
        json_extract(
            ds, "props",
            {"k": ("k", "int64"), "s": ("s", "string"), "f": ("f", "float64")},
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert "props" not in out.columns
    assert out.k.tolist()[:2] == [7, 8] and out.k.isna().tolist()[2:] == [True] * 5
    assert out.s.tolist()[0] == "x" and out.s.tolist()[2] == "3"
    assert out.f.tolist()[0] == 1.5


def test_quantized_topk_recall(ray_session):
    """int8-quantized top-k: high recall vs exact brute force; rank flips
    only possible within the ~1e-2 quantization error band."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from takco_ray.stages.ann import brute_topk, quantize_embeddings, quantized_topk

    rng = np.random.default_rng(29)
    n, dim = 400, 16
    mat = rng.normal(size=(n, dim)).astype(np.float32)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n), type=pa.int64()),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(mat.reshape(-1), type=pa.float32()), dim
                ),
            }
        )
    )
    qids = np.arange(8)
    quant = quantize_embeddings(ds, "vec_id", "embedding")
    approx = quantized_topk(quant, qids, mat[qids], k=5).to_pandas()
    exact = brute_topk(ds, qids, mat[qids], k=5).to_pandas()
    # schema parity with the exact rung
    assert set(approx.columns) == set(exact.columns)
    hits = tot = 0
    for q in qids:
        a = set(approx[approx.query_id == q].neighbor_id)
        e = set(exact[exact.query_id == q].neighbor_id)
        assert len(a) == 5 and len(e) == 5
        hits += len(a & e)
        tot += 5
    assert hits / tot >= 0.95, f"recall {hits/tot:.2f}"
    # quantized self-similarity stays ~1: cosine error bounded by quantization
    self_rows = approx[(approx.query_id == approx.neighbor_id)]
    assert (self_rows.cosine > 0.99).all()


def test_semantic_dedup_one_cell_equals_exact_neardup(ray_session):
    """With n_cells=1 the SemDeDup cells degenerate to one global cell, so
    the grouping must equal the exact embedding_neardup partition."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from takco_ray.stages.dedup import embedding_neardup, semantic_dedup

    rs = np.random.RandomState(3)
    n, dim = 90, 8
    base = rs.normal(size=(n, dim))
    rows = []
    for i in range(n):
        rows.append(base[i])
        if i % 5 == 0:
            rows.append(base[i] + rs.normal(scale=0.01, size=dim))
    mat = np.asarray(rows, dtype=np.float32)
    m = len(mat)

    def mk():
        tbl = pa.table(
            {
                "vec_id": pa.array(range(m), type=pa.int64()),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(mat.reshape(-1), type=pa.float32()), dim
                ),
            }
        )
        return ray.data.from_arrow(tbl)

    thr = 0.9
    want = {
        r["file_id"]: r["cluster_id"]
        for r in embedding_neardup(mk(), threshold=thr).take_all()
    }
    out = semantic_dedup(
        mk(), threshold=thr, n_cells=1, cell_tile=13, num_partitions=2
    ).take_all()
    got = {r["file_id"]: r["dup_group"] for r in out}
    assert got == want
    reps = {r["file_id"] for r in out if r["is_rep"]}
    assert reps == set(want.values())


def test_semantic_dedup_cells_partition_groups(ray_session):
    """Multi-cell run: every group stays inside one cell, survivors are
    group minima, and exact duplicate vectors always land in one group."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from takco_ray.stages.dedup import semantic_dedup

    rs = np.random.RandomState(8)
    n, dim = 200, 8
    mat = rs.normal(size=(n, dim)).astype(np.float32)
    mat[50] = mat[10]  # exact clones (same cell by construction)
    mat[51] = mat[10]
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), type=pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(mat.reshape(-1), type=pa.float32()), dim
            ),
        }
    )
    out = semantic_dedup(
        ray.data.from_arrow(tbl), threshold=0.999, n_cells=6, sample_size=n
    ).take_all()
    assert len(out) == n
    by_id = {r["file_id"]: r for r in out}
    assert by_id[10]["dup_group"] == by_id[50]["dup_group"] == by_id[51]["dup_group"] == 10
    assert by_id[10]["is_rep"] == 1 and by_id[50]["is_rep"] == 0
    cell_of_group = {}
    for r in out:
        g = r["dup_group"]
        cell_of_group.setdefault(g, r["cell"])
        assert cell_of_group[g] == r["cell"]
    for g in {r["dup_group"] for r in out}:
        members = [r["file_id"] for r in out if r["dup_group"] == g]
        assert g == min(members)


def test_cross_doc_dup_lines(ray_session):
    import ray.data
    from takco_ray.stages.dedup import cross_doc_dup_lines

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
            "text": [
                # "shared line" duplicated INSIDE doc 1 counts once; blank
                # lines and whitespace-only lines never count
                "alpha\nshared line\n  \nunique one\nshared line",
                "  shared line \nbeta",  # trims to the same shared line
                "gamma\ndelta",
                None,
            ],
        }
    )
    out = (
        cross_doc_dup_lines(ray.data.from_arrow(docs), "text", "doc_id")
        .to_pandas()
        .sort_values("id")
    )
    assert list(out.n_dup_lines) == [1, 1, 0, 0]


def test_remove_dup_lines(ray_session):
    import ray.data
    from takco_ray.stages.dedup import remove_dup_lines

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
            "text": [
                # duplicated-in-corpus line removed even when repeated
                # inside the doc; blank/whitespace lines always survive
                "alpha\nshared line\n  \nunique one\nshared line",
                "  shared line \nbeta",  # trims equal → removed
                "gamma\ndelta",
                "shared line",  # fully boilerplate → becomes ""
            ],
        }
    )
    out = (
        remove_dup_lines(ray.data.from_arrow(docs), "text", "doc_id")
        .to_pandas()
        .sort_values("id")
    )
    assert list(out.text) == ["alpha\n  \nunique one", "beta", "gamma\ndelta", ""]


def test_unnest_list(ray_session):
    import ray.data
    from takco_ray.stages.normalize import unnest_list

    tbl = pa.table(
        {
            "id": pa.array([10, 11, 12], type=pa.int64()),
            "xs": pa.array([[1.5, 2.5], [], [7.0]], type=pa.list_(pa.float32())),
        }
    )
    out = (
        unnest_list(ray.data.from_arrow(tbl), "xs", "id")
        .to_pandas()
        .sort_values(["id", "pos"])
        .reset_index(drop=True)
    )
    assert list(out.id) == [10, 10, 12]
    assert list(out.pos) == [0, 1, 0]
    assert list(out.val) == [1.5, 2.5, 7.0]
    assert str(out.val.dtype) == "float32"


def test_unnest_list_sliced_and_null_entries(ray_session):
    import ray.data
    from takco_ray.stages.normalize import unnest_list

    xs = pa.array([[9.0], [1.0, 2.0], None, [5.0]], type=pa.list_(pa.float32()))
    tbl = pa.table({"id": pa.array([0, 1, 2, 3], type=pa.int64()), "xs": xs})
    sliced = tbl.slice(1)  # ListArray offsets no longer start at 0
    out = (
        unnest_list(ray.data.from_arrow(sliced), "xs", "id")
        .to_pandas()
        .sort_values(["id", "pos"])
        .reset_index(drop=True)
    )
    assert list(out.id) == [1, 1, 3]
    assert list(out.pos) == [0, 1, 0]
    assert list(out.val) == [1.0, 2.0, 5.0]


def test_interval_coverage(ray_session):
    import ray.data
    from takco_ray.stages.temporal import interval_coverage

    tbl = pa.table(
        {
            "k": pa.array([1, 1, 1, 1, 2], type=pa.int64()),
            # key 1: [0,10] + [5,8] merge; [10,12] touches → merges;
            #        [20,25] separate → 2 islands, covered (12-0)+(25-20)=17
            "s": pa.array([0, 5, 10, 20, 100], type=pa.int64()),
            "e": pa.array([10, 8, 12, 25, 101], type=pa.int64()),
        }
    )
    out = (
        interval_coverage(ray.data.from_arrow(tbl), "k", "s", "e")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert list(out.n_islands) == [2, 1]
    assert list(out.covered) == [17, 1]


def test_interval_coverage_rejects_reversed_intervals(ray_session):
    import ray.data
    from takco_ray.stages.temporal import interval_coverage

    tbl = pa.table(
        {"k": pa.array([1, 1], type=pa.int64()),
         "s": pa.array([0, 20], type=pa.int64()),
         "e": pa.array([10, 3], type=pa.int64())}
    )
    with pytest.raises(Exception, match="end < start"):
        interval_coverage(ray.data.from_arrow(tbl), "k", "s", "e").to_pandas()


def test_bloom_active_filter_pairs_identical(ray_session, test_corpus):
    """Above max_active_keys the active band-key set becomes a Bloom filter
    (bounded broadcast at any corpus size). False positives only admit
    singleton-block rows, which pair-gen drops, so forcing the Bloom path
    (max_active_keys=1) must yield candidate pairs IDENTICAL to the exact
    broadcast path — via both the driver fast count path and the
    distributed streaming count path."""
    import numpy as np

    from takco_ray.sources import read_files_corpus
    from takco_ray.stages.normalize import fingerprint
    from takco_ray.stages.minhash import make_signature_fn
    from takco_ray.stages.blocking import (
        band_key_stats,
        bloom_contains,
        candidate_pairs,
    )

    files = read_files_corpus(test_corpus["files"])
    sigs = (
        fingerprint(files)
        .map_batches(make_signature_fn(), batch_format="pyarrow", zero_copy_batch=True)
        .select_columns(["file_id", "path", "size", "lang", "sig", "bands"])
        .materialize()
    )

    def pair_set(ds):
        df = ds.select_columns(["id1", "id2"]).to_pandas()
        return set(zip(df.id1.tolist(), df.id2.tolist()))

    exact = pair_set(candidate_pairs(sigs, num_partitions=8))
    bloom = pair_set(candidate_pairs(sigs, num_partitions=8, max_active_keys=1))
    assert len(exact) > 0
    assert bloom == exact

    # representation checks: no false negatives vs the exact active set,
    # from BOTH build paths (driver merge and distributed streaming merge)
    exact_keys, hot_exact = band_key_stats(sigs)
    for kwargs in (
        {"max_active_keys": 1},
        {"max_active_keys": 1, "driver_merge_threshold": 0},
    ):
        active, hot = band_key_stats(sigs, **kwargs)
        assert isinstance(active, tuple) and active[0] == "bloom"
        assert bloom_contains(active[1], active[2], exact_keys).all()
        assert hot == hot_exact
        # non-member FP rate stays near the design point (~1.2% at 10 b/key)
        rng = np.random.default_rng(7)
        probes = rng.integers(-(2**62), 2**62, size=20_000, dtype=np.int64)
        probes = probes[~np.isin(probes, exact_keys)]
        fp = bloom_contains(active[1], active[2], probes).mean()
        assert fp < 0.05


def test_group_set_jaccard_guards_group_broadcast(ray_session):
    """The per-group size broadcast is bounded: above max_groups the op
    raises instead of silently collecting an unbounded side (VERDICT r4
    item 7; mirrors skew_join's hot-row guard)."""
    import pyarrow as pa
    import pytest
    import ray.data
    from takco_ray.stages.dedup import group_set_jaccard

    ds = ray.data.from_arrow(
        pa.table(
            {
                "source": pa.array([f"repo{i}" for i in range(8)]),
                "text": pa.array(["shared words for every group here"] * 8),
            }
        )
    )
    with pytest.raises(ValueError, match="max_groups"):
        group_set_jaccard(
            ds, "source", "text", shingle_k=3, num_partitions=2, max_groups=4
        ).take_all()
    # at the limit it still runs
    out = group_set_jaccard(
        ds, "source", "text", shingle_k=3, num_partitions=2, max_groups=8
    )
    assert out.count() == 8 * 7 // 2  # identical groups: every pair emitted
