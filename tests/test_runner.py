"""TOML pipeline runner + content normalization."""

import json
import os
import shutil


def test_normalize_content(ray_session):
    import pyarrow as pa
    import ray.data
    from takco_ray.stages.normalize import normalize_content

    ds = ray.data.from_arrow(
        pa.table(
            {
                "content": pa.array(
                    [
                        "x = 1  # trailing comment\n\n\n y   =  2\n",
                        "a /* block\ncomment */ b // line\n",
                    ],
                    type=pa.large_string(),
                )
            }
        )
    )
    out = normalize_content(ds).to_pandas()
    assert out.content_norm[0] == "x = 1\n y = 2"
    assert out.content_norm[1] == "a b"


def test_toml_runner_end_to_end(ray_session, test_corpus, tmp_path):
    from takco_ray.run import run_config
    import pyarrow.parquet as pq

    workdir = str(tmp_path / "ckpt")
    outdir = str(tmp_path / "labels")
    cfg = tmp_path / "pipeline.toml"
    cfg.write_text(
        f'corpus = "{test_corpus["files"]}"\n'
        f'workdir = "{workdir}"\n'
        f'output = "{outdir}"\n'
        "[er]\nthreshold = 0.65\n"
    )
    metrics = run_config(str(cfg))
    assert set(metrics) == {"signatures", "edges", "clusters"}
    rows = pq.read_table(outdir).num_rows
    assert rows == test_corpus["manifest"]["n_files"]
    # resume: second invocation reuses every stage checkpoint
    metrics2 = run_config(str(cfg))
    assert all(m["skipped"] for m in metrics2.values())


def test_checkpoint_invalidated_by_corpus_change(ray_session, tmp_path):
    """A changed corpus under the same checkpoint root must NOT reuse stale
    signatures (SURVEY §7.5 item 7; reference footgun __init__.py:661-663)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    from takco_ray.pipelines.er import ERConfig, er_pipeline

    corpus = tmp_path / "files"
    corpus.mkdir()
    root = str(tmp_path / "ckpt")

    def write_shard(texts, name="shard_00000.parquet"):
        n = len(texts)
        pq.write_table(
            pa.table(
                {
                    "repo": [f"r/{i}" for i in range(n)],
                    "path": [f"p/{i}.py" for i in range(n)],
                    "commit": [f"c{i}" for i in range(n)],
                    "lang": ["py"] * n,
                    "content": pa.array(texts, type=pa.large_string()),
                }
            ),
            str(corpus / name),
        )

    write_shard(["alpha beta gamma delta epsilon zeta"] * 2 + ["unique one two three four five"])
    r1 = er_pipeline(str(corpus), ERConfig(), checkpoint_root=root)
    shas1 = sorted(x["sha256"] for x in r1["labels"].take_all())

    # mutate the corpus: different content, same shard name
    write_shard(["totally different text payload here now"] * 3)
    r2 = er_pipeline(str(corpus), ERConfig(), checkpoint_root=root)
    assert not r2["metrics"]["signatures"].get("skipped"), "stale checkpoint reused!"
    shas2 = sorted(x["sha256"] for x in r2["labels"].take_all())
    assert shas1 != shas2


def test_per_partition_resume_skips_finished(ray_session, tmp_path):
    """Kill mid-stage → rerun skips the finished shard-group partitions."""
    import ray.data
    import pyarrow as pa
    from takco_ray.state.checkpoint import StageRunner, stage_fingerprint

    shards = []
    for i in range(4):
        p = tmp_path / f"in_{i}.parquet"
        import pyarrow.parquet as pq

        pq.write_table(pa.table({"x": list(range(i * 10, i * 10 + 10))}), str(p))
        shards.append(str(p))
    groups = [[shards[0], shards[1]], [shards[2]], [shards[3]]]
    fp = stage_fingerprint("s", {"v": 1})
    calls = []

    def build(paths):
        calls.append(tuple(paths))
        if len(calls) == 3 and not getattr(build, "second", False):
            raise RuntimeError("simulated crash on partition 3")
        return ray.data.read_parquet(paths)

    runner = StageRunner(str(tmp_path / "root"))
    try:
        runner.run_sharded("s", fp, groups, build)
        assert False, "expected simulated crash"
    except RuntimeError:
        pass

    build.second = True
    runner2 = StageRunner(str(tmp_path / "root"))
    out = runner2.run_sharded("s", fp, groups, build)
    m = runner2.metrics["s"]
    assert m["partitions_skipped"] == 2  # first two groups reused
    assert out.count() == 40
    # third run: everything skipped
    runner3 = StageRunner(str(tmp_path / "root"))
    runner3.run_sharded("s", fp, groups, build)
    assert runner3.metrics["s"]["partitions_skipped"] == 3


def test_normalize_clusters_comment_churn(ray_session, tmp_path):
    """With cfg.normalize, clones differing only in comments/whitespace land
    in one cluster even when raw-content shingles would miss them."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from takco_ray.pipelines.er import ERConfig, er_pipeline

    corpus = tmp_path / "files"
    corpus.mkdir()
    base_lines = [f"def fn_{i}(a, b):\n    return a + b * {i}" for i in range(40)]
    base = "\n".join(base_lines) + "\n"
    # clone: a distinct comment after EVERY line — kills most raw shingles
    noisy = "".join(
        line + f"  # noise_{j}\n"
        for j, line in enumerate(base.splitlines())
    )
    others = [
        "\n".join(f"class K{j}_{i}:\n    field_{j}_{i} = {i+j}" for i in range(40)) + "\n"
        for j in range(6)
    ]
    texts = [base, noisy] + others
    n = len(texts)
    pq.write_table(
        pa.table(
            {
                "repo": [f"r/{i}" for i in range(n)],
                "path": [f"p/{i}.py" for i in range(n)],
                "commit": [f"c{i}" for i in range(n)],
                "lang": ["py"] * n,
                "content": pa.array(texts, type=pa.large_string()),
            }
        ),
        str(corpus / "shard_00000.parquet"),
    )

    raw = er_pipeline(str(corpus), ERConfig(normalize=False))
    raw_labels = {x["path"]: x["cluster_id"] for x in raw["labels"].take_all()}
    norm = er_pipeline(str(corpus), ERConfig(normalize=True))
    norm_labels = {x["path"]: x["cluster_id"] for x in norm["labels"].take_all()}

    assert raw_labels["p/0.py"] != raw_labels["p/1.py"], "comment churn should break raw similarity"
    assert norm_labels["p/0.py"] == norm_labels["p/1.py"], "normalization should restore the clone pair"


def test_generic_stage_pipeline_with_resume(ray_session, tmp_path):
    """[[stage]] TOML: exact-dedup → minhash-dedup → quality-filter chain
    end-to-end with per-stage checkpoints and resume (reference chain_step,
    takco/__init__.py:654-695)."""
    import pyarrow.parquet as pq
    from takco_ray.run import run_config

    workdir = str(tmp_path / "ckpt")
    outdir = str(tmp_path / "out")
    cfg = tmp_path / "pipe.toml"
    cfg.write_text(
        f'workdir = "{workdir}"\n'
        "[[stage]]\n"
        'op = "read_parquet"\npath = "/root/testdata/sf0.001/documents.parquet"\n'
        'columns = ["doc_id", "text"]\noutput = "docs"\n'
        "[[stage]]\n"
        'op = "exact_dedup"\ninput = "docs"\ntext_column = "text"\nid_column = "doc_id"\noutput = "uniq"\n'
        "[[stage]]\n"
        'op = "minhash_dedup"\ninput = "uniq"\ntext_column = "text"\nid_column = "doc_id"\nthreshold = 0.5\noutput = "neardup"\n'
        "[[stage]]\n"
        'op = "filter"\ninput = "neardup"\nexpr = "is_representative == True"\noutput = "reps"\n'
        "[[stage]]\n"
        'op = "quality_scores"\ninput = "docs"\ntext_column = "text"\nid_column = "doc_id"\noutput = "scores"\n'
        "[[stage]]\n"
        'op = "filter"\ninput = "scores"\nexpr = "quality > 0.2"\noutput = "good"\n'
        "[[stage]]\n"
        'op = "write_parquet"\ninput = "good"\npath = "' + outdir + '"\n'
    )
    m1 = run_config(str(cfg))
    assert not any(v.get("skipped") for v in m1.values() if isinstance(v, dict))
    rows = pq.read_table(outdir).num_rows
    assert rows > 0
    # resume: all dataset-producing stages reuse checkpoints
    m2 = run_config(str(cfg))
    produced = {k: v for k, v in m2.items() if isinstance(v, dict) and not v.get("sink")}
    assert produced and all(v.get("skipped") for v in produced.values())


def test_stage_pipeline_relational_and_decontam_ops(ray_session, tmp_path):
    """[[stage]] TOML exercising the round-2 relational/text ops:
    hash_sample → decontaminate (benchmark = sampled slice) → anti_join of
    contaminated docs out → top-n longest per language."""
    import pyarrow.parquet as pq
    from takco_ray.run import run_config

    outdir = str(tmp_path / "out")
    cfg = tmp_path / "pipe.toml"
    cfg.write_text(
        f'workdir = "{tmp_path / "ckpt"}"\n'
        "[[stage]]\n"
        'op = "read_parquet"\npath = "/root/testdata/sf0.001/documents.parquet"\n'
        'columns = ["doc_id", "text", "lang", "n_chars"]\noutput = "docs"\n'
        "[[stage]]\n"
        'op = "hash_sample"\ninput = "docs"\nid_column = "doc_id"\nmodulus = 1000\nkeep = 50\noutput = "bench"\n'
        "[[stage]]\n"
        'op = "decontaminate"\ninput = "docs"\nbenchmark = "bench"\ntext_column = "text"\nid_column = "doc_id"\noutput = "contam"\n'
        "[[stage]]\n"
        'op = "filter"\ninput = "contam"\nexpr = "n_contaminated > 0"\noutput = "dirty"\n'
        "[[stage]]\n"
        'op = "anti_join"\ninput = "docs"\nright = "dirty"\non = "doc_id"\nright_on = "id"\noutput = "clean"\n'
        "[[stage]]\n"
        'op = "top_n_per_group"\ninput = "clean"\ngroup_col = "lang"\norder_col = "n_chars"\nn = 2\ntiebreak_col = "doc_id"\noutput = "tops"\n'
        "[[stage]]\n"
        'op = "write_parquet"\ninput = "tops"\npath = "' + outdir + '"\n'
    )
    run_config(str(cfg))
    out = pq.read_table(outdir)
    df = out.to_pandas()
    assert set(df.columns) >= {"lang", "doc_id", "n_chars", "rank"}
    assert (df.groupby("lang").size() <= 2).all()
    # the benchmark docs themselves are contaminated by construction,
    # so none of them survive the anti-join
    bench_ids = set(
        pq.read_table("/root/testdata/sf0.001/documents.parquet", columns=["doc_id"])
        .column("doc_id").to_pylist()
    )
    bench_ids = {i for i in bench_ids if (i * 2654435761) % 1000 < 50}
    assert bench_ids and not (set(df.doc_id) & bench_ids)


def test_incremental_er_toml_stage_pipeline(ray_session, tmp_path):
    """[[stage]] TOML: er (base labels) + er_signatures → incremental_er over
    a second corpus batch — the continuous-ingest path composed from config."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from takco_ray.run import run_config

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
        "base", {"a0": text(1), "a1": text(1) + " tail", "s0": text(3)}
    )
    new_dir = write(
        "new", {"n0": text(1) + " extra", "n1": text(9), "n2": text(9) + " tail"}
    )
    base_out = str(tmp_path / "base_labels")
    inc_out = str(tmp_path / "inc_labels")
    cfg = tmp_path / "inc.toml"
    cfg.write_text(
        "[[stage]]\n"
        f'op = "er"\ncorpus = "{base_dir}"\nthreshold = 0.5\noutput = "base_labels"\n'
        "[[stage]]\n"
        f'op = "er_signatures"\ncorpus = "{base_dir}"\nthreshold = 0.5\noutput = "base_sigs"\n'
        "[[stage]]\n"
        f'op = "incremental_er"\ncorpus = "{new_dir}"\nthreshold = 0.5\n'
        'base_labels = "base_labels"\nbase_signatures = "base_sigs"\noutput = "inc"\n'
        "[[stage]]\n"
        f'op = "write_parquet"\ninput = "base_labels"\npath = "{base_out}"\n'
        "[[stage]]\n"
        f'op = "write_parquet"\ninput = "inc"\npath = "{inc_out}"\n'
    )
    run_config(str(cfg))
    base = pq.read_table(base_out).to_pandas()
    inc = pq.read_table(inc_out).to_pandas()
    assert len(inc) == 3
    base_by_path = base.set_index("path")
    got = dict(zip(inc.file_id, inc.cluster_id))
    new_ids = set(inc.file_id)
    # n0 attaches to the a0/a1 base cluster; n1+n2 form a NEW cluster
    assert got[min(new_ids)] is not None  # schema sanity
    a_cluster = base_by_path.loc["a0.py", "cluster_id"]
    attached = [cid for cid in inc.cluster_id if cid == a_cluster]
    assert len(attached) == 1
    fresh = inc[inc.cluster_id != a_cluster]
    assert fresh.cluster_id.nunique() == 1 and len(fresh) == 2
    assert fresh.cluster_id.iloc[0] in new_ids


def test_refined_er_toml_pipeline(ray_session, tmp_path):
    """[[stage]] TOML: er with refine_threshold + score_clusters report —
    the examples/er_refined.toml shape end-to-end on a tiny corpus."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from takco_ray.run import run_config

    corpus = tmp_path / "files"
    corpus.mkdir()
    text = " ".join(f"tok{i}" for i in range(200))
    pq.write_table(
        pa.table(
            {
                "repo": ["r/a", "r/b", "r/c"],
                "path": ["a.py", "b.py", "c.py"],
                "commit": ["c"] * 3,
                "lang": ["py"] * 3,
                "content": pa.array(
                    [text, text + " tail", "totally different " * 40],
                    type=pa.large_string(),
                ),
            }
        ),
        str(corpus / "shard_00000.parquet"),
    )
    out = str(tmp_path / "report")
    cfg = tmp_path / "refined.toml"
    cfg.write_text(
        "[[stage]]\n"
        f'op = "er"\ncorpus = "{corpus}"\nrefine_threshold = 0.8\noutput = "labels"\n'
        "[[stage]]\n"
        'op = "select_columns"\ninput = "labels"\ncolumns = ["file_id", "cluster_id"]\noutput = "gold_src"\n'
        "[[stage]]\n"
        f'op = "write_parquet"\ninput = "labels"\npath = "{out}"\n'
    )
    run_config(str(cfg))
    lab = pq.read_table(out).to_pandas()
    assert len(lab) == 3
    # near-identical pair scores ~1.0 → survives the 0.8 refinement bar
    assert lab.set_index("path").loc["a.py", "cluster_id"] == lab.set_index("path").loc["b.py", "cluster_id"]
    assert lab.cluster_id.nunique() == 2


def test_write_shards_partitioned_output(ray_session, tmp_path):
    """write_shards sink: Feistel-sharded parquet layout (shard=K/ dirs),
    rows round-trip exactly, every shard non-pathological, and the shard
    values in each partition dir agree with the directory key."""
    import glob
    import os

    import pyarrow.parquet as pq
    from takco_ray.run import run_config

    outdir = str(tmp_path / "shards")
    cfg = tmp_path / "pipe.toml"
    cfg.write_text(
        "[[stage]]\n"
        'op = "read_parquet"\npath = "/root/testdata/sf0.001/documents.parquet"\n'
        'columns = ["doc_id", "text"]\noutput = "docs"\n'
        "[[stage]]\n"
        f'op = "write_shards"\ninput = "docs"\npath = "{outdir}"\n'
        "num_shards = 4\nseed = 9\n"
    )
    run_config(str(cfg))
    dirs = sorted(glob.glob(os.path.join(outdir, "shard=*")))
    assert len(dirs) == 4
    back = pq.read_table(outdir)
    src = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    assert back.num_rows == src.num_rows
    assert sorted(back.column("doc_id").to_pylist()) == sorted(
        src.column("doc_id").to_pylist()
    )
    # shuffle_key column rides along; keys are unique (bijection)
    keys = back.column("shuffle_key").to_pylist()
    assert len(set(keys)) == len(keys)
    sizes = [pq.read_table(d).num_rows for d in dirs]
    assert min(sizes) > 0


def test_curation_pipeline_example_toml(ray_session, tmp_path):
    """examples/curation_pipeline.toml end-to-end: fused curation verdicts →
    keep-filter → near-dup reps → sharded parquet layout. Runs the example
    file as-is (workdir redirected) and checks the output invariants."""
    import glob
    import os
    import tomllib

    import pyarrow.parquet as pq

    from takco_ray.pipelines.registry import run_pipeline

    with open("examples/curation_pipeline.toml", "rb") as f:
        cfg = tomllib.load(f)
    cfg["workdir"] = str(tmp_path / "wd")
    shards_dir = str(tmp_path / "shards")
    for st in cfg["stage"]:
        if st["op"] == "write_shards":
            st["path"] = shards_dir
    out = run_pipeline(cfg)
    files = glob.glob(os.path.join(shards_dir, "**", "*.parquet"), recursive=True)
    assert files, "sharded output missing"
    tabs = [pq.read_table(f) for f in files]
    n = sum(t.num_rows for t in tabs)
    n_in = pq.read_table("/root/testdata/sf0.001/documents.parquet").num_rows
    assert 0 < n < n_in  # something was curated away, something survived
    # every shard dir is a shard= partition; doc ids unique across shards
    ids = [i for t in tabs for i in t.column("doc_id").to_pylist()]
    assert len(ids) == len(set(ids))
    assert set(os.path.basename(os.path.dirname(f)).split("=")[0] for f in files) == {"shard"}


def test_cluster_manifest_toml_stage_pipeline(ray_session, tmp_path):
    """[[stage]] TOML: near-dup cluster documents, join provenance back on,
    emit the per-cluster manifest (VERDICT r3 #7), write via the sharded
    sink — the reference merge-step artifact path composed from config."""
    import pyarrow.parquet as pq
    from takco_ray.run import run_config

    outdir = str(tmp_path / "manifest")
    cfg = tmp_path / "pipe.toml"
    cfg.write_text(
        f'workdir = "{tmp_path / "ckpt"}"\n'
        "[[stage]]\n"
        'op = "read_parquet"\npath = "/root/testdata/sf0.001/documents.parquet"\n'
        'columns = ["doc_id", "text", "source"]\noutput = "docs"\n'
        "[[stage]]\n"
        'op = "text_neardup_clusters"\ninput = "docs"\noutput = "labels"\n'
        "[[stage]]\n"
        'op = "select_columns"\ninput = "docs"\ncolumns = ["doc_id", "source"]\noutput = "src"\n'
        "[[stage]]\n"
        'op = "join"\ninput = "labels"\nright = "src"\non = ["file_id"]\nright_on = ["doc_id"]\noutput = "tagged"\n'
        "[[stage]]\n"
        'op = "cluster_manifest"\ninput = "tagged"\nsource_column = "source"\nsample_size = 4\noutput = "manifest"\n'
        "[[stage]]\n"
        'op = "write_shards"\ninput = "manifest"\npath = "' + outdir + '"\nnum_shards = 4\nid_column = "cluster_id"\n'
    )
    run_config(str(cfg))
    t = pq.read_table(outdir)
    df = t.to_pandas()
    assert set(df.columns) >= {
        "cluster_id", "size", "rep_id", "members_sample", "n_sources", "shard"
    }
    n_docs = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id"]
    ).num_rows
    assert df["size"].sum() == n_docs  # every doc in exactly one cluster row
    assert (df["n_sources"] >= 1).all()
    caps = df["members_sample"].map(len)
    assert (caps == df["size"].clip(upper=4)).all()
    assert df["rep_id"].isin(
        pq.read_table("/root/testdata/sf0.001/documents.parquet",
                      columns=["doc_id"]).column("doc_id").to_pylist()
    ).all()


def test_table_pipeline_toml_example(ray_session, tmp_path):
    """examples/table_pipeline.toml end-to-end: profile → pFD → link →
    novelty over the customer/nation tables, run as-is (workdir/output
    redirected), output invariants checked."""
    import glob
    import os
    import tomllib

    import pyarrow.parquet as pq

    from takco_ray.pipelines.registry import run_pipeline

    with open("examples/table_pipeline.toml", "rb") as f:
        cfg = tomllib.load(f)
    cfg["workdir"] = str(tmp_path / "wd")
    outdir = str(tmp_path / "novelty")
    for st in cfg["stage"]:
        if st["op"] == "write_parquet":
            st["path"] = outdir
    result = run_pipeline(cfg)

    prof = result["datasets"]["profile"].to_pandas().set_index("col_name")
    assert set(prof.index) == {"c_custkey", "c_name", "c_mktsegment"}
    pfd = result["datasets"]["pfd"].to_pandas().set_index("dep_col")
    # custkey is a key: every dependent is a perfect FD of it
    assert int(pfd.loc["c_mktsegment", "pfd_ppm"]) == 1_000_000
    linked = result["datasets"]["linked"].to_pandas()
    # customer names never match nation labels → all unresolved
    assert (linked["entity_id"] == -1).all()
    files = glob.glob(os.path.join(outdir, "*.parquet"))
    assert files
    nov = pq.read_table(files[0]).to_pandas().set_index("novelty")
    # KB == triples → everything existing
    assert set(nov.index) == {"existing"}


def test_warc_to_tables_toml_pipeline(ray_session, tmp_path):
    """[[stage]] TOML: read_warc (shard dir scan) → extract_html_tables —
    the Common-Crawl-shaped ingestion path (reference WarcPages →
    extractor), driven through the runner with checkpoints."""
    import pyarrow.parquet as pq
    from takco_ray.run import run_config
    from takco_ray.sources.warc import write_warc

    warcdir = tmp_path / "warc"
    warcdir.mkdir()
    html = (
        "<table><tr><th>h1</th><th>h2</th></tr>"
        "<tr><td>a</td><td>b</td></tr></table>"
    )
    write_warc(
        str(warcdir / "s0.warc.gz"),
        [(f"http://x.test/page/{i}", None, html) for i in range(4)],
    )
    write_warc(
        str(warcdir / "s1.warc.gz"),
        [(f"http://x.test/page/{4 + i}", None, html) for i in range(3)],
    )

    outdir = str(tmp_path / "out")
    cfg = tmp_path / "pipe.toml"
    cfg.write_text(
        f'workdir = "{tmp_path / "ckpt"}"\n'
        "[[stage]]\n"
        f'op = "read_warc"\ndir = "{warcdir}"\noutput = "pages"\n'
        "[[stage]]\n"
        'op = "extract_html_tables"\ninput = "pages"\nhtml_col = "html"\nid_col = "url"\noutput = "tables"\n'
        "[[stage]]\n"
        'op = "write_parquet"\ninput = "tables"\npath = "' + outdir + '"\n'
    )
    run_config(str(cfg))
    t = pq.read_table(outdir)
    assert t.num_rows == 7
    assert set(t.column("n_cols").to_pylist()) == {2}
    assert set(t.column("n_head").to_pylist()) == {1}


def test_refine_modularity_toml_op(ray_session, tmp_path):
    """refine_modularity registry op with levels > 1 splits the planted
    heavy-bridge hierarchy inside the runner."""
    import itertools

    import pyarrow as pa
    import pyarrow.parquet as pq
    from takco_ray.run import run_config

    A1, A2 = list(range(0, 5)), list(range(5, 10))
    B1, B2 = list(range(10, 15)), list(range(15, 20))
    eu, ev = [], []
    for grp in (A1, A2, B1, B2):
        for a, b in itertools.combinations(grp, 2):
            eu.append(a), ev.append(b)
    for top, bot in ((A1, A2), (B1, B2)):
        for i in range(8):
            eu.append(top[i % 5]), ev.append(bot[(i * 3) % 5])
    eu += [A1[0], A2[1]]
    ev += [B1[0], B2[1]]

    edges_path = str(tmp_path / "edges.parquet")
    pq.write_table(
        pa.table(
            {
                "u": pa.array(eu, type=pa.int64()),
                "v": pa.array(ev, type=pa.int64()),
                "score": pa.array([1.0] * len(eu), type=pa.float64()),
            }
        ),
        edges_path,
    )
    labels_path = str(tmp_path / "labels.parquet")
    pq.write_table(
        pa.table(
            {
                "file_id": pa.array(list(range(20)), type=pa.int64()),
                "cluster_id": pa.array([0] * 20, type=pa.int64()),
            }
        ),
        labels_path,
    )

    outdir = str(tmp_path / "out")
    cfg = tmp_path / "pipe.toml"
    cfg.write_text(
        f'workdir = "{tmp_path / "ckpt"}"\n'
        "[[stage]]\n"
        f'op = "read_parquet"\npath = "{labels_path}"\noutput = "labels"\n'
        "[[stage]]\n"
        f'op = "read_parquet"\npath = "{edges_path}"\noutput = "edges"\n'
        "[[stage]]\n"
        'op = "refine_modularity"\ninput = "labels"\nedges = "edges"\n'
        "levels = 8\nnum_partitions = 4\n"
        'output = "refined"\n'
        "[[stage]]\n"
        'op = "write_parquet"\ninput = "refined"\npath = "' + outdir + '"\n'
    )
    run_config(str(cfg))
    df = pq.read_table(outdir).to_pandas().set_index("file_id").sort_index()
    assert df.loc[0:9, "cluster_id"].nunique() == 1
    assert df.loc[10:19, "cluster_id"].nunique() == 1
    assert df.loc[0, "cluster_id"] != df.loc[10, "cluster_id"]


def test_multi_output_op_survives_checkpoint_reuse(ray_session, tmp_path):
    """A *_output extra (er's edges_output) must survive a rerun where the
    main output checkpoint-hits: the extra restores from its OWN
    checkpoint, and a downstream config change (refine levels) recomputes
    only the downstream stages — never a KeyError, never a stale reuse."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from takco_ray.run import run_config

    corpus = tmp_path / "files"
    corpus.mkdir()
    text = " ".join(f"tok{i}" for i in range(200))
    pq.write_table(
        pa.table(
            {
                "repo": ["r/a", "r/b", "r/c"],
                "path": ["a.py", "b.py", "c.py"],
                "commit": ["c"] * 3,
                "lang": ["py"] * 3,
                "content": pa.array(
                    [text, text + " tail", "totally different " * 40],
                    type=pa.large_string(),
                ),
            }
        ),
        str(corpus / "shard_00000.parquet"),
    )
    out = str(tmp_path / "refined")
    workdir = str(tmp_path / "ckpt")

    def write_cfg(levels: int):
        cfg = tmp_path / "ml.toml"
        cfg.write_text(
            f'workdir = "{workdir}"\n'
            "[[stage]]\n"
            f'op = "er"\ncorpus = "{corpus}"\nedges_output = "edges"\noutput = "labels"\n'
            "[[stage]]\n"
            f'op = "refine_modularity"\ninput = "labels"\nedges = "edges"\nlevels = {levels}\n'
            'num_partitions = 4\noutput = "refined"\n'
            "[[stage]]\n"
            f'op = "write_parquet"\ninput = "refined"\npath = "{out}"\n'
        )
        return str(cfg)

    m1 = run_config(write_cfg(1))
    assert not m1["00-er"].get("skipped")
    assert pq.read_table(out).num_rows == 3

    # rerun with a changed downstream knob: er + er.edges restore from
    # checkpoints, refine recomputes
    m2 = run_config(write_cfg(8))
    assert m2["00-er"].get("skipped")
    assert m2["00-er.edges"].get("skipped")
    assert not m2["01-refine_modularity"].get("skipped")
    assert pq.read_table(out).num_rows == 3

    # identical rerun: everything dataset-producing skips
    m3 = run_config(write_cfg(8))
    assert m3["00-er"].get("skipped") and m3["00-er.edges"].get("skipped")
    assert m3["01-refine_modularity"].get("skipped")


def test_semtab_eval_toml_pipeline(ray_session, tmp_path):
    """examples/semtab_eval.toml shape: gold-layout load → entcols cells →
    label linking → CEA annotation P/R/F1, all through registry ops."""
    import csv

    import pyarrow as pa
    import pyarrow.parquet as pq
    from takco_ray.run import run_config

    root = tmp_path / "semtab"
    (root / "tables").mkdir(parents=True)
    with open(root / "tables" / "t0.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerows(
            [["City", "Pop"], ["Berlin", "3,644,826"], ["Paris", "2,175,601"]]
        )
    with open(root / "cea.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["t0", "1", "0", "http://kb.test/Berlin"])
        w.writerow(["t0", "2", "0", "http://kb.test/Rome"])  # wrong gold → fn+fp
    kb_path = str(tmp_path / "kb.parquet")
    pq.write_table(
        pa.table(
            {
                "label": ["Berlin", "Paris", "Rome"],
                "uri": [
                    "http://kb.test/Berlin",
                    "http://kb.test/Paris",
                    "http://kb.test/Rome",
                ],
                "ent": pa.array([1, 2, 3], type=pa.int64()),
            }
        ),
        kb_path,
    )
    out = str(tmp_path / "report")
    cfg = tmp_path / "eval.toml"
    cfg.write_text(
        f'workdir = "{tmp_path / "ckpt"}"\n'
        "[[stage]]\n"
        f'op = "load_semtab"\nroot = "{root}"\noutput = "tables"\n'
        "[[stage]]\n"
        'op = "explode_table_cells"\ninput = "tables"\nentcols_only = true\noutput = "cells"\n'
        "[[stage]]\n"
        f'op = "read_parquet"\npath = "{kb_path}"\noutput = "kb"\n'
        "[[stage]]\n"
        'op = "link_cells"\ninput = "cells"\nkb = "kb"\nmention_col = "celltext"\n'
        'label_col = "label"\nid_col = "ent"\noutput = "linked"\n'
        "[[stage]]\n"
        'op = "join"\ninput = "linked"\nright = "kb"\njoin_type = "inner"\n'
        'on = ["entity_id"]\nright_on = ["ent"]\noutput = "pred"\n'
        "[[stage]]\n"
        f'op = "load_semtab_cea"\npath = "{root / "cea.csv"}"\noutput = "gold"\n'
        "[[stage]]\n"
        'op = "score_annotations"\ninput = "pred"\ngold = "gold"\n'
        'target_cols = ["table", "row_idx", "col_idx"]\nlabel_col = "uri"\n'
        'any_annotated = true\noutput = "report"\n'
        "[[stage]]\n"
        f'op = "write_parquet"\ninput = "report"\npath = "{out}"\n'
    )
    run_config(str(cfg))
    rep = pq.read_table(out).to_pandas().iloc[0]
    # Berlin correct; Paris predicted but gold says Rome → 1 tp, 1 fp, 0 fn
    # (any_annotated: the wrongly-annotated target counts one fp, and has
    # no unpredicted-target fn)
    assert (rep.tp, rep.fp, rep.fn) == (1, 1, 0)
    assert rep.precision == 0.5 and rep.recall == 1.0
