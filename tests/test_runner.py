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
