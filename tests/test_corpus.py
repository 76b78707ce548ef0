"""Corpus generator: determinism, planted-margin calibration, gold sanity."""

import json
import os
import shutil

import numpy as np
import pyarrow.parquet as pq

from takco_ray.corpus import CorpusConfig, generate_corpus
from takco_ray.functions.minhash import MinHasher


def test_regeneration_is_byte_identical(tmp_path):
    cfg = CorpusConfig(n_files=300)
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    m1 = generate_corpus(d1, cfg)
    m2 = generate_corpus(d2, cfg)
    assert m1 == m2
    for rel in ("labels.parquet", "labeled_pairs.parquet", "files/shard_00000.parquet"):
        b1 = open(os.path.join(d1, rel), "rb").read()
        b2 = open(os.path.join(d2, rel), "rb").read()
        assert b1 == b2, rel


def test_idempotent_reuse(tmp_path):
    cfg = CorpusConfig(n_files=300)
    d = str(tmp_path / "c")
    m1 = generate_corpus(d, cfg)
    mtime = os.path.getmtime(os.path.join(d, "labels.parquet"))
    m2 = generate_corpus(d, cfg)  # should short-circuit on MANIFEST match
    assert m1 == m2
    assert os.path.getmtime(os.path.join(d, "labels.parquet")) == mtime


def test_planted_margins(test_corpus):
    """Match pairs ≳0.75 shingle Jaccard, same-block negatives ≲0.55 — both
    >3σ from the 0.65 scoring threshold at 128 perms."""
    d = test_corpus["dir"]
    files = pq.read_table(os.path.join(d, "files")).to_pandas()
    labels = pq.read_table(os.path.join(d, "labels.parquet")).to_pandas()
    df = files.merge(labels, on=["repo", "path", "commit"])
    mh = MinHasher()
    sh = {
        fid: set(s.tolist())
        for fid, s in zip(df.file_id, mh.shingles_for_texts(df.content.tolist()))
    }

    def jac(a, b):
        return len(sh[a] & sh[b]) / len(sh[a] | sh[b])

    lp = pq.read_table(os.path.join(d, "labeled_pairs.parquet")).to_pandas()
    jm = np.array([jac(a, b) for a, b, m in zip(lp.id1, lp.id2, lp.is_match) if m])
    jn = np.array([jac(a, b) for a, b, m in zip(lp.id1, lp.id2, lp.is_match) if not m])
    assert jm.min() > 0.72
    assert len(jn) > 0, "fixture must contain same-block negatives"
    assert jn.max() < 0.58


def test_gold_structure(test_corpus):
    m = test_corpus["manifest"]
    assert m["n_files"] == 2000
    assert m["n_match_pairs"] < m["n_labeled_pairs"]  # negatives exist
    assert m["hot_block_sizes"][0] > 50  # skew planted
