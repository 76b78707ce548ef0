"""Shared fixtures: ONE Ray session per pytest session; cached corpora."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_MED = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
    )
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def test_corpus(tmp_path_factory):
    """Deterministic 2k-file corpus with gold sidecars (FIXTURES.md)."""
    from takco_ray.corpus import CorpusConfig, generate_corpus, SCALES

    out = "/tmp/takco_fixtures/test"
    manifest = generate_corpus(out, CorpusConfig(n_files=SCALES["test"]))
    return {"dir": out, "files": os.path.join(out, "files"), "manifest": manifest}
