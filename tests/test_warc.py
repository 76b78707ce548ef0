"""WARC source: stdlib record iterator, response filter, Ray shard reader.

Mirrors the reference's ``WarcPages`` semantics (``takco/extract/pages.py:
65-104``): response records only, WARC-Target-URI capture, ``?about=``
entity split, HTTP-header stripping."""

import gzip
import io

import pyarrow as pa
import pytest

from takco_ray.sources.warc import (
    iter_response_pages,
    iter_warc_records,
    page_doc_id,
    read_warc_pages,
    write_warc,
)

PAGES = [
    ("http://x.test/page/1", None, "<html><table><tr><td>a</td></tr></table></html>"),
    ("http://x.test/page/2", "http://kb.test/e2", "<html><p>two</p></html>"),
    ("http://x.test/page/3", None, "<html>three é</html>"),
]


def test_warc_roundtrip_gz(tmp_path):
    p = str(tmp_path / "fixture.warc.gz")
    n = write_warc(p, PAGES)
    assert n == 3
    got = list(iter_response_pages(p))
    assert got == [(u, a, h) for u, a, h in PAGES]


def test_warc_roundtrip_plain(tmp_path):
    p = str(tmp_path / "fixture.warc")
    write_warc(p, PAGES, extra_record_types=("request", "metadata"))
    got = list(iter_response_pages(p))
    assert [u for u, _, _ in got] == [u for u, _, _ in PAGES]
    # non-response records are present in the raw stream but filtered out
    with open(p, "rb") as f:
        types = [h.get("warc-type") for h, _ in iter_warc_records(f)]
    assert types.count("request") == 3 and types.count("metadata") == 3
    assert types.count("response") == 3


def test_warc_multi_member_gzip_is_one_stream(tmp_path):
    """Common Crawl shards are one gzip member per record; Python's gzip
    must read across member boundaries."""
    p = str(tmp_path / "multi.warc.gz")
    write_warc(p, PAGES)
    with open(p, "rb") as f:
        raw = f.read()
    # more than one gzip magic → genuinely multi-member
    assert raw.count(b"\x1f\x8b\x08") >= len(PAGES)
    with gzip.open(p, "rb") as f:
        assert len(list(iter_warc_records(f))) == 2 * len(PAGES)


def test_warc_rejects_garbage():
    with pytest.raises(ValueError, match="not a WARC"):
        list(iter_warc_records(io.BytesIO(b"HTTP/1.1 200 OK\r\n\r\n")))


def test_warc_truncated_payload():
    rec = b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 999\r\n\r\nshort"
    with pytest.raises(ValueError, match="truncated"):
        list(iter_warc_records(io.BytesIO(rec)))


def test_page_doc_id():
    assert page_doc_id("http://x.test/page/42") == 42
    assert page_doc_id("http://x.test/other") is None


def test_read_warc_pages_ray(ray_session, tmp_path):
    """Two shards → one Dataset; rows keep shard path, about split applied."""
    p1 = str(tmp_path / "s1.warc.gz")
    p2 = str(tmp_path / "s2.warc.gz")
    write_warc(p1, PAGES[:2])
    write_warc(p2, PAGES[2:])
    ds = read_warc_pages([p1, p2])
    import pandas as pd

    df = ds.to_pandas().sort_values("url").reset_index(drop=True)
    assert list(df["url"]) == [u for u, _, _ in PAGES]
    assert df.loc[1, "about"] == "http://kb.test/e2"
    assert pd.isna(df.loc[0, "about"])


def test_warc_feeds_html_extractor(ray_session, tmp_path):
    """End-to-end: WARC shard → pages → extract_tables_stage shapes."""
    from takco_ray.sources.htmltables import extract_tables_stage

    html = (
        "<html><table>"
        '<tr><th colspan="2">h</th><th>x</th></tr>'
        "<tr><td>a</td><td>b</td><td>c</td></tr>"
        "</table></html>"
    )
    p = str(tmp_path / "s.warc.gz")
    write_warc(p, [(f"http://x.test/page/{i}", None, html) for i in range(5)])
    pages = read_warc_pages([p])

    def add_id(t: pa.Table) -> pa.Table:
        ids = [page_doc_id(u) for u in t.column("url").to_pylist()]
        return t.append_column("doc_id", pa.array(ids, type=pa.int64()))

    pages = pages.map_batches(add_id, batch_format="pyarrow", zero_copy_batch=True)
    out = extract_tables_stage(pages, "html", "doc_id").to_pandas()
    assert len(out) == 5
    assert set(out["n_head"]) == {1}
    assert set(out["n_rows"]) == {2}
    assert set(out["n_cols"]) == {3}


def test_read_warc_pages_blocks_bounded(ray_session, tmp_path):
    """records_per_block caps rows per emitted block (heap independence)."""
    p = str(tmp_path / "big.warc.gz")
    write_warc(p, [(f"http://x.test/page/{i}", None, f"<p>{i}</p>") for i in range(10)])
    ds = read_warc_pages([p], records_per_block=3)
    assert ds.count() == 10


def test_warc_corrupt_shard_skip_policy(tmp_path):
    """on_error='skip' keeps records parsed before the corruption point
    and stops there (byte-counted framing has no resync); the default
    stays loud."""
    import pytest

    from takco_ray.sources.warc import iter_response_pages, write_warc

    good = str(tmp_path / "good.warc.gz")
    write_warc(good, PAGES[:2])
    # corrupt: truncate the shard mid-record
    corrupt = str(tmp_path / "corrupt.warc.gz")
    with open(good, "rb") as f:
        blob = f.read()
    with open(corrupt, "wb") as f:
        f.write(blob[: len(blob) - 40])

    with pytest.raises((ValueError, EOFError, OSError)):
        list(iter_response_pages(corrupt))
    got = list(iter_response_pages(corrupt, on_error="skip"))
    assert 0 < len(got) < len(PAGES[:2]) + 1  # prefix survived, no crash
    assert got[0][0] == PAGES[0][0]

    with pytest.raises(ValueError, match="on_error"):
        list(iter_response_pages(good, on_error="ignore"))


def test_read_warc_pages_skip_policy(ray_session, tmp_path):
    """A corrupt shard among good ones: on_error='skip' yields every good
    record plus the corrupt shard's parsed prefix."""
    from takco_ray.sources.warc import read_warc_pages, write_warc

    g = str(tmp_path / "g.warc.gz")
    write_warc(g, PAGES)
    c = str(tmp_path / "c.warc.gz")
    with open(g, "rb") as f:
        blob = f.read()
    with open(c, "wb") as f:
        f.write(blob[: len(blob) // 2])
    n = read_warc_pages([g, c], on_error="skip").count()
    assert n >= len(PAGES)  # all of g + whatever prefix of c parsed
