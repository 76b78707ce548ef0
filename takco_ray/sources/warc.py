"""Offline WARC page source feeding the HTML table extractor.

Re-expresses the reference's ``WarcPages`` source (SURVEY §2 S5; reference
``takco/extract/pages.py:65-104``) without warcio (not in this environment):

- :func:`iter_warc_records` — a stdlib WARC/1.0 record iterator over a
  binary stream (plain or gzip; Python's ``gzip`` transparently reads the
  concatenated per-record members Common Crawl shards use);
- :func:`iter_response_pages` — the reference's ``WarcPages.load``
  semantics: **response records only**, ``WARC-Target-URI`` capture, the
  ``?about=`` entity-URI split (``pages.py:96-99``), and HTTP-header
  stripping (warcio's ``content_stream().read()`` equivalent);
- :func:`write_warc` — a fixture/test writer emitting valid WARC/1.0
  response (+ optional request/metadata) records, one gzip member per
  record when the path ends in ``.gz`` (the Common Crawl shard layout);
- :func:`read_warc_pages` — the Ray source: a shard list becomes a
  Dataset of paths, one task per shard streams its records and emits
  ``(path, url, about, html)`` rows. At 100 TB the corpus is ~100k 1 GiB
  shards → 100k independent tasks; each task holds one record in memory
  at a time, so worker heap stays bounded by the largest single record.

``Download`` (``pages.py:23-62``) needs live HTTP and is out of scope here
(no network); its output shape is exactly one :func:`read_warc_pages` row,
so downstream stages are shared.
"""

from __future__ import annotations

import gzip
import io
import re
from typing import Iterable, Iterator

import pyarrow as pa

_CRLF = b"\r\n"


def _read_header_block(f) -> dict | None:
    """Read one WARC header block; None at EOF.

    Tolerates the inter-record ``\\r\\n\\r\\n`` separators and any number of
    blank lines between records (some writers emit extras).
    """
    line = f.readline()
    while line in (b"\r\n", b"\n"):
        line = f.readline()
    if not line:
        return None
    if not line.startswith(b"WARC/"):
        raise ValueError(f"not a WARC record header: {line[:40]!r}")
    headers: dict = {}
    while True:
        line = f.readline()
        if line in (b"\r\n", b"\n", b""):
            break
        key, _, val = line.decode("utf-8", "replace").partition(":")
        headers[key.strip().lower()] = val.strip()
    return headers


def iter_warc_records(stream) -> Iterator[tuple[dict, bytes]]:
    """Yield ``(headers, payload)`` per record from a binary WARC stream.

    ``headers`` keys are lower-cased (``warc-type``, ``warc-target-uri``,
    ``content-length``, ...); ``payload`` is the raw record block of
    ``Content-Length`` bytes (for responses: HTTP headers + body).
    """
    f = stream if hasattr(stream, "readline") else io.BufferedReader(stream)
    while True:
        headers = _read_header_block(f)
        if headers is None:
            return
        length = int(headers.get("content-length", "0"))
        payload = f.read(length) if length else b""
        if length and len(payload) < length:
            raise ValueError("truncated WARC record payload")
        yield headers, payload


def _strip_http_headers(payload: bytes) -> bytes:
    """Drop the HTTP response header block, mirroring warcio's
    ``content_stream().read()`` (reference ``pages.py:101``)."""
    if payload.startswith(b"HTTP/"):
        sep = payload.find(b"\r\n\r\n")
        if sep >= 0:
            return payload[sep + 4:]
    return payload


def iter_response_pages(
    path: str, on_error: str = "raise"
) -> Iterator[tuple[str, str | None, str]]:
    """Yield ``(url, about, html)`` for each *response* record in one shard —
    the reference's ``WarcPages.load`` loop (``pages.py:88-104``), including
    the ``?about=`` entity-URI split.

    ``on_error="skip"``: a corrupt shard (truncated gzip member, mangled
    record framing) stops at the corruption point, keeping the records
    already parsed, instead of failing the task — at 100k-shard scale a
    deterministic parse error would otherwise fail every retry of that
    task and kill the whole job for one bad shard. Default stays
    ``"raise"`` (corruption is loud unless the caller opts into skipping).
    """
    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip', got {on_error!r}")
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        it = iter_warc_records(f)
        while True:
            try:
                headers, payload = next(it)
            except StopIteration:
                return
            except (ValueError, EOFError, OSError):
                if on_error == "raise":
                    raise
                return  # framing is byte-counted: no resync past corruption
            if headers.get("warc-type") != "response":
                continue
            url = headers.get("warc-target-uri", "")
            about = None
            if "?about=" in url:
                url, about = url.rsplit("?about=", 1)
            html = _strip_http_headers(payload).decode("utf-8", "replace")
            yield url, about, html


def write_warc(
    path: str,
    pages: Iterable[tuple[str, str | None, str]],
    extra_record_types: tuple = ("request",),
) -> int:
    """Write ``(url, about, html)`` pages as WARC/1.0 response records.

    One gzip member per record when ``path`` ends in ``.gz`` (Common Crawl
    layout, the case :func:`iter_warc_records` must handle). Interleaves
    non-response records of ``extra_record_types`` so readers are forced to
    filter by ``WARC-Type``. Returns the number of response records.
    """
    gz = path.endswith(".gz")
    n = 0

    def record(rtype: str, uri: str, payload: bytes) -> bytes:
        head = (
            f"WARC/1.0\r\n"
            f"WARC-Type: {rtype}\r\n"
            f"WARC-Record-ID: <urn:uuid:rec-{rtype}-{n}>\r\n"
            f"WARC-Target-URI: {uri}\r\n"
            f"Content-Length: {len(payload)}\r\n"
            f"\r\n"
        ).encode()
        return head + payload + _CRLF + _CRLF

    with open(path, "wb") as out:
        def emit(raw: bytes):
            out.write(gzip.compress(raw) if gz else raw)

        for url, about, html in pages:
            uri = f"{url}?about={about}" if about else url
            body = html.encode()
            http = (
                b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                + f"Content-Length: {len(body)}\r\n\r\n".encode()
                + body
            )
            for rtype in extra_record_types:
                emit(record(rtype, uri, b"GET / HTTP/1.1\r\n\r\n"))
            emit(record("response", uri, http))
            n += 1
    return n


def read_warc_pages(
    paths: list[str], *, records_per_block: int = 4096, on_error: str = "raise"
):
    """Ray source: WARC shard paths → Dataset of ``(path, url, about, html)``.

    One read task per shard (``batch_size=1`` over the path list), so a
    100k-shard corpus is 100k independent, retryable tasks and a failed
    shard re-reads alone. Records stream from the gzip member chain;
    ``records_per_block`` bounds the rows accumulated before a block is
    emitted, keeping worker heap independent of shard size.
    ``on_error="skip"`` tolerates corrupt shards (see
    :func:`iter_response_pages`).
    """
    import ray

    ds = ray.data.from_items([{"path": p} for p in paths])

    def parse(t: pa.Table) -> Iterator[pa.Table]:
        for path in t.column("path").to_pylist():
            rows: list = []
            for url, about, html in iter_response_pages(path, on_error=on_error):
                rows.append((path, url, about, html))
                if len(rows) >= records_per_block:
                    yield _pages_table(rows)
                    rows = []
            if rows:
                yield _pages_table(rows)

    return ds.map_batches(
        parse, batch_format="pyarrow", batch_size=1, zero_copy_batch=True
    )


def _pages_table(rows: list) -> pa.Table:
    paths, urls, abouts, htmls = zip(*rows)
    return pa.table(
        {
            "path": pa.array(paths, type=pa.string()),
            "url": pa.array(urls, type=pa.string()),
            "about": pa.array(abouts, type=pa.string()),
            "html": pa.array(htmls, type=pa.large_string()),
        }
    )


_DOC_ID_RE = re.compile(r"/page/(\d+)$")


def page_doc_id(url: str) -> int | None:
    """Extract the synthetic doc id from a fixture page URL."""
    m = _DOC_ID_RE.search(url)
    return int(m.group(1)) if m else None
