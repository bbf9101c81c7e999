"""Pure-Python WARC semantics oracle (ENGINE-NEW source surface).

The input_hint pins a Common-Crawl-style pages table
``(url, warc_ts, html, text, lang)``; Common Crawl itself ships WARC
(ISO 28500) files, so the engine carries a WARC→pages-table ingestion
source (``sources/warc.py``). This module is the independent oracle that
source is hash-compared against — same pattern as ``refsem/robots.py``
and ``refsem/sitemap.py``.

Pinned subset (WARC/1.0–1.1, the part Common Crawl uses):

- a WARC file is a sequence of records: header block (CRLF-separated
  ``Name: value`` lines, terminated by an empty line) + exactly
  ``Content-Length`` bytes of block + CRLF CRLF;
- ``.warc.gz`` files are concatenated gzip members (one per record, the
  CC layout) — stdlib ``gzip`` decompresses the concatenation;
- only ``WARC-Type: response`` records yield pages; the page URL is
  ``WARC-Target-URI``, the timestamp ``WARC-Date`` (ISO-8601, UTC);
- the block is an HTTP response: status line + headers, CRLFCRLF, body;
  the page html is the body bytes (no transfer-encoding handling — CC
  stores decoded payloads);
- header names are case-insensitive; records with a missing/invalid
  target URI or date are skipped, never fatal.
"""

from __future__ import annotations

import datetime as _dt
import gzip
import io

_CRLF = b"\r\n"


def _maybe_gunzip(data: bytes) -> bytes:
    if data[:2] == b"\x1f\x8b":
        return gzip.GzipFile(fileobj=io.BytesIO(data)).read()
    return data


def _parse_headers(block: bytes) -> dict:
    headers: dict = {}
    for line in block.split(_CRLF):
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.strip().decode("latin-1").lower()] = v.strip().decode(
                "latin-1"
            )
    return headers


def split_records(data: bytes) -> list:
    """(headers dict, block bytes) per WARC record, file order."""
    data = _maybe_gunzip(data)
    out = []
    pos = 0
    n = len(data)
    while pos < n:
        if not data[pos:].startswith(b"WARC/"):
            nxt = data.find(b"WARC/", pos)
            if nxt < 0:
                break
            pos = nxt
        head_end = data.find(_CRLF + _CRLF, pos)
        if head_end < 0:
            break
        headers = _parse_headers(data[pos:head_end])
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            break
        block_start = head_end + 4
        block = data[block_start : block_start + length]
        out.append((headers, block))
        pos = block_start + length
        while data[pos : pos + 2] == _CRLF:
            pos += 2
    return out


def http_body(block: bytes) -> bytes:
    """Body of an HTTP response block (after the first CRLFCRLF); a block
    with no header terminator is taken whole (lenient, like CC readers)."""
    sep = block.find(_CRLF + _CRLF)
    return block if sep < 0 else block[sep + 4 :]


def parse_warc_date(value: str):
    """ISO-8601 WARC-Date → naive UTC datetime, or None if invalid."""
    try:
        dt = _dt.datetime.fromisoformat(value.replace("Z", "+00:00"))
    except ValueError:
        return None
    if dt.tzinfo is not None:
        dt = dt.astimezone(_dt.timezone.utc).replace(tzinfo=None)
    return dt


def pages_from_warc(data: bytes) -> list:
    """(url, warc_ts datetime, html bytes) per response record, in file
    order; records without a valid target URI + date are skipped."""
    out = []
    for headers, block in split_records(data):
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri")
        ts = parse_warc_date(headers.get("warc-date", ""))
        if not url or ts is None:
            continue
        out.append((url, ts, http_body(block)))
    return out
