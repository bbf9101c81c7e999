"""Pure-Python sitemap.xml semantics oracle (ENGINE-NEW surface).

The reference crawler has no sitemap support — seeds come from catalog
scrapes and a static list (``Program.fs:345-409``). A production frontier
at 10^10 URLs ingests sitemaps (sitemaps.org protocol): they are the
site-sanctioned URL inventory and the cheapest frontier feed. This module
is the independent oracle the Spark operator
(``operators/sitemap.py``) is hash-compared against, in the same pattern
as ``refsem/robots.py`` (RFC 9309 gate, round 2).

Pinned semantics (sitemaps.org, minimal-but-real subset):

- ``<urlset>`` documents: one entry per ``<url>`` block, in document
  order; ``loc`` = trimmed text of the first ``<loc>`` child (entity
  refs decoded: amp/lt/gt/quot/apos); blocks with no/empty ``<loc>``
  are skipped. ``lastmod`` = trimmed first ``<lastmod>`` text or None.
- ``<sitemapindex>`` documents: entries are nested sitemap locations —
  ``parse_sitemap_index`` returns them in document order (the crawl
  plan fetches them as a second round, exactly like the H2/H3 nested
  category loads).
- Tags are matched case-insensitively; other children (changefreq,
  priority, namespaces) are ignored.
- Only http(s) locs survive (F1 applies to sitemap entries as to any
  frontier candidate).
"""

from __future__ import annotations

import datetime as _dt
import gzip as _gzip
import re

_URL_BLOCK_RE = re.compile(r"<url\b[^>]*>(.*?)</url>", re.IGNORECASE | re.DOTALL)
_SM_BLOCK_RE = re.compile(r"<sitemap\b[^>]*>(.*?)</sitemap>", re.IGNORECASE | re.DOTALL)
_LOC_RE = re.compile(r"<loc\b[^>]*>(.*?)</loc>", re.IGNORECASE | re.DOTALL)
_LASTMOD_RE = re.compile(r"<lastmod\b[^>]*>(.*?)</lastmod>", re.IGNORECASE | re.DOTALL)

_ENTITIES = [
    ("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
    ("&quot;", '"'), ("&apos;", "'"),
]


def doc_text(doc) -> str:
    """Corpus value → XML text: str passes through; bytes decode UTF-8
    (replace), transparently gunzipping gzip-magic payloads (sitemaps.org
    allows gzip-compressed sitemap files; a corrupt member parses as-is
    and simply yields nothing — skip, never fatal). Twin of the Spark
    plan's magic-byte branch (``operators.sitemap._with_xml``)."""
    if isinstance(doc, (bytes, bytearray)):
        data = bytes(doc)
        if data[:2] == b"\x1f\x8b":
            try:
                data = _gzip.decompress(data)
            except Exception:  # BadGzipFile(OSError) | zlib.error | EOFError
                pass
        return data.decode("utf-8", "replace")
    return doc


def decode_entities(s: str) -> str:
    for src, dst in _ENTITIES:
        s = s.replace(src, dst)
    return s


def _first(rx: re.Pattern, block: str) -> str | None:
    m = rx.search(block)
    if not m:
        return None
    return decode_entities(m.group(1).strip())


def is_sitemap_index(xml: str) -> bool:
    return re.search(r"<sitemapindex\b", xml, re.IGNORECASE) is not None


def parse_sitemap(xml: str) -> list:
    """(loc, lastmod|None) per <url> block, document order; empty/missing
    locs and non-http(s) locs skipped."""
    out = []
    for m in _URL_BLOCK_RE.finditer(xml):
        loc = _first(_LOC_RE, m.group(1))
        if not loc or not (
            loc.startswith("http://") or loc.startswith("https://")
        ):
            continue
        out.append((loc, _first(_LASTMOD_RE, m.group(1))))
    return out


def parse_sitemap_index(xml: str) -> list:
    """Nested sitemap locations per <sitemap> block, document order."""
    out = []
    for m in _SM_BLOCK_RE.finditer(xml):
        loc = _first(_LOC_RE, m.group(1))
        if not loc or not (
            loc.startswith("http://") or loc.startswith("https://")
        ):
            continue
        out.append(loc)
    return out


_W3C_DATETIME_RE = re.compile(
    r"\d{4}(-\d{2}(-\d{2}"
    r"(T\d{2}:\d{2}(:\d{2}(\.\d+)?)?(Z|[+-]\d{2}:\d{2}))?)?)?"
)


def parse_lastmod(value):
    """W3C-datetime ``<lastmod>`` → naive UTC datetime, or None.

    Twin of ``operators.sitemap.lastmod_ts``: gated on the same strict
    W3C-Datetime profile, then partial dates (``YYYY``, ``YYYY-MM``)
    complete to the first instant of the period; full dates/datetimes
    (optional fractional seconds, Z / ±hh:mm offset) convert to UTC;
    anything outside the profile is None (lastmod is advisory — no
    claim)."""
    if value is None:
        return None
    s = value.strip()
    if not _W3C_DATETIME_RE.fullmatch(s):
        return None
    for cand in (s, s + "-01", s + "-01-01"):
        try:
            dt = _dt.datetime.fromisoformat(cand.replace("Z", "+00:00"))
            break
        except ValueError:
            continue
    else:
        return None
    if dt.tzinfo is not None:
        dt = dt.astimezone(_dt.timezone.utc).replace(tzinfo=None)
    return dt


def recrawl_select(entries: list, fetch_log: dict) -> list:
    """Twin of ``operators.sitemap.recrawl_candidates``: ``entries`` is
    ``crawl_sitemaps`` output rows (root, ord, url, lastmod-string);
    ``fetch_log`` maps url → last-fetch datetime. Per distinct URL the MAX
    parsed lastmod wins (None ignored unless all None). Returns sorted
    (url, lastmod_ts|None, reason) rows for NEW (never fetched) and STALE
    (lastmod strictly after last fetch) URLs."""
    best: dict = {}
    for _root, _ord, url, lastmod in entries:
        ts = parse_lastmod(lastmod)
        if url not in best:
            best[url] = ts
        elif ts is not None and (best[url] is None or ts > best[url]):
            best[url] = ts
    out = []
    for url, ts in best.items():
        fetched = fetch_log.get(url)
        if fetched is None:
            out.append((url, ts, "new"))
        elif ts is not None and ts > fetched:
            out.append((url, ts, "stale"))
    return sorted(out)


def crawl_sitemaps(corpus: dict, roots: list) -> list:
    """Two-round oracle walk: for each root sitemap URL (in order), if the
    document is an index, fetch each nested sitemap from ``corpus``
    (url → xml; missing fetches skipped) and take its entries, else take
    the root's entries directly. Returns (root_url, ord, url, lastmod)
    rows — ``ord`` is the rank within the root across its whole expansion."""
    rows = []
    for root in roots:
        xml = corpus.get(root)
        if xml is None:
            continue
        xml = doc_text(xml)
        entries = []
        if is_sitemap_index(xml):
            for nested in parse_sitemap_index(xml):
                nxml = corpus.get(nested)
                if nxml is None:
                    continue
                entries.extend(parse_sitemap(doc_text(nxml)))
        else:
            entries = parse_sitemap(xml)
        for i, (loc, lastmod) in enumerate(entries):
            rows.append((root, i, loc, lastmod))
    return rows
