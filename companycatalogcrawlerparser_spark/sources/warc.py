"""WARC → pages-table ingestion source (ENGINE-NEW).

Reads Common-Crawl-style WARC files (``.warc`` / ``.warc.gz``) into the
engine's canonical pages schema ``(url, warc_ts, html, text, lang)``
(input_hint). Semantics pinned by the pure-Python oracle
``refsem/warc.py`` and hash-verified by the driver row ``warc_ingest``.

Execution shape: ``binaryFile`` source (one row per WARC file) → one
Arrow ``mapInPandas`` stage running the shared record splitter per file.
One task per WARC file is the standard Common-Crawl processing grain
(CC segments are ~1 GB gzip members; a task owns a file, records stream
out of the splitter) — the parallelism unit is the FILE COUNT, which at
crawl scale is millions of files, far above any executor count. ``text``
and ``lang`` are left null: they are downstream derivations (extract /
langid operators), not properties of the raw fetch.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

WARC_PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def read_warc(
    spark: SparkSession, path: str, glob: str = "*.warc*"
) -> DataFrame:
    """Pages DataFrame from every WARC file under ``path``."""
    import pandas as pd  # noqa: F401  (mapInPandas contract)

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", "true")
        .load(path)
        .select("path", "content")
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        from ..refsem.warc import pages_from_warc

        for b in batches:
            out = {"url": [], "warc_ts": [], "html": [], "text": [], "lang": []}
            for content in b["content"]:
                for url, ts, body in pages_from_warc(bytes(content)):
                    out["url"].append(url)
                    out["warc_ts"].append(ts)
                    out["html"].append(body)
                    out["text"].append(None)
                    out["lang"].append(None)
            yield pd.DataFrame(out)

    return files.mapInPandas(run, schema=WARC_PAGES_SCHEMA)
