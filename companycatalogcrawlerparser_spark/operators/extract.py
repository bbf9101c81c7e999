"""Vectorized fetch+extract stage (SURVEY.md §2.11 UDF surface).

One Arrow-batched ``mapInPandas`` UDTF turns fetched html into token rows
(href candidates, anchor pairs, plain-email matches) using the SAME regex +
char-trim helpers as the pure-Python oracle (``refsem.extract``) — byte
parity by construction. Everything downstream of tokenization (mailto
derivation, Mail.ru drop, dedup, contact-anchor filtering, the F8 admission
chain) is native Column work, JVM-side.

Scale notes: the UDF is a narrow map — no shuffle; Arrow transfers html
bytes once. Token rows are small strings; the subsequent window dedups
shuffle on (company_id, page) keys which are well-distributed after the
host-salted repartition of the fetch stage.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.canon import convert_url
from ..functions.predicates import (
    is_not_image_script_css_ext,
    not_social_network,
)
from ..refsem.extract import CONTACT_ANCHOR_WORDS

TOKENS_SCHEMA = (
    "company_id long, page_url string, kind string, value string, "
    "name string, seq int"
)


def extract_tokens(fetched: DataFrame) -> DataFrame:
    """fetched: (company_id, page_url, html binary, ...) → token rows.

    kinds: ``href``  — char-trimmed href-match values (Crawler.fs:156-157)
           ``anchor``— (name, raw href) pairs from the anchor regex
           ``email`` — raw plain-text email regex matches (doc order)
    """
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        # heavy imports once per worker, not per batch
        from ..refsem.extract import (
            ANCHOR_RE,
            MULTIPLE_EMAIL_RE,
            _href_match_values,
        )

        for b in batches:
            out = {k: [] for k in ("company_id", "page_url", "kind", "value", "name", "seq")}

            def emit(cid, purl, kind, value, name, seq):
                out["company_id"].append(cid)
                out["page_url"].append(purl)
                out["kind"].append(kind)
                out["value"].append(value)
                out["name"].append(name)
                out["seq"].append(seq)

            for cid, purl, html in zip(b["company_id"], b["page_url"], b["html"]):
                if html is None:
                    continue
                text = bytes(html).decode("utf-8", errors="replace")
                for seq, v in enumerate(_href_match_values(text)):
                    emit(cid, purl, "href", v, None, seq)
                for seq, m in enumerate(ANCHOR_RE.finditer(text)):
                    emit(cid, purl, "anchor", m.group("url"), m.group("name"), seq)
                for seq, m in enumerate(MULTIPLE_EMAIL_RE.finditer(text)):
                    emit(cid, purl, "email", m.group(0), None, seq)
            yield pd.DataFrame(out)

    cols = fetched.select("company_id", F.col("page_url"), "html")
    return cols.mapInPandas(run, schema=TOKENS_SCHEMA)


def _first_occurrence(df: DataFrame, keys, order_col="seq") -> DataFrame:
    """F# ``Seq.distinct`` under parallelism: keep the minimum-seq row."""
    w = Window.partitionBy(*keys).orderBy(order_col)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def mailto_emails(tokens: DataFrame) -> DataFrame:
    """X11 — ``searchMailToResults`` (Crawler.fs:125-133): href values that
    start with ``mailto:`` (case-insensitive), lowercased, prefix removed
    with Replace-all semantics, distinct per page."""
    low = F.lower(F.col("value"))
    df = (
        tokens.filter(F.col("kind") == "href")
        .filter(low.startswith("mailto:"))
        .withColumn("email", F.replace(low, F.lit("mailto:"), F.lit("")))
    )
    return _first_occurrence(
        df.select("company_id", "page_url", "email", "seq"),
        ["company_id", "page_url", "email"],
    )


def regex_emails(tokens: DataFrame) -> DataFrame:
    """Plain-text email matches, per-page distinct, ``Mail.ru`` suffix
    dropped case-sensitively AFTER distinct (quirk Q10, Crawler.fs:334-337)."""
    df = tokens.filter(F.col("kind") == "email")
    df = _first_occurrence(
        df.select("company_id", "page_url", F.col("value").alias("email"), "seq"),
        ["company_id", "page_url", "email"],
    )
    return df.filter(~F.col("email").endswith("Mail.ru"))


def contact_anchor_links(tokens: DataFrame, base_url_col: str = "base_url") -> DataFrame:
    """H10 ∘ C2 — ``FindLinksRegExp`` + contact-name filter
    (Crawler.fs:51-63, 346-353). ``tokens`` must carry ``base_url`` (the
    page's getBaseUrl) — join it in before calling. Returns
    (company_id, page_url, url, seq) in document order of first occurrence
    of each (name, url) pair."""
    from ..functions.canon import host_token

    base_raw = F.col(base_url_col)
    base = F.when(base_raw.endswith("/"), base_raw).otherwise(F.concat(base_raw, F.lit("/")))
    df = (
        tokens.filter(F.col("kind") == "anchor")
        .withColumn("url", convert_url(F.col("value"), base))
        .withColumn("__host", host_token(base))
    )
    df = df.filter(
        ((F.col("__host") == "") | (F.instr(F.col("url"), F.col("__host")) > 0))
        & not_social_network(F.col("url"))
        & is_not_image_script_css_ext(F.col("url"))
    )
    # Seq.distinct on the (name, url) PAIR, then the name filter
    df = _first_occurrence(df, ["company_id", "page_url", "name", "url"])
    low_name = F.lower(F.col("name"))
    keyword_hit = None
    for w in CONTACT_ANCHOR_WORDS:
        cond = low_name.contains(w)
        keyword_hit = cond if keyword_hit is None else (keyword_hit | cond)
    return df.filter(keyword_hit).select("company_id", "page_url", "url", "seq")


def href_candidates(tokens: DataFrame, base_url_col: str = "base_url") -> DataFrame:
    """Raw href values + base, ready for the F8 admission chain
    (``functions.admission.admit_frontier``)."""
    return tokens.filter(F.col("kind") == "href").select(
        "company_id",
        "page_url",
        F.col("value").alias("href"),
        F.col(base_url_col).alias("base_url"),
        "seq",
    )
