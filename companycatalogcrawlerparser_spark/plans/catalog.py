"""Catalog scrape plan — entry point 1 (SURVEY.md §3.1;
``Program.fs:17-490``).

Spark shape: seeds → fetch join → category-extract UDTF → categories table
(K1 merge) → round A fetches listing page 1 per leaf category and extracts
the pagination max (A4/H8) → round B ``explode(sequence(2, pnum))``
generates the remaining listing URLs set-orientedly (replacing the per-
category while loop) → company-extract UDTF (H4/H5/H6) → K3 blind append →
A2/W1 dedup downstream.

The extract UDTFs call the same ``refsem.htmlparse`` walks as the oracle —
byte-identical fields by construction.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CATEGORY_SCHEMA = (
    "page_url string, category_id long, name string, parent_id long, "
    "href string, city_code string"
)
COMPANY_SCHEMA = (
    "page_url string, company_seq long, category_id long, name string, "
    "address string, phone string, timework string, site_url string"
)
PAGENUM_SCHEMA = "page_url string, page_count int"

LAYOUTS = ("bizly", "spravker", "jsprav")


def extract_categories(pages: DataFrame, layout: str, city_code: str = "77") -> DataFrame:
    """H1/H2/H3 per layout. ``pages``: (url, html binary). The reference's
    nested show_all/subcats fetches (HtmlParsing.fs:68,103) are modeled as
    second-round fetches in the driver plan, not inside the UDF — pass the
    sub-pages through another extract round instead."""
    import pandas as pd

    if layout not in LAYOUTS:
        raise ValueError(f"unknown layout {layout}")

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        from ..refsem import htmlparse as H

        for b in batches:
            rows = []
            for url, html in zip(b["url"], b["html"]):
                if html is None:
                    continue
                doc = H.parse_html(bytes(html).decode("utf-8", errors="replace"))
                if layout == "bizly":
                    recs = H.get_div_row(doc)
                elif layout == "jsprav":
                    recs = H.get_nov_category_links(doc, "", city_code, fetch=None)
                else:
                    recs = H.get_category_links(doc, "", city_code, fetch=None)
                for rid, name, parent, href, cc in recs:
                    rows.append((url, rid, name, parent, href, cc))
            yield pd.DataFrame(
                rows,
                columns=["page_url", "category_id", "name", "parent_id", "href", "city_code"],
            )

    return pages.select("url", "html").mapInPandas(run, schema=CATEGORY_SCHEMA)


def extract_companies(pages: DataFrame, layout: str) -> DataFrame:
    """H4/H5/H6 per layout over listing pages; ``category_id`` must ride
    along on the pages frame."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        from ..refsem import htmlparse as H

        for b in batches:
            rows = []
            for url, html, cat in zip(b["url"], b["html"], b["category_id"]):
                if html is None:
                    continue
                doc = H.parse_html(bytes(html).decode("utf-8", errors="replace"))
                if layout == "bizly":
                    recs = H.get_div_company(doc, int(cat))
                elif layout == "spravker":
                    recs = H.get_div_companies(doc, int(cat))
                else:
                    recs = H.get_nov_div_companies(doc, int(cat))
                for seq, cid, name, addr, phone, tw, site in recs:
                    rows.append((url, seq, cid, name, addr, phone, tw, site))
            yield pd.DataFrame(
                rows,
                columns=[
                    "page_url", "company_seq", "category_id", "name",
                    "address", "phone", "timework", "site_url",
                ],
            )

    return pages.select("url", "html", "category_id").mapInPandas(
        run, schema=COMPANY_SCHEMA
    )


def extract_page_counts(pages: DataFrame, tag: str = "div") -> DataFrame:
    """A4/H8 — pagination max per listing page 1."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        from ..refsem import htmlparse as H

        for b in batches:
            rows = []
            for url, html in zip(b["url"], b["html"]):
                if html is None:
                    continue
                doc = H.parse_html(bytes(html).decode("utf-8", errors="replace"))
                rows.append((url, H.get_page_number(doc, tag)))
            yield pd.DataFrame(rows, columns=["page_url", "page_count"])

    return pages.select("url", "html").mapInPandas(run, schema=PAGENUM_SCHEMA)


def listing_urls(
    page1: DataFrame, template: str = "page-{n}/", url_col: str = "page_url"
) -> DataFrame:
    """Round B — explode pages 2..pnum from the page-1 counts using the
    reference URL templates ``…page-%d/`` (Program.fs:94) or ``…?p-%d``
    (Program.fs:237,459). Returns (category_id, url, page_no)."""
    base = F.col(url_col)
    n = F.col("page_no")
    if template == "page-{n}/":
        url = F.concat(base, F.lit("page-"), n.cast("string"), F.lit("/"))
    elif template == "?p-{n}":
        url = F.concat(base, F.lit("?p-"), n.cast("string"))
    else:
        raise ValueError(f"unknown template {template}")
    return (
        page1.filter(F.col("page_count") >= 2)
        .select(
            "*",
            F.explode(F.sequence(F.lit(2), F.col("page_count"))).alias("page_no"),
        )
        .withColumn("url", url)
    )


def dedup_companies_by_site(companies: DataFrame) -> DataFrame:
    """A2/W1 — the reference's own ROW_NUMBER dedup
    (``UsefulSQLQuery.sql:33-36``)."""
    from pyspark.sql import Window

    w = Window.partitionBy("site_url").orderBy("company_id")
    return (
        companies.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
