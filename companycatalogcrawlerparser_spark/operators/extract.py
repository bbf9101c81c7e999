"""Vectorized fetch+extract stage (SURVEY.md §2.11 UDF surface).

One Arrow-batched ``mapInPandas`` UDTF turns fetched html into ONE compact
row per page carrying token ARRAYS (href candidates, anchor pairs,
plain-email matches) using the SAME regex + char-trim helpers as the
pure-Python oracle (``refsem.extract``) — byte parity by construction.
Downstream consumers ``posexplode`` only the array they need, JVM-side.

Why arrays instead of one-row-per-token: a 100k-page round yields ~10M
token rows; shipping them through Arrow row-by-row and re-reading them
from the checkpoint for every consumer measured as the dominant cost.
Per-page arrays cut the Arrow row count 100×, keep document order as
array order (``posexplode`` regenerates ``seq``), and make the checkpoint
compact.
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

PAGE_TOKENS_SCHEMA = (
    "company_id long, page_url string, hrefs array<string>, "
    "anchor_names array<string>, anchor_urls array<string>, "
    "emails array<string>"
)


def extract_tokens(fetched: DataFrame) -> DataFrame:
    """fetched: (company_id, page_url, html binary, …) → one row per page:
    ``hrefs``        char-trimmed href-match values (Crawler.fs:156-157)
    ``anchor_names/anchor_urls`` parallel arrays from the anchor regex
    ``emails``       raw plain-text email regex matches (doc order)
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
            out = {
                "company_id": [], "page_url": [], "hrefs": [],
                "anchor_names": [], "anchor_urls": [], "emails": [],
            }
            for cid, purl, html in zip(b["company_id"], b["page_url"], b["html"]):
                if html is None:
                    continue
                text = bytes(html).decode("utf-8", errors="replace")
                anchors = ANCHOR_RE.findall(text)  # [(url, name), ...]
                out["company_id"].append(cid)
                out["page_url"].append(purl)
                out["hrefs"].append(_href_match_values(text))
                out["anchor_urls"].append([a[0] for a in anchors])
                out["anchor_names"].append([a[1] for a in anchors])
                out["emails"].append(
                    [m.group(0) for m in MULTIPLE_EMAIL_RE.finditer(text)]
                )
            yield pd.DataFrame(out)

    cols = fetched.select("company_id", F.col("page_url"), "html")
    return cols.mapInPandas(run, schema=PAGE_TOKENS_SCHEMA)


def extract_tokens_meta(fetched: DataFrame) -> DataFrame:
    """ONE streaming pass over the fetch join: html flows straight through
    the Arrow UDTF and never materializes anywhere — the output carries the
    fetch METADATA passthrough (everything but html) + ``has_html`` (the
    IsNullOrWhiteSpace gate, Crawler.fs:326 — Python ``strip``, matching
    the refsem oracle) + the per-page token arrays.

    Rationale: checkpointing the joined html (30 KB × frontier) was the
    dominant core-count-independent cost at bench scale — 16 GB of block
    manager writes per round for bytes every consumer except the extract
    immediately drops. This variant makes the post-fetch state per page
    ~1-2 KB of token arrays, so the round checkpoint is metadata-sized.
    """
    import pandas as pd

    from pyspark.sql import types as T

    meta_fields = [f for f in fetched.schema.fields if f.name != "html"]
    meta_names = [f.name for f in meta_fields]
    out_schema = T.StructType(
        meta_fields
        + [
            T.StructField("has_html", T.BooleanType()),
            T.StructField("hrefs", T.ArrayType(T.StringType())),
            T.StructField("anchor_names", T.ArrayType(T.StringType())),
            T.StructField("anchor_urls", T.ArrayType(T.StringType())),
            T.StructField("emails", T.ArrayType(T.StringType())),
        ]
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        from ..refsem.extract import (
            ANCHOR_RE,
            MULTIPLE_EMAIL_RE,
            _href_match_values,
        )

        for b in batches:
            out = b[meta_names].copy()
            hh, hr, an, au, em = [], [], [], [], []
            for html in b["html"]:
                text = (
                    bytes(html).decode("utf-8", errors="replace")
                    if html is not None
                    else ""
                )
                if text.strip() == "":
                    hh.append(False)
                    hr.append([]); an.append([]); au.append([]); em.append([])
                    continue
                anchors = ANCHOR_RE.findall(text)  # [(url, name), ...]
                hh.append(True)
                hr.append(_href_match_values(text))
                au.append([a[0] for a in anchors])
                an.append([a[1] for a in anchors])
                em.append([m.group(0) for m in MULTIPLE_EMAIL_RE.finditer(text)])
            out["has_html"] = hh
            out["hrefs"] = hr
            out["anchor_names"] = an
            out["anchor_urls"] = au
            out["emails"] = em
            yield out

    return fetched.mapInPandas(run, out_schema)


# Java-regex twins of refsem.extract's patterns (dialect pinned):
# - (?d) = UNIX_LINES so `.` excludes ONLY \n, matching Python/.NET default
#   (Java's default `.` also excludes \r and unicode line separators);
# - (?U) makes \w Unicode like .NET/Python (Java default \w is ASCII);
# - the anchor regex carries (?is) = IgnoreCase|Singleline per the
#   reference (Crawler.fs:54-57); the href regex has NO flags
#   (RegexOptions.None, Crawler.fs:76,126,156).
_HREF_PAT_JAVA = "(?d)(?:href)=[\"|']?(.*?)[\"|'|>]+"
_ANCHOR_PAT_JAVA = "(?is)<a.*?href=[\"'](.*?)[\"'].*?>(.*?)</a>"
_EMAIL_PAT_JAVA = r"(?U)\w+([-+.]\w+)*@\w+([-.]\w+)*\.\w+([-.]\w+)*"


def _href_trims(v):
    """The .NET char-set trims of Crawler.fs:129,157 — ``ltrim``/``rtrim``
    with a trim STRING are character-set trims in Spark too, so the quirk
    (Q3) maps natively: TrimStart("href=") eats {h,r,e,f,=} runs, etc."""
    t = F.ltrim(v, F.lit("href="))
    t = F.rtrim(F.ltrim(t, F.lit('"')), F.lit('"'))
    return F.rtrim(t, F.lit('">'))


def extract_tokens_native(fetched: DataFrame) -> DataFrame:
    """JVM-native twin of :func:`extract_tokens_meta` — identical output
    schema, zero Python: the html string never leaves the JVM (no Arrow
    transfer), the regexes run inside whole-stage codegen.

    Measured rationale: the Arrow path moves the full decompressed html
    (30 KB × frontier, ~16 GB/round at bench scale) through a pipe into
    Python workers — memory-bandwidth-bound and nearly core-count-
    independent. Native extraction removes that transfer entirely.

    Dialect risk is pinned three ways: the flag choices above, the
    crawl-equality pytest suite (engine vs pure-Python oracle end-to-end),
    and the driver harness's crawl_trace / x10 / x11 / f8 hash rows, which
    compare THIS path against the Python-regex refsem oracle per row.
    """
    text = F.col("html").cast("string")
    has_html = F.coalesce(~text.rlike(r"(?U)^\s*$"), F.lit(False))
    empty = F.array().cast("array<string>")

    def all_matches(pat: str, group: int):
        return F.coalesce(
            F.regexp_extract_all(text, F.lit(pat), F.lit(group)), empty
        )

    hrefs = F.transform(all_matches(_HREF_PAT_JAVA, 0), _href_trims)
    # ONE anchor pass over the full html (group 0), then pull groups 1/2
    # from the short matched substrings. Re-matching the pattern against
    # exactly its own full match reproduces the same lazy-quantifier
    # spans (no lookarounds, leftmost start, identical prefix), so the
    # groups are byte-identical to a second full scan — oracle rows pin
    # it. The struct array lives in its OWN projection: referencing it
    # twice from the outer select is a cheap array-field access, and
    # CollapseProject won't inline (and so duplicate) a non-cheap HOF.
    anchors = F.transform(
        all_matches(_ANCHOR_PAT_JAVA, 0),
        lambda m: F.struct(
            F.regexp_extract(m, _ANCHOR_PAT_JAVA, 1).alias("url"),
            F.regexp_extract(m, _ANCHOR_PAT_JAVA, 2).alias("name"),
        ),
    )
    emails = all_matches(_EMAIL_PAT_JAVA, 0)

    meta = [c for c in fetched.columns if c != "html"]
    gate = lambda col: F.when(has_html, col).otherwise(empty)  # noqa: E731
    staged = fetched.select(
        *meta,
        has_html.alias("has_html"),
        gate(hrefs).alias("hrefs"),
        F.when(has_html, anchors).otherwise(
            F.array().cast("array<struct<url:string,name:string>>")
        ).alias("__anchors"),
        gate(emails).alias("emails"),
    )
    return staged.select(
        *meta,
        "has_html",
        "hrefs",
        F.col("__anchors.name").alias("anchor_names"),
        F.col("__anchors.url").alias("anchor_urls"),
        "emails",
    )


def _explode(tokens: DataFrame, array_col: str, value_alias: str) -> DataFrame:
    """posexplode one token array → (…, seq, <value_alias>), doc order."""
    return tokens.select(
        "company_id",
        "page_url",
        "base_url",
        F.posexplode(F.col(array_col)).alias("seq", value_alias),
    )


def _first_occurrence(df: DataFrame, keys, order_col="seq") -> DataFrame:
    """F# ``Seq.distinct`` under parallelism: keep the minimum-seq row.

    Implemented as a hash aggregation (``min`` over seq + any carried
    columns packed in a struct) instead of a row_number window: aggregates
    get map-side partial combine and skip the per-partition sort — at 10^7
    token rows per round the sort was a measured hotspot. Carried columns
    ride in the struct so ties resolve deterministically by seq order.
    """
    keys = list(keys)
    carry = [c for c in df.columns if c not in keys and c != order_col]
    packed = F.min(F.struct(F.col(order_col), *[F.col(c) for c in carry])).alias("__m")
    out = df.groupBy(*keys).agg(packed)
    cols = (
        [F.col(k) for k in keys]
        + [F.col(f"__m.{order_col}").alias(order_col)]
        + [F.col(f"__m.{c}").alias(c) for c in carry]
    )
    return out.select(*cols).select(*df.columns)


def mailto_emails(tokens: DataFrame) -> DataFrame:
    """X11 — ``searchMailToResults`` (Crawler.fs:125-133): href values that
    start with ``mailto:`` (case-insensitive), lowercased, prefix removed
    with Replace-all semantics, distinct per page."""
    df = _explode(tokens, "hrefs", "value")
    low = F.lower(F.col("value"))
    df = df.filter(low.startswith("mailto:")).withColumn(
        "email", F.replace(low, F.lit("mailto:"), F.lit(""))
    )
    return _first_occurrence(
        df.select("company_id", "page_url", "email", "seq"),
        ["company_id", "page_url", "email"],
    )


def regex_emails(tokens: DataFrame) -> DataFrame:
    """Plain-text email matches, per-page distinct, ``Mail.ru`` suffix
    dropped case-sensitively AFTER distinct (quirk Q10, Crawler.fs:334-337)."""
    df = _explode(tokens, "emails", "email")
    df = _first_occurrence(
        df.select("company_id", "page_url", "email", "seq"),
        ["company_id", "page_url", "email"],
    )
    return df.filter(~F.col("email").endswith("Mail.ru"))


def contact_anchor_links(tokens: DataFrame, base_url_col: str = "base_url") -> DataFrame:
    """H10 ∘ C2 — ``FindLinksRegExp`` + contact-name filter
    (Crawler.fs:51-63, 346-353). Returns (company_id, page_url, url, seq)
    in document order of first occurrence of each (name, url) pair."""
    from ..functions.canon import host_token

    pairs = tokens.select(
        "company_id",
        "page_url",
        "base_url",
        F.posexplode(
            F.arrays_zip(
                F.col("anchor_names").alias("name"),
                F.col("anchor_urls").alias("href"),
            )
        ).alias("seq", "pair"),
    ).select(
        "company_id", "page_url", "base_url", "seq",
        F.col("pair.name").alias("name"), F.col("pair.href").alias("value"),
    )
    base_raw = F.col(base_url_col)
    base = F.when(base_raw.endswith("/"), base_raw).otherwise(
        F.concat(base_raw, F.lit("/"))
    )
    df = (
        pairs.withColumn("url", convert_url(F.col("value"), base))
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
    return _explode(tokens, "hrefs", "href").select(
        "company_id", "page_url", "href",
        F.col(base_url_col).alias("base_url"), "seq",
    )
