"""Frontier/email admission predicates as native Column expressions.

Each mirrors the same-named function in ``..refsem.predicates`` (citations
there). All JVM-side — rlike/startswith/substring — no Python UDFs.
"""

from __future__ import annotations

import re as _re

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..refsem.predicates import (
    CONTACT_PAGE_WORDS,
    IMG_SCRIPT_CSS_EXT,
    SOCIAL_NETWORKS,
    URL_STOPWORDS,
)

_IMG_EXT_RE = "(?:" + "|".join(_re.escape(e) for e in IMG_SCRIPT_CSS_EXT) + ")$"
_SOCIAL_RE = "|".join(_re.escape(d) for d in SOCIAL_NETWORKS)
_CONTACT_RE = "|".join(_re.escape(w) for w in CONTACT_PAGE_WORDS)
_STOPWORD_RE = "|".join(_re.escape(w) for w in URL_STOPWORDS)


def start_http(url: Column) -> Column:
    """F1."""
    return url.startswith("http://") | url.startswith("https://")


def is_not_image_script_css_ext(url: Column) -> Column:
    """F2."""
    return ~F.lower(url).rlike(_IMG_EXT_RE)


def not_social_network(url: Column) -> Column:
    """F3."""
    return ~F.lower(url).rlike(_SOCIAL_RE)


def contact_page(s: Column) -> Column:
    """F4 inner — keyword substring containment."""
    return F.lower(s).rlike(_CONTACT_RE)


def is_contacts_page(x: Column) -> Column:
    """F4 — last path segment (or whole short tail) keyword check."""
    s = F.rtrim(x, F.lit("/"))
    # lastIndexOf('/') > 0  ⇔  a '/' exists at index ≥ 1
    has_inner_slash = s.rlike(".+/")
    seg = F.substring_index(s, "/", -1)
    return (
        F.when(has_inner_slash & (seg != ""), contact_page(seg))
        .when(F.length(s) > 4, contact_page(s))
        .otherwise(F.lit(False))
    )


def is_end_with_digits(x: Column) -> Column:
    """F5 with quirk Q3 — char-set trims of '/', '.html', '.htm'.

    Digit class is Unicode Nd (``\\p{Nd}``), matching .NET ``Char.IsDigit``
    and the refsem oracle's ``net_is_digit`` — ASCII ``[0-9]`` would admit
    URLs whose tail ends in e.g. Arabic-Indic digits that the reference
    rejects (ADVICE r01)."""
    s = F.rtrim(F.rtrim(F.rtrim(x, F.lit("/")), F.lit(".html")), F.lit(".htm"))
    has_inner_slash = s.rlike(".+/")
    seg = F.substring_index(s, "/", -1)
    return (
        F.when(has_inner_slash & (seg != ""), seg.rlike(r"^\p{Nd}+$"))
        .otherwise(F.substring(s, -1, 1).rlike(r"^\p{Nd}$"))
    )


def url_not_contains(url: Column) -> Column:
    """F6 — ~80-word blacklist. Disabled in the reference admission path
    (quirk Q12); exposed for opt-in use."""
    return ~F.lower(url).rlike(_STOPWORD_RE)


def count_substring(where: Column, what: str) -> Column:
    """A5 — occurrence count via the length trick (``Crawler.fs:79-82``)."""
    if what == "":
        return F.lit(0)
    return (
        F.length(where) - F.length(F.replace(where, F.lit(what), F.lit("")))
    ) / F.lit(len(what))


def seed_filter(
    site_url: Column,
    bad_url: Column,
    email_processed: Column,
    email_finded: Column,
) -> Column:
    """F9 — crawl-set selection (``Program.fs:525-533``)."""
    return (
        site_url.isNotNull()
        & (F.trim(site_url) != "")
        & ~bad_url
        & ~email_processed
        & ~email_finded
        & not_social_network(site_url)
        & (site_url != "http://www.abordageshop.ru")
    )
