"""Quirk-exact regex extraction + the F8 frontier-admission chain.

Citations into ``/root/reference/CrawlerParser/Crawler.fs``.
"""

from __future__ import annotations

import re

from .predicates import (
    is_contacts_page,
    is_end_with_digits,
    is_not_image_script_css_ext,
    not_social_network,
)
from .strings import count_substring, get_host, start_http

# Crawler.fs:75 — .NET \w is Unicode; Python \w on str matches the same
# word-character classes for our corpus (letters incl. Cyrillic, digits, _).
MULTIPLE_EMAIL_RE = re.compile(r"\w+([-+.]\w+)*@\w+([-.]\w+)*\.\w+([-.]\w+)*")

# Crawler.fs:76 — href value matcher; the match VALUE includes the leading
# `href=` and the trailing terminator run, stripped below with .NET char-set
# trims (quirk: unquoted http hrefs get their leading 'h' runs eaten too).
# NOTE no flags: the reference instantiates ``EmailRegex()`` with
# RegexOptions.None (Crawler.fs:126,156) — case-SENSITIVE (`HREF=` does not
# match) and non-Singleline (`.` stops at newlines, so a newline-broken href
# value never completes a match). Only the anchor regex below carries
# IgnoreCase|Singleline (Crawler.fs:54-57).
HREF_RE = re.compile(r"(?:href)=[\"|']?(.*?)[\"|'|>]+")

# Crawler.fs:55-58 — anchor (url, name) pairs; group 1 = url, group 2 = name.
ANCHOR_RE = re.compile(
    r"<a.*?href=[\"'](?P<url>.*?)[\"'].*?>(?P<name>.*?)</a>",
    re.IGNORECASE | re.DOTALL,
)


def _distinct(seq):
    """F# ``Seq.distinct`` — order-preserving first occurrence."""
    seen = set()
    out = []
    for x in seq:
        if x not in seen:
            seen.add(x)
            out.append(x)
    return out


def _href_match_values(html: str):
    """Raw candidate strings exactly as the reference derives them:
    ``x.Value.TrimStart("href=").Trim('"').TrimEnd("\">")`` — Crawler.fs:129,157."""
    out = []
    for m in HREF_RE.finditer(html):
        v = m.group(0)
        v = v.lstrip("href=")   # char-set trim {h,r,e,f,=}
        v = v.strip('"')
        v = v.rstrip('">')      # .NET TrimEnd("\">".ToCharArray()) = char set {", >}
        out.append(v)
    return out


def search_mailto_results(html: str):
    """X11 — mailto extraction — ``Crawler.fs:125-133``."""
    emails = []
    for v in _href_match_values(html):
        if v.lower().startswith("mailto:"):
            emails.append(v.lower().replace("mailto:", ""))
    return _distinct(emails)


def extract_emails_regex(html: str):
    """Plain-text email regex pass, distinct, drop ``Mail.ru``-suffixed
    (case-sensitive, quirk Q10) — ``Crawler.fs:246-249,334-337``."""
    matches = [m.group(0) for m in MULTIPLE_EMAIL_RE.finditer(html)]
    return [e for e in _distinct(matches) if not e.endswith("Mail.ru")]


def search_href_results(html: str, base_url: str):
    """F8 — the 13-stage frontier-admission chain — ``Crawler.fs:135-187``.

    Stage order is load-bearing: both distinct passes and the relative→
    absolute conversion happen at the exact positions the reference has
    them. Quirks Q1 (Replace-all ``//``→``http://``), Q8 (length-equality
    base test), Q12 (querystring admitted only with ``topmenu``).
    """
    if not base_url.endswith("/"):
        base_url = base_url + "/"
    host = get_host(base_url)

    xs = _href_match_values(html)
    xs = [x for x in xs if len(x) >= 5]
    xs = [x for x in xs if not x.lower().startswith("mailto:")]
    xs = [
        x
        for x in xs
        if is_not_image_script_css_ext(x)
        and (is_contacts_page(x) or ("?" in x and "topmenu" in x))
    ]
    xs = [
        x
        for x in xs
        if x.endswith(".html")
        or x.endswith(".htm")
        or (
            not x.endswith(".html")
            and not x.endswith(".htm")
            and x[len(x) - 4] != "."
            and x[len(x) - 5] != "."
        )
        or is_contacts_page(x)
    ]
    xs = [
        x
        for x in xs
        if x.endswith(".html")
        or x.endswith(".htm")
        or x.endswith("/")
        or x.startswith("/")
        or start_http(x)
        or is_contacts_page(x)
    ]
    xs = _distinct(xs)
    converted = []
    for x in xs:
        if not start_http(x) and x.startswith("/") and not x.startswith("//"):
            converted.append(base_url.rstrip("/") + x)
        elif not start_http(x) and not x.startswith("/") and not x.startswith("//"):
            converted.append(base_url + x)
        else:
            converted.append(x)
    urls = [u for u in converted if host in u]
    urls = [u.replace("//", "http://") if u.startswith("//") else u for u in urls]
    urls = [u for u in urls if count_substring(u, "://") == 1]
    https_len = len(base_url.replace("http://", "https://"))
    urls = [u for u in urls if not (len(u) == len(base_url) or len(u) == https_len)]
    urls = [u for u in urls if not u.endswith("//")]
    urls = [u for u in urls if not_social_network(u)]
    urls = [u for u in urls if not is_end_with_digits(u)]
    urls = [u for u in urls if len(u) <= 80]
    return _distinct(urls)


def find_links_regexp(html: str, base_url: str):
    """H10 — anchor (name, url) pairs via regex, converted + same-host
    filtered, distinct on the pair — ``Crawler.fs:51-63``."""
    from .strings import convert_url

    if not base_url.endswith("/"):
        base_url = base_url + "/"
    host = get_host(base_url)
    pairs = [
        (m.group("name"), convert_url(m.group("url"), base_url))
        for m in ANCHOR_RE.finditer(html)
    ]
    pairs = [
        (name, url)
        for (name, url) in pairs
        if host in url and not_social_network(url) and is_not_image_script_css_ext(url)
    ]
    return _distinct(pairs)


CONTACT_ANCHOR_WORDS = ["контакты", "contacts", "обратная связь", "feedback"]


def contact_anchor_links(html: str, base_url: str):
    """The ``dataLink`` stage — contact-named anchors — ``Crawler.fs:346-353``."""
    return [
        url
        for (name, url) in find_links_regexp(html, base_url)
        if any(w in name.lower() for w in CONTACT_ANCHOR_WORDS)
    ]
