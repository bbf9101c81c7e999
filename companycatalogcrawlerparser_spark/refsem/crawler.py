"""Pure-Python oracle of the email-harvest crawl (SURVEY.md §3.2).

Models the reference's ``asyncEmailCrawler`` (``Crawler.fs:316-392``) over an
in-memory corpus dict — "the corpus is the web": fetching a URL is a lookup.
Produces the golden frontier trace, URL-seen sets, email bag, and company
flags that the Spark crawl plan (``plans.crawl``) must reproduce exactly.

Determinism: the reference fires contact-page fetches in ``Async.Parallel``
chunks, so *its* bag order is nondeterministic; the deterministic semantics
we pin (and test both sides against) is document order within each company —
see SURVEY.md §7 "hard parts" item 2.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple
from urllib.parse import urljoin

from .extract import (
    contact_anchor_links,
    extract_emails_regex,
    search_href_results,
    search_mailto_results,
)
from .predicates import is_contacts_page, is_not_image_script_css_ext, seed_filter
from .strings import get_base_url

MAX_REDIRECTS = 20

# frontier priorities (SURVEY.md C2)
PRIO_SEED = 0
PRIO_CONTACT_ANCHOR = 1
PRIO_CONTACT_HREF = 2


@dataclass
class PageRec:
    """One row of the pages corpus. 3xx rows carry ``location``."""

    html: Optional[str] = None
    status: int = 200
    location: Optional[str] = None


@dataclass
class FetchResult:
    ok: bool
    html: Optional[str] = None
    error: Optional[str] = None
    final_url: Optional[str] = None
    hops: int = 0


def fetch(corpus: Dict[str, PageRec], url: str) -> FetchResult:
    """Corpus lookup with the reference's redirect admission F11
    (``Crawler.fs:214-230``): status 300-399, location present and != url,
    (both ≤80 chars or url >80), NOT(location startswith '://' AND not
    endswith '404.html'); per-call cycle set; ≤20 hops."""
    cycle = set()
    current = url
    hops = 0
    while True:
        rec = corpus.get(current)
        if rec is None:
            return FetchResult(False, error="not_found", final_url=current, hops=hops)
        if 300 <= rec.status <= 399:
            loc = rec.location or ""
            admissible = (
                loc != ""
                and loc != current
                and ((len(current) <= 80 and len(loc) <= 80) or len(current) > 80)
                and not (loc.startswith("://") and not loc.endswith("404.html"))
            )
            if admissible:
                if not loc.startswith("http://") and not loc.startswith("https://"):
                    loc = urljoin(get_base_url(current) + "/", loc)
                if loc in cycle:
                    return FetchResult(False, error="redirect_cycle", final_url=current, hops=hops)
                cycle.add(loc)
                hops += 1
                if hops > MAX_REDIRECTS:
                    return FetchResult(False, error="too_many_redirects", final_url=current, hops=hops)
                current = loc
                continue
            return FetchResult(False, error=f"http_{rec.status}", final_url=current, hops=hops)
        if rec.status >= 400:
            return FetchResult(False, error=f"http_{rec.status}", final_url=current, hops=hops)
        return FetchResult(True, html=rec.html, final_url=current, hops=hops)


@dataclass
class CrawlResult:
    # ordered fetch attempts: (company_id, priority, seq, url, action)
    trace: List[Tuple[int, int, int, str, str]] = field(default_factory=list)
    # raw (company_id, email) bag in emission order (pre-F10)
    email_bag: List[Tuple[int, str]] = field(default_factory=list)
    # company_id -> (bad_url, email_processed, email_finded)
    flags: Dict[int, Tuple[bool, bool, bool]] = field(default_factory=dict)
    # global seed-url seen set (Crawler.fs:314)
    seen_seeds: set = field(default_factory=set)
    # per-company extractor seen sets, keyed company_id (Crawler.fs:320)
    seen_extractor: Dict[int, set] = field(default_factory=dict)


def email_extractor(
    corpus, company_id: int, url: str, res: CrawlResult, priority: int, seq: int
) -> List[str]:
    """``asyncEmailExtractor`` — Crawler.fs:238-264. Returns extracted emails
    (also appended to the bag); errors yield []. Gate: non-empty ∧ F2 ∧
    per-company seen-add."""
    seen = res.seen_extractor.setdefault(company_id, set())
    if not url or not is_not_image_script_css_ext(url) or url in seen:
        return []
    seen.add(url)
    fr = fetch(corpus, url)
    if not fr.ok or fr.html is None:
        res.trace.append((company_id, priority, seq, url, "error"))
        return []
    res.trace.append((company_id, priority, seq, url, "fetched"))
    emails = extract_emails_regex(fr.html)
    for e in emails:
        res.email_bag.append((company_id, e))
    return emails


def crawl_company(corpus, company_id: int, site_url: str, res: CrawlResult) -> None:
    """``asyncEmailCrawler`` for one company — Crawler.fs:316-392."""
    if site_url is None or site_url.strip() == "" or site_url in res.seen_seeds:
        res.flags[company_id] = (True, True, False)
        return
    res.seen_seeds.add(site_url)
    base_url = get_base_url(site_url)

    fr = fetch(corpus, site_url)
    if not fr.ok:
        res.trace.append((company_id, PRIO_SEED, 0, site_url, "error"))
        res.flags[company_id] = (True, True, False)
        return
    html = fr.html
    if html is None or html.strip() == "":
        res.trace.append((company_id, PRIO_SEED, 0, site_url, "fetched"))
        res.flags[company_id] = (True, True, False)
        return
    res.trace.append((company_id, PRIO_SEED, 0, site_url, "fetched"))

    mailto = search_mailto_results(html)
    for e in mailto:
        res.email_bag.append((company_id, e))
    emails = extract_emails_regex(html)
    for e in emails:
        res.email_bag.append((company_id, e))

    if len(mailto) > 1:
        res.flags[company_id] = (False, True, True)
        return

    data_link = contact_anchor_links(html, base_url)
    for seq, link in enumerate(data_link):
        email_extractor(corpus, company_id, link, res, PRIO_CONTACT_ANCHOR, seq)

    if not data_link:
        link_hrefs = search_href_results(html, base_url)
        data = [u for u in link_hrefs if is_contacts_page(u)]
    else:
        data = []
    for seq, link in enumerate(data):
        email_extractor(corpus, company_id, link, res, PRIO_CONTACT_HREF, seq)

    if data_link or data or mailto or emails:
        res.flags[company_id] = (False, True, True)
    else:
        res.flags[company_id] = (False, True, False)


def crawl(corpus, companies, limit: int = 100000) -> CrawlResult:
    """Entry point 2 — ``Program.fs:492-567``: F9 seed filter, distinctBy
    SiteUrl, take ``limit``, crawl each company, return bag + flags + trace.

    ``companies`` is an iterable of dicts with keys company_id, site_url,
    bad_url, email_processed, email_finded.
    """
    res = CrawlResult()
    seen_urls = set()
    selected = []
    for c in companies:
        if not seed_filter(
            c["site_url"], c["bad_url"], c["email_processed"], c["email_finded"]
        ):
            continue
        if c["site_url"] in seen_urls:
            continue
        seen_urls.add(c["site_url"])
        selected.append(c)
        if len(selected) >= limit:
            break
    for c in selected:
        crawl_company(corpus, c["company_id"], c["site_url"], res)
    return res


def dedup_emails_global(pairs):
    """K5 — global email dedup + junction (``DbAccess.fs:176-218``).

    Returns (emails, links): ``emails`` maps email text → email_id assigned
    in first-appearance order starting at 1; ``links`` is the set of
    (company_id, email_id) junction rows.
    """
    emails: Dict[str, int] = {}
    links = set()
    for cid, email in pairs:
        if email not in emails:
            emails[email] = len(emails) + 1
        links.add((cid, emails[email]))
    return emails, links
