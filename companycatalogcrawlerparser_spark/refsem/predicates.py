"""Quirk-exact frontier/email admission predicates (SURVEY.md §2.2).

Citations into ``/root/reference/CrawlerParser``.
"""

from __future__ import annotations

import re

from .strings import net_is_digit, start_http

IMG_SCRIPT_CSS_EXT = [
    ".png", ".jpg", ".jpeg", ".jfif", ".bmp", ".gif", ".tiff", ".tif",
    ".webp", ".js", ".css",
]

SOCIAL_NETWORKS = [
    "facebook.com", "twitter.com", "pinterest.com", "linkedin.com",
    "instagram.com", "youtube.com", "vk.com",
]

CONTACT_PAGE_WORDS = [
    "contact", "kontakt", "contac", "kont", "cont", "контакт",
    "contact-us", "contact-me", "about", "about-us", "about-me", "home",
    "feedback", "media", "event", "info", "mail", "sendmail",
    "ofis", "address",
]

# F6 — defined but commented out of the admission pipeline in the reference
# ("candidate for use ML.NET", Crawler.fs:139-153). Kept for optional use.
URL_STOPWORDS = [
    "?", "%", "~", "catalog", "category", "topic", "template", "brend",
    "node", "goods", "drivers", "help", "news", "product", "promo", "sites",
    "service", "/info/", "novosti", "konferenc", "archive", "apartments",
    "blog", "print", "center", "subscription", "province", "item", "feed",
    "tag", "desc", "search", "shop", "courses", "snap", "albums", "show",
    "photo", "presentation", "clients", "articles", "business", "project",
    "dokument", "image", "proekt", "formy", "kursy", "lists", "biz",
    "directory", "places", "api", "katalog", "index", "bank", "press",
    "css", "donate", "respond", "cat", "online", "page", "comment", "stil",
    "design", "privacy", "watch", "store", "before", "after", "brands",
    "rieltor", "onlayn", "cars", "options", "results", "video",
    "conditions", "?url", "porn", "teacher", "card", "letters",
    "obrazovanie", "arenda", "estates",
]


def is_not_image_script_css_ext(url: str) -> bool:
    """F2 — ``Crawler.fs:33-35``."""
    low = url.lower()
    return all(not low.endswith(ext) for ext in IMG_SCRIPT_CSS_EXT)


def not_social_network(url: str) -> bool:
    """F3 — ``Crawler.fs:37-39``."""
    low = url.lower()
    return all(d not in low for d in SOCIAL_NETWORKS)


def contact_page(url: str) -> bool:
    """F4 inner — substring containment of any keyword — ``Crawler.fs:87-97``."""
    low = url.lower()
    return any(w in low for w in CONTACT_PAGE_WORDS)


def is_contacts_page(x: str) -> bool:
    """F4 — last path segment (or whole tail) keyword check — ``Crawler.fs:99-109``."""
    s = x.rstrip("/")
    last_index = s.rfind("/")
    length = len(s) - last_index - 1
    if last_index > 0 and length > 0:
        return contact_page(s[last_index + 1 : last_index + 1 + length])
    elif len(s) > 4:
        return contact_page(s)
    return False


def str_contains_only_number(s: str) -> bool:
    """``Seq.forall Char.IsDigit`` (vacuously true on empty) — ``Crawler.fs:111``."""
    return all(net_is_digit(c) for c in s)


def is_end_with_digits(x: str) -> bool:
    """F5 — ``Crawler.fs:113-123``.

    Quirk Q3: the ``.html``/``.htm`` trims are .NET char-set trims — they
    also eat trailing runs of {., h, t, m, l}.
    """
    s = x.rstrip("/").rstrip(".html").rstrip(".htm")
    last_index = s.rfind("/")
    length = len(s) - last_index - 1
    if last_index > 0 and length > 0:
        return str_contains_only_number(s[last_index + 1 : last_index + 1 + length])
    # NOTE: reference indexes str[len-1] unguarded — an empty trim result
    # would raise; mirrored here (fixture URLs never hit it).
    return net_is_digit(s[len(s) - 1])


def url_not_contains(url: str) -> bool:
    """F6 (disabled in reference admission path, quirk Q12) — ``Crawler.fs:141-153``."""
    low = url.lower()
    return all(w not in low for w in URL_STOPWORDS)


_EMAIL_STRICT_RE = re.compile(
    r"^[a-zA-Z0-9.!#$%&'*+/=?^_`{|}~-]+@[a-zA-Z0-9](?:[a-zA-Z0-9-]{0,61}"
    r"[a-zA-Z0-9])?(?:\.[a-zA-Z0-9](?:[a-zA-Z0-9-]{0,61}[a-zA-Z0-9])?)*$"
)


def _mailaddress_parseable(email: str) -> bool:
    """Approximation of .NET ``MailAddress`` ctor acceptance (quirk Q6).

    MailAddress requires a non-empty local part and host, rejects leading
    '@', bare words without '@', and trailing '@'. It tolerates display-name
    forms, but those never survive the strict regex that is ANDed right
    after, so the approximation only needs to be correct on regex-passing
    inputs — for which MailAddress always succeeds.
    """
    if not email or " " in email:
        # regex would reject spaces anyway; MailAddress may accept quoted
        # display names but conjunct regex kills them
        at = email.rfind("@")
        return 0 < at < len(email) - 1
    at = email.rfind("@")
    return 0 < at < len(email) - 1


def is_valid_email(email: str) -> bool:
    """X4/Q6 — MailAddress parse ∧ strict regex — ``Utils.fs:20-25``."""
    return _mailaddress_parseable(email) and bool(_EMAIL_STRICT_RE.match(email))


def email_post_filter(email: str) -> bool:
    """F10 minus the length/subject mapping steps — ``Program.fs:547-549``.

    distinct → is_valid_email → F2 on the email text → last char not a
    digit → not ``.html``-suffixed (lowercased) → not ``@``-prefixed.
    The ``trimEmailWithSubject`` map and the ≤150 length cap happen after
    (``Program.fs:550-551``); see :func:`finalize_emails`.
    """
    if not is_valid_email(email):
        return False
    if not is_not_image_script_css_ext(email):
        return False
    if net_is_digit(email[-1]):
        return False
    if email.lower().endswith(".html") or email.startswith("@"):
        return False
    return True


def finalize_emails(pairs):
    """Full F10 chain over (company_id, email) pairs — ``Program.fs:543-551``.

    ``Seq.distinct`` on the *pair*, filters, then subject-trim map, then the
    150-char cap. Order-preserving first-occurrence dedup.
    """
    from .strings import trim_email_with_subject

    seen = set()
    out = []
    for cid, email in pairs:
        key = (cid, email)
        if key in seen:
            continue
        seen.add(key)
        if not email_post_filter(email):
            continue
        trimmed = trim_email_with_subject(email)
        if len(trimmed) <= 150:
            out.append((cid, trimmed))
    return out


def seed_filter(site_url, bad_url: bool, email_processed: bool, email_finded: bool) -> bool:
    """F9 — crawl-set selection — ``Program.fs:525-533``."""
    if site_url is None or site_url.strip() == "":
        return False
    if bad_url or email_processed or email_finded:
        return False
    if not not_social_network(site_url):
        return False
    return site_url != "http://www.abordageshop.ru"
