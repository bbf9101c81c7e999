"""Quirk-exact string helpers mirroring the reference's .NET semantics.

Reference citations use file:line into ``/root/reference/CrawlerParser``.

.NET quirk cheat-sheet (SURVEY.md Appendix):
- ``TrimStart/TrimEnd(s.ToCharArray())`` trims a **character set**, not a
  prefix/suffix (Q3). Python's ``str.lstrip/rstrip`` with a char string has
  exactly this semantics, so we use them directly.
- ``String.Replace(a, b)`` replaces **all** occurrences (Q1).
- ``Uri.GetLeftPart(UriPartial.Authority)`` lowercases scheme+host and drops
  the default port.
"""

from __future__ import annotations

import re
import unicodedata
from urllib.parse import urlsplit

# --------------------------------------------------------------------------
# .NET primitive shims


def net_is_digit(ch: str) -> bool:
    """.NET ``Char.IsDigit`` = Unicode category Nd (not Python ``isdigit``)."""
    return unicodedata.category(ch) == "Nd"


def net_last_index_of(s: str, sub: str) -> int:
    """.NET ``String.LastIndexOf`` (-1 when absent)."""
    return s.rfind(sub)


def trunc(s: str) -> str:
    """First 250 chars — ``Utils.fs:108-109``."""
    return s[: min(len(s), 250)]


def count_substring(where: str, what: str) -> int:
    """Occurrence count via the length trick — ``Crawler.fs:79-82``."""
    if what == "":
        return 0
    return (len(where) - len(where.replace(what, ""))) // len(what)


# --------------------------------------------------------------------------
# URL pieces


def get_base_url(url: str) -> str:
    """Scheme+authority, .NET ``Uri.GetLeftPart(Authority)`` — ``Utils.fs:111-114``.

    Lowercases scheme and host, strips the default port (80/http, 443/https),
    keeps a non-default port and any userinfo.
    """
    parts = urlsplit(url)
    scheme = parts.scheme.lower()
    host = (parts.hostname or "").lower()
    default = {"http": 80, "https": 443}.get(scheme)
    try:
        port = parts.port
    except ValueError:
        port = None
    netloc = host
    if port is not None and port != default:
        netloc = f"{host}:{port}"
    if parts.username:
        userinfo = parts.username
        if parts.password:
            userinfo += f":{parts.password}"
        netloc = f"{userinfo}@{netloc}"
    return f"{scheme}://{netloc}"


def get_host(base_url: str) -> str:
    """Host token for same-host containment checks — ``Utils.fs:116-123``.

    Quirk Q2: ``TrimStart("www.".ToCharArray())`` trims any leading run of
    the characters {w, .}, then the final dot-segment (TLD) is stripped via
    ``LastIndexOf(".")``. ``wwwest.example.com`` → ``est.example``.
    """
    parts = urlsplit(base_url)
    host = (parts.hostname or "").lower()
    host = host.lstrip("w.")
    index = net_last_index_of(host, ".")
    if index > 0:
        host = host[:index]
    return host


def start_http(x: str) -> bool:
    """F1 — ``Crawler.fs:30-31``."""
    return x.startswith("http://") or x.startswith("https://")


def convert_url(x: str, base_url: str) -> str:
    """Relative→absolute resolution — ``Crawler.fs:41-49``.

    Quirk Q1: the final ``//`` → ``http://`` rewrite uses ``String.Replace``
    which replaces **every** occurrence, not just the prefix.
    """
    if not start_http(x) and x.startswith("/") and not x.startswith("//"):
        url = base_url.rstrip("/") + x
    elif not start_http(x) and not x.startswith("/") and not x.startswith("//"):
        url = base_url + x
    else:
        url = x
    if url.startswith("//"):
        url = url.replace("//", "http://")
    return url


def trim_email_with_subject(email: str) -> str:
    """Cut at last ``?subject`` — ``Utils.fs:44-49``."""
    index = email.rfind("?subject")
    if index > 0:
        return email[:index]
    return email


def canonicalize_url(url: str) -> str:
    """Python twin of ``functions.canon.canonicalize_url`` (north_rule
    canonical form, docs/SEMANTICS.md §1): lowercase scheme+host, strip
    fragment + default port, sort query params, empty path → '/'. Non-URL
    strings pass through trimmed."""
    import re as _re

    m = _re.match(
        r"^([A-Za-z][A-Za-z0-9+.-]*)://(?:([^/?#@]*)@)?([^/?#:]*)(?::([0-9]+))?"
        r"([^?#]*)(?:\?([^#]*))?(?:#.*)?$",
        url,
    )
    if not m:
        return url.strip()
    sch = m.group(1).lower()
    ui, host = m.group(2), m.group(3).lower()
    prt, pth, qry = m.group(4) or "", m.group(5), m.group(6)
    default = {"http": "80", "https": "443"}.get(sch, "")
    out = sch + "://"
    if ui:
        out += ui + "@"
    out += host
    if prt and prt != default:
        out += ":" + prt
    out += pth if pth else "/"
    if qry:
        out += "?" + "&".join(sorted(qry.split("&")))
    return out


# --------------------------------------------------------------------------
# Transliteration (seed URL synthesis) — ``Utils.fs:51-66``

_TRANSLIT = {
    "а": "a", "б": "b", "в": "v", "г": "g", "д": "d", "е": "e", "ё": "yo",
    "ж": "zh", "з": "z", "и": "i", "й": "j", "к": "k", "л": "l", "м": "m",
    "н": "n", "о": "o", "п": "p", "р": "r", "с": "s", "т": "t", "у": "u",
    "ф": "f", "х": "h", "ц": "ts", "ч": "ch", "ш": "sh", "щ": "sch",
    "ъ": "", "ы": "i", "ь": "", "э": "e", "ю": "yu", "я": "ya",
    "А": "A", "Б": "B", "В": "V", "Г": "G", "Д": "D", "Е": "E", "Ё": "Yo",
    "Ж": "Zh", "З": "Z", "И": "I", "Й": "J", "К": "K", "Л": "L", "М": "M",
    "Н": "N", "О": "O", "П": "P", "Р": "R", "С": "S", "Т": "T", "У": "U",
    "Ф": "F", "Х": "H", "Ц": "TS", "Ч": "Ch", "Ш": "Sh", "Щ": "Sch",
    "Ъ": "", "Ы": "I", "Ь": "", "Э": "E", "Ю": "Yu", "Я": "Ya",
    "-": "-", " ": "-",
}


def translit_cyrillic_to_latin(words: str) -> str:
    """68-pair Cyrillic→Latin map, space→``-``; unknown char raises
    (mirrors F# ``List.find`` KeyNotFoundException) — ``Utils.fs:51-66``."""
    out = []
    for ch in words:
        if ch not in _TRANSLIT:
            raise KeyError(f"translit: unmapped character {ch!r}")
        out.append(_TRANSLIT[ch])
    return "".join(out)


# --------------------------------------------------------------------------
# Hand-rolled base64 with reference quirks — ``Utils.fs:69-106``

_B64_ALPHABET = (
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/="
)
_B64_INDEX = {c: i for i, c in enumerate(_B64_ALPHABET)}


def decode_base64(text: str) -> str:
    """Quirk Q5: returns ``""`` when ``len % 4 != 0``; unknown chars map to
    index 0; '=' is in the alphabet at 64 (&0x3F → 0); UTF-8 decode with
    U+FFFD replacement (matches .NET ``Encoding.UTF8.GetString``)."""
    if len(text) % 4 != 0:
        return ""

    def val(c: str) -> int:
        return _B64_INDEX.get(c, 0)

    def quad_to_bytes(ending: int, a: str, b: str, c: str, d: str) -> bytes:
        quad = (
            ((val(a) & 0x3F) << 18)
            | ((val(b) & 0x3F) << 12)
            | ((val(c) & 0x3F) << 6)
            | (val(d) & 0x3F)
        )
        x = (quad & 0xFF0000) >> 16
        y = (quad & 0x00FF00) >> 8
        z = quad & 0x0000FF
        if ending == 2:
            return bytes([x])
        if ending == 3:
            return bytes([x, y])
        return bytes([x, y, z])

    out = bytearray()
    chars = list(text)
    i = 0
    n = len(chars)
    while i < n:
        rest = n - i
        a, b = chars[i], chars[i + 1] if rest >= 2 else "="
        if rest == 4 and chars[i + 2] == "=" and chars[i + 3] == "=":
            out += quad_to_bytes(2, a, b, "=", "=")
            i += 4
        elif rest == 4 and chars[i + 3] == "=":
            out += quad_to_bytes(3, a, b, chars[i + 2], "=")
            i += 4
        elif rest >= 4:
            out += quad_to_bytes(4, a, b, chars[i + 2], chars[i + 3])
            i += 4
        else:  # <4 leftover: reference's parse drops it (unreachable: len%4==0)
            break
    return out.decode("utf-8", errors="replace")


# --------------------------------------------------------------------------
# Charset sniff — ``Utils.fs:125-141``

# NOTE: `[META|meta]` in the reference is a *character class* {M,E,T,A,|,m,e,t,a},
# reproduced verbatim.
_META_RE = re.compile(
    r"<[META|meta](?!\s*(?:name|value)\s*=)[^>]*?charset\s*=[\s\"']*"
    r"([a-zA-Z0-9-]+)[\s\"'\/]*>"
)


def get_encoding(html: str) -> str:
    result = "utf-8"
    m = _META_RE.search(html)
    if m is not None:
        data = m.group(0)
        index = data.find("charset=")
        if index > 0:
            result = data[index + 8 :].strip("'\"/> ")
    return result
