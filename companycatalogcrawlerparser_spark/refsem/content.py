"""Pure-Python twin of operators.content.main_content (SURVEY §5.1
strategy: an independent stdlib implementation of the same pinned
semantics, compared under the driver hash signal).

Regexes are written in the Java∩Python-re common dialect the operator
uses — explicit ASCII whitespace classes, no \\s (Python's is Unicode,
Java's is ASCII; the shared class keeps both engines bit-identical).
"""

from __future__ import annotations

import re

BLOCK_TAGS = (
    "p|div|h[1-6]|li|ul|ol|table|thead|tbody|tr|td|th|section|article"
    "|header|footer|nav|aside|blockquote|br|form"
)
_BLOCK_SPLIT = re.compile(rf"(?i)</?(?:{BLOCK_TAGS})\b[^>]*>")
_COMMENT = re.compile(r"(?s)<!--.*?-->")
_SCRIPT = re.compile(r"(?is)<script\b[^>]*>.*?</script>")
_STYLE = re.compile(r"(?is)<style\b[^>]*>.*?</style>")
_TAG = re.compile(r"<[^>]*>")
_WS = re.compile(r"[ \t\n\r\f]+")
_A = re.compile(r"(?is)<a\b[^>]*>.*?</a>")


def _text_of(fragment: str) -> str:
    return _WS.sub(" ", _TAG.sub(" ", fragment)).strip()


MD_RULES = (
    (r'(?is)<a\b[^>]*?href="([^"]*)"[^>]*>(.*?)</a>', r"[\2](\1)"),
    (r"(?i)<h1\b[^>]*>", "\n# "), (r"(?i)<h2\b[^>]*>", "\n## "),
    (r"(?i)<h3\b[^>]*>", "\n### "), (r"(?i)<h4\b[^>]*>", "\n#### "),
    (r"(?i)<h5\b[^>]*>", "\n##### "), (r"(?i)<h6\b[^>]*>", "\n###### "),
    (r"(?i)</h[1-6]>", "\n"),
    (r"(?i)<li\b[^>]*>", "\n- "),
    (r"(?i)</?(?:p|div|section|article|blockquote|tr|table|ul|ol)\b[^>]*>",
     "\n"),
    (r"(?i)<br\b[^>]*/?>", "\n"),
    (r"(?i)</?(?:b|strong)\b[^>]*>", "**"),
    (r"(?i)</?(?:i|em)\b[^>]*>", "*"),
)


def to_markdown(html: str | None) -> str:
    """Twin of operators.content.to_markdown — same ordered rule list,
    same generic strip + whitespace normalization."""
    h = html or ""
    h = _STYLE.sub(" ", _SCRIPT.sub(" ", _COMMENT.sub(" ", h)))
    for pat, rep in MD_RULES:
        h = re.sub(pat, rep, h)
    h = _TAG.sub(" ", h)
    h = re.sub(r"[ \t\f]+", " ", h)
    h = re.sub(r"\n ", "\n", h)
    h = re.sub(r" \n", "\n", h)
    h = re.sub(r"\n{3,}", "\n\n", h)
    return re.sub(r"^[ \t\n\r\f]+|[ \t\n\r\f]+$", "", h)


def main_content(
    html: str | None,
    min_chars: int = 25,
    max_link_pct: int = 35,
) -> tuple[str, int, int]:
    """(main_text, n_blocks, n_kept) — see operators.content for the
    pinned five-step semantics."""
    h = html or ""
    h = _STYLE.sub(" ", _SCRIPT.sub(" ", _COMMENT.sub(" ", h)))
    blocks = _BLOCK_SPLIT.split(h)
    kept = []
    n_kept = 0
    for blk in blocks:
        txt = _text_of(blk)
        alen = max(len(txt) - len(_text_of(_A.sub(" ", blk))), 0)
        if len(txt) >= min_chars and alen * 100 <= max_link_pct * len(txt):
            n_kept += 1
            kept.append(txt)
    return "\n".join(kept), len(blocks), n_kept
